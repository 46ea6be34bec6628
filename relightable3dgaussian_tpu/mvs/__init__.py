"""Multi-view-stereo depth/normal prior generation.

TPU-native analogue of the reference's vendored Vis-MVSNet
(`vismvsnet/`, SURVEY.md §2.6): a cascaded cost-volume MVS network that
produces the depth/normal priors consumed by the `lambda_depth` /
`lambda_normal_mvs_depth` training losses.  The torch reference ships
stripped pretrained weights; this implementation trains/infers natively
in JAX (flax) and keeps the same pipeline shape: feature UNet →
plane-sweep homography warp → pairwise cost regularization with
uncertainty → fused regularization → soft-argmin depth → cascade refine →
geometric-consistency filtering/fusion.
"""

from .homography import plane_sweep_warp, depth_hypotheses  # noqa: F401
from .pipeline import MVSNet, estimate_depth  # noqa: F401
