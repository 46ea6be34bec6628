"""Gaussian splat parameter state — the TPU analogue of `GaussianModel`.

The reference (`scene/gaussian_model.py:21-1062`) is a mutable torch module
whose tensors change shape on densification.  Here the state is an
immutable pytree with a *static capacity* and an `alive` mask: all shapes
stay fixed between (rare) capacity re-pads, so every train step hits the
same XLA executable.  Raw (pre-activation) parameters are stored; the
activations match the reference (`gaussian_model.py:23-44`):

  scaling: exp  |  opacity: sigmoid  |  rotation: L2 normalize
  base_color: sigmoid  |  roughness/metallic: sigmoid
  normal: raw (supervised toward unit length)

PBR attributes (`use_pbr=True` ≈ reference model type "neilf") add
base_color, roughness, metallic, per-splat incident-light SH and
visibility SH (degree 3 → 16 coeffs).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops import transforms as tf


@flax.struct.dataclass
class GaussianParams:
    """Learnable splat attributes, all padded to capacity N (leading dim)."""
    xyz: jnp.ndarray              # [N, 3]
    normal: jnp.ndarray           # [N, 3] raw
    shs_dc: jnp.ndarray           # [N, 1, 3]
    shs_rest: jnp.ndarray         # [N, K-1, 3]
    scaling: jnp.ndarray          # [N, 3] log-scale
    rotation: jnp.ndarray         # [N, 4] unnormalized quat (w, x, y, z)
    opacity: jnp.ndarray          # [N, 1] logit
    # PBR (zero-sized when not used so the pytree structure is stable)
    base_color: jnp.ndarray       # [N, 3] logit
    roughness: jnp.ndarray        # [N, 1] logit
    metallic: jnp.ndarray         # [N, 1] logit
    incidents_dc: jnp.ndarray     # [N, 1, 3]
    incidents_rest: jnp.ndarray   # [N, Ki-1, 3]
    visibility_dc: jnp.ndarray    # [N, 1, 1]
    visibility_rest: jnp.ndarray  # [N, 15, 1]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


@flax.struct.dataclass
class GaussianState:
    """Parameters + non-learnable bookkeeping."""
    params: GaussianParams
    alive: jnp.ndarray            # [N] bool
    # densification statistics (reference `gaussian_model.py:880-925`)
    xyz_grad_accum: jnp.ndarray   # [N]
    normal_grad_accum: jnp.ndarray  # [N]
    denom: jnp.ndarray            # [N]
    max_radii2d: jnp.ndarray      # [N] int32

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


# --- activations ---

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return tf.normalize(p.rotation)


def get_opacity(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.opacity[..., 0])


def get_shs(p: GaussianParams) -> jnp.ndarray:
    """[N, K, 3] full SH stack."""
    return jnp.concatenate([p.shs_dc, p.shs_rest], axis=1)


def get_base_color(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.base_color)


def get_roughness(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.roughness)


def get_metallic(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.metallic)


def get_incidents(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.incidents_dc, p.incidents_rest], axis=1)


def get_visibility(p: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([p.visibility_dc, p.visibility_rest], axis=1)


def get_normal(p: GaussianParams) -> jnp.ndarray:
    return tf.normalize(p.normal)


def inverse_sigmoid(x):
    return np.log(x / (1 - x))


def create_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    use_pbr: bool = False,
    normals: np.ndarray | None = None,
    init_scale: np.ndarray | None = None,
    init_opacity: np.ndarray | float = 0.1,
) -> GaussianState:
    """Initialize from a point cloud (reference `create_from_pcd`,
    `gaussian_model.py:537-579`).

    Args:
      points: [P, 3]; colors: [P, 3] in [0,1].
      capacity: padded slot count (>= P).
      init_scale: [P] per-point scale (e.g. sqrt(mean 3-NN dist²));
        computed with `ops.knn.mean_knn_dist2` if None.
      init_opacity: scalar or [P] initial opacity (reference inits at
        0.1, `gaussian_model.py:551`; synthetic GT builders pass ~0.9
        to make opaque surfaces).
    """
    P = points.shape[0]
    assert capacity >= P
    K = (sh_degree + 1) ** 2

    if init_scale is None:
        from .. import native
        d2 = native.mean_knn_dist2(points)   # C++ threaded path
        if d2 is None:
            from ..ops.knn import mean_knn_dist2
            d2 = np.asarray(mean_knn_dist2(jnp.asarray(points)))
        d2 = np.maximum(d2, 1e-7)
        init_scale = np.sqrt(d2)
    log_scale = np.log(init_scale)[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:P] = x
        return jnp.asarray(out)

    shs = np.zeros((P, K, 3), np.float32)
    shs[:, 0] = np.asarray(sh_ops.rgb2sh(jnp.asarray(colors)))

    rot = np.zeros((P, 4), np.float32)
    rot[:, 0] = 1.0

    if normals is None or not np.isfinite(normals).all() or \
            np.abs(normals).sum() == 0:
        rng = np.random.default_rng(0)
        normals = rng.normal(size=(P, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)

    ki = 16  # incident SH degree 3
    params = GaussianParams(
        xyz=pad(points.astype(np.float32)),
        normal=pad(normals.astype(np.float32)),
        shs_dc=pad(shs[:, :1]),
        shs_rest=pad(shs[:, 1:]),
        scaling=pad(log_scale.astype(np.float32), fill=-10.0),
        rotation=pad(rot),
        opacity=pad(np.asarray(
            inverse_sigmoid(np.broadcast_to(
                np.float32(init_opacity), (P,))).reshape(P, 1),
            np.float32)),
        base_color=pad(np.zeros((P, 3), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0)),
        roughness=pad(np.zeros((P, 1), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0)),
        metallic=pad(np.zeros((P, 1), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0)),
        incidents_dc=pad(np.zeros((P, 1, 3), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0, 3)),
        incidents_rest=pad(np.zeros((P, ki - 1, 3), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0, 3)),
        visibility_dc=pad(np.zeros((P, 1, 1), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0, 1)),
        visibility_rest=pad(np.zeros((P, 15, 1), np.float32)) if use_pbr
        else jnp.zeros((capacity, 0, 1)),
    )
    alive = jnp.asarray(np.arange(capacity) < P)
    # Distinct buffers per field — aliased leaves break XLA donation
    # ("attempt to donate the same buffer twice").
    return GaussianState(
        params=params,
        alive=alive,
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        normal_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.int32),
    )


def render_attributes(p: GaussianParams) -> dict[str, Any]:
    """Activated attributes in the form the rasterizer consumes."""
    return dict(
        means3d=p.xyz,
        scales=get_scaling(p),
        rotations=get_rotation(p),
        opacities=get_opacity(p),
        sh_coeffs=get_shs(p),
    )
