"""Core differentiable ops: SH, transforms, projection, binning, compositing."""

from . import binning, composite, projection, rasterize, sh, transforms  # noqa: F401
from .rasterize import RasterizeConfig, RasterizeOutput, rasterize as rasterize_fn  # noqa: F401
