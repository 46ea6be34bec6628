"""Per-splat preprocess: cull → project → conic/radius → tile rect → SH color.

TPU-native analogue of the reference `preprocessCUDA`
(`cuda_rasterizer/forward.cu:161-267`): one fully vectorized jnp pass over
all P splats (padded, masked) instead of a 256-thread CUDA grid.  XLA fuses
the whole thing into a handful of VPU loops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sh as sh_ops
from . import transforms as tf

# Tile size in pixels; matches the reference BLOCK_X/BLOCK_Y (`config.h:15-16`)
# and is also a natural TPU lane count (16x16 = 256 = 2x128 lanes).
TILE = 16


class ProjectedSplats(NamedTuple):
    """Per-splat screen-space quantities, all [P] or [P, k]; padded entries
    and culled splats carry valid=False."""
    valid: jnp.ndarray        # [P] bool — survives frustum/det/area culls
    xy: jnp.ndarray           # [P, 2] float — mean pixel position
    depth: jnp.ndarray        # [P] float — camera-space z
    conic: jnp.ndarray        # [P, 3] float — inverse 2D covariance (a, b, c)
    opacity: jnp.ndarray      # [P] float
    radius: jnp.ndarray       # [P] int32 — 3 sigma screen radius, 0 if culled
    cut_radius: jnp.ndarray   # [P] float — exact alpha>=1/255 cutoff radius
                              # (<= 3 sigma; pixels beyond it are discarded
                              # by the compositor's alpha test anyway)
    rect_min: jnp.ndarray     # [P, 2] int32 — inclusive tile rect min (x, y)
    rect_max: jnp.ndarray     # [P, 2] int32 — exclusive tile rect max (x, y)
    tiles_touched: jnp.ndarray  # [P] int32
    rgb: jnp.ndarray          # [P, 3] float — SH-evaluated color (clamped >= 0)
    clamped: jnp.ndarray      # [P, 3] bool — which channels were clamped


def grid_size(width: int, height: int) -> tuple[int, int]:
    """Number of tiles (x, y)."""
    return (width + TILE - 1) // TILE, (height + TILE - 1) // TILE


def compute_sh_color(sh_coeffs: jnp.ndarray, means: jnp.ndarray,
                     campos: jnp.ndarray, active_degree: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SH → RGB with +0.5 offset and clamp-at-zero tracking.

    Matches `forward.cu:25-76` (`computeColorFromSH`).

    Args:
      sh_coeffs: [P, K, 3] coefficients (K >= (deg+1)^2).
      means: [P, 3] world positions.
      campos: [3] camera center.
      active_degree: static current SH degree (warmup schedule).
    Returns:
      rgb [P, 3] (clamped to >= 0), clamped [P, 3] bool.
    """
    dirs = tf.normalize(means - campos)
    # eval_sh expects [..., C, K]
    raw = sh_ops.eval_sh(active_degree, jnp.swapaxes(sh_coeffs, -1, -2), dirs)
    raw = raw + 0.5
    clamped = raw < 0.0
    return jnp.maximum(raw, 0.0), clamped


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray,
    w2c: jnp.ndarray,
    full_proj: jnp.ndarray,
    campos: jnp.ndarray,
    width: int,
    height: int,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    sh_coeffs: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    scale_modifier: float = 1.0,
    znear: float = 0.2,
    xy_offset: jnp.ndarray | None = None,
) -> ProjectedSplats:
    """Project all splats to screen space and compute tile coverage.

    Args:
      means3d: [P, 3]; scales: [P, 3] (activated, positive);
      rotations: [P, 4] unit quats (w, x, y, z); opacities: [P] in (0, 1).
      alive: [P] bool mask for padded/pruned slots.
      w2c: [4, 4]; full_proj: [4, 4] = proj @ w2c; campos: [3].
      sh_coeffs: [P, K, 3] or None if colors_precomp given.
      colors_precomp: [P, 3] or None.
      cov3d_precomp: [P, 3, 3] or None.
      xy_offset: [P, 2] zeros added to screen xy — differentiate the loss
        w.r.t. it to read screen-space position gradients (the analogue of
        the reference's `screenspace_points` retain_grad trick,
        `render.py:19-23`); densification thresholds consume its norm.
    """
    P = means3d.shape[0]
    f32 = means3d.dtype

    # --- frustum cull (near plane only, `auxiliary.h:139-164`) ---
    t = means3d @ w2c[:3, :3].T + w2c[:3, 3]
    depth = t[..., 2]
    in_front = depth > znear

    # --- projection to NDC then pixels ---
    hom = means3d @ full_proj[:3, :3].T + full_proj[:3, 3]
    w_hom = means3d @ full_proj[3, :3] + full_proj[3, 3]
    inv_w = 1.0 / (w_hom + 1e-7)
    ndc = hom * inv_w[..., None]
    xy = jnp.stack(
        [tf.ndc2pix(ndc[..., 0], width), tf.ndc2pix(ndc[..., 1], height)], -1)
    if xy_offset is not None:
        xy = xy + xy_offset

    # --- 3D covariance ---
    if cov3d_precomp is None:
        cov3d = tf.build_cov3d(scales, rotations, scale_modifier)
    else:
        cov3d = cov3d_precomp

    # --- EWA 2D covariance (+ low pass) ---
    cov2d = tf.ewa_project_cov(
        means3d, cov3d, w2c, focal_x, focal_y, tan_fovx, tan_fovy)
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    # --- 3-sigma radius from eigenvalues (`forward.cu:231-239`) ---
    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    radius = radius_f.astype(jnp.int32)

    # --- exact contribution radius.  The compositor discards any sample
    # with alpha = op*exp(power) < 1/255 (`forward.cu:477-480` does the
    # same), so a pixel can only contribute within
    #   d <= sqrt(2*lam1*ln(255*op)).
    # Binning against this (instead of the unconditional 3 sigma) is
    # output-invariant but drops the never-contributing instances of
    # low-opacity splats (~20-40% of all instances mid-training). ---
    op_cut = jax.lax.stop_gradient(opacities) * 255.0
    cut_radius = jnp.ceil(jnp.sqrt(
        2.0 * jnp.maximum(lam1, 0.0) * jnp.log(jnp.maximum(op_cut, 1.0))))
    contributes = op_cut > 1.0
    # The rect keeps the reference's 3-sigma cap (pixels beyond 3 sigma in
    # uncovered tiles never composite there either); the uncapped cutoff is
    # what the circle-vs-tile test in binning uses, so it only drops tiles
    # whose every pixel fails the alpha test.
    rect_radius = jnp.minimum(cut_radius, radius_f)

    # --- tile rectangle (`auxiliary.h:46-56`) ---
    gx, gy = grid_size(width, height)
    rmin_x = jnp.clip(((xy[..., 0] - rect_radius) / TILE).astype(jnp.int32), 0, gx)
    rmin_y = jnp.clip(((xy[..., 1] - rect_radius) / TILE).astype(jnp.int32), 0, gy)
    rmax_x = jnp.clip(
        ((xy[..., 0] + rect_radius + TILE - 1) / TILE).astype(jnp.int32), 0, gx)
    rmax_y = jnp.clip(
        ((xy[..., 1] + rect_radius + TILE - 1) / TILE).astype(jnp.int32), 0, gy)
    tiles = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = alive & in_front & det_ok & (tiles > 0) & contributes
    tiles = jnp.where(valid, tiles, 0)
    radius = jnp.where(valid, radius, 0)

    # --- color ---
    if colors_precomp is not None:
        rgb = colors_precomp
        clamped = jnp.zeros((P, 3), bool)
    else:
        rgb, clamped = compute_sh_color(
            sh_coeffs, means3d, campos.astype(f32), active_sh_degree)

    return ProjectedSplats(
        valid=valid,
        xy=xy,
        depth=depth,
        conic=conic,
        opacity=opacities,
        radius=radius,
        cut_radius=jnp.where(valid, cut_radius, 0.0),
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles,
        rgb=rgb,
        clamped=clamped,
    )
