"""Plane-sweep homography warping (reference `vismvsnet/core/homography.py`).

For a fronto-parallel depth hypothesis d in the reference view, a source
image is resampled through H(d) = Ks (Rrel - t_rel n^T / d) Kr^-1.  Pure
jnp; the bilinear gather vectorizes over (depth, pixel).
"""
from __future__ import annotations

import jax.numpy as jnp


def depth_hypotheses(depth_min, depth_max, num: int,
                     inverse: bool = False) -> jnp.ndarray:
    """[num] sweep depths — linear (or inverse-depth) spacing."""
    t = jnp.linspace(0.0, 1.0, num)
    if inverse:
        return 1.0 / (1.0 / depth_min * (1 - t) + 1.0 / depth_max * t)
    return depth_min * (1 - t) + depth_max * t


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
              ) -> jnp.ndarray:
    """Bilinear sample img [H, W, C] at float coords; zeros outside."""
    H, W = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    inb = (x0 >= 0) & (x0 < W - 1) & (y0 >= 0) & (y0 < H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 2)
    c00 = img[y0i, x0i]
    c01 = img[y0i, x0i + 1]
    c10 = img[y0i + 1, x0i]
    c11 = img[y0i + 1, x0i + 1]
    out = (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
           + c10 * (1 - fx) * fy + c11 * fx * fy)
    return jnp.where(inb[..., None], out, 0.0)


def plane_sweep_warp(
    src_feat: jnp.ndarray,
    K_ref: jnp.ndarray,
    K_src: jnp.ndarray,
    rel: jnp.ndarray,
    depths: jnp.ndarray,
) -> jnp.ndarray:
    """Warp a source feature map into the reference frustum per depth.

    Args:
      src_feat: [H, W, C] source features.
      K_ref/K_src: [3, 3] intrinsics at this scale.
      rel: [4, 4] src_w2c @ inv(ref_w2c) (reference→source transform).
      depths: [D] hypothesis depths.

    Returns:
      [D, H, W, C] warped features (cost-volume slices).
    """
    H, W = src_feat.shape[:2]
    R = rel[:3, :3]
    t = rel[:3, 3]
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    ones = jnp.ones_like(u)
    pix = jnp.stack([u, v, ones], -1)                     # [H, W, 3]
    cam = pix @ jnp.linalg.inv(K_ref).T                   # ref rays

    # point at depth d: X = d * ray; project: Ks (R X + t)
    A = cam @ R.T @ K_src.T                               # [H, W, 3]
    b = (t @ K_src.T)[None, None, :]                      # [1, 1, 3]

    def warp_one(d):
        p = A * d + b
        z = jnp.maximum(p[..., 2], 1e-6)
        x = p[..., 0] / z
        y = p[..., 1] / z
        return _bilinear(src_feat, x, y)

    import jax
    return jax.vmap(warp_one)(depths)
