"""Screen-space surface reconstruction: depth → camera xyz → pseudo normals.

TPU-native analogue of `renderSurfaceXYZCUDA` / `renderPseudoNormalCUDA`
(`cuda_rasterizer/forward.cu:564-658`).  Dense [H, W] image math — pure
jnp, fused by XLA; the 3x3 Sobel-like stencils become two depthwise convs.
"""
from __future__ import annotations

import jax.numpy as jnp


def surface_xyz_from_depth(
    depth: jnp.ndarray,
    opacity: jnp.ndarray,
    focal: jnp.ndarray,
    cxcy: jnp.ndarray,
) -> jnp.ndarray:
    """Un-project an alpha-weighted depth image to camera-space positions.

    The blended depth is normalized by blended opacity first (the reference
    divides by max(opacity, 1e-7), `forward.cu:586`).

    Args:
      depth: [H, W] alpha-blended depth.
      opacity: [H, W] blended opacity.
      focal: [2] (fx, fy); cxcy: [2] principal point.

    Returns:
      [H, W, 3] camera-space xyz.
    """
    H, W = depth.shape
    d = depth / jnp.maximum(opacity, 1e-7)
    u = jnp.arange(W, dtype=depth.dtype)[None, :]
    v = jnp.arange(H, dtype=depth.dtype)[:, None]
    x = (u - cxcy[0]) / focal[0] * d
    y = (v - cxcy[1]) / focal[1] * d
    return jnp.stack([x, y, d], axis=-1)


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge replication (matches the CUDA clamp-to-border
    indexing, `forward.cu:615-623`)."""
    H, W = img.shape[:2]
    y = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    x = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[y][:, x]


def pseudo_normal_from_xyz(
    surface_xyz: jnp.ndarray,
    w2c: jnp.ndarray,
) -> jnp.ndarray:
    """Cross-product normals from a camera-space position image.

    Sobel-weighted central differences of xyz along x and y, crossed and
    flipped toward the camera, rotated to world space
    (`forward.cu:593-658`).  Pixels with a degenerate gradient get 0.

    Args:
      surface_xyz: [H, W, 3] camera-space positions.
      w2c: [4, 4] world→camera matrix (math convention).

    Returns:
      [H, W, 3] world-space unit normals (0 where degenerate).
    """
    x = surface_xyz
    # Sobel-like stencil, weights 0.125/0.25 as in the reference.
    ga = (-0.125 * _shift(x, -1, -1) + 0.125 * _shift(x, -1, 1)
          - 0.25 * _shift(x, 0, -1) + 0.25 * _shift(x, 0, 1)
          - 0.125 * _shift(x, 1, -1) + 0.125 * _shift(x, 1, 1))
    gb = (-0.125 * _shift(x, -1, -1) - 0.25 * _shift(x, -1, 0)
          - 0.125 * _shift(x, -1, 1) + 0.125 * _shift(x, 1, -1)
          + 0.25 * _shift(x, 1, 0) + 0.125 * _shift(x, 1, 1))
    n = jnp.cross(ga, gb)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n_cam = jnp.where(norm > 0.0, -n / jnp.maximum(norm, 1e-12), 0.0)
    # Rotate camera→world: world = R_w2cᵀ @ n_cam.
    return n_cam @ w2c[:3, :3]


def pseudo_normal_from_depth(
    depth: jnp.ndarray,
    opacity: jnp.ndarray,
    focal: jnp.ndarray,
    cxcy: jnp.ndarray,
    w2c: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience: depth → (surface_xyz, pseudo_normal)."""
    xyz = surface_xyz_from_depth(depth, opacity, focal, cxcy)
    return xyz, pseudo_normal_from_xyz(xyz, w2c)
