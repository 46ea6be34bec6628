"""K-nearest-neighbor mean squared distance for scale initialization.

TPU-native replacement for the reference `simple-knn` CUDA submodule
(`submodules/simple-knn/simple_knn.cu:79-221`, exposed as `distCUDA2`,
`spatial.cu:15-26`), whose only use is computing the mean squared distance
to the 3 nearest neighbors when a `GaussianModel` is initialized from a
point cloud (`scene/gaussian_model.py:548-549`).

The CUDA version morton-sorts points into 1024-point boxes and prunes by
box distance.  On TPU the same spatial-prune idea maps to a morton sort
followed by a *windowed* exact search: after sorting, a point's 3 true
nearest neighbors are almost surely within a +-W window in morton order,
and a windowed distance computation is a dense [P, 2W] op that vectorizes
perfectly on the VPU.  For exactness on small inputs there is also a
brute-force tiled path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zeros between each."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray
                 ) -> jnp.ndarray:
    """30-bit 3D morton codes for points normalized into [lo, hi].

    Same bit-interleave as the reference (`simple_knn.cu:33-49`,
    `bvh/src/construct.cu:6-32`).
    """
    rel = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((rel * 1023.0), 0.0, 1023.0).astype(jnp.uint32)
    xx = _expand_bits(q[..., 0])
    yy = _expand_bits(q[..., 1])
    zz = _expand_bits(q[..., 2])
    return (xx << 2) | (yy << 1) | zz


@functools.partial(jax.jit, static_argnames=("k", "window"))
def mean_knn_dist2(points: jnp.ndarray, k: int = 3, window: int = 64
                   ) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [P, 3] float32.
      k: neighbor count (reference uses 3).
      window: half-width of the morton-order search window.  64 covers the
        reference's accuracy needs for scale init (the CUDA version itself
        is approximate in the same way: it prunes by coarse boxes).

    Returns:
      [P] mean of the k smallest squared distances (excluding self).
    """
    P = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    codes = morton_codes(points, lo, hi)
    order = jnp.argsort(codes)
    sorted_pts = points[order]

    W = min(window, P - 1)
    # Offsets -W..-1, 1..W relative to each sorted position.
    offs = jnp.concatenate([jnp.arange(-W, 0), jnp.arange(1, W + 1)])
    idx = jnp.arange(P)[:, None] + offs[None, :]          # [P, 2W]
    in_range = (idx >= 0) & (idx < P)
    idx = jnp.clip(idx, 0, P - 1)
    nbr = sorted_pts[idx]                                  # [P, 2W, 3]
    d2 = jnp.sum((nbr - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(in_range, d2, jnp.inf)
    # k smallest via top_k on negated distances.
    neg_top, _ = jax.lax.top_k(-d2, k)
    mean_sorted = jnp.mean(-neg_top, axis=-1)
    # Scatter back to the original order.
    out = jnp.zeros(P, points.dtype).at[order].set(mean_sorted)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def mean_knn_dist2_exact(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Exact O(P^2) version — cross-check oracle and small-P path."""
    d2 = jnp.sum(
        (points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.diag(jnp.full(points.shape[0], jnp.inf, points.dtype))
    neg_top, _ = jax.lax.top_k(-d2, k)
    return jnp.mean(-neg_top, axis=-1)
