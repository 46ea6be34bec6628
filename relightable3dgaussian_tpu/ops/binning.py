"""Tile binning: splat instances → lexicographic sort → dense per-tile lists.

TPU-native replacement for the reference's dynamic-size pipeline
(`rasterizer_impl.cu:72-140,343-384`: InclusiveSum → duplicateWithKeys →
DeviceRadixSort → identifyTileRanges).  XLA needs static shapes, so:

  * every splat gets a static budget of `max_tiles_per_gaussian` instance
    slots (excess tiles are dropped and *counted* — callers can watch the
    overflow stat and re-render with a bigger budget);
  * one `lax.sort` with two keys (tile id, depth) replaces the 64-bit radix
    sort — no host sync for `num_rendered`;
  * per-tile ranges come from `searchsorted`, and the final product is a
    dense [num_tiles, K] index matrix (front-to-back) — a shape the
    compositor can turn into per-tile matmuls on the MXU.

Gradients never flow through binning (indices only), matching the reference
where the sort is outside autograd.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedSplats


class TileBins(NamedTuple):
    idx: jnp.ndarray        # [T, K] int32 — gaussian ids, front-to-back
    mask: jnp.ndarray       # [T, K] bool — slot holds a real instance
    counts: jnp.ndarray     # [T] int32 — true per-tile instance count
    num_instances: jnp.ndarray  # [] int32 — total instances (pre-K-trunc)
    dropped_rect: jnp.ndarray   # [] int32 — instances dropped by the
                                # per-gaussian tile budget
    dropped_tile: jnp.ndarray   # [] int32 — instances dropped by per-tile K


def bin_splats(
    proj: ProjectedSplats,
    grid: tuple[int, int],
    max_tiles_per_gaussian: int,
    max_per_tile: int,
) -> TileBins:
    """Build the dense per-tile splat lists.

    Args:
      proj: preprocess output.
      grid: (gx, gy) tile grid.
      max_tiles_per_gaussian: static per-splat instance budget (slots are
        enumerated row-major over the splat's tile rect).
      max_per_tile: static K — splats beyond the K nearest per tile are
        dropped (they sit behind ~K compositing layers and contribute
        nothing once transmittance saturates).
    """
    gx, gy = grid
    num_tiles = gx * gy
    P = proj.valid.shape[0]
    M = max_tiles_per_gaussian
    K = max_per_tile

    # --- expand: one instance per (splat, local tile slot) ---
    r = jnp.arange(M, dtype=jnp.int32)[None, :]                    # [1, M]
    rw = (proj.rect_max[:, 0] - proj.rect_min[:, 0])[:, None]      # [P, 1]
    tiles = proj.tiles_touched[:, None]                            # [P, 1]
    safe_rw = jnp.maximum(rw, 1)
    # r // rw and r % rw via float reciprocal — vectorized int32 division
    # is very slow on the TPU VPU.  Exact for r < 2^10, rw < 2^10:
    # (r + 0.5)/rw lies strictly inside (q, q+1).
    q = jnp.floor((r.astype(jnp.float32) + 0.5)
                  / safe_rw.astype(jnp.float32)).astype(jnp.int32)
    tx = proj.rect_min[:, 0:1] + (r - q * safe_rw)
    ty = proj.rect_min[:, 1:2] + q
    inst_ok = proj.valid[:, None] & (r < tiles)
    tile_id = jnp.where(inst_ok, ty * gx + tx, num_tiles)          # [P, M]

    dropped_rect = jnp.sum(
        jnp.where(proj.valid, jnp.maximum(proj.tiles_touched - M, 0), 0))
    num_instances = jnp.sum(jnp.where(proj.valid,
                                      jnp.minimum(proj.tiles_touched, M), 0))

    gauss_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, M))
    depth = jnp.broadcast_to(proj.depth[:, None], (P, M))

    # --- lexicographic sort by (tile, depth); padding sorts to the end ---
    tile_flat = tile_id.reshape(-1)
    depth_flat = depth.reshape(-1).astype(jnp.float32)
    id_flat = gauss_id.reshape(-1)
    tile_sorted, _, id_sorted = jax.lax.sort(
        (tile_flat, depth_flat, id_flat), dimension=0, num_keys=2,
        is_stable=False)

    # --- per-tile ranges ---
    boundaries = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = boundaries[:-1]
    counts = boundaries[1:] - starts

    # --- dense [T, K] gather (jnp.take: fancy indexing lowers to a far
    # slower gather on TPU) ---
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = starts[:, None] + slot
    mask = slot < counts[:, None]
    idx = jnp.take(id_sorted, jnp.clip(pos, 0, tile_flat.shape[0] - 1),
                   axis=0)
    idx = jnp.where(mask, idx, 0)

    dropped_tile = jnp.sum(jnp.maximum(counts - K, 0))

    return TileBins(
        idx=idx,
        mask=mask,
        counts=jnp.minimum(counts, K),
        num_instances=num_instances,
        dropped_rect=dropped_rect,
        dropped_tile=dropped_tile,
    )
