"""Point→tile instance routing: the renderer's all-to-all re-shard.

SURVEY.md §2.7's Gaussian-sharding requirement: each mesh member owns
P/S splats (parameters, Adam state, per-splat pipeline) and T/S image
tiles; after projection, splat *instances* must move from their owner to
the member that composites their tile — the renderer analogue of a
Ulysses attention all-to-all (shard-by-point → resort → shard-by-tile).
Round 1 stood this in with `all_gather` (full replication: per-member
memory and bandwidth did not shrink with the mesh).  This module is the
real thing:

  1. the owner expands its local splats into (tile|depth)-keyed instances
     (`ops.binning.expand_instance_keys` — identical keys to the
     single-device sort) and sorts them locally; because each destination
     owns a *contiguous* tile range, tile-major key order is already
     destination-major, so per-destination segments fall out of one
     `searchsorted`;
  2. fixed-capacity send buffers ([S, cap] keys + [S, cap, D] payload
     rows) are cut from the sorted stream with windowed dynamic slices;
     overflow beyond `route_cap` is counted, never silently dropped;
  3. one `lax.all_to_all` each for keys and payload rows exchanges the
     buffers over the mesh axis (ICI);
  4. the receiver merges its S incoming streams with a local sort and
     builds dense per-tile lists for ITS tiles only.

Every step is differentiable (sorts are index-only; the payload moves
through gathers, dynamic slices and the all_to_all, all of which have
exact transposes), so parameter gradients flow back owner-side through
the *reverse* all-to-all, and the gradient scatter-reduce is sharded S
ways as well.

Per-member costs vs. all_gather replication (P splats, I instances,
T tiles): sort I/S vs I; payload traffic I/S·D vs P·D per member;
compositor input T/S·K vs T·K.  Reference analogue: the device-local
`duplicateWithKeys` + radix sort (`rasterizer_impl.cu:72-113,343-384`)
— the reference has no distributed equivalent at all.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import binning
from ..ops.projection import ProjectedSplats


class RoutedTiles(NamedTuple):
    data: jnp.ndarray       # [Tl, K, D] dense per-tile instance rows
    counts: jnp.ndarray     # [Tl] int32
    tile_ids: jnp.ndarray   # [Tl] int32 global tile ids (this member's)
    dropped_rect: jnp.ndarray
    dropped_route: jnp.ndarray  # [] int32 — instances beyond route_cap
    dropped_tile: jnp.ndarray   # [] int32 — beyond per-tile K
    num_instances: jnp.ndarray  # [] int32 — this member's OWNED instances


class RoutedStream(NamedTuple):
    """`route_instances(stream=True)` result: the receiver's merged
    depth-sorted stream fed straight to the window-DMA compositor
    (`ops.composite_pallas.composite_pallas_stream_rows`) — no dense
    [Tl, K, D] densification gather."""
    rows: jnp.ndarray       # [S*route_cap, D] merged sorted instance rows
    starts: jnp.ndarray     # [Tl] int32 segment offsets into rows
    counts: jnp.ndarray     # [Tl] int32 (clamped to K)
    tile_ids: jnp.ndarray   # [Tl] int32 global tile ids (this member's)
    dropped_rect: jnp.ndarray
    dropped_route: jnp.ndarray
    dropped_tile: jnp.ndarray
    num_instances: jnp.ndarray


def route_instances(
    proj_sl: ProjectedSplats,
    payload_sl: jnp.ndarray,
    grid: tuple[int, int],
    axis: str,
    nshards: int,
    max_tiles_per_gaussian: int,
    max_per_tile: int,
    route_cap: int,
    stream: bool = False,
) -> RoutedTiles | RoutedStream:
    """Route local splat instances to tile owners (call inside shard_map).

    Args:
      proj_sl: preprocess output for the member's P/S local splats.
      payload_sl: [Pl, D] per-splat instance payload rows
        (xy | conic | opacity | feats — whatever the compositor needs).
      grid: full-image tile grid (gx, gy).
      axis: mesh axis name; nshards: its static size.
      max_tiles_per_gaussian: local instance budget M.
      max_per_tile: K of the receiver-side dense lists.
      route_cap: static per-destination send capacity (overflow counted
        in dropped_route).

    Returns:
      RoutedTiles for this member's contiguous tile range.
    """
    gx, gy = grid
    num_tiles = gx * gy
    S = nshards
    K = max_per_tile
    D = payload_sl.shape[-1]
    Tl = -(-num_tiles // S)   # ceil: trailing virtual tiles stay empty
    my = jax.lax.axis_index(axis)

    key, gid, num_inst, dropped_rect, depth_bits = (
        binning.expand_instance_keys(proj_sl, grid, max_tiles_per_gaussian))
    key_s, gid_s = jax.lax.sort(
        (key.reshape(-1), gid.reshape(-1)), dimension=0, num_keys=1,
        is_stable=False)
    rows_s = jnp.take(payload_sl, gid_s, axis=0)          # [Pl*M, D]

    # Destination d owns tiles [d*Tl, (d+1)*Tl); its segment of the sorted
    # stream starts at the first key >= (d*Tl) << depth_bits.
    bkeys = jnp.minimum(
        jnp.arange(S + 1, dtype=jnp.uint32) * jnp.uint32(Tl),
        jnp.uint32(num_tiles)) << depth_bits
    dstarts = jnp.searchsorted(key_s, bkeys, side="left").astype(jnp.int32)
    seg_len = dstarts[1:] - dstarts[:-1]
    dropped_route = jnp.sum(jnp.maximum(seg_len - route_cap, 0))

    kpad = jnp.pad(key_s, (0, route_cap),
                   constant_values=jnp.uint32(0xFFFFFFFF))
    rpad = jnp.pad(rows_s, ((0, route_cap), (0, 0)))
    send_keys = jax.vmap(
        lambda s: jax.lax.dynamic_slice(kpad, (s,), (route_cap,))
    )(dstarts[:-1])                                       # [S, cap]
    send_rows = jax.vmap(
        lambda s: jax.lax.dynamic_slice(rpad, (s, 0), (route_cap, D))
    )(dstarts[:-1])                                       # [S, cap, D]
    in_seg = (jnp.arange(route_cap, dtype=jnp.int32)[None, :]
              < jnp.minimum(seg_len, route_cap)[:, None])
    send_keys = jnp.where(in_seg, send_keys, jnp.uint32(0xFFFFFFFF))
    send_rows = jnp.where(in_seg[..., None], send_rows, 0.0)

    recv_keys = jax.lax.all_to_all(
        send_keys, axis, split_axis=0, concat_axis=0)     # [S, cap]
    recv_rows = jax.lax.all_to_all(
        send_rows, axis, split_axis=0, concat_axis=0)     # [S, cap, D]

    # Merge the S incoming depth-sorted streams for MY tiles.
    rk = recv_keys.reshape(-1)
    iota = jnp.arange(rk.shape[0], dtype=jnp.int32)
    rk_s, perm = jax.lax.sort((rk, iota), dimension=0, num_keys=1,
                              is_stable=False)
    rr_s = jnp.take(recv_rows.reshape(-1, D), perm, axis=0)

    t0 = my * Tl
    tb_keys = jnp.minimum((t0 + jnp.arange(Tl + 1)).astype(jnp.uint32),
                          jnp.uint32(num_tiles)) << depth_bits
    bounds = jnp.searchsorted(rk_s, tb_keys, side="left").astype(jnp.int32)
    starts = bounds[:-1]
    cnt = bounds[1:] - starts
    dropped_tile = jnp.sum(jnp.maximum(cnt - K, 0))

    if stream:
        return RoutedStream(
            rows=rr_s,
            starts=starts,
            counts=jnp.minimum(cnt, K),
            tile_ids=t0 + jnp.arange(Tl, dtype=jnp.int32),
            dropped_rect=dropped_rect,
            dropped_route=dropped_route,
            dropped_tile=dropped_tile,
            num_instances=num_inst,
        )

    pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    pos = jnp.minimum(pos, rk_s.shape[0] - 1)
    data = jnp.take(rr_s, pos.reshape(-1), axis=0).reshape(Tl, K, D)

    return RoutedTiles(
        data=data,
        counts=jnp.minimum(cnt, K),
        tile_ids=t0 + jnp.arange(Tl, dtype=jnp.int32),
        dropped_rect=dropped_rect,
        dropped_route=dropped_route,
        dropped_tile=dropped_tile,
        num_instances=num_inst,
    )
