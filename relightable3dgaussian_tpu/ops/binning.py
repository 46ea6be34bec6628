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

from .projection import TILE, ProjectedSplats


class TileBins(NamedTuple):
    idx: jnp.ndarray        # [T, K] int32 — gaussian ids, front-to-back
    mask: jnp.ndarray       # [T, K] bool — slot holds a real instance
    counts: jnp.ndarray     # [T] int32 — true per-tile instance count
    num_instances: jnp.ndarray  # [] int32 — total instances (pre-K-trunc)
    dropped_rect: jnp.ndarray   # [] int32 — instances dropped by the
                                # per-gaussian tile budget
    dropped_tile: jnp.ndarray   # [] int32 — instances dropped by per-tile K
    # Compact gradient-reduction aux (present iff grad_cap was given):
    # real instances occupy the sorted prefix, so the backward can gather
    # its per-instance gradient rows into [grad_cap] compact order and
    # scatter-add ~2x fewer rows (XLA TPU scatter is row-serial).
    gsort_gauss: jnp.ndarray | None = None  # [cap] int32 gaussian id (P=drop)
    gsort_pos: jnp.ndarray | None = None    # [cap] int32 flat (t*K+k) slot
    dropped_grad: jnp.ndarray | None = None  # [] int32 instances beyond cap
    # Stream mode (`bin_splats(stream=True)`): the Pallas compositor
    # window-DMAs tile segments straight out of the sorted instance
    # array, so the dense [T, K] lists above are never built (idx/mask
    # are None).  stream_ids is the tile-sorted gaussian-id prefix
    # [T*K]; stream_starts[t] is tile t's segment offset into it.
    stream_starts: jnp.ndarray | None = None  # [T] int32
    stream_ids: jnp.ndarray | None = None     # [T*K] int32
    dropped_stream: jnp.ndarray | None = None  # [] int32 beyond-cap rows
    # K-overflow continuation aux (stream mode, overflow_tiles > 0):
    # the OT deepest tiles by instance count; the compositor resumes
    # them over extra K-windows of their stream segments so per-tile
    # depth complexity beyond K composites exactly (the reference is
    # exact at any depth, `rasterizer_impl.cu:343-384`).
    ov_tiles: jnp.ndarray | None = None   # [OT] int32 tile ids (distinct)
    ov_starts: jnp.ndarray | None = None  # [OT] int32 segment starts
    ov_counts: jnp.ndarray | None = None  # [OT] int32 full (unclamped-by-
                                          # K) in-stream segment lengths


def expand_instance_keys(
    proj: ProjectedSplats,
    grid: tuple[int, int],
    max_tiles_per_gaussian: int,
):
    """Enumerate (splat, tile) instances and pack their sort keys.

    Shared by `bin_splats` (single device) and `parallel.route` (the
    distributed point→tile all-to-all, which sorts by the same key —
    destination members own contiguous tile ranges, so tile-major key
    order is also destination-major).

    Returns (key [P, M] uint32 — tile<<depth_bits | depth-msbs, padding
    slots = 0xFFFFFFFF; gauss_id [P, M] int32; num_instances [];
    dropped_rect []; depth_bits int static).
    """
    gx, gy = grid
    num_tiles = gx * gy
    P = proj.valid.shape[0]
    M = max_tiles_per_gaussian

    r = jnp.arange(M, dtype=jnp.int32)[None, :]                    # [1, M]
    rw = (proj.rect_max[:, 0] - proj.rect_min[:, 0])[:, None]      # [P, 1]
    tiles = proj.tiles_touched[:, None]                            # [P, 1]
    safe_rw = jnp.maximum(rw, 1)
    # r // rw and r % rw via float reciprocal — vectorized int32 division
    # is very slow on the TPU VPU.  Exact for r < 2^10, rw < 2^10.
    q = jnp.floor((r.astype(jnp.float32) + 0.5)
                  / safe_rw.astype(jnp.float32)).astype(jnp.int32)
    tx = proj.rect_min[:, 0:1] + (r - q * safe_rw)
    ty = proj.rect_min[:, 1:2] + q
    inst_ok = proj.valid[:, None] & (r < tiles)

    # Exact circle-vs-tile test: drop corner tiles the cutoff circle
    # never reaches (the CUDA reference pays this waste,
    # `rasterizer_impl.cu:72-113`).
    px = jnp.clip(proj.xy[:, 0:1], tx * TILE, tx * TILE + (TILE - 1))
    py = jnp.clip(proj.xy[:, 1:2], ty * TILE, ty * TILE + (TILE - 1))
    dx = proj.xy[:, 0:1] - px
    dy = proj.xy[:, 1:2] - py
    rc = proj.cut_radius[:, None]
    inst_ok = inst_ok & (dx * dx + dy * dy <= rc * rc)

    tile_id = jnp.where(inst_ok, ty * gx + tx, num_tiles)          # [P, M]
    dropped_rect = jnp.sum(
        jnp.where(proj.valid, jnp.maximum(proj.tiles_touched - M, 0), 0))
    num_instances = jnp.sum(inst_ok.astype(jnp.int32))
    gauss_id = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, M))

    # One packed u32 (tile | depth-msbs) key: positive-float depth bits
    # are order-preserving as unsigned ints, so this reproduces the
    # reference's 64-bit (tile, depth) radix order
    # (`rasterizer_impl.cu:104-107`) with depth quantized to >= 18 bits.
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    assert depth_bits >= 18, (num_tiles, "tile grid too large for u32 key")
    depth = jnp.broadcast_to(proj.depth[:, None], (P, M))
    dbits = jax.lax.bitcast_convert_type(
        depth.astype(jnp.float32), jnp.uint32) >> (31 - depth_bits)
    key = ((tile_id.astype(jnp.uint32) << depth_bits)
           | (dbits & jnp.uint32((1 << depth_bits) - 1)))
    key = jnp.where(inst_ok, key, jnp.uint32(0xFFFFFFFF))
    return key, gauss_id, num_instances, dropped_rect, depth_bits


def expand_instance_keys_offset(
    proj: ProjectedSplats,
    grid: tuple[int, int],
    cap: int,
):
    """`expand_instance_keys` without the dense [P, M] slot matrix:
    memory and sort cost are bound by the total INSTANCE budget `cap`,
    not by P x (max tiles touched by any one splat).

    The dense expansion gives every splat the same static per-splat slot
    count M — heavy-tailed scenes (un-densified init clouds routinely
    have p50 ~ 20 tiles/splat with a max in the thousands) force M to
    the max and the [P, M] intermediates toward tens of GB.  This is
    the TPU-static analogue of the reference's exact allocation
    (InclusiveSum over tiles_touched + duplicateWithKeys,
    `rasterizer_impl.cu:343-360`):

      1. exclusive scan of tiles_touched -> per-splat start offsets;
      2. scatter each splat id at its start into a [cap] owner array
         (starts are strictly increasing, so positions are unique) and
         recover per-instance owners with a running max;
      3. rank = slot - start indexes the splat's tile rect row-major —
         identical slot enumeration (and exact circle-vs-tile cull) to
         the dense path, so downstream sort/range logic is unchanged.

    Instances beyond `cap` are dropped and counted in dropped_rect
    (the budget-overflow counter recalibration watches).

    Returns (key [cap] u32, gauss_id [cap] i32, num_instances,
    dropped_rect, depth_bits) — flat, sort-ready.
    """
    gx, gy = grid
    num_tiles = gx * gy
    P = proj.valid.shape[0]
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits
    assert depth_bits >= 18, (num_tiles, "tile grid too large for u32 key")

    t_p = jnp.where(proj.valid, proj.tiles_touched, 0)         # [P]
    offs = jnp.cumsum(t_p) - t_p                               # exclusive
    total = offs[-1] + t_p[-1]
    dropped_rect = jnp.maximum(total - cap, 0)

    # owner recovery: splat ids at their start offsets, running max.
    # Positions are unique among t_p > 0 splats (offsets strictly grow);
    # out-of-cap starts fall off via mode="drop".
    p_iota = jnp.arange(P, dtype=jnp.int32)
    has = t_p > 0
    own0 = jnp.full(cap, -1, jnp.int32).at[
        jnp.where(has, offs, cap)].max(
        jnp.where(has, p_iota, -1), mode="drop")
    owner = jax.lax.associative_scan(jnp.maximum, own0)        # [cap]

    # single [P, 9] pack -> ONE row gather (gathers cost per ROW on TPU;
    # all integer fields are < 2^24 so the f32 lanes are exact)
    rw = jnp.maximum(
        proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(jnp.float32)
    pack = jnp.stack([
        proj.rect_min[:, 0].astype(jnp.float32),
        proj.rect_min[:, 1].astype(jnp.float32),
        rw,
        proj.xy[:, 0], proj.xy[:, 1],
        proj.cut_radius,
        proj.depth,
        offs.astype(jnp.float32),
        t_p.astype(jnp.float32),
    ], axis=1)                                                 # [P, 9]
    g = jnp.take(pack, jnp.maximum(owner, 0), axis=0)          # [cap, 9]

    i_iota = jnp.arange(cap, dtype=jnp.int32)
    rank = i_iota - g[:, 7].astype(jnp.int32)
    t_own = g[:, 8].astype(jnp.int32)
    ok = (owner >= 0) & (rank >= 0) & (rank < t_own)

    # rank // rw, rank % rw via float reciprocal (same trick/domain as
    # the dense path: exact while rank + 0.5 is ulp-clear of a multiple
    # of rw, guaranteed for rank < 2^20 / rw)
    q = jnp.floor((rank.astype(jnp.float32) + 0.5) / g[:, 2]
                  ).astype(jnp.int32)
    rw_i = g[:, 2].astype(jnp.int32)
    tx = g[:, 0].astype(jnp.int32) + rank - q * rw_i
    ty = g[:, 1].astype(jnp.int32) + q

    # exact circle-vs-tile cull, as in the dense expansion
    px = jnp.clip(g[:, 3], (tx * TILE).astype(jnp.float32),
                  (tx * TILE + (TILE - 1)).astype(jnp.float32))
    py = jnp.clip(g[:, 4], (ty * TILE).astype(jnp.float32),
                  (ty * TILE + (TILE - 1)).astype(jnp.float32))
    dx = g[:, 3] - px
    dy = g[:, 4] - py
    ok = ok & (dx * dx + dy * dy <= g[:, 5] * g[:, 5])

    num_instances = jnp.sum(ok.astype(jnp.int32))
    tile_id = jnp.where(ok, ty * gx + tx, num_tiles)
    dbits = jax.lax.bitcast_convert_type(
        g[:, 6], jnp.uint32) >> (31 - depth_bits)
    key = ((tile_id.astype(jnp.uint32) << depth_bits)
           | (dbits & jnp.uint32((1 << depth_bits) - 1)))
    key = jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))
    return (key, jnp.maximum(owner, 0), num_instances, dropped_rect,
            depth_bits)


def bin_splats(
    proj: ProjectedSplats,
    grid: tuple[int, int],
    max_tiles_per_gaussian: int,
    max_per_tile: int,
    grad_cap: int | None = None,
    stream: bool = False,
    stream_cap: int | None = None,
    expansion: str = "dense",
    overflow_tiles: int = 0,
    overflow_rounds: int = 0,
    split_m_small: int = 8,
    split_p_big: int = 8192,
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
      stream: skip the dense [T, K] lists and return the sorted
        instance-id prefix + per-tile offsets instead (the Pallas stream
        compositor's input; idx/mask come back None).
      stream_cap: stream prefix length (default T*K — exact whenever
        dropped_tile == 0; overflow beyond it is counted in
        dropped_stream and those tiles render from clamped windows).
      expansion: "dense" ([P, M] slot matrix — fastest when every
        splat's tile footprint is small) or "offset" (exclusive-scan
        expansion, `expand_instance_keys_offset` — instance-budget-
        bound, the only feasible mode for heavy-tailed footprints; M
        is then ignored).  `ops.autobudget.derive` picks per scene.
    """
    gx, gy = grid
    num_tiles = gx * gy
    P = proj.valid.shape[0]
    M = max_tiles_per_gaussian
    K = max_per_tile

    if expansion == "offset":
        ecap = stream_cap if stream_cap is not None else num_tiles * K
        key_flat, gid_flat, num_instances, dropped_rect, depth_bits = (
            expand_instance_keys_offset(proj, grid, ecap))
    elif expansion == "split":
        # Two-class dense expansion: the sort input [P, M] is mostly
        # padding when M is the per-splat MAX footprint (bench scene:
        # mean 5.5 tiles vs M=20 -> 79% pad, and the 2.6M-key sort was
        # 3.0 ms/step of the 800² step).  Give every splat M_small
        # slots and only the `split_p_big` largest footprints (top_k by
        # tiles_touched) the full M — one concatenated key array, one
        # sort, ~2x fewer keys.  Under-covered big splats (tails past
        # split_p_big with tt > M_small) are truncated AND counted in
        # dropped_rect, so the budget controller recalibrates exactly
        # as for the other budgets.
        Ms = split_m_small
        Pb = min(split_p_big, P)
        tt = jnp.where(proj.valid, proj.tiles_touched, 0)
        _, big_idx = jax.lax.top_k(tt, Pb)
        big_idx = big_idx.astype(jnp.int32)
        big_mask = jnp.zeros(P, bool).at[big_idx].set(True)
        proj_a = proj._replace(valid=proj.valid & ~big_mask)
        key_a, gid_a, ni_a, dr_a, depth_bits = expand_instance_keys(
            proj_a, grid, Ms)
        proj_b = jax.tree.map(lambda x: jnp.take(x, big_idx, axis=0),
                              proj)
        key_b, gid_b_local, ni_b, dr_b, _ = expand_instance_keys(
            proj_b, grid, M)
        key_flat = jnp.concatenate([key_a.reshape(-1),
                                    key_b.reshape(-1)])
        gid_flat = jnp.concatenate([
            gid_a.reshape(-1),
            jnp.take(big_idx, gid_b_local.reshape(-1))])
        num_instances = ni_a + ni_b
        dropped_rect = dr_a + dr_b
    else:
        key, gauss_id, num_instances, dropped_rect, depth_bits = (
            expand_instance_keys(proj, grid, M))
        key_flat, gid_flat = key.reshape(-1), gauss_id.reshape(-1)
    key_sorted, id_sorted = jax.lax.sort(
        (key_flat, gid_flat), dimension=0, num_keys=1,
        is_stable=False)
    tile_sorted = (key_sorted >> depth_bits).astype(jnp.int32)

    # --- per-tile ranges ---
    boundaries = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = boundaries[:-1]
    counts = boundaries[1:] - starts

    if stream:
        # With dropped_tile == 0, sum(counts) <= T*K, so the T*K-row
        # prefix holds every surviving instance; overflow beyond it is
        # counted (those tiles render from clamped windows).
        icap = stream_cap if stream_cap is not None else num_tiles * K
        dropped_stream = jnp.maximum(boundaries[-1] - icap, 0)
        sstarts = jnp.minimum(starts, icap)
        scounts = jnp.minimum(jnp.minimum(counts, K),
                              icap - sstarts)
        ov_tiles = ov_starts = ov_counts = None
        base_drop = jnp.sum(jnp.maximum(counts - K, 0))
        if overflow_tiles > 0:
            # Continuation aux: the OT deepest tiles (full in-stream
            # segment lengths — clamped by the stream cap, never by K).
            # Tiles whose count fits in K land in the set harmlessly
            # (their continuation windows come out empty).  dropped_tile
            # then counts only instances beyond base + continuation
            # coverage — the counter the trainer asserts to zero.
            fullc = jnp.minimum(counts, jnp.maximum(icap - sstarts, 0))
            ovc, ov_tiles = jax.lax.top_k(
                fullc, min(overflow_tiles, num_tiles))
            ov_tiles = ov_tiles.astype(jnp.int32)
            ov_starts = jnp.take(sstarts, ov_tiles)
            # ASCENDING segment-start order: the backward stream
            # kernel's overlap handling relies on windows being written
            # in ascending-start order (a later window's real rows must
            # land after an earlier window's zero tail).
            order = jnp.argsort(ov_starts)
            ov_tiles = jnp.take(ov_tiles, order)
            ov_starts = jnp.take(ov_starts, order)
            ov_counts = jnp.take(ovc, order)
            covered_extra = jnp.sum(jnp.minimum(
                jnp.maximum(ovc - K, 0), overflow_rounds * K))
            dropped_tile = base_drop - covered_extra
        else:
            dropped_tile = base_drop
        sids = id_sorted[:icap] if id_sorted.shape[0] >= icap else \
            jnp.pad(id_sorted, (0, icap - id_sorted.shape[0]))
        return TileBins(
            idx=None, mask=None, counts=scounts,
            num_instances=num_instances, dropped_rect=dropped_rect,
            dropped_tile=dropped_tile, stream_starts=sstarts,
            stream_ids=sids, dropped_stream=dropped_stream,
            ov_tiles=ov_tiles, ov_starts=ov_starts, ov_counts=ov_counts)

    # --- dense [T, K] lists: one windowed dynamic-slice gather per tile
    # (K consecutive elements starting at starts[t]) — wide contiguous
    # transactions instead of T*K scalar gathers (~10x on TPU).  The
    # sequential XLA loop this lowers to costs ~1.6 µs/tile (measured
    # 4 ms/step at T=2500); the stream compositor path (`stream=True`)
    # avoids building these lists at all. ---
    slot = jnp.arange(K, dtype=jnp.int32)[None, :]
    mask = slot < counts[:, None]
    id_padded = jnp.pad(id_sorted, (0, K))
    idx = jax.vmap(
        lambda s: jax.lax.dynamic_slice(id_padded, (s,), (K,)))(starts)
    idx = jnp.where(mask, idx, 0)

    dropped_tile = jnp.sum(jnp.maximum(counts - K, 0))

    gsort_gauss = gsort_pos = dropped_grad = None
    if grad_cap is not None:
        # Real instances sit in the sorted prefix [0, num_instances); map
        # each to its dense [T, K] slot with pure index math (no scatter):
        # position j in tile t sits at depth rank j - starts[t].
        cap = min(grad_cap, id_sorted.shape[0])
        tile_c = tile_sorted[:cap]
        starts_ext = jnp.append(starts, boundaries[-1])
        k_in_tile = jnp.arange(cap, dtype=jnp.int32) - jnp.take(
            starts_ext, jnp.clip(tile_c, 0, num_tiles), axis=0)
        valid_g = (tile_c < num_tiles) & (k_in_tile < K)
        gsort_pos = jnp.where(valid_g, tile_c * K + k_in_tile,
                              jnp.int32(num_tiles * K))
        # Invalid slots carry zero gradient rows; spread them over distinct
        # in-bounds targets (a no-op add) so the scatter never sees an
        # out-of-bounds or heavily-duplicated index.
        spread = jnp.arange(cap, dtype=jnp.int32) % P
        gsort_gauss = jnp.where(valid_g, id_sorted[:cap], spread)
        dropped_grad = jnp.maximum(num_instances - cap, 0)

    return TileBins(
        idx=idx,
        mask=mask,
        counts=jnp.minimum(counts, K),
        num_instances=num_instances,
        dropped_rect=dropped_rect,
        dropped_tile=dropped_tile,
        gsort_gauss=gsort_gauss,
        gsort_pos=gsort_pos,
        dropped_grad=dropped_grad,
    )
