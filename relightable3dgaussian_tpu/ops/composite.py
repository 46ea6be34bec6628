"""Front-to-back alpha compositing over dense per-tile splat lists.

TPU-native replacement for the reference `renderCUDA`
(`cuda_rasterizer/forward.cu:388-561`).  Instead of one 16x16 thread block
per tile with divergent early-exit, all tiles are composited together:

  * a `lax.scan` walks the per-tile splat lists in depth-ordered chunks;
  * per chunk, alpha/transmittance are computed for all (tile, splat, pixel)
    triples on the VPU with *masked saturation* replacing divergent
    `continue`/`break` (exclusive cumprod = transmittance, exclusive
    cumulative-or = the early-stop flag);
  * the actual blend is one batched matmul per chunk —
    einsum('tkp,tkf->tpf') — which runs on the MXU.  Color, depth, opacity
    and all auxiliary feature channels ride the same matmul.

The backward pass needs no atomics (the reference uses atomicAdd,
`backward.cu:552-611`): JAX autodiff through the scan yields per-chunk
gradient matmuls plus gather-transpose scatter-adds, and `jax.checkpoint`
on the chunk body recomputes weights instead of storing the
[tiles, K, 256] alpha tensor — the same recompute-from-carry strategy the
CUDA backward uses, expressed as program structure.

Compositing semantics match the reference exactly:
  alpha = min(0.99, opacity * exp(power)); skip if power > 0 or
  alpha < 1/255; stop the pixel before applying a splat that would drive
  transmittance below 1e-4.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TileBins
from .projection import TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_STOP = 1e-4


class CompositeOutput(NamedTuple):
    image: jnp.ndarray      # [Hpad, Wpad, F] blended features (no background)
    final_t: jnp.ndarray    # [Hpad, Wpad] remaining transmittance
    n_contrib: jnp.ndarray  # [Hpad, Wpad] int32, 1-based index of last
                            # applied splat in the tile's depth order


def _chunk_body(pixx, pixy, carry, chunk, *, xy, conic, opacity, feats):
    """Composite one depth-chunk of splats into all tiles.

    carry: (T_cur [T,P2], stopped [T,P2] bool, accum [T,P2,F], last [T,P2])
    chunk: (ids [T,kc], msk [T,kc], k_offset [])
    """
    t_cur, stopped, accum, last = carry
    ids, msk, k_offset = chunk

    g_xy = xy[ids]                      # [T, kc, 2]
    g_con = conic[ids]                  # [T, kc, 3]
    g_op = opacity[ids]                 # [T, kc]
    g_feat = feats[ids]                 # [T, kc, F]

    dx = g_xy[..., 0][:, :, None] - pixx[:, None, :]   # [T, kc, P2]
    dy = g_xy[..., 1][:, :, None] - pixy[:, None, :]
    a = g_con[..., 0][:, :, None]
    b = g_con[..., 1][:, :, None]
    c = g_con[..., 2][:, :, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, g_op[..., None] * jnp.exp(power))

    valid = msk[..., None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    ea = jnp.where(valid, alpha, 0.0)

    # Transmittance before each splat: T_carry * prod_{j<k}(1 - ea_j).
    cum = jnp.cumprod(1.0 - ea, axis=1)
    excl = jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    t_before = t_cur[:, None, :] * excl

    # A valid splat that would push T below T_STOP stops the pixel *before*
    # being applied (`forward.cu:481-485`).
    trigger = valid & (t_before * (1.0 - alpha) < T_STOP)
    trig_cum = jnp.cumsum(trigger.astype(jnp.int32), axis=1)
    stopped_before = stopped[:, None, :] | ((trig_cum - trigger) > 0)
    applied = valid & ~stopped_before & ~trigger

    w = jnp.where(applied, alpha * t_before, 0.0)      # [T, kc, P2]
    # HIGHEST keeps the blend at true fp32 (parity with the CUDA reference);
    # bf16 weight×feature products visibly bias deep composites.
    accum = accum + jax.lax.dot_general(
        w, g_feat,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)             # [T, P2, F]

    t_new = t_cur * jnp.prod(jnp.where(applied, 1.0 - alpha, 1.0), axis=1)
    stopped_new = stopped | jnp.any(trigger & ~stopped_before, axis=1)

    k_idx = k_offset + jnp.arange(w.shape[1], dtype=jnp.int32)
    contrib = jnp.max(
        jnp.where(applied, k_idx[None, :, None] + 1, 0), axis=1)
    last = jnp.maximum(last, contrib)

    return (t_new, stopped_new, accum, last), None


def composite_from_data(
    data: jnp.ndarray,
    counts: jnp.ndarray,
    tile_ids: jnp.ndarray,
    grid: tuple[int, int],
    chunk: int = 32,
):
    """jnp twin of `composite_pallas_from_data`: tile-major compositing of
    pre-gathered instance rows [Tl, K, 6+F] (xy|conic|opacity|feats),
    counts [Tl], global tile_ids [Tl].  Returns (img [Tl, 256, F],
    final_t [Tl, 256], n_contrib [Tl, 256])."""
    gx, gy = grid
    Tl, K, D = data.shape
    F = D - 6
    P2 = TILE * TILE
    assert K % chunk == 0, (K, chunk)
    nchunks = K // chunk

    p = jnp.arange(P2, dtype=jnp.int32)
    pixx = ((tile_ids % gx)[:, None] * TILE + (p % TILE)[None, :]
            ).astype(jnp.float32)
    pixy = ((tile_ids // gx)[:, None] * TILE + (p // TILE)[None, :]
            ).astype(jnp.float32)

    chunks = jnp.moveaxis(data.reshape(Tl, nchunks, chunk, D), 1, 0)
    k_offsets = jnp.arange(nchunks, dtype=jnp.int32) * chunk

    def body(carry, inp):
        t_cur, stopped, accum, last = carry
        cdata, k_off = inp
        g_xy = cdata[..., 0:2]
        g_con = cdata[..., 2:5]
        g_op = cdata[..., 5]
        g_feat = cdata[..., 6:]
        k_ids = k_off + jnp.arange(chunk, dtype=jnp.int32)
        msk = k_ids[None, :] < counts[:, None]

        dx = g_xy[..., 0][:, :, None] - pixx[:, None, :]
        dy = g_xy[..., 1][:, :, None] - pixy[:, None, :]
        a = g_con[..., 0][:, :, None]
        b = g_con[..., 1][:, :, None]
        c = g_con[..., 2][:, :, None]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, g_op[..., None] * jnp.exp(power))
        valid = msk[..., None] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        ea = jnp.where(valid, alpha, 0.0)
        cum = jnp.cumprod(1.0 - ea, axis=1)
        excl = jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        t_before = t_cur[:, None, :] * excl
        trigger = valid & (t_before * (1.0 - alpha) < T_STOP)
        trig_cum = jnp.cumsum(trigger.astype(jnp.int32), axis=1)
        stopped_before = stopped[:, None, :] | ((trig_cum - trigger) > 0)
        applied = valid & ~stopped_before & ~trigger
        w = jnp.where(applied, alpha * t_before, 0.0)
        accum = accum + jax.lax.dot_general(
            w, g_feat, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        t_new = t_cur * jnp.prod(
            jnp.where(applied, 1.0 - alpha, 1.0), axis=1)
        stopped_new = stopped | jnp.any(trigger & ~stopped_before, axis=1)
        contrib = jnp.max(
            jnp.where(applied, k_ids[None, :, None] + 1, 0), axis=1)
        last = jnp.maximum(last, contrib)
        return (t_new, stopped_new, accum, last), None

    init = (
        jnp.ones((Tl, P2), jnp.float32),
        jnp.zeros((Tl, P2), bool),
        jnp.zeros((Tl, P2, F), jnp.float32),
        jnp.zeros((Tl, P2), jnp.int32),
    )
    (final_t, _, accum, last), _ = jax.lax.scan(
        jax.checkpoint(body), init, (chunks, k_offsets))
    return accum, final_t, last


def composite(
    bins: TileBins,
    xy: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    feats: jnp.ndarray,
    grid: tuple[int, int],
    chunk: int = 32,
    tile_axis: str | None = None,
    tile_shards: int = 1,
) -> CompositeOutput:
    """Blend features front-to-back for every tile.

    Args:
      bins: dense per-tile lists from `bin_splats`.
      xy: [P, 2] splat screen positions.
      conic: [P, 3] inverse 2D covariances.
      opacity: [P] splat opacities.
      feats: [P, F] per-splat blended channels (color, depth, 1s for
        opacity, auxiliary features, ... — caller chooses the layout).
      grid: (gx, gy).
      chunk: static depth-chunk length (contraction dim of the blend
        matmul; 32-128 are reasonable).
      tile_axis: inside `shard_map`, the mesh axis to shard the tile loop
        over — each member composites T/tile_shards tiles and the image
        is re-assembled with an `all_gather` over that axis (the
        sequence-parallel analogue of SURVEY.md §2.7).
      tile_shards: static size of `tile_axis` (XLA needs static shapes).

    Returns:
      CompositeOutput with a padded [gy*TILE, gx*TILE, F] image.
    """
    gx, gy = grid
    T, K = bins.idx.shape
    F = feats.shape[-1]
    P2 = TILE * TILE
    assert K % chunk == 0, (K, chunk)
    nchunks = K // chunk

    idx_all, mask_all = bins.idx, bins.mask
    if tile_axis is not None:
        assert T % tile_shards == 0, (T, tile_shards)
        Tl = T // tile_shards
        my = jax.lax.axis_index(tile_axis)
        start = my * Tl
        idx_all = jax.lax.dynamic_slice_in_dim(idx_all, start, Tl, axis=0)
        mask_all = jax.lax.dynamic_slice_in_dim(mask_all, start, Tl, axis=0)
        tile_ids = start + jnp.arange(Tl, dtype=jnp.int32)
        Tc = Tl
    else:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
        Tc = T

    p = jnp.arange(P2, dtype=jnp.int32)
    pixx = ((tile_ids % gx)[:, None] * TILE + (p % TILE)[None, :]
            ).astype(jnp.float32)
    pixy = ((tile_ids // gx)[:, None] * TILE + (p // TILE)[None, :]
            ).astype(jnp.float32)

    ids = jnp.moveaxis(idx_all.reshape(Tc, nchunks, chunk), 1, 0)
    msk = jnp.moveaxis(mask_all.reshape(Tc, nchunks, chunk), 1, 0)
    k_offsets = jnp.arange(nchunks, dtype=jnp.int32) * chunk

    body = functools.partial(
        _chunk_body, pixx, pixy,
        xy=xy, conic=conic, opacity=opacity, feats=feats)
    body = jax.checkpoint(body)

    init = (
        jnp.ones((Tc, P2), jnp.float32),
        jnp.zeros((Tc, P2), bool),
        jnp.zeros((Tc, P2, F), jnp.float32),
        jnp.zeros((Tc, P2), jnp.int32),
    )
    (final_t, _, accum, last), _ = jax.lax.scan(
        body, init, (ids, msk, k_offsets))

    if tile_axis is not None:
        gather = functools.partial(
            jax.lax.all_gather, axis_name=tile_axis, axis=0, tiled=True)
        final_t = gather(final_t)
        accum = gather(accum)
        last = gather(last)

    def untile(x):
        extra = x.shape[2:]
        x = x.reshape(gy, gx, TILE, TILE, *extra)
        x = jnp.moveaxis(x, 2, 1)  # [gy, TILE, gx, TILE, ...]
        return x.reshape(gy * TILE, gx * TILE, *extra)

    return CompositeOutput(
        image=untile(accum),
        final_t=untile(final_t),
        n_contrib=untile(last),
    )
