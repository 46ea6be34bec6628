"""Pallas TPU kernel for front-to-back tile compositing (fwd + custom VJP).

Drop-in accelerated twin of `ops.composite.composite` (the pure-jnp
version stays as the correctness oracle).  Why a kernel: XLA materializes
every [T, chunk, 256] intermediate of the chunk body in HBM (~10 tensors
x 82 MB per chunk step at 800^2), making the compositor HBM-bound at
~400 ms per fwd+bwd.  Here each tile's whole splat list streams through
VMEM once and all per-pixel state (transmittance, stop flags, the [256, F]
accumulator) lives on-chip, so traffic drops to the gathered splat data
(~72 MB/pass) — plus a per-tile early exit the dense jnp version cannot
express: a tile stops integrating as soon as every pixel saturates, the
exact optimization the CUDA `renderCUDA` gets from its divergent break
(`forward.cu:477-485`).

The layout: splat attributes are pre-gathered (XLA) into one
[T, K, D] array, D = [xy(2) | conic(3) | opacity(1) | feats(F)].  The
kernel walks K in chunks of C, doing the alpha/transmittance math on
[C, 256] VPU tiles and one [256, C] x [C, F] MXU matmul per chunk.
Transmittance is carried in log space; the in-chunk exclusive prefix
product is a cumsum of log1p(-alpha).

The backward kernel re-runs the forward sweep storing per-chunk carry
checkpoints (logT, stop flags) in VMEM — O(K/C x 256) scratch — then
sweeps in reverse accumulating gradients w.r.t. the gathered data; the
XLA-level gather transpose scatter-adds those into per-splat gradients
(the sort-based reduction that replaces the CUDA atomicAdd backward,
`backward.cu:552-611`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileBins
from .composite import ALPHA_MAX, ALPHA_MIN, T_STOP, CompositeOutput
from .projection import TILE

P2 = TILE * TILE  # 256 pixels per tile

# Route single-device compositing through the fused custom_vjp whose
# backward reduces gradients on-chip (`reduce_rows_pallas`) instead of
# an XLA scatter-add.  Module-level so benches can A/B the two paths.
# Default OFF: measured LOSER on v5e (53.8 vs 47.8 ms/step, 800² bench)
# — the serial VMEM read-modify-write chain, even with conflict-checked
# 8-row batching, cannot beat XLA's ~13 ms row-serial scatter floor.
# Kept (tested) as the A/B harness for future reduction experiments.
FUSED_REDUCE = False
LOG_T_STOP = -9.210340371976184  # log(1e-4)

# Backward gradient reductions as one stacked moment matmul (see
# `_local_basis`) vs six per-element product + cross-lane-reduce chains.
# Measured LOSER on v5e (41.3 vs 38.9 ms/step, in-process A/B): the f32
# [2C,P2]x[P2,6] matmul lane-pads its output 6->128 and costs more MXU
# time than the VPU's six strided lane reductions.  Kept (tested) as the
# A/B harness: `tools/bench_probe.py --absweep MOMENT_BWD=1,0`.
MOMENT_BWD = False
# Forward Σ_k la as a [1,C]x[C,P2] MXU matmul vs a VPU sublane reduce.
MXU_SUMLA = True
# Prefix-sum tri-matmuls with bf16 operands + f32 MXU accumulation
# instead of f32 operands — exact single pass for the 0/1 trigger
# scans, hi/lo split (two passes, ~2^-17 per-term relative error) for
# logT/gradient scans.  Measured LOSER on v5e (38.2 vs 36.8 ms/step,
# in-process A/B at 800²/K=288 single-chunk): the [288, 288] x
# [288, 256] scans are too small to be MXU-pass-bound, so the split's
# extra pass + conversions cost more than the f32 passes saved.  Kept
# (tested) as the A/B harness:
# `tools/bench_probe.py --absweep BF16_SCAN=1,0`.
BF16_SCAN = False
# Gaussian exponent as a [C,6]x[6,P2] moment matmul (see
# `_chunk_quantities`) vs the per-element VPU quadratic chain.
# Measured LOSER on v5e (41.9 vs 38.4 ms/step): the kernels are
# MXU-bound (tri-matmul cumsums), so adding a [C,6->128]@[6,P2] pass per
# chunk costs ~3.5 ms while the VPU chain it replaces was free slack.
# Kept as the A/B harness: `tools/bench_probe.py --absweep POWER_MXU=1,0`.
POWER_MXU = False
# First-trigger detection as a VPU min-reduce over trigger positions
# instead of a second tri-matmul cumsum (exact: t_before is
# non-increasing, so 'any trigger before k' == 'k > first trigger pos').
# Measured LOSER on v5e (42.8 vs 37.9 ms/step): a cross-sublane
# min-reduce on [C, P2] costs more than the [C,C]x[C,P2] MXU cumsum it
# replaces — sublane reductions are the expensive direction on the VPU.
# Kept as the A/B harness: `tools/bench_probe.py --absweep TRIG_MIN=1,0`.
TRIG_MIN = False
# Statically UNROLL the per-chunk loops when nchunks <= UNROLL_MAX
# (0 = off -> lax.while_loop / fori_loop).  Chunking at C < K cuts the
# prefix-sum tri-matmul FLOPs ~(K/C)x ([C,C]x[C,P2] per chunk vs
# [K,K]x[K,P2]), but the r3 chunk sweep measured the while_loop's
# per-iteration control overhead eating that win; a static unroll is
# straight-line code with the small-C cumsums and no carry-dependent
# control.  Chunks past a tile's count compute fully-masked zeros
# (identical results; the dynamic loop skipped them).
# Measured WINNER on v5e (r5): chunk=96 unrolled 32.0-32.6 ms vs the
# single-chunk-288 specialization's 33.9 ms on the 800² bench (fwd
# kernel 7.1 -> 3.3 ms in the xplane trace; the r3 negative result on
# chunking was the while_loop, not the chunks).  Default ON; autobudget
# picks chunk=96 when K fits within UNROLL_MAX chunks.
# A/B: `tools/bench_probe.py --set composite_pallas.UNROLL_MAX=0`.
UNROLL_MAX = 8
# Replace the row-serial XLA scatter-add in the stream path's gradient
# reduction (~7.2 ms/step at 800²: ~13 ns/row, the TPU's random-write
# floor) with sort-by-gaussian + row gather + `reduce_rows_sorted` — a
# Pallas kernel that reduces each block of gid-SORTED gradient rows
# with ONE one-hot MXU matmul into a VMEM-resident packed accumulator.
# Sorted ids make every block's output span contiguous (<= C/packs + 1
# accumulator rows), so the accumulate is a dynamic-offset vector RMW,
# not a per-row random write.  Requires lane-group-replicated gradient
# rows (D <= 32); wider features fall back to the scatter.
# A/B: `tools/bench_probe.py --set composite_pallas.SEG_REDUCE=0`.
SEG_REDUCE = True
SEG_BLOCK = 512  # rows per reduction block (one MXU matmul each;
                 # sweep r5: 512 -> 27.3 ms, 256 -> 27.7, 128 -> 28.2)
# Pin the lane pad of the stream source [P, 6+F] -> [P, 128] BEFORE the
# row gather with an optimization_barrier.  Without it, XLA rewrites
# gather(pad(src)) into pad(gather(src)) — sound, but the pad then runs
# at [cap, 128] (two ~285 MB passes at cap=557k, profiled pad.6 +
# broadcast_select ≈ 5.2 ms/step in r4) instead of at [P, 128] (~0.3
# ms).  A/B: `tools/bench_probe.py --set composite_pallas.STREAM_BARRIER=0`.
STREAM_BARRIER = True



def _cumsum0(x, exact01: bool = False):
    """Inclusive prefix sum along axis 0 as a lower-triangular matmul
    (Pallas TPU has no cumsum primitive; an [C, C] tril x [C, P2] MXU
    matmul is the fast in-kernel equivalent).

    With BF16_SCAN the operands feed the MXU as bf16 with f32
    accumulation — the MXU's native full-rate mode vs the multi-pass
    f32 emulation.  `exact01=True` marks inputs drawn from {0, 1}
    (trigger indicators): one bf16 pass is then EXACT (0/1 and the
    tril mask are bf16-representable; accumulation is f32).  Otherwise
    a hi/lo split — x = bf16(x) + bf16(x - hi) — runs two full-rate
    passes summed in f32, bounding the relative error per term at
    ~2^-17; the compositor's prefix sums accumulate |logT| ≤ 9.2
    (integration stops at T < 1e-4), so the absolute logT error stays
    below ~1e-4, orders under the f32 parity-test tolerances."""
    C = x.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    if BF16_SCAN:
        L = (jj <= ii).astype(jnp.bfloat16)
        dot = lambda a: jax.lax.dot_general(
            L, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if exact01:
            return dot(x.astype(jnp.bfloat16))
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(hi) + dot(lo)
    L = (jj <= ii).astype(jnp.float32)
    return jax.lax.dot_general(
        L, x.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

TB = 4  # tiles per program (grid blocking: bigger DMA blocks,
        # fewer grid steps; early exit stays per-tile)


def _local_basis():
    """Tile-LOCAL pixel coords and the moment basis V = [px², px, 1,
    py, py², px·py] as a [6, P2] matrix.

    The backward reduces all six per-splat gradient sums (conic, mean,
    opacity) with ONE [2C, P2] x [P2, 6] MXU matmul against V instead of
    six per-element product + cross-lane-reduction chains: for fixed
    splat k, ∂power/∂θ is quadratic in pixel coords, so Σ_p g·∂power/∂θ
    is a linear combination of the moments Σ_p g·{1, px, py, px², py²,
    px·py}.  Tile-local coordinates keep the moment magnitudes ≤ (16+r)²
    so the expansion loses no f32 precision to the global pixel offset."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P2), 1)
    plx = (p % TILE).astype(jnp.float32)
    ply = (p // TILE).astype(jnp.float32)
    one = jnp.ones((1, P2), jnp.float32)
    V = jnp.concatenate([plx * plx, plx, one, ply, ply * ply, plx * ply],
                        axis=0)                          # [6, P2]
    return plx, ply, V


def _chunk_quantities(data_ref, tb, k0, C, F, count, ox, oy,
                      plx, ply, V):
    """Common per-chunk math for splats [k0, k0+C) against the tile's
    256 pixels, in the TILE-LOCAL frame (xs/ys shifted by the tile
    origin — scalar-exact; shared by forward and backward, so the
    backward's recompute is bit-identical to the forward).

    Returns (chunk fields..., power, raw_alpha, alpha, valid) — callers
    drop what they don't use (dead code after tracing).

    With POWER_MXU the Gaussian exponent is evaluated as ONE
    [C, 6] x [6, P2] matmul against the moment basis V (power is
    quadratic in pixel coords), replacing the ~8-op/element VPU chain;
    the output is full-lane [C, P2] so nothing is wasted on lane pad
    (unlike the reduction-direction MOMENT_BWD matmul, which lost)."""
    chunk = data_ref[tb, pl.ds(k0, C), :]           # [C, D]
    xs = chunk[:, 0:1] - ox                         # [C, 1] tile-local
    ys = chunk[:, 1:2] - oy
    ca = chunk[:, 2:3]
    cb = chunk[:, 3:4]
    cc = chunk[:, 4:5]
    op = chunk[:, 5:6]
    feat = chunk[:, 6:6 + F]                        # [C, F]

    if POWER_MXU:
        # power = -.5(ca·dx² + cc·dy²) - cb·dx·dy expanded in the basis
        # V rows [px², px, 1, py, py², px·py]; coefficients are [C, 1]
        # (256x cheaper than [C, P2] ops).  Tile-local moments stay
        # ≤ (16+r)², so the expansion loses no f32 precision.
        coeffs = jnp.concatenate([
            -0.5 * ca,
            ca * xs + cb * ys,
            -0.5 * (ca * xs * xs + cc * ys * ys) - cb * xs * ys,
            cc * ys + cb * xs,
            -0.5 * cc,
            -cb,
        ], axis=1)                                   # [C, 6]
        power = jax.lax.dot_general(
            coeffs, V, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [C, P2]
    else:
        dx = xs - plx                                # [C, P2]
        dy = ys - ply
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw_alpha = op * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, raw_alpha)
    k_ids = k0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    in_count = k_ids < count
    valid = in_count & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return xs, ys, ca, cb, cc, op, feat, power, raw_alpha, alpha, valid


def _forward_kernel(counts_ref, tids_ref, data_ref, img_ref, t_ref,
                    last_ref, ckpt_t_ref, ckpt_s_ref,
                    *, C: int, F: int, K: int, gx: int,
                    track: bool = True):
    nchunks = K // C
    for tb in range(TB):
        _forward_one_tile(counts_ref, tids_ref, data_ref, img_ref, t_ref,
                          last_ref, ckpt_t_ref, ckpt_s_ref,
                          tb, C=C, F=F, nchunks=nchunks, gx=gx,
                          track=track)


def _fwd_chunk_math(data_ref, tb, c, C, F, count, ox, oy, plx, ply, V,
                    log_t, stopped):
    """Shared forward-chunk math.  `log_t`/`stopped` may be None for a
    statically-known entry state (logT = 0, nothing stopped) — the
    single-chunk specialization; the emitted code is then bit-identical
    to the loop body with zero carries.

    Returns (feat, alpha, la_all, t_before, applied, any_trig, k_iota).
    """
    (_, _, _, _, _, _, feat, _, _, alpha, valid) = _chunk_quantities(
        data_ref, tb, c * C, C, F, count, ox, oy, plx, ply, V)

    la_all = jnp.log1p(-jnp.where(valid, alpha, 0.0))
    cum = _cumsum0(la_all)
    excl = cum - la_all
    t_before = jnp.exp(excl if log_t is None else log_t + excl)

    trigger = valid & (t_before * (1.0 - alpha) < T_STOP)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (C, P2), 0)
    if TRIG_MIN:
        # first-trigger position per pixel (min-reduce, VPU); k is
        # applied iff it precedes it — identical classification to
        # the prefix-count, one tri-matmul cheaper
        first_trig = jnp.min(
            jnp.where(trigger, k_iota, C), axis=0, keepdims=True)
        applied = valid & (k_iota < first_trig)
        any_trig = (first_trig < C)[0]
    else:
        trig_cum = _cumsum0(trigger.astype(jnp.float32), exact01=True)
        before = (trig_cum - trigger.astype(jnp.float32)) > 0.5
        stopped_before = before if stopped is None else stopped | before
        applied = valid & ~stopped_before & ~trigger
        any_trig = (trig_cum[C - 1:C, :] > 0.5)[0]
        return feat, alpha, la_all, t_before, applied, any_trig, k_iota
    if stopped is not None:
        applied = applied & ~stopped
    return feat, alpha, la_all, t_before, applied, any_trig, k_iota


def _forward_one_tile(counts_ref, tids_ref, data_ref, img_ref, t_ref,
                      last_ref, ckpt_t_ref, ckpt_s_ref, tb,
                      *, C: int, F: int, nchunks: int, gx: int,
                      track: bool = True, stop_ref=None,
                      entry_t_ref=None, entry_s_ref=None):
    """One tile's forward sweep.

    `entry_t_ref`/`entry_s_ref` ([TB, 1, P2] log-transmittance and 0/1
    stopped flags) resume compositing mid-stream: the carry starts from
    that state instead of (0, nothing-stopped), so a K-overflow
    continuation pass over a tile's stream-segment tail is EXACTLY the
    suffix of one long single-pass sweep — same triggers, same weights
    (w = alpha * global T).  `stop_ref` exports the exit stopped flags
    so the next continuation round can consume them.  This is the
    losslessness mechanism the CUDA reference gets from exact
    `num_rendered` allocation (`rasterizer_impl.cu:343-384`)."""
    row = pl.program_id(0) * TB + tb
    tile_id = tids_ref[row]
    ox = ((tile_id % gx) * TILE).astype(jnp.float32)
    oy = ((tile_id // gx) * TILE).astype(jnp.float32)
    plx, ply, V = _local_basis()
    count = counts_ref[row]

    def sum_la(la):
        if MXU_SUMLA:
            # Σ_k la on the MXU instead of the VPU sublane reduce
            return jax.lax.dot_general(
                jnp.ones((1, C), jnp.float32), la,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.sum(la, axis=0)[None, :]

    if nchunks == 1 and entry_t_ref is None:
        # Single-chunk specialization (C == K): the entry state is
        # statically known (logT = 0, nothing stopped), so there is no
        # loop, no carry, and no checkpoint traffic — straight-line
        # code.  Measured ~3 ms/step faster at 800² than C = K/2 even
        # though it forgoes chunk-level early exit: the while_loop's
        # per-iteration control overhead dominates the masked extra
        # rows.  Empty (padding) tiles compute zeros — same result the
        # loop's skip produced.
        ckpt_t_ref[tb] = jnp.zeros((1, P2), jnp.float32)
        ckpt_s_ref[tb] = jnp.zeros((1, P2), jnp.float32)
        feat, alpha, la_all, t_before, applied, any_trig, k_iota = \
            _fwd_chunk_math(data_ref, tb, 0, C, F, count, ox, oy,
                            plx, ply, V, None, None)
        la = jnp.where(applied, la_all, 0.0)
        w = jnp.where(applied, alpha * t_before, 0.0)
        img_ref[tb] = jax.lax.dot_general(
            w, feat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t_ref[tb] = jnp.exp(sum_la(la))
        if track:
            last_ref[tb] = jnp.max(
                jnp.where(applied, k_iota + 1, 0), axis=0)[None, :]
        else:
            last_ref[tb] = jnp.zeros((1, P2), jnp.int32)
        if stop_ref is not None:
            stop_ref[tb] = any_trig.astype(jnp.float32)[None, :]
        return

    # Per-chunk entry checkpoints (logT, stopped) streamed to the backward
    # kernel so it can start its reverse sweep directly — no recompute
    # forward sweep.  [nchunks, P2] per tile ≈ 10 MB per pass at 800² with
    # C=128: negligible HBM traffic for ~40% less backward compute.
    ckpt_t_ref[tb] = jnp.zeros((nchunks, P2), jnp.float32)
    ckpt_s_ref[tb] = jnp.full((nchunks, P2), 2.0, jnp.float32)

    def fwd_step(c, log_t, stopped_f, accum, last):
        """One chunk; `c` may be a static int (unrolled) or traced."""
        stopped = stopped_f > 0.5
        ckpt_t_ref[tb, pl.ds(c, 1), :] = log_t
        ckpt_s_ref[tb, pl.ds(c, 1), :] = stopped_f
        feat, alpha, la_all, t_before, applied, any_trig, k_iota = \
            _fwd_chunk_math(data_ref, tb, c, C, F, count, ox, oy,
                            plx, ply, V, log_t, stopped)

        # Valid-based t_before equals applied-based t_before for every
        # applied splat (before the first trigger, valid ⟺ applied; after
        # it nothing is applied) — one prefix product suffices, matching
        # the jnp twin.  applied ⊆ valid, so the applied log-terms are a
        # masked subset of la_all — no second log1p evaluation.
        la = jnp.where(applied, la_all, 0.0)
        w = jnp.where(applied, alpha * t_before, 0.0)      # [C, P2]

        accum = accum + jax.lax.dot_general(
            w, feat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [P2, F]

        log_t = log_t + sum_la(la)
        # any(trigger & ~stopped_before) ⟺ any trigger at all: if the
        # carry was already stopped nothing is applied either way.
        stopped = stopped | any_trig
        if track:  # n_contrib: 1-based index of the last applied splat
            contrib = jnp.max(
                jnp.where(applied, c * C + k_iota + 1, 0), axis=0)
            last = jnp.maximum(last, contrib[None, :])
        return log_t, stopped.astype(jnp.float32), accum, last

    def body(carry):
        c = carry[0]
        return (c + 1,) + fwd_step(c, *carry[1:])

    def cond(carry):
        c = carry[0]
        stopped_f = carry[2]
        return (c * C < count) & (c < nchunks) & (jnp.min(stopped_f) < 0.5)

    init = (jnp.int32(0),
            jnp.zeros((1, P2), jnp.float32) if entry_t_ref is None
            else entry_t_ref[tb],
            jnp.zeros((1, P2), jnp.float32) if entry_s_ref is None
            else entry_s_ref[tb],
            jnp.zeros((P2, F), jnp.float32),
            jnp.zeros((1, P2), jnp.int32))
    if 1 < nchunks <= UNROLL_MAX and entry_t_ref is None:
        # static unroll: chunks past count / past full-stop compute
        # fully-masked zeros — bit-identical results, no dynamic control
        state = init[1:]
        for c in range(nchunks):
            state = fwd_step(c, *state)
        log_t, stopped_f, accum, last = state
    else:
        _, log_t, stopped_f, accum, last = jax.lax.while_loop(
            cond, body, init)

    img_ref[tb] = accum
    t_ref[tb] = jnp.exp(log_t)
    last_ref[tb] = last
    if stop_ref is not None:
        stop_ref[tb] = stopped_f


def _backward_kernel(counts_ref, tids_ref, data_ref, gimg_ref, gt_ref,
                     ft_ref, ckpt_t_ref, ckpt_s_ref, gdata_ref,
                     *, C: int, F: int, K: int, gx: int,
                     tiled: bool = False):
    nchunks = K // C
    for tb in range(TB):
        _backward_one_tile(counts_ref, tids_ref, data_ref, gimg_ref,
                           gt_ref, ft_ref, ckpt_t_ref, ckpt_s_ref,
                           gdata_ref, tb, C=C, F=F, nchunks=nchunks,
                           gx=gx, tiled=tiled)


def _backward_one_tile(counts_ref, tids_ref, data_ref, gimg_ref, gt_ref,
                       ft_ref, ckpt_t_ref, ckpt_s_ref, gdata_ref, tb,
                       *, C: int, F: int, nchunks: int, gx: int,
                       tiled: bool = False, gtb: int | None = None,
                       g_entry_ref=None):
    """`g_entry_ref` ([TB, 1, P2], resume passes only): receives
    dL/d(entry logT) — the reverse sweep's final g_log_t, which the
    chain rule routes to the producing pass's final_t.  The forward's
    checkpoints already hold the entry state at chunk 0, so the sweep
    itself is unchanged."""
    gtb = tb if gtb is None else gtb
    row = pl.program_id(0) * TB + tb
    tile_id = tids_ref[row]
    # tile-local frame: splat coords shift by the tile origin (scalar,
    # exact); pixel coords and the moment basis V are tile-independent
    ox = ((tile_id % gx) * TILE).astype(jnp.float32)
    oy = ((tile_id // gx) * TILE).astype(jnp.float32)
    plx, ply, V = _local_basis()
    count = counts_ref[row]
    g_accum = gimg_ref[tb]                              # [P2, F]

    # final_t gradient enters through log_t of the last processed chunk;
    # final_t = exp(log_t_final) was saved by the forward.
    g_log_t0 = gt_ref[tb] * ft_ref[tb]                   # [1, P2]

    gdata_ref[gtb] = jnp.zeros(
        (nchunks * C, 128 if tiled else 6 + F), jnp.float32)

    # A chunk was processed by the forward iff some pixel was still
    # integrating at its entry (checkpoint sentinel stopped=2 marks chunks
    # never reached) and it starts below count — exactly the forward's
    # while condition, so the processed chunks are the prefix [0, n_done).
    def bwd_chunk(c, log_t, stopped, g_log_t):
        # `log_t`/`stopped` None = statically-known entry state (single-
        # chunk specialization); same tile-local helper as the forward —
        # the recomputed power/alpha/valid are bit-identical to it
        (xs, ys, ca, cb, cc, op, feat, power, raw_alpha, alpha,
         valid) = _chunk_quantities(
            data_ref, tb, c * C, C, F, count, ox, oy, plx, ply, V)
        dx = xs - plx
        dy = ys - ply

        la_all = jnp.log1p(-jnp.where(valid, alpha, 0.0))
        cum = _cumsum0(la_all)
        excl = cum - la_all
        t_before0 = jnp.exp(excl if log_t is None else log_t + excl)
        trigger = valid & (t_before0 * (1.0 - alpha) < T_STOP)
        if TRIG_MIN:
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (C, P2), 0)
            first_trig = jnp.min(
                jnp.where(trigger, k_iota, C), axis=0, keepdims=True)
            applied = valid & (k_iota < first_trig)
            if stopped is not None:
                applied = applied & ~stopped
        else:
            trig_cum = _cumsum0(trigger.astype(jnp.float32), exact01=True)
            before = (trig_cum - trigger.astype(jnp.float32)) > 0.5
            stopped_before = before if stopped is None \
                else stopped | before
            applied = valid & ~stopped_before & ~trigger

        # valid-based t_before == applied-based for applied splats
        ea = jnp.where(applied, alpha, 0.0)
        t_before = t_before0
        w = jnp.where(applied, alpha * t_before, 0.0)

        # dL/dw and dL/dfeat via two MXU matmuls
        g_w = jax.lax.dot_general(
            feat, g_accum, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [C, P2]
        g_feat = jax.lax.dot_general(
            w, g_accum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [C, F]

        # suffix sums: G_k = sum_{m>k} g_w_m w_m + g_log_t (carry);
        # the total rides the cumsum's last row (no separate reduction)
        gww = g_w * w
        cum_gww = _cumsum0(gww)
        total = cum_gww[C - 1:C, :]
        suffix = total - cum_gww                            # strictly m>k
        G = suffix + g_log_t                                # [C, P2]

        g_alpha = jnp.where(applied,
                            g_w * t_before - G / (1.0 - ea), 0.0)
        # alpha = min(0.99, op * exp(power)) — gate the min
        open_gate = (raw_alpha < ALPHA_MAX) & applied
        g_raw = jnp.where(open_gate, g_alpha, 0.0)
        g_power = g_raw * raw_alpha
        # d/d_op = exp(power) = raw_alpha/op: reuse g_power instead of a
        # second [C,P2] exp — Σ_p g_raw·exp(power) = Σ_p g_power / op
        inv_op = 1.0 / op                                   # [C, 1]

        if MOMENT_BWD:
            # All six pixel reductions via one stacked moment matmul
            # (see `_local_basis`): S[k] = Σ_p g·{px²,px,1,py,py²,px·py};
            # the opacity row reduction rides V's ones column.
            S = jax.lax.dot_general(
                g_power, V, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [C, 6]
            s_xx = S[:C, 0:1]   # Σ g·px²
            s_x = S[:C, 1:2]    # Σ g·px
            s_1 = S[:C, 2:3]    # Σ g
            s_y = S[:C, 3:4]    # Σ g·py
            s_yy = S[:C, 4:5]   # Σ g·py²
            s_xy = S[:C, 5:6]   # Σ g·px·py
            g_op = S[:C, 2:3] * inv_op   # Σ g_power / op

            # ∂power/∂θ expanded in pixel moments (dx = xs - px, local):
            g_ca = -0.5 * (s_xx - 2.0 * xs * s_x + xs * xs * s_1)
            g_cc = -0.5 * (s_yy - 2.0 * ys * s_y + ys * ys * s_1)
            g_cb = -(s_xy - xs * s_y - ys * s_x + xs * ys * s_1)
            g_xs = -(ca * xs + cb * ys) * s_1 + ca * s_x + cb * s_y
            g_ys = -(cc * ys + cb * xs) * s_1 + cc * s_y + cb * s_x
        else:
            g_ca = jnp.sum(g_power * (-0.5 * dx * dx), axis=1,
                           keepdims=True)
            g_cc = jnp.sum(g_power * (-0.5 * dy * dy), axis=1,
                           keepdims=True)
            g_cb = jnp.sum(g_power * (-dx * dy), axis=1, keepdims=True)
            g_dx = g_power * (-(ca * dx + cb * dy))
            g_dy = g_power * (-(cc * dy + cb * dx))
            g_xs = jnp.sum(g_dx, axis=1, keepdims=True)
            g_ys = jnp.sum(g_dy, axis=1, keepdims=True)
            g_op = jnp.sum(g_power, axis=1, keepdims=True) * inv_op

        parts = [g_xs, g_ys, g_ca, g_cb, g_cc, g_op, g_feat]
        if tiled == "pad128":
            # full-lane rows for the stream path's window-write DMA
            parts.append(jnp.zeros((C, 122 - F), jnp.float32))
            g_chunk = jnp.concatenate(parts, axis=1)
        elif tiled:
            # replicate across the lane groups the reduction kernel
            # expects (free: [*, 6+F] is lane-padded to 128 in HBM anyway)
            G, _packs = _grad_group(6 + F)
            pad = G - (6 + F)
            if pad:
                parts.append(jnp.zeros((C, pad), jnp.float32))
            grp = jnp.concatenate(parts, axis=1)
            g_chunk = jnp.concatenate([grp] * (128 // G), axis=1)
        else:
            g_chunk = jnp.concatenate(parts, axis=1)
        gdata_ref[gtb, pl.ds(c * C, C), :] = g_chunk

        # propagate to earlier chunks: d logT_in touches every term
        # (`total` is already Σ_k gww — reuse, no second reduction)
        g_log_t_new = total + g_log_t
        return g_log_t_new

    if nchunks == 1 and g_entry_ref is None:
        # single-chunk specialization: no checkpoint reads, no reverse
        # loop — one straight-line pass with the known entry state.
        # Empty (padding) tiles produce all-zero gradient rows, same as
        # the loop's n_done = 0 skip.
        bwd_chunk(0, None, None, g_log_t0)
        return

    # ---- reverse sweep over the forward's per-chunk entry checkpoints ----
    def bbody_at(c, g_log_t):
        log_t = ckpt_t_ref[tb, pl.ds(c, 1), :].reshape(1, P2)
        stopped = ckpt_s_ref[tb, pl.ds(c, 1), :].reshape(1, P2) > 0.5
        return bwd_chunk(c, log_t, stopped, g_log_t)

    if 1 < nchunks <= UNROLL_MAX and g_entry_ref is None:
        # static unroll: never-reached chunks carry the stopped=2.0
        # checkpoint sentinel -> fully-masked zeros, g_log_t unchanged
        g_final = g_log_t0
        for c in reversed(range(nchunks)):
            g_final = bbody_at(c, g_final)
    else:
        entry_mins = jnp.min(ckpt_s_ref[tb], axis=1,
                             keepdims=True)                  # [nc, 1]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (nchunks, 1), 0)
        n_done = jnp.sum(((entry_mins < 0.5) & (c_iota * C < count))
                         .astype(jnp.int32))
        g_final = jax.lax.fori_loop(
            0, n_done, lambda i, g: bbody_at(n_done - 1 - i, g),
            g_log_t0)
    if g_entry_ref is not None:
        # n_done == 0 (fully stopped / empty at entry) degenerates to
        # g_log_t0 = g_t * final_t — exactly d(exp(entry))/d(entry).
        g_entry_ref[tb] = g_final


# ---------------------------------------------------------------------
# Gradient reduction: per-instance rows -> per-Gaussian sums.
#
# XLA TPU has no atomics and lowers every random-reduction to a
# row-serial scatter-add (~15 ms for the 720k x 14 rows of an 800² step,
# measured v5e) — and every rearrangement alternative (sorted-segment
# cumsum-diff 13.5 ms, segment_sum 17.9 ms, unique-index scatter 87 ms)
# bottoms out on the same ~6-20 ns/row random-access floor.  The Pallas
# kernel below beats them by keeping the WHOLE accumulator VMEM-resident
# in a lane-packed layout: Gaussian p lives at accumulator row p//8,
# lane group p%8 (16 lanes each, 14 used), so [P=131k, 14] packs into
# [P/8, 128] = 8.4 MB of VMEM.  The instance stream is processed
# serially (ids from SMEM, one masked (1,128) add per row) — ~5 VPU ops
# per instance instead of an HBM round trip per row.
# The backward compositor emits gradient rows already tiled 8x across
# the lane groups ([*, 128]), which is free: the [*, 14] layout is
# lane-padded to 128 in HBM anyway.
# ---------------------------------------------------------------------


def _grad_group(D: int) -> tuple[int, int]:
    """(lane-group size, gaussians per accumulator row) for D grad
    values: 16-lane groups pack 8 Gaussians per row (D ≤ 16, the base
    render), 32-lane groups pack 4 (NeILF's wider feature rows)."""
    if D <= 16:
        return 16, 8
    assert D <= 32, D
    return 32, 4


def _reduce_kernel(ids_ref, gdata_ref, out_ref, *, C: int, G: int,
                   U: int = 8):
    b = pl.program_id(0)
    packs = 128 // G

    @pl.when(b == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // G

    # U rows per iteration.  A strictly serial read-modify-write chain on
    # the accumulator costs ~22 cycles/row (measured ~17 ms for 720k rows);
    # batching U rows lets the loads of a group issue before its stores.
    # That reorder is only sound when the U accumulator rows are distinct,
    # so the scalar core checks the U*(U-1)/2 pairs (ids within a tile are
    # distinct and ~16k accumulator rows make collisions ~0.2%/group) and
    # falls back to the serial order on conflict.
    def body(i, carry):
        base = i * U
        subs, masked = [], []
        for j in range(U):
            g = ids_ref[base + j]
            sub = g // packs
            grp = g - sub * packs
            subs.append(sub)
            masked.append(jnp.where(lane_grp == grp,
                                    gdata_ref[pl.ds(base + j, 1), :], 0.0))
        conflict = subs[0] != subs[0]          # traced False
        for j in range(1, U):
            for k in range(j):
                conflict = jnp.logical_or(conflict, subs[k] == subs[j])

        @pl.when(jnp.logical_not(conflict))
        def _fast():
            curs = [out_ref[pl.ds(subs[j], 1), :] for j in range(U)]
            for j in range(U):
                out_ref[pl.ds(subs[j], 1), :] = curs[j] + masked[j]

        @pl.when(conflict)
        def _slow():
            for j in range(U):
                out_ref[pl.ds(subs[j], 1), :] = (
                    out_ref[pl.ds(subs[j], 1), :] + masked[j])

        return carry

    jax.lax.fori_loop(0, C // U, body, 0)


def reduce_rows_pallas(gdata_tiled: jnp.ndarray, ids: jnp.ndarray,
                       P: int, D: int, chunk_rows: int = 2048
                       ) -> jnp.ndarray:
    """Sum gradient rows by Gaussian id on-chip.

    Args:
      gdata_tiled: [N, 128] rows with the D gradient values replicated
        in each lane group (the backward kernel's native output layout;
        group size from `_grad_group`).
      ids: [N] int32 targets in [0, P]; id == P is a trash row for
        padding slots (their rows are exactly zero anyway).
      P: number of Gaussians.

    Returns: [P, D] float32 sums.
    """
    G, packs = _grad_group(D)
    N = gdata_tiled.shape[0]
    padN = (-N) % chunk_rows
    if padN:
        gdata_tiled = jnp.pad(gdata_tiled, ((0, padN), (0, 0)))
        ids = jnp.pad(ids, (0, padN), constant_values=P)
    N += padN
    rows = -(-(P + packs) // packs)
    rows += (-rows) % 8
    kern = functools.partial(_reduce_kernel, C=chunk_rows, G=G)
    out = pl.pallas_call(
        kern,
        grid=(N // chunk_rows,),
        in_specs=[
            pl.BlockSpec((chunk_rows,), lambda b: (b,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk_rows, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    )(ids, gdata_tiled)
    return out.reshape(rows * packs, G)[:P, :D]


def _segsum_kernel(bases_ref, ids_row_ref, g_ref, out_ref,
                   *, C: int, G: int, R2: int, P: int):
    """One block of the sorted-segment reduction.

    ids are globally NON-DECREASING, so this block's C rows land in the
    contiguous packed-accumulator span [base//packs, base//packs + R2).
    The reduction itself is one [packs*R2, C] x [C, 128] MXU matmul
    against a one-hot routing matrix W: W[j*R2 + r, c] = 1 iff row c's
    gaussian sits at relative packed row r, lane group j.  Rows with
    id >= P (padding / redirected garbage) arrive as exact zeros (the
    caller's mode="fill" gather) and are additionally routed nowhere."""
    b = pl.program_id(0)
    packs = 128 // G

    @pl.when(b == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = bases_ref[b]
    base_row = base // packs
    shift = base - base_row * packs

    ids_row = ids_row_ref[0, 0:1, :]                # [1, C] int32
    valid_row = ids_row < P
    q = jnp.where(valid_row, ids_row - base + shift, -1)   # [1, C]
    # target index t(i) for stacked row i = j*R2 + r: value r*packs + j
    i_iota = jax.lax.broadcasted_iota(jnp.int32, (packs * R2, C), 0)
    r = i_iota % R2
    j = i_iota // R2
    W = (q == r * packs + j).astype(jnp.float32)    # [packs*R2, C]

    # rows arrive in the plain pad128 layout (values at lanes [0, D));
    # garbage rows (id >= P) are routed nowhere by W, but a non-finite
    # junk value would still poison the 0-multiply -> sanitize.
    g = g_ref[...]
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    M = jax.lax.dot_general(
        W, g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # [packs*R2, 128]

    # lane-group packing happens HERE (cheap [R2, 128] lane rolls)
    # instead of replicated emit in the compositor backward (which
    # measured +2.3 ms/step of VPU copies at 800²).
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (R2, 128), 1) // G
    contrib = jnp.zeros((R2, 128), jnp.float32)
    for jj in range(packs):
        mj = M[jj * R2:(jj + 1) * R2, :]
        if jj:
            mj = pltpu.roll(mj, jj * G, 1)
        contrib = contrib + jnp.where(lane_grp == jj, mj, 0.0)

    cur = out_ref[pl.ds(base_row, R2), :]
    out_ref[pl.ds(base_row, R2), :] = cur + contrib


def reduce_rows_sorted(g_rows: jnp.ndarray, ids: jnp.ndarray,
                       P: int, D: int, block: int | None = None
                       ) -> jnp.ndarray:
    """Sum lane-group-replicated gradient rows by gaussian id via
    sort + gather + blockwise one-hot MXU matmuls (see SEG_REDUCE).

    Args:
      g_rows: [N, 128] rows with the D gradient values replicated per
        lane group (the backward kernels' `tiled=True` layout).
      ids: [N] int32 targets; id >= P marks padding/garbage rows
        (values may be uninitialized memory — they are masked, not
        just routed away).
      P: number of gaussians; D: useful values per row (<= 32).

    Returns [P, G] float32 sums (G = lane-group size; cols >= D are
    zero)."""
    C = block or SEG_BLOCK
    G, packs = _grad_group(D)
    N = ids.shape[0]
    padN = (-N) % C
    if padN:
        # padding rows never materialize: their (id=P, pos=N) entries
        # sort to the tail and the mode="fill" gather zeroes them
        g_rows_src = g_rows
        ids = jnp.pad(ids, (0, padN), constant_values=P)
    else:
        g_rows_src = g_rows
    Ns = N + padN
    idsort, pos = jax.lax.sort(
        (ids, jnp.arange(Ns, dtype=jnp.int32)), dimension=0, num_keys=1)
    # garbage/padding rows (id >= P) are routed nowhere by the kernel's
    # one-hot W and sanitized against non-finite junk in-kernel, so a
    # plain clip gather suffices (mode="fill" costs a full [N, 128]
    # select pass — measured 0.87 ms/step at 800²)
    gs = jnp.take(g_rows_src, pos, axis=0, mode="clip")
    nblocks = Ns // C
    bases = jnp.minimum(idsort[::C], P - 1)         # [nblocks]
    R2 = C // packs + 1
    rows_out = -(-(P + packs) // packs) + R2
    rows_out += (-rows_out) % 8
    ids3 = jnp.broadcast_to(
        idsort.reshape(nblocks, 1, C), (nblocks, 8, C))
    kern = functools.partial(_segsum_kernel, C=C, G=G, R2=R2, P=P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 8, C), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_out, 128), lambda b, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, 128), jnp.float32),
    )(bases, ids3, gs)
    return out.reshape(rows_out * packs, G)[:P]


# The row gather's transpose is a scatter-add of the per-instance gradient
# rows into [P, D] (the XLA fallback path; see the Pallas reduction above
# for the measured cost landscape).  Padded slots carry exactly-zero
# gradient rows (the backward kernel masks them), so they can be
# redirected to unique "spread" targets — numerically a no-op that keeps
# the collision chain shallow.
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_rows(packed, idx, mask, gsort_gauss, gsort_pos, P):
    """jnp.take(packed, idx, axis=0) with a row-count-minimized grad scatter.

    XLA TPU scatter-add is row-serial (~16 ns/row on v5e, independent of
    index distribution and row width), so the transpose cost is set purely
    by how many rows we scatter.  When binning supplies the compact aux
    (gsort_gauss/gsort_pos: the sorted-prefix instances and their dense
    [T*K] slots), the backward first gathers the real instances' gradient
    rows into that compact order (a near-sequential cheap gather) and
    scatters only ~num_instances rows instead of the T*K dense layout
    (~2.3x fewer at 800²).  Padding rows carry exactly-zero gradients and
    are spread over distinct target rows, adding nothing.
    """
    return jnp.take(packed, idx, axis=0)


def _gather_rows_fwd(packed, idx, mask, gsort_gauss, gsort_pos, P):
    return jnp.take(packed, idx, axis=0), (idx, mask, gsort_gauss, gsort_pos)


def _gather_rows_bwd(P, res, g):
    idx, mask, gsort_gauss, gsort_pos = res
    D = g.shape[-1]
    g_flat = g.reshape(-1, D)
    if gsort_gauss is not None:
        rows = jnp.take(g_flat, gsort_pos, axis=0, mode="fill",
                        fill_value=0.0)
        out = jnp.zeros((P, D), g.dtype).at[gsort_gauss].add(
            rows, mode="promise_in_bounds")
        return out, None, None, None, None
    n = g_flat.shape[0]
    idx_flat = idx.reshape(-1)
    spread = jnp.arange(n, dtype=jnp.int32) % P
    idx_safe = jnp.where(mask.reshape(-1), idx_flat, spread)
    out = jnp.zeros((P, D), g.dtype).at[idx_safe].add(
        g_flat, mode="promise_in_bounds")
    return out, None, None, None, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _composite_core(data, counts, tile_ids, grid, chunk, F, track=True):
    return _core_fwd_impl(data, counts, tile_ids, grid, chunk, F,
                          track=track)


def _core_fwd_impl(data, counts, tile_ids, grid, chunk, F, *,
                   want_ckpt=False, track=True):
    gx, gy = grid
    T0, K, D = data.shape
    padT = (-T0) % TB
    if padT:
        data = jnp.pad(data, ((0, padT), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, padT))
        tile_ids = jnp.pad(tile_ids, (0, padT))
    T = T0 + padT
    nchunks = K // chunk
    kern = functools.partial(_forward_kernel, C=chunk, F=F, K=K, gx=gx,
                             track=track)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, D), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, P2, F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    img, final_t, last, ckpt_t, ckpt_s = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P2, F), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P2), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P2), jnp.int32),
            jax.ShapeDtypeStruct((T, nchunks, P2), jnp.float32),
            jax.ShapeDtypeStruct((T, nchunks, P2), jnp.float32),
        ],
    )(counts, tile_ids, data)
    out = (img[:T0], final_t.reshape(T, P2)[:T0],
           last.reshape(T, P2)[:T0])
    if want_ckpt:
        return out, (final_t, ckpt_t, ckpt_s)
    return out


def _core_fwd(data, counts, tile_ids, grid, chunk, F, track=True):
    out, (final_t, ckpt_t, ckpt_s) = _core_fwd_impl(
        data, counts, tile_ids, grid, chunk, F, want_ckpt=True,
        track=track)
    return out, (data, counts, tile_ids, final_t, ckpt_t, ckpt_s)


def _run_backward_kernel(data, counts, tile_ids, g_img, g_t, final_t,
                         ckpt_t, ckpt_s, grid, chunk, F,
                         tiled: bool = False):
    """Invoke the backward compositor kernel; returns per-dense-slot
    gradient rows — [T0, K, 6+F], or [T0, K, 128] lane-group-tiled when
    `tiled` (the layout `reduce_rows_pallas` consumes)."""
    gx, gy = grid
    T0, K, D = data.shape
    g_t = g_t.reshape(T0, 1, P2)
    padT = (-T0) % TB
    if padT:
        data = jnp.pad(data, ((0, padT), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, padT))
        tile_ids = jnp.pad(tile_ids, (0, padT))
        g_img = jnp.pad(g_img, ((0, padT), (0, 0), (0, 0)))
        g_t = jnp.pad(g_t, ((0, padT), (0, 0), (0, 0)))
    T = T0 + padT
    nchunks = K // chunk
    W = 128 if tiled else D
    kern = functools.partial(_backward_kernel, C=chunk, F=F, K=K, gx=gx,
                             tiled=tiled)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec((TB, K, D), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P2, F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, K, W), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    g_data = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, W), jnp.float32),
    )(counts, tile_ids, data, g_img, g_t, final_t, ckpt_t, ckpt_s)
    return g_data[:T0]


def _core_bwd(grid, chunk, F, track, res, cotangents):
    data, counts, tile_ids, final_t, ckpt_t, ckpt_s = res
    g_img, g_t, _ = cotangents
    g_data = _run_backward_kernel(
        data, counts, tile_ids, g_img, g_t, final_t, ckpt_t, ckpt_s,
        grid, chunk, F)
    return g_data, None, None


_composite_core.defvjp(_core_fwd, _core_bwd)


# ---- fused path: gather + compositor + on-chip gradient reduction ----
# Single custom_vjp around (packed rows -> image) whose backward chains
# the compositor kernel into `reduce_rows_pallas`, so XLA never sees a
# scatter (the ~15 ms row-serial transpose the gather would otherwise
# induce).

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _composite_packed(packed, idx, mask, counts, grid, chunk, F):
    T, K = idx.shape
    data = jnp.take(packed, idx.reshape(-1), axis=0).reshape(
        (T, K, packed.shape[-1]))
    return _core_fwd_impl(data, counts, jnp.arange(T, dtype=jnp.int32),
                          grid, chunk, F)


def _packed_fwd(packed, idx, mask, counts, grid, chunk, F):
    T, K = idx.shape
    data = jnp.take(packed, idx.reshape(-1), axis=0).reshape(
        (T, K, packed.shape[-1]))
    out, (final_t, ckpt_t, ckpt_s) = _core_fwd_impl(
        data, counts, jnp.arange(T, dtype=jnp.int32), grid, chunk, F,
        want_ckpt=True)
    return out, (data, idx, mask, counts, final_t, ckpt_t, ckpt_s,
                 packed.shape[0])


def _packed_bwd(grid, chunk, F, res, cotangents):
    data, idx, mask, counts, final_t, ckpt_t, ckpt_s, P = res
    g_img, g_t, _ = cotangents
    T0, K, D = data.shape
    tile_ids = jnp.arange(T0, dtype=jnp.int32)
    gdata = _run_backward_kernel(
        data, counts, tile_ids, g_img, g_t, final_t, ckpt_t, ckpt_s,
        grid, chunk, F, tiled=True)                    # [T0, K, 128]
    ids = jnp.where(mask, idx, P).reshape(-1)
    g_packed = reduce_rows_pallas(gdata.reshape(-1, 128), ids, P, D)
    return g_packed, None, None, None


_composite_packed.defvjp(_packed_fwd, _packed_bwd)


# ---- stream path: kernels window-DMA tile segments out of the sorted
# instance array, so the dense [T, K] index lists — a ~4 ms/step
# sequential windowed-gather loop at 800² — are never built; the
# backward's scatter targets are the stream ids themselves. ----


def _stream_windows(starts_ref, rows_ref, scratch, sems):
    """Double-buffered window DMAs: at grid step s, wait for the windows
    prefetched at step s-1 into buffer s%2 and start step s+1's into
    the other — DMA latency rides under the step's compute."""
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    cur = jax.lax.rem(s, 2)

    def start(step, buf):
        for tb in range(TB):
            pltpu.make_async_copy(
                rows_ref.at[pl.ds(starts_ref[step * TB + tb],
                                  scratch.shape[2])],
                scratch.at[buf, tb], sems.at[buf, tb]).start()

    @pl.when(s == 0)
    def _first():
        start(0, 0)

    @pl.when(s + 1 < nsteps)
    def _prefetch():
        start(s + 1, 1 - cur)

    for tb in range(TB):
        pltpu.make_async_copy(
            rows_ref.at[pl.ds(starts_ref[s * TB + tb], scratch.shape[2])],
            scratch.at[cur, tb], sems.at[cur, tb]).wait()
    return cur


def _forward_stream_kernel(counts_ref, tids_ref, starts_ref, rows_ref,
                           *rest, C: int, F: int, K: int, gx: int,
                           track: bool = True, resume: bool = False):
    if resume:
        (entry_t_ref, entry_s_ref, img_ref, t_ref, last_ref, stop_ref,
         ckpt_t_ref, ckpt_s_ref, scratch, sems) = rest
    else:
        (img_ref, t_ref, last_ref, stop_ref, ckpt_t_ref, ckpt_s_ref,
         scratch, sems) = rest
        entry_t_ref = entry_s_ref = None
    nchunks = K // C
    cur = _stream_windows(starts_ref, rows_ref, scratch, sems)
    for tb in range(TB):
        _forward_one_tile(counts_ref, tids_ref, scratch.at[cur], img_ref,
                          t_ref, last_ref, ckpt_t_ref, ckpt_s_ref,
                          tb, C=C, F=F, nchunks=nchunks, gx=gx,
                          track=track, stop_ref=stop_ref,
                          entry_t_ref=entry_t_ref,
                          entry_s_ref=entry_s_ref)


def _backward_stream_kernel(counts_ref, tids_ref, starts_ref, rows_ref,
                            gimg_ref, gt_ref, ft_ref, ckpt_t_ref,
                            ckpt_s_ref, *rest, C: int, F: int, K: int,
                            gx: int, resume: bool = False,
                            tiled="pad128"):
    """Backward with STREAM-POSITIONED gradient output: tile t's [K, D]
    gradient rows are DMA'd to gout[starts[t] : starts[t]+K], so the
    flat output aligns with stream_ids (the scatter targets).  Windows
    of consecutive tiles overlap by K - count rows; writes are strictly
    ordered (wait the previous write before starting the next), so the
    later owner's rows always land last — zero tails never clobber a
    neighbour that wrote after them.

    With `resume` a second output receives dL/d(entry logT)."""
    if resume:
        gout_ref, gentry_ref, scratch, sems, gbuf, wsem = rest
    else:
        gout_ref, scratch, sems, gbuf, wsem = rest
        gentry_ref = None
    nchunks = K // C
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)
    cur = _stream_windows(starts_ref, rows_ref, scratch, sems)
    for tb in range(TB):
        buf = tb % 2
        _backward_one_tile(counts_ref, tids_ref, scratch.at[cur],
                           gimg_ref, gt_ref, ft_ref, ckpt_t_ref,
                           ckpt_s_ref, gbuf.at[buf], tb, C=C, F=F,
                           nchunks=nchunks, gx=gx, gtb=0,
                           tiled=tiled, g_entry_ref=gentry_ref)
        row = s * TB + tb
        w = pltpu.make_async_copy(
            gbuf.at[buf, 0], gout_ref.at[pl.ds(starts_ref[row], K)],
            wsem)

        @pl.when(row > 0)
        def _order():  # strict write order: one write in flight
            pltpu.make_async_copy(
                gbuf.at[1 - buf, 0],
                gout_ref.at[pl.ds(starts_ref[row - 1], K)], wsem).wait()

        w.start()

    @pl.when(s == nsteps - 1)
    def _drain():
        last = TB * nsteps - 1
        pltpu.make_async_copy(
            gbuf.at[last % 2, 0],
            gout_ref.at[pl.ds(starts_ref[last], K)], wsem).wait()


def _pad_tb(T0, *arrays):
    padT = (-T0) % TB
    if padT:
        arrays = tuple(
            jnp.pad(a, [(0, padT)] + [(0, 0)] * (a.ndim - 1))
            for a in arrays)
    return T0 + padT, arrays


def _stream_rows_impl(rows, starts, counts, tile_ids,
                      grid, chunk, F, K, track=True, *, want_ckpt=False,
                      entry_t=None, entry_s=None):
    """Forward stream kernels on prebuilt instance rows.

    `rows`: [N + K, 128] — a tile-major depth-sorted instance stream of
    any provenance (gathered by id on one device, a member's contiguous
    window of the global stream under tile sharding, or the routed TP
    all-to-all's merged receive stream), padded with K overshoot rows so
    every window read [starts[t], starts[t] + K) stays in bounds
    (callers guarantee starts[t] <= N).

    `entry_t`/`entry_s` ([Tl, P2] f32): resume each tile from that
    (log-transmittance, stopped) state — the K-overflow continuation.
    Returns (img, final_t, last, stopped); `stopped` [Tl, P2] f32 0/1
    exports the exit stop flags for the next continuation round."""
    gx, gy = grid
    T0 = counts.shape[0]
    resume = entry_t is not None
    if resume:
        entry_t = entry_t.reshape(T0, 1, P2)
        entry_s = entry_s.reshape(T0, 1, P2)
        T, (counts, tile_ids, starts, entry_t, entry_s) = _pad_tb(
            T0, counts, tile_ids, starts, entry_t, entry_s)
    else:
        T, (counts, tile_ids, starts) = _pad_tb(T0, counts, tile_ids,
                                                starts)
    nchunks = K // chunk
    kern = functools.partial(_forward_stream_kernel, C=chunk, F=F, K=K,
                             gx=gx, track=track, resume=resume)
    tile_block = pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // TB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + ([tile_block, tile_block] if resume else []),
        out_specs=[
            pl.BlockSpec((TB, P2, F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_block,
            tile_block,
            tile_block,
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TB, K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TB)),
        ],
    )
    img, final_t, last, stop, ckpt_t, ckpt_s = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P2, F), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P2), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P2), jnp.int32),
            jax.ShapeDtypeStruct((T, 1, P2), jnp.float32),
            jax.ShapeDtypeStruct((T, nchunks, P2), jnp.float32),
            jax.ShapeDtypeStruct((T, nchunks, P2), jnp.float32),
        ],
    )(counts, tile_ids, starts, rows,
      *([entry_t, entry_s] if resume else []))
    out = (img[:T0], final_t.reshape(T, P2)[:T0],
           last.reshape(T, P2)[:T0], stop.reshape(T, P2)[:T0])
    if want_ckpt:
        return out, (final_t, ckpt_t, ckpt_s)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _composite_stream_rows(rows, starts, counts, tile_ids,
                           grid, chunk, F, K, track=True,
                           zero_uncovered=True):
    """`zero_uncovered=False` skips the backward's [N+K, 128] covered-
    position select (an ~0.9 ms/step HBM pass at 800²) — only valid
    when the caller's cotangent consumer routes uncovered rows
    harmlessly itself (`_gather_redirect` scatters them to a trash
    row)."""
    return _stream_rows_impl(rows, starts, counts, tile_ids,
                             grid, chunk, F, K, track)[:3]


def _stream_rows_fwd(rows, starts, counts, tile_ids,
                     grid, chunk, F, K, track=True, zero_uncovered=True):
    out, (final_t, ckpt_t, ckpt_s) = _stream_rows_impl(
        rows, starts, counts, tile_ids, grid, chunk, F,
        K, track, want_ckpt=True)
    return out[:3], (rows, starts, counts, tile_ids, final_t,
                     ckpt_t, ckpt_s)


def _run_stream_backward(res, g_img, g_t, grid, chunk, F, K,
                         want_gentry=False, zero_uncovered=True):
    """Shared stream-backward driver: pallas reverse sweep + covered-
    position zeroing.  Returns (g_rows, g_entry | None)."""
    (rows, starts, counts, tile_ids, final_t, ckpt_t, ckpt_s) = res
    gx, gy = grid
    T0 = counts.shape[0]
    N = rows.shape[0] - K
    g_t = g_t.reshape(T0, 1, P2)
    T, (counts, tile_ids, g_img, g_t) = _pad_tb(
        T0, counts, tile_ids, g_img, g_t)
    # padding tiles write their (all-zero) windows into the overshoot
    # tail, NOT at 0 where they would clobber tile 0's gradients
    starts_k = jnp.concatenate(
        [starts, jnp.full(T - T0, N, jnp.int32)]) if T > T0 else starts
    nchunks = K // chunk
    kern = functools.partial(_backward_stream_kernel, C=chunk, F=F, K=K,
                             gx=gx, resume=want_gentry, tiled="pad128")
    tile_block = pl.BlockSpec((TB, 1, P2), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // TB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TB, P2, F), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            tile_block,
            tile_block,
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, nchunks, P2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + ([tile_block] if want_gentry else []),
        scratch_shapes=[
            pltpu.VMEM((2, TB, K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TB)),
            pltpu.VMEM((2, 1, K, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N + K, 128), jnp.float32)]
        + ([jax.ShapeDtypeStruct((T, 1, P2), jnp.float32)]
           if want_gentry else []),
    )(counts, tile_ids, starts_k, rows, g_img, g_t, final_t, ckpt_t,
      ckpt_s)
    gout = outs[0]
    if zero_uncovered:
        # Positions no window wrote (per-tile K-overflow gaps, the tail
        # past the last window) hold uninitialized memory: zero them so
        # the caller's gather transpose / reverse all-to-all moves
        # clean rows.
        delta = jnp.zeros(N + K + 1, jnp.int32)
        delta = delta.at[starts].add(1).at[starts + K].add(-1)
        covered = jnp.cumsum(delta)[:N + K] > 0
        covered = covered & (jnp.arange(N + K) < N)
        gout = jnp.where(covered[:, None], gout, 0.0)
    g_entry = outs[1].reshape(T, P2)[:T0] if want_gentry else None
    return gout, g_entry


def _stream_rows_bwd(grid, chunk, F, K, track, zero_uncovered, res,
                     cotangents):
    g_img, g_t, _ = cotangents
    g_rows, _ = _run_stream_backward(res, g_img, g_t, grid, chunk, F, K,
                                     zero_uncovered=zero_uncovered)
    return g_rows, None, None, None


_composite_stream_rows.defvjp(_stream_rows_fwd, _stream_rows_bwd)


# Row gather whose TRANSPOSE uses redirected ids: uncovered stream
# positions (whose backward rows are raw uninitialized memory when
# zero_uncovered=False) scatter into a trash row past P that is sliced
# off — the select pass over [N+K, 128] disappears from the step.
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_redirect(Prows, D, src, ids, ids_bwd):
    return jnp.take(src, ids, axis=0, mode="clip")


def _gather_redirect_fwd(Prows, D, src, ids, ids_bwd):
    return jnp.take(src, ids, axis=0, mode="clip"), ids_bwd


def _gather_redirect_bwd(Prows, D, ids_bwd, g):
    if SEG_REDUCE and D <= 32 and g.shape[-1] == 128:
        # sorted-segment MXU reduction (rows arrive lane-group
        # replicated); pad lanes of the cotangent are sliced away by
        # the pack transpose upstream.
        G, _ = _grad_group(D)
        acc = reduce_rows_sorted(g, ids_bwd, Prows, D)      # [P, G]
        return jnp.pad(acc, ((0, 0), (0, 128 - G))), None, None
    acc = jnp.zeros((Prows + 8, g.shape[-1]), g.dtype).at[ids_bwd].add(
        g, mode="promise_in_bounds")
    return acc[:Prows], None, None


_gather_redirect.defvjp(_gather_redirect_fwd, _gather_redirect_bwd)


# ---- K-overflow continuation: resume compositing from a saved
# (logT, stopped) state.  Overflowing tiles re-enter the SAME kernels
# with starts advanced by r*K and the previous pass's exit state, so a
# tile with any depth complexity composites exactly — matching the
# reference's exact-num_rendered rasterization (`rasterizer_impl.cu:
# 343-384`) without ever exceeding the VMEM window budget. ----


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _composite_stream_resume(rows, starts, counts, tile_ids, entry_t,
                             entry_s, grid, chunk, F, K, track=True):
    """Stream compositor with (optional) per-tile entry state.

    entry_t [Tl, P2]: entry log-transmittance (differentiable — its
    cotangent routes the continuation's gradient into the producing
    pass's final_t); entry_s [Tl, P2] f32 0/1 stopped flags (non-diff).
    Both None = plain pass that additionally exports the stopped mask.
    Returns (img, final_t, last, stopped)."""
    return _stream_rows_impl(rows, starts, counts, tile_ids, grid,
                             chunk, F, K, track,
                             entry_t=entry_t, entry_s=entry_s)


def _stream_resume_fwd(rows, starts, counts, tile_ids, entry_t, entry_s,
                       grid, chunk, F, K, track=True):
    out, (final_t, ckpt_t, ckpt_s) = _stream_rows_impl(
        rows, starts, counts, tile_ids, grid, chunk, F, K, track,
        want_ckpt=True, entry_t=entry_t, entry_s=entry_s)
    # entry_t rides the residuals for its (static) pytree presence —
    # None vs array decides whether the backward emits g_entry.
    return out, (rows, starts, counts, tile_ids, final_t, ckpt_t,
                 ckpt_s, entry_t)


def _stream_resume_bwd(grid, chunk, F, K, track, res, cotangents):
    *res7, entry_t = res
    g_img, g_t, _, _ = cotangents
    g_rows, g_entry = _run_stream_backward(
        tuple(res7), g_img, g_t, grid, chunk, F, K,
        want_gentry=entry_t is not None)
    return g_rows, None, None, None, g_entry, None


_composite_stream_resume.defvjp(_stream_resume_fwd, _stream_resume_bwd)


def _composite_stream(packed128, stream_ids, starts, counts, tile_ids,
                      grid, chunk, F, K, track=True):
    """Stream compositor on per-splat packed rows + a stream-id prefix.

    The row gather sits OUTSIDE the kernel vjp: its autodiff transpose
    is exactly the by-id gradient scatter-add the backward needs.
    Uncovered stream positions (uninitialized backward rows) are
    handled by REDIRECTING their scatter targets to a trash row
    (`_gather_redirect`) instead of a full [N+K, 128] zero-select
    pass."""
    # pad the (small) id array, not the [*, 128] rows: window overshoot
    N = stream_ids.shape[0]
    sids = jnp.pad(stream_ids, (0, K))
    delta = jnp.zeros(N + K + 1, jnp.int32)
    delta = delta.at[starts].add(1).at[starts + K].add(-1)
    covered = (jnp.cumsum(delta)[:N + K] > 0) \
        & (jnp.arange(N + K) < N)
    sids_bwd = jnp.where(covered, sids, packed128.shape[0])
    rows = _gather_redirect(packed128.shape[0], 6 + F, packed128, sids,
                            sids_bwd)                  # [cap + K, 128]
    return _composite_stream_rows(rows, starts, counts, tile_ids,
                                  grid, chunk, F, K, track,
                                  zero_uncovered=False)


def composite_pallas_from_data(
    data: jnp.ndarray,
    counts: jnp.ndarray,
    tile_ids: jnp.ndarray,
    grid: tuple[int, int],
    chunk: int = 32,
):
    """Tile-major compositor on pre-gathered instance data.

    Args:
      data: [Tl, K, 6+F] rows [xy(2) | conic(3) | opacity(1) | feats(F)],
        front-to-back per tile (rows beyond counts[t] are ignored).
      counts: [Tl] int32 per-tile instance counts.
      tile_ids: [Tl] int32 GLOBAL tile ids (pixel coordinates derive from
        them, so a shard may pass any subset/ordering of the tile grid).
      grid: full-image (gx, gy).

    Returns:
      (img [Tl, 256, F], final_t [Tl, 256], n_contrib [Tl, 256]) —
      tile-major; use `untile_rows` for a full-image assembly.
    """
    F = data.shape[-1] - 6
    return _composite_core(data, counts, tile_ids, grid, chunk, F)


def composite_pallas_stream_rows(
    rows: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    tile_ids: jnp.ndarray,
    grid: tuple[int, int],
    chunk: int = 32,
    max_per_tile: int = 64,
    track_contrib: bool = False,
):
    """Stream compositor on a prebuilt depth-sorted instance stream.

    The routed-TP entry point: `parallel.route` delivers each member a
    merged [N, D] stream for its tiles plus per-tile starts/counts — the
    kernels window it directly (no dense [Tl, K, D] densification), and
    the rows cotangent flows back through the reverse all-to-all.

    Args:
      rows: [N, D] instance rows [xy(2)|conic(3)|opacity(1)|feats(F)],
        depth-sorted within each tile segment; starts[t] <= N.
      starts/counts/tile_ids: [Tl] int32 (counts <= max_per_tile).

    Returns:
      (img [Tl, 256, F], final_t [Tl, 256], n_contrib [Tl, 256]).
    """
    N, D = rows.shape
    F = D - 6
    assert 6 + F <= 126 and max_per_tile % chunk == 0
    rows128 = jnp.pad(rows, ((0, max_per_tile), (0, 128 - D)))
    return _composite_stream_rows(
        rows128, starts, counts, tile_ids, grid, chunk, F, max_per_tile,
        track_contrib)


def untile_rows(x: jnp.ndarray, grid: tuple[int, int]) -> jnp.ndarray:
    """[T, 256, ...] tile-major (row-major tile order) → [H, W, ...]."""
    gx, gy = grid
    extra = x.shape[2:]
    x = x.reshape(gy, gx, TILE, TILE, *extra)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(gy * TILE, gx * TILE, *extra)


def composite_pallas(
    bins: TileBins,
    xy: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    feats: jnp.ndarray,
    grid: tuple[int, int],
    chunk: int = 32,
    tile_axis: str | None = None,
    tile_shards: int = 1,
    max_per_tile: int | None = None,
    track_contrib: bool = True,
    stream_cap_local: int | None = None,
    overflow_rounds: int = 0,
) -> CompositeOutput:
    """Pallas-accelerated `composite` (same signature and semantics).

    With `tile_axis` (inside shard_map), each member gathers data and runs
    the kernel for its T/tile_shards tile rows only, and the image is
    reassembled with an all_gather — the kernel-backed version of the jnp
    twin's tile sharding.  In stream mode `stream_cap_local` bounds each
    member's window of the global stream (default: the full cap — always
    lossless, no per-member saving)."""
    gx, gy = grid
    F = feats.shape[-1]

    if bins.stream_ids is not None:
        # stream mode: no dense lists; kernels window the sorted
        # instance rows, grad rows carry their own scatter targets
        assert 6 + F <= 126
        T = bins.counts.shape[0]
        K = max_per_tile if max_per_tile is not None else \
            bins.stream_ids.shape[0] // T
        assert K % chunk == 0, (K, chunk)
        # 128 lanes exactly: Mosaic window DMAs need full-lane-tile rows
        # (physically free — the [P, 6+F] layout is lane-padded anyway)
        packed128 = jnp.pad(
            jnp.concatenate([xy, conic, opacity[:, None], feats],
                            axis=-1),
            ((0, 0), (0, 122 - F)))
        if STREAM_BARRIER:
            # keep the pad on the [P, ·] source (see flag comment)
            packed128 = jax.lax.optimization_barrier(packed128)
        if tile_axis is None:
            ov_on = (overflow_rounds > 0
                     and getattr(bins, "ov_tiles", None) is not None)
            if not ov_on:
                img, final_t, last = _composite_stream(
                    packed128, bins.stream_ids, bins.stream_starts,
                    bins.counts, jnp.arange(T, dtype=jnp.int32), grid,
                    chunk, F, K, track_contrib)
            else:
                # Lossless K-overflow continuation: the base pass
                # composites every tile's first K layers and exports
                # per-pixel (final_t, stopped); each round r then
                # resumes the `ov_tiles` (top-K-by-count) tiles from
                # that state over stream window [start + r*K, +K).
                # Weights inside a resume pass are alpha * GLOBAL T
                # (the carry starts at the entry logT), so the rounds'
                # images simply ADD — and gradients flow back through
                # entry_t = log(final_t) into the earlier passes.
                N = bins.stream_ids.shape[0]
                sids = jnp.pad(bins.stream_ids, (0, K))
                rows = jnp.take(packed128, sids, axis=0, mode="clip")
                img, final_t, last, stop = _composite_stream_resume(
                    rows, bins.stream_starts, bins.counts,
                    jnp.arange(T, dtype=jnp.int32), None, None, grid,
                    chunk, F, K, track_contrib)
                ov = bins.ov_tiles
                ent_t = jnp.log(final_t[ov])
                ent_s = jax.lax.stop_gradient(stop[ov])
                t_r = final_t[ov]
                for r in range(1, overflow_rounds + 1):
                    starts_r = jnp.minimum(bins.ov_starts + r * K, N)
                    counts_r = jnp.clip(bins.ov_counts - r * K, 0, K)
                    img_r, t_r, last_r, stop_r = _composite_stream_resume(
                        rows, starts_r, counts_r, ov, ent_t, ent_s,
                        grid, chunk, F, K, track_contrib)
                    img = img.at[ov].add(img_r)
                    if track_contrib:
                        last = last.at[ov].max(
                            jnp.where(last_r > 0, r * K + last_r, 0))
                    ent_t = jnp.log(jnp.maximum(t_r, 1e-30))
                    ent_s = jax.lax.stop_gradient(stop_r)
                final_t = final_t.at[ov].set(t_r)
            return CompositeOutput(
                image=untile_rows(img, grid),
                final_t=untile_rows(final_t, grid),
                n_contrib=untile_rows(last, grid),
            )
        # Tile-sharded stream (inside shard_map): each member gathers
        # and composites only its contiguous tile range's WINDOW of the
        # global stream — every routed byte (gather, kernel DMA, grad
        # scatter) is capL instead of the full stream cap.  Binning runs
        # replicated (identical compute on every member).
        assert T % tile_shards == 0, (T, tile_shards)
        Tl = T // tile_shards
        cap = bins.stream_ids.shape[0]
        capL = min(stream_cap_local or cap, cap)
        my = jax.lax.axis_index(tile_axis)
        t0 = my * Tl
        counts_l = jax.lax.dynamic_slice_in_dim(bins.counts, t0, Tl)
        starts_abs = jax.lax.dynamic_slice_in_dim(
            bins.stream_starts, t0, Tl)
        base = starts_abs[0]
        start_rel = starts_abs - base
        # a tile whose segment begins beyond capL would read wrong rows
        # from the clamped window: render it empty instead (lossless
        # whenever capL >= the member's true segment length — calibrate
        # with ops.autobudget; rasterize() counts the overflow).
        counts_l = jnp.where(start_rel > capL, 0, counts_l)
        starts_l = jnp.minimum(start_rel, capL)
        ids_l = jax.lax.dynamic_slice_in_dim(
            jnp.pad(bins.stream_ids, (0, capL + K)), base, capL + K)
        rows = jnp.take(packed128, ids_l, axis=0, mode="clip")
        img, final_t, last = _composite_stream_rows(
            rows, starts_l, counts_l,
            t0 + jnp.arange(Tl, dtype=jnp.int32), grid, chunk, F, K,
            track_contrib)
        gather = functools.partial(
            jax.lax.all_gather, axis_name=tile_axis, axis=0, tiled=True)
        return CompositeOutput(
            image=untile_rows(gather(img), grid),
            final_t=untile_rows(gather(final_t), grid),
            n_contrib=untile_rows(gather(last), grid),
        )

    T, K = bins.idx.shape
    assert K % chunk == 0, (K, chunk)

    idx, mask, counts = bins.idx, bins.mask, bins.counts
    gsg, gsp = bins.gsort_gauss, bins.gsort_pos
    if tile_axis is not None:
        assert T % tile_shards == 0, (T, tile_shards)
        Tl = T // tile_shards
        start = jax.lax.axis_index(tile_axis) * Tl
        idx = jax.lax.dynamic_slice_in_dim(idx, start, Tl, axis=0)
        mask = jax.lax.dynamic_slice_in_dim(mask, start, Tl, axis=0)
        counts = jax.lax.dynamic_slice_in_dim(counts, start, Tl, axis=0)
        tile_ids = start + jnp.arange(Tl, dtype=jnp.int32)
        # the compact aux indexes the full dense layout — dense transpose
        # only under tile sharding
        gsg = gsp = None
    else:
        tile_ids = jnp.arange(T, dtype=jnp.int32)

    # One packed row-gather via jnp.take — measured ~25x faster on TPU
    # than four separate fancy-index gathers + concat.
    packed = jnp.concatenate(
        [xy, conic, opacity[:, None], feats], axis=-1)     # [P, D]

    if tile_axis is None and 6 + F <= 32 and FUSED_REDUCE:
        # fused path: backward reduces gradients on-chip (no XLA scatter)
        img, final_t, last = _composite_packed(
            packed, idx, mask, counts, grid, chunk, F)
    else:
        data = gather_rows(packed, idx, mask, gsg, gsp,
                           packed.shape[0])                # [Tl, K, D]
        img, final_t, last = _composite_core(
            data, counts, tile_ids, grid, chunk, F, track_contrib)

    if tile_axis is not None:
        gather = functools.partial(
            jax.lax.all_gather, axis_name=tile_axis, axis=0, tiled=True)
        img, final_t, last = gather(img), gather(final_t), gather(last)

    return CompositeOutput(
        image=untile_rows(img, grid),
        final_t=untile_rows(final_t, grid),
        n_contrib=untile_rows(last, grid),
    )
