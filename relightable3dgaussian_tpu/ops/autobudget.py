"""Automatic rasterizer budget calibration.

The CUDA reference sizes every buffer at runtime from `num_rendered`
(host sync, `rasterizer_impl.cu:346-351`).  XLA needs static shapes, so
this framework's budgets — M (`max_tiles_per_gaussian`), K
(`max_per_tile`) and `stream_cap` — are jit statics.  This module
derives them from a cheap measurement pass over sample cameras instead
of per-scene hand tuning:

  1. `measure(...)` projects + bins (indices only, no compositing) and
     returns the exact scene demands: max tiles touched by any splat,
     max instances in any tile, total instance count.
  2. `derive(cfg, stats)` turns those into a `RasterizeConfig`, either
     `exact` (zero slack beyond shape rounding — lossless for the
     measured cameras, the right mode for benchmarks/eval of a frozen
     scene) or with headroom (training, where densification grows P and
     unmeasured cameras differ; watch `stats["dropped_*"]` and
     recalibrate when nonzero).

Budgets are rounded (M to 4, K to the compositing chunk, stream_cap to
8192) so recalibration usually lands on the same config and avoids a
re-jit.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from . import binning, projection
from .rasterize import RasterizeConfig


class BudgetStats(NamedTuple):
    max_tiles: int       # max tiles touched by one splat (→ M)
    max_per_tile: int    # max instances in one tile (→ K)
    num_instances: int   # total surviving instances (→ stream_cap)
    rect_slots: int = 0  # total rect-area slots (offset-expansion cap
                         # demand: includes the corner tiles the exact
                         # circle test later discards)
    # Deepest per-tile counts, descending, maxed elementwise over the
    # sample cameras (an upper bound on any one camera's tail) — sizes
    # the K-overflow continuation when max_per_tile exceeds the stream
    # kernels' VMEM K ceiling.
    top_counts: tuple = ()
    # Splat-footprint tail: #splats with tiles_touched > m for
    # m in SPLIT_THRESHOLDS (maxed over cameras) + the splat count —
    # sizes the "split" expansion (M_small for everyone, full M for the
    # top-footprint splats; halves the instance-sort keys).
    tt_over: tuple = ()
    num_splats: int = 0


def _round_up(x: int, m: int) -> int:
    return ((max(x, 1) + m - 1) // m) * m


SPLIT_THRESHOLDS = (4, 8, 12, 16, 24)
AUTO_SPLIT = False  # see the negative-result note in derive()


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _measure_tiles(means3d, scales, rotations, opacities, alive, camera,
                   *, width, height):
    proj = projection.preprocess(
        means3d, scales, rotations, opacities, alive,
        camera["w2c"], camera["full_proj"], camera["campos"],
        width, height,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        colors_precomp=jnp.zeros_like(means3d))
    tt = jnp.where(proj.valid, proj.tiles_touched, 0)
    over = jnp.stack([jnp.sum((tt > m).astype(jnp.int32))
                      for m in SPLIT_THRESHOLDS])
    return jnp.max(tt), jnp.sum(tt), over


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "cap", "topn"))
def _measure_counts(means3d, scales, rotations, opacities, alive, camera,
                    *, width, height, cap, topn=1024):
    proj = projection.preprocess(
        means3d, scales, rotations, opacities, alive,
        camera["w2c"], camera["full_proj"], camera["campos"],
        width, height,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        colors_precomp=jnp.zeros_like(means3d))
    grid = projection.grid_size(width, height)
    num_tiles = grid[0] * grid[1]
    # Offset expansion: memory is bound by `cap`, never by [P, max-M] —
    # the measurement itself must survive un-calibrated scenes.
    key, _, num_instances, dropped, depth_bits = (
        binning.expand_instance_keys_offset(proj, grid, cap))
    key_sorted = jax.lax.sort(key)
    tile_sorted = (key_sorted >> depth_bits).astype(jnp.int32)
    boundaries = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left")
    counts = boundaries[1:] - boundaries[:-1]
    top = jax.lax.top_k(counts, min(topn, counts.shape[0]))[0]
    return top, num_instances, dropped


def measure(
    means3d, scales, rotations, opacities, alive,
    cameras: Sequence[dict],
    width: int, height: int,
) -> BudgetStats:
    """Exact budget demands of (splats, cameras), maxed over cameras.

    `cameras` are `Camera.render_inputs()` dicts; inputs are ACTIVATED
    splat attributes (positive scales, unit quats, (0,1) opacities).
    The count pass runs the offset expansion under a measurement cap
    sized from the tile pass's exact rect-slot total, so calibration
    never materializes a [P, max-M] matrix (an un-densified init cloud
    can have a splat touching every tile).
    """
    max_tiles = max_count = num_inst = rect_slots = 0
    import numpy as _np0
    tt_over = _np0.zeros(len(SPLIT_THRESHOLDS), _np0.int64)
    for cam in cameras:
        cam = {k: jnp.asarray(v) for k, v in cam.items()}
        mt, slots, over = _measure_tiles(
            means3d, scales, rotations, opacities,
            alive, cam, width=width, height=height)
        max_tiles = max(max_tiles, int(mt))
        rect_slots = max(rect_slots, int(slots))
        tt_over = _np0.maximum(tt_over, _np0.asarray(over))
    # One cap for every camera's count pass → a single compile.
    cap = _round_up(rect_slots, 1 << 16)
    import numpy as _np
    top_acc = None
    for cam in cameras:
        cam = {k: jnp.asarray(v) for k, v in cam.items()}
        top, ni, dropped = _measure_counts(
            means3d, scales, rotations, opacities, alive, cam,
            width=width, height=height, cap=cap)
        assert int(dropped) == 0  # cap covers the exact rect-slot total
        top = _np.asarray(top)
        top_acc = top if top_acc is None else _np.maximum(top_acc, top)
        max_count = max(max_count, int(top[0]))
        num_inst = max(num_inst, int(ni))
    return BudgetStats(max_tiles=max_tiles, max_per_tile=max_count,
                       num_instances=num_inst, rect_slots=rect_slots,
                       top_counts=tuple(int(c) for c in top_acc),
                       tt_over=tuple(int(c) for c in tt_over),
                       num_splats=int(means3d.shape[0]))


def derive(
    cfg: RasterizeConfig,
    stats: BudgetStats,
    *,
    exact: bool = False,
    m_headroom: float = 1.3,
    k_headroom: float = 1.3,
    cap_headroom: float = 1.2,
    max_k: int = 4096,
    single_chunk: bool | None = None,
    single_chunk_max: int = 768,
    stream_k_max: int = 1152,
) -> RasterizeConfig:
    """Turn measured demands into a budgeted `RasterizeConfig`.

    `exact=True` applies zero slack beyond shape rounding — lossless for
    exactly the measured (splats, cameras), e.g. benchmarks and frozen-
    scene eval.  Otherwise headroom absorbs densification growth and
    unmeasured cameras; callers must still watch `stats["dropped_*"]`
    and recalibrate on overflow (`needs_recalibration`).

    `single_chunk` (None = auto when the Pallas backend will run): set
    chunk = K so the kernels take their specialized straight-line path —
    no loop carry, no checkpoint traffic; measured ~15% faster at 800²
    than chunked despite forgoing chunk-level early exit.  Capped at
    `single_chunk_max` (VMEM: window scratch is 2·TB·K·128 f32).  Never
    applied to the jnp twin — its scan materializes [T, chunk, 256]
    intermediates per step, so big chunks blow HBM on CPU.
    """
    hm, hk, hc = (1.0, 1.0, 1.0) if exact else (
        m_headroom, k_headroom, cap_headroom)
    m = _round_up(int(stats.max_tiles * hm), 4)
    # Heavy-tailed tile footprints (un-densified init clouds: p50 ~20
    # tiles/splat, max in the thousands) make the dense [P, M] slot
    # matrix explode; past this M the offset expansion's instance-bound
    # memory/sort wins and M stops being a budget at all.
    offset_mode = m > 64
    if single_chunk is None:
        backend = cfg.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
        single_chunk = backend == "pallas"
    k_demand = _round_up(int(stats.max_per_tile * hk), 8)
    vmem_capped = False
    if single_chunk and k_demand <= single_chunk_max:
        if k_demand > 96:
            # unrolled 96-chunks: measured faster than the single-chunk
            # specialization (r5: 32.0 vs 33.9 ms at 800²/K=288) — the
            # [C,C]x[C,P2] cumsum tri-matmuls shrink 3x and the static
            # unroll keeps straight-line control (composite_pallas.
            # UNROLL_MAX covers nchunks <= 8, i.e. K <= 768 here).
            chunk = 96
            k = min(_round_up(k_demand, chunk), max_k)
        else:
            chunk = k = min(k_demand, max_k)
    else:
        # The Pallas compositor requires K % chunk == 0; cap on it too.
        chunk = cfg.chunk
        if single_chunk is not None and single_chunk:
            # pallas stream kernels: window scratch is 2·TB·K·128 f32
            # per direction — K past ~1152 blows the 16 MB scoped-VMEM
            # limit (measured: K=1536 → 16.5 MB).  Depth layers beyond
            # the cap are covered by the K-overflow continuation
            # (overflow_rounds/overflow_tiles below) — exact at any
            # depth complexity, like the reference's num_rendered-
            # sized allocation.
            if max_k > stream_k_max:
                max_k = stream_k_max
                vmem_capped = True
        max_k = max((max_k // chunk) * chunk, chunk)
        k = min(_round_up(k_demand, chunk), max_k)
    # K pinned below the measured demand → size the continuation from
    # the per-tile count tail: rounds to cover the deepest tile, slots
    # (with 2x headroom) for every tile whose demand exceeds K.
    overflow_rounds = overflow_tiles = 0
    if (single_chunk and k < k_demand and stats.top_counts):
        overflow_rounds = min(-(-(k_demand - k) // k), 8)
        n_over = sum(1 for c in stats.top_counts
                     if _round_up(int(c * hk), 8) > k)
        overflow_tiles = min(_round_up(max(2 * n_over, 8), 8),
                             cfg.grid[0] * cfg.grid[1],
                             2 * len(stats.top_counts))
    gx, gy = cfg.grid
    if offset_mode:
        # the expansion cap must hold every rect-area slot (corner
        # tiles are circle-culled only after slots are enumerated)
        cap = _round_up(int(stats.rect_slots * hc), 8192)
    else:
        cap = min(_round_up(int(stats.num_instances * hc), 8192),
                  gx * gy * k)
    if overflow_rounds:
        # the stream prefix must hold the deep tiles' FULL segments
        cap = max(cap, min(_round_up(int(stats.num_instances * hc), 8192),
                           gx * gy * k * (1 + overflow_rounds)))
    # Split expansion (negative result, r5): halving the sort keys with
    # M_small-for-everyone + full-M-for-the-top-footprints measured
    # SLOWER on the 800² bench (pb=32768: 32.5 ms vs 27.3 dense;
    # pb=16384: 29.0 ms AND lossy) — `top_k` over [P] at large k is
    # itself sort-priced and the second expansion adds its own
    # reshape/gather machinery.  The mode stays available
    # (`expansion="split"`, exactness pinned by
    # tests/test_overflow.py::test_split_expansion_matches_dense) but
    # derive() never auto-picks it; AUTO_SPLIT re-enables the heuristic
    # for experiments.
    expansion = "offset" if offset_mode else "dense"
    split_ms, split_pb = cfg.split_m_small, cfg.split_p_big
    if (AUTO_SPLIT and not offset_mode and stats.tt_over
            and stats.num_splats and m > 8):
        Pn = stats.num_splats
        best = None
        for ms, n_over in zip(SPLIT_THRESHOLDS, stats.tt_over):
            if ms >= m:
                continue
            pb = min(_round_up(int(n_over * 1.5) + 256, 1024), Pn)
            keys = Pn * ms + pb * m
            if best is None or keys < best[0]:
                best = (keys, ms, pb)
        if best is not None and best[0] < 0.8 * Pn * m:
            expansion = "split"
            _, split_ms, split_pb = best
    new = dataclasses.replace(
        cfg, max_tiles_per_gaussian=m, max_per_tile=k, chunk=chunk,
        stream_cap=cap, expansion=expansion,
        split_m_small=split_ms, split_p_big=split_pb,
        overflow_rounds=overflow_rounds, overflow_tiles=overflow_tiles)
    if overflow_rounds:
        reason = ("VMEM stream-window ceiling"
                  if vmem_capped else f"max_k={max_k}")
        print(f"[autobudget] K demand {k_demand} > K={k} ({reason}); "
              f"continuation rounds={overflow_rounds} "
              f"tiles={overflow_tiles} keeps rasterization lossless",
              flush=True)
    return new


def needs_recalibration(stats: dict) -> bool:
    """True iff a render's overflow counters show the budget was exceeded
    (gradients/pixels were lost — recalibrate and re-render)."""
    return any(int(stats.get(k, 0)) > 0 for k in
               ("dropped_rect", "dropped_tile", "dropped_stream",
                "dropped_grad"))


def calibrate_from_params(
    params, alive, cameras: Sequence[dict], cfg: RasterizeConfig,
    *, exact: bool = False, **headroom,
) -> RasterizeConfig:
    """`measure` + `derive` from `models.gaussians` raw params."""
    from ..models import gaussians as G
    attrs = G.render_attributes(params)
    stats = measure(attrs["means3d"], attrs["scales"], attrs["rotations"],
                    attrs["opacities"], alive, cameras,
                    cfg.width, cfg.height)
    return derive(cfg, stats, exact=exact, **headroom)


def sample_cameras(cameras: Sequence, n: int = 8) -> list[dict]:
    """Evenly-spaced `render_inputs()` sample for calibration."""
    n = min(n, len(cameras))
    idx = [int(round(i * (len(cameras) - 1) / max(n - 1, 1)))
           for i in range(n)]
    return [cameras[i].render_inputs() for i in sorted(set(idx))]


class BudgetController:
    """Holds the live `RasterizeConfig` for a training run.

    Trainers read `controller.cfg` each step (a config change is just a
    recompile of the step) and call `check(params, alive, stats)` on
    their cadence: when a step's overflow counters fire — densification
    grew the scene past the headroom — the controller recalibrates from
    its sample cameras and swaps in a larger config.  The overflowed
    step itself trained on a lossy render (dropped instances carry no
    gradient); with headroom and a `check_every`-step cadence that is a
    bounded transient, unlike the silent permanent truncation a fixed
    hand-picked budget risks.
    """

    def __init__(self, cfg: RasterizeConfig, cameras: Sequence[dict],
                 check_every: int = 100,
                 log=None, **headroom):
        self.cfg = cfg
        self.cameras = list(cameras)
        self.check_every = check_every
        self.headroom = headroom
        self.log = log or (lambda msg: print(msg, flush=True))
        self.recalibrations = 0

    @classmethod
    def calibrated(cls, params, alive, cameras: Sequence[dict],
                   cfg: RasterizeConfig, check_every: int = 100,
                   log=None, **headroom) -> "BudgetController":
        c = cls(cfg, cameras, check_every=check_every, log=log, **headroom)
        c.cfg = calibrate_from_params(params, alive, c.cameras, cfg,
                                      **headroom)
        return c

    def recalibrate(self, params, alive) -> "RasterizeConfig":
        """Unconditional recalibration from the CURRENT splats — call
        after a snapshot/PLY resume: the startup calibration saw the
        init cloud, and an eval-only resume never runs the overflow-
        triggered check() path (r5: a 237k-splat resumed eval rendered
        with the 37.5k-cloud budgets and dropped ~60% of instances)."""
        self.cfg = calibrate_from_params(params, alive, self.cameras,
                                         self.cfg, **self.headroom)
        return self.cfg

    def check(self, params, alive, stats: dict) -> bool:
        """Recalibrate if `stats` (a step's overflow counters) fired.
        Returns True when the config changed."""
        if not needs_recalibration(stats):
            return False
        old = self.cfg
        new = calibrate_from_params(params, alive, self.cameras, old,
                                    **self.headroom)
        # Budgets only grow — an overflow means the measured sample
        # under-covers the live distribution, so never hand back slack.
        k = max(new.max_per_tile, old.max_per_tile)
        # dropped_tile counts depth layers beyond base + continuation
        # coverage.  When K is pinned (stream_k_max VMEM cap) the
        # continuation config (overflow_rounds/tiles) is what grows —
        # derive() already sized it from the fresh per-tile count tail.
        only_tile = (int(stats.get("dropped_tile", 0)) > 0 and all(
            int(stats.get(c, 0)) == 0 for c in
            ("dropped_rect", "dropped_stream", "dropped_grad")))
        ov_r = max(new.overflow_rounds, old.overflow_rounds)
        ov_t = max(new.overflow_tiles, old.overflow_tiles)
        if (only_tile and k == old.max_per_tile
                and ov_r == old.overflow_rounds
                and ov_t == old.overflow_tiles):
            if ov_r > 0:
                # Continuation active yet instances still dropped: the
                # live tile-count tail outruns the calibration sample —
                # force one more round + more slots rather than train
                # lossily until the sample catches up.
                ov_r += 1
                ov_t = min(ov_t * 2,
                           old.grid[0] * old.grid[1])
                self.log(f"[autobudget] dropped_tile="
                         f"{int(stats['dropped_tile'])} persists at "
                         f"rounds={old.overflow_rounds}; forcing "
                         f"rounds={ov_r} tiles={ov_t}")
            else:
                # K unchanged and no continuation derived: the sample
                # under-covers the live cameras (a pure sampling
                # shortfall — a VMEM-capped K would have produced a
                # continuation config).  Keep cfg, log precisely.
                self.log(f"[autobudget] dropped_tile="
                         f"{int(stats['dropped_tile'])} persists; K={k} "
                         f"not growable from the calibration sample "
                         f"(sampling shortfall — live cameras exceed "
                         f"the measured tail); keeping cfg (no re-jit)")
                return False
        # keep single-chunk mode aligned with the grown K
        chunk = k if new.chunk == new.max_per_tile else new.chunk
        self.cfg = dataclasses.replace(
            new,
            max_tiles_per_gaussian=max(new.max_tiles_per_gaussian,
                                       old.max_tiles_per_gaussian),
            max_per_tile=k, chunk=chunk,
            overflow_rounds=ov_r, overflow_tiles=ov_t,
            stream_cap=max(new.stream_cap or 0, old.stream_cap or 0)
            or None)
        if self.cfg == old:
            # the budget is pinned at a hard cap (e.g. max_k) — a
            # recalibration loop would re-jit every check for nothing
            self.log("[autobudget] overflow persists at capped budget "
                     f"{dict(stats)}; keeping cfg")
            return False
        self.recalibrations += 1
        self.log(f"[autobudget] overflow {dict(stats)} -> "
                 f"M={self.cfg.max_tiles_per_gaussian} "
                 f"K={self.cfg.max_per_tile} "
                 f"cap={self.cfg.stream_cap}")
        return True
