"""Top-level differentiable rasterizer: preprocess → bin → composite.

Replaces the reference `Rasterizer::forward` 12-step pipeline
(`rasterizer_impl.cu:213-529`) and its autograd wrapper
(`gaussian_renderer/r3dg_rasterization.py:76-341`) with a single jittable,
autodiff-able JAX function.  There is no host synchronization anywhere
(the reference syncs on `num_rendered`, `rasterizer_impl.cu:347`) — all
capacities are static.

Gradients flow to means/scales/rotations/opacities/SH/features through
the projection math and the compositing scan by ordinary autodiff; the
binning indices are non-differentiable (as in the reference).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import binning, composite as comp, projection


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer configuration (hashable → usable as a jit static)."""
    width: int
    height: int
    max_tiles_per_gaussian: int = 64   # per-splat instance budget
    max_per_tile: int = 1024           # K: depth layers per tile
    chunk: int = 32                    # compositing chunk (matmul K dim)
    znear: float = 0.2
    scale_modifier: float = 1.0
    # Sharded compositing (only valid inside shard_map over a mesh that
    # has this axis): each member composites T/tile_shards tiles.
    tile_axis: str | None = None
    tile_shards: int = 1
    # Compositor backend: "pallas" (TPU kernel, ops.composite_pallas),
    # "jnp" (XLA scan twin), or "auto" (pallas on TPU, jnp elsewhere).
    backend: str = "auto"
    # Static capacity for the compact gradient reduction (instances beyond
    # it lose their parameter gradients — watch stats["dropped_grad"]).
    # None keeps the dense scatter transpose (always exact).
    max_grad_instances: int | None = None
    # n_contrib (1-based index of each pixel's last contributing splat)
    # costs ~4 VPU ops per kernel chunk; training never reads it, so
    # trainers/bench set False (the output is then zeros).
    track_contrib: bool = True
    # Stream-prefix capacity (stream mode only; default T*K).  Every
    # routed byte — the row gather, the kernel window DMAs, and the
    # backward's row-serial gradient scatter (~13 ns/row on v5e) —
    # scales with this, so a cap near the real instance count is a pure
    # win; overflow is counted in stats["dropped_stream"], assert 0.
    stream_cap: int | None = None
    # Per-member window of the stream under tile sharding (default: the
    # full stream cap — always lossless, no per-member saving).  With a
    # calibrated value each member's gather/DMA/scatter bytes shrink
    # ~tile_shards-fold; overflow → stats["dropped_stream_shard"].
    stream_cap_local: int | None = None
    # Instance expansion: "dense" ([P, M] slot matrix), "split" (dense
    # with M_small slots for everyone + full M for the split_p_big
    # largest footprints — ~2x fewer sort keys when the footprint
    # distribution is skewed, the usual case) or "offset"
    # (exclusive-scan over tiles_touched — instance-budget-bound; the
    # mode for heavy-tailed tile footprints where any M big enough to
    # be lossless makes [P, M] explode).  See `binning.bin_splats`.
    expansion: str = "dense"
    split_m_small: int = 8
    split_p_big: int = 8192
    # Lossless K-overflow continuation (stream/pallas, single-device):
    # the `overflow_tiles` deepest tiles get up to `overflow_rounds`
    # extra K-window compositing passes over their stream-segment
    # tails, so depth complexity beyond the VMEM-capped K composites
    # exactly (reference exactness bar: `rasterizer_impl.cu:343-384`).
    # `ops.autobudget.derive` sets both when the measured per-tile
    # demand exceeds the stream kernels' VMEM K ceiling.
    overflow_rounds: int = 0
    overflow_tiles: int = 0

    @property
    def grid(self) -> tuple[int, int]:
        return projection.grid_size(self.width, self.height)


class RasterizeOutput(NamedTuple):
    color: jnp.ndarray        # [H, W, 3] (background composited)
    opacity: jnp.ndarray      # [H, W]
    depth: jnp.ndarray        # [H, W] (alpha-weighted, not normalized)
    feature: jnp.ndarray      # [H, W, S] auxiliary blended channels
    final_t: jnp.ndarray      # [H, W]
    n_contrib: jnp.ndarray    # [H, W] int32
    radii: jnp.ndarray        # [P] int32 (0 = culled) — densification stats
    visible: jnp.ndarray      # [P] bool
    stats: dict[str, jnp.ndarray]  # binning overflow counters


def composite_dispatch(cfg: RasterizeConfig, bins, xy, conic, opacity,
                       feats):
    """Route compositing to the Pallas kernel (TPU) or the jnp twin
    according to `cfg.backend` ("auto" → pallas on TPU unless
    tile-sharded)."""
    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        from . import composite_pallas as cpal
        return cpal.composite_pallas(
            bins, xy, conic, opacity, feats, cfg.grid, chunk=cfg.chunk,
            tile_axis=cfg.tile_axis, tile_shards=cfg.tile_shards,
            max_per_tile=cfg.max_per_tile,
            track_contrib=cfg.track_contrib,
            stream_cap_local=cfg.stream_cap_local,
            overflow_rounds=cfg.overflow_rounds)
    return comp.composite(
        bins, xy, conic, opacity, feats, cfg.grid, chunk=cfg.chunk,
        tile_axis=cfg.tile_axis, tile_shards=cfg.tile_shards)


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray,
    w2c: jnp.ndarray,
    full_proj: jnp.ndarray,
    campos: jnp.ndarray,
    focal: jnp.ndarray,
    tan_fov: jnp.ndarray,
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    sh_coeffs: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    extra_features: jnp.ndarray | None = None,
    active_sh_degree: int = 3,
    xy_offset: jnp.ndarray | None = None,
) -> RasterizeOutput:
    """Render splats to an image plus auxiliary channels.

    Args:
      means3d: [P, 3]; scales [P, 3] (positive); rotations [P, 4] unit quats;
        opacities [P] in (0,1); alive [P] bool.
      w2c, full_proj: [4, 4] camera matrices (math convention, y = M x).
      campos: [3]; focal: [2] (fx, fy); tan_fov: [2] (tanx, tany).
      bg_color: [3].
      sh_coeffs: [P, Ksh, 3] or None; colors_precomp: [P, 3] or None.
      extra_features: [P, S] additional channels to alpha-blend (normals,
        BRDF outputs, ...), or None.
      active_sh_degree: static current SH degree.

    Returns:
      RasterizeOutput (all image tensors cropped to [H, W]).
    """
    cfg = config
    proj = projection.preprocess(
        means3d, scales, rotations, opacities, alive,
        w2c, full_proj, campos,
        cfg.width, cfg.height,
        focal[0], focal[1], tan_fov[0], tan_fov[1],
        sh_coeffs=sh_coeffs,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        active_sh_degree=active_sh_degree,
        scale_modifier=cfg.scale_modifier,
        znear=cfg.znear,
        xy_offset=xy_offset,
    )

    backend = cfg.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    # Stream mode: the Pallas compositor window-DMAs tile segments
    # straight out of the sorted instance array, so the dense [T, K]
    # lists (a ~4 ms sequential windowed-gather loop at 800²) are never
    # built.  Kernel path only; under tile sharding each member windows
    # its contiguous slice of the stream.
    stream = (backend == "pallas" and cfg.max_grad_instances is None)
    # Overflow continuation is a single-device stream-kernel feature
    # (sharded modes size K per member instead).
    ov_tiles = (cfg.overflow_tiles
                if (stream and cfg.tile_axis is None
                    and cfg.overflow_rounds > 0) else 0)
    bins = binning.bin_splats(
        proj, cfg.grid, cfg.max_tiles_per_gaussian, cfg.max_per_tile,
        grad_cap=cfg.max_grad_instances, stream=stream,
        stream_cap=cfg.stream_cap
        if (stream or cfg.expansion == "offset") else None,
        expansion=cfg.expansion,
        overflow_tiles=ov_tiles, overflow_rounds=cfg.overflow_rounds,
        split_m_small=cfg.split_m_small, split_p_big=cfg.split_p_big)
    # Indices are integer routing decisions, never differentiated.
    bins = jax.tree.map(jax.lax.stop_gradient, bins)

    S = 0 if extra_features is None else extra_features.shape[-1]
    parts = [proj.rgb, proj.depth[:, None],
             jnp.ones_like(proj.depth)[:, None]]
    if extra_features is not None:
        parts.append(extra_features)
    feats = jnp.concatenate(parts, axis=-1)

    out = composite_dispatch(
        cfg, bins, proj.xy, proj.conic, proj.opacity, feats)

    img = out.image[: cfg.height, : cfg.width]
    final_t = out.final_t[: cfg.height, : cfg.width]
    color = img[..., 0:3] + final_t[..., None] * bg_color
    depth = img[..., 3]
    opacity = img[..., 4]
    feature = img[..., 5: 5 + S]

    stats = {
        "num_instances": bins.num_instances,
        "dropped_rect": bins.dropped_rect,
        "dropped_tile": bins.dropped_tile,
        **({"dropped_grad": bins.dropped_grad}
           if bins.dropped_grad is not None else {}),
        **({"dropped_stream": bins.dropped_stream}
           if bins.dropped_stream is not None else {}),
    }
    if stream and cfg.tile_axis is not None:
        # per-member stream-window overflow (replicated binning → same
        # value on every member, no psum needed)
        cap = bins.stream_ids.shape[0]
        capL = min(cfg.stream_cap_local or cap, cap)
        if capL < cap:
            T = bins.counts.shape[0]
            Tl = T // cfg.tile_shards
            seg_start = bins.stream_starts.reshape(
                cfg.tile_shards, Tl)[:, 0]
            stream_end = bins.stream_starts[-1] + bins.counts[-1]
            seg_end = jnp.concatenate([seg_start[1:], stream_end[None]])
            stats["dropped_stream_shard"] = jnp.sum(
                jnp.maximum(seg_end - seg_start - capL, 0))

    return RasterizeOutput(
        color=color,
        opacity=opacity,
        depth=depth,
        feature=feature,
        final_t=final_t,
        n_contrib=out.n_contrib[: cfg.height, : cfg.width],
        radii=proj.radius,
        visible=proj.valid,
        stats=stats,
    )
