"""Training loop: jitted train step, SH warmup, densification cadence.

TPU-native analogue of the reference training driver (`train.py:25-216`).
The per-iteration work is one compiled XLA program: render → loss → grad →
optax update → densification-stat accumulation.  Densification runs as a
second compiled program every `densification_interval` steps (same
executable every time — static capacity).  The only Python-level schedule
state is the step counter and the active SH degree (which changes at most
`sh_degree` times, each a cheap recompile).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import densify as D
from ..models import gaussians as G
from ..models import render as R
from ..ops.rasterize import RasterizeConfig
from . import optimizer as opt_mod


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Schedule constants (reference `arguments/__init__.py:73-124`)."""
    iterations: int = 30_000
    sh_degree: int = 3
    sh_warmup_interval: int = 1000       # oneupSHdegree cadence (train.py:124)
    densify_from: int = 500
    densify_until: int = 10_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    prune_big_screen_after: int = 3000   # size_threshold=20 after this iter
    max_screen_size: int = 20
    random_background: bool = False
    white_background: bool = False


@flax.struct.dataclass
class TrainState:
    gaussians: G.GaussianState
    opt_state: Any
    step: jnp.ndarray                    # [] int32


def active_sh_degree(step: int, cfg: TrainConfig) -> int:
    """SH degree warmup: +1 every 1000 iters (reference `train.py:124-125`)."""
    return min(step // cfg.sh_warmup_interval, cfg.sh_degree)


def init_train_state(
    gaussians: G.GaussianState,
    optim_cfg: opt_mod.OptimConfig,
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = opt_mod.make_optimizer(optim_cfg)
    opt_state = tx.init(gaussians.params)
    return TrainState(
        gaussians=gaussians,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32)), tx


@functools.partial(
    jax.jit,
    static_argnames=("tx", "raster_cfg", "loss_cfg", "sh_deg"))
def train_step(
    state: TrainState,
    camera: dict[str, jnp.ndarray],
    gt: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    tx: optax.GradientTransformation,
    raster_cfg: RasterizeConfig,
    loss_cfg: R.LossConfig,
    sh_deg: int,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One optimization step of the base 3DGS pipeline."""
    gs = state.gaussians
    zeros_xy = jnp.zeros((gs.params.capacity, 2), jnp.float32)

    def loss_fn(params, xy_offset):
        results = R.render(
            params, gs.alive, camera, bg_color, raster_cfg,
            loss_cfg=loss_cfg, gt=gt, active_sh_degree=sh_deg,
            is_training=True, xy_offset=xy_offset)
        aux = {
            "tb": results["tb_dict"],
            "radii": results["radii"],
            "visible": results["visibility_filter"],
            "normal_used": True,
            "stats": results["stats"],
        }
        return results["loss"], aux

    (loss, aux), (grads, xy_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(gs.params, zeros_xy)

    # Dead slots must not drift.
    alive_f = gs.alive
    grads = jax.tree.map(
        lambda g: jnp.where(
            alive_f.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0), grads)

    updates, new_opt_state = tx.update(grads, state.opt_state, gs.params)
    new_params = optax.apply_updates(gs.params, updates)

    new_gaussians = D.add_stats(
        gs.replace(params=new_params),
        xy_grad, grads.normal, aux["radii"], aux["visible"],
        width=raster_cfg.width, height=raster_cfg.height)

    metrics = dict(aux["tb"])
    metrics["num_alive"] = jnp.sum(gs.alive)
    metrics.update({f"binning/{k}": v for k, v in aux["stats"].items()})
    if hasattr(new_opt_state, "total_notfinite"):
        metrics["notfinite_skips"] = new_opt_state.total_notfinite
    new_state = TrainState(
        gaussians=new_gaussians,
        opt_state=new_opt_state,
        step=state.step + 1)
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "max_screen_size"))
def densify_step(
    state: TrainState,
    cfg: D.DensifyConfig,
    scene_extent: float,
    rng: jax.Array,
    max_screen_size: int,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    gs, opt_state, info = D.densify_and_prune(
        state.gaussians, state.opt_state, cfg, scene_extent, rng,
        max_screen_size=max_screen_size)
    return state.replace(gaussians=gs, opt_state=opt_state), info


@jax.jit
def opacity_reset_step(state: TrainState) -> TrainState:
    gs, opt_state = D.reset_opacity(state.gaussians, state.opt_state)
    return state.replace(gaussians=gs, opt_state=opt_state)


def train(
    state: TrainState,
    tx: optax.GradientTransformation,
    cameras: list,
    cfg: TrainConfig,
    raster_cfg: RasterizeConfig,
    loss_cfg: R.LossConfig,
    densify_cfg: D.DensifyConfig,
    scene_extent: float,
    num_steps: int | None = None,
    seed: int = 0,
    log_every: int = 0,
    callback: Callable[[int, dict], None] | None = None,
    budget=None,
) -> TrainState:
    """Python-level driver around the compiled steps.

    Mirrors the reference iteration structure (`train.py:117-213`):
    random camera order, SH warmup, densify/prune window, opacity resets.

    `budget`: optional `ops.autobudget.BudgetController`; when given it
    supplies the live raster config (overriding `raster_cfg`) and is
    asked every `budget.check_every` steps whether the scene outgrew
    the instance budgets (then the config grows and the step recompiles).
    """
    import numpy as np
    steps = num_steps or cfg.iterations
    stack: list[int] = []

    start = int(state.step)
    # Fold the resume step into both RNGs: the driver calls train() in
    # save_interval-sized chunks, and re-seeding with the bare seed made
    # every chunk replay the same camera permutation (visible as
    # exactly-period-N PSNR cycles in the round-3 rehearsal log).
    rng = np.random.default_rng([seed, start])
    key = jax.random.fold_in(jax.random.PRNGKey(seed), start)
    for it in range(start + 1, start + steps + 1):
        if not stack:
            stack = list(rng.permutation(len(cameras)))
        cam = cameras[stack.pop()]
        camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        gt = {"image": jnp.asarray(cam.image)}
        if cam.gt_alpha_mask is not None:
            gt["mask"] = jnp.asarray(cam.gt_alpha_mask)
        if cam.depth is not None:
            gt["depth"] = jnp.asarray(cam.depth)
        if cam.normal is not None:
            gt["normal"] = jnp.asarray(cam.normal)

        if cfg.random_background:
            key, k2 = jax.random.split(key)
            bg = jax.random.uniform(k2, (3,))
        else:
            bg = jnp.ones(3) if cfg.white_background else jnp.zeros(3)

        sh_deg = active_sh_degree(it, cfg)
        if budget is not None:
            raster_cfg = budget.cfg
        state, metrics = train_step(
            state, camera, gt, bg, tx, raster_cfg, loss_cfg, sh_deg)
        if budget is not None and it % budget.check_every == 0:
            gs = state.gaussians
            budget.check(gs.params, gs.alive, {
                k.split("/", 1)[1]: int(v) for k, v in metrics.items()
                if k.startswith("binning/dropped")})

        # Reference: extra opacity reset at densify_from on white-bg
        # scenes (`train.py:182-184`).
        if cfg.white_background and it == cfg.densify_from:
            state = opacity_reset_step(state)

        if cfg.densify_from < it < cfg.densify_until \
                and it % cfg.densification_interval == 0:
            key, k2 = jax.random.split(key)
            mss = cfg.max_screen_size if it > cfg.prune_big_screen_after else 0
            state, dinfo = densify_step(
                state, densify_cfg, scene_extent, k2, mss)
            metrics.update({f"densify/{k}": v for k, v in dinfo.items()})

        if it % cfg.opacity_reset_interval == 0 and it < cfg.densify_until:
            state = opacity_reset_step(state)

        if callback is not None and log_every and it % log_every == 0:
            callback(it, {k: float(v) for k, v in metrics.items()})
    return state
