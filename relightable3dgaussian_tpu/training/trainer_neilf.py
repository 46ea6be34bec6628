"""Stage-2 PBR training: splats + global env SH + gamma, jointly.

Analogue of the reference `train.py -t neilf` path (`train.py:51-87,
142-151,188-193`): resume from a stage-1 checkpoint, add the
DirectLightEnv and optional LearningGammaTransform, optimize everything
per step, optionally supervise visibility SH against the ray tracer.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import densify as D
from ..models import gaussians as G
from ..models import lights as L
from ..models import neilf
from ..models.render import LossConfig
from ..ops import raytrace
from ..ops.rasterize import RasterizeConfig
from . import optimizer as opt_mod
from .trainer import TrainState


@flax.struct.dataclass
class PBRTrainState:
    gaussians: G.GaussianState
    opt_state: Any
    env: L.DirectLightParams
    env_opt: Any
    gamma: L.GammaParams
    gamma_opt: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PBROptimConfig:
    env_lr: float = 0.0025
    env_rest_lr: float = -1.0   # -1 → env_lr / 20... reference keeps 0.0025
    gamma_lr: float = 0.01


def make_env_optimizer(cfg: PBROptimConfig) -> optax.GradientTransformation:
    env_rest = cfg.env_rest_lr if cfg.env_rest_lr >= 0 else cfg.env_lr
    # apply_if_finite: one non-finite gradient into a bare Adam poisons
    # the env SH moments permanently and every subsequent loss is NaN —
    # exactly the round-3 rehearsal stage-2 failure (NaN at it 900,
    # never recovered).  The splat optimizer already skips non-finite
    # steps (`optimizer.py:104-114`); the env and gamma optimizers must
    # too.
    return optax.apply_if_finite(
        optax.multi_transform(
            {"dc": optax.adam(cfg.env_lr, eps=1e-15),
             "rest": optax.adam(env_rest, eps=1e-15)},
            L.DirectLightParams(env_shs_dc="dc", env_shs_rest="rest")),
        max_consecutive_errors=100)


def make_gamma_optimizer(cfg: PBROptimConfig) -> optax.GradientTransformation:
    return optax.apply_if_finite(
        optax.adam(cfg.gamma_lr, eps=1e-15), max_consecutive_errors=100)


def init_pbr_train_state(
    gaussians: G.GaussianState,
    optim_cfg: opt_mod.OptimConfig,
    pbr_cfg: PBROptimConfig = PBROptimConfig(),
    env_degree: int = 3,
):
    tx = opt_mod.make_optimizer(optim_cfg)
    tx_env = make_env_optimizer(pbr_cfg)
    tx_gamma = make_gamma_optimizer(pbr_cfg)
    env = L.create_direct_light(env_degree)
    gamma = L.create_gamma()
    state = PBRTrainState(
        gaussians=gaussians,
        opt_state=tx.init(gaussians.params),
        env=env,
        env_opt=tx_env.init(env),
        gamma=gamma,
        gamma_opt=tx_gamma.init(gamma),
        step=jnp.zeros((), jnp.int32))
    return state, (tx, tx_env, tx_gamma)


@functools.partial(
    jax.jit,
    static_argnames=("txs", "raster_cfg", "loss_cfg", "sh_deg",
                     "sample_num", "use_ldr_image", "trace_visibility"))
def pbr_train_step(
    state: PBRTrainState,
    camera: dict[str, jnp.ndarray],
    gt: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    rng: jax.Array,
    txs: tuple,
    raster_cfg: RasterizeConfig,
    loss_cfg: LossConfig,
    sh_deg: int,
    sample_num: int = 24,
    use_ldr_image: bool = False,
    trace_visibility: bool = False,
) -> tuple[PBRTrainState, dict[str, jnp.ndarray]]:
    """One PBR optimization step."""
    tx, tx_env, tx_gamma = txs
    gs = state.gaussians
    zeros_xy = jnp.zeros((gs.params.capacity, 2), jnp.float32)

    trace_fn = None
    if trace_visibility and loss_cfg.lambda_visibility > 0:
        p = gs.params
        trace_fn = raytrace.make_visibility_tracer(
            jax.lax.stop_gradient(p.xyz),
            jax.lax.stop_gradient(G.get_scaling(p)),
            jax.lax.stop_gradient(G.get_rotation(p)),
            jax.lax.stop_gradient(G.get_opacity(p)),
            jax.lax.stop_gradient(G.get_normal(p)),
            alive=gs.alive)

    def loss_fn(params, env, gamma, xy_offset):
        results = neilf.render(
            params, gs.alive, camera, bg_color, raster_cfg,
            env_light=env, gamma=gamma, use_ldr_image=use_ldr_image,
            sample_num=sample_num, loss_cfg=loss_cfg, gt=gt,
            active_sh_degree=sh_deg, is_training=True, rng=rng,
            xy_offset=xy_offset, trace_visibility_fn=trace_fn)
        aux = {"tb": results["tb_dict"], "radii": results["radii"],
               "visible": results["visibility_filter"],
               "stats": results["stats"]}
        return results["loss"], aux

    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
        gs.params, state.env, state.gamma, zeros_xy)
    g_params, g_env, g_gamma, g_xy = grads

    alive = gs.alive
    g_params = jax.tree.map(
        lambda g: jnp.where(
            alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0), g_params)

    upd, opt_state = tx.update(g_params, state.opt_state, gs.params)
    new_params = optax.apply_updates(gs.params, upd)
    upd_e, env_opt = tx_env.update(g_env, state.env_opt, state.env)
    new_env = optax.apply_updates(state.env, upd_e)
    upd_g, gamma_opt = tx_gamma.update(g_gamma, state.gamma_opt)
    new_gamma = optax.apply_updates(state.gamma, upd_g)

    new_gaussians = D.add_stats(
        gs.replace(params=new_params),
        g_xy, g_params.normal, aux["radii"], aux["visible"],
        width=raster_cfg.width, height=raster_cfg.height)

    metrics = dict(aux["tb"])
    metrics["num_alive"] = jnp.sum(alive)
    if hasattr(opt_state, "total_notfinite"):
        metrics["notfinite_skips"] = opt_state.total_notfinite
    if hasattr(env_opt, "total_notfinite"):
        metrics["notfinite_skips_env"] = env_opt.total_notfinite
    metrics.update({f"binning/{k}": v for k, v in aux["stats"].items()})
    new_state = PBRTrainState(
        gaussians=new_gaussians, opt_state=opt_state,
        env=new_env, env_opt=env_opt,
        gamma=new_gamma, gamma_opt=gamma_opt,
        step=state.step + 1)
    return new_state, metrics


def train_pbr(
    state: PBRTrainState,
    txs: tuple,
    cameras: list,
    num_steps: int,
    raster_cfg: RasterizeConfig,
    loss_cfg: LossConfig,
    densify_cfg: D.DensifyConfig | None,
    scene_extent: float,
    sh_deg: int = 3,
    sample_num: int = 24,
    use_ldr_image: bool = False,
    trace_visibility: bool = False,
    densification_interval: int = 100,
    densify_until: int = 0,
    white_background: bool = False,
    seed: int = 0,
    log_every: int = 0,
    callback=None,
    budget=None,
) -> PBRTrainState:
    """Driver loop for stage-2 (`train.py:117-213` with is_pbr=True)."""
    import numpy as np
    stack: list[int] = []
    from .trainer import densify_step as base_densify  # reuse via TrainState

    start = int(state.step)
    # Fold the resume step in so chunked calls don't replay the same
    # camera permutation (see trainer.train).
    rng = np.random.default_rng([seed, start])
    key = jax.random.fold_in(jax.random.PRNGKey(seed), start)
    for it in range(start + 1, start + num_steps + 1):
        if not stack:
            stack = list(rng.permutation(len(cameras)))
        cam = cameras[stack.pop()]
        camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        gt = {"image": jnp.asarray(cam.image)}
        if cam.gt_alpha_mask is not None:
            gt["mask"] = jnp.asarray(cam.gt_alpha_mask)
        bg = jnp.ones(3) if white_background else jnp.zeros(3)

        key, k = jax.random.split(key)
        if budget is not None:
            raster_cfg = budget.cfg
        state, metrics = pbr_train_step(
            state, camera, gt, bg, k, txs, raster_cfg, loss_cfg, sh_deg,
            sample_num=sample_num, use_ldr_image=use_ldr_image,
            trace_visibility=trace_visibility)
        if budget is not None and it % budget.check_every == 0:
            gs = state.gaussians
            budget.check(gs.params, gs.alive, {
                k2.split("/", 1)[1]: int(v) for k2, v in metrics.items()
                if k2.startswith("binning/dropped")})

        if densify_cfg is not None and it < densify_until \
                and it % densification_interval == 0:
            key, k = jax.random.split(key)
            base = TrainState(gaussians=state.gaussians,
                              opt_state=state.opt_state, step=state.step)
            base, dinfo = base_densify(base, densify_cfg, scene_extent, k, 0)
            state = state.replace(gaussians=base.gaussians,
                                  opt_state=base.opt_state)
            metrics.update({f"densify/{k2}": v for k2, v in dinfo.items()})

        if callback is not None and log_every and it % log_every == 0:
            callback(it, {k2: float(v) for k2, v in metrics.items()})
    return state
