"""Per-attribute Adam with the reference learning-rate schedule.

The reference builds one torch Adam with a param group per attribute
(`scene/gaussian_model.py:581-616`) and log-lerp decays only the xyz LR
(`utils/general_utils.py:30-62`).  The optax equivalent: one
`optax.multi_transform` keyed by attribute name — each group is
`scale_by_adam(eps=1e-15)` × its LR (xyz's LR is a schedule).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax

from ..models.gaussians import GaussianParams


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """LRs (reference `arguments/__init__.py:73-99` defaults)."""
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    normal_lr: float = 0.01
    sh_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    base_color_lr: float = 0.01
    roughness_lr: float = 0.01
    metallic_lr: float = 0.01
    light_lr: float = 0.001
    light_rest_lr: float = -1.0      # -1 → light_lr / 20
    visibility_lr: float = 0.0025
    visibility_rest_lr: float = 0.0025
    spatial_lr_scale: float = 1.0    # scene extent (cameras radius)


def expon_lr_schedule(lr_init: float, lr_final: float,
                      lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
                      max_steps: int = 1_000_000):
    """Log-linear interpolation from lr_init to lr_final with optional
    sine-eased warm delay (reference `get_expon_lr_func`,
    `general_utils.py:30-62`)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) +
                           jnp.log(lr_final) * t)
        return delay * log_lerp
    return schedule


def _group(lr, schedule=None) -> optax.GradientTransformation:
    tx = [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)]
    if schedule is not None:
        tx.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    else:
        tx.append(optax.scale(-lr))
    return optax.chain(*tx)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """The splat-parameter optimizer; apply to a `GaussianParams` pytree."""
    xyz_sched = expon_lr_schedule(
        cfg.position_lr_init * cfg.spatial_lr_scale,
        cfg.position_lr_final * cfg.spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps)
    light_rest = cfg.light_rest_lr if cfg.light_rest_lr >= 0 \
        else cfg.light_lr / 20.0

    transforms = {
        "xyz": _group(0.0, schedule=xyz_sched),
        "normal": _group(cfg.normal_lr),
        "shs_dc": _group(cfg.sh_lr),
        "shs_rest": _group(cfg.sh_lr / 20.0),
        "scaling": _group(cfg.scaling_lr),
        "rotation": _group(cfg.rotation_lr),
        "opacity": _group(cfg.opacity_lr),
        "base_color": _group(cfg.base_color_lr),
        "roughness": _group(cfg.roughness_lr),
        "metallic": _group(cfg.metallic_lr),
        "incidents_dc": _group(cfg.light_lr),
        "incidents_rest": _group(light_rest),
        "visibility_dc": _group(cfg.visibility_lr),
        "visibility_rest": _group(cfg.visibility_rest_lr),
    }
    labels = GaussianParams(
        xyz="xyz", normal="normal", shs_dc="shs_dc", shs_rest="shs_rest",
        scaling="scaling", rotation="rotation", opacity="opacity",
        base_color="base_color", roughness="roughness", metallic="metallic",
        incidents_dc="incidents_dc", incidents_rest="incidents_rest",
        visibility_dc="visibility_dc", visibility_rest="visibility_rest")
    # Skip (don't apply) any step whose gradients are non-finite: one
    # bad step would otherwise poison the Adam moments permanently —
    # observed in a full-recipe run where a post-opacity-reset step
    # NaN'd and contaminated every parameter.  The torch reference
    # survives the same event only by luck of eager isolation; here the
    # skip is counted (trainer metric `notfinite_skips`) so a
    # persistent source still surfaces, and after 100 consecutive bad
    # steps the wrapper stops masking by design.
    return optax.apply_if_finite(
        optax.multi_transform(transforms, labels),
        max_consecutive_errors=100)
