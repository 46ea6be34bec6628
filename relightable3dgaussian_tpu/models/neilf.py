"""NeILF PBR render pipeline + loss (render type "neilf").

TPU-native analogue of `gaussian_renderer/neilf.py:17-519`: evaluate the
render equation per splat (ops.brdf), blend BRDF outputs through the
rasterizer's feature channels, composite PBR over background, optional
learned gamma, and the full PBR loss set (image + pbr + smoothness +
light white-balance + base-color guidance + SH-visibility supervision).

The reference packs 11 feature channels when training and 21 at eval
(`neilf.py:113-120`) and hard-codes an 800x800 reshape in the training
split (`neilf.py:142`) — here the packing is identical but resolution-
generic (SURVEY.md §7.4).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import brdf, losses
from ..ops.rasterize import RasterizeConfig, rasterize
from ..ops import sh as sh_ops
from ..ops import transforms as tf
from . import gaussians as G
from . import lights as L
from .render import LossConfig


def render_view(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    env_light: L.DirectLightParams | None = None,
    gamma: L.GammaParams | None = None,
    use_ldr_image: bool = False,
    sample_num: int = 24,
    active_sh_degree: int = 3,
    is_training: bool = False,
    rng: jax.Array | None = None,
    xy_offset: jnp.ndarray | None = None,
) -> dict[str, Any]:
    """Forward PBR render of one view (`neilf.py:17-202`)."""
    attrs = G.render_attributes(params)
    normal = G.get_normal(params)
    base_color = G.get_base_color(params)
    roughness = G.get_roughness(params)
    metallic = G.get_metallic(params)
    incidents = G.get_incidents(params)
    visibility = G.get_visibility(params)
    viewdirs = tf.normalize(camera["campos"][None, :] - params.xyz)

    # Normals feed the BRDF detached — they are supervised through the
    # blended normal channel instead (`neilf.py:108-111` .detach()).
    pbr_color, extras = brdf.rendering_equation(
        base_color, roughness, metallic,
        jax.lax.stop_gradient(normal), viewdirs, incidents,
        direct_shs=None if env_light is None else env_light.env_shs,
        visibility_shs=visibility,
        sample_num=sample_num,
        rng=rng if is_training else None)

    if is_training:
        feats = jnp.concatenate(
            [roughness, metallic, pbr_color, normal, base_color], axis=-1)
    else:
        feats = jnp.concatenate(
            [roughness, metallic,
             extras["mean_visibility"],
             pbr_color, normal, base_color,
             extras["mean_incident_lights"],
             extras["mean_local_lights"],
             extras["mean_global_lights"]],
            axis=-1)

    out = rasterize(
        means3d=attrs["means3d"],
        scales=attrs["scales"],
        rotations=attrs["rotations"],
        opacities=attrs["opacities"],
        alive=alive,
        w2c=camera["w2c"],
        full_proj=camera["full_proj"],
        campos=camera["campos"],
        focal=camera["focal"],
        tan_fov=camera["tan_fov"],
        bg_color=bg_color,
        config=config,
        sh_coeffs=attrs["sh_coeffs"],
        extra_features=feats,
        active_sh_degree=active_sh_degree,
        xy_offset=xy_offset,
    )

    f = out.feature
    results: dict[str, Any] = {
        "render": out.color,
        "opacity": out.opacity,
        "depth": out.depth,
        "final_t": out.final_t,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "stats": out.stats,
        "roughness": f[..., 0:1],
        "metallic": f[..., 1:2],
        "diffuse_light": extras["diffuse_light"],
    }
    if is_training:
        pbr_img = f[..., 2:5]
        results["normal"] = f[..., 5:8]
        results["base_color"] = f[..., 8:11]
    else:
        results["visibility"] = f[..., 2:3]
        pbr_img = f[..., 3:6]
        results["normal"] = f[..., 6:9]
        results["base_color"] = f[..., 9:12]
        results["lights"] = f[..., 12:15]
        results["local_lights"] = f[..., 15:18]
        results["global_lights"] = f[..., 18:21]

    pbr_img = pbr_img + (1.0 - out.opacity[..., None]) * bg_color
    if gamma is not None:
        pbr_img = L.apply_gamma(gamma, pbr_img, use_ldr_image)
        results["val_gamma"] = gamma.gamma[0]
    results["pbr"] = pbr_img
    return results


def visibility_supervision_loss(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    trace_visibility_fn: Callable[..., jnp.ndarray],
    rng: jax.Array,
    num_rays: int = 10_000,
) -> jnp.ndarray:
    """Supervise per-splat visibility SH against BVH-traced visibility
    (`neilf.py:323-348`): random rays from random splats, flipped into
    the normal hemisphere; L1 between SH-predicted and traced visibility.

    Args:
      trace_visibility_fn: (rays_o [R,3], rays_d [R,3]) -> [R] traced
        transmittance toward infinity (ops.bvh.trace_visibility).
    """
    k1, k2 = jax.random.split(rng)
    N = params.capacity
    idx = jax.random.randint(k1, (num_rays,), 0, N)
    rays_o = params.xyz[idx]
    rays_d = tf.normalize(jax.random.normal(k2, (num_rays, 3)))
    normal = G.get_normal(params)[idx]
    flip = jnp.sum(rays_d * normal, -1, keepdims=True) < 0
    rays_d = jnp.where(flip, -rays_d, rays_d)

    vis_shs = G.get_visibility(params)[idx]                     # [R, 16, 1]
    pred = sh_ops.eval_sh(3, jnp.swapaxes(vis_shs, -1, -2), rays_d)[..., 0]
    pred = jnp.clip(pred + 0.5, 0.0, 1.0)
    traced = jax.lax.stop_gradient(trace_visibility_fn(rays_o, rays_d))
    w = alive[idx].astype(pred.dtype)
    return jnp.sum(jnp.abs(pred - traced) * w) / jnp.maximum(jnp.sum(w), 1.0)


def calculate_loss(
    results: dict[str, Any],
    gt: dict[str, jnp.ndarray],
    cfg: LossConfig,
    params: G.GaussianParams | None = None,
    alive: jnp.ndarray | None = None,
    trace_visibility_fn: Callable[..., jnp.ndarray] | None = None,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Full PBR loss (`neilf.py:203-352`)."""
    gt_image = gt["image"]
    mask = gt.get("mask")
    if mask is None:
        mask = jnp.ones(gt_image.shape[:2], gt_image.dtype)
    m1 = mask[..., None]
    tb: dict[str, jnp.ndarray] = {}

    image = results["render"]
    ll1 = losses.l1(image, gt_image)
    if cfg.lambda_pbr > 0:
        # one shared blur for both SSIMs (same gt moments; ~1 ms/step
        # of the 800² PBR step vs two separate 15-channel passes)
        ssim_val, ssim_p = losses.ssim_pair(image, results["pbr"],
                                            gt_image)
    else:
        ssim_val = losses.ssim(image, gt_image)
    tb["l1"] = ll1
    tb["psnr"] = losses.psnr(image, gt_image)
    tb["ssim"] = ssim_val
    loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (1.0 - ssim_val)

    if cfg.lambda_pbr > 0:
        pbr_img = results["pbr"]
        ll1_p = losses.l1(pbr_img, gt_image)
        tb["l1_pbr"] = ll1_p
        tb["ssim_pbr"] = ssim_p
        tb["psnr_pbr"] = losses.psnr(pbr_img, gt_image)
        loss_pbr = (1.0 - cfg.lambda_dssim) * ll1_p + \
            cfg.lambda_dssim * (1.0 - ssim_p)
        loss = loss + cfg.lambda_pbr * loss_pbr

    if cfg.lambda_depth > 0 and "depth" in gt:
        gt_depth = gt["depth"]
        sur = jnp.logical_xor(mask > 0.5, gt_depth > 0)
        keep = ~sur
        diff = jnp.abs(results["depth"] - gt_depth)
        loss_depth = jnp.sum(jnp.where(keep, diff, 0.0)) / jnp.maximum(
            jnp.sum(keep), 1)
        tb["loss_depth"] = loss_depth
        loss = loss + cfg.lambda_depth * loss_depth

    if cfg.lambda_mask_entropy > 0 and "mask" in gt:
        # real-mask guard, as in models/render.py calculate_loss: the
        # all-ones fallback would demand opacity 1 at background pixels
        le = losses.opacity_entropy(results["opacity"], mask, eps=1e-6)
        tb["loss_mask_entropy"] = le
        loss = loss + cfg.lambda_mask_entropy * le

    if cfg.lambda_normal_render_depth > 0 and "pseudo_normal" in results:
        pn = jax.lax.stop_gradient(results["pseudo_normal"])
        lnrd = jnp.mean((results["normal"] * m1 - pn * m1) ** 2)
        tb["loss_normal_render_depth"] = lnrd
        loss = loss + cfg.lambda_normal_render_depth * lnrd

    if cfg.lambda_normal_mvs_depth > 0 and "normal" in gt:
        gt_depth = gt.get("depth", jnp.ones_like(results["depth"]))
        dm = (gt_depth > 0).astype(gt_image.dtype)[..., None]
        lnm = jnp.mean((results["normal"] * dm - gt["normal"] * dm) ** 2)
        tb["loss_normal_mvs_depth"] = lnm
        loss = loss + cfg.lambda_normal_mvs_depth * lnm

    if cfg.lambda_light > 0:
        dl = results["diffuse_light"]
        mean_light = jnp.mean(dl, -1, keepdims=True)
        loss_light = jnp.mean(jnp.abs(dl - mean_light))
        tb["loss_light"] = loss_light
        loss = loss + cfg.lambda_light * loss_light

    if cfg.lambda_base_color > 0:
        # Guide base color toward a shadow-lifted / specular-suppressed
        # transform of the gt image (`neilf.py:288-305`).
        gi = gt_image * m1
        value_img = jnp.max(gi, axis=-1, keepdims=True)
        shallow = 1.0 - (1.0 - gi) ** 2
        specular = gi * gi
        w = jax.nn.sigmoid(5.0 * (value_img - 0.5))
        target = w * specular + (1.0 - w) * shallow
        lbc = losses.l1(target, results["base_color"])
        tb["loss_base_color"] = lbc
        loss = loss + cfg.lambda_base_color * lbc

    if (cfg.lambda_base_color_smooth > 0 or cfg.lambda_metallic_smooth > 0
            or cfg.lambda_roughness_smooth > 0):
        # one shared gt-edge weight for all three smoothness terms (the
        # |∇gt| Sobel is identical across them)
        bw = jax.lax.stop_gradient(losses.bilateral_weight(gt_image))
    if cfg.lambda_base_color_smooth > 0:
        lb = losses.bilateral_smooth(results["base_color"], gt_image, mask,
                                     weight=bw)
        tb["loss_base_color_smooth"] = lb
        loss = loss + cfg.lambda_base_color_smooth * lb
    if cfg.lambda_metallic_smooth > 0:
        lm = losses.bilateral_smooth(results["metallic"], gt_image, mask,
                                     weight=bw)
        tb["loss_metallic_smooth"] = lm
        loss = loss + cfg.lambda_metallic_smooth * lm
    if cfg.lambda_roughness_smooth > 0:
        lr = losses.bilateral_smooth(results["roughness"], gt_image, mask,
                                     weight=bw)
        tb["loss_roughness_smooth"] = lr
        loss = loss + cfg.lambda_roughness_smooth * lr

    if cfg.lambda_visibility > 0 and trace_visibility_fn is not None \
            and params is not None:
        lv = visibility_supervision_loss(
            params, alive, trace_visibility_fn, rng,
            num_rays=cfg.visibility_rays)
        tb["loss_visibility"] = lv
        loss = loss + cfg.lambda_visibility * lv

    tb["loss"] = loss
    return loss, tb


def render(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    env_light: L.DirectLightParams | None = None,
    gamma: L.GammaParams | None = None,
    use_ldr_image: bool = False,
    sample_num: int = 24,
    loss_cfg: LossConfig | None = None,
    gt: dict[str, jnp.ndarray] | None = None,
    active_sh_degree: int = 3,
    is_training: bool = False,
    rng: jax.Array | None = None,
    xy_offset: jnp.ndarray | None = None,
    trace_visibility_fn: Callable[..., jnp.ndarray] | None = None,
) -> dict[str, Any]:
    """Full PBR pipeline entry (`render_neilf`, `neilf.py:355-370`)."""
    k_brdf = k_vis = None
    if rng is not None:
        k_brdf, k_vis = jax.random.split(rng)
    results = render_view(
        params, alive, camera, bg_color, config,
        env_light=env_light, gamma=gamma, use_ldr_image=use_ldr_image,
        sample_num=sample_num, active_sh_degree=active_sh_degree,
        is_training=is_training, rng=k_brdf, xy_offset=xy_offset)
    if is_training:
        loss, tb = calculate_loss(
            results, gt, loss_cfg, params=params, alive=alive,
            trace_visibility_fn=trace_visibility_fn, rng=k_vis)
        results["loss"] = loss
        results["tb_dict"] = tb
    return results
