"""Base 3DGS render pipeline + training loss (render type "render").

TPU-native analogue of `gaussian_renderer/render.py:16-200`: rasterize the
splats with per-splat normals riding the feature channels, reconstruct a
pseudo-normal map from blended depth, and assemble the stage-1 loss
(L1 + D-SSIM + optional depth / mask-entropy / normal terms,
`render.py:118-181`).

Everything is a pure function of (params, camera arrays, static config) —
jit/grad/vmap/shard_map compose around it.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import losses, surface
from ..ops.rasterize import RasterizeConfig, rasterize
from . import gaussians as G


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference `arguments/__init__.py:73-124` defaults)."""
    lambda_dssim: float = 0.2
    lambda_depth: float = 0.0
    lambda_mask_entropy: float = 0.0
    lambda_normal_render_depth: float = 0.0
    lambda_normal_mvs_depth: float = 0.0
    # PBR weights (used by models.neilf)
    lambda_pbr: float = 1.0
    lambda_light: float = 0.01
    lambda_base_color: float = 0.005
    lambda_base_color_smooth: float = 0.006
    lambda_metallic_smooth: float = 0.002
    lambda_roughness_smooth: float = 0.002
    lambda_visibility: float = 0.1
    lambda_light_smooth: float = 0.0
    visibility_rays: int = 10_000   # rays/iter for the visibility loss


def render_view(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    active_sh_degree: int = 3,
    override_color: jnp.ndarray | None = None,
    extra_features: jnp.ndarray | None = None,
    compute_pseudo_normal: bool = True,
    xy_offset: jnp.ndarray | None = None,
) -> dict[str, Any]:
    """Forward render of one view.

    Args:
      params: splat parameters (raw); alive: [N] mask.
      camera: dict from `Camera.render_inputs()` — w2c, full_proj, campos,
        focal, tan_fov (+ optional cxcy).
      bg_color: [3].
      config: static rasterizer config.
      extra_features: [N, S] additional blend channels appended after the
        3 normal channels (PBR pipeline uses this).

    Returns:
      results dict mirroring the reference keys (`render.py:104-114`).
    """
    attrs = G.render_attributes(params)
    normal = G.get_normal(params)
    feats = normal if extra_features is None else jnp.concatenate(
        [normal, extra_features], axis=-1)

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
        sh_coeffs=None if override_color is not None else attrs["sh_coeffs"],
        colors_precomp=override_color,
        extra_features=feats,
        active_sh_degree=active_sh_degree,
        xy_offset=xy_offset,
    )

    rendered_normal = out.feature[..., 0:3]
    results = {
        "render": out.color,
        "opacity": out.opacity,
        "depth": out.depth,
        "normal": rendered_normal,
        "feature": out.feature,
        "final_t": out.final_t,
        "n_contrib": out.n_contrib,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "stats": out.stats,
    }

    if compute_pseudo_normal:
        cxcy = camera.get("cxcy")
        if cxcy is None:
            cxcy = jnp.array(
                [config.width / 2 - 0.5, config.height / 2 - 0.5],
                jnp.float32)
        xyz, pn = surface.pseudo_normal_from_depth(
            out.depth, out.opacity, camera["focal"], cxcy, camera["w2c"])
        results["surface_xyz"] = xyz
        results["pseudo_normal"] = pn
    return results


def calculate_loss(
    results: dict[str, Any],
    gt: dict[str, jnp.ndarray],
    cfg: LossConfig,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Stage-1 loss (reference `render.py:118-181`).

    Args:
      results: `render_view` output.
      gt: dict with "image" [H,W,3]; optional "mask" [H,W], "depth" [H,W],
        "normal" [H,W,3].
    Returns:
      (scalar loss, tb_dict of scalar terms).
    """
    image = results["render"]
    gt_image = gt["image"]
    tb: dict[str, jnp.ndarray] = {}

    ll1 = losses.l1(image, gt_image)
    ssim_val = losses.ssim(image, gt_image)
    tb["loss_l1"] = ll1
    tb["ssim"] = ssim_val
    tb["psnr"] = losses.psnr(image, gt_image)
    loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (1.0 - ssim_val)

    mask = gt.get("mask")
    if mask is None:
        mask = jnp.ones(gt_image.shape[:2], gt_image.dtype)

    if cfg.lambda_depth > 0 and "depth" in gt:
        gt_depth = gt["depth"]
        depth_mask = gt_depth > 0
        # reference: exclude pixels where mask and depth disagree (XOR)
        sur = jnp.logical_xor(mask > 0.5, depth_mask)
        diff = jnp.abs(results["depth"] - gt_depth)
        keep = ~sur
        loss_depth = jnp.sum(jnp.where(keep, diff, 0.0)) / jnp.maximum(
            jnp.sum(keep), 1)
        tb["loss_depth"] = loss_depth
        loss = loss + cfg.lambda_depth * loss_depth

    if cfg.lambda_mask_entropy > 0 and "mask" in gt:
        # only with a REAL mask: the reference recipes enable this term
        # solely on datasets with alpha (`render.py:132-140`); with the
        # all-ones fallback it would push opacity -> 1 at EVERY pixel,
        # background included, and fight the reconstruction loss
        # (observed: rehearsal PSNR pinned ~14 dB until this guard)
        le = losses.opacity_entropy(results["opacity"], mask, eps=1e-6)
        tb["loss_mask_entropy"] = le
        loss = loss + cfg.lambda_mask_entropy * le

    if cfg.lambda_normal_render_depth > 0:
        pseudo = jax.lax.stop_gradient(results["pseudo_normal"])
        m3 = mask[..., None]
        lnrd = jnp.mean((results["normal"] * m3 - pseudo * m3) ** 2)
        tb["loss_normal_render_depth"] = lnrd
        loss = loss + cfg.lambda_normal_render_depth * lnrd

    if cfg.lambda_normal_mvs_depth > 0 and "normal" in gt:
        gt_depth = gt.get("depth", jnp.ones_like(results["depth"]))
        dm = (gt_depth > 0).astype(gt_image.dtype)[..., None]
        lnm = jnp.mean((results["normal"] * dm - gt["normal"] * dm) ** 2)
        tb["loss_normal_mvs_depth"] = lnm
        loss = loss + cfg.lambda_normal_mvs_depth * lnm

    tb["loss"] = loss
    return loss, tb


def render(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    loss_cfg: LossConfig | None = None,
    gt: dict[str, jnp.ndarray] | None = None,
    active_sh_degree: int = 3,
    is_training: bool = False,
    xy_offset: jnp.ndarray | None = None,
) -> dict[str, Any]:
    """Full pipeline entry (reference `render`, `render.py:183-200`)."""
    need_pn = loss_cfg is not None and loss_cfg.lambda_normal_render_depth > 0
    results = render_view(
        params, alive, camera, bg_color, config,
        active_sh_degree=active_sh_degree,
        compute_pseudo_normal=need_pn or not is_training,
        xy_offset=xy_offset)
    if is_training:
        loss, tb = calculate_loss(results, gt, loss_cfg)
        results["loss"] = loss
        results["tb_dict"] = tb
    return results
