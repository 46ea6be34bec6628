"""Shader-GS render pipeline: SH stage → pre-pass → splat stage →
composite → post-process.

TPU-native analogue of the thesis 12-step forward
(`rasterizer_impl.cu:213-529`, SURVEY.md §3.2): the programmable stages
from `models.shaders` are wired around the standard rasterizer.  The
intermediate depth/stencil pre-pass mirrors `RenderIntermediateTextures`
(`forward.cu:271-383`) including the *separate* stencil transmittance:
stencil channels are composited in a second pass whose per-splat opacity
is the shader-controlled `stencil_opacity` (init 1,
`rasterizer_impl.cu:279`), independent of the color alpha.

All stages are differentiable; the reference's shader stages have no
backward at all (`rasterize_points.cu:198-201`).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..ops import binning, projection
from ..ops.rasterize import RasterizeConfig, composite_dispatch
from . import gaussians as G
from . import shaders as S


def render(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    sh_shader_ids: jnp.ndarray | None = None,
    splat_shader_ids: jnp.ndarray | None = None,
    post_passes: list[str] = (),
    textures: dict[str, jnp.ndarray] | None = None,
    time: float = 0.0,
    dt: float = 0.0,
    active_sh_degree: int = 3,
    extra_images: dict[str, jnp.ndarray] | None = None,
) -> dict[str, Any]:
    """Forward render with programmable shader stages.

    Args:
      sh_shader_ids / splat_shader_ids: [N] int32 per-splat shader ids
        (None → all default).  Build with `shaders.shader_id_array` /
        `shaders.assign_shaders_by_position`.
      post_passes: names from `shaders.POST_SHADERS`, applied in order.
      textures: name → [H, W, C] arrays for texture-driven shaders.
      time/dt: shader animation clock in ms (`gui.py:193-206`).
      extra_images: additional blended channels handed to post passes
        (e.g. incident_light from the PBR path).

    Returns:
      results dict: render (SH-color blend), shader (shader-color blend,
      post-processed), depth, stencil, opacity, ...
    """
    cfg = config
    ctx = {"time": time, "dt": dt, "textures": textures or {}}

    # --- stage 1: SH shaders on activated attributes -------------------
    # The CUDA pipeline clones the activated tensors so shader mutations
    # are non-persistent (`rasterize_points.cu:117-122`); values here are
    # functional so that's automatic.
    io = {
        "position": params.xyz,
        "scale": G.get_scaling(params),
        "rotation": G.get_rotation(params),
        "opacity": G.get_opacity(params),
        "normal": G.get_normal(params),
        "sh": G.get_shs(params),
    }
    if sh_shader_ids is not None:
        io = S.run_sh_shaders(sh_shader_ids, io, ctx)
    stencil = io.get("stencil", jnp.zeros_like(io["opacity"]))

    # --- stage 2: projection + binning ---------------------------------
    proj = projection.preprocess(
        io["position"], io["scale"], io["rotation"], io["opacity"], alive,
        camera["w2c"], camera["full_proj"], camera["campos"],
        cfg.width, cfg.height,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        sh_coeffs=io["sh"], active_sh_degree=active_sh_degree,
        scale_modifier=cfg.scale_modifier, znear=cfg.znear)
    bins = binning.bin_splats(
        proj, cfg.grid, cfg.max_tiles_per_gaussian, cfg.max_per_tile)
    import jax
    bins = jax.tree.map(jax.lax.stop_gradient, bins)

    # --- stage 3: intermediate depth/stencil pre-pass ------------------
    pre_feats = jnp.stack([proj.depth, jnp.ones_like(stencil)], -1)
    pre = composite_dispatch(cfg, bins, proj.xy, proj.conic, proj.opacity,
                             pre_feats)
    depth_img = pre.image[: cfg.height, : cfg.width, 0]
    # stencil rides its own transmittance (stencil_opacity starts at 1)
    pre_s = composite_dispatch(
        cfg, bins, proj.xy, proj.conic, jnp.ones_like(proj.opacity),
        stencil[:, None])
    stencil_img = pre_s.image[: cfg.height, : cfg.width, 0]

    # --- stage 4: splat shaders ----------------------------------------
    px = jnp.clip(proj.xy[:, 0].astype(jnp.int32), 0, cfg.width - 1)
    py = jnp.clip(proj.xy[:, 1].astype(jnp.int32), 0, cfg.height - 1)
    inp = {
        "position": io["position"],
        "normal": io["normal"],
        "color_sh": proj.rgb,
        "color_base": G.get_base_color(params)
        if params.base_color.shape[-1] else proj.rgb,
        "camera_pos": camera["campos"],
        "splat_depth": proj.depth,
        "depth_sample": depth_img[py, px],
        "stencil_sample": stencil_img[py, px],
    }
    has_pbr = params.roughness.shape[-1] > 0
    sio = {
        "opacity": proj.opacity,
        "stencil_val": stencil,
        "stencil_opacity": proj.opacity,
        "roughness": G.get_roughness(params)[:, 0] if has_pbr
        else jnp.zeros_like(proj.opacity),
        "metallic": G.get_metallic(params)[:, 0] if has_pbr
        else jnp.zeros_like(proj.opacity),
    }
    if splat_shader_ids is not None:
        sres = S.run_splat_shaders(splat_shader_ids, inp, sio, ctx)
    else:
        sres = {"out_color": proj.rgb, **sio}

    # --- stage 5: main composite ---------------------------------------
    feats = jnp.concatenate([
        proj.rgb,                        # 0:3  SH color
        sres["out_color"],               # 3:6  shader color
        proj.depth[:, None],             # 6
        jnp.ones_like(stencil)[:, None],  # 7 opacity
        sres["metallic"][:, None],       # 8 (crack-reconstruction mask)
    ], -1)
    out = composite_dispatch(cfg, bins, proj.xy, proj.conic,
                             sres["opacity"], feats)
    img = out.image[: cfg.height, : cfg.width]
    final_t = out.final_t[: cfg.height, : cfg.width]
    render_img = img[..., 0:3] + final_t[..., None] * bg_color
    shader_img = img[..., 3:6] + final_t[..., None] * bg_color
    opacity_img = img[..., 7]

    # final stencil: separate transmittance from stencil_opacity
    out_s = composite_dispatch(cfg, bins, proj.xy, proj.conic,
                               sres["stencil_opacity"],
                               sres["stencil_val"][:, None])
    stencil_final = out_s.image[: cfg.height, : cfg.width, 0]

    # --- stage 6: post-process -----------------------------------------
    from ..ops import surface
    cxcy = camera.get("cxcy")
    if cxcy is None:
        cxcy = jnp.array(
            [cfg.width / 2 - 0.5, cfg.height / 2 - 0.5], jnp.float32)
    sxyz, pn = surface.pseudo_normal_from_depth(
        img[..., 6], opacity_img, camera["focal"], cxcy, camera["w2c"])

    images = {
        "shader_color": shader_img,
        "base_color": render_img,
        "depth": img[..., 6],
        "stencil": stencil_final,
        "incident_light": jnp.zeros_like(render_img),
        "pseudo_normal": pn,
        "metallic": img[..., 8],
    }
    if extra_images:
        images.update(extra_images)
    if post_passes:
        images = S.run_post_process(list(post_passes), images, ctx)

    return {
        "render": render_img,
        "shader": images["shader_color"],
        "depth": img[..., 6],
        "opacity": opacity_img,
        "stencil": stencil_final,
        "pseudo_normal": pn,
        "surface_xyz": sxyz,
        "final_t": final_t,
        "radii": proj.radius,
        "images": images,
    }
