"""Shader-GS: programmable per-splat and per-pixel shader stages.

TPU-native redesign of the thesis shader system
(`r3dg-rasterization/cuda_rasterizer/{ShShader,splatShader,postProcessShader}.cu`).
The CUDA version dispatches through device function pointers, one kernel
launch per shader cluster (`forward.cu:864-876`); here every shader is a
pure JAX function and dispatch is *masked application*: each registered
shader runs on all splats (cheap, vectorized) and a per-splat shader-id
array selects which result sticks.  XLA fuses the whole stage; unlike the
reference, the stages are differentiable for free.

Three stages (reference semantics, SURVEY.md §2.1):
  * SH shaders — pre-projection; may mutate position/scale/rotation/
    opacity/SH and write stencil (`ShShader.cu:62-190`).
  * Splat shaders — post-projection, pre-blend; read intermediate
    depth/stencil screen textures at the splat's mean pixel, output a
    per-splat color (blended instead of SH color) and may mutate
    opacity/stencil (`splatShader.cu:66-269`).
  * Post-process shaders — full-screen passes over the blended channel
    dict, applied sequentially (`postProcessShader.cu:181-460`).

Textures are a plain dict of [H, W, C] arrays sampled bilinearly with
wrap addressing (the cudaTextureObject_t manager, `utils/texture.cu`,
becomes `sample_texture`).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

PI = 3.14159265358979

# ---------------------------------------------------------------------------
# Texture sampling (replaces the CUDA texture manager)
# ---------------------------------------------------------------------------


def sample_texture(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
                   ) -> jnp.ndarray:
    """Bilinear sample with wrap addressing; uv in texture units
    (cudaFilterModeLinear + cudaAddressModeWrap, `texture.cu:65-76`).

    Args:
      tex: [H, W, C]; u, v: [...] float coords in [0,1] per tile.
    Returns:
      [..., C].
    """
    H, W = tex.shape[:2]
    x = (u % 1.0) * W - 0.5
    y = (v % 1.0) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)
    x1i = jnp.mod(x0i + 1, W)
    y0i = jnp.mod(y0.astype(jnp.int32), H)
    y1i = jnp.mod(y0i + 1, H)
    c00 = tex[y0i, x0i]
    c01 = tex[y0i, x1i]
    c10 = tex[y1i, x0i]
    c11 = tex[y1i, x1i]
    return (c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
            + c10 * (1 - fx) * fy + c11 * fx * fy)


def _tex(textures: dict[str, jnp.ndarray], name: str) -> jnp.ndarray:
    """Texture lookup with an error-texture fallback (magenta, matching
    the reference's missing-texture behavior, `texture.cu:293-313`)."""
    if textures and name in textures:
        return textures[name]
    return jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 1.0, 1.0]), (2, 2, 4))


def _saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def _mix(a, b, t):
    return a * (1.0 - t) + b * t


# ---------------------------------------------------------------------------
# RGB <-> HSV + quantize (shaderUtils.cu)
# ---------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0) % 1.0
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], -1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


def quantize(x: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Round to `steps` levels (`shaderUtils.cu:146-163`)."""
    return jnp.round(x * steps) / steps


# ---------------------------------------------------------------------------
# SH shaders — operate on dicts of [N, ...] splat attributes
# ---------------------------------------------------------------------------
# io keys: position [N,3], scale [N,3], rotation [N,4], opacity [N],
#          normal [N,3], sh [N,K,3], stencil [N]
# ctx keys: time (ms), dt (ms), textures (dict)


def sh_default(ctx, io):
    return io


def sh_exp_pos(ctx, io):
    """Stretch position/scale by |y| (`ExponentialPositionShaderCUDA`,
    `ShShader.cu:67-77`)."""
    pos = io["position"]
    pos_y = jnp.abs(pos[:, 1:2])
    new_scale = jnp.stack(
        [io["scale"][:, 0] * pos_y[:, 0], io["scale"][:, 1] * 2.0,
         io["scale"][:, 2]], -1) * pos_y
    new_pos = jnp.stack(
        [pos[:, 0] * pos_y[:, 0], pos[:, 1] * 2.0, pos[:, 2]], -1) * pos_y
    return {**io, "position": new_pos, "scale": new_scale}


def _heartbeat_wave(t):
    """1/4 contraction + 3/4 expansion pulse (`ShShader.cu:112-121`)."""
    k = PI * 4.0 / 3.0
    tm = t % k
    gate = jnp.round(jnp.sin(tm) / 2 + 0.5)
    return (1 + jnp.cos(tm) * gate + jnp.cos(tm * 3) * (1 - gate)) / 2


def sh_heartbeat(ctx, io):
    """Texture-driven two-phase pulse along the normal
    (`HeartbeatShaderCUDA`, `ShShader.cu:82-139`)."""
    pos = io["position"]
    atex = _tex(ctx.get("textures"), "Turbulence")
    vtex = _tex(ctx.get("textures"), "Craters")

    def tri_sample(tex, invert=False):
        s = (sample_texture(tex, pos[:, 0], pos[:, 1])[:, 0]
             + sample_texture(tex, pos[:, 0], pos[:, 2])[:, 0]
             + sample_texture(tex, pos[:, 1], pos[:, 2])[:, 0]) / 3.0
        return 1.0 - s if invert else s

    atrial = tri_sample(atex)
    ventric = tri_sample(vtex, invert=True)
    dist = jnp.linalg.norm(pos, axis=-1)
    t = ctx["time"] / 1000.0 - 0.5 * dist
    ag = _heartbeat_wave(t) * atrial
    vg = _heartbeat_wave(t - 0.9) * ventric
    normal = io["normal"]
    new_pos = pos + normal * (ag + vg)[:, None] * 0.025
    new_scale = io["scale"] + (ag + vg)[:, None] * 0.0025
    return {**io, "position": new_pos, "scale": new_scale}


def sh_cull_half(ctx, io):
    """Hide the x<0 half (`CullHalf`, `ShShader.cu:141-150`)."""
    keep = io["position"][:, 0] >= 0
    return {**io,
            "opacity": jnp.where(keep, io["opacity"], 0.0),
            "scale": jnp.where(keep[:, None], io["scale"], 0.0)}


def sh_gauss_dissolve(ctx, io):
    """Bottom-up dissolve-in with texture mask and blue tint
    (`GaussDissolve`, `ShShader.cu:153-190`)."""
    pos = io["position"]
    tex = _tex(ctx.get("textures"), "Cracks")
    m = (sample_texture(tex, pos[:, 0], pos[:, 1])[:, 0]
         * sample_texture(tex, pos[:, 0], pos[:, 2])[:, 0]
         * sample_texture(tex, pos[:, 1], pos[:, 2])[:, 0])
    m = _saturate((m - 0.125) * 1.5)
    progress = (ctx["time"] / 1000.0 * 0.25) % 3.0
    load = _saturate(progress - pos[:, 2] + m - 1.0)
    opacity = io["opacity"] * load ** 3
    fade_dist = jnp.linalg.norm(io["scale"], axis=-1) * 10.0
    start = pos + jnp.asarray([[0.0, 0.0, 1.0]]) * fade_dist[:, None]
    new_pos = _mix(start, pos, load[:, None])
    sh = io["sh"]
    target = jnp.asarray([0.6, 0.9, 1.0])
    sh0 = _mix(jnp.broadcast_to(target, sh[:, 0].shape), sh[:, 0],
               load[:, None])
    return {**io, "opacity": opacity, "position": new_pos,
            "sh": sh.at[:, 0].set(sh0)}


SH_SHADERS: dict[str, Callable] = {
    "default": sh_default,
    "expPos": sh_exp_pos,
    "heartbeat": sh_heartbeat,
    "cullHalf": sh_cull_half,
    "gaussDissolve": sh_gauss_dissolve,
}


def run_sh_shaders(
    shader_ids: jnp.ndarray,
    io: dict[str, jnp.ndarray],
    ctx: dict[str, Any],
    registry: dict[str, Callable] = SH_SHADERS,
) -> dict[str, jnp.ndarray]:
    """Apply per-splat SH shaders by masked dispatch.

    Args:
      shader_ids: [N] int32 index into `registry` (insertion order).
      io: attribute dict (see module docstring); "stencil" is added if
        missing (reference inits stencil=0, `rasterizer_impl.cu:279`).
      ctx: time/dt/textures.
    """
    if "stencil" not in io:
        io = {**io, "stencil": jnp.zeros_like(io["opacity"])}
    out = io
    for idx, fn in enumerate(registry.values()):
        res = fn(ctx, io)
        mask = shader_ids == idx
        out = {
            k: jnp.where(
                mask.reshape((-1,) + (1,) * (res[k].ndim - 1)),
                res[k], out[k])
            for k in out}
    return out


# ---------------------------------------------------------------------------
# Splat shaders — per-splat color stage
# ---------------------------------------------------------------------------
# in keys: position [N,3], normal [N,3], color_sh [N,3], color_base [N,3],
#          camera_pos [3], splat_depth [N], depth_sample [N],
#          stencil_sample [N], time, textures
# io keys: opacity [N], stencil_val [N], stencil_opacity [N]
# output:  dict(out_color [N,3], **mutated io)


def _facing_opacity(inp):
    """Quint-eased edge weight from view angle (`splatShader.cu:73-85`)."""
    to_cam = inp["camera_pos"][None, :] - inp["position"]
    to_cam = to_cam / jnp.maximum(
        jnp.linalg.norm(to_cam, axis=-1, keepdims=True), 1e-12)
    n = inp["normal"] / jnp.maximum(
        jnp.linalg.norm(inp["normal"], axis=-1, keepdims=True), 1e-12)
    angle = 1.0 - jnp.abs(jnp.sum(to_cam * n, -1))
    return jnp.where(
        angle < 0.5, 1.0 - 16.0 * angle ** 5,
        (-2.0 * angle + 2.0) ** 5 / 2.0)


def splat_default(ctx, inp, io):
    return {"out_color": inp["color_sh"], **io}


def splat_naive_outline(ctx, inp, io):
    w = _facing_opacity(inp)
    return {"out_color": inp["color_sh"] * w[:, None], **io}


def splat_wireframe(ctx, inp, io):
    w = 1.0 - _facing_opacity(inp)
    return {"out_color": jnp.stack([w, w, w], -1), **io}


def splat_dissolve(ctx, inp, io):
    """Time-pulsed dissolve with texture mask (`DissolveShader`,
    `splatShader.cu:104-139`)."""
    pos = inp["position"]
    tex = _tex(ctx.get("textures"), "Cracks")
    m = (sample_texture(tex, pos[:, 0], pos[:, 1])[:, 0]
         * sample_texture(tex, pos[:, 0], pos[:, 2])[:, 0]
         * sample_texture(tex, pos[:, 1], pos[:, 2])[:, 0])
    m = _saturate((m - 0.125) * 1.5)
    opacity_t = jnp.cos(ctx["time"] * 0.1 * 4 / ((1 / PI) * 2 * 1000)) + 1
    masked = _saturate(opacity_t - (1.0 - m))
    color_fade = _saturate(masked * 3.0)
    target = jnp.asarray([0.6, 0.9, 1.0])
    out_color = _mix(jnp.broadcast_to(target, inp["color_sh"].shape),
                     inp["color_sh"], color_fade[:, None])
    return {"out_color": out_color,
            **{**io,
               "opacity": io["opacity"] * masked,
               "stencil_val": m}}


def splat_crack(ctx, inp, io):
    """Projected crack cut-out with internal recolor (`CrackShaderCUDA`,
    `splatShader.cu:141-186`)."""
    pos = inp["position"]
    tex = _tex(ctx.get("textures"), "Depth cracks")
    u = pos[:, 0] / 2.0 - 0.5
    v = pos[:, 1] / 2.0 - 0.5
    crack_depth = 1.0 - sample_texture(tex, u, v)[:, 0]
    crack_h = 2.0 - crack_depth * 2.0
    reaches = crack_h < pos[:, 2]
    opacity = jnp.where(reaches, 0.0, io["opacity"])
    dist_surf = inp["splat_depth"] - inp["depth_sample"] + 0.3
    inside = dist_surf > 0
    max_primary = 2.0 - (crack_depth + 0.1) * 2.0
    in_reach = pos[:, 2] > max_primary
    use_internal = inside & in_reach
    icp = _saturate(dist_surf * 10.0)[:, None]
    internal = _mix(inp["color_base"], jnp.asarray([[0.5, 0.5, 0.0]]), icp)
    max_discolor = max_primary - 0.1 * 2.0
    dp = _saturate((pos[:, 2] - max_discolor) / 0.2)[:, None]
    external = _mix(inp["color_sh"], internal, dp)
    out_color = jnp.where(use_internal[:, None], internal, external)
    opacity = opacity + 0.2 * use_internal * (~reaches)
    return {"out_color": out_color, **{**io, "opacity": opacity}}


def splat_write_stencil(ctx, inp, io):
    return {"out_color": inp["color_sh"],
            **{**io, "stencil_val": jnp.ones_like(io["stencil_val"]),
               "stencil_opacity": io["opacity"]}}


def splat_quantize_color(ctx, inp, io):
    """Flat base color (toon prep) (`QuantizeFlatColors`,
    `splatShader.cu:253-257`)."""
    return {"out_color": inp["color_base"], **io}


def splat_crack_no_recon(ctx, inp, io):
    """Crack cut-out that hands reconstruction to the post pass: masked
    splats go to the stencil, interior splats flag `metallic`
    (`CrackWithoutReconstructionShaderCUDA`, `splatShader.cu:188-226`)."""
    pos = inp["position"]
    tex = _tex(ctx.get("textures"), "Bulge")
    u = pos[:, 0] / 2.0 - 0.5
    v = pos[:, 1] / 2.0 - 0.5
    crack_depth = 1.0 - sample_texture(tex, u, v)[:, 0]
    crack_h = 2.0 - crack_depth * 2.0
    reaches = crack_h < pos[:, 2]
    original_opacity = io["opacity"]
    opacity = jnp.where(reaches, 0.0, io["opacity"])
    dist_surf = inp["splat_depth"] - inp["depth_sample"] + 0.2
    inside = dist_surf > 0
    reach = 0.5 * crack_depth
    max_primary = 2.0 - (crack_depth + reach) * 2.0
    use_internal = inside & (max_primary < pos[:, 2])
    return {"out_color": inp["color_base"],
            **{**io,
               "opacity": opacity,
               "stencil_val": reaches.astype(pos.dtype),
               "stencil_opacity": original_opacity,
               "metallic": use_internal.astype(pos.dtype)}}


def splat_roughness_only(ctx, inp, io):
    """Debug: hard-set roughness by half-space, zero everything else
    (`RoughnessOnlyCUDA`, `splatShader.cu:234-251`)."""
    rough = jnp.where(inp["position"][:, 0] < 0, 0.25, 0.75)
    zeros3 = jnp.zeros_like(inp["color_sh"])
    return {"out_color": zeros3,
            **{**io, "roughness": rough,
               "metallic": jnp.zeros_like(rough)}}


def splat_quantize_light(ctx, inp, io):
    """Quantize incident light to a white intensity ramp
    (`QuantizeLight`, `splatShader.cu:259-269`)."""
    light = inp.get("incident_light", inp["color_sh"])
    q = quantize(light, 3)
    white = jnp.max(q, axis=-1)
    return {"out_color": inp["color_base"],
            **{**io, "roughness": white}}


SPLAT_SHADERS: dict[str, Callable] = {
    "default": splat_default,
    "naiveOutline": splat_naive_outline,
    "wireframe": splat_wireframe,
    "dissolve": splat_dissolve,
    "crack": splat_crack,
    "crackNoRecon": splat_crack_no_recon,
    "writeToStencil": splat_write_stencil,
    "roughnessOnly": splat_roughness_only,
    "quantizeFlats": splat_quantize_color,
    "quantizeLight": splat_quantize_light,
}


def run_splat_shaders(
    shader_ids: jnp.ndarray,
    inp: dict[str, jnp.ndarray],
    io: dict[str, jnp.ndarray],
    ctx: dict[str, Any],
    registry: dict[str, Callable] = SPLAT_SHADERS,
) -> dict[str, jnp.ndarray]:
    """Masked dispatch of the per-splat color stage.  Returns the io dict
    plus "out_color" [N, 3]."""
    out = {"out_color": inp["color_sh"], **io}
    for idx, fn in enumerate(registry.values()):
        res = fn(ctx, inp, dict(io))
        mask = shader_ids == idx
        out = {
            k: jnp.where(
                mask.reshape((-1,) + (1,) * (res[k].ndim - 1)),
                res[k], out[k])
            for k in out}
    return out


# ---------------------------------------------------------------------------
# Post-process shaders — sequential full-screen passes
# ---------------------------------------------------------------------------
# images: dict of [H, W, C] blended channels: shader_color, base_color,
#         depth, stencil, incident_light, pseudo_normal, metallic, ...
# Each pass returns an updated images dict (double-buffered semantics of
# `postProcessShader.cu:13-107` collapse to functional updates).


def post_invert(ctx, images):
    return {**images,
            "shader_color": 1.0 - images["shader_color"]}


def _stencil_inside(stencil, threshold=0.9):
    return stencil[..., 0] >= threshold if stencil.ndim == 3 else \
        stencil >= threshold


def post_outline(ctx, images, thickness: int = 5, directions: int = 5):
    """Red outline ring around the stencil (`OutlineShader`,
    `postProcessShader.cu:209-233`) — the ring test becomes a max-pool
    of the stencil over sampled offsets."""
    stencil = images["stencil"]
    s = stencil if stencil.ndim == 2 else stencil[..., 0]
    inside = s >= 0.9
    near = jnp.zeros_like(inside)
    for radius in range(1, thickness + 1):
        for k in range(directions + 1):
            ang = 2.0 * PI * k / directions
            dx = int(round(float(jnp.cos(ang)) * radius))
            dy = int(round(float(jnp.sin(ang)) * radius))
            near = near | jnp.roll(inside, (-dy, -dx), axis=(0, 1))
    ring = (~inside) & near
    outline = jnp.asarray([1.0, 0.0, 0.0])
    base = images["base_color"]
    color = jnp.where(ring[..., None], outline, base)
    return {**images, "shader_color": color}


def post_color_correction(ctx, images):
    """Quantize hue, lift shadows (`ColorCorrection`,
    `postProcessShader.cu:305-318`)."""
    color = images["base_color"]
    hsv = rgb_to_hsv(color)
    hsv = hsv.at[..., 0].set(quantize(hsv[..., 0], 24))
    color = hsv_to_rgb(hsv)
    light = images["incident_light"]
    intensity = _saturate(light[..., 0:1] + 0.25)
    return {**images, "shader_color": color * intensity}


def post_quantize_lighting(ctx, images):
    light = images["incident_light"]
    white = jnp.max(light, axis=-1, keepdims=True)
    q = quantize(white, 4)
    return {**images,
            "incident_light": jnp.broadcast_to(q, light.shape)}


def _gaussian_blur5(img):
    """5x5 gaussian blur (`shaderUtils.cu:88-130`)."""
    k1 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0])
    k = (k1[:, None] * k1[None, :]) / 256.0
    out = jnp.zeros_like(img)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            out = out + k[dy + 2, dx + 2] * jnp.roll(
                img, (-dy, -dx), axis=(0, 1))
    return out


def post_blur_lighting(ctx, images):
    light = images["incident_light"]
    blurred = _gaussian_blur5(light)
    bgmask = jnp.all(light == 0.0, axis=-1, keepdims=True)
    return {**images,
            "incident_light": jnp.where(bgmask, light, blurred)}


def post_sobel(ctx, images):
    """Depth-edge darkening (`SobelFilter`,
    `postProcessShader.cu:342-373`)."""
    depth = images["depth"]
    d = depth if depth.ndim == 2 else depth[..., 0]
    kx = jnp.asarray([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    gx = jnp.zeros_like(d)
    gy = jnp.zeros_like(d)
    for i in range(3):
        for j in range(3):
            sh = jnp.roll(d, (1 - i, 1 - j), axis=(0, 1))
            gx = gx + kx[i, j] * sh * 2.0
            gy = gy + kx[j, i] * sh * 2.0
    change = jnp.floor(jnp.sqrt(gx * gx + gy * gy))
    fac = _saturate(1.0 - jnp.abs(change))
    return {**images,
            "shader_color": images["shader_color"] * fac[..., None]}


def post_crack_reconstruction(ctx, images):
    """Shade crack interiors using stencil x metallic mask
    (`CrackReconstructionShader`, `postProcessShader.cu:235-265`)."""
    stencil = images["stencil"]
    s = stencil if stencil.ndim == 2 else stencil[..., 0]
    metallic = images["metallic"]
    m = metallic if metallic.ndim == 2 else metallic[..., 0]
    mask = (s * m)[..., None]
    normal = images["pseudo_normal"]
    light_dir = jnp.asarray([0.0, -0.2, 1.0])
    light_dir = light_dir / jnp.linalg.norm(light_dir)
    lam = _saturate(_saturate(
        jnp.sum(light_dir * normal, -1, keepdims=True) * 0.1) + 0.9)
    internal = jnp.asarray([0.83, 0.64, 0.2]) * lam
    color = internal * mask + images["shader_color"] * (1 - mask)
    color = jnp.where(mask > 0.01, color, images["shader_color"])
    return {**images, "shader_color": color}


def post_textured_shadows(ctx, images):
    """Draw shadow hatching texture in dark areas (`TexturedShadows`,
    `postProcessShader.cu:267-303`)."""
    H, W = images["shader_color"].shape[:2]
    tex = _tex(ctx.get("textures"), "shadow")
    u = (jnp.arange(W) / W * 10.0)[None, :].repeat(H, 0)
    v = (jnp.arange(H) / H * 10.0)[:, None].repeat(W, 1)
    samp = sample_texture(tex, u, v)
    light_sh = 1.0 - samp[..., 0]
    med_sh = 1.0 - samp[..., 2]
    heavy_sh = 1.0 - samp[..., 1]
    light = images["incident_light"]
    intensity = jnp.round(jnp.max(light, -1) * 4.0)
    heavy = _saturate(heavy_sh + intensity)
    intensity = jnp.maximum(0.0, intensity - 1.0)
    med = _saturate(med_sh + intensity)
    intensity = jnp.maximum(0.0, intensity - 1.0)
    lig = _saturate(light_sh + intensity)
    stencil = images["stencil"]
    s = stencil if stencil.ndim == 2 else stencil[..., 0]
    fac = (lig * med * heavy)[..., None]
    color = jnp.where(
        (s >= 0.01)[..., None], images["shader_color"] * fac,
        jnp.ones_like(images["shader_color"]))
    return {**images, "shader_color": color}


def post_toon(ctx, images):
    """ColorCorrection → TexturedShadows → Sobel (`ToonShader`,
    `postProcessShader.cu:375-379`)."""
    images = post_color_correction(ctx, images)
    images = post_textured_shadows(ctx, images)
    return post_sobel(ctx, images)


POST_SHADERS: dict[str, Callable] = {
    "default": lambda ctx, images: images,
    "invert": post_invert,
    "outline": post_outline,
    "colorCorrection": post_color_correction,
    "quantizeLighting": post_quantize_lighting,
    "blurLighting": post_blur_lighting,
    "sobel": post_sobel,
    "crackReconstruction": post_crack_reconstruction,
    "texturedShadows": post_textured_shadows,
    "toon": post_toon,
}


def run_post_process(
    passes: list[str],
    images: dict[str, jnp.ndarray],
    ctx: dict[str, Any],
    registry: dict[str, Callable] = POST_SHADERS,
) -> dict[str, jnp.ndarray]:
    """Run the selected full-screen passes in order
    (`forward.cu:1030-1043` double-buffer loop, functional here)."""
    for name in passes:
        images = registry[name](ctx, images)
    return images


def shader_id_array(names: jnp.ndarray | list[str],
                    registry: dict[str, Callable]) -> jnp.ndarray:
    """Name list → int32 id array for the masked dispatchers."""
    keys = list(registry)
    return jnp.asarray([keys.index(n) for n in names], jnp.int32)


def assign_shaders_by_position(
    positions: jnp.ndarray,
    registry: dict[str, Callable] = SPLAT_SHADERS,
    left: str = "default",
    right: str = "default",
) -> jnp.ndarray:
    """Demo shader assignment by x-sign — the analogue of the
    reference's hard-coded position-threshold assignment
    (`preprocessModel.cu:17-59`), vectorized instead of single-thread."""
    keys = list(registry)
    li, ri = keys.index(left), keys.index(right)
    return jnp.where(positions[:, 0] < 0, li, ri).astype(jnp.int32)
