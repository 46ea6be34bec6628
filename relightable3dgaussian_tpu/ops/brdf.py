"""NeILF render equation: per-splat physically-based shading.

TPU-native analogue of the reference CUDA render-equation kernels
(`r3dg-rasterization/render_equation.cu:52-727`) and their Python twin
(`gaussian_renderer/neilf.py:425-519`), which this module matches term by
term (the twin is the reference's own correctness oracle).  Unlike the
CUDA path there is no hand-derived backward — the whole thing is dense
[P, S] jnp math (VPU-bound, XLA-fused) and autodiff provides gradients
for all eight inputs.

Model summary (per splat, S incident directions):
  * fibonacci-sphere directions rotated to the normal's hemisphere,
    random azimuth during training;
  * incident light = per-splat SH (local) + global SH env x SH visibility;
  * simplified Disney BRDF: SG-normalized D, Schlick F, Schlick-GGX V;
  * outgoing = mean over samples of (f_d + f_s) * L_i * 2*pi * cos.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import sh as sh_ops
from .transforms import normalize as _safe_unit

PI = 3.14159265358979

# Feature-packed (transposed) render-equation scan: every per-splat
# array runs as [C, P] with the LONG P axis on lanes, instead of the
# natural [P, C] whose minor dims of 1/3 lane-pad 42-128x on the (8,128)
# tiled layout.  Measured LOSER on v5e (r5, decisively: 70.9 vs
# 41.7 ms PBR step at 800²): the body becomes ~100 separate [P]-vector
# ops whose fusion/launch overhead dwarfs the lane-padding it saves —
# XLA already fuses the [P, C] chains into few passes despite the pad.
# Kept (value+grad parity pinned in test_brdf) as the A/B harness:
# `tools/bench_probe.py --pbr --absweep brdf.PACKED_SCAN=1,0`.
PACKED_SCAN = False


def fibonacci_sphere_dirs(sample_num: int, dtype=jnp.float32) -> jnp.ndarray:
    """[S, 3] unit dirs on the +z hemisphere spiral (reference
    `utils/graphics_utils.py:9-37`; z from 1 to ~-1 over 2S-1 steps —
    i.e. covers the upper hemisphere for i < S)."""
    i = jnp.arange(sample_num, dtype=dtype)
    delta = PI * (3.0 - jnp.sqrt(5.0))
    z = 1.0 - 2.0 * i / (2.0 * sample_num - 1.0)
    rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    theta = delta * i
    return jnp.stack([jnp.sin(theta) * rad, jnp.cos(theta) * rad, z], -1)


def sample_incident_dirs(
    normals: jnp.ndarray,
    sample_num: int,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """[P, S, 3] hemisphere directions around each normal.

    A fibonacci spiral around +z is rotated to each normal
    (`rotation_between_z`); when `rng` is given the spiral gets a random
    per-splat azimuth (training-time stochastic integration,
    `fibonacci_sphere_sampling(random_rotate=True)`).
    """
    P = normals.shape[0]
    dt = normals.dtype
    i = jnp.arange(sample_num, dtype=dt)
    delta = PI * (3.0 - jnp.sqrt(5.0))
    z = 1.0 - 2.0 * i / (2.0 * sample_num - 1.0)               # [S]
    rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    theta = delta * i[None, :]                                  # [1, S]
    if rng is not None:
        theta = theta + jax.random.uniform(rng, (P, 1), dt) * 2.0 * PI
    x = jnp.sin(theta) * rad[None, :]
    y = jnp.cos(theta) * rad[None, :]
    zb = jnp.broadcast_to(z[None, :], x.shape)
    local = jnp.stack([x, y, zb], -1)                           # [P, S, 3]
    R = sh_ops.rotation_between_z(normals)                      # [P, 3, 3]
    dirs = jnp.einsum("pij,psj->psi", R, local)
    return _safe_unit(dirs)


def _d_sg(roughness: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Spherical-gaussian-normalized NDF (reference `_d_sg`,
    `neilf.py:478-483`)."""
    r2 = jnp.maximum(roughness * roughness, 1e-7)
    amp = 1.0 / (r2 * PI)
    sharp = 2.0 / r2
    return amp * jnp.exp(sharp * (cos - 1.0))


def _v_schlick_ggx(roughness: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    r2 = (1.0 + roughness) ** 2 / 8.0
    return 0.5 / jnp.maximum(cos * (1.0 - r2) + r2, 1e-7)


def rendering_equation(
    base_color: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    normals: jnp.ndarray,
    viewdirs: jnp.ndarray,
    incidents: jnp.ndarray,
    direct_shs: jnp.ndarray | None = None,
    visibility_shs: jnp.ndarray | None = None,
    sample_num: int = 24,
    rng: jax.Array | None = None,
    incident_dirs: jnp.ndarray | None = None,
    incident_lights_precomp: jnp.ndarray | None = None,
    visibility_precomp: jnp.ndarray | None = None,
    return_samples: bool = False,
) -> tuple[jnp.ndarray, dict[str, Any]]:
    """Evaluate the render equation for every splat.

    Args (all [P, ...] unless noted):
      base_color [P, 3]; roughness [P, 1]; metallic [P, 1];
      normals [P, 3] unit; viewdirs [P, 3] unit (splat → camera);
      incidents [P, Ki, 3] per-splat incident-light SH;
      direct_shs [1, Kd, 3] or [Kd, 3] global env SH (None → no global);
      visibility_shs [P, Kv, 1] per-splat visibility SH;
      sample_num: S; rng: azimuth randomization key (training);
      incident_dirs: optional precomputed [P, S, 3] directions;
      incident_lights_precomp: optional [P, S, 3] env light per direction
        (relighting path: env-map lookup instead of SH);
      visibility_precomp: optional [P, S, 1] ray-traced visibility
        (composition path, `neilf_composite.py:269-279`);
      return_samples: keep per-sample [P, S, *] extras (forces the dense
        path).  Default False uses a `lax.scan` over samples that never
        materializes a [P, S, *] tensor — at P=131k, S=24 every dense
        intermediate is ~200 MB of HBM traffic and the dense evaluation
        is purely bandwidth-bound (~106 ms/step measured in round 3);
        the reference's CUDA kernel streams samples in registers for the
        same reason (`render_equation.cu:552-663`).

    Returns:
      (pbr [P, 3], extras dict) matching the reference Python twin
      (`rendering_equation_python`, `neilf.py:437-519`).  Extras always
      include the sample-reduced channels consumers need
      (`diffuse_light`, `mean_*`); per-sample tensors only with
      `return_samples=True` (or when precomputed per-sample inputs are
      given, which already exist at [P, S, *]).
    """
    dense = (return_samples or incident_dirs is not None
             or incident_lights_precomp is not None
             or visibility_precomp is not None)
    if not dense:
        scan = (_rendering_equation_scan_packed if PACKED_SCAN
                else _rendering_equation_scan)
        return scan(
            base_color, roughness, metallic, normals, viewdirs,
            incidents, direct_shs, visibility_shs, sample_num, rng)
    if incident_dirs is None:
        incident_dirs = sample_incident_dirs(normals, sample_num, rng)
    S = incident_dirs.shape[1]

    # SH basis at the incident directions; deg from visibility coeff count
    # (reference: deg = sqrt(Kv) - 1, `neilf.py:448`), fall back to deg 3.
    if visibility_shs is not None:
        deg = int(round(visibility_shs.shape[1] ** 0.5)) - 1
    else:
        deg = 3
    coef = sh_ops.eval_sh_basis(deg, incident_dirs)             # [P, S, K]

    ki = incidents.shape[1]
    local = jnp.maximum(
        jnp.einsum("psk,pkc->psc", coef[..., :ki], incidents), 0.0)

    if incident_lights_precomp is not None:
        global_lights = incident_lights_precomp
    elif direct_shs is not None:
        dshs = direct_shs.reshape(-1, 3)                        # [Kd, 3]
        kd = dshs.shape[0]
        global_lights = jnp.maximum(
            jnp.einsum("psk,kc->psc", coef[..., :kd], dshs) + 0.5, 0.0)
    else:
        global_lights = jnp.zeros_like(local)

    if visibility_precomp is not None:
        vis = visibility_precomp
    elif visibility_shs is not None:
        kv = visibility_shs.shape[1]
        vis = jnp.clip(
            jnp.einsum("psk,pkc->psc", coef[..., :kv], visibility_shs)
            + 0.5, 0.0, 1.0)
    else:
        vis = jnp.ones_like(local[..., :1])

    global_lights = global_lights * vis
    incident_lights = local + global_lights

    n = normals[:, None, :]
    v = viewdirs[:, None, :]
    half = _safe_unit(incident_dirs + v)

    def dot(a, b):
        return jnp.maximum(jnp.sum(a * b, -1, keepdims=True), 0.0)

    h_d_n = dot(half, n)
    h_d_o = dot(half, v)
    n_d_i = dot(n, incident_dirs)
    n_d_o = dot(n, v)

    base = base_color[:, None, :]
    rough = roughness[:, None, :]
    metal = metallic[:, None, :]

    f_d = (1.0 - metal) * base / PI
    D = _d_sg(rough, h_d_n)
    f0 = 0.04 * (1.0 - metal) + base * metal
    F = f0 + (1.0 - f0) * (1.0 - h_d_o) ** 5
    V = _v_schlick_ggx(rough, n_d_i) * _v_schlick_ggx(rough, n_d_o)
    f_s = D * F * V

    transport = incident_lights * (2.0 * PI) * n_d_i            # [P, S, 3]
    rgb_d = jnp.mean(f_d * transport, axis=1)
    rgb_s = jnp.mean(f_s * transport, axis=1)
    pbr = rgb_d + rgb_s
    diffuse_light = jnp.mean(transport, axis=1)
    local_diffuse_light = jnp.mean(local * (2.0 * PI) * n_d_i, axis=1)

    extras = {
        "incident_dirs": incident_dirs,
        "incident_lights": incident_lights,
        "local_incident_lights": local,
        "global_incident_lights": global_lights,
        "incident_visibility": vis,
        "diffuse_light": diffuse_light,
        "local_diffuse_light": local_diffuse_light,
        "rgb_d": rgb_d,
        "rgb_s": rgb_s,
        # mean-channel accumulated radiance (`render_equation.cu:182-184`)
        "accum": jnp.mean(diffuse_light / PI + rgb_s, axis=-1),
        # sample-reduced channels (what the feature packers consume;
        # identical keys to the scan path)
        "mean_incident_lights": jnp.mean(incident_lights, axis=-2),
        "mean_local_lights": jnp.mean(local, axis=-2),
        "mean_global_lights": jnp.mean(global_lights, axis=-2),
        "mean_visibility": jnp.mean(vis, axis=-2),
    }
    return pbr, extras


def _rendering_equation_scan(
    base_color: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    normals: jnp.ndarray,
    viewdirs: jnp.ndarray,
    incidents: jnp.ndarray,
    direct_shs: jnp.ndarray | None,
    visibility_shs: jnp.ndarray | None,
    sample_num: int,
    rng: jax.Array | None,
) -> tuple[jnp.ndarray, dict[str, Any]]:
    """Sample-streaming evaluation: identical math to the dense path but
    one incident direction at a time ([P, *] working set), accumulating
    the sample means.  Never builds a [P, S, *] tensor, so HBM traffic
    per step is the parameter read (~40 MB at P=131k) instead of ~10
    dense [P, S, *] round trips — the bandwidth shape of the reference's
    register-resident CUDA kernel (`render_equation.cu:552-663`)."""
    P = normals.shape[0]
    dt = normals.dtype
    S = sample_num

    if visibility_shs is not None:
        deg = int(round(visibility_shs.shape[1] ** 0.5)) - 1
    else:
        deg = 3
    ki = incidents.shape[1]
    dshs = None
    if direct_shs is not None:
        dshs = direct_shs.reshape(-1, 3)                        # [Kd, 3]

    R = sh_ops.rotation_between_z(normals)                      # [P, 3, 3]
    azim = None
    if rng is not None:
        azim = jax.random.uniform(rng, (P, 1), dt) * 2.0 * PI   # [P, 1]

    n = normals
    v = viewdirs
    base = base_color
    rough = roughness
    metal = metallic
    f_d = (1.0 - metal) * base / PI
    f0 = 0.04 * (1.0 - metal) + base * metal
    n_d_o = jnp.maximum(jnp.sum(n * v, -1, keepdims=True), 0.0)
    v_o = _v_schlick_ggx(rough, n_d_o)

    delta = PI * (3.0 - jnp.sqrt(jnp.asarray(5.0, dt)))

    def one_sample(s):
        sf = s.astype(dt)
        z = 1.0 - 2.0 * sf / (2.0 * S - 1.0)
        rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        theta = delta * sf
        if azim is not None:
            theta = theta + azim                                # [P, 1]
        else:
            theta = jnp.full((P, 1), theta, dt)
        local_dir = jnp.concatenate(
            [jnp.sin(theta) * rad, jnp.cos(theta) * rad,
             jnp.full((P, 1), z, dt)], -1)                      # [P, 3]
        d = _safe_unit(jnp.einsum("pij,pj->pi", R, local_dir))  # [P, 3]

        coef = sh_ops.eval_sh_basis(deg, d)                     # [P, K]
        local = jnp.maximum(
            jnp.einsum("pk,pkc->pc", coef[:, :ki], incidents), 0.0)
        if dshs is not None:
            kd = dshs.shape[0]
            glob = jnp.maximum(coef[:, :kd] @ dshs + 0.5, 0.0)
        else:
            glob = jnp.zeros_like(local)
        if visibility_shs is not None:
            kv = visibility_shs.shape[1]
            vis = jnp.clip(
                jnp.einsum("pk,pkc->pc", coef[:, :kv], visibility_shs)
                + 0.5, 0.0, 1.0)
        else:
            vis = jnp.ones_like(local[..., :1])
        glob = glob * vis
        light = local + glob

        half = _safe_unit(d + v)
        h_d_n = jnp.maximum(jnp.sum(half * n, -1, keepdims=True), 0.0)
        h_d_o = jnp.maximum(jnp.sum(half * v, -1, keepdims=True), 0.0)
        n_d_i = jnp.maximum(jnp.sum(n * d, -1, keepdims=True), 0.0)

        D = _d_sg(rough, h_d_n)
        F = f0 + (1.0 - f0) * (1.0 - h_d_o) ** 5
        V = _v_schlick_ggx(rough, n_d_i) * v_o
        f_s = D * F * V

        transport = light * (2.0 * PI) * n_d_i                  # [P, 3]
        return {
            "transport": transport,
            "local_transport": local * (2.0 * PI) * n_d_i,
            "spec": f_s * transport,
            "light": light,
            "local": local,
            "glob": glob,
            "vis": vis,
        }

    # NOT rematerialized (negative result, r5): jax.checkpoint on the
    # sample body measured 43.4 vs 41.2 ms on the 800² PBR step — the
    # recompute's VPU chains cost more than the stacked [S, P, *]
    # residual HBM traffic they avoid at S=24.
    def body(carry, s):
        out = one_sample(s)
        return jax.tree.map(jnp.add, carry, out), None

    init = jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype),
        jax.eval_shape(one_sample, jnp.int32(0)))
    sums, _ = jax.lax.scan(
        body, init, jnp.arange(S, dtype=jnp.int32))
    inv = 1.0 / S
    diffuse_light = sums["transport"] * inv
    local_diffuse_light = sums["local_transport"] * inv
    rgb_d = f_d * diffuse_light
    rgb_s = sums["spec"] * inv
    pbr = rgb_d + rgb_s
    extras = {
        "diffuse_light": diffuse_light,
        "local_diffuse_light": local_diffuse_light,
        "rgb_d": rgb_d,
        "rgb_s": rgb_s,
        "accum": jnp.mean(diffuse_light / PI + rgb_s, axis=-1),
        "mean_incident_lights": sums["light"] * inv,
        "mean_local_lights": sums["local"] * inv,
        "mean_global_lights": sums["glob"] * inv,
        "mean_visibility": sums["vis"] * inv,
    }
    return pbr, extras


def _rendering_equation_scan_packed(
    base_color: jnp.ndarray,
    roughness: jnp.ndarray,
    metallic: jnp.ndarray,
    normals: jnp.ndarray,
    viewdirs: jnp.ndarray,
    incidents: jnp.ndarray,
    direct_shs: jnp.ndarray | None,
    visibility_shs: jnp.ndarray | None,
    sample_num: int,
    rng: jax.Array | None,
) -> tuple[jnp.ndarray, dict[str, Any]]:
    """`_rendering_equation_scan` in the feature-packed [C, P] layout
    (see PACKED_SCAN): the sample body runs entirely on [P]-lane
    vectors — the SH basis as a python list of K vectors
    (`sh.eval_sh_basis_list`), the rotation as nine component vectors,
    every dot product as component fmas — so nothing in the hot loop
    carries a lane-padded minor dim.  Inputs are transposed once before
    the scan and the accumulated outputs once after."""
    P = normals.shape[0]
    dt = normals.dtype
    S = sample_num
    eps = 1e-12

    if visibility_shs is not None:
        deg = int(round(visibility_shs.shape[1] ** 0.5)) - 1
    else:
        deg = 3
    ki = incidents.shape[1]

    # ---- one-time input transposes ----
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]   # [P]
    vx, vy, vz = viewdirs[:, 0], viewdirs[:, 1], viewdirs[:, 2]
    baseT = base_color.T                                       # [3, P]
    rough = roughness[:, 0]                                    # [P]
    metal = metallic[:, 0]
    incT = jnp.transpose(incidents, (1, 2, 0))                 # [Ki,3,P]
    visT = (None if visibility_shs is None
            else jnp.transpose(visibility_shs, (1, 2, 0)))     # [Kv,1,P]
    dshs = (None if direct_shs is None
            else direct_shs.reshape(-1, 3))                    # [Kd, 3]

    # rotation_between_z(normals) as nine [P] component vectors
    # (identical closed form + degenerate case, `sh.py:128-158`)
    v1 = -ny
    v2 = nx
    cos_p_1 = jnp.maximum(nz + 1.0, 1e-7)
    v11, v22, v12 = v1 * v1, v2 * v2, v1 * v2
    dgn = nz + 1.0 <= 0.0
    zero = jnp.zeros_like(nx)

    def sel(reg, degen):
        return jnp.where(dgn, degen, reg)

    r00 = sel(1.0 - v22 / cos_p_1, -jnp.ones_like(nx))
    r01 = sel(v12 / cos_p_1, zero)
    r02 = sel(v2, zero)
    r10 = sel(v12 / cos_p_1, zero)
    r11 = sel(1.0 - v11 / cos_p_1, -jnp.ones_like(nx))
    r12 = sel(-v1, zero)
    r20 = sel(-v2, zero)
    r21 = sel(v1, zero)
    r22 = sel(1.0 - (v22 + v11) / cos_p_1, -jnp.ones_like(nx))

    f_dT = (1.0 - metal)[None, :] * baseT / PI                 # [3, P]
    f0T = 0.04 * (1.0 - metal)[None, :] + baseT * metal[None, :]
    n_d_o = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)      # [P]
    r2o = (1.0 + rough) ** 2 / 8.0
    v_o = 0.5 / jnp.maximum(n_d_o * (1.0 - r2o) + r2o, 1e-7)
    r2 = jnp.maximum(rough * rough, 1e-7)
    d_amp = 1.0 / (r2 * PI)
    d_sharp = 2.0 / r2

    azim = None
    if rng is not None:
        azim = jax.random.uniform(rng, (P,), dt) * 2.0 * PI    # [P]

    delta = PI * (3.0 - jnp.sqrt(jnp.asarray(5.0, dt)))

    def one_sample(s):
        sf = s.astype(dt)
        z = 1.0 - 2.0 * sf / (2.0 * S - 1.0)
        rad = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        theta = delta * sf
        if azim is not None:
            theta = theta + azim                               # [P]
            ldx = jnp.sin(theta) * rad
            ldy = jnp.cos(theta) * rad
        else:
            ldx = jnp.full((P,), jnp.sin(theta) * rad, dt)
            ldy = jnp.full((P,), jnp.cos(theta) * rad, dt)
        # d = R @ local_dir, then unit-normalize (transforms.normalize)
        d0 = r00 * ldx + r01 * ldy + r02 * z
        d1 = r10 * ldx + r11 * ldy + r12 * z
        d2 = r20 * ldx + r21 * ldy + r22 * z
        inv = 1.0 / jnp.sqrt(jnp.maximum(d0 * d0 + d1 * d1 + d2 * d2,
                                         eps * eps))
        d0, d1, d2 = d0 * inv, d1 * inv, d2 * inv

        coef = sh_ops.eval_sh_basis_list(deg, d0, d1, d2)  # K x [P]

        def sh_dot(shT, kmax, col):
            acc = coef[0] * shT[0, col]
            for kk in range(1, kmax):
                acc = acc + coef[kk] * shT[kk, col]
            return acc

        local = [jnp.maximum(sh_dot(incT, ki, c), 0.0)
                 for c in range(3)]                            # 3 x [P]
        if dshs is not None:
            kd = dshs.shape[0]
            glob = [jnp.maximum(
                sum(coef[kk] * dshs[kk, c] for kk in range(kd)) + 0.5,
                0.0) for c in range(3)]
        else:
            glob = [zero, zero, zero]
        if visT is not None:
            kv = visT.shape[0]
            vis = jnp.clip(sh_dot(visT, kv, 0) + 0.5, 0.0, 1.0)
        else:
            vis = jnp.ones_like(d0)
        glob = [glob[c] * vis for c in range(3)]
        light = [local[c] + glob[c] for c in range(3)]

        hx, hy, hz = d0 + vx, d1 + vy, d2 + vz
        hinv = 1.0 / jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz,
                                          eps * eps))
        hx, hy, hz = hx * hinv, hy * hinv, hz * hinv
        h_d_n = jnp.maximum(hx * nx + hy * ny + hz * nz, 0.0)
        h_d_o = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)
        n_d_i = jnp.maximum(nx * d0 + ny * d1 + nz * d2, 0.0)

        D = d_amp * jnp.exp(d_sharp * (h_d_n - 1.0))
        fres = (1.0 - h_d_o) ** 5
        V = (0.5 / jnp.maximum(n_d_i * (1.0 - r2o) + r2o, 1e-7)) * v_o
        DV = D * V

        tw = (2.0 * PI) * n_d_i                                # [P]
        transport = jnp.stack([light[c] * tw for c in range(3)])
        local_tr = jnp.stack([local[c] * tw for c in range(3)])
        spec = jnp.stack(
            [(f0T[c] + (1.0 - f0T[c]) * fres) * DV * transport[c]
             for c in range(3)])
        return {
            "transport": transport,                            # [3, P]
            "local_transport": local_tr,
            "spec": spec,
            "light": jnp.stack(light),
            "local": jnp.stack(local),
            "glob": jnp.stack(glob),
            "vis": vis[None, :],                               # [1, P]
        }

    def body(carry, s):
        out = one_sample(s)
        return jax.tree.map(jnp.add, carry, out), None

    init = jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype),
        jax.eval_shape(one_sample, jnp.int32(0)))
    sums, _ = jax.lax.scan(
        body, init, jnp.arange(S, dtype=jnp.int32))
    inv = 1.0 / S
    diffuse_light = (sums["transport"] * inv).T                # [P, 3]
    local_diffuse_light = (sums["local_transport"] * inv).T
    rgb_d = f_dT.T * diffuse_light
    rgb_s = (sums["spec"] * inv).T
    pbr = rgb_d + rgb_s
    extras = {
        "diffuse_light": diffuse_light,
        "local_diffuse_light": local_diffuse_light,
        "rgb_d": rgb_d,
        "rgb_s": rgb_s,
        "accum": jnp.mean(diffuse_light / PI + rgb_s, axis=-1),
        "mean_incident_lights": (sums["light"] * inv).T,
        "mean_local_lights": (sums["local"] * inv).T,
        "mean_global_lights": (sums["glob"] * inv).T,
        "mean_visibility": (sums["vis"] * inv).T,
    }
    return pbr, extras
