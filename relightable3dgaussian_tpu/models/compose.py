"""Scene composition, rigid transforms, visibility baking, relighting.

TPU-native analogue of the reference composition/relighting tooling:
`GaussianModel.set_transform` (`scene/gaussian_model.py:237-262`),
`create_from_gaussians` (`:464-476`), `finetune_visibility` (`:428-462`),
`relighting.py:31-123` (scene_composition / update_visibility) and the
`neilf_composite` pipeline (`gaussian_renderer/neilf_composite.py`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import brdf, raytrace
from ..ops import transforms as tf
from ..ops.rasterize import RasterizeConfig, rasterize
from . import gaussians as G
from . import lights as L


def apply_transform(params: G.GaussianParams, transform: jnp.ndarray
                    ) -> G.GaussianParams:
    """Apply a 4x4 affine (rotation+scale+translation) to the splats.

    Matches `set_transform(transform=...)` (`gaussian_model.py:238-249`):
    per-axis scale = row norms of the 3x3 block, scaling multiplied,
    normals and orientation quats rotated.
    """
    M = transform[:3, :3]
    scale = jnp.linalg.norm(M, axis=-1)              # [3] per-row scale
    R = M / scale[:, None]

    new_scaling = jnp.log(jnp.maximum(
        jnp.exp(params.scaling) * scale[None, :], 1e-12))
    xyz = params.xyz @ M.T + transform[:3, 3]
    normal = params.normal @ R.T
    rot_q = tf.rotmat_to_quat(R)
    new_rot = tf.quat_multiply(rot_q[None, :], params.rotation)
    return params.replace(
        xyz=xyz, normal=normal, scaling=new_scaling, rotation=new_rot)


def concat_gaussians(states: list[G.GaussianState], capacity: int | None = None
                     ) -> G.GaussianState:
    """Merge several splat clouds into one state
    (`create_from_gaussians`, `gaussian_model.py:464-476`).

    Alive splats are packed to the front; `capacity` pads the result
    (default: total alive count rounded up to a multiple of 256).
    """
    packed: dict[str, list[np.ndarray]] = {}
    total = 0
    for st in states:
        mask = np.asarray(st.alive)
        total += int(mask.sum())
        for f in st.params.__dataclass_fields__:
            packed.setdefault(f, []).append(
                np.asarray(getattr(st.params, f))[mask])
    if capacity is None:
        capacity = int(-(-total // 256) * 256)
    assert capacity >= total

    def cat_pad(parts):
        x = np.concatenate(parts, axis=0)
        out = np.zeros((capacity,) + x.shape[1:], x.dtype)
        out[: x.shape[0]] = x
        return jnp.asarray(out)

    params = G.GaussianParams(**{k: cat_pad(v) for k, v in packed.items()})
    alive = jnp.asarray(np.arange(capacity) < total)
    return G.GaussianState(
        params=params, alive=alive,
        xyz_grad_accum=jnp.zeros(capacity),
        normal_grad_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        max_radii2d=jnp.zeros(capacity, jnp.int32))


def load_composition(scene_dict: dict, verbose: bool = True
                     ) -> G.GaussianState:
    """Load, transform, and merge the per-object PLYs of a composition
    config (`transform.json` entries {name: {path, transform}} —
    reference `relighting.py:31-55`, and the GUI's multi-object load
    path `gui.py:388-407`).  Per-object incident-light SH is reset: the
    composite scene's light transport differs from each object's
    training scene (`relighting.py:54`).
    """
    from ..training import checkpoint as ckpt  # avoid an import cycle
    states = []
    for name, info in scene_dict.items():
        st = ckpt.load_ply(info["path"], use_pbr=True)
        M = jnp.asarray(
            np.array(info["transform"], np.float32).reshape(4, 4))
        st = st.replace(params=apply_transform(st.params, M))
        st = st.replace(params=st.params.replace(
            incidents_dc=st.params.incidents_dc * 0,
            incidents_rest=st.params.incidents_rest * 0))
        states.append(st)
        if verbose:
            print(f"loaded {name}: {int(st.num_alive)} splats",
                  flush=True)
    merged = concat_gaussians(states)
    if verbose:
        print(f"composite: {int(merged.num_alive)} splats", flush=True)
    return merged


def finetune_visibility(
    state: G.GaussianState,
    iterations: int = 1000,
    lr: float = 1e-2,
    seed: int = 0,
) -> G.GaussianState:
    """Bake ray-traced visibility into the per-splat visibility SH
    (`finetune_visibility`, `gaussian_model.py:428-462`): each iteration
    traces one random hemisphere ray per splat and fits the SH by L1.
    """
    p = state.params
    sym6 = raytrace.inverse_covariance(
        G.get_scaling(p), G.get_rotation(p))
    means = p.xyz
    opacity = G.get_opacity(p)
    normal = G.get_normal(p)
    alive = state.alive

    tx = optax.adam(lr)
    opt = tx.init((p.visibility_dc, p.visibility_rest))

    @jax.jit
    def step(vis_dc, vis_rest, opt, key):
        rays_d = tf.normalize(
            jax.random.normal(key, means.shape))
        flip = jnp.sum(rays_d * normal, -1, keepdims=True) < 0
        rays_d = jnp.where(flip, -rays_d, rays_d)
        traced = raytrace.trace_visibility(
            means, rays_d, means, sym6, opacity, normal,
            alive=alive)["visibility"]

        def loss_fn(vd, vr):
            from ..ops import sh as sh_ops
            shs = jnp.concatenate([vd, vr], axis=1)      # [N, 16, 1]
            pred = sh_ops.eval_sh(
                3, jnp.swapaxes(shs, -1, -2), rays_d)[..., 0]
            pred = jnp.clip(pred + 0.5, 0.0, 1.0)
            w = alive.astype(pred.dtype)
            return jnp.sum(jnp.abs(pred - traced) * w) / jnp.maximum(
                jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn, (0, 1))(vis_dc, vis_rest)
        updates, opt = tx.update(grads, opt)
        vis_dc, vis_rest = optax.apply_updates((vis_dc, vis_rest), updates)
        return vis_dc, vis_rest, opt, loss

    key = jax.random.PRNGKey(seed)
    vd, vr = p.visibility_dc, p.visibility_rest
    for _ in range(iterations):
        key, k = jax.random.split(key)
        vd, vr, opt, _ = step(vd, vr, opt, k)
    return state.replace(params=p.replace(
        visibility_dc=vd, visibility_rest=vr))


def precompute_visibility(
    state: G.GaussianState,
    sample_num: int = 384,
    chunk: int = 4096,
    use_cells: bool | None = None,
    strict: bool = True,
    max_rays_per_cell: int | None = None,
) -> jnp.ndarray:
    """Trace per-splat visibility along the deterministic fibonacci dirs
    (`update_visibility(is_bake=False)`, `relighting.py:58-86`).

    The workload is O(N·S·P) pairs; past ~16k splats the morton-cell
    culled tracer (`raytrace.trace_visibility_cells`, lossless — the
    TPU analogue of the reference's LBVH) replaces the dense sweep.
    `use_cells` forces the choice (None = auto by capacity).

    `strict=True` (default) raises if any (ray, cell) pair fell beyond
    the tracer's `max_rays_per_cell` budget — a silent drop would
    overestimate visibility; pass strict=False to downgrade to a
    warning (the counter discipline of the rasterizer's `dropped_*`).

    Returns [N, S, 1] visibility aligned with `sample_incident_dirs`
    (deterministic, no azimuth randomization).
    """
    p = state.params
    scales = G.get_scaling(p)
    sym6 = raytrace.inverse_covariance(scales, G.get_rotation(p))
    means = p.xyz
    opacity = G.get_opacity(p)
    normal = G.get_normal(p)
    N = p.capacity
    if use_cells is None:
        use_cells = N >= 16_384
    cells = raytrace.build_cells(means, scales, state.alive) \
        if use_cells else None

    @jax.jit
    def trace_chunk(sub_means, sub_normals):
        # dirs per chunk — identical to slicing the full
        # sample_incident_dirs(normal) (per-splat independent) without
        # materializing [N, S, 3]
        d = brdf.sample_incident_dirs(sub_normals, sample_num)
        o = jnp.repeat(sub_means, sample_num, axis=0)
        if cells is not None:
            out = raytrace.trace_visibility_cells(
                o, d.reshape(-1, 3), means, sym6, opacity, normal,
                cells, alive=state.alive,
                max_rays_per_cell=max_rays_per_cell)
        else:
            out = raytrace.trace_visibility(
                o, d.reshape(-1, 3), means, sym6, opacity, normal,
                alive=state.alive)
        return out["visibility"], out.get("dropped_rays", 0)

    if use_cells:
        # bound the [rays, C] hit matrix, not the splat count; bigger
        # ray chunks shrink the per-cell load skew (and the Rb slack)
        chunk = max(1, min(chunk, 32_768 // sample_num))
    out, drops = [], []
    for off in range(0, N, chunk):
        n = min(chunk, N - off)
        vis, drop = trace_chunk(means[off: off + n],
                                normal[off: off + n])
        drops.append(drop)  # no per-chunk sync — keep dispatch pipelined
        out.append(vis.reshape(n, sample_num, 1))
    dropped = int(sum(jnp.asarray(d) for d in drops))
    if dropped:
        # Adaptive lossless retry: real scenes concentrate splats
        # (ground planes, object cores), so the default per-cell ray
        # budget (R//10) can under-cover heavy cells.  Double the
        # budget and re-trace until clean (each rung is one recompile)
        # — exact, no silent overestimate, no per-scene tuning.
        R_chunk = chunk * sample_num
        rb = max_rays_per_cell or R_chunk // 10
        # Doubling the budget alone OOMs after a few rungs (the
        # per-cell eval buffers scale with Rb); halving the ray
        # chunk alongside keeps memory ~flat — per-cell loads halve
        # with the chunk, so the EFFECTIVE budget still doubles.
        # Retry only while it makes progress (chunk still halvable):
        # at chunk == 1 the recursive args would repeat verbatim and
        # re-trace the whole scene each level — fall through to the
        # strict ValueError instead.
        new_chunk = max(chunk // 2, 1)
        if strict and dropped and rb < R_chunk and new_chunk < chunk:
            rb = min(rb, new_chunk * sample_num)
            print(f"precompute_visibility: {dropped} pairs over budget; "
                  f"retrying with max_rays_per_cell={rb} "
                  f"chunk={new_chunk}", flush=True)
            return precompute_visibility(
                state, sample_num=sample_num, chunk=new_chunk,
                use_cells=use_cells, strict=strict,
                max_rays_per_cell=rb)
        msg = (f"precompute_visibility: {dropped} (ray, cell) pairs "
               "beyond max_rays_per_cell — visibility overestimated; "
               "raise the budget or lower the trace chunk")
        if strict:
            raise ValueError(msg + " (or pass strict=False to accept "
                             "the overestimate)")
        import warnings
        warnings.warn(msg, stacklevel=2)
    return jnp.concatenate(out, axis=0)


def render_composite(
    state: G.GaussianState,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    config: RasterizeConfig,
    env: L.EnvMap,
    visibility_precomp: jnp.ndarray | None = None,
    sample_num: int = 384,
    active_sh_degree: int = 3,
    light_transform: jnp.ndarray | None = None,
) -> dict[str, Any]:
    """Offline composition render with env-map lighting
    (`render_neilf_composite`, `neilf_composite.py:15-345`): incident
    light from the HDR map instead of SH, visibility from precomputed
    ray tracing, 21-channel eval feature packing.
    """
    p = state.params
    attrs = G.render_attributes(p)
    normal = G.get_normal(p)
    base_color = G.get_base_color(p)
    roughness = G.get_roughness(p)
    metallic = G.get_metallic(p)
    incidents = G.get_incidents(p)
    viewdirs = tf.normalize(camera["campos"][None, :] - p.xyz)

    # Per-splat shading in CHUNKS over splats: at relighting scale the
    # [N, S, 3] incident dirs + 4-tap env gathers + dense render
    # equation peak at several GB for N=131k, S=384 — the reference
    # chunks its python render equation the same way
    # (`neilf_composite.py:104-127`).
    N = p.capacity
    CH = min(8192, N)
    nch = (N + CH - 1) // CH
    Np = nch * CH          # pad to the chunk grid, slice back after

    if visibility_precomp is None:
        visibility_precomp = jnp.ones((N, sample_num, 1), jnp.float32)

    def shade(args):
        nrm, bc, rg, mt, inc, vd, vp = args
        dirs = brdf.sample_incident_dirs(nrm, sample_num)
        el = L.direct_light(env, dirs, transform=light_transform)
        pbr, ex = brdf.rendering_equation(
            bc, rg, mt, nrm, vd, inc,
            incident_dirs=dirs,
            incident_lights_precomp=el,
            visibility_precomp=vp)
        return jnp.concatenate(
            [rg, mt, ex["mean_visibility"], pbr, nrm, bc,
             ex["mean_incident_lights"], ex["mean_local_lights"],
             ex["mean_global_lights"]], axis=-1)

    def resh(x):
        if Np != N:
            x = jnp.concatenate(
                [x, jnp.zeros((Np - N,) + x.shape[1:], x.dtype)])
        return x.reshape(nch, CH, *x.shape[1:])

    feats = jax.lax.map(shade, (
        resh(normal), resh(base_color), resh(roughness), resh(metallic),
        resh(incidents), resh(viewdirs),
        resh(visibility_precomp))).reshape(Np, -1)[:N]

    out = rasterize(
        means3d=attrs["means3d"], scales=attrs["scales"],
        rotations=attrs["rotations"], opacities=attrs["opacities"],
        alive=state.alive,
        w2c=camera["w2c"], full_proj=camera["full_proj"],
        campos=camera["campos"], focal=camera["focal"],
        tan_fov=camera["tan_fov"], bg_color=bg_color, config=config,
        sh_coeffs=attrs["sh_coeffs"], extra_features=feats,
        active_sh_degree=active_sh_degree)

    f = out.feature
    op = out.opacity[..., None]
    return {
        "render": out.color,
        "opacity": out.opacity,
        "depth": out.depth,
        "roughness": f[..., 0:1],
        "metallic": f[..., 1:2],
        "visibility": f[..., 2:3],
        "pbr": f[..., 3:6] + (1.0 - op) * bg_color,
        "normal": f[..., 6:9],
        "base_color": f[..., 9:12],
        "lights": f[..., 12:15],
        "local_lights": f[..., 15:18],
        "global_lights": f[..., 18:21],
    }
