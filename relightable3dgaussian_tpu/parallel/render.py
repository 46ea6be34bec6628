"""Gaussian-sharded rendering — the renderer's tensor-parallel analogue.

SURVEY.md §2.7: shard the P splats across mesh members; each member runs
the per-splat pipeline (activation, SH color, EWA projection, feature
packing) for its slice only, then the projected splats are re-sharded to
tile owners — here one `all_gather` over the mesh axis (the
"shard-by-point → re-sort → shard-by-tile" all-to-all, with the gather
standing in while splat lists are small enough to replicate
post-projection).  The compositor then runs tile-sharded over the same
axis, so per-splat FLOPs AND per-pixel FLOPs both scale with the mesh.

Gradients: every parameter-consuming path is shard-local before the
gather, so the all_gather transpose (reduce-scatter) delivers exact
per-slice cotangents; a `psum` over the axis reassembles full parameter
gradients (each member's contribution has disjoint nonzero rows).
Tested bit-exact against the single-device step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import gaussians as G
from ..models import render as R
from ..ops import binning, projection
from ..ops import composite as comp
from ..ops.rasterize import RasterizeConfig
from ..training.trainer import TrainState


def render_point_sharded(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    cfg: RasterizeConfig,
    axis: str,
    nshards: int,
    active_sh_degree: int = 3,
):
    """Base-3DGS forward with point-sharded preprocess + tile-sharded
    compositing (call inside shard_map over `axis`).

    Returns a results dict like `models.render.render_view`
    (compute_pseudo_normal excluded).
    """
    N = params.capacity
    assert N % nshards == 0, (N, nshards)
    Pl = N // nshards
    my = jax.lax.axis_index(axis)

    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, my * Pl, Pl, axis=0)

    p_sl = jax.tree.map(sl, params)
    alive_sl = sl(alive)

    proj_sl = projection.preprocess(
        p_sl.xyz, G.get_scaling(p_sl), G.get_rotation(p_sl),
        G.get_opacity(p_sl), alive_sl,
        camera["w2c"], camera["full_proj"], camera["campos"],
        cfg.width, cfg.height,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        sh_coeffs=G.get_shs(p_sl), active_sh_degree=active_sh_degree,
        scale_modifier=cfg.scale_modifier, znear=cfg.znear)
    feats_sl = jnp.concatenate(
        [proj_sl.rgb, proj_sl.depth[:, None],
         jnp.ones_like(proj_sl.depth)[:, None], G.get_normal(p_sl)], -1)

    # the point→tile re-shard: gather projected splats to every member
    gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    proj = jax.tree.map(gather, proj_sl)
    feats = gather(feats_sl)

    bins = binning.bin_splats(
        proj, cfg.grid, cfg.max_tiles_per_gaussian, cfg.max_per_tile)
    bins = jax.tree.map(jax.lax.stop_gradient, bins)

    out = comp.composite(
        bins, proj.xy, proj.conic, proj.opacity, feats, cfg.grid,
        chunk=cfg.chunk, tile_axis=axis, tile_shards=nshards)

    img = out.image[: cfg.height, : cfg.width]
    final_t = out.final_t[: cfg.height, : cfg.width]
    return {
        "render": img[..., 0:3] + final_t[..., None] * bg_color,
        "depth": img[..., 3],
        "opacity": img[..., 4],
        "normal": img[..., 5:8],
        "final_t": final_t,
        "radii": gather(proj_sl.radius),
        "visibility_filter": gather(proj_sl.radius) > 0,
    }


def render_point_sharded_routed(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    cfg: RasterizeConfig,
    axis: str,
    nshards: int,
    active_sh_degree: int = 3,
    route_cap: int | None = None,
    backend: str = "auto",
    features_fn=None,
):
    """Fully sharded forward: point-sharded preprocess → instance
    all-to-all (`parallel.route`) → tile-sharded compositing, with no
    full-P replication anywhere (call inside shard_map over `axis`).

    Per-member memory: P/S parameters + the route buffers
    (S × route_cap rows) + T/S dense tile lists — all shrink with the
    mesh, unlike the all_gather stand-in `render_point_sharded`.

    features_fn: optional `(params_slice, alive_slice, camera) ->
    (feats [P/S, Se], aux dict)` computing the blended feature channels
    OWNER-SIDE on the member's parameter slice (the TP idiom: per-splat
    shading — e.g. the NeILF render equation — costs P/S per member and
    only the shaded channels ride the all-to-all).  Default packs the
    slice normals (base 3DGS).  aux entries stay [P/S, ...]-sliced; the
    caller decides which to all_gather/psum.  The returned dict carries
    the raw blended channels under "feature" ([H, W, Se]) next to the
    base-path "normal" split.
    """
    import jax as _jax
    from ..ops import composite_pallas as cpal
    from . import route as route_mod

    N = params.capacity
    assert N % nshards == 0, (N, nshards)
    Pl = N // nshards
    my = jax.lax.axis_index(axis)

    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, my * Pl, Pl, axis=0)

    p_sl = jax.tree.map(sl, params)
    alive_sl = sl(alive)

    proj_sl = projection.preprocess(
        p_sl.xyz, G.get_scaling(p_sl), G.get_rotation(p_sl),
        G.get_opacity(p_sl), alive_sl,
        camera["w2c"], camera["full_proj"], camera["campos"],
        cfg.width, cfg.height,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        sh_coeffs=G.get_shs(p_sl), active_sh_degree=active_sh_degree,
        scale_modifier=cfg.scale_modifier, znear=cfg.znear)
    if features_fn is None:
        extra_sl, feat_aux = G.get_normal(p_sl), {}
    else:
        extra_sl, feat_aux = features_fn(p_sl, alive_sl, camera)
    Se = extra_sl.shape[-1]
    feats_sl = jnp.concatenate(
        [proj_sl.rgb, proj_sl.depth[:, None],
         jnp.ones_like(proj_sl.depth)[:, None], extra_sl], -1)
    payload_sl = jnp.concatenate(
        [proj_sl.xy, proj_sl.conic, proj_sl.opacity[:, None], feats_sl],
        axis=-1)

    if route_cap is None:
        # default: 2x a balanced share of the worst-case local expansion
        route_cap = max(
            2 * Pl * cfg.max_tiles_per_gaussian // nshards, 4096)

    if backend == "auto":
        backend = "pallas" if _jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        # stream mode: the route's merged receive stream feeds the
        # window-DMA kernels directly — no dense [Tl, K, D] gather, and
        # the rows cotangent returns through the reverse all-to-all
        routed = route_mod.route_instances(
            proj_sl, payload_sl, cfg.grid, axis, nshards,
            cfg.max_tiles_per_gaussian, cfg.max_per_tile, route_cap,
            stream=True)
        img, final_t, last = cpal.composite_pallas_stream_rows(
            routed.rows, routed.starts, routed.counts, routed.tile_ids,
            cfg.grid, chunk=cfg.chunk, max_per_tile=cfg.max_per_tile,
            track_contrib=cfg.track_contrib)
    else:
        routed = route_mod.route_instances(
            proj_sl, payload_sl, cfg.grid, axis, nshards,
            cfg.max_tiles_per_gaussian, cfg.max_per_tile, route_cap)
        img, final_t, last = comp.composite_from_data(
            routed.data, routed.counts, routed.tile_ids, cfg.grid,
            chunk=cfg.chunk)

    # assemble the full image (loss consumes it replicated, as in the
    # all_gather variant; a sharded loss can keep shards instead)
    gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    gx, gy = cfg.grid
    T = gx * gy
    img = cpal.untile_rows(gather(img)[:T], cfg.grid)
    final_t = cpal.untile_rows(gather(final_t)[:T], cfg.grid)

    img = img[: cfg.height, : cfg.width]
    final_t = final_t[: cfg.height, : cfg.width]
    radii = gather(proj_sl.radius)
    return {
        "render": img[..., 0:3] + final_t[..., None] * bg_color,
        "depth": img[..., 3],
        "opacity": img[..., 4],
        "normal": img[..., 5:8],
        "feature": img[..., 5:5 + Se],
        "feature_aux": feat_aux,
        "final_t": final_t,
        "radii": radii,
        "visibility_filter": radii > 0,
        "stats": {
            "dropped_rect": jax.lax.psum(routed.dropped_rect, axis),
            "dropped_route": jax.lax.psum(routed.dropped_route, axis),
            "dropped_tile": jax.lax.psum(routed.dropped_tile, axis),
            "num_instances": jax.lax.psum(routed.num_instances, axis),
        },
    }


def make_tp_train_step(
    tx: optax.GradientTransformation,
    mesh: Mesh,
    cfg: RasterizeConfig,
    loss_cfg: R.LossConfig,
    sh_deg: int = 3,
    reshard: str = "route",
    shard_loss: bool = True,
):
    """Training step with data-parallel cameras x Gaussian/tile-sharded
    rendering.  Parameter gradients: psum over the model axis (disjoint
    slices), pmean over data.

    reshard: "route" = instance all-to-all (memory/bandwidth scale with
    the mesh); "gather" = all_gather replication (round-1 stand-in, kept
    as oracle).

    shard_loss: each member evaluates L1/D-SSIM only on its 1/S slice of
    pixel rows (row-partial sums, `ops.losses.*_rows_sum`) and the
    partials psum to the exact global loss — per-member pixel-loss FLOPs
    shrink with the mesh instead of every member re-computing the
    whole-image loss on the gathered render.  Falls back to the
    replicated loss when loss terms beyond L1/D-SSIM are enabled (the
    row-partial decomposition covers only the pixel-mean terms)."""
    import math

    from ..ops import losses as L

    ndata = mesh.shape["data"]
    ntile = mesh.shape["tile"]
    use_sharded_loss = shard_loss and all(
        getattr(loss_cfg, f) == 0 for f in (
            "lambda_mask_entropy", "lambda_normal_render_depth",
            "lambda_depth", "lambda_normal_mvs_depth"))
    rows = math.ceil(cfg.height / ntile)
    Hp = rows * ntile
    denom = cfg.height * cfg.width * 3
    lam = loss_cfg.lambda_dssim

    def shard_fn(state: TrainState, cameras, gt_images, bg):
        gs = state.gaussians
        my = jax.lax.axis_index("tile")
        r0 = my * rows

        def local_loss(p):
            def one(cam_gt):
                cam, gt = cam_gt
                if reshard == "route":
                    res = render_point_sharded_routed(
                        p, gs.alive, cam, bg, cfg, "tile", ntile,
                        active_sh_degree=sh_deg)
                else:
                    res = render_point_sharded(
                        p, gs.alive, cam, bg, cfg, "tile", ntile,
                        active_sh_degree=sh_deg)
                if use_sharded_loss:
                    img = res["render"]
                    img_p = L.pad_rows(img, Hp)
                    gt_p = L.pad_rows(gt, Hp)
                    l1s = L.l1_rows_sum(img_p, gt_p, r0, rows)
                    ssims = L.ssim_rows_sum(img, gt, r0, rows, Hp)
                    sqs = L.sq_err_rows_sum(img_p, gt_p, r0, rows)
                    # psum(partial) = (1-λ)·L1 + λ·(1 − SSIM)
                    partial = ((1.0 - lam) * l1s / denom
                               + lam * (1.0 / ntile - ssims / denom))
                    return partial, {"sq_sum": sqs}
                loss, tb = R.calculate_loss(res, {"image": gt}, loss_cfg)
                return loss, tb
            losses_, tbs = jax.lax.map(one, (cameras, gt_images))
            if use_sharded_loss:
                # keep PER-CAMERA partial sq-sums: the PSNR below must
                # be the mean of per-camera PSNRs (same definition as
                # the replicated path), not the PSNR of the batch-mean
                # MSE.
                return jnp.mean(losses_), {"sq_sum": tbs["sq_sum"]}
            return jnp.mean(losses_), jax.tree.map(jnp.mean, tbs)

        (loss, tb), grads = jax.value_and_grad(
            local_loss, has_aux=True)(gs.params)
        if use_sharded_loss:
            # row-partial loss: cotangents over the model axis are
            # disjoint partials, so grads SUM over "tile"
            grads = jax.tree.map(
                lambda g: jax.lax.pmean(jax.lax.psum(g, "tile"), "data"),
                grads)
            loss = jax.lax.pmean(jax.lax.psum(loss, "tile"), "data")
            # per-camera MSE (row partials psum'd over tile), then mean
            # of per-camera PSNRs — matching the replicated path's
            # metric definition so curves are comparable across modes
            mse_pc = jax.lax.psum(tb["sq_sum"], "tile") / denom   # [B]
            psnr_pc = -10.0 * jnp.log10(jnp.maximum(mse_pc, 1e-12))
            tb = {"psnr": jnp.mean(psnr_pc)}
        else:
            # Each member's grad rows cover only its own P/S slice, but
            # the replicated loss on the gathered image scales every
            # cotangent by S (all_gather transpose = psum_scatter of S
            # identical cotangents), so the MEAN over the model axis
            # reassembles the exact full gradient; then the batch mean
            # over data.
            grads = jax.tree.map(
                lambda g: jax.lax.pmean(
                    jax.lax.pmean(g, "tile"), "data"),
                grads)
            loss = jax.lax.pmean(loss, "data")

        alive_b = gs.alive
        grads = jax.tree.map(
            lambda g: jnp.where(
                alive_b.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
            grads)
        updates, new_opt = tx.update(grads, state.opt_state, gs.params)
        new_params = optax.apply_updates(gs.params, updates)
        new_state = TrainState(
            gaussians=gs.replace(params=new_params),
            opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "psnr": jax.lax.pmean(
            tb["psnr"], "data")}

    rep = P()
    batch = P("data")
    cam_specs = dict(w2c=batch, full_proj=batch, campos=batch,
                     focal=batch, tan_fov=batch)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, cam_specs, batch, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))

def pbr_features_fn(
    env,
    sample_num: int = 24,
    rng: jax.Array | None = None,
    axis: str | None = None,
):
    """Owner-side NeILF shading for `render_point_sharded_routed`.

    Evaluates the render equation (ops.brdf) on the member's P/S
    parameter slice and packs the 11-channel training feature set
    (roughness, metallic, pbr color, normal, base color — the layout of
    `models/neilf.py::render_view` is_training=True, reference
    `neilf.py:113-120`).  The per-splat BRDF cost scales with the mesh;
    only the 11 shaded channels ride the instance all-to-all.

    rng: azimuth randomization; folded with the member index (each slice
    draws independent sample azimuths).  None = deterministic spiral
    (used by the update-exactness test).
    """
    from ..models import lights as L_
    from ..ops import brdf
    from ..ops import transforms as tf

    def fn(p_sl, alive_sl, camera):
        normal = G.get_normal(p_sl)
        base_color = G.get_base_color(p_sl)
        roughness = G.get_roughness(p_sl)
        metallic = G.get_metallic(p_sl)
        incidents = G.get_incidents(p_sl)
        visibility = G.get_visibility(p_sl)
        viewdirs = tf.normalize(camera["campos"][None, :] - p_sl.xyz)
        k = rng
        if k is not None and axis is not None:
            k = jax.random.fold_in(k, jax.lax.axis_index(axis))
        pbr_color, extras = brdf.rendering_equation(
            base_color, roughness, metallic,
            jax.lax.stop_gradient(normal), viewdirs, incidents,
            direct_shs=None if env is None else env.env_shs,
            visibility_shs=visibility, sample_num=sample_num, rng=k)
        feats = jnp.concatenate(
            [roughness, metallic, pbr_color, normal, base_color], -1)
        return feats, {"diffuse_light": extras["diffuse_light"]}
    return fn


def render_tp_pbr(
    params: G.GaussianParams,
    alive: jnp.ndarray,
    camera: dict[str, jnp.ndarray],
    bg_color: jnp.ndarray,
    cfg: RasterizeConfig,
    axis: str,
    nshards: int,
    env=None,
    gamma=None,
    use_ldr_image: bool = False,
    sample_num: int = 24,
    rng: jax.Array | None = None,
    active_sh_degree: int = 3,
    route_cap: int | None = None,
    backend: str = "auto",
):
    """TP x PBR: the full 11-channel NeILF training render through the
    point-sharded routed path (VERDICT r3 weak #7).  Returns the same
    results-dict schema as `models/neilf.py::render_view`
    (is_training=True), so `neilf.calculate_loss` consumes it directly.
    Call inside shard_map over `axis`."""
    from ..models import lights as L_

    res = render_point_sharded_routed(
        params, alive, camera, bg_color, cfg, axis, nshards,
        active_sh_degree=active_sh_degree, route_cap=route_cap,
        backend=backend,
        features_fn=pbr_features_fn(env, sample_num, rng, axis))
    f = res["feature"]
    res["roughness"] = f[..., 0:1]
    res["metallic"] = f[..., 1:2]
    pbr_img = f[..., 2:5]
    res["normal"] = f[..., 5:8]
    res["base_color"] = f[..., 8:11]
    pbr_img = pbr_img + (1.0 - res["opacity"][..., None]) * bg_color
    if gamma is not None:
        pbr_img = L_.apply_gamma(gamma, pbr_img, use_ldr_image)
    res["pbr"] = pbr_img
    # per-splat diffuse light for the white-balance loss: slices are
    # disjoint rows, one gather reassembles [P, 3]
    res["diffuse_light"] = jax.lax.all_gather(
        res["feature_aux"]["diffuse_light"], axis, axis=0, tiled=True)
    return res


def make_tp_pbr_train_step(
    txs: tuple,
    mesh: Mesh,
    cfg: RasterizeConfig,
    loss_cfg,
    sh_deg: int = 3,
    sample_num: int = 8,
    use_ldr_image: bool = False,
    randomize: bool = True,
):
    """PBR training step over a data x tile mesh with the render
    equation and rasterization point/tile-sharded (TP).  Splat, env-SH
    and gamma parameters update exactly as the single-device
    `pbr_train_step` (pinned by tests/test_multichip.py).

    randomize=False pins the BRDF azimuths to the deterministic spiral
    (the update-exactness test's configuration — per-slice rng folds
    can't match the single-device draw).
    """
    from ..models import neilf as NF
    from ..training.trainer_neilf import PBRTrainState

    tx, tx_env, tx_gamma = txs
    ntile = mesh.shape["tile"]

    def shard_fn(state: PBRTrainState, cameras, gt_images, bg, rng):
        gs = state.gaussians

        def local_loss(p, env, gamma):
            def one(cam_gt):
                cam, gt = cam_gt
                res = render_tp_pbr(
                    p, gs.alive, cam, bg, cfg, "tile", ntile,
                    env=env, gamma=gamma, use_ldr_image=use_ldr_image,
                    sample_num=sample_num,
                    rng=rng if randomize else None,
                    active_sh_degree=sh_deg)
                loss, tb = NF.calculate_loss(res, {"image": gt}, loss_cfg)
                return loss, {"psnr": tb["psnr"]}
            losses_, tbs = jax.lax.map(one, (cameras, gt_images))
            return jnp.mean(losses_), jax.tree.map(jnp.mean, tbs)

        (loss, tb), grads = jax.value_and_grad(
            local_loss, has_aux=True, argnums=(0, 1, 2))(
            gs.params, state.env, state.gamma)
        g_params, g_env, g_gamma = grads
        # param rows: disjoint slices -> replicated-loss cotangents are
        # S-fold scaled (all_gather transpose), mean over tile exact
        g_params = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.pmean(g, "tile"), "data"),
            g_params)
        # env/gamma feed every member's loss replicated -> mean over both
        g_env, g_gamma = jax.tree.map(
            lambda g: jax.lax.pmean(jax.lax.pmean(g, "tile"), "data"),
            (g_env, g_gamma))
        loss = jax.lax.pmean(loss, "data")

        alive_b = gs.alive
        g_params = jax.tree.map(
            lambda g: jnp.where(
                alive_b.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0),
            g_params)
        upd, new_opt = tx.update(g_params, state.opt_state, gs.params)
        new_params = optax.apply_updates(gs.params, upd)
        upd_e, env_opt = tx_env.update(g_env, state.env_opt, state.env)
        new_env = optax.apply_updates(state.env, upd_e)
        upd_g, gamma_opt = tx_gamma.update(g_gamma, state.gamma_opt)
        new_gamma = optax.apply_updates(state.gamma, upd_g)
        new_state = PBRTrainState(
            gaussians=gs.replace(params=new_params), opt_state=new_opt,
            env=new_env, env_opt=env_opt,
            gamma=new_gamma, gamma_opt=gamma_opt,
            step=state.step + 1)
        return new_state, {"loss": loss, "psnr": jax.lax.pmean(
            tb["psnr"], "data")}

    rep = P()
    batch = P("data")
    cam_specs = dict(w2c=batch, full_proj=batch, campos=batch,
                     focal=batch, tan_fov=batch)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, cam_specs, batch, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))
