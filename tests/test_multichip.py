"""Multi-chip sharding: the full sharded train step on the virtual
8-device CPU mesh (tile-sharded compositor + DP gradient pmean)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import binning, composite as comp, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.parallel import make_mesh
from relightable3dgaussian_tpu.parallel import train as ptrain
from relightable3dgaussian_tpu.scene.cameras import make_camera
from relightable3dgaussian_tpu.training import optimizer as opt_mod
from relightable3dgaussian_tpu.training import trainer as T

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

W = H = 64


def setup(P=64, capacity=128):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
        capacity=capacity, init_scale=np.full(P, 0.06, np.float32))
    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                      fovx=0.9, fovy=0.9, width=W, height=H)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    return st, camera


def test_tile_sharded_composite_matches_unsharded():
    """shard_map tile-sharded compositor == single-device compositor."""
    st, camera = setup()
    cfg_n = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                            max_per_tile=32, chunk=8)
    attrs = G.render_attributes(st.params)
    proj = projection.preprocess(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacities"], st.alive, camera["w2c"], camera["full_proj"],
        camera["campos"], W, H, camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        colors_precomp=jnp.zeros((128, 3)) + 0.5)
    bins = binning.bin_splats(proj, cfg_n.grid, 16, 32)
    feats = jnp.concatenate(
        [proj.rgb, proj.depth[:, None], jnp.ones((128, 1))], -1)

    ref = comp.composite(bins, proj.xy, proj.conic, proj.opacity, feats,
                         cfg_n.grid, chunk=8)

    from jax.sharding import PartitionSpec as P_
    mesh = make_mesh(data=1, tile=4)

    def shard_fn(idx, mask, counts, xy, conic, op, feats):
        b = binning.TileBins(idx=idx, mask=mask, counts=counts,
                             num_instances=jnp.int32(0),
                             dropped_rect=jnp.int32(0),
                             dropped_tile=jnp.int32(0))
        out = comp.composite(b, xy, conic, op, feats, cfg_n.grid, chunk=8,
                             tile_axis="tile", tile_shards=4)
        return out.image, out.final_t

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P_(),) * 7, out_specs=(P_(), P_()), check_vma=False))
    img, final_t = f(bins.idx, bins.mask, bins.counts, proj.xy, proj.conic,
                     proj.opacity, feats)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(final_t),
                               np.asarray(ref.final_t), atol=1e-6)


def test_sharded_train_step_runs_and_matches_gradients():
    st, camera = setup()
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8,
                          tile_axis="tile", tile_shards=2)
    mesh = make_mesh(data=4, tile=2)
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    step = ptrain.make_sharded_train_step(
        tx, mesh, cfg, R.LossConfig(), sh_deg=0)

    B = 4
    cameras = {k: jnp.stack([v] * B) for k, v in camera.items()}
    gt = jnp.full((B, H, W, 3), 0.5, jnp.float32)
    bg = jnp.zeros(3)

    # single-device comparison FIRST — the sharded step donates its
    # input state, which would invalidate the shared initial arrays
    cfg1 = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                           max_per_tile=32, chunk=8)
    tstate1, tx1 = T.init_train_state(st, opt_mod.OptimConfig())
    new1, m1 = T.train_step(
        tstate1, camera, {"image": gt[0]}, bg, tx1, cfg1,
        R.LossConfig(), 0)

    tstate_r = ptrain.replicate(tstate, mesh)
    cameras = ptrain.shard_batch(cameras, mesh)
    gt_s = ptrain.shard_batch(gt, mesh)

    new_state, metrics = step(tstate_r, cameras, gt_s, bg)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # DP over identical cameras == single-camera step
    np.testing.assert_allclose(float(metrics["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.xyz),
        np.asarray(new1.gaussians.params.xyz), atol=1e-5)


def test_routed_render_matches_unsharded():
    """The instance all-to-all path (point-sharded preprocess → route →
    tile-sharded compositor) reproduces the single-device image."""
    from jax.sharding import PartitionSpec as P_
    from relightable3dgaussian_tpu.parallel import render as prender

    st, camera = setup(P=64, capacity=128)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)

    ref = R.render_view(st.params, st.alive, camera, bg, cfg,
                        active_sh_degree=0, compute_pseudo_normal=False)

    mesh = make_mesh(data=1, tile=8)

    def shard_fn(params, alive, cam, bg):
        res = prender.render_point_sharded_routed(
            params, alive, cam, bg, cfg, "tile", 8, active_sh_degree=0)
        return (res["render"], res["depth"], res["final_t"],
                res["stats"]["dropped_route"], res["stats"]["dropped_tile"])

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P_(),) * 4,
        out_specs=(P_(),) * 5, check_vma=False))
    img, depth, final_t, drop_r, drop_t = f(
        st.params, st.alive, camera, bg)
    assert int(drop_r) == 0 and int(drop_t) == 0
    np.testing.assert_allclose(np.asarray(img),
                               np.asarray(ref["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth),
                               np.asarray(ref["depth"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(final_t),
                               np.asarray(ref["final_t"]), atol=1e-5)


@pytest.mark.parametrize("shard_loss", [False, True])
def test_point_sharded_tp_step_matches_single_device(shard_loss):
    """Gaussian-sharded (TP) rendering: parameter updates match the
    single-device step bit-for-nearly-bit — with the replicated
    whole-image loss AND the row-sharded partial loss (each member
    computes L1/D-SSIM on its 1/S pixel-row slice; psum reassembles)."""
    from relightable3dgaussian_tpu.parallel import render as prender

    st, camera = setup(P=64, capacity=128)
    gt = jnp.full((4, H, W, 3), 0.5, jnp.float32)
    bg = jnp.zeros(3)

    # single-device comparison first (sharded step donates its input)
    cfg1 = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                           max_per_tile=32, chunk=8)
    tstate1, tx1 = T.init_train_state(st, opt_mod.OptimConfig())
    new1, m1 = T.train_step(
        tstate1, camera, {"image": gt[0]}, bg, tx1, cfg1,
        R.LossConfig(), 0)

    mesh = make_mesh(data=2, tile=4)
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    step = prender.make_tp_train_step(tx, mesh, cfg, R.LossConfig(),
                                      sh_deg=0, shard_loss=shard_loss)
    B = 2
    cameras = {k: jnp.stack([v] * B) for k, v in camera.items()}
    tstate_r = ptrain.replicate(tstate, mesh)
    cameras_s = ptrain.shard_batch(cameras, mesh)
    gt_s = ptrain.shard_batch(gt[:B], mesh)

    new_state, metrics = step(tstate_r, cameras_s, gt_s, bg)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.xyz),
        np.asarray(new1.gaussians.params.xyz), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.shs_dc),
        np.asarray(new1.gaussians.params.shs_dc), atol=2e-5)


def test_tile_sharded_stream_matches_unsharded():
    """Stream compositor under tile sharding (backend=pallas, interpret
    mode): each member windows its contiguous slice of the sorted
    instance stream.  Image AND parameter gradients must match the
    single-device jnp render; a calibrated stream_cap_local must be
    lossless (dropped_stream_shard == 0)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P_

    st, camera = setup()
    bg = jnp.zeros(3)
    cfg1 = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                           max_per_tile=32, chunk=8)
    ref = R.render_view(st.params, st.alive, camera, bg, cfg1,
                        active_sh_degree=0, compute_pseudo_normal=False)

    def loss1(params):
        res = R.render_view(params, st.alive, camera, bg, cfg1,
                            active_sh_degree=0,
                            compute_pseudo_normal=False)
        return jnp.sum(res["render"] ** 2) + jnp.sum(res["depth"] ** 2)
    g_ref = jax.grad(loss1)(st.params)

    S = 4
    # deliberately tight local window: max member segment, not cap
    gxy = cfg1.grid
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8, backend="pallas",
                          tile_axis="tile", tile_shards=S,
                          stream_cap_local=((gxy[0] * gxy[1]) // S) * 32)
    mesh = make_mesh(data=1, tile=S)

    def shard_fn(params, alive, cam, bg):
        def loss(p):
            res = R.render_view(p, alive, cam, bg, cfg,
                                active_sh_degree=0,
                                compute_pseudo_normal=False)
            l = jnp.sum(res["render"] ** 2) + jnp.sum(res["depth"] ** 2)
            return l, res
        (l, res), g = jax.value_and_grad(loss, has_aux=True)(params)
        g = jax.tree.map(lambda x: jax.lax.pmean(x, "tile"), g)
        return (res["render"], res["final_t"],
                res["stats"]["dropped_stream_shard"], g)

    with pltpu.force_tpu_interpret_mode():
        f = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(P_(),) * 4,
            out_specs=(P_(),) * 4, check_vma=False))
        img, final_t, drop, g = f(st.params, st.alive, camera, bg)
    assert int(drop) == 0
    np.testing.assert_allclose(np.asarray(img),
                               np.asarray(ref["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final_t),
                               np.asarray(ref["final_t"]), atol=1e-5)
    for name in ["xyz", "opacity", "shs_dc", "scaling", "rotation"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g, name)),
            np.asarray(getattr(g_ref, name)), atol=5e-4, rtol=5e-4,
            err_msg=name)


def test_tile_sharded_stream_local_overflow_counted():
    """A too-small stream_cap_local drops whole tiles (rendered empty)
    and the overflow is counted, never silent."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P_

    st, camera = setup()
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8, backend="pallas",
                          tile_axis="tile", tile_shards=4,
                          stream_cap_local=8)
    mesh = make_mesh(data=1, tile=4)

    def shard_fn(params, alive, cam, bg):
        res = R.render_view(params, alive, cam, bg, cfg,
                            active_sh_degree=0,
                            compute_pseudo_normal=False)
        return res["render"], res["stats"]["dropped_stream_shard"]

    from jax.sharding import PartitionSpec
    with pltpu.force_tpu_interpret_mode():
        f = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(PartitionSpec(),) * 4,
            out_specs=(PartitionSpec(),) * 2, check_vma=False))
        img, drop = f(st.params, st.alive, camera, bg)
    assert int(drop) > 0
    assert np.all(np.isfinite(np.asarray(img)))


def test_routed_stream_matches_unsharded():
    """Routed TP path with the stream compositor (backend=pallas,
    interpret mode): route's merged receive stream feeds the window-DMA
    kernels directly; image and gradients match single-device."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P_
    from relightable3dgaussian_tpu.parallel import render as prender

    st, camera = setup(P=64, capacity=128)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)

    ref = R.render_view(st.params, st.alive, camera, bg, cfg,
                        active_sh_degree=0, compute_pseudo_normal=False)

    def loss1(params):
        res = R.render_view(params, st.alive, camera, bg, cfg,
                            active_sh_degree=0,
                            compute_pseudo_normal=False)
        return jnp.sum(res["render"] ** 2)
    g_ref = jax.grad(loss1)(st.params)

    # 4 members, not 8: interpret-mode pallas io_callbacks deadlock
    # with 8 concurrent devices (buffer-allocate lock starvation)
    mesh = make_mesh(data=1, tile=4)

    def shard_fn(params, alive, cam, bg):
        def loss(p):
            res = prender.render_point_sharded_routed(
                p, alive, cam, bg, cfg, "tile", 4, active_sh_degree=0,
                backend="pallas")
            return jnp.sum(res["render"] ** 2), res
        (l, res), g = jax.value_and_grad(loss, has_aux=True)(params)
        # each member's grad rows are its own slice but carry an S×
        # factor from the replicated loss on the gathered image
        # (all_gather transpose) — MEAN reassembles the exact gradient
        g = jax.tree.map(lambda x: jax.lax.pmean(x, "tile"), g)
        return (res["render"], res["stats"]["dropped_route"],
                res["stats"]["dropped_tile"], g)

    with pltpu.force_tpu_interpret_mode():
        f = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(P_(),) * 4,
            out_specs=(P_(),) * 4, check_vma=False))
        img, drop_r, drop_t, g = f(st.params, st.alive, camera, bg)
    assert int(drop_r) == 0 and int(drop_t) == 0
    np.testing.assert_allclose(np.asarray(img),
                               np.asarray(ref["render"]), atol=1e-5)
    for name in ["xyz", "opacity", "shs_dc"]:
        np.testing.assert_allclose(
            np.asarray(getattr(g, name)),
            np.asarray(getattr(g_ref, name)), atol=5e-4, rtol=5e-4,
            err_msg=name)


def test_bucketed_dp_step_matches_single_camera():
    """B > data (multiple cameras per member) takes the bucketed-DP
    branch (per-camera backward + immediate per-bucket pmean); with
    identical cameras the update must equal the single-camera step."""
    st, camera = setup()
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    gt = jnp.full((8, H, W, 3), 0.5, jnp.float32)
    bg = jnp.zeros(3)

    tstate1, tx1 = T.init_train_state(st, opt_mod.OptimConfig())
    new1, m1 = T.train_step(
        tstate1, camera, {"image": gt[0]}, bg, tx1, cfg,
        R.LossConfig(), 0)

    mesh = make_mesh(data=4, tile=1)
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    step = ptrain.make_sharded_train_step(
        tx, mesh, cfg, R.LossConfig(), sh_deg=0)
    cameras = {k: jnp.stack([v] * 8) for k, v in camera.items()}
    new_state, metrics = step(
        ptrain.replicate(tstate, mesh),
        ptrain.shard_batch(cameras, mesh),
        ptrain.shard_batch(gt, mesh), bg)
    np.testing.assert_allclose(float(metrics["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.xyz),
        np.asarray(new1.gaussians.params.xyz), atol=2e-5)


def test_tp_pbr_step_matches_single_device():
    """TP x PBR (VERDICT r3 weak #7): the 11-channel NeILF feature set
    through the routed point->tile path; splat + env-SH + gamma updates
    match the single-device PBR step."""
    import optax
    from relightable3dgaussian_tpu.models import neilf as NF
    from relightable3dgaussian_tpu.parallel import render as prender
    from relightable3dgaussian_tpu.training import trainer_neilf as TN

    rng = np.random.default_rng(1)
    Pn = 64
    pts = rng.uniform(-0.5, 0.5, (Pn, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, rng.uniform(0, 1, (Pn, 3)).astype(np.float32),
        capacity=128, use_pbr=True,
        init_scale=np.full(Pn, 0.06, np.float32))
    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                      fovx=0.9, fovy=0.9, width=W, height=H)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = jnp.full((H, W, 3), 0.4, jnp.float32)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    loss_cfg = R.LossConfig()
    S = 4

    state, txs = TN.init_pbr_train_state(st, opt_mod.OptimConfig())
    tx, tx_env, tx_gamma = txs

    # ---- single-device reference step (deterministic spiral) ----
    def loss_fn(p, env, gamma):
        res = NF.render(p, st.alive, camera, bg, cfg, env_light=env,
                        gamma=gamma, sample_num=S, loss_cfg=loss_cfg,
                        gt={"image": gt}, active_sh_degree=0,
                        is_training=True, rng=None)
        return res["loss"]

    loss1, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        st.params, state.env, state.gamma)
    g_p, g_e, g_g = grads
    g_p = jax.tree.map(
        lambda g: jnp.where(
            st.alive.reshape((-1,) + (1,) * (g.ndim - 1)), g, 0.0), g_p)
    upd, _ = tx.update(g_p, state.opt_state, st.params)
    ref_params = optax.apply_updates(st.params, upd)
    upd_e, _ = tx_env.update(g_e, state.env_opt, state.env)
    ref_env = optax.apply_updates(state.env, upd_e)

    # ---- TP step on the data x tile mesh ----
    mesh = make_mesh(data=2, tile=4)
    step = prender.make_tp_pbr_train_step(
        txs, mesh, cfg, loss_cfg, sh_deg=0, sample_num=S,
        randomize=False)
    B = 2
    cameras = {k: jnp.stack([v] * B) for k, v in camera.items()}
    state_r = ptrain.replicate(state, mesh)
    cameras_s = ptrain.shard_batch(cameras, mesh)
    gt_s = ptrain.shard_batch(jnp.stack([gt] * B), mesh)

    new_state, metrics = step(state_r, cameras_s, gt_s, bg,
                              jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), float(loss1),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.base_color),
        np.asarray(ref_params.base_color), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.incidents_dc),
        np.asarray(ref_params.incidents_dc), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.gaussians.params.xyz),
        np.asarray(ref_params.xyz), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.env.env_shs_dc),
        np.asarray(ref_env.env_shs_dc), atol=2e-5)
