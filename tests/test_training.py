"""Training-layer tests: optimizer schedule, train_step, PBR train step,
checkpoint round-trips, evaluation."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussian_tpu.models import densify as D
from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera
from relightable3dgaussian_tpu.training import checkpoint as ckpt
from relightable3dgaussian_tpu.training import evaluate as ev
from relightable3dgaussian_tpu.training import optimizer as opt_mod
from relightable3dgaussian_tpu.training import trainer as T
from relightable3dgaussian_tpu.training import trainer_neilf as TN

W, H = 48, 32


def make_setup(use_pbr=False, P=30, capacity=64):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
        capacity=capacity, use_pbr=use_pbr,
        init_scale=np.full(P, 0.08, np.float32))
    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                     fovx=0.9, fovy=0.7, width=W, height=H,
                     image=rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    return st, cam, cfg


def test_expon_lr_schedule_endpoints():
    s = opt_mod.expon_lr_schedule(1e-2, 1e-4, max_steps=100)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(50)), 1e-3, rtol=1e-5)


def test_train_step_improves_loss():
    st, cam, cfg = make_setup()
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = {"image": jnp.asarray(cam.image)}
    loss_cfg = R.LossConfig()
    losses = []
    for _ in range(20):
        tstate, m = T.train_step(tstate, camera, gt, jnp.zeros(3), tx,
                                 cfg, loss_cfg, 0)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # densification stats accumulated
    assert float(jnp.sum(tstate.gaussians.denom)) > 0


def test_train_driver_with_densify_and_reset():
    st, cam, cfg = make_setup()
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    tcfg = T.TrainConfig(densify_from=2, densify_until=100,
                         densification_interval=5,
                         opacity_reset_interval=12,
                         sh_warmup_interval=4, sh_degree=2)
    tstate = T.train(
        tstate, tx, [cam], tcfg, cfg, R.LossConfig(),
        D.DensifyConfig(grad_threshold=1e-9, grad_normal_threshold=1e30),
        scene_extent=1.0, num_steps=15)
    assert int(tstate.step) == 15
    assert np.isfinite(np.asarray(tstate.gaussians.params.xyz)).all()


def test_pbr_train_step_runs_and_improves():
    st, cam, cfg = make_setup(use_pbr=True)
    tstate, txs = TN.init_pbr_train_state(st, opt_mod.OptimConfig())
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = {"image": jnp.asarray(cam.image)}
    loss_cfg = R.LossConfig(lambda_pbr=1.0, lambda_light=0.01,
                            lambda_visibility=0.1, visibility_rays=256)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        key, k = jax.random.split(key)
        tstate, m = TN.pbr_train_step(
            tstate, camera, gt, jnp.zeros(3), k, txs, cfg, loss_cfg, 0,
            sample_num=8, trace_visibility=True)
        losses.append(float(m["loss"]))
    assert "loss_visibility" in m
    assert losses[-1] < losses[0]
    # env light learned something
    assert np.abs(np.asarray(tstate.env.env_shs_dc)).sum() > 0


def test_ply_checkpoint_roundtrip(tmp_path):
    st, _, _ = make_setup(use_pbr=True)
    path = str(tmp_path / "ck.ply")
    n = ckpt.save_ply(path, st)
    assert n == 30
    st2 = ckpt.load_ply(path, capacity=64)
    assert int(st2.num_alive) == 30
    m = np.asarray(st.alive)
    np.testing.assert_allclose(
        np.asarray(st2.params.xyz)[:30],
        np.asarray(st.params.xyz)[m], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st2.params.visibility_rest)[:30],
        np.asarray(st.params.visibility_rest)[m], rtol=1e-6)


def test_orbax_train_state_roundtrip(tmp_path):
    st, cam, cfg = make_setup()
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = {"image": jnp.asarray(cam.image)}
    tstate, _ = T.train_step(tstate, camera, gt, jnp.zeros(3), tx, cfg,
                             R.LossConfig(), 0)
    path = str(tmp_path / "state")
    ckpt.save_train_state(path, tstate)
    tstate2, _ = T.init_train_state(st, opt_mod.OptimConfig())
    restored = ckpt.load_train_state(path, tstate2)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored.gaussians.params.xyz),
        np.asarray(tstate.gaussians.params.xyz))


def test_evaluate_writes_metrics(tmp_path):
    st, cam, cfg = make_setup()

    def render_fn(c):
        camera = {k: jnp.asarray(v) for k, v in c.render_inputs().items()}
        return R.render_view(st.params, st.alive, camera, jnp.zeros(3),
                             cfg, compute_pseudo_normal=False)

    out = ev.evaluate(render_fn, [cam], out_dir=str(tmp_path),
                      save_images=True)
    assert "psnr" in out and "ssim" in out
    assert os.path.exists(tmp_path / "eval.txt")
    assert os.path.exists(tmp_path / "00000_pred.png")


def test_pbr_driver_loop_with_densify():
    """train_pbr driver: steps + densification interleave, PBR params
    stay finite, step counter advances."""
    st, cam, cfg = make_setup(use_pbr=True)
    alive0 = int(jnp.sum(st.alive))
    tstate, txs = TN.init_pbr_train_state(st, opt_mod.OptimConfig())
    loss_cfg = R.LossConfig(lambda_pbr=1.0, lambda_light=0.01)
    tstate = TN.train_pbr(
        tstate, txs, [cam], 8, cfg, loss_cfg,
        D.DensifyConfig(grad_threshold=1e-9, grad_normal_threshold=1e30),
        scene_extent=1.0, sample_num=4, densification_interval=4,
        densify_until=100)
    assert int(tstate.step) == 8
    # stage-2 densification actually grows capacity usage
    # (train.py --pbr_densify_until flag gates this path)
    assert int(jnp.sum(tstate.gaussians.alive)) > alive0
    p = tstate.gaussians.params
    for f in ["xyz", "base_color", "incidents_dc", "visibility_rest"]:
        assert np.isfinite(np.asarray(getattr(p, f))).all(), f


def test_train_snapshot_resume_cycle(tmp_path):
    """Elastic recovery: snapshot at step N, prune old ones, resume the
    newest with optimizer moments and step intact."""
    st, cam, cfg = make_setup()
    tstate, tx = T.init_train_state(st, opt_mod.OptimConfig())
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = {"image": jnp.asarray(cam.image)}
    tstate, _ = T.train_step(tstate, camera, gt, jnp.zeros(3), tx, cfg,
                             R.LossConfig(), 0)

    for step in (10, 20, 30):
        ckpt.save_train_snapshot(str(tmp_path), step, tstate, keep=2)
    snaps = sorted(os.listdir(tmp_path / "snapshots"))
    assert snaps == ["snap_20", "snap_30"]  # pruned to keep=2

    got = ckpt.latest_train_snapshot(str(tmp_path))
    assert got is not None and got[0] == 30
    fresh, _ = T.init_train_state(st, opt_mod.OptimConfig())
    restored = ckpt.load_train_state(got[1], fresh)
    np.testing.assert_allclose(
        np.asarray(restored.gaussians.params.xyz),
        np.asarray(tstate.gaussians.params.xyz))
    assert int(restored.step) == int(tstate.step)
    assert ckpt.latest_train_snapshot(str(tmp_path / "nope")) is None


def test_pbr_env_gamma_optimizers_skip_nonfinite():
    """A single NaN gradient must not poison the env-SH or gamma Adam
    moments (round-3 rehearsal stage-2 NaN'd at it 900 and never
    recovered because tx_env/tx_gamma were bare optax.adam)."""
    from relightable3dgaussian_tpu.models import lights as L
    import optax

    env = L.create_direct_light(3)
    gamma = L.create_gamma()
    tx_env = TN.make_env_optimizer(TN.PBROptimConfig())
    tx_gamma = TN.make_gamma_optimizer(TN.PBROptimConfig())
    env_opt = tx_env.init(env)
    gamma_opt = tx_gamma.init(gamma)

    bad_env = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), env)
    upd, env_opt2 = tx_env.update(bad_env, env_opt, env)
    env2 = optax.apply_updates(env, upd)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(env2))
    assert int(env_opt2.total_notfinite) == 1

    bad_gamma = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), gamma)
    updg, gamma_opt2 = tx_gamma.update(bad_gamma, gamma_opt, gamma)
    gamma2 = optax.apply_updates(gamma, updg)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(gamma2))

    # a subsequent finite gradient still applies
    good = jax.tree.map(lambda x: jnp.full_like(x, 1e-3), env)
    upd3, _ = tx_env.update(good, env_opt2, env2)
    moved = any(float(jnp.abs(np.asarray(l)).max()) > 0
                for l in jax.tree.leaves(upd3))
    assert moved


def test_pbr_step_finite_on_degenerate_params():
    """Gradient finiteness on the post-opacity-reset regime that NaN'd
    the round-3 stage-2 run: near-zero opacities, huge/degenerate
    scales, zero normal params, large incident SH."""
    st, cam, cfg = make_setup(use_pbr=True)
    p = st.params
    P = 30
    op = np.full((64, 1), -4.6, np.float32)          # sigmoid ≈ 0.01
    sc = np.array(p.scaling)
    sc[:8] = 4.0                                      # e^4 ≈ 55 world units
    sc[8:12] = -30.0                                  # collapsed axis
    nm = np.array(p.normal)
    nm[:16] = 0.0                                     # zero normal param
    inc = np.array(p.incidents_dc)
    inc[:10] = 50.0                                   # blown-up light SH
    st = st.replace(params=p.replace(
        opacity=jnp.asarray(op), scaling=jnp.asarray(sc),
        normal=jnp.asarray(nm), incidents_dc=jnp.asarray(inc)))

    optim_cfg = opt_mod.OptimConfig()
    state, txs = TN.init_pbr_train_state(st, optim_cfg)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    gt = {"image": jnp.asarray(cam.image),
          "mask": jnp.ones((H, W), jnp.float32)}
    loss_cfg = R.LossConfig(lambda_mask_entropy=0.1,
                            lambda_normal_render_depth=0.01)
    state2, metrics = TN.pbr_train_step(
        state, camera, gt, jnp.zeros(3), jax.random.PRNGKey(1), txs,
        cfg, loss_cfg, 3, sample_num=4)
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree.leaves(state2.gaussians.params):
        assert np.isfinite(np.asarray(leaf)).all()
    for leaf in jax.tree.leaves((state2.env, state2.gamma)):
        assert np.isfinite(np.asarray(leaf)).all()
