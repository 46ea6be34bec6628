"""NeILF PBR pipeline: shapes, channel split parity, gradients, loss set."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import lights as L
from relightable3dgaussian_tpu.models import neilf
from relightable3dgaussian_tpu.models.render import LossConfig
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

W, H = 48, 32


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    P = 40
    pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
        capacity=64, use_pbr=True,
        init_scale=np.full(P, 0.08, np.float32))
    cam = make_camera(
        uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]), fovx=0.9, fovy=0.7,
        width=W, height=H)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    env = L.create_direct_light(3)
    gamma = L.create_gamma()
    return st, camera, cfg, env, gamma


def test_training_channels(setup):
    st, camera, cfg, env, gamma = setup
    res = neilf.render_view(
        st.params, st.alive, camera, jnp.zeros(3), cfg, env_light=env,
        sample_num=8, is_training=True, rng=jax.random.PRNGKey(0))
    assert res["pbr"].shape == (H, W, 3)
    assert res["normal"].shape == (H, W, 3)
    assert res["base_color"].shape == (H, W, 3)
    assert res["roughness"].shape == (H, W, 1)
    for k in ["render", "pbr", "normal", "base_color"]:
        assert np.isfinite(np.asarray(res[k])).all(), k


def test_eval_channels(setup):
    st, camera, cfg, env, gamma = setup
    res = neilf.render_view(
        st.params, st.alive, camera, jnp.zeros(3), cfg, env_light=env,
        sample_num=8, is_training=False)
    for k in ["visibility", "lights", "local_lights", "global_lights"]:
        assert k in res
        assert np.isfinite(np.asarray(res[k])).all(), k


def test_eval_and_train_pbr_agree(setup):
    """Same model, deterministic sampling → identical pbr image from the
    11-channel and 21-channel packings."""
    st, camera, cfg, env, gamma = setup
    a = neilf.render_view(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          env_light=env, sample_num=8, is_training=True,
                          rng=None)
    b = neilf.render_view(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          env_light=env, sample_num=8, is_training=False)
    np.testing.assert_allclose(np.asarray(a["pbr"]), np.asarray(b["pbr"]),
                               atol=1e-5)


def test_gamma_applied(setup):
    st, camera, cfg, env, _ = setup
    gamma = L.GammaParams(gamma=jnp.asarray([2.0]))
    a = neilf.render_view(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          env_light=env, sample_num=8)
    b = neilf.render_view(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          env_light=env, gamma=gamma, use_ldr_image=True,
                          sample_num=8)
    expect = np.clip(np.asarray(a["pbr"]), 1e-9, 1.0) ** 2.0
    np.testing.assert_allclose(np.asarray(b["pbr"]), expect, atol=1e-6)


def test_full_loss_and_gradients(setup):
    st, camera, cfg, env, gamma = setup
    gt = {"image": jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (H, W, 3)).astype(
            np.float32)),
          # mask entropy requires a REAL mask (maskless gt now skips
          # the term instead of pushing opacity -> 1 everywhere)
          "mask": jnp.ones((H, W), jnp.float32)}
    loss_cfg = LossConfig(
        lambda_pbr=1.0, lambda_light=0.01, lambda_base_color=0.005,
        lambda_base_color_smooth=0.006, lambda_metallic_smooth=0.002,
        lambda_roughness_smooth=0.002, lambda_mask_entropy=0.1)

    def loss_fn(params, env_p, gamma_p):
        res = neilf.render(
            params, st.alive, camera, jnp.zeros(3), cfg,
            env_light=env_p, gamma=gamma_p, use_ldr_image=True,
            sample_num=8, loss_cfg=loss_cfg, gt=gt, is_training=True,
            rng=jax.random.PRNGKey(0))
        return res["loss"], res["tb_dict"]

    (loss, tb), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(st.params, env, gamma)
    assert np.isfinite(float(loss))
    for name in ["l1", "l1_pbr", "loss_light", "loss_base_color",
                 "loss_base_color_smooth", "loss_mask_entropy"]:
        assert name in tb, name
    # gradients reach every PBR attribute and the lights
    gp, ge, gg = grads
    for field in ["base_color", "roughness", "metallic", "incidents_dc",
                  "incidents_rest", "visibility_dc", "xyz", "opacity"]:
        g = np.asarray(getattr(gp, field))
        assert np.isfinite(g).all(), field
        assert np.abs(g).sum() > 0, f"zero grad for {field}"
    assert np.abs(np.asarray(ge.env_shs_dc)).sum() > 0
    assert np.abs(np.asarray(gg.gamma)).sum() > 0


def test_visibility_supervision_loss(setup):
    st, *_ = setup

    def fake_trace(rays_o, rays_d):
        return jnp.full(rays_o.shape[:1], 0.75)

    lv = neilf.visibility_supervision_loss(
        st.params, st.alive, fake_trace, jax.random.PRNGKey(0),
        num_rays=128)
    # visibility SH is zero-init → pred 0.5 everywhere → |0.5-0.75|
    np.testing.assert_allclose(float(lv), 0.25, atol=1e-6)
