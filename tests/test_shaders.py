"""Shader-GS stages: texture sampling, masked dispatch, post passes,
and the full shader pipeline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import shaders as S
from relightable3dgaussian_tpu.models import shadergs
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

W, H = 48, 32


def test_sample_texture_bilinear_and_wrap():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # texel centers
    v = S.sample_texture(tex, jnp.asarray([0.125]), jnp.asarray([0.125]))
    np.testing.assert_allclose(np.asarray(v), [[0.0]], atol=1e-6)
    # midpoint between texels 0 and 1
    v = S.sample_texture(tex, jnp.asarray([0.25]), jnp.asarray([0.125]))
    np.testing.assert_allclose(np.asarray(v), [[0.5]], atol=1e-6)
    # wrap: u=1.125 == u=0.125
    a = S.sample_texture(tex, jnp.asarray([1.125]), jnp.asarray([0.375]))
    b = S.sample_texture(tex, jnp.asarray([0.125]), jnp.asarray([0.375]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rgb_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    back = np.asarray(S.hsv_to_rgb(S.rgb_to_hsv(jnp.asarray(rgb))))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_sh_shader_masked_dispatch():
    N = 16
    rng = np.random.default_rng(0)
    io = {
        "position": jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)),
        "scale": jnp.full((N, 3), 0.1),
        "rotation": jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1)),
        "opacity": jnp.full((N,), 0.7),
        "normal": jnp.tile(jnp.asarray([0.0, 0, 1]), (N, 1)),
        "sh": jnp.zeros((N, 16, 3)),
    }
    keys = list(S.SH_SHADERS)
    ids = np.zeros(N, np.int32)
    ids[:8] = keys.index("cullHalf")
    out = S.run_sh_shaders(jnp.asarray(ids), io, {"time": 0.0, "dt": 0.0})
    pos = np.asarray(io["position"])
    op = np.asarray(out["opacity"])
    # cullHalf zeroes opacity only for x<0 among the first 8
    for i in range(N):
        if i < 8 and pos[i, 0] < 0:
            assert op[i] == 0.0
        else:
            assert op[i] == pytest.approx(0.7)


def test_splat_wireframe_grazing_vs_facing():
    inp = {
        "position": jnp.asarray([[0.0, 0, 0], [0.0, 0, 0]]),
        "normal": jnp.asarray([[0.0, 0, 1], [1.0, 0, 0]]),
        "color_sh": jnp.ones((2, 3)) * 0.5,
        "color_base": jnp.ones((2, 3)) * 0.5,
        "camera_pos": jnp.asarray([0.0, 0, 5.0]),
        "splat_depth": jnp.ones(2),
        "depth_sample": jnp.ones(2),
        "stencil_sample": jnp.zeros(2),
    }
    io = {"opacity": jnp.ones(2), "stencil_val": jnp.zeros(2),
          "stencil_opacity": jnp.ones(2)}
    out = S.splat_wireframe({}, inp, io)
    c = np.asarray(out["out_color"])
    assert c[0, 0] < 0.05   # facing → dark
    assert c[1, 0] > 0.95   # grazing → bright (wireframe edge)


def test_post_invert_and_quantize():
    imgs = {
        "shader_color": jnp.full((8, 8, 3), 0.25),
        "base_color": jnp.full((8, 8, 3), 0.25),
        "depth": jnp.zeros((8, 8)),
        "stencil": jnp.zeros((8, 8)),
        "incident_light": jnp.full((8, 8, 3), 0.3),
        "pseudo_normal": jnp.zeros((8, 8, 3)),
        "metallic": jnp.zeros((8, 8)),
    }
    out = S.run_post_process(["invert"], imgs, {})
    np.testing.assert_allclose(np.asarray(out["shader_color"]), 0.75)
    out = S.run_post_process(["quantizeLighting"], imgs, {})
    np.testing.assert_allclose(np.asarray(out["incident_light"]), 0.25)


def test_post_outline_rings_stencil():
    imgs = {
        "shader_color": jnp.zeros((32, 32, 3)),
        "base_color": jnp.zeros((32, 32, 3)),
        "depth": jnp.zeros((32, 32)),
        "stencil": jnp.zeros((32, 32)).at[12:20, 12:20].set(1.0),
        "incident_light": jnp.zeros((32, 32, 3)),
        "pseudo_normal": jnp.zeros((32, 32, 3)),
        "metallic": jnp.zeros((32, 32)),
    }
    out = S.post_outline({}, imgs)
    c = np.asarray(out["shader_color"])
    assert c[11, 16, 0] == 1.0    # just outside stencil → red outline
    assert c[16, 16, 0] == 0.0    # inside stencil → untouched


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    P = 40
    pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
    st = G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32), capacity=64,
        init_scale=np.full(P, 0.08, np.float32))
    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                      fovx=0.9, fovy=0.7, width=W, height=H)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    return st, camera, cfg


def test_shadergs_default_matches_plain_render(scene):
    st, camera, cfg = scene
    res = shadergs.render(st.params, st.alive, camera, jnp.zeros(3), cfg)
    from relightable3dgaussian_tpu.models import render as R
    plain = R.render_view(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          compute_pseudo_normal=False)
    np.testing.assert_allclose(np.asarray(res["render"]),
                               np.asarray(plain["render"]), atol=1e-5)
    # default shader color == SH color
    np.testing.assert_allclose(np.asarray(res["shader"]),
                               np.asarray(res["render"]), atol=1e-5)


def test_shadergs_wireframe_changes_shader_channel(scene):
    st, camera, cfg = scene
    keys = list(S.SPLAT_SHADERS)
    ids = jnp.full(64, keys.index("wireframe"), jnp.int32)
    res = shadergs.render(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          splat_shader_ids=ids)
    # render channel untouched, shader channel differs
    assert not np.allclose(np.asarray(res["shader"]),
                           np.asarray(res["render"]), atol=1e-3)


def test_shadergs_stencil_written_and_post_pass(scene):
    st, camera, cfg = scene
    keys = list(S.SPLAT_SHADERS)
    ids = jnp.full(64, keys.index("writeToStencil"), jnp.int32)
    res = shadergs.render(st.params, st.alive, camera, jnp.zeros(3), cfg,
                          splat_shader_ids=ids, post_passes=["invert"])
    # stencil_val=1 blended with the splat alphas == the opacity image
    np.testing.assert_allclose(np.asarray(res["stencil"]),
                               np.asarray(res["opacity"]), atol=1e-5)
    assert np.asarray(res["stencil"]).max() > 0.1
    # writeToStencil passes SH color through, so the post-processed
    # shader channel is the inverted render
    np.testing.assert_allclose(
        np.asarray(res["shader"]),
        1.0 - np.asarray(res["render"]), atol=1e-5)


def test_shadergs_differentiable(scene):
    st, camera, cfg = scene
    keys = list(S.SPLAT_SHADERS)
    ids = jnp.full(64, keys.index("dissolve"), jnp.int32)

    def loss(params):
        res = shadergs.render(params, st.alive, camera, jnp.zeros(3), cfg,
                              splat_shader_ids=ids, time=500.0)
        return jnp.sum(res["shader"] ** 2)

    g = jax.grad(loss)(st.params)
    assert np.isfinite(np.asarray(g.xyz)).all()
    assert np.abs(np.asarray(g.xyz)).sum() > 0


def test_sh_shader_animation_time_dependence(scene):
    st, camera, cfg = scene
    keys = list(S.SH_SHADERS)
    ids = jnp.full(64, keys.index("gaussDissolve"), jnp.int32)
    r0 = shadergs.render(st.params, st.alive, camera, jnp.zeros(3), cfg,
                         sh_shader_ids=ids, time=100.0)
    r1 = shadergs.render(st.params, st.alive, camera, jnp.zeros(3), cfg,
                         sh_shader_ids=ids, time=5000.0)
    assert not np.allclose(np.asarray(r0["render"]),
                           np.asarray(r1["render"]), atol=1e-4)
