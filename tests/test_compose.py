"""Scene composition, rigid transforms, visibility baking, relighting."""
import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussian_tpu.models import compose, gaussians as G
from relightable3dgaussian_tpu.models import lights as L
from relightable3dgaussian_tpu.ops import transforms as tf
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera


def make_state(P=24, capacity=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32)
    return G.create_from_points(
        pts, rng.uniform(0, 1, (P, 3)).astype(np.float32),
        capacity=capacity, use_pbr=True,
        init_scale=np.full(P, 0.05, np.float32))


def test_rotmat_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = tf.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(tf.rotmat_to_quat(R))
    # quaternion double cover: q and -q are the same rotation
    dot = np.abs(np.sum(q * q2, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_multiply_matches_matrix_product():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 4)).astype(np.float32)
    b = rng.normal(size=(8, 4)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    q = tf.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    Rq = np.asarray(tf.quat_to_rotmat(q))
    Ra = np.asarray(tf.quat_to_rotmat(jnp.asarray(a)))
    Rb = np.asarray(tf.quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(Rq, Ra @ Rb, atol=1e-5)


def test_apply_transform_moves_covariance_correctly():
    """The world covariance of transformed splats must equal
    M Sigma M^T for a rotation+scale transform."""
    st = make_state()
    p = st.params
    theta = 0.7
    s = 1.5
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1.0]])
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = (R * s).astype(np.float32)
    M[:3, 3] = [0.5, -0.25, 1.0]

    p2 = compose.apply_transform(p, jnp.asarray(M))

    # positions
    want_xyz = np.asarray(p.xyz) @ (R * s).T + M[:3, 3]
    np.testing.assert_allclose(np.asarray(p2.xyz), want_xyz, atol=1e-5)

    # full covariance transform
    cov_old = np.asarray(tf.build_cov3d(
        G.get_scaling(p), G.get_rotation(p)))
    cov_new = np.asarray(tf.build_cov3d(
        G.get_scaling(p2), G.get_rotation(p2)))
    want = (R * s) @ cov_old @ (R * s).T
    np.testing.assert_allclose(cov_new, want, rtol=1e-3, atol=1e-6)


def test_concat_gaussians_packs_alive():
    a = make_state(P=10, capacity=16, seed=0)
    b = make_state(P=7, capacity=32, seed=1)
    merged = compose.concat_gaussians([a, b])
    assert int(merged.num_alive) == 17
    xyz = np.asarray(merged.params.xyz)
    np.testing.assert_allclose(xyz[:10], np.asarray(a.params.xyz)[:10])
    np.testing.assert_allclose(xyz[10:17], np.asarray(b.params.xyz)[:7])


def test_finetune_visibility_reduces_loss():
    st = make_state(P=24, capacity=32)
    st2 = compose.finetune_visibility(st, iterations=50, lr=5e-2)
    # SH dc moved away from zero toward the traced field
    moved = np.abs(np.asarray(st2.params.visibility_dc)).sum()
    assert moved > 0


def test_precompute_and_render_composite():
    st = make_state(P=24, capacity=32)
    vis = compose.precompute_visibility(st, sample_num=8, chunk=16)
    assert vis.shape == (32, 8, 1)
    assert np.isfinite(np.asarray(vis)).all()

    env = L.EnvMap(image=jnp.ones((8, 16, 3)) * 0.5)
    cam = make_camera(uid=0, R=np.eye(3), t=np.array([0, 0, 2.0]),
                      fovx=0.9, fovy=0.7, width=48, height=32)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    cfg = RasterizeConfig(width=48, height=32, max_tiles_per_gaussian=16,
                          max_per_tile=32, chunk=8)
    res = compose.render_composite(
        st, camera, jnp.zeros(3), cfg, env,
        visibility_precomp=vis, sample_num=8)
    for k in ["render", "pbr", "base_color", "visibility", "lights"]:
        assert np.isfinite(np.asarray(res[k])).all(), k

    # light rotation changes the image
    rot = jnp.asarray(np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32))
    env_img = np.zeros((8, 16, 3), np.float32)
    env_img[:, :8] = 2.0  # asymmetric light
    env2 = L.EnvMap(image=jnp.asarray(env_img))
    r1 = compose.render_composite(st, camera, jnp.zeros(3), cfg, env2,
                                  visibility_precomp=vis, sample_num=8)
    r2 = compose.render_composite(st, camera, jnp.zeros(3), cfg, env2,
                                  visibility_precomp=vis, sample_num=8,
                                  light_transform=rot)
    assert not np.allclose(np.asarray(r1["pbr"]), np.asarray(r2["pbr"]),
                           atol=1e-4)


def test_precompute_visibility_cells_matches_dense():
    """The morton-cell culled precompute path is lossless vs dense."""
    st = make_state(P=60, capacity=64)
    dense = compose.precompute_visibility(st, sample_num=8, chunk=16,
                                          use_cells=False)
    culled = compose.precompute_visibility(st, sample_num=8, chunk=16,
                                           use_cells=True)
    np.testing.assert_allclose(np.asarray(culled), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_load_composition_from_config(tmp_path):
    """transform.json -> load N PLYs, apply 4x4s, reset incidents, merge
    (the relighting.py / viewer.py composition entry)."""
    import json

    from relightable3dgaussian_tpu.training import checkpoint as ckpt

    st1 = make_state(P=10, capacity=16, seed=1)
    st2 = make_state(P=14, capacity=16, seed=2)
    ckpt.save_ply(str(tmp_path / "a.ply"), st1, use_pbr=True)
    ckpt.save_ply(str(tmp_path / "b.ply"), st2, use_pbr=True)
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 5.0
    cfgj = {
        "a": {"path": str(tmp_path / "a.ply"),
              "transform": np.eye(4).flatten().tolist()},
        "b": {"path": str(tmp_path / "b.ply"),
              "transform": shift.flatten().tolist()},
    }
    (tmp_path / "transform.json").write_text(json.dumps(cfgj))
    with open(tmp_path / "transform.json") as f:
        merged = compose.load_composition(json.load(f), verbose=False)
    assert int(merged.num_alive) == 24
    xyz = np.asarray(merged.params.xyz)[np.asarray(merged.alive)]
    # object b shifted +5 in x
    assert (xyz[:, 0] > 2.5).sum() == 14
    assert np.abs(np.asarray(merged.params.incidents_dc)).sum() == 0
