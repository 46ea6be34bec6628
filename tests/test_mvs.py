"""MVS depth-prior network: homography correctness, cascade shapes,
consistency filtering, view selection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussian_tpu.mvs import homography as hg
from relightable3dgaussian_tpu.mvs import network as net
from relightable3dgaussian_tpu.mvs import pipeline as pipe


def make_pair(H=32, W=48, baseline=0.2):
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32)
    w2c_ref = np.eye(4, dtype=np.float32)
    w2c_src = np.eye(4, dtype=np.float32)
    w2c_src[0, 3] = -baseline  # camera shifted +x in world
    rel = w2c_src @ np.linalg.inv(w2c_ref)
    return K, w2c_ref, w2c_src, rel


def test_warp_identity_at_true_depth():
    """Warping the source through the TRUE depth plane reproduces the
    reference view of a fronto-parallel textured plane."""
    H, W = 32, 48
    K, w2c_ref, w2c_src, rel = make_pair(H, W)
    depth = 2.0
    # plane at z=2 textured by world x: ref pixel (u,v) sees world
    # x = (u - cx)/fx * 2; source camera at x=+0.2 sees same point at
    # u' = fx*(x - 0.2)/2 + cx
    u = np.arange(W, dtype=np.float32)
    x_world = (u - K[0, 2]) / K[0, 0] * depth
    ref_img = np.tile(x_world[None, :, None], (H, 1, 1)).astype(np.float32)
    u_src = K[0, 0] * (x_world - 0.2) / depth + K[0, 2]
    src_img = np.zeros((H, W, 1), np.float32)
    # build the source image on its own grid: pixel u' sees world
    # x' = (u' - cx)/fx*2 + 0.2
    x_src = (u - K[0, 2]) / K[0, 0] * depth + 0.2
    src_img[:] = x_src[None, :, None]

    warped = hg.plane_sweep_warp(
        jnp.asarray(src_img), jnp.asarray(K), jnp.asarray(K),
        jnp.asarray(rel), jnp.asarray([depth]))
    got = np.asarray(warped[0])
    # interior pixels should reproduce the reference texture
    valid = got[:, 8:-8, 0] != 0
    np.testing.assert_allclose(got[:, 8:-8, 0][valid],
                               ref_img[:, 8:-8, 0][valid], atol=1e-3)


def test_depth_hypotheses():
    d = np.asarray(hg.depth_hypotheses(1.0, 4.0, 4))
    np.testing.assert_allclose(d, [1.0, 2.0, 3.0, 4.0], atol=1e-6)
    di = np.asarray(hg.depth_hypotheses(1.0, 4.0, 4, inverse=True))
    assert di[0] == pytest.approx(1.0) and di[-1] == pytest.approx(4.0)
    assert np.all(np.diff(di) > 0)


def test_cascade_forward_shapes_and_grads():
    H, W = 32, 48
    K, w2c_ref, w2c_src, rel = make_pair(H, W)
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    srcs = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    model = pipe.MVSNet(pipe.CascadeConfig(depth_nums=(8, 4, 4), base=4))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(np.stack([rel, rel])), 1.0, 4.0)
    out = model.apply(params, jnp.asarray(ref), jnp.asarray(srcs),
                      jnp.asarray(K), jnp.asarray(np.stack([K, K])),
                      jnp.asarray(np.stack([rel, rel])), 1.0, 4.0)
    assert out["depth"].shape == (H // 2, W // 2)
    assert np.isfinite(np.asarray(out["depth"])).all()
    assert (np.asarray(out["depth"]) > 0).all()

    def loss(p):
        o = model.apply(p, jnp.asarray(ref), jnp.asarray(srcs),
                        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
                        jnp.asarray(np.stack([rel, rel])), 1.0, 4.0)
        return jnp.mean((o["depth"] - 2.0) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in leaves)


def test_soft_argmin():
    depths = jnp.asarray([1.0, 2.0, 3.0])
    prob = jnp.zeros((3, 4, 4)).at[1].set(1.0)
    d = net.soft_argmin(prob, depths)
    np.testing.assert_allclose(np.asarray(d), 2.0)


def test_reprojection_consistency_perfect_and_broken():
    H, W = 24, 32
    K, w2c_ref, w2c_src, rel = make_pair(H, W)
    depth_ref = np.full((H, W), 2.0, np.float32)
    # consistent source depth: points at z=2 in ref are at z=2 in src
    depth_src = np.full((H, W), 2.0, np.float32)
    ok = pipe.reprojection_consistency(
        jnp.asarray(depth_ref), jnp.asarray(depth_src),
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(rel))
    assert np.asarray(ok)[4:-4, 8:-8].mean() > 0.9
    bad = pipe.reprojection_consistency(
        jnp.asarray(depth_ref), jnp.asarray(depth_src * 2.0),
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(rel))
    assert np.asarray(bad).mean() < 0.2


def test_depth_to_normal_plane():
    H, W = 24, 32
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32)
    depth = jnp.full((H, W), 2.0)
    n = pipe.depth_to_normal(depth, jnp.asarray(K), jnp.eye(3))
    inner = np.asarray(n)[2:-2, 2:-2]
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-4)


def test_view_selection_scores():
    pts = np.random.default_rng(0).uniform(-0.2, 0.2, (100, 3))
    a = np.deg2rad(5.0)   # near the theta0 sweet spot
    centers = [np.array([3.0, 0, 0]),
               np.array([3 * np.cos(a), 3 * np.sin(a), 0]),
               np.array([3.001, 0.001, 0])]  # near-duplicate view
    vis = [np.ones(100, bool)] * 3
    s = pipe.view_selection_scores(pts, centers, vis)
    # ~theta0-baseline pair scores higher than the near-duplicate pair
    assert s[0, 1] > s[0, 2]
    assert np.allclose(s, s.T)
