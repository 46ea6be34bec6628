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


def _plane_pair_images(H=40, W=64, depth=2.0, baseline=0.2, freq=3.0):
    """Textured fronto-parallel plane seen by ref cam (origin) and a
    source cam at world x=+baseline; texture = sin(freq * world_x)."""
    K, w2c_ref, w2c_src, rel = make_pair(H, W, baseline)
    u = np.arange(W, dtype=np.float32)
    x_ref = (u - K[0, 2]) / K[0, 0] * depth
    x_src = (u - K[0, 2]) / K[0, 0] * depth + baseline
    ref = np.tile(np.sin(freq * x_ref)[None, :, None], (H, 1, 1))
    src = np.tile(np.sin(freq * x_src)[None, :, None], (H, 1, 1))
    return (K, rel, ref.astype(np.float32), src.astype(np.float32))


def test_gn_refine_improves_noisy_depth():
    """One Gauss-Newton step on a biased depth init moves it toward the
    true plane depth (reference GNRefine semantics, model_cas.py:101-163)."""
    H, W = 40, 64
    depth_true = 2.0
    K, rel, ref, src = _plane_pair_images(H, W, depth_true)
    init = jnp.full((H, W), depth_true + 0.12)
    refined = net.gn_refine(
        init, jnp.asarray(ref), jnp.asarray(src[None]),
        jnp.asarray(K), jnp.asarray(K[None]), jnp.asarray(rel[None]),
        iters=3, clamp=0.2)
    err0 = np.abs(np.asarray(init) - depth_true)[8:-8, 8:-8]
    err1 = np.abs(np.asarray(refined) - depth_true)[8:-8, 8:-8]
    assert np.median(err1) < 0.4 * np.median(err0), (
        np.median(err0), np.median(err1))
    assert np.isfinite(np.asarray(refined)).all()


def test_cspn_constant_fixed_point_and_smoothing():
    """Weights sum to one → constants are fixed points; with uniform
    affinity the propagation averages away noise."""
    rng = np.random.default_rng(3)
    aff = jnp.asarray(rng.normal(size=(16, 16, 8)).astype(np.float32))
    const = jnp.full((16, 16), 3.25)
    out = net.cspn_propagate(aff, const, iters=4)
    np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2], 3.25,
                               atol=1e-5)

    # uniform positive affinity = 3x3 box diffusion: noise variance drops
    aff_u = jnp.ones((16, 16, 8))
    noisy = jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))
    sm = np.asarray(net.cspn_propagate(aff_u, noisy, iters=2))
    assert sm[4:-4, 4:-4].std() < 0.5 * np.asarray(noisy)[4:-4, 4:-4].std()


def test_cascade_with_refinement_flags():
    """MVSNet with GN refine + CSPN enabled runs and emits the extra
    depth maps."""
    H, W = 32, 32
    K, _, _, rel = make_pair(H, W)
    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    srcs = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    model = pipe.MVSNet(pipe.CascadeConfig(
        depth_nums=(8, 4, 4), base=4, gn_refine_iters=1, cspn_iters=2))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ref), jnp.asarray(srcs),
        jnp.asarray(K), jnp.asarray(np.stack([K, K])),
        jnp.asarray(np.stack([rel, rel])), 1.0, 4.0)
    out = model.apply(
        params, jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(K),
        jnp.asarray(np.stack([K, K])), jnp.asarray(np.stack([rel, rel])),
        1.0, 4.0)
    assert "depth_gn" in out and "depth_cspn" in out
    assert out["depth"].shape == (H // 2, W // 2)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_colmap_view_scores_from_tracks(tmp_path):
    """Pair scoring straight from a COLMAP text model: co-visible views
    at a good triangulation angle outscore track-disjoint ones."""
    sparse = tmp_path / "sparse"
    sparse.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    # 30 points seen by images 1 & 2; 10 points seen only by image 3
    for pid in range(30):
        x, y, z = rng.uniform(-0.2, 0.2, 3)
        lines.append(f"{pid} {x} {y} {z} 100 100 100 0.5 1 0 2 0")
    for pid in range(30, 40):
        x, y, z = rng.uniform(-0.2, 0.2, 3)
        lines.append(f"{pid} {x} {y} {z} 100 100 100 0.5 3 0")
    (sparse / "points3D.txt").write_text("\n".join(lines) + "\n")

    a = np.deg2rad(6.0)
    centers = [np.array([3.0, 0, 0]),
               np.array([3 * np.cos(a), 3 * np.sin(a), 0]),
               np.array([0, 3.0, 0])]
    s = pipe.colmap_view_scores(str(sparse), [1, 2, 3], centers)
    assert s is not None
    assert s[0, 1] > 0 and s[0, 2] == 0 and s[1, 2] == 0
    assert np.allclose(s, s.T)
