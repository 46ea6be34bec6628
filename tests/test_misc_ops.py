"""KNN, surface reconstruction, PLY IO, env-map lookup tests."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussian_tpu.models import lights as L
from relightable3dgaussian_tpu.ops import knn, surface
from relightable3dgaussian_tpu.scene import ply as ply_io


def test_knn_matches_exact():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    approx = np.asarray(knn.mean_knn_dist2(jnp.asarray(pts), window=128))
    exact = np.asarray(knn.mean_knn_dist2_exact(jnp.asarray(pts)))
    # windowed morton search is approximate (so is the reference's boxed
    # prune): most points exact, errors small, never under-estimated
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    assert (rel < 1e-5).mean() > 0.6
    assert np.median(rel) < 1e-5
    assert rel.mean() < 0.2
    assert (approx >= exact - 1e-6).all()


def test_knn_clustered_points():
    rng = np.random.default_rng(1)
    centers = rng.uniform(-10, 10, (5, 3))
    pts = (centers[rng.integers(0, 5, 400)]
           + rng.normal(0, 0.01, (400, 3))).astype(np.float32)
    approx = np.asarray(knn.mean_knn_dist2(jnp.asarray(pts)))
    exact = np.asarray(knn.mean_knn_dist2_exact(jnp.asarray(pts)))
    rel = np.abs(approx - exact) / np.maximum(exact, 1e-12)
    assert (rel < 1e-4).mean() > 0.95


def test_surface_xyz_unprojection():
    H, W = 32, 48
    focal = jnp.asarray([40.0, 40.0])
    cxcy = jnp.asarray([W / 2 - 0.5, H / 2 - 0.5])
    depth = jnp.full((H, W), 2.0)
    opacity = jnp.ones((H, W))
    xyz = surface.surface_xyz_from_depth(depth, opacity, focal, cxcy)
    assert np.allclose(np.asarray(xyz[..., 2]), 2.0)
    # center pixel maps to the optical axis
    cx, cy = int(W // 2), int(H // 2)
    assert abs(float(xyz[cy, cx, 0])) < 0.05
    # opacity normalization: depth 1 with opacity 0.5 → depth 2
    xyz2 = surface.surface_xyz_from_depth(
        depth * 0.5, opacity * 0.5, focal, cxcy)
    np.testing.assert_allclose(np.asarray(xyz2), np.asarray(xyz), atol=1e-5)


def test_pseudo_normal_of_plane():
    """A fronto-parallel plane at depth 2 has normal pointing at camera."""
    H, W = 32, 32
    focal = jnp.asarray([40.0, 40.0])
    cxcy = jnp.asarray([W / 2 - 0.5, H / 2 - 0.5])
    depth = jnp.full((H, W), 2.0)
    w2c = jnp.eye(4)
    xyz, n = surface.pseudo_normal_from_depth(
        depth, jnp.ones((H, W)), focal, cxcy, w2c)
    inner = np.asarray(n)[4:-4, 4:-4]  # borders use clamped stencils
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-4)


def test_ply_ascii_and_binary(tmp_path):
    p = str(tmp_path / "pts.ply")
    pts = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(0, 1, (17, 3)).astype(np.float32)
    ply_io.write_points_ply(p, pts, cols)
    pts2, cols2, normals2 = ply_io.read_points_ply(p)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    assert np.abs(cols2 - cols).max() < 1 / 255 + 1e-6
    assert normals2.shape == (17, 3)


def test_envmap_lookup_bilinear():
    H, W = 16, 32
    img = np.zeros((H, W, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 1, W)[None, :]  # red ramps with u
    env = L.EnvMap(image=jnp.asarray(img))
    # +y world → OpenGL (x, z, -y): v=(x=0, y=0·? ...): dirs straight up
    up = jnp.asarray([[0.0, 0.0, 1.0]])   # world +z → opengl +y (up)
    out = L.direct_light(env, up)
    assert np.isfinite(np.asarray(out)).all()
    # horizontal ring: u should sweep the ramp
    angles = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    dirs = np.stack([np.sin(angles), np.cos(angles),
                     np.zeros_like(angles)], -1).astype(np.float32)
    vals = np.asarray(L.direct_light(env, jnp.asarray(dirs)))[:, 0]
    assert vals.std() > 0.1  # actually samples different u


def test_radiance_hdr_reader(tmp_path):
    # uncompressed RGBE scanlines
    H, W = 4, 8
    path = str(tmp_path / "t.hdr")
    rgbe = np.zeros((H, W, 4), np.uint8)
    rgbe[..., 0] = 128
    rgbe[..., 3] = 128  # exponent → value 128 * 2^(128-136) = 0.5
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {H} +X {W}\n".encode())
        f.write(rgbe.tobytes())
    img = L._read_radiance_hdr(path)
    np.testing.assert_allclose(img[..., 0], 0.5, rtol=1e-6)


def test_radiance_hdr_writer_roundtrip():
    """script/make_relight_config.py's .hdr writer must round-trip
    through the native reader in models/lights.py."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "make_relight_config",
        os.path.join(os.path.dirname(__file__), "..", "script",
                     "make_relight_config.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from relightable3dgaussian_tpu.models.lights import _read_radiance_hdr
    img = mod.make_env(32, 64)
    path = "/tmp/_hdr_roundtrip_test.hdr"
    mod.write_radiance_hdr(path, img)
    back = _read_radiance_hdr(path)
    err = np.abs(back - img) / (np.abs(img) + 1e-3)
    assert err.max() < 0.02
