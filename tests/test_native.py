"""Native C++ helpers: threaded KNN and binary-PLY column reader.

Skipped when no toolchain is available (the package falls back to the
jnp implementations)."""
import numpy as np
import pytest

from relightable3dgaussian_tpu import native
from relightable3dgaussian_tpu.scene import ply as ply_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def test_knn_matches_exact_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(800, 3)).astype(np.float32)
    out = native.mean_knn_dist2(pts, window=800)  # full window → exact
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exact = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, exact, rtol=1e-5)


def test_knn_windowed_approximation():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    out = native.mean_knn_dist2(pts, window=128)
    d2 = ((pts[:500, None] - pts[None]) ** 2).sum(-1)
    for i in range(500):
        d2[i, i] = np.inf
    exact = np.sort(d2, axis=1)[:, :3].mean(1)
    rel = np.abs(out[:500] - exact) / np.maximum(exact, 1e-12)
    assert np.median(rel) < 1e-6
    assert (out[:500] >= exact - 1e-7).all()  # never under-estimates


def test_ply_columns(tmp_path):
    rng = np.random.default_rng(2)
    n = 1234
    cols = {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "opacity": rng.normal(size=n).astype(np.float32),
        "red": rng.integers(0, 255, n).astype(np.uint8),
    }
    p = str(tmp_path / "t.ply")
    ply_io.write_ply(p, cols)
    arr = native.ply_read_columns(p, ["z", "x", "opacity", "red"])
    assert arr is not None and arr.shape == (n, 4)
    np.testing.assert_allclose(arr[:, 0], cols["z"], rtol=1e-6)
    np.testing.assert_allclose(arr[:, 1], cols["x"], rtol=1e-6)
    np.testing.assert_allclose(arr[:, 2], cols["opacity"], rtol=1e-6)
    np.testing.assert_allclose(arr[:, 3], cols["red"].astype(np.float32))


def test_ply_missing_property(tmp_path):
    p = str(tmp_path / "t.ply")
    ply_io.write_ply(p, {"x": np.zeros(4, np.float32)})
    assert native.ply_read_columns(p, ["nope"]) is None
