"""Lossless K-overflow continuation: stream compositing with per-tile
depth complexity beyond the kernel window budget K must match a single
big-K pass exactly — values, final transmittance, n_contrib, and full
gradients.  This is the TPU analogue of the reference rasterizer's
exactness at any depth (`rasterizer_impl.cu:343-384`: exact
num_rendered allocation, every instance composited).

Runs in Pallas interpreter mode (CPU CI); the compiled path runs on TPU
in the rehearsal drive, where dropped_tile == 0 is asserted per step.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from relightable3dgaussian_tpu.ops import autobudget as ab
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops import composite as comp
from relightable3dgaussian_tpu.ops import composite_pallas as cpal
from relightable3dgaussian_tpu.ops import transforms as tf
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig

W, H = 64, 48


def make_deep_proj(P=160, seed=0, opaque=False):
    """Splat cloud concentrated on a few tiles so per-tile counts run
    deep (the K-overflow regime densification creates)."""
    rng = np.random.default_rng(seed)
    # cluster: most splats project into a small central region
    means = rng.normal([0.0, 0.0, 3.0], [0.25, 0.2, 0.8], (P, 3))
    scales = rng.uniform(0.02, 0.12, (P, 3))
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops_ = (rng.uniform(0.9, 0.999, P) if opaque
            else rng.uniform(0.05, 0.6, P))
    feats = rng.uniform(0, 1, (P, 6))
    w2c = np.eye(4, dtype=np.float32)
    fovx, fovy = 0.9, 0.7
    proj_m = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    focal = np.array([tf.fov2focal(fovx, W), tf.fov2focal(fovy, H)],
                     np.float32)
    tanf = np.array([np.tan(fovx / 2), np.tan(fovy / 2)], np.float32)
    proj = projection.preprocess(
        jnp.asarray(means.astype(np.float32)),
        jnp.asarray(scales.astype(np.float32)),
        jnp.asarray(quats.astype(np.float32)),
        jnp.asarray(ops_.astype(np.float32)),
        jnp.ones(P, bool), jnp.asarray(w2c),
        jnp.asarray((proj_m @ w2c).astype(np.float32)),
        jnp.zeros(3), W, H, focal[0], focal[1], tanf[0], tanf[1],
        colors_precomp=jnp.zeros((P, 3)))
    grid = projection.grid_size(W, H)
    return proj, grid, jnp.asarray(feats.astype(np.float32))


def stream_bins(proj, grid, K, overflow_tiles=0, overflow_rounds=0):
    # stream_cap must hold the FULL deep segments (autobudget derives
    # this in production; the default T*K prefix only covers base
    # windows)
    return binning.bin_splats(
        proj, grid, 64, K, stream=True, stream_cap=8192,
        overflow_tiles=overflow_tiles, overflow_rounds=overflow_rounds)


@pytest.mark.parametrize("opaque", [False, True])
@pytest.mark.parametrize("chunk,K", [(16, 32), (32, 32)])
def test_overflow_matches_big_k(opaque, chunk, K):
    """Small-K stream + continuation == jnp twin with K large enough to
    hold every tile outright (loop path and single-chunk path)."""
    proj, grid, feats = make_deep_proj(opaque=opaque, seed=3)
    big = binning.bin_splats(proj, grid, 64, 512)
    assert int(big.dropped_tile) == 0
    # the scene must actually stress the budget
    deep = int(jnp.max(big.counts))
    assert deep > K, f"scene not deep enough ({deep} <= K={K})"
    rounds = -(-(deep - K) // K)
    bins = stream_bins(proj, grid, K, overflow_tiles=16,
                       overflow_rounds=rounds)
    assert int(bins.dropped_tile) == 0, "continuation must cover"

    ref = comp.composite(big, proj.xy, proj.conic, proj.opacity, feats,
                         grid, chunk=64)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(
            bins, proj.xy, proj.conic, proj.opacity, feats, grid,
            chunk=chunk, max_per_tile=K, overflow_rounds=rounds)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=5e-5,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got.final_t),
                               np.asarray(ref.final_t), atol=1e-5,
                               rtol=2e-4)
    # identical stop triggers -> identical last-contributor indices
    np.testing.assert_array_equal(np.asarray(got.n_contrib),
                                  np.asarray(ref.n_contrib))


def test_overflow_gradients_match_big_k():
    proj, grid, feats = make_deep_proj(P=120, seed=7)
    K = 32
    big = binning.bin_splats(proj, grid, 64, 512)
    deep = int(jnp.max(big.counts))
    assert deep > K
    rounds = -(-(deep - K) // K)
    bins = stream_bins(proj, grid, K, overflow_tiles=16,
                       overflow_rounds=rounds)
    assert int(bins.dropped_tile) == 0
    tgt = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss_ref(xy, conic, op, feats):
        out = comp.composite(big, xy, conic, op, feats, grid, chunk=64)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    def loss_ov(xy, conic, op, feats):
        out = cpal.composite_pallas(bins, xy, conic, op, feats, grid,
                                    chunk=16, max_per_tile=K,
                                    overflow_rounds=rounds)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_ov = jax.grad(loss_ov, argnums=(0, 1, 2, 3))(*args)
    for n, a, b in zip(["xy", "conic", "opacity", "feats"], g_ov, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5,
            err_msg=f"grad mismatch through continuation: {n}")


def test_dropped_tile_counts_uncovered():
    """dropped_tile must stay positive when rounds under-cover and hit
    exactly zero when they cover."""
    proj, grid, _ = make_deep_proj(seed=3)
    K = 32
    big = binning.bin_splats(proj, grid, 64, 4096)
    deep = int(jnp.max(big.counts))
    rounds_full = -(-(deep - K) // K)
    b0 = stream_bins(proj, grid, K)
    assert int(b0.dropped_tile) > 0
    b1 = stream_bins(proj, grid, K, overflow_tiles=16, overflow_rounds=1)
    if rounds_full > 1:
        assert 0 < int(b1.dropped_tile) < int(b0.dropped_tile)
    bf = stream_bins(proj, grid, K, overflow_tiles=16,
                     overflow_rounds=rounds_full)
    assert int(bf.dropped_tile) == 0


def test_autobudget_derives_continuation():
    """Demand beyond the stream-VMEM K ceiling must produce a
    continuation config (not a silent lossy cap) and a stream cap that
    holds the deep segments."""
    stats = ab.BudgetStats(
        max_tiles=40, max_per_tile=2600, num_instances=900_000,
        rect_slots=1_100_000,
        top_counts=tuple([2600, 2400, 1900, 1500] + [300] * 60))
    cfg = RasterizeConfig(width=800, height=800, chunk=96,
                          backend="pallas")
    out = ab.derive(cfg, stats, exact=True)
    assert out.max_per_tile <= 1152
    assert out.overflow_rounds >= 2
    assert out.overflow_tiles >= 8
    # fits within K -> no continuation
    stats_small = ab.BudgetStats(
        max_tiles=20, max_per_tile=280, num_instances=550_000,
        rect_slots=700_000, top_counts=(280, 270, 260))
    out2 = ab.derive(cfg, stats_small, exact=True)
    assert out2.overflow_rounds == 0 and out2.overflow_tiles == 0


def test_unroll_chunks_matches_while(monkeypatch):
    """UNROLL_MAX (static chunk unroll) must be bit-compatible with the
    while_loop path — values and gradients (stream, chunked)."""
    proj, grid, feats = make_deep_proj(P=100, seed=5)
    K = 32
    bins = stream_bins(proj, grid, K)
    tgt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss(xy, conic, op, feats):
        out = cpal.composite_pallas(bins, xy, conic, op, feats, grid,
                                    chunk=8, max_per_tile=K)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    with pltpu.force_tpu_interpret_mode():
        v0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
        monkeypatch.setattr(cpal, "UNROLL_MAX", 8)
        v1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for n, a, b in zip(["xy", "conic", "opacity", "feats"], g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"unroll grad mismatch: {n}")


def test_seg_reduce_matches_scatter(monkeypatch):
    """The sorted-segment MXU gradient reduction (SEG_REDUCE) must match
    the row-serial scatter transpose exactly on the stream path."""
    proj, grid, feats = make_deep_proj(P=100, seed=9)
    K = 32
    bins = stream_bins(proj, grid, K)
    tgt = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss(xy, conic, op, feats):
        out = cpal.composite_pallas(bins, xy, conic, op, feats, grid,
                                    chunk=16, max_per_tile=K)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setattr(cpal, "SEG_REDUCE", False)
        v0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
        monkeypatch.setattr(cpal, "SEG_REDUCE", True)
        v1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(*args)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for n, a, b in zip(["xy", "conic", "opacity", "feats"], g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"seg-reduce grad mismatch: {n}")


def test_split_expansion_matches_dense():
    """expansion="split" must produce the identical instance multiset
    (same per-tile counts, same rendered image) as plain dense when
    split_p_big covers every footprint above M_small."""
    proj, grid, feats = make_deep_proj(P=150, seed=11)
    kw = dict(stream=True, stream_cap=8192)
    b_d = binning.bin_splats(proj, grid, 64, 256, **kw)
    b_s = binning.bin_splats(proj, grid, 64, 256, expansion="split",
                             split_m_small=6, split_p_big=64, **kw)
    assert int(b_s.dropped_rect) == 0
    assert int(b_s.num_instances) == int(b_d.num_instances)
    np.testing.assert_array_equal(np.asarray(b_s.counts),
                                  np.asarray(b_d.counts))
    with pltpu.force_tpu_interpret_mode():
        out_d = cpal.composite_pallas(b_d, proj.xy, proj.conic,
                                      proj.opacity, feats, grid,
                                      chunk=32, max_per_tile=256)
        out_s = cpal.composite_pallas(b_s, proj.xy, proj.conic,
                                      proj.opacity, feats, grid,
                                      chunk=32, max_per_tile=256)
    np.testing.assert_allclose(np.asarray(out_s.image),
                               np.asarray(out_d.image), atol=1e-5,
                               rtol=1e-5)


def test_autobudget_derives_split_expansion(monkeypatch):
    """With the AUTO_SPLIT experiment flag on, a skewed footprint tail
    flips derive() to the split expansion with a covering P_big (the
    heuristic is default-off: measured slower than dense on the 800²
    bench, see autobudget.derive)."""
    monkeypatch.setattr(ab, "AUTO_SPLIT", True)
    stats = ab.BudgetStats(
        max_tiles=20, max_per_tile=280, num_instances=550_000,
        rect_slots=700_000, top_counts=(280, 270, 260),
        tt_over=(60_000, 25_000, 9_000, 3_000, 500),
        num_splats=100_000)
    cfg = RasterizeConfig(width=800, height=800, chunk=96,
                          backend="pallas")
    out = ab.derive(cfg, stats, exact=True)
    assert out.expansion == "split"
    assert out.split_m_small in (4, 8, 12, 16)
    assert out.split_p_big >= 1.5 * {4: 60_000, 8: 25_000, 12: 9_000,
                                     16: 3_000}[out.split_m_small]


def test_overflow_wide_features_matches_big_k():
    """NeILF-width features (F=16 -> D=22, the 32-lane grad-group path)
    through base + continuation passes — the stage-2 PBR x overflow
    configuration the v3 rehearsal runs on hardware."""
    proj, grid, feats6 = make_deep_proj(P=110, seed=13)
    rng = np.random.default_rng(3)
    feats = jnp.concatenate(
        [feats6, jnp.asarray(rng.uniform(0, 1, (feats6.shape[0], 10))
                             .astype(np.float32))], axis=-1)
    K = 32
    big = binning.bin_splats(proj, grid, 64, 512)
    deep = int(jnp.max(big.counts))
    assert deep > K
    rounds = -(-(deep - K) // K)
    bins = stream_bins(proj, grid, K, overflow_tiles=16,
                       overflow_rounds=rounds)
    assert int(bins.dropped_tile) == 0
    tgt = jnp.asarray(np.random.default_rng(4).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 16)).astype(np.float32))

    def loss_ref(xy, conic, op, f):
        out = comp.composite(big, xy, conic, op, f, grid, chunk=64)
        return jnp.sum((out.image - tgt) ** 2)

    def loss_ov(xy, conic, op, f):
        out = cpal.composite_pallas(bins, xy, conic, op, f, grid,
                                    chunk=16, max_per_tile=K,
                                    overflow_rounds=rounds)
        return jnp.sum((out.image - tgt) ** 2)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        *args)
    with pltpu.force_tpu_interpret_mode():
        v_ov, g_ov = jax.value_and_grad(loss_ov, argnums=(0, 1, 2, 3))(
            *args)
    np.testing.assert_allclose(float(v_ov), float(v_ref), rtol=1e-5)
    for n, a, b in zip(["xy", "conic", "opacity", "feats"], g_ov, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5,
            err_msg=f"wide-feature overflow grad mismatch: {n}")
