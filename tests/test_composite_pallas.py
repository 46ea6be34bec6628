"""Pallas compositor vs the jnp twin: forward values and full gradients.

Runs the kernel in interpreter mode (CPU CI); the compiled path is
exercised on real TPU by bench.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops import composite as comp
from relightable3dgaussian_tpu.ops import composite_pallas as cpal
from relightable3dgaussian_tpu.ops import transforms as tf

W, H = 64, 48


def make_proj(P=80, seed=0, opaque=False):
    rng = np.random.default_rng(seed)
    means = rng.uniform([-1.2, -1.0, 2.0], [1.2, 1.0, 6.0], (P, 3))
    scales = rng.uniform(0.02, 0.25, (P, 3))
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops_ = rng.uniform(0.9, 0.999, P) if opaque else rng.uniform(0.05, 0.95, P)
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
    bins = binning.bin_splats(proj, grid, 32, 64)
    return proj, bins, grid, jnp.asarray(feats.astype(np.float32))


@pytest.mark.parametrize("opaque", [False, True])
def test_forward_matches_jnp(opaque):
    proj, bins, grid, feats = make_proj(opaque=opaque, seed=3)
    ref = comp.composite(bins, proj.xy, proj.conic, proj.opacity, feats,
                         grid, chunk=16)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(bins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid, chunk=16)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.final_t),
                               np.asarray(ref.final_t), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.n_contrib),
                                  np.asarray(ref.n_contrib))


@pytest.mark.parametrize("moment_bwd", [False, True])
def test_gradients_match_jnp(moment_bwd, monkeypatch):
    monkeypatch.setattr(cpal, "MOMENT_BWD", moment_bwd)
    proj, bins, grid, feats = make_proj(P=40, seed=7)
    tgt = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss_ref(xy, conic, op, feats):
        out = comp.composite(bins, xy, conic, op, feats, grid, chunk=16)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    def loss_pal(xy, conic, op, feats):
        out = cpal.composite_pallas(bins, xy, conic, op, feats, grid,
                                    chunk=16)
        return (jnp.sum((out.image - tgt) ** 2)
                + jnp.sum(out.final_t ** 2) * 0.1)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)
    names = ["xy", "conic", "opacity", "feats"]
    for n, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch: {n}")


def test_compact_grad_reduction_exact():
    """The capped compact gradient reduction (binning grad_cap) must give
    bit-equal gradients to the dense scatter transpose whenever the cap
    covers every real instance."""
    proj, bins_dense, grid, feats = make_proj(P=40, seed=11)
    bins_compact = binning.bin_splats(proj, grid, 32, 64,
                                      grad_cap=proj.valid.shape[0] * 32)
    assert bins_compact.gsort_gauss is not None
    assert int(bins_compact.dropped_grad) == 0

    def loss(binz, xy, conic, op, feats):
        out = cpal.composite_pallas(binz, xy, conic, op, feats, grid,
                                    chunk=16)
        return jnp.sum(out.image ** 2) + jnp.sum(out.final_t ** 2)

    args = (proj.xy, proj.conic, proj.opacity, feats)
    with pltpu.force_tpu_interpret_mode():
        g_dense = jax.grad(loss, argnums=(1, 2, 3, 4))(bins_dense, *args)
        g_comp = jax.grad(loss, argnums=(1, 2, 3, 4))(bins_compact, *args)
    for n, a, b in zip(["xy", "conic", "op", "feats"], g_comp, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"compact grad mismatch: {n}")


def test_from_data_tile_subset_matches_twin():
    """composite_pallas_from_data on an arbitrary tile subset (as the
    routed/sharded paths use it) == the jnp from-data twin == the full
    bins compositor on those tiles."""
    proj, bins, grid, feats = make_proj(P=60, seed=5)
    packed = jnp.concatenate(
        [proj.xy, proj.conic, proj.opacity[:, None], feats], axis=-1)
    data = jnp.take(packed, bins.idx.reshape(-1), axis=0).reshape(
        bins.idx.shape + (packed.shape[-1],))
    T = bins.idx.shape[0]
    sel = jnp.asarray([1, 3, 4, 7, T - 1], jnp.int32)  # arbitrary subset
    data_s = jnp.take(data, sel, axis=0)
    counts_s = jnp.take(bins.counts, sel)

    ref_img, ref_t, ref_last = comp.composite_from_data(
        data_s, counts_s, sel, grid, chunk=16)
    with pltpu.force_tpu_interpret_mode():
        img, ft, last = cpal.composite_pallas_from_data(
            data_s, counts_s, sel, grid, chunk=16)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ft), np.asarray(ref_t),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(last), np.asarray(ref_last))

    # and against the full compositor's same tile rows
    full = comp.composite(bins, proj.xy, proj.conic, proj.opacity, feats,
                          grid, chunk=16)
    gx = grid[0]
    for i, t in enumerate(np.asarray(sel)):
        ty, tx = t // gx, t % gx
        tile_px = np.asarray(full.image)[ty * 16:(ty + 1) * 16,
                                         tx * 16:(tx + 1) * 16]
        got_px = np.asarray(img)[i].reshape(16, 16, -1)
        np.testing.assert_allclose(got_px, tile_px, atol=3e-5, rtol=1e-4)


def test_empty_tiles():
    """Tiles with zero splats produce background only."""
    proj, bins, grid, feats = make_proj(P=4, seed=9)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(bins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid, chunk=16)
    empty = np.asarray(bins.counts) == 0
    t_img = np.asarray(got.final_t)
    # all-empty tile rows have transmittance exactly 1
    assert np.isfinite(t_img).all()
    assert (np.asarray(got.image)[np.isclose(t_img, 1.0)] == 0).all()


@pytest.mark.parametrize("F,K,chunk", [(5, 32, 8), (11, 64, 16),
                                       (26, 64, 32), (3, 16, 16)])
def test_shape_fuzz_forward_and_grads(F, K, chunk):
    """Kernel parity across feature widths (the NeILF eval packing uses
    F=26 blended channels) and K/chunk combinations."""
    proj, bins0, grid, _ = make_proj(P=30, seed=F + K)
    rng = np.random.default_rng(F)
    P = proj.valid.shape[0]
    feats = jnp.asarray(rng.uniform(0, 1, (P, F)).astype(np.float32))
    bins = binning.bin_splats(proj, grid, 16, K)

    ref = comp.composite(bins, proj.xy, proj.conic, proj.opacity, feats,
                         grid, chunk=chunk)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(bins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid, chunk=chunk)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=3e-5, rtol=1e-4)

    def loss_p(op):
        out = cpal.composite_pallas(bins, proj.xy, proj.conic, op, feats,
                                    grid, chunk=chunk)
        return jnp.sum(out.image ** 2)

    def loss_r(op):
        out = comp.composite(bins, proj.xy, proj.conic, op, feats,
                             grid, chunk=chunk)
        return jnp.sum(out.image ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p)(proj.opacity)
    gr = jax.grad(loss_r)(proj.opacity)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=5e-4, atol=1e-6)


@pytest.mark.parametrize("D", [14, 27])
def test_reduce_rows_pallas_matches_scatter(D):
    """On-chip grad reduction == scatter-add, for both lane-group widths
    (D<=16: 8 Gaussians/row; D<=32: 4/row)."""
    rng = np.random.default_rng(11)
    P, N = 1000, 4096
    G = 16 if D <= 16 else 32
    ids = rng.integers(0, P, N).astype(np.int32)
    ids[N // 2:] = np.where(rng.random(N - N // 2) < 0.2, P,
                            ids[N // 2:])  # some trash-row slots
    rows = rng.normal(size=(N, D)).astype(np.float32)
    rows[ids == P] = 0.0
    padded = np.zeros((N, G), np.float32)
    padded[:, :D] = rows
    tiled = np.tile(padded, (1, 128 // G))

    with pltpu.force_tpu_interpret_mode():
        got = cpal.reduce_rows_pallas(
            jnp.asarray(tiled), jnp.asarray(ids), P, D, chunk_rows=512)

    want = np.zeros((P, D), np.float32)
    np.add.at(want, ids[ids < P], rows[ids < P])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                               rtol=1e-5)


# ---- stream mode: window-DMA kernels, id-lane scatter targets ----


def make_stream_bins(P=80, seed=0, opaque=False):
    proj, _, grid, feats = make_proj(P=P, seed=seed, opaque=opaque)
    sbins = binning.bin_splats(proj, grid, 32, 64, stream=True)
    return proj, sbins, grid, feats


@pytest.mark.parametrize("opaque", [False, True])
def test_stream_forward_matches_jnp(opaque):
    proj, _, grid, feats = make_proj(opaque=opaque, seed=3)
    dbins = binning.bin_splats(proj, grid, 32, 64)
    sbins = binning.bin_splats(proj, grid, 32, 64, stream=True)
    assert sbins.idx is None and int(sbins.dropped_stream) == 0
    ref = comp.composite(dbins, proj.xy, proj.conic, proj.opacity, feats,
                         grid, chunk=16)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(sbins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid, chunk=16)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.final_t),
                               np.asarray(ref.final_t), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.n_contrib),
                                  np.asarray(ref.n_contrib))


def test_stream_gradients_match_jnp():
    proj, sbins, grid, feats = make_stream_bins(P=40, seed=7)
    dbins = binning.bin_splats(proj, grid, 32, 64)
    tgt = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss(bins_, use_pallas):
        def fn(xy, conic, op, feats):
            mod = cpal.composite_pallas if use_pallas else comp.composite
            out = mod(bins_, xy, conic, op, feats, grid, chunk=16)
            return (jnp.sum((out.image - tgt) ** 2)
                    + jnp.sum(out.final_t ** 2) * 0.1)
        return fn

    args = (proj.xy, proj.conic, proj.opacity, feats)
    g_ref = jax.grad(loss(dbins, False), argnums=(0, 1, 2, 3))(*args)
    with pltpu.force_tpu_interpret_mode():
        g_str = jax.grad(loss(sbins, True), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_str, g_ref, ["xy", "conic", "op", "feats"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_stream_gradients_with_tile_overflow():
    """Tiles beyond the K budget leave unwritten gaps in the stream
    output; the coverage mask must drop them (vs the dense path which
    truncates identically)."""
    proj, _, grid, feats = make_proj(P=80, seed=11)
    dbins = binning.bin_splats(proj, grid, 32, 16)   # K=16: overflow
    sbins = binning.bin_splats(proj, grid, 32, 16, stream=True,
                               stream_cap=80 * 32)
    assert int(sbins.dropped_tile) > 0
    assert int(sbins.dropped_stream) == 0
    tgt = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (grid[1] * 16, grid[0] * 16, 6)).astype(np.float32))

    def loss(bins_):
        def fn(xy, conic, op, feats):
            out = cpal.composite_pallas(bins_, xy, conic, op, feats,
                                        grid, chunk=16, max_per_tile=16)
            return jnp.sum((out.image - tgt) ** 2)
        return fn

    args = (proj.xy, proj.conic, proj.opacity, feats)
    with pltpu.force_tpu_interpret_mode():
        g_d = jax.grad(loss(dbins), argnums=(0, 1, 2, 3))(*args)
        g_s = jax.grad(loss(sbins), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_s, g_d, ["xy", "conic", "op", "feats"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_track_contrib_off_same_image():
    """track_contrib=False skips the per-chunk last-splat bookkeeping;
    image/final_t identical, n_contrib zeros."""
    proj, _, grid, feats = make_proj(P=60, seed=5)
    sbins = binning.bin_splats(proj, grid, 32, 64, stream=True)
    with pltpu.force_tpu_interpret_mode():
        on = cpal.composite_pallas(sbins, proj.xy, proj.conic,
                                   proj.opacity, feats, grid, chunk=16)
        off = cpal.composite_pallas(sbins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid, chunk=16,
                                    track_contrib=False)
    np.testing.assert_array_equal(np.asarray(off.image),
                                  np.asarray(on.image))
    np.testing.assert_array_equal(np.asarray(off.final_t),
                                  np.asarray(on.final_t))
    assert np.asarray(off.n_contrib).max() == 0
    assert np.asarray(on.n_contrib).max() > 0


@pytest.mark.parametrize("F,K,chunk",
                         [(5, 32, 8), (26, 64, 32),
                          (5, 32, 32), (8, 64, 64)])  # chunk==K:
                         # single-chunk specialized kernels

def test_stream_shape_fuzz(F, K, chunk):
    """Stream-path parity across feature widths and K/chunk combos."""
    proj, _, grid, _ = make_proj(P=30, seed=F + K)
    rng = np.random.default_rng(F)
    P = proj.valid.shape[0]
    feats = jnp.asarray(rng.uniform(0, 1, (P, F)).astype(np.float32))
    dbins = binning.bin_splats(proj, grid, 16, K)
    sbins = binning.bin_splats(proj, grid, 16, K, stream=True)

    ref = comp.composite(dbins, proj.xy, proj.conic, proj.opacity, feats,
                         grid, chunk=chunk)
    with pltpu.force_tpu_interpret_mode():
        got = cpal.composite_pallas(sbins, proj.xy, proj.conic,
                                    proj.opacity, feats, grid,
                                    chunk=chunk, max_per_tile=K)
    np.testing.assert_allclose(np.asarray(got.image),
                               np.asarray(ref.image), atol=3e-5,
                               rtol=1e-4)

    def loss(mod, bins_):
        def fn(op):
            out = mod(bins_, proj.xy, proj.conic, op, feats, grid,
                      chunk=chunk, **({"max_per_tile": K}
                                      if mod is cpal.composite_pallas
                                      else {}))
            return jnp.sum(out.image ** 2)
        return fn

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss(cpal.composite_pallas, sbins))(proj.opacity)
    gr = jax.grad(loss(comp.composite, dbins))(proj.opacity)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=5e-4, atol=1e-6)
