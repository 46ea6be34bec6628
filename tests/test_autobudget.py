"""Auto-budget calibration: measurements are exact, derived configs lossless."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops import autobudget as ab
from relightable3dgaussian_tpu.ops import binning, projection
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

W, H = 96, 64


def make_scene(P=300, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-1.0, -0.8, -0.8], [1.0, 0.8, 0.8], (P, 3)).astype(
        np.float32)
    cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    state = G.create_from_points(
        pts, cols, capacity=512,
        init_scale=rng.uniform(0.01, 0.08, P).astype(np.float32))
    c = np.array([0.0, 0.0, 3.0])
    fwd = -c / np.linalg.norm(c)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    dn = np.cross(fwd, right)
    Rm = np.stack([right, dn, fwd], 1)
    cam = make_camera(uid=0, R=Rm, t=-Rm.T @ c, fovx=0.9, fovy=0.7,
                      width=W, height=H)
    camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
    return state, camera


def brute_force_stats(state, camera):
    attrs = G.render_attributes(state.params)
    proj = projection.preprocess(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacities"], state.alive,
        camera["w2c"], camera["full_proj"], camera["campos"], W, H,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        colors_precomp=jnp.zeros((state.alive.shape[0], 3)))
    grid = projection.grid_size(W, H)
    big = int(jnp.max(jnp.where(proj.valid, proj.tiles_touched, 0))) + 8
    bins = binning.bin_splats(proj, grid, big, 4096)
    assert int(bins.dropped_rect) == 0 and int(bins.dropped_tile) == 0
    max_tiles = int(jnp.max(jnp.where(proj.valid, proj.tiles_touched, 0)))
    return max_tiles, int(jnp.max(bins.counts)), int(bins.num_instances)


def test_measure_matches_brute_force():
    state, camera = make_scene()
    attrs = G.render_attributes(state.params)
    stats = ab.measure(attrs["means3d"], attrs["scales"],
                       attrs["rotations"], attrs["opacities"], state.alive,
                       [camera], W, H)
    bf = brute_force_stats(state, camera)
    assert (stats.max_tiles, stats.max_per_tile, stats.num_instances) == bf


def test_exact_config_is_lossless_and_tight():
    state, camera = make_scene(seed=2)
    cfg0 = RasterizeConfig(width=W, height=H, chunk=16)
    cfg = ab.calibrate_from_params(state.params, state.alive, [camera],
                                   cfg0, exact=True)
    res = R.render_view(state.params, state.alive, camera, jnp.zeros(3),
                        cfg, active_sh_degree=0,
                        compute_pseudo_normal=False)
    stats = {k: int(v) for k, v in res["stats"].items()}
    assert not ab.needs_recalibration(stats), stats
    # Tight: budgets sit within one rounding quantum of the exact demand.
    bf_tiles, bf_count, bf_inst = brute_force_stats(state, camera)
    assert bf_tiles <= cfg.max_tiles_per_gaussian < bf_tiles + 4
    assert bf_count <= cfg.max_per_tile < bf_count + cfg.chunk
    assert cfg.stream_cap is not None
    assert bf_inst <= cfg.stream_cap < bf_inst + 8192


def test_headroom_and_recalibration_flag():
    state, camera = make_scene(seed=3)
    cfg0 = RasterizeConfig(width=W, height=H, chunk=16)
    cfg = ab.calibrate_from_params(state.params, state.alive, [camera],
                                   cfg0)
    exact = ab.calibrate_from_params(state.params, state.alive, [camera],
                                     cfg0, exact=True)
    assert cfg.max_per_tile >= exact.max_per_tile
    assert cfg.max_tiles_per_gaussian >= exact.max_tiles_per_gaussian
    assert cfg.stream_cap >= exact.stream_cap
    # A starved budget must trip the recalibration check.
    starved = RasterizeConfig(width=W, height=H, chunk=16,
                              max_tiles_per_gaussian=2, max_per_tile=16)
    res = R.render_view(state.params, state.alive, camera, jnp.zeros(3),
                        starved, active_sh_degree=0,
                        compute_pseudo_normal=False)
    assert ab.needs_recalibration({k: int(v)
                                   for k, v in res["stats"].items()})


def test_single_chunk_mode_for_pallas_backend():
    """With the Pallas backend, derive() sets chunk = 96 with K a
    multiple of it (statically-unrolled chunks, composite_pallas.
    UNROLL_MAX — measured faster than the old chunk=K single-chunk
    specialization in r5); the jnp twin keeps the caller's chunk (its
    scan would materialize [T, chunk, 256] per step)."""
    stats = ab.BudgetStats(max_tiles=18, max_per_tile=281,
                           num_instances=550_000)
    base = RasterizeConfig(width=800, height=800, chunk=96,
                           backend="pallas")
    cfg = ab.derive(base, stats, exact=True)
    assert cfg.max_per_tile == 288 and cfg.chunk == 96
    # small K still collapses to one chunk
    stats_small = ab.BudgetStats(max_tiles=18, max_per_tile=60,
                                 num_instances=50_000)
    cfg_s = ab.derive(base, stats_small, exact=True)
    assert cfg_s.chunk == cfg_s.max_per_tile == 64

    cfg_j = ab.derive(dataclasses.replace(base, backend="jnp"), stats,
                      exact=True)
    assert cfg_j.chunk == 96 and cfg_j.max_per_tile % 96 == 0

    # beyond the VMEM bound: falls back to chunked
    big = ab.BudgetStats(max_tiles=18, max_per_tile=2000,
                         num_instances=550_000)
    cfg_b = ab.derive(base, big, exact=True)
    assert cfg_b.chunk == 96 and cfg_b.max_per_tile % 96 == 0


def _project(state, camera):
    attrs = G.render_attributes(state.params)
    return projection.preprocess(
        attrs["means3d"], attrs["scales"], attrs["rotations"],
        attrs["opacities"], state.alive,
        camera["w2c"], camera["full_proj"], camera["campos"], W, H,
        camera["focal"][0], camera["focal"][1],
        camera["tan_fov"][0], camera["tan_fov"][1],
        colors_precomp=jnp.zeros((state.alive.shape[0], 3)))


def test_offset_expansion_matches_dense():
    """Offset (exclusive-scan) expansion reproduces the dense [P, M]
    expansion's per-tile lists exactly (sets per tile — quantized-depth
    ties may permute under the unstable sort)."""
    state, camera = make_scene(seed=5)
    proj = _project(state, camera)
    grid = projection.grid_size(W, H)
    big = int(jnp.max(jnp.where(proj.valid, proj.tiles_touched, 0))) + 8
    dense = binning.bin_splats(proj, grid, big, 256)
    assert int(dense.dropped_rect) == 0 and int(dense.dropped_tile) == 0
    cap = int(jnp.sum(jnp.where(proj.valid, proj.tiles_touched, 0))) + 32
    off = binning.bin_splats(proj, grid, 4, 256, expansion="offset",
                             stream_cap=cap)
    assert int(off.dropped_rect) == 0 and int(off.dropped_tile) == 0
    assert int(off.num_instances) == int(dense.num_instances)
    np.testing.assert_array_equal(np.asarray(off.counts),
                                  np.asarray(dense.counts))
    di, dm = np.asarray(dense.idx), np.asarray(dense.mask)
    oi, om = np.asarray(off.idx), np.asarray(off.mask)
    np.testing.assert_array_equal(om, dm)
    for t in range(di.shape[0]):
        assert sorted(di[t][dm[t]]) == sorted(oi[t][om[t]]), t


def test_offset_expansion_overflow_counted():
    """Instances beyond the offset cap are counted in dropped_rect."""
    state, camera = make_scene(seed=6)
    proj = _project(state, camera)
    grid = projection.grid_size(W, H)
    total = int(jnp.sum(jnp.where(proj.valid, proj.tiles_touched, 0)))
    cap = max(total // 2, 1)
    off = binning.bin_splats(proj, grid, 4, 256, expansion="offset",
                             stream_cap=cap)
    assert int(off.dropped_rect) == total - cap


def test_derive_picks_offset_for_heavy_tails():
    """A scene with a splat touching thousands of tiles must calibrate
    to the offset expansion (the dense [P, M] matrix would be ~GBs) and
    render losslessly through it end to end."""
    state, camera = make_scene(seed=7)
    # one giant splat: scale ~ scene size
    p = state.params
    xyz = np.asarray(p.xyz).copy()
    sc = np.asarray(p.scaling).copy()
    sc[0] = np.log(1.5)
    xyz[0] = [0.0, 0.0, 0.0]
    state = state.replace(params=p.replace(
        xyz=jnp.asarray(xyz), scaling=jnp.asarray(sc)))
    cfg0 = RasterizeConfig(width=W, height=H, chunk=16)
    cfg = ab.calibrate_from_params(state.params, state.alive, [camera],
                                   cfg0, exact=True)
    stats = ab.measure(*[G.render_attributes(state.params)[k] for k in
                         ("means3d", "scales", "rotations", "opacities")],
                       state.alive, [camera], W, H)
    if stats.max_tiles > 64:
        assert cfg.expansion == "offset"
    res = R.render_view(state.params, state.alive, camera, jnp.zeros(3),
                        cfg, active_sh_degree=0,
                        compute_pseudo_normal=False)
    st = {k: int(v) for k, v in res["stats"].items()}
    assert not ab.needs_recalibration(st), st


def test_controller_no_thrash_at_pinned_k():
    """When the only firing counter is dropped_tile and K cannot grow,
    the controller must NOT swap in a new config (each swap re-jits the
    train step; observed thrashing every check during the rehearsal when
    K pinned at the stream_k_max VMEM cap while densification kept
    nudging the derived stream_cap)."""
    state, camera = make_scene(seed=8)
    cfg0 = RasterizeConfig(width=W, height=H, chunk=16)
    ctl = ab.BudgetController.calibrated(
        state.params, state.alive, [camera], cfg0, log=lambda m: None)
    before = ctl.cfg
    changed = ctl.check(state.params, state.alive,
                        {"dropped_tile": 74, "dropped_rect": 0,
                         "dropped_stream": 0, "dropped_grad": 0})
    assert not changed and ctl.cfg == before
    # but a counter the budget CAN address still recalibrates
    # (dropped_stream -> cap growth path stays live)
    changed2 = ctl.check(state.params, state.alive,
                         {"dropped_tile": 0, "dropped_rect": 0,
                          "dropped_stream": 10, "dropped_grad": 0})
    assert ctl.recalibrations >= (1 if changed2 else 0)
