"""Ray-traced visibility vs a per-ray numpy oracle implementing the
reference trace semantics (`bvh/src/trace.cu:196-287`)."""
import numpy as np
import jax.numpy as jnp

from relightable3dgaussian_tpu.ops import raytrace, transforms as tf


def make_scene(P=80, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, (P, 3)).astype(np.float32)
    scales = rng.uniform(0.02, 0.2, (P, 3)).astype(np.float32)
    quats = rng.normal(size=(P, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops_ = rng.uniform(0.05, 0.9, P).astype(np.float32)
    normals = rng.normal(size=(P, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return means, scales, quats, ops_, normals


def oracle(rays_o, rays_d, means, scales, quats, ops_, normals):
    P = means.shape[0]
    R = rays_o.shape[0]
    vis = np.ones(R)
    cnt = np.zeros(R, np.int32)
    # full inverse covariance per gaussian
    Ainv = []
    for j in range(P):
        q = quats[j]
        r, x, y, z = q
        Rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ])
        Ainv.append(Rm @ np.diag(1.0 / scales[j] ** 2) @ Rm.T)
    for i in range(R):
        o, d = rays_o[i], rays_d[i]
        T = 1.0
        for j in range(P):
            if ops_[j] < 1 / 255:
                continue
            if normals[j] @ d > 0:
                continue
            A = Ainv[j]
            mu = means[j] - o
            t = (d @ A @ mu) / (d @ A @ d)
            if t < 0.01:
                continue
            pos = o + t * d
            dd = means[j] - pos
            power = -0.5 * dd @ A @ dd
            if power > 0:
                continue
            alpha = ops_[j] * np.exp(power)
            # ALPHA_MIN floor: the reference kernel has no explicit
            # floor, but its 3-sigma AABB BVH cull drops the same
            # sub-1/255 contributions (bvh/__init__.py:40, m=3)
            if alpha < 1 / 255:
                continue
            cnt[i] += 1
            T *= 1 - alpha
        vis[i] = T if T >= 0.9 else 0.0
    return vis, cnt


def test_matches_oracle():
    means, scales, quats, ops_, normals = make_scene()
    rng = np.random.default_rng(1)
    R = 64
    rays_o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)

    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                       jnp.asarray(quats))
    out = raytrace.trace_visibility(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), jnp.asarray(normals), chunk=32)
    vis_o, cnt_o = oracle(rays_o, rays_d, means, scales, quats, ops_,
                          normals)
    np.testing.assert_allclose(np.asarray(out["visibility"]), vis_o,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out["contribute"]), cnt_o)


def test_alive_mask_excludes():
    means, scales, quats, ops_, normals = make_scene(P=40)
    rays_o = np.zeros((8, 3), np.float32)
    rng = np.random.default_rng(2)
    rays_d = rng.normal(size=(8, 3)).astype(np.float32)
    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                       jnp.asarray(quats))
    dead = jnp.zeros(40, bool)
    out = raytrace.trace_visibility(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), jnp.asarray(normals), alive=dead,
        chunk=32)
    np.testing.assert_allclose(np.asarray(out["visibility"]), 1.0)
    assert (np.asarray(out["contribute"]) == 0).all()


def test_empty_space_fully_visible():
    means, scales, quats, ops_, normals = make_scene(P=20)
    # rays far away pointing away from the cloud
    rays_o = np.full((4, 3), 50.0, np.float32)
    rays_d = np.ones((4, 3), np.float32)
    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                       jnp.asarray(quats))
    out = raytrace.trace_visibility(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), jnp.asarray(normals), chunk=32)
    np.testing.assert_allclose(np.asarray(out["visibility"]), 1.0,
                               atol=1e-6)


def test_opaque_wall_blocks():
    # a dense wall of opaque splats between origin and +x
    P = 64
    xs = np.linspace(-0.6, 0.6, 8)
    grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2)
    means = np.concatenate(
        [np.full((P, 1), 2.0), grid], -1).astype(np.float32)  # wall at x=2
    scales = np.full((P, 3), 0.3, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (P, 1))
    ops_ = np.full(P, 0.99, np.float32)
    normals = np.tile(np.array([-1, 0, 0], np.float32), (P, 1))
    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                       jnp.asarray(quats))
    rays_o = np.zeros((1, 3), np.float32)
    rays_d = np.array([[1.0, 0, 0]], np.float32)
    out = raytrace.trace_visibility(
        rays_o, rays_d, jnp.asarray(means), sym6, jnp.asarray(ops_),
        jnp.asarray(normals), chunk=32)
    assert float(out["visibility"][0]) == 0.0


def test_trace_hits_sorted_and_correct():
    """Generic hit-list API: depth-sorted, matches a brute-force oracle."""
    means, scales, quats, ops_, normals = make_scene(P=50, seed=3)
    rng = np.random.default_rng(4)
    rays_o = rng.uniform(-2, 2, (16, 3)).astype(np.float32)
    rays_d = rng.normal(size=(16, 3)).astype(np.float32)
    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                      jnp.asarray(quats))
    out = raytrace.trace_hits(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), max_hits=8, chunk=32)
    t = np.asarray(out["t"])
    gid = np.asarray(out["id"])
    # sorted ascending
    tt = np.where(np.isinf(t), 1e30, t)
    assert (np.diff(tt, axis=1) >= -1e-5).all()
    # oracle: brute force per ray
    import numpy.linalg as la
    for i in range(4):
        o, d = rays_o[i], rays_d[i]
        hits = []
        for j in range(50):
            if ops_[j] < 1 / 255:
                continue
            q = quats[j]
            r_, x, y, z = q
            Rm = np.array([
                [1-2*(y*y+z*z), 2*(x*y-r_*z), 2*(x*z+r_*y)],
                [2*(x*y+r_*z), 1-2*(x*x+z*z), 2*(y*z-r_*x)],
                [2*(x*z-r_*y), 2*(y*z+r_*x), 1-2*(x*x+y*y)]])
            A = Rm @ np.diag(1/scales[j]**2) @ Rm.T
            mu = means[j] - o
            tj = (d @ A @ mu) / (d @ A @ d)
            if tj < 0.01:
                continue
            pos = o + tj * d
            dd = means[j] - pos
            power = -0.5 * dd @ A @ dd
            alpha = ops_[j] * np.exp(power)
            if alpha >= 1 / 255:
                hits.append((tj, j))
        hits.sort()
        want = [j for _, j in hits[:8]]
        got = [g for g in gid[i] if g >= 0]
        assert got == want, (i, got, want)


# --- cell-culled tracer (raytrace.build_cells / trace_visibility_cells) ---


def _dense_and_cells(P, R, seed, cell_size=32, Rb=None, alive=None,
                     **cellkw):
    means, scales, quats, ops_, normals = make_scene(P, seed)
    rng = np.random.default_rng(seed + 100)
    rays_o = rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    sym6 = raytrace.inverse_covariance(jnp.asarray(scales),
                                       jnp.asarray(quats))
    al = jnp.asarray(alive) if alive is not None else jnp.ones(P, bool)
    dense = raytrace.trace_visibility(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), jnp.asarray(normals), alive=al,
        chunk=1024 if P > 1024 else P)
    cells = raytrace.build_cells(
        jnp.asarray(means), jnp.asarray(scales), al, cell_size=cell_size)
    culled = raytrace.trace_visibility_cells(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(means),
        sym6, jnp.asarray(ops_), jnp.asarray(normals), cells, alive=al,
        max_rays_per_cell=Rb or R, **cellkw)
    return dense, culled


def test_cells_match_dense():
    """Cull is lossless: every contributing splat lands in a visited
    cell, so visibility and contribute counts match the dense oracle."""
    dense, culled = _dense_and_cells(P=700, R=192, seed=3)
    assert int(culled["dropped_rays"]) == 0
    np.testing.assert_array_equal(np.asarray(culled["contribute"]),
                                  np.asarray(dense["contribute"]))
    np.testing.assert_allclose(np.asarray(culled["visibility"]),
                               np.asarray(dense["visibility"]),
                               rtol=1e-5, atol=1e-6)


def test_cells_match_dense_with_dead_splats():
    rng = np.random.default_rng(9)
    alive = rng.random(500) > 0.4
    dense, culled = _dense_and_cells(P=500, R=128, seed=4, alive=alive,
                                     cell_size=64)
    assert int(culled["dropped_rays"]) == 0
    np.testing.assert_array_equal(np.asarray(culled["contribute"]),
                                  np.asarray(dense["contribute"]))
    np.testing.assert_allclose(np.asarray(culled["visibility"]),
                               np.asarray(dense["visibility"]),
                               rtol=1e-5, atol=1e-6)


def test_cells_budget_overflow_counted():
    """A tiny rays-per-cell budget must be reported, never silent."""
    _, culled = _dense_and_cells(P=700, R=192, seed=3, Rb=8)
    assert int(culled["dropped_rays"]) > 0


def test_cells_nondivisible_sizes():
    """P not divisible by cell_size, C not divisible by cell_chunk,
    R not a power of two."""
    dense, culled = _dense_and_cells(P=333, R=100, seed=5, cell_size=32,
                                     cell_chunk=5)
    assert int(culled["dropped_rays"]) == 0
    np.testing.assert_allclose(np.asarray(culled["visibility"]),
                               np.asarray(dense["visibility"]),
                               rtol=1e-5, atol=1e-6)
