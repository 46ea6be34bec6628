"""Rasterizer correctness vs an independent per-pixel numpy oracle.

The oracle walks every pixel and every depth-sorted splat in plain Python,
implementing the published 3DGS compositing rules (alpha clamp 0.99, skip
below 1/255, skip power>0, stop before transmittance < 1e-4) — the same
semantics as the reference `renderCUDA` (`forward.cu:388-561`).  The
production path (preprocess → bin → scan/matmul composite) must reproduce
it bit-for-bit at fp32 tolerance, including gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.ops import projection, rasterize
from relightable3dgaussian_tpu.ops import transforms as tf

W, H = 64, 48


def make_scene(P=60, seed=0, opaque=False):
    rng = np.random.default_rng(seed)
    means = rng.uniform([-1.2, -1.0, 2.0], [1.2, 1.0, 6.0], (P, 3))
    scales = rng.uniform(0.02, 0.25, (P, 3))
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops_ = rng.uniform(0.9, 0.999, P) if opaque else rng.uniform(0.05, 0.95, P)
    colors = rng.uniform(0, 1, (P, 3))
    extra = rng.normal(size=(P, 5))
    return {k: v.astype(np.float32) for k, v in dict(
        means=means, scales=scales, quats=quats, opacity=ops_,
        colors=colors, extra=extra).items()}


def make_camera():
    w2c = np.eye(4, dtype=np.float32)
    fovx, fovy = 0.9, 0.7
    proj = tf.projection_matrix(0.01, 100.0, fovx, fovy)
    focal = np.array([tf.fov2focal(fovx, W), tf.fov2focal(fovy, H)],
                     np.float32)
    tanf = np.array([np.tan(fovx / 2), np.tan(fovy / 2)], np.float32)
    return w2c, (proj @ w2c).astype(np.float32), focal, tanf


def oracle_render(scene, w2c, full_proj, focal, tanf, bg):
    """Per-pixel reference rasterizer in plain numpy."""
    P = scene["means"].shape[0]
    means, scales, quats = scene["means"], scene["scales"], scene["quats"]
    feats = np.concatenate(
        [scene["colors"], np.zeros((P, 1)), np.ones((P, 1)),
         scene["extra"]], axis=1).astype(np.float64)
    F = feats.shape[1]

    # project each splat
    xy = np.zeros((P, 2))
    conic = np.zeros((P, 3))
    depth = np.zeros(P)
    valid = np.zeros(P, bool)
    radius = np.zeros(P)
    for i in range(P):
        t = w2c[:3, :3] @ means[i] + w2c[:3, 3]
        if t[2] <= 0.2:
            continue
        hom = full_proj @ np.append(means[i], 1.0)
        ndc = hom[:3] / (hom[3] + 1e-7)
        px = ((ndc[0] + 1) * W - 1) * 0.5
        py = ((ndc[1] + 1) * H - 1) * 0.5
        # cov3d
        q = quats[i]
        r, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ])
        cov3d = R @ np.diag(scales[i] ** 2) @ R.T
        # EWA
        tz = t[2]
        txc = np.clip(t[0] / tz, -1.3 * tanf[0], 1.3 * tanf[0]) * tz
        tyc = np.clip(t[1] / tz, -1.3 * tanf[1], 1.3 * tanf[1]) * tz
        J = np.array([
            [focal[0] / tz, 0, -focal[0] * txc / tz ** 2],
            [0, focal[1] / tz, -focal[1] * tyc / tz ** 2],
        ])
        U = J @ w2c[:3, :3]
        c2 = U @ cov3d @ U.T
        a, b, c = c2[0, 0] + 0.3, c2[0, 1], c2[1, 1] + 0.3
        det = a * c - b * b
        if det == 0:
            continue
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        rad = np.ceil(3 * np.sqrt(lam))
        # tile rect non-empty?
        gx = (W + 15) // 16
        gy = (H + 15) // 16
        rminx = min(gx, max(0, int((px - rad) / 16)))
        rminy = min(gy, max(0, int((py - rad) / 16)))
        rmaxx = min(gx, max(0, int((px + rad + 15) / 16)))
        rmaxy = min(gy, max(0, int((py + rad + 15) / 16)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue
        valid[i] = True
        xy[i] = [px, py]
        conic[i] = [c / det, -b / det, a / det]
        depth[i] = tz
        radius[i] = rad

    # Sequentially composite in depth order; per-pixel state is carried in
    # [H, W] arrays (exact same per-pixel semantics as a scalar loop: a
    # splat that would drive T below 1e-4 stops the pixel *before* being
    # applied, and once stopped a pixel never accumulates again).
    order = np.argsort(depth, kind="stable")
    img = np.zeros((H, W, F))
    T = np.ones((H, W))
    stopped = np.zeros((H, W), bool)
    pxg, pyg = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
    tile_xg, tile_yg = (pxg / 16).astype(int), (pyg / 16).astype(int)
    gx = (W + 15) // 16
    gy = (H + 15) // 16
    for i in order:
        if not valid[i]:
            continue
        rad = radius[i]
        px_, py_ = xy[i]
        rminx = min(gx, max(0, int((px_ - rad) / 16)))
        rminy = min(gy, max(0, int((py_ - rad) / 16)))
        rmaxx = min(gx, max(0, int((px_ + rad + 15) / 16)))
        rmaxy = min(gy, max(0, int((py_ + rad + 15) / 16)))
        cover = ((rminx <= tile_xg) & (tile_xg < rmaxx)
                 & (rminy <= tile_yg) & (tile_yg < rmaxy))
        dx, dy = px_ - pxg, py_ - pyg
        a, b, c = conic[i]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = np.minimum(0.99, scene["opacity"][i] * np.exp(power))
        ok = cover & (power <= 0) & (alpha >= 1 / 255) & ~stopped
        test_T = T * (1 - alpha)
        trigger = ok & (test_T < 1e-4)
        apply = ok & ~trigger
        f = feats[i].copy()
        f[3] = depth[i]
        img += np.where(apply, alpha * T, 0.0)[..., None] * f
        T = np.where(apply, test_T, T)
        stopped |= trigger
    final_t = T
    color = img[..., :3] + final_t[..., None] * bg
    return color, img[..., 3], img[..., 4], img[..., 5:], final_t


@pytest.fixture(scope="module")
def rendered():
    scene = make_scene()
    w2c, full_proj, focal, tanf = make_camera()
    bg = np.array([0.2, 0.3, 0.4], np.float32)
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=32, max_per_tile=64,
        chunk=16)
    out = rasterize.rasterize(
        jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["quats"]), jnp.asarray(scene["opacity"]),
        jnp.ones(scene["means"].shape[0], bool),
        jnp.asarray(w2c), jnp.asarray(full_proj),
        jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
        jnp.asarray(focal), jnp.asarray(tanf), jnp.asarray(bg), cfg,
        colors_precomp=jnp.asarray(scene["colors"]),
        extra_features=jnp.asarray(scene["extra"]))
    oracle = oracle_render(scene, w2c, full_proj, focal, tanf, bg)
    return out, oracle


def test_color_matches_oracle(rendered):
    out, oracle = rendered
    np.testing.assert_allclose(
        np.asarray(out.color), oracle[0], atol=2e-5, rtol=1e-4)


def test_depth_opacity_match_oracle(rendered):
    out, oracle = rendered
    np.testing.assert_allclose(np.asarray(out.depth), oracle[1],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.opacity), oracle[2],
                               atol=2e-5, rtol=1e-4)


def test_features_match_oracle(rendered):
    out, oracle = rendered
    np.testing.assert_allclose(np.asarray(out.feature), oracle[3],
                               atol=1e-4, rtol=1e-4)


def test_final_t_matches_oracle(rendered):
    out, oracle = rendered
    np.testing.assert_allclose(np.asarray(out.final_t), oracle[4],
                               atol=2e-5, rtol=1e-4)


def test_no_overflow_in_test_scene(rendered):
    out, _ = rendered
    assert int(out.stats["dropped_rect"]) == 0
    assert int(out.stats["dropped_tile"]) == 0


def test_early_stop_with_opaque_splats():
    """Dense opaque scene exercises the transmittance stop path."""
    scene = make_scene(P=120, seed=5, opaque=True)
    w2c, full_proj, focal, tanf = make_camera()
    bg = np.zeros(3, np.float32)
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=32, max_per_tile=128,
        chunk=16)
    out = rasterize.rasterize(
        jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
        jnp.asarray(scene["quats"]), jnp.asarray(scene["opacity"]),
        jnp.ones(scene["means"].shape[0], bool),
        jnp.asarray(w2c), jnp.asarray(full_proj),
        jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
        jnp.asarray(focal), jnp.asarray(tanf), jnp.asarray(bg), cfg,
        colors_precomp=jnp.asarray(scene["colors"]))
    color, _, _, _, final_t = oracle_render(
        scene, w2c, full_proj, focal, tanf, bg)
    assert (np.asarray(out.final_t) < 1e-3).any()  # stop path exercised
    np.testing.assert_allclose(np.asarray(out.color), color,
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), final_t,
                               atol=2e-6, rtol=1e-4)


def dense_reference_render(means, scales, quats, opac, colors, extra,
                           w2c, full_proj, focal, tanf, bg):
    """Dense per-pixel compositor over ALL splats (no binning, no tiling) —
    an independently-structured autodiff path for gradient comparison."""
    P = means.shape[0]
    proj = projection.preprocess(
        means, scales, quats, opac, jnp.ones(P, bool),
        jnp.asarray(w2c), jnp.asarray(full_proj),
        jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
        W, H, focal[0], focal[1], tanf[0], tanf[1],
        colors_precomp=colors)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    xy = proj.xy[order]
    conic = proj.conic[order]
    op = proj.opacity[order]
    depth = proj.depth[order]
    feats = jnp.concatenate(
        [colors, depth[:, None] * 0, jnp.ones((P, 1)), extra], -1)[order]
    feats = feats.at[:, 3].set(depth)
    rmin = proj.rect_min[order]
    rmax = proj.rect_max[order]
    valid = proj.valid[order]

    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    tile_x = (px // 16).astype(jnp.int32)
    tile_y = (py // 16).astype(jnp.int32)
    cover = ((rmin[:, None, None, 0] <= tile_x) & (tile_x < rmax[:, None, None, 0])
             & (rmin[:, None, None, 1] <= tile_y)
             & (tile_y < rmax[:, None, None, 1])
             & valid[:, None, None])
    cover = jax.lax.stop_gradient(cover)
    dx = xy[:, None, None, 0] - px
    dy = xy[:, None, None, 1] - py
    a, b, c = conic[:, 0, None, None], conic[:, 1, None, None], conic[:, 2, None, None]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(power))
    ok = cover & (power <= 0) & (alpha >= 1 / 255)
    ea = jnp.where(ok, alpha, 0.0)
    cum = jnp.cumprod(1 - ea, axis=0)
    t_before = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
    trig = ok & (t_before * (1 - alpha) < 1e-4)
    tc = jnp.cumsum(trig.astype(jnp.int32), axis=0)
    stopped_before = (tc - trig) > 0
    applied = ok & ~stopped_before & ~trig
    w = jnp.where(applied, alpha * t_before, 0.0)
    img = jnp.einsum("phw,pf->hwf", w, feats)
    final_t = jnp.prod(jnp.where(applied, 1 - alpha, 1.0), axis=0)
    color = img[..., :3] + final_t[..., None] * bg
    return color


def test_gradients_match_dense_autodiff():
    """Production (bin + scan + matmul) gradients == dense compositor
    gradients for every differentiable input."""
    scene = make_scene(P=14, seed=11)
    w2c, full_proj, focal, tanf = make_camera()
    bg = jnp.asarray(np.array([0.15, 0.25, 0.35], np.float32))
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=32, max_per_tile=32,
        chunk=8)
    target = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_prod(means, scales, quats, opac, colors):
        out = rasterize.rasterize(
            means, scales, quats, opac, jnp.ones(means.shape[0], bool),
            jnp.asarray(w2c), jnp.asarray(full_proj),
            jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
            jnp.asarray(focal), jnp.asarray(tanf), bg, cfg,
            colors_precomp=colors,
            extra_features=jnp.asarray(scene["extra"]))
        return jnp.mean((out.color - target) ** 2)

    def loss_dense(means, scales, quats, opac, colors):
        color = dense_reference_render(
            means, scales, quats, opac, colors,
            jnp.asarray(scene["extra"]), w2c, full_proj,
            jnp.asarray(focal), jnp.asarray(tanf), bg)
        return jnp.mean((color - target) ** 2)

    args = (jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["quats"]), jnp.asarray(scene["opacity"]),
            jnp.asarray(scene["colors"]))
    g_prod = jax.grad(loss_prod, argnums=tuple(range(5)))(*args)
    g_dense = jax.grad(loss_dense, argnums=tuple(range(5)))(*args)
    names = ["means", "scales", "quats", "opacity", "colors"]
    for n, gp, gd in zip(names, g_prod, g_dense):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gd), rtol=2e-4, atol=1e-7,
            err_msg=f"grad mismatch for {n}")


def test_gradients_match_finite_differences():
    scene = make_scene(P=12, seed=2)
    w2c, full_proj, focal, tanf = make_camera()
    bg = np.array([0.1, 0.1, 0.1], np.float32)
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=32, max_per_tile=32,
        chunk=8)
    target = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss(means, scales, opac, colors):
        out = rasterize.rasterize(
            means, jnp.asarray(scene["scales"]) * 0 + scales,
            jnp.asarray(scene["quats"]), opac,
            jnp.ones(means.shape[0], bool),
            jnp.asarray(w2c), jnp.asarray(full_proj),
            jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
            jnp.asarray(focal), jnp.asarray(tanf), jnp.asarray(bg), cfg,
            colors_precomp=colors)
        return jnp.mean((out.color - target) ** 2)

    args = (jnp.asarray(scene["means"]), jnp.asarray(scene["scales"]),
            jnp.asarray(scene["opacity"]), jnp.asarray(scene["colors"]))
    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)

    rng = np.random.default_rng(0)
    for argi, g in zip(range(4), grads):
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        if argi in (0, 1, 2):
            # means/scales shift tile rects and opacity crosses the 1/255
            # alpha threshold — FD steps hit discrete boundaries; these are
            # covered by test_gradients_match_dense_autodiff instead.
            continue
        # probe a few coordinates with central differences
        flat = np.asarray(args[argi]).ravel()
        picks = rng.choice(flat.size, size=min(6, flat.size), replace=False)
        for j in picks:
            # loss is exactly quadratic in colors → central differences are
            # exact for any step; a large step beats f32 rounding noise.
            eps = 3e-2
            lo, hi = flat.copy(), flat.copy()
            lo[j] -= eps
            hi[j] += eps
            a = [np.asarray(x) for x in args]
            a[argi] = lo.reshape(a[argi].shape)
            f_lo = float(loss(*[jnp.asarray(x) for x in a]))
            a[argi] = hi.reshape(a[argi].shape)
            f_hi = float(loss(*[jnp.asarray(x) for x in a]))
            fd = (f_hi - f_lo) / (2 * eps)
            got = g.ravel()[j]
            np.testing.assert_allclose(
                got, fd, rtol=0.08, atol=3e-5,
                err_msg=f"arg {argi} coord {j}")


def test_jit_and_grad_compile():
    scene = make_scene(P=30, seed=9)
    w2c, full_proj, focal, tanf = make_camera()
    cfg = rasterize.RasterizeConfig(
        width=W, height=H, max_tiles_per_gaussian=16, max_per_tile=32,
        chunk=8)

    @jax.jit
    def step(means):
        out = rasterize.rasterize(
            means, jnp.asarray(scene["scales"]), jnp.asarray(scene["quats"]),
            jnp.asarray(scene["opacity"]), jnp.ones(means.shape[0], bool),
            jnp.asarray(w2c), jnp.asarray(full_proj),
            jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
            jnp.asarray(focal), jnp.asarray(tanf),
            jnp.zeros(3), cfg, colors_precomp=jnp.asarray(scene["colors"]))
        return jnp.sum(out.color)

    v = step(jnp.asarray(scene["means"]))
    g = jax.jit(jax.grad(lambda m: step(m)))(jnp.asarray(scene["means"]))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_stream_cap_rasterize_parity():
    """rasterize() with a tight stream_cap (< T*K, >= real instances)
    matches the jnp backend on values and gradients — the budget the
    bench uses to shrink the grad scatter's routed rows."""
    from jax.experimental.pallas import tpu as pltpu

    scene = make_scene(P=60, seed=4)
    w2c, full_proj, focal, tanf = make_camera()
    bg = jnp.asarray(np.array([0.1, 0.2, 0.3], np.float32))
    target = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (H, W, 3)).astype(np.float32))

    def loss_with(cfg):
        def fn(means, opac):
            out = rasterize.rasterize(
                means, jnp.asarray(scene["scales"]),
                jnp.asarray(scene["quats"]), opac,
                jnp.ones(means.shape[0], bool),
                jnp.asarray(w2c), jnp.asarray(full_proj),
                jnp.asarray(np.linalg.inv(w2c)[:3, 3]),
                jnp.asarray(focal), jnp.asarray(tanf), bg, cfg,
                colors_precomp=jnp.asarray(scene["colors"]))
            return jnp.mean((out.color - target) ** 2), out.stats
        return fn

    base = dict(width=W, height=H, max_tiles_per_gaussian=32,
                max_per_tile=64, chunk=16)
    cfg_jnp = rasterize.RasterizeConfig(backend="jnp", **base)
    # stream prefix budget well under T*K = 12*64 = 768... pick the real
    # instance count + small margin, computed from the jnp run's stats
    _, stats = loss_with(cfg_jnp)(jnp.asarray(scene["means"]),
                                  jnp.asarray(scene["opacity"]))
    n_real = int(stats["num_instances"])
    grid = cfg_jnp.grid
    assert n_real + 8 < grid[0] * grid[1] * 64  # cap genuinely tight
    cfg_str = rasterize.RasterizeConfig(backend="pallas",
                                        stream_cap=n_real + 8, **base)

    args = (jnp.asarray(scene["means"]), jnp.asarray(scene["opacity"]))
    v_ref, g_ref = jax.value_and_grad(
        lambda m, o: loss_with(cfg_jnp)(m, o)[0], argnums=(0, 1))(*args)
    with pltpu.force_tpu_interpret_mode():
        out_s = loss_with(cfg_str)(*args)[1]
        assert int(out_s["dropped_stream"]) == 0
        v_s, g_s = jax.value_and_grad(
            lambda m, o: loss_with(cfg_str)(m, o)[0], argnums=(0, 1))(*args)
    np.testing.assert_allclose(float(v_s), float(v_ref), rtol=1e-5)
    for n, a, b in zip(["means", "opacity"], g_s, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6,
                                   err_msg=f"grad mismatch: {n}")
