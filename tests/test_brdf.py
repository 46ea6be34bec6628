"""Render-equation correctness vs an independent numpy oracle.

The oracle re-implements the published NeILF/simplified-Disney shading
model (fibonacci hemisphere sampling, SH incident light, SG-normalized
NDF, Schlick Fresnel, Schlick-GGX visibility) in plain numpy, mirroring
the semantics of the reference Python twin
(`gaussian_renderer/neilf.py:437-519`).
"""
import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussian_tpu.ops import brdf, sh as sh_ops


def np_rotation_between_z(vec):
    out = np.zeros(vec.shape[:-1] + (3, 3))
    for i in range(vec.shape[0]):
        v = vec[i]
        v1, v2 = -v[1], v[0]
        cos_p_1 = max(v[2] + 1, 1e-7)
        R = np.array([
            [1 - v2 * v2 / cos_p_1, v1 * v2 / cos_p_1, v2],
            [v1 * v2 / cos_p_1, 1 - v1 * v1 / cos_p_1, -v1],
            [-v2, v1, 1 - (v1 * v1 + v2 * v2) / cos_p_1],
        ])
        if v[2] + 1 <= 0:
            R = -np.eye(3)
        out[i] = R
    return out


def np_sh_basis(deg, dirs):
    """Independent SH basis via explicit polynomials (deg<=3)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    c0 = 0.28209479177387814
    c1 = 0.4886025119029199
    out = [np.full(x.shape, c0)]
    if deg >= 1:
        out += [-c1 * y, c1 * z, -c1 * x]
    if deg >= 2:
        out += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.31539156525252005 * (2 * z * z - x * x - y * y),
            -1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ]
    if deg >= 3:
        out += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    return np.stack(out, -1)


def oracle(base, rough, metal, normals, viewdirs, incidents, direct_shs,
           vis_shs, S):
    P = base.shape[0]
    i = np.arange(S)
    delta = np.pi * (3 - np.sqrt(5.0))
    z = 1 - 2 * i / (2 * S - 1)
    rad = np.sqrt(1 - z**2)
    th = delta * i
    local_dirs = np.stack([np.sin(th) * rad, np.cos(th) * rad, z], -1)
    R = np_rotation_between_z(normals)
    dirs = np.einsum("pij,sj->psi", R, local_dirs)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    coef = np_sh_basis(3, dirs)  # [P, S, 16]
    local = np.maximum(np.einsum("psk,pkc->psc", coef, incidents), 0)
    glob = np.maximum(np.einsum("psk,kc->psc", coef, direct_shs) + 0.5, 0)
    vis = np.clip(np.einsum("psk,pkc->psc", coef, vis_shs) + 0.5, 0, 1)
    light = local + glob * vis

    n = normals[:, None]
    v = viewdirs[:, None]
    half = dirs + v
    half /= np.linalg.norm(half, axis=-1, keepdims=True)
    dot = lambda a, b: np.maximum((a * b).sum(-1, keepdims=True), 0)
    h_d_n, h_d_o = dot(half, n), dot(half, v)
    n_d_i, n_d_o = dot(n, dirs), dot(n, v)

    b = base[:, None]
    r = rough[:, None]
    m = metal[:, None]
    f_d = (1 - m) * b / np.pi
    r2 = np.maximum(r * r, 1e-7)
    D = (1 / (r2 * np.pi)) * np.exp((2 / r2) * (h_d_n - 1))
    f0 = 0.04 * (1 - m) + b * m
    F = f0 + (1 - f0) * (1 - h_d_o) ** 5
    vg = lambda cos: 0.5 / np.maximum(cos * (1 - (1 + r)**2 / 8) + (1 + r)**2 / 8, 1e-7)
    V = vg(n_d_i) * vg(n_d_o)
    f_s = D * F * V

    transport = light * 2 * np.pi * n_d_i
    rgb_d = (f_d * transport).mean(1)
    rgb_s = (f_s * transport).mean(1)
    return rgb_d + rgb_s, transport.mean(1)


def make_inputs(P=40, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (P, 3)).astype(np.float32)
    rough = rng.uniform(0.1, 1, (P, 1)).astype(np.float32)
    metal = rng.uniform(0, 1, (P, 1)).astype(np.float32)
    normals = rng.normal(size=(P, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    viewdirs = rng.normal(size=(P, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    incidents = (rng.normal(size=(P, 16, 3)) * 0.1).astype(np.float32)
    direct = (rng.normal(size=(16, 3)) * 0.1).astype(np.float32)
    vis = (rng.normal(size=(P, 16, 1)) * 0.1).astype(np.float32)
    return base, rough, metal, normals, viewdirs, incidents, direct, vis


def test_matches_numpy_oracle():
    args = make_inputs()
    S = 24
    pbr, extras = brdf.rendering_equation(
        *[jnp.asarray(a) for a in args], sample_num=S)
    pbr_o, diffuse_o = oracle(*args, S)
    np.testing.assert_allclose(np.asarray(pbr), pbr_o, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(extras["diffuse_light"]),
                               diffuse_o, rtol=2e-4, atol=2e-5)


def test_incident_dirs_upper_hemisphere():
    _, _, _, normals, *_ = make_inputs()
    dirs = brdf.sample_incident_dirs(jnp.asarray(normals), 32)
    cos = np.einsum("psi,pi->ps", np.asarray(dirs), normals)
    # fibonacci z-range covers (−1/(2S−1), 1]; all samples face the normal
    assert (cos > -0.05).all()
    # unit norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5)


def test_random_rotation_changes_azimuth_only():
    _, _, _, normals, *_ = make_inputs(P=8)
    d0 = brdf.sample_incident_dirs(jnp.asarray(normals), 16, None)
    d1 = brdf.sample_incident_dirs(jnp.asarray(normals), 16,
                                   jax.random.PRNGKey(0))
    cos0 = np.einsum("psi,pi->ps", np.asarray(d0), normals)
    cos1 = np.einsum("psi,pi->ps", np.asarray(d1), normals)
    # same polar angles (z-band), different azimuths
    np.testing.assert_allclose(np.sort(cos0, -1), np.sort(cos1, -1),
                               atol=1e-5)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))


def test_gradients_finite_for_all_inputs():
    args = [jnp.asarray(a) for a in make_inputs(P=10)]

    def loss(*a):
        pbr, _ = brdf.rendering_equation(*a, sample_num=8)
        return jnp.sum(pbr**2)

    grads = jax.grad(loss, argnums=tuple(range(8)))(*args)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_precomputed_visibility_and_env():
    """Relighting path: env light + traced visibility replace the SH."""
    base, rough, metal, normals, viewdirs, incidents, direct, vis = \
        make_inputs(P=6)
    S = 8
    dirs = brdf.sample_incident_dirs(jnp.asarray(normals), S)
    env_l = jnp.ones((6, S, 3)) * 0.7
    vis_p = jnp.full((6, S, 1), 0.5)
    pbr, extras = brdf.rendering_equation(
        jnp.asarray(base), jnp.asarray(rough), jnp.asarray(metal),
        jnp.asarray(normals), jnp.asarray(viewdirs),
        jnp.asarray(incidents) * 0,
        incident_dirs=dirs,
        incident_lights_precomp=env_l,
        visibility_precomp=vis_p)
    np.testing.assert_allclose(
        np.asarray(extras["global_incident_lights"]), 0.35, atol=1e-6)
    assert np.isfinite(np.asarray(pbr)).all()


def test_scan_path_matches_dense_path():
    """The sample-streaming evaluation (default) must reproduce the
    dense [P, S, *] evaluation exactly — same math, same rng azimuth —
    including every sample-reduced extras channel."""
    args = [jnp.asarray(a) for a in make_inputs(P=25, seed=3)]
    base, rough, metal, normals, viewdirs, incidents, direct, vis = args
    for key in (None, jax.random.PRNGKey(7)):
        pbr_s, ex_s = brdf.rendering_equation(
            base, rough, metal, normals, viewdirs, incidents,
            direct_shs=direct, visibility_shs=vis, sample_num=16,
            rng=key)
        pbr_d, ex_d = brdf.rendering_equation(
            base, rough, metal, normals, viewdirs, incidents,
            direct_shs=direct, visibility_shs=vis, sample_num=16,
            rng=key, return_samples=True)
        np.testing.assert_allclose(np.asarray(pbr_s), np.asarray(pbr_d),
                                   rtol=1e-4, atol=1e-6)
        for k in ("diffuse_light", "local_diffuse_light", "rgb_d",
                  "rgb_s", "accum", "mean_incident_lights",
                  "mean_local_lights", "mean_global_lights",
                  "mean_visibility"):
            np.testing.assert_allclose(
                np.asarray(ex_s[k]), np.asarray(ex_d[k]),
                rtol=1e-4, atol=1e-6, err_msg=k)


def test_scan_path_gradients_match_dense():
    args = [jnp.asarray(a) for a in make_inputs(P=12, seed=5)]
    base, rough, metal, normals, viewdirs, incidents, direct, vis = args

    def loss(dense):
        def f(bc, r, m, inc, d, v):
            pbr, _ = brdf.rendering_equation(
                bc, r, m, normals, viewdirs, inc, direct_shs=d,
                visibility_shs=v, sample_num=8,
                return_samples=dense)
            return jnp.sum(pbr ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            base, rough, metal, incidents, direct, vis)

    gs, gd = loss(False), loss(True)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_packed_scan_matches_reference_scan():
    """The feature-packed [C, P] scan must match the [P, C] scan (and
    thus the dense path/reference twin) to fp tolerance — values and
    gradients, with and without rng/global/visibility terms."""
    import numpy as np
    from relightable3dgaussian_tpu.ops import brdf
    rng = np.random.default_rng(5)
    P = 33
    nrm = rng.normal(size=(P, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm[0] = [0, 0, -1.0]  # degenerate rotation case
    args = dict(
        base_color=jnp.asarray(rng.uniform(0, 1, (P, 3)).astype(np.float32)),
        roughness=jnp.asarray(rng.uniform(0.1, 1, (P, 1)).astype(np.float32)),
        metallic=jnp.asarray(rng.uniform(0, 1, (P, 1)).astype(np.float32)),
        normals=jnp.asarray(nrm),
        viewdirs=jnp.asarray(nrm[::-1].copy()),
        incidents=jnp.asarray(
            rng.normal(0, 0.3, (P, 16, 3)).astype(np.float32)),
        direct_shs=jnp.asarray(
            rng.normal(0, 0.3, (16, 3)).astype(np.float32)),
        visibility_shs=jnp.asarray(
            rng.normal(0, 0.3, (P, 16, 1)).astype(np.float32)),
    )
    for key in (None, jax.random.PRNGKey(3)):
        pbr0, ex0 = brdf._rendering_equation_scan(
            **args, sample_num=8, rng=key)
        pbr1, ex1 = brdf._rendering_equation_scan_packed(
            **args, sample_num=8, rng=key)
        np.testing.assert_allclose(np.asarray(pbr1), np.asarray(pbr0),
                                   rtol=2e-5, atol=2e-6)
        for k in ex0:
            np.testing.assert_allclose(
                np.asarray(ex1[k]), np.asarray(ex0[k]), rtol=2e-5,
                atol=2e-6, err_msg=f"extras mismatch: {k}")

    def loss(fn, bc, inc, ro):
        a = dict(args, base_color=bc, incidents=inc, roughness=ro)
        pbr, ex = fn(**a, sample_num=8, rng=None)
        return jnp.sum(pbr ** 2) + jnp.sum(ex["mean_visibility"])

    g0 = jax.grad(lambda *a: loss(brdf._rendering_equation_scan, *a),
                  argnums=(0, 1, 2))(
        args["base_color"], args["incidents"], args["roughness"])
    g1 = jax.grad(
        lambda *a: loss(brdf._rendering_equation_scan_packed, *a),
        argnums=(0, 1, 2))(
        args["base_color"], args["incidents"], args["roughness"])
    for n, a, b in zip(["base_color", "incidents", "roughness"], g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6,
                                   err_msg=f"packed grad mismatch: {n}")
