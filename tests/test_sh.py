"""SH basis: orthonormality on the sphere + closed-form spot checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightable3dgaussian_tpu.ops import sh


def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_basis_orthonormality(deg):
    """∫ Y_i Y_j dΩ = δ_ij — Monte Carlo over uniform sphere samples."""
    dirs = _random_dirs(200_000, seed=deg)
    basis = np.asarray(sh.eval_sh_basis(deg, jnp.asarray(dirs)))
    gram = 4 * np.pi * basis.T @ basis / dirs.shape[0]
    np.testing.assert_allclose(gram, np.eye(sh.num_sh_coeffs(deg)), atol=0.06)


def test_deg0_deg1_closed_form():
    d = jnp.asarray(_random_dirs(32))
    b = sh.eval_sh_basis(1, d)
    np.testing.assert_allclose(b[:, 0], sh.C0, rtol=1e-6)
    np.testing.assert_allclose(b[:, 1], -sh.C1 * d[:, 1], rtol=1e-5)
    np.testing.assert_allclose(b[:, 2], sh.C1 * d[:, 2], rtol=1e-5)
    np.testing.assert_allclose(b[:, 3], -sh.C1 * d[:, 0], rtol=1e-5)


def test_eval_sh_matches_basis_contraction():
    rng = np.random.default_rng(1)
    shc = jnp.asarray(rng.normal(size=(8, 3, 16)).astype(np.float32))
    dirs = jnp.asarray(_random_dirs(8).astype(np.float32))
    out = sh.eval_sh(3, shc, dirs)
    basis = sh.eval_sh_basis(3, dirs)
    expect = jnp.einsum("pck,pk->pc", shc, basis)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_rgb2sh_roundtrip():
    rgb = jnp.asarray([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(
        np.asarray(sh.sh2rgb(sh.rgb2sh(rgb))), np.asarray(rgb), rtol=1e-6)


def test_rotation_between_z():
    dirs = jnp.asarray(_random_dirs(64).astype(np.float32))
    R = sh.rotation_between_z(dirs)
    z = jnp.array([0.0, 0.0, 1.0])
    mapped = jnp.einsum("pij,j->pi", R, z)
    # fp32 conditioning degrades near z = -1; 1e-4 is the realistic bound
    np.testing.assert_allclose(np.asarray(mapped), np.asarray(dirs), atol=1e-4)
    # proper rotations
    dets = np.linalg.det(np.asarray(R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-3)
    # degenerate -z case → -I (reference convention)
    R_neg = sh.rotation_between_z(jnp.array([0.0, 0.0, -1.0]))
    np.testing.assert_allclose(np.asarray(R_neg), -np.eye(3), atol=1e-6)


def test_basis_grad_finite():
    d = jnp.asarray(_random_dirs(4).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(sh.eval_sh_basis(3, x)))(d)
    assert np.all(np.isfinite(np.asarray(g)))
