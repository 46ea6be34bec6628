"""Transforms: quaternions, covariance build, EWA projection vs numeric Jacobian."""
import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussian_tpu.ops import transforms as tf


def _unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_rotmat_orthonormal():
    q = jnp.asarray(_unit_quats(128))
    R = np.asarray(tf.quat_to_rotmat(q))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_identity_and_z90():
    eye = np.asarray(tf.quat_to_rotmat(jnp.array([1.0, 0, 0, 0])))
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-6)
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5).astype(np.float32)
    R = np.asarray(tf.quat_to_rotmat(jnp.array([s, 0, 0, s])))
    np.testing.assert_allclose(
        R @ np.array([1.0, 0, 0]), np.array([0.0, 1.0, 0]), atol=1e-6)


def test_cov3d_eigenvalues_are_squared_scales():
    q = jnp.asarray(_unit_quats(16, seed=3))
    s = jnp.asarray(np.random.default_rng(4).uniform(0.1, 2.0, (16, 3))
                    .astype(np.float32))
    cov = np.asarray(tf.build_cov3d(s, q))
    eig = np.sort(np.linalg.eigvalsh(cov), axis=-1)
    np.testing.assert_allclose(
        eig, np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-4, atol=1e-5)


def test_sym6_roundtrip():
    q = jnp.asarray(_unit_quats(8))
    s = jnp.ones((8, 3)) * jnp.asarray([0.5, 1.0, 1.5])
    cov = tf.build_cov3d(s, q)
    np.testing.assert_allclose(
        np.asarray(tf.sym6_to_cov3d(tf.cov3d_to_sym6(cov))),
        np.asarray(cov), rtol=1e-6)


def _project_pixel(p_world, w2c, focal):
    """Plain pinhole projection for the numeric-Jacobian oracle."""
    t = w2c[:3, :3] @ p_world + w2c[:3, 3]
    return jnp.array([focal[0] * t[0] / t[2], focal[1] * t[1] / t[2]])


def test_ewa_matches_numeric_jacobian():
    """For a point far from the fov clamp, cov2d ≈ J Σ Jᵀ with J the true
    numeric Jacobian of the projection — an oracle independent of our
    analytic EWA expression."""
    rng = np.random.default_rng(7)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, 3] = [0.1, -0.2, 0.5]
    # small random rotation
    angle = 0.3
    c, s = np.cos(angle), np.sin(angle)
    w2c[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    focal = jnp.array([300.0, 320.0])
    tanf = 0.8

    for _ in range(5):
        p = jnp.asarray(rng.uniform(-0.3, 0.3, 3).astype(np.float32)
                        + np.array([0, 0, 3.0], np.float32))
        scale = jnp.asarray(rng.uniform(0.005, 0.02, 3).astype(np.float32))
        q = jnp.asarray(
            (lambda v: v / np.linalg.norm(v))(rng.normal(size=4))
            .astype(np.float32))
        cov3d = tf.build_cov3d(scale, q)

        got = tf.ewa_project_cov(
            p, cov3d, jnp.asarray(w2c), focal[0], focal[1], tanf, tanf,
            low_pass=0.0)

        J = jax.jacobian(lambda x: _project_pixel(x, jnp.asarray(w2c), focal))(p)
        expect = J @ cov3d @ J.T
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(jnp.array(
                [expect[0, 0], expect[0, 1], expect[1, 1]])),
            rtol=1e-3, atol=1e-6)


def test_projection_matrix_maps_frustum():
    P = tf.projection_matrix(0.01, 100.0, 1.0, 0.8)
    # center of near plane → ndc z = 0, w = znear
    v = P @ np.array([0, 0, 0.01, 1.0])
    np.testing.assert_allclose(v[2] / v[3], 0.0, atol=1e-6)
    v = P @ np.array([0, 0, 100.0, 1.0])
    np.testing.assert_allclose(v[2] / v[3], 1.0, atol=1e-5)
    # edge of fov at z → ndc x = 1
    z = 5.0
    v = P @ np.array([np.tan(0.5) * z, 0, z, 1.0])
    np.testing.assert_allclose(v[0] / v[3], 1.0, rtol=1e-5)


def test_world_to_view_center():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q[None].astype(np.float32))))[0]
    t = rng.normal(size=3).astype(np.float32)
    w2c = tf.world_to_view(R, t)
    c2w = np.linalg.inv(w2c)
    center = c2w[:3, 3]
    # the camera center maps to origin
    mapped = w2c[:3, :3] @ center + w2c[:3, 3]
    np.testing.assert_allclose(mapped, 0.0, atol=1e-5)


def test_ndc2pix():
    assert float(tf.ndc2pix(jnp.array(-1.0), 800)) == -0.5
    assert float(tf.ndc2pix(jnp.array(1.0), 800)) == 799.5
