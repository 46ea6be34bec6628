"""Geometry transforms: quaternions, covariances, camera matrices.

Conventions follow the reference math (`utils/graphics_utils.py`,
`cuda_rasterizer/forward.cu:124-158`) but matrices here are stored in the
natural row-major math convention — `y = M @ x` — with no transposed-storage
quirks.  Everything is pure jnp and differentiable.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) → rotation matrix.  [..., 4] → [..., 3, 3].

    Matches `forward.cu:137-147` (reference stores quats as (r, x, y, z)).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize with a NaN-safe gradient at v == 0.

    `jnp.linalg.norm` has a NaN derivative at exactly zero (sqrt'(0));
    clamping the *squared* norm before the sqrt keeps both value and
    gradient finite for padded/dead zero vectors.
    """
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, eps * eps))


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance Σ = R S² Rᵀ.  Returns [..., 3, 3].

    Quats are assumed pre-normalized (activation does it), matching
    `forward.cu:124-158`.  Expanded elementwise — a batched per-splat
    3x3 einsum lowers to millions of MXU-tile-padded micro-matmuls on
    TPU; explicit fma chains run on the VPU at full fp32.
    """
    R = quat_to_rotmat(quat)
    s2 = (scale * scale_modifier) ** 2
    # Σ_ij = Σ_k R_ik s2_k R_jk
    rows = [R[..., i, :] for i in range(3)]

    def entry(i, j):
        return jnp.sum(rows[i] * s2 * rows[j], axis=-1)

    e = [[entry(i, j) for j in range(3)] for i in range(3)]
    return jnp.stack([jnp.stack(r, -1) for r in e], -2)


def cov3d_to_sym6(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] → packed upper triangle [..., 6] (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], -1)


def sym6_to_cov3d(sym: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz, yy, yz, zz = [sym[..., i] for i in range(6)]
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)], -2)


def ewa_project_cov(
    mean3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    w2c: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    low_pass: float = 0.3,
) -> jnp.ndarray:
    """EWA 2D covariance projection (Zwicker 2002 eq. 29/31).

    Matches `forward.cu:79-121` including the ±1.3·tan(fov) frustum clamp
    and the +0.3 px low-pass filter.

    Args:
      mean3d: [..., 3] world positions.
      cov3d: [..., 3, 3] world covariance.
      w2c: [4, 4] world-to-camera matrix (row-major math convention).
      focal_x/focal_y: focal lengths in pixels.
      tan_fovx/tan_fovy: tangents of the half field-of-view.

    Returns:
      [..., 3]: packed 2D covariance (a, b, c) with cov = [[a, b], [b, c]].
    """
    R = w2c[:3, :3]
    t = mean3d @ R.T + w2c[:3, 3]
    tz = t[..., 2]
    txtz = jnp.clip(t[..., 0] / tz, -1.3 * tan_fovx, 1.3 * tan_fovx) * tz
    tytz = jnp.clip(t[..., 1] / tz, -1.3 * tan_fovy, 1.3 * tan_fovy) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J: 2x3 Jacobian of the perspective projection at the clamped point.
    j00 = focal_x * inv_z
    j02 = -focal_x * txtz * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tytz * inv_z2
    # U = J @ R expanded with J's sparsity (rows are j00*R0 + j02*R2 and
    # j11*R1 + j12*R2); batched per-splat einsums lower to padded MXU
    # micro-matmuls on TPU — explicit VPU fma is far faster.
    R0, R1, R2 = R[0], R[1], R[2]                     # rows, each [3]
    u0 = j00[..., None] * R0 + j02[..., None] * R2    # [..., 3]
    u1 = j11[..., None] * R1 + j12[..., None] * R2

    def quad(u, v):  # u^T Σ v with Σ = cov3d
        s = cov3d
        vx = (s[..., 0, 0] * v[..., 0] + s[..., 0, 1] * v[..., 1]
              + s[..., 0, 2] * v[..., 2])
        vy = (s[..., 1, 0] * v[..., 0] + s[..., 1, 1] * v[..., 1]
              + s[..., 1, 2] * v[..., 2])
        vz = (s[..., 2, 0] * v[..., 0] + s[..., 2, 1] * v[..., 1]
              + s[..., 2, 2] * v[..., 2])
        return u[..., 0] * vx + u[..., 1] * vy + u[..., 2] * vz

    a = quad(u0, u0) + low_pass
    b = quad(u0, u1)
    c = quad(u1, u1) + low_pass
    return jnp.stack([a, b, c], -1)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix → unit quaternion (w, x, y, z).  [..., 3, 3] → [..., 4].

    Branch-free Shepperd-style selection of the numerically best of the
    four candidate formulations (reference `rotation_to_quaternion`,
    `utils/general_utils.py`).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates (w-major, x-major, y-major, z-major)
    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    qw = jnp.stack([sw / 4, (m21 - m12) / sw, (m02 - m20) / sw,
                    (m10 - m01) / sw], -1)
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = jnp.stack([(m21 - m12) / sx, sx / 4, (m01 + m10) / sx,
                    (m02 + m20) / sx], -1)
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy / 4,
                    (m12 + m21) / sy], -1)
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz,
                    sz / 4], -1)

    use_w = (tr > 0.0)[..., None]
    use_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    use_y = (m11 >= m22)[..., None]
    q = jnp.where(use_w, qw, jnp.where(use_x, qx, jnp.where(use_y, qy, qz)))
    return normalize(q)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (w, x, y, z) — rotation a then applied to b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], -1)


# ---------------------------------------------------------------------------
# Camera matrices (numpy — built once per camera on the host).
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """COLMAP-convention w2c from (R: c2w rotation as stored, t: w2c trans).

    Mirrors reference `getWorld2View2` (`graphics_utils.py:131-148`): builds
    w2c from (Rᵀ, t), then optionally re-centers/rescales the camera center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        c2w = np.linalg.inv(Rt)
        c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float
                      ) -> np.ndarray:
    """OpenGL-style asymmetric-free perspective matrix, z in [0, 1].

    Matches reference `getProjectionMatrix` (`graphics_utils.py:151-171`).
    """
    tan_x = math.tan(fovx / 2)
    tan_y = math.tan(fovy / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def projection_matrix_center_shift(
    znear: float, zfar: float, cx: float, cy: float,
    fl_x: float, fl_y: float, w: int, h: int) -> np.ndarray:
    """Perspective matrix with principal-point shift.

    Matches reference `getProjectionMatrixCenterShift`
    (`graphics_utils.py:174-192`).
    """
    top = cy / fl_y * znear
    bottom = -(h - cy) / fl_y * znear
    left = -(w - cx) / fl_x * znear
    right = cx / fl_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1,1] → continuous pixel coordinate (`auxiliary.h:41-44`)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def hdr2ldr(img: jnp.ndarray, scale: float = 0.666667) -> jnp.ndarray:
    """ACES filmic tonemap (`graphics_utils.py:197-201`)."""
    img = img * scale
    return (img * (2.51 * img + 0.03)) / (img * (2.43 * img + 0.59) + 0.14)
