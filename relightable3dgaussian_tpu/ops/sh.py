"""Real spherical harmonics evaluation (degrees 0..4).

Matches the SH basis/ordering used by the reference implementation
(`/root/reference/utils/sh_utils.py:5-128`, `cuda_rasterizer/auxiliary.h:22-39`)
so that reference-trained checkpoints render identically.  Written as pure
`jnp` — evaluating SH for P splats is a small dense op that XLA fuses into
the surrounding preprocess.
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def eval_sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the SH basis functions at unit directions.

    Args:
      deg: static SH degree in [0, 4].
      dirs: [..., 3] unit directions.

    Returns:
      [..., (deg+1)**2] basis values; `eval_sh(deg, sh, d) ==
      sum(basis * sh, -1)`.
    """
    return jnp.stack(
        eval_sh_basis_list(deg, dirs[..., 0], dirs[..., 1],
                           dirs[..., 2]), axis=-1)


def eval_sh_basis_list(deg: int, x, y, z) -> list:
    """The SH basis as a LIST of per-function arrays over component
    vectors x/y/z (any matching shape).  Lets layout-sensitive callers
    (the feature-packed render-equation scan works on [P]-lane vectors)
    skip the [..., K] stack entirely."""
    assert 0 <= deg <= 4
    out = [jnp.full(x.shape, C0, x.dtype)]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg > 3:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return out


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded functions at unit directions.

    Args:
      deg: static SH degree in [0, 4].
      sh: [..., C, K] coefficients with K >= (deg+1)**2.
      dirs: [..., 3] unit directions.

    Returns:
      [..., C] values.
    """
    n = num_sh_coeffs(deg)
    assert sh.shape[-1] >= n
    basis = eval_sh_basis(deg, dirs)  # [..., n]
    # Elementwise multiply-reduce, NOT einsum: a batched [C,n]x[n] einsum
    # lowers to per-splat MXU matmuls padded to 8x128 tiles — pure VPU
    # fma is an order of magnitude faster at these shapes.
    return jnp.sum(sh[..., :n] * basis[..., None, :], axis=-1)


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] → DC SH coefficient (reference `sh_utils.py:185`)."""
    return (rgb - 0.5) / C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def rotation_between_z(vec: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Rotation matrix taking +z to `vec` (unit).  [..., 3] → [..., 3, 3].

    Closed form of the Rodrigues rotation between z and an arbitrary unit
    vector, degenerate case vec == -z handled by -I (matches reference
    `sh_utils.py:36-68`).
    """
    v1 = -vec[..., 1]
    v2 = vec[..., 0]
    cos_p_1 = jnp.maximum(vec[..., 2] + 1.0, eps)
    v11, v22, v12 = v1 * v1, v2 * v2, v1 * v2
    r00 = 1.0 - v22 / cos_p_1
    r01 = v12 / cos_p_1
    r02 = v2
    r10 = v12 / cos_p_1
    r11 = 1.0 - v11 / cos_p_1
    r12 = -v1
    r20 = -v2
    r21 = v1
    r22 = 1.0 - (v22 + v11) / cos_p_1
    R = jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )
    neg_eye = -jnp.eye(3, dtype=vec.dtype)
    degenerate = (vec[..., 2] + 1.0 <= 0.0)[..., None, None]
    return jnp.where(degenerate, neg_eye, R)
