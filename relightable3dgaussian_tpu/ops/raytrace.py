"""Ray-traced splat visibility — dense MXU formulation.

The reference traces rays through an LBVH with a per-thread stack
(`bvh/src/trace.cu:196-287`) and multiplies transmittance over hit
Gaussians, zeroing the ray once opacity dips below 0.9.  Because the
product is monotone, that early-exit is *order independent*:

    visibility(ray) = T   if T = prod_j (1 - alpha_j) >= 0.9
                      0   otherwise

which frees the TPU implementation from irregular traversal entirely.
Each ray-Gaussian term needs two quadratic forms of the inverse
covariance A_j:

    t*    = (d^T A mu) / (d^T A d),     mu = mean_j - o
    power = -0.5 [ mu^T A mu - (d^T A mu)^2 / (d^T A d) ]

All three inner products are bilinear/quadratic in the ray (o, d), so
they factor into *feature-map matmuls*:

    d^T A d    = phi2(d) . a_j               phi2: 6 quadratic features
    d^T A mu   = [d | d (x) o] . b_j         12 bilinear features
    mu^T A mu  = [1 | o | phi2(o)] . c_j     10 features

Three [R, k] x [k, P] matmuls on the MXU replace the BVH (28 MACs per
ray-Gaussian pair — ~3 ms for 10k rays x 512k splats on a v5e), with a
`lax.scan` over Gaussian chunks bounding memory.  The alpha cutoff
(opacity < 1/255), backface cull (normal . d > 0  -> one more matmul),
and near clip (t* < 0.01) match `trace.cu:231-249` exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import transforms as tf


def inverse_covariance(scales: jnp.ndarray, rotations: jnp.ndarray
                       ) -> jnp.ndarray:
    """Per-splat inverse 3D covariance A = R S^-2 R^T, packed sym6
    (xx, xy, xz, yy, yz, zz) — reference `get_inverse_covariance`."""
    R = tf.quat_to_rotmat(tf.normalize(rotations))
    inv_s2 = 1.0 / jnp.maximum(scales * scales, 1e-12)
    A = jnp.einsum("...ij,...j,...kj->...ik", R, inv_s2, R)
    return tf.cov3d_to_sym6(A)


def _ray_features(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Feature maps of the rays for the three bilinear forms."""
    o, d = rays_o, rays_d
    def phi2(v):  # quadratic features, ordered (xx, yy, zz, xy, xz, yz)
        return jnp.stack([v[:, 0] ** 2, v[:, 1] ** 2, v[:, 2] ** 2,
                          v[:, 0] * v[:, 1], v[:, 0] * v[:, 2],
                          v[:, 1] * v[:, 2]], -1)
    f_dd = phi2(d)                                            # [R, 6]
    do = jnp.einsum("ri,rj->rij", d, o).reshape(-1, 9)        # [R, 9]
    f_dm = jnp.concatenate([d, do], -1)                       # [R, 12]
    f_mm = jnp.concatenate(
        [jnp.ones_like(o[:, :1]), o, phi2(o)], -1)            # [R, 10]
    return f_dd, f_dm, f_mm


def _gauss_coeffs(means: jnp.ndarray, sym6: jnp.ndarray):
    """Per-Gaussian coefficient vectors matching `_ray_features`."""
    xx, xy, xz, yy, yz, zz = [sym6[:, i] for i in range(6)]
    mu = means
    # A mu (vector)
    amu = jnp.stack([
        xx * mu[:, 0] + xy * mu[:, 1] + xz * mu[:, 2],
        xy * mu[:, 0] + yy * mu[:, 1] + yz * mu[:, 2],
        xz * mu[:, 0] + yz * mu[:, 1] + zz * mu[:, 2]], -1)    # [P, 3]
    muamu = jnp.sum(amu * mu, -1)                              # [P]

    # d^T A d = phi2(d) . (xx, yy, zz, 2xy, 2xz, 2yz)
    a = jnp.stack([xx, yy, zz, 2 * xy, 2 * xz, 2 * yz], -1)    # [P, 6]
    # d^T A mu = d . (A mu) - sum_ij d_i o_j A_ij
    A_full = jnp.stack([xx, xy, xz, xy, yy, yz, xz, yz, zz], -1)  # row-major
    b = jnp.concatenate([amu, -A_full], -1)                    # [P, 12]
    # mu^T A mu  (with mu = mean - o):
    #   mean^T A mean - 2 o^T A mean + o^T A o
    c = jnp.concatenate(
        [muamu[:, None], -2.0 * amu,
         jnp.stack([xx, yy, zz, 2 * xy, 2 * xz, 2 * yz], -1)], -1)  # [P,10]
    return a, b, c


@functools.partial(jax.jit, static_argnames=("chunk", "terminate"))
def trace_visibility(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    means: jnp.ndarray,
    sym6_inv: jnp.ndarray,
    opacities: jnp.ndarray,
    normals: jnp.ndarray,
    alive: jnp.ndarray | None = None,
    chunk: int = 65_536,
    terminate: float = 0.9,
) -> dict[str, jnp.ndarray]:
    """Transmittance of each ray through the splat cloud.

    Args:
      rays_o/rays_d: [R, 3] (d need not be unit — matches reference which
        traces un-normalized directions).
      means: [P, 3]; sym6_inv: [P, 6] inverse covariances (packed);
      opacities: [P] activated; normals: [P, 3]; alive: [P] mask.
      chunk: Gaussians per scan step (bounds the [R, chunk] intermediate).
      terminate: rays whose full transmittance falls below this are
        zeroed (`trace.cu:249-254`).

    Returns:
      {"visibility": [R], "contribute": [R] int32}.
    """
    R = rays_o.shape[0]
    P = means.shape[0]
    pad = (-P) % chunk
    if pad:
        padz = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        means = padz(means)
        sym6_inv = padz(sym6_inv)
        opacities = padz(opacities)
        normals = padz(normals)
        alive = jnp.pad(alive, (0, pad)) if alive is not None else \
            jnp.pad(jnp.ones(P, bool), (0, pad))
    elif alive is None:
        alive = jnp.ones(P, bool)

    f_dd, f_dm, f_mm = _ray_features(rays_o, rays_d)
    a, b, c = _gauss_coeffs(means, sym6_inv)

    nchunks = means.shape[0] // chunk
    resh = lambda x: x.reshape(nchunks, chunk, *x.shape[1:])
    scan_in = (resh(a), resh(b), resh(c), resh(opacities),
               resh(normals), resh(alive))

    hi = jax.lax.Precision.HIGHEST

    def body(carry, xs):
        log_t, count = carry
        ac, bc, cc, op, nrm, al = xs
        # [R, chunk] quadratic forms via MXU matmuls
        dad = f_dd @ ac.T
        dam = jax.lax.dot_general(
            f_dm, bc, (((1,), (1,)), ((), ())), precision=hi)
        mam = f_mm @ cc.T
        dad = jnp.maximum(dad, 1e-18)
        t = dam / dad
        power = -0.5 * (mam - dam * dam / dad)
        backface = (rays_d @ nrm.T) > 0.0                     # [R, chunk]
        ok = (al[None, :] & (op[None, :] >= 1.0 / 255.0)
              & ~backface & (t >= 0.01) & (power <= 0.0))
        alpha = jnp.where(ok, op[None, :] * jnp.exp(power), 0.0)
        alpha = jnp.minimum(alpha, 0.9999)
        log_t = log_t + jnp.sum(jnp.log1p(-alpha), axis=1)
        count = count + jnp.sum(ok, axis=1)
        return (log_t, count), None

    (log_t, count), _ = jax.lax.scan(
        body, (jnp.zeros(R), jnp.zeros(R, jnp.int32)), scan_in)
    vis = jnp.exp(log_t)
    vis = jnp.where(vis < terminate, 0.0, vis)
    return {"visibility": vis, "contribute": count}


@functools.partial(jax.jit, static_argnames=("max_hits", "chunk"))
def trace_hits(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    means: jnp.ndarray,
    sym6_inv: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray | None = None,
    max_hits: int = 32,
    chunk: int = 8192,
) -> dict[str, jnp.ndarray]:
    """Depth-sorted per-ray hit lists — the generic `trace_bvh` analogue
    (`bvh/src/trace.cu:8-192`, which emits hits sorted by 64-bit
    ray|depth keys).  Dense evaluation + per-ray top-k by depth.

    Returns {"t": [R, max_hits] hit depths (inf-padded),
             "id": [R, max_hits] gaussian ids (-1-padded),
             "alpha": [R, max_hits] gaussian alphas at the hit}.
    """
    R = rays_o.shape[0]
    P = means.shape[0]
    pad = (-P) % chunk
    if pad:
        padz = lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        means = padz(means)
        sym6_inv = padz(sym6_inv)
        opacities = padz(opacities)
        alive = jnp.pad(alive, (0, pad)) if alive is not None else \
            jnp.pad(jnp.ones(P, bool), (0, pad))
    elif alive is None:
        alive = jnp.ones(P, bool)

    f_dd, f_dm, f_mm = _ray_features(rays_o, rays_d)
    a, b, c = _gauss_coeffs(means, sym6_inv)
    nchunks = means.shape[0] // chunk
    resh = lambda x: x.reshape(nchunks, chunk, *x.shape[1:])
    scan_in = (resh(a), resh(b), resh(c), resh(opacities), resh(alive),
               resh(jnp.arange(means.shape[0], dtype=jnp.int32)))

    def body(carry, xs):
        best_t, best_id, best_a = carry
        ac, bc, cc, op, al, ids = xs
        dad = jnp.maximum(f_dd @ ac.T, 1e-18)
        dam = jax.lax.dot_general(
            f_dm, bc, (((1,), (1,)), ((), ())))
        mam = f_mm @ cc.T
        t = dam / dad
        power = -0.5 * (mam - dam * dam / dad)
        ok = (al[None, :] & (op[None, :] >= 1.0 / 255.0)
              & (t >= 0.01) & (power <= 0.0))
        alpha = jnp.where(ok, op[None, :] * jnp.exp(power), 0.0)
        t = jnp.where(ok & (alpha >= 1.0 / 255.0), t, jnp.inf)
        # merge this chunk's hits into the running top-k (smallest t)
        all_t = jnp.concatenate([best_t, t], axis=1)
        all_id = jnp.concatenate(
            [best_id, jnp.broadcast_to(ids[None, :], t.shape)], axis=1)
        all_a = jnp.concatenate([best_a, alpha], axis=1)
        neg_top, idx = jax.lax.top_k(-all_t, max_hits)
        take = jnp.take_along_axis
        return (take(all_t, idx, 1), take(all_id, idx, 1),
                take(all_a, idx, 1)), None

    init = (jnp.full((R, max_hits), jnp.inf),
            jnp.full((R, max_hits), -1, jnp.int32),
            jnp.zeros((R, max_hits)))
    (t, gid, alpha), _ = jax.lax.scan(body, init, scan_in)
    gid = jnp.where(jnp.isinf(t), -1, gid)
    return {"t": t, "id": gid, "alpha": alpha}


def make_visibility_tracer(params_means, scales, rotations, opacities,
                           normals, alive=None, chunk: int = 65_536):
    """Bind splat data into an (rays_o, rays_d) -> [R] visibility fn —
    the `trace_visibility_fn` hook of `models.neilf.calculate_loss`."""
    P = params_means.shape[0]
    chunk = min(chunk, -(-P // 1024) * 1024)
    sym6 = inverse_covariance(scales, rotations)

    def fn(rays_o, rays_d):
        return trace_visibility(
            rays_o, rays_d, params_means, sym6, opacities, normals,
            alive=alive, chunk=chunk)["visibility"]
    return fn
