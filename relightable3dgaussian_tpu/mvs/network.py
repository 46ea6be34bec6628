"""Cascaded MVS network modules (flax).

Structural analogue of the reference Vis-MVSNet
(`vismvsnet/core/model_cas.py`): `FeatExt` multi-scale feature UNet
(`model_cas.py:18`), pairwise cost regularizer + `UncertNet`
uncertainty head (`:38-100`), fused regularizer, soft-argmin depth
regression (`core/nn_utils.py`).  Convolutions are NHWC / NDHWC (TPU
layout); channel counts follow the reference's 8/16/32 pyramid.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBnRelu(nn.Module):
    ch: int
    stride: int = 1
    dims: int = 2

    @nn.compact
    def __call__(self, x):
        k = (3,) * self.dims
        s = (self.stride,) * self.dims
        x = nn.Conv(self.ch, k, s, padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch))(x)
        return nn.relu(x)


class FeatExt(nn.Module):
    """Multi-scale feature extractor — 3 outputs at 1/2, 1/4, 1/8
    resolution with 8/16/32 channels (reference `FeatExt`)."""
    base: int = 8

    @nn.compact
    def __call__(self, img):
        c = self.base
        x0 = ConvBnRelu(c)(img)
        x0 = ConvBnRelu(c)(x0)
        x1 = ConvBnRelu(c * 2, stride=2)(x0)
        x1 = ConvBnRelu(c * 2)(x1)
        x2 = ConvBnRelu(c * 4, stride=2)(x1)
        x2 = ConvBnRelu(c * 4)(x2)
        x3 = ConvBnRelu(c * 8, stride=2)(x2)
        x3 = ConvBnRelu(c * 8)(x3)
        # top-down with skip fusion
        def up(x, skip, ch):
            x = jax.image.resize(
                x, skip.shape[:-1] + (x.shape[-1],), "bilinear")
            x = jnp.concatenate([x, skip], -1)
            return ConvBnRelu(ch)(x)
        f8 = nn.Conv(c * 8, (1, 1))(x3)                  # 1/8, 64ch-ish
        f4 = up(f8, x2, c * 4)                           # 1/4
        f2 = up(f4, x1, c * 2)                           # 1/2
        return f2, f4, f8


class Reg3D(nn.Module):
    """3D cost regularization UNet (reference `Reg`/`RegFuse`)."""
    base: int = 8

    @nn.compact
    def __call__(self, vol):
        # vol: [D, H, W, C]
        c = self.base
        x0 = ConvBnRelu(c, dims=3)(vol)
        x1 = ConvBnRelu(c * 2, stride=2, dims=3)(x0)
        x2 = ConvBnRelu(c * 4, stride=2, dims=3)(x1)
        x2 = ConvBnRelu(c * 4, dims=3)(x2)

        def up(x, skip, ch):
            x = jax.image.resize(
                x, skip.shape[:-1] + (x.shape[-1],), "trilinear")
            x = jnp.concatenate([x, skip], -1)
            return ConvBnRelu(ch, dims=3)(x)
        x = up(x2, x1, c * 2)
        x = up(x, x0, c)
        return nn.Conv(1, (3, 3, 3), padding="SAME")(x)[..., 0]  # [D,H,W]


class UncertNet(nn.Module):
    """Per-pair uncertainty head over the pairwise probability volume
    (reference `UncertNet`, `model_cas.py:77-100`)."""
    @nn.compact
    def __call__(self, prob_stats):
        # prob_stats: [H, W, C] (entropy, max-prob, ...)
        x = ConvBnRelu(8)(prob_stats)
        x = ConvBnRelu(8)(x)
        return nn.Conv(1, (3, 3), padding="SAME")(x)[..., 0]  # logits


def soft_argmin(prob_volume: jnp.ndarray, depths: jnp.ndarray
                ) -> jnp.ndarray:
    """Probability-weighted depth expectation (`nn_utils.soft_argmin`).

    Args: prob_volume [D, H, W] (softmaxed); depths [D].
    """
    return jnp.einsum("dhw,d->hw", prob_volume, depths)


def entropy(prob_volume: jnp.ndarray) -> jnp.ndarray:
    p = jnp.clip(prob_volume, 1e-7, 1.0)
    return -jnp.sum(p * jnp.log(p), axis=0)


class PairStage(nn.Module):
    """One source-view cost: variance cost volume → regularize →
    probability volume + uncertainty."""
    base: int = 8

    @nn.compact
    def __call__(self, ref_feat, warped):
        # ref_feat [H, W, C]; warped [D, H, W, C]
        cost = (warped - ref_feat[None]) ** 2            # [D, H, W, C]
        logits = Reg3D(self.base)(cost)                  # [D, H, W]
        prob = jax.nn.softmax(logits, axis=0)
        stats = jnp.stack(
            [entropy(prob), jnp.max(prob, axis=0)], -1)  # [H, W, 2]
        uncert = UncertNet()(stats)                      # [H, W] logits
        return logits, prob, uncert


def sobel_grads(feat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel image gradients (d/dx, d/dy) of [H, W, C]
    features, normalized to units of feature-per-pixel (the reference's
    fixed depthwise Sobel conv, `model_cas.py:103-117`, carries the
    un-normalized ±1/±2 taps; normalizing by 1/8 makes the Gauss-Newton
    step scale-correct).  Zero padding at borders."""
    z = jnp.zeros_like(feat[:1])
    up = jnp.concatenate([feat[1:], z], axis=0)      # row y+1
    dn = jnp.concatenate([z, feat[:-1]], axis=0)     # row y-1
    zc = jnp.zeros_like(feat[:, :1])
    def dx(x):
        r = jnp.concatenate([x[:, 1:], zc], axis=1)
        l = jnp.concatenate([zc, x[:, :-1]], axis=1)
        return r - l
    gx = (dx(dn) + 2.0 * dx(feat) + dx(up)) / 8.0
    def dy_of(x):
        u = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
        d = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
        return u - d
    r = jnp.concatenate([feat[:, 1:], zc], axis=1)
    l = jnp.concatenate([zc, feat[:, :-1]], axis=1)
    gy = (dy_of(l) + 2.0 * dy_of(feat) + dy_of(r)) / 8.0
    return gx, gy


def gn_refine(
    depth: jnp.ndarray,
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    K_ref: jnp.ndarray,
    K_srcs: jnp.ndarray,
    rels: jnp.ndarray,
    iters: int = 1,
    eps: float = 1e-6,
    clamp: float | None = None,
) -> jnp.ndarray:
    """One (or more) Gauss-Newton step(s) on the per-pixel depth that
    minimizes the photometric feature residual against the source views.

    TPU-native rework of the reference `GNRefine` (`model_cas.py:101-163`
    — constructed there but its call is commented out at `:434`; here it
    is a flag-gated cascade stage).  Instead of the reference's
    homography-difference Jacobian we use the exact closed form: with
    p(d) = d·a + b, a = Kₛ R K_r⁻¹ pix, b = Kₛ t, the warped coordinate
    uv = p.xy/p.z has duv/dd = (a.xy − uv·a.z)/p.z; the per-channel
    Jacobian is J_c = ∇feat_c(uv)·duv/dd and
    Δd = −Σ_{v,c} J r / (Σ J² + eps).

    Args:
      depth: [H, W] current estimate (same scale as the features).
      ref_feat: [H, W, C]; src_feats: [V, H, W, C].
      K_ref/K_srcs: intrinsics at this scale; rels: [V, 4, 4] ref→src.
      clamp: optional |Δd| bound (e.g. the sweep interval).
    """
    from . import homography as hg

    H, W = depth.shape
    u, v = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))
    pix = jnp.stack([u, v, jnp.ones_like(u)], -1)        # [H, W, 3]
    ray = pix @ jnp.linalg.inv(K_ref).T

    grads = [sobel_grads(f) for f in src_feats]

    def step(d, _):
        num = jnp.zeros((H, W))
        den = jnp.zeros((H, W))
        for vi in range(src_feats.shape[0]):
            R, t = rels[vi][:3, :3], rels[vi][:3, 3]
            a = ray @ R.T @ K_srcs[vi].T                 # [H, W, 3]
            b = t @ K_srcs[vi].T
            p = a * d[..., None] + b
            z = jnp.maximum(p[..., 2], 1e-6)
            x = p[..., 0] / z
            y = p[..., 1] / z
            warped = hg._bilinear(src_feats[vi], x, y)
            r_c = warped - ref_feat                      # [H, W, C]
            dud = (a[..., 0] - x * a[..., 2]) / z
            dvd = (a[..., 1] - y * a[..., 2]) / z
            gx = hg._bilinear(grads[vi][0], x, y)
            gy = hg._bilinear(grads[vi][1], x, y)
            J = gx * dud[..., None] + gy * dvd[..., None]
            num = num + jnp.sum(J * r_c, axis=-1)
            den = den + jnp.sum(J * J, axis=-1)
        delta = -num / (den + eps)
        if clamp is not None:
            delta = jnp.clip(delta, -clamp, clamp)
        return jnp.maximum(d + delta, 1e-3), None

    out, _ = jax.lax.scan(step, depth, None, length=iters)
    return out


# 8-neighborhood offsets for the 3x3 CSPN kernel; center (0,0) handled
# by the derived weight (reference `nn_utils.py` CSPN.im2col enumerates
# (0,0) first and gen_kernel assigns it 1 - sum of the others).
_CSPN_OFFSETS = ((0, 1), (0, -1), (1, 0), (1, 1), (1, -1),
                 (-1, 0), (-1, 1), (-1, -1))


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = x[y-dy, x-dx], zero outside (reference im2col)."""
    H, W = x.shape
    out = x
    if dy:
        z = jnp.zeros((abs(dy), W), x.dtype)
        out = (jnp.concatenate([z, out[:-dy]], axis=0) if dy > 0
               else jnp.concatenate([out[-dy:], z], axis=0))
    if dx:
        z = jnp.zeros((H, abs(dx)), x.dtype)
        out = (jnp.concatenate([z, out[:, :-dx]], axis=1) if dx > 0
               else jnp.concatenate([out[:, -dx:], z], axis=1))
    return out


def cspn_propagate(affinity: jnp.ndarray, x: jnp.ndarray,
                   iters: int) -> jnp.ndarray:
    """Convolutional spatial propagation (reference CSPN,
    `nn_utils.py:281-314`): normalize the 8 neighbor affinities by their
    absolute sum, give the center 1 − Σ (so weights sum to one and a
    constant map is a fixed point), then iterate the weighted 3x3
    diffusion.

    Args: affinity [H, W, 8]; x [H, W] (the depth map); static iters.
    """
    kappa = affinity / jnp.maximum(
        jnp.sum(jnp.abs(affinity), axis=-1, keepdims=True), 1e-6)
    # Out-of-bounds neighbors carry no signal; zero their weights so the
    # center weight (1 - Σ) absorbs them — constants stay exact fixed
    # points up to the image border (zero-padding would leak inward one
    # pixel per iteration).
    ones = jnp.ones(x.shape, x.dtype)
    valid = jnp.stack([_shift2d(ones, dy, dx)
                       for dy, dx in _CSPN_OFFSETS], axis=-1)
    kappa = kappa * valid
    w0 = 1.0 - jnp.sum(kappa, axis=-1)

    def body(d, _):
        acc = w0 * d
        for k, (dy, dx) in enumerate(_CSPN_OFFSETS):
            acc = acc + kappa[..., k] * _shift2d(d, dy, dx)
        return acc, None

    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out


class CSPNAffinity(nn.Module):
    """Affinity head for CSPN: reference features → 8 neighbor weights
    (the reference passes an `affinity_net` into CSPN; same shape here)."""
    @nn.compact
    def __call__(self, feat):
        x = ConvBnRelu(16)(feat)
        x = ConvBnRelu(16)(x)
        return nn.Conv(8, (3, 3), padding="SAME")(x)     # [H, W, 8]


class FuseStage(nn.Module):
    """Uncertainty-weighted fusion of pairwise volumes + final
    regularization (reference `RegFuse` + weighting)."""
    base: int = 8

    @nn.compact
    def __call__(self, pair_logits, pair_uncerts):
        # pair_logits: [V, D, H, W]; pair_uncerts: [V, H, W]
        w = jax.nn.sigmoid(-jnp.stack(pair_uncerts))     # low uncert → high w
        w = w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-6)
        fused = jnp.einsum("vdhw,vhw->dhw", jnp.stack(pair_logits), w)
        vol = fused[..., None]
        logits = Reg3D(self.base)(vol)
        return jax.nn.softmax(logits, axis=0)
