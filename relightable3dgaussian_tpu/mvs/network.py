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
