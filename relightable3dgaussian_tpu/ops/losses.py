"""Training losses: L1, D-SSIM, bilateral smoothness, entropy, normal terms.

TPU-native analogue of the reference `utils/loss_utils.py` (ssim at
`loss_utils.py:31-62`, bilateral smoothness at `:85-96`) plus the loss
assembly logic scattered through `gaussian_renderer/render.py:118-181` and
`gaussian_renderer/neilf.py:203-352`.  All images here are [H, W, C]
(channel-last — the natural TPU layout); separable SSIM convolutions run
as two small depthwise convs that XLA fuses well.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int, sigma: float):
    import numpy as np
    x = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return g / np.sum(g)


# Separable blur: banded-Toeplitz matmuls (MXU) vs 2x11 shifted adds
# (VPU/HBM).  r2 measured the matmul path ~2 ms faster — but that was at
# the TPU default matmul precision, where the MXU rounds f32 operands to
# bf16 and the SSIM variance terms E[x²] − μ² cancel catastrophically
# (ssim > 1, garbage D-SSIM gradients; see _sep_filter2d_matmul).  At
# the required precision=HIGHEST the matmul path is SLOWER (r4, v5e:
# 5.68 vs 4.37 ms fwd+grad for one 800² ssim), so shifted adds are the
# default again.  Module-level for tools/bench_probe.py A/B
# (--set losses.SSIM_MATMUL=1).
SSIM_MATMUL = False


def _band_matrix(n: int, k) -> jnp.ndarray:
    """[n, n] Toeplitz band B with B[i, j] = k[j - i + r] (zero 'same'
    padding truncates the band at the borders)."""
    import numpy as np
    r = len(k) // 2
    B = np.zeros((n, n), np.float32)
    for d in range(-r, r + 1):
        idx = np.arange(max(0, -d), min(n, n - d))
        B[idx, idx + d] = float(k[d + r])
    return jnp.asarray(B)


def _sep_filter2d_matmul(img: jnp.ndarray, k) -> jnp.ndarray:
    """`_sep_filter2d` twin on the MXU: rows then columns via band
    matmuls.  Same zero 'same'-padding semantics.

    precision=HIGHEST is load-bearing, not tuning: at the TPU default
    precision the MXU rounds f32 operands to bf16 (8-bit mantissa), and
    SSIM's variance terms E[x²] − μ² then cancel catastrophically —
    measured ssim ≈ 1.32 (> 1!) on the 800² rehearsal scene, which
    poisoned the D-SSIM gradient of every 800² TPU training run from
    round 2 until this fix (CPU matmuls are true f32, so tests and
    small-scale drives never caught it).  preferred_element_type only
    sets the accumulator type, not the operand rounding."""
    H, W, C = img.shape
    Bh = _band_matrix(H, k)
    Bw = _band_matrix(W, k)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.dot(Bh, img.reshape(H, W * C), precision=hi,
                preferred_element_type=jnp.float32).reshape(H, W, C)
    # column blur: contract W against the band (einsum keeps XLA free to
    # pick the layout; out[h,v,c] = Σ_w B[v,w]·x[h,w,c])
    return jnp.einsum("vw,hwc->hvc", Bw, x, precision=hi,
                      preferred_element_type=jnp.float32)


def _sep_filter2d(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 2D filter on [H, W, C] with same (zero) padding.

    Implemented as unrolled static-shift weighted adds rather than
    `conv_general_dilated` with `feature_group_count=C`: grouped depthwise
    convs lower to per-group micro-convs on TPU (~20 ms for an 800²x15
    SSIM stack), while the 2x11 shifted adds fuse into two elementwise
    XLA kernels (~1 ms).  Requires a concrete (non-traced) kernel.
    """
    H, W, C = img.shape
    n = k.shape[0]
    pad = n // 2
    kv = [float(v) for v in k]
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)))
    x = sum(kv[i] * jax.lax.slice_in_dim(x, i, i + H, axis=0)
            for i in range(n))
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    x = sum(kv[i] * jax.lax.slice_in_dim(x, i, i + W, axis=1)
            for i in range(n))
    return x


def _ssim_from_stats(mu1, mu2, e11, e22, e12):
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = e11 - mu1_sq
    s2 = e22 - mu2_sq
    s12 = e12 - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] pair (reference `loss_utils.py:31-62`).

    Uses zero ('same') padding like the torch original — border handling
    must match for loss parity.  The five blurred statistics share two
    depthwise convolutions (channel-stacked) instead of ten.
    """
    k = _gaussian_window(window_size, sigma)
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    filt = _sep_filter2d_matmul if SSIM_MATMUL else _sep_filter2d
    blurred = filt(stack, k)
    C = img1.shape[-1]
    return _ssim_from_stats(blurred[..., 0:C], blurred[..., C:2 * C],
                            blurred[..., 2 * C:3 * C],
                            blurred[..., 3 * C:4 * C],
                            blurred[..., 4 * C:5 * C])


def ssim_pair(img_a: jnp.ndarray, img_b: jnp.ndarray, gt: jnp.ndarray,
              window_size: int = 11, sigma: float = 1.5):
    """(ssim(img_a, gt), ssim(img_b, gt)) with ONE shared blur pass.

    The NeILF loss evaluates SSIM against the same gt for both the
    radiance render and the PBR render (`neilf.py:203-352` twice);
    stacking all eight statistics [a, b, gt, a², b², gt², a·gt, b·gt]
    blurs 24 channels instead of 2 x 15 — the gt moments are shared and
    both passes' fixed costs collapse into one."""
    k = _gaussian_window(window_size, sigma)
    stack = jnp.concatenate(
        [img_a, img_b, gt, img_a * img_a, img_b * img_b, gt * gt,
         img_a * gt, img_b * gt], axis=-1)
    filt = _sep_filter2d_matmul if SSIM_MATMUL else _sep_filter2d
    bl = filt(stack, k)
    C = gt.shape[-1]
    ch = [bl[..., i * C:(i + 1) * C] for i in range(8)]
    mu_a, mu_b, mu_g, e_aa, e_bb, e_gg, e_ag, e_bg = ch
    return (_ssim_from_stats(mu_a, mu_g, e_aa, e_gg, e_ag),
            _ssim_from_stats(mu_b, mu_g, e_bb, e_gg, e_bg))


# ---- row-partial losses (sharded pixel loss for the TP path) ----------
#
# Each mesh member evaluates the GLOBAL loss restricted to a slice of
# pixel rows [r0, r0+rows); summing the partials over the mesh axis
# (psum) reassembles the exact full-image term, so per-member pixel-loss
# FLOPs shrink with the mesh (parallel/render.py `make_tp_train_step`).
# `r0` may be a traced value (lax.axis_index); `rows` is static.  Images
# must be zero-padded to `rows * nshards` rows by the caller so the row
# slices never clamp (`pad_rows`).

def pad_rows(x: jnp.ndarray, total_rows: int) -> jnp.ndarray:
    """Zero-pad [H, ...] to [total_rows, ...] along axis 0."""
    return jnp.pad(
        x, ((0, total_rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _slice_rows(x: jnp.ndarray, r0, rows: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice_in_dim(x, r0, rows, axis=0)


def l1_rows_sum(a_pad: jnp.ndarray, b_pad: jnp.ndarray,
                r0, rows: int) -> jnp.ndarray:
    """Σ |a − b| over pixel rows [r0, r0+rows) of zero-row-padded
    images (padded rows contribute 0 since both operands pad to 0)."""
    return jnp.sum(jnp.abs(_slice_rows(a_pad, r0, rows)
                           - _slice_rows(b_pad, r0, rows)))


def sq_err_rows_sum(a_pad: jnp.ndarray, b_pad: jnp.ndarray,
                    r0, rows: int) -> jnp.ndarray:
    """Σ (a − b)² over pixel rows [r0, r0+rows) (for a psum'd PSNR)."""
    d = _slice_rows(a_pad, r0, rows) - _slice_rows(b_pad, r0, rows)
    return jnp.sum(d * d)


def ssim_rows_sum(img1: jnp.ndarray, img2: jnp.ndarray, r0, rows: int,
                  total_rows: int, window_size: int = 11,
                  sigma: float = 1.5) -> jnp.ndarray:
    """Σ of the GLOBAL 'same'-padded ssim map over map rows
    [r0, r0+rows).

    The row blur uses a dynamic row-slice of the [H, H] Toeplitz band
    (zero-padded to `total_rows` so the slice never clamps), which keeps
    the global border truncation exact regardless of which member owns
    the border rows; rows ≥ H are masked out (an all-zero band row
    would otherwise yield ssim = 1, not 0).  img1/img2 are the UNPADDED
    [H, W, C] images.
    """
    H, W, C = img1.shape
    k = _gaussian_window(window_size, sigma)
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    Bh = jnp.concatenate(
        [_band_matrix(H, k), jnp.zeros((total_rows - H, H), jnp.float32)])
    Bh_rows = jax.lax.dynamic_slice(Bh, (r0, 0), (rows, H))
    # precision=HIGHEST: see _sep_filter2d_matmul — default-precision
    # bf16 operand rounding breaks the E[x²] − μ² variance cancellation
    hi = jax.lax.Precision.HIGHEST
    x = jnp.dot(Bh_rows, stack.reshape(H, W * 5 * C), precision=hi,
                preferred_element_type=jnp.float32).reshape(rows, W, 5 * C)
    Bw = _band_matrix(W, k)
    blurred = jnp.einsum("vw,hwc->hvc", Bw, x, precision=hi,
                         preferred_element_type=jnp.float32)
    mu1 = blurred[..., 0:C]
    mu2 = blurred[..., C:2 * C]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blurred[..., 2 * C:3 * C] - mu1_sq
    s2 = blurred[..., 3 * C:4 * C] - mu2_sq
    s12 = blurred[..., 4 * C:5 * C] - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    valid = ((r0 + jnp.arange(rows)) < H).astype(ssim_map.dtype)
    return jnp.sum(ssim_map * valid[:, None, None])


def image_gradient_mag(data: jnp.ndarray) -> jnp.ndarray:
    """|Sobel_x| + |Sobel_y| of a single-channel [H, W] image with 'same'
    zero padding (reference `cal_gradient`, `loss_utils.py:66-84`).

    Implemented as separable shifted adds on the 2-D array: an NHWC
    C=1 `lax.conv` puts the image in a T(1,128) layout whose minor dim
    is the single channel — 128x lane padding, ~330 MB of HBM traffic
    per 800² pass (profiled at 3.7-5.8 ms per conv; ten of them made
    the PBR smoothness losses ~65 ms of a 113 ms step).  Slices on the
    natural [H, W] T(8,128) layout move only the real 2.6 MB.
    """
    p = jnp.pad(data, 1)
    # Sobel_x = [1,2,1]^T (rows) x [-1,0,1] (cols); |.| is flip-invariant
    sx = p[:-2, :] + 2.0 * p[1:-1, :] + p[2:, :]       # [H, W+2]
    gx = sx[:, 2:] - sx[:, :-2]                         # [H, W]
    sy = p[:, :-2] + 2.0 * p[:, 1:-1] + p[:, 2:]        # [H+2, W]
    gy = sy[2:, :] - sy[:-2, :]                         # [H, W]
    return jnp.abs(gx) + jnp.abs(gy)


def bilateral_weight(image: jnp.ndarray) -> jnp.ndarray:
    """exp(-|∇image|) edge weight, shared by every smoothness term on
    the same gt image (the NeILF loss applies three of them)."""
    return jnp.exp(-image_gradient_mag(jnp.mean(image, axis=-1)))


def bilateral_smooth(data: jnp.ndarray, image: jnp.ndarray,
                     mask: jnp.ndarray,
                     weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """Edge-aware smoothness: mean(|∇data| * exp(-|∇image|) * mask).

    data/image: [H, W, C]; mask: [H, W] or [H, W, 1].
    Matches reference `bilateral_smooth_loss` (`loss_utils.py:85-96`),
    which averages channels before taking gradients.  Pass `weight`
    (from `bilateral_weight`) to share the gt-image gradient across
    multiple terms.
    """
    if weight is None:
        weight = bilateral_weight(image)
    data_grad = image_gradient_mag(jnp.mean(data, axis=-1))
    if mask.ndim == 3:
        mask = mask[..., 0]
    return jnp.mean(data_grad * weight * mask)


def opacity_entropy(opacity: jnp.ndarray, mask: jnp.ndarray,
                    eps: float = 1e-10) -> jnp.ndarray:
    """Binary cross-entropy pushing rendered opacity toward the gt mask
    (reference `render.py:132-140` lambda_mask_entropy)."""
    o = jnp.clip(opacity, eps, 1.0 - eps)
    return -jnp.mean(mask * jnp.log(o) + (1.0 - mask) * jnp.log(1.0 - o))


def normal_consistency(normal: jnp.ndarray, target: jnp.ndarray,
                       weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted (1 - cos) between two [H, W, 3] normal maps
    (reference `render.py:142-162` lambda_normal_render_depth)."""
    cos = jnp.sum(normal * target, axis=-1)
    return jnp.mean(weight * (1.0 - cos))


def tv(img: jnp.ndarray) -> jnp.ndarray:
    """Total variation on [H, W, C]."""
    dx = jnp.abs(img[:, 1:] - img[:, :-1]).mean()
    dy = jnp.abs(img[1:, :] - img[:-1, :]).mean()
    return dx + dy
