"""Loss correctness vs torch reference formulas (torch-cpu is available
and framework-agnostic — SSIM/Sobel are computed with torch.nn.functional
as an independent oracle, the same math the reference uses)."""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from relightable3dgaussian_tpu.ops import losses  # noqa: E402


def torch_ssim(a, b, window_size=11, sigma=1.5):
    """Reference-style SSIM with zero-padded gaussian window."""
    x = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    win = (g[:, None] @ g[None, :])[None, None]
    C = a.shape[-1]
    win = win.expand(C, 1, window_size, window_size)
    ta = torch.tensor(a, dtype=torch.float64).permute(2, 0, 1)[None]
    tb_ = torch.tensor(b, dtype=torch.float64).permute(2, 0, 1)[None]
    pad = window_size // 2
    mu1 = TF.conv2d(ta, win, padding=pad, groups=C)
    mu2 = TF.conv2d(tb_, win, padding=pad, groups=C)
    mu1s, mu2s, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = TF.conv2d(ta * ta, win, padding=pad, groups=C) - mu1s
    s2 = TF.conv2d(tb_ * tb_, win, padding=pad, groups=C) - mu2s
    s12 = TF.conv2d(ta * tb_, win, padding=pad, groups=C) - mu12
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1s + mu2s + c1) * (s1 + s2 + c2))
    return float(smap.mean())


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (40, 52, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    return a, b


def test_ssim_matches_torch(imgs):
    a, b = imgs
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    want = torch_ssim(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ssim_identity(imgs):
    a, _ = imgs
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_bilateral_smooth_matches_torch(imgs):
    a, b = imgs
    mask = np.ones(a.shape[:2], np.float32)
    got = float(losses.bilateral_smooth(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))

    # torch oracle (reference bilateral_smooth_loss semantics)
    kx = torch.tensor([[-1.0, 0, 1], [-2, 0, 2], [-1, 0, 1]],
                      dtype=torch.float64)[None, None]
    ky = kx.transpose(-1, -2)

    def grad_mag(img):
        t = torch.tensor(img.mean(-1), dtype=torch.float64)[None, None]
        gx = TF.conv2d(t, kx, padding="same")
        gy = TF.conv2d(t, ky, padding="same")
        return (gx.abs() + gy.abs())[0, 0]

    want = float((grad_mag(a) * torch.exp(-grad_mag(b))).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_psnr_and_entropy(imgs):
    a, b = imgs
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(
        float(losses.psnr(jnp.asarray(a), jnp.asarray(b))),
        -10 * np.log10(mse), rtol=1e-5)
    op = np.clip(np.random.default_rng(1).uniform(0, 1, (8, 8)), 0.01, 0.99)
    m = (np.random.default_rng(2).uniform(0, 1, (8, 8)) > 0.5).astype(
        np.float32)
    want = -np.mean(m * np.log(op) + (1 - m) * np.log(1 - op))
    np.testing.assert_allclose(
        float(losses.opacity_entropy(jnp.asarray(op), jnp.asarray(m))),
        want, rtol=1e-5)


def test_lpips_jax_basic_properties():
    """Self-contained LPIPS: zero on identical images, positive and
    monotone-ish in corruption strength, deterministic across calls."""
    import numpy as np
    from relightable3dgaussian_tpu.training import lpips_jax

    label, fn = lpips_jax.lpips_fn()
    assert label in ("lpips", "lpips_rand")
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    same = float(fn(a, a))
    assert abs(same) < 1e-6
    small = float(fn(a, np.clip(a + 0.05 * rng.normal(size=a.shape)
                                .astype(np.float32), 0, 1)))
    big = float(fn(a, rng.uniform(0, 1, a.shape).astype(np.float32)))
    assert 0 < small < big
    # reproducible (seeded backbone)
    label2, fn2 = lpips_jax.lpips_fn()
    assert float(fn2(a, a * 0.5)) == float(fn(a, a * 0.5))


def test_lpips_missing_weights_clear_error(tmp_path):
    from relightable3dgaussian_tpu.training import lpips_jax
    import pytest
    with pytest.raises(Exception):
        lpips_jax.load_torch_weights(str(tmp_path / "nope.pth"))


def test_ssim_matmul_variant_matches_shifted(imgs):
    """The banded-matmul blur (MXU path) == the shifted-add blur,
    values and gradients, on a non-square image."""
    import jax
    a, b = imgs
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)
    old = losses.SSIM_MATMUL
    try:
        losses.SSIM_MATMUL = True
        v1, g1 = jax.value_and_grad(lambda x: losses.ssim(x, b_j))(a_j)
        losses.SSIM_MATMUL = False
        v0, g0 = jax.value_and_grad(lambda x: losses.ssim(x, b_j))(a_j)
    finally:
        losses.SSIM_MATMUL = old
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-7)


def test_ssim_bounded_and_paths_agree():
    """ssim(x,x) == 1, ssim <= 1 on arbitrary pairs, and the MXU band-
    matmul path equals the shifted-add path.  The r2 matmul blur at TPU
    default precision produced ssim = 1.32 (bf16 operand rounding
    cancels E[x²]−μ²) and silently poisoned every 800² TPU training run
    until round 4 — bench.py re-asserts this on the real device."""
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0, 1, (96, 80, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (96, 80, 3)).astype(np.float32))
    assert abs(float(losses.ssim(a, a)) - 1.0) < 1e-5
    v = float(losses.ssim(a, b))
    assert v <= 1.0
    old = losses.SSIM_MATMUL
    try:
        losses.SSIM_MATMUL = True
        vm = float(losses.ssim(a, b))
        losses.SSIM_MATMUL = False
        vs = float(losses.ssim(a, b))
    finally:
        losses.SSIM_MATMUL = old
    np.testing.assert_allclose(vm, vs, atol=2e-5)


def test_ssim_pair_matches_two_calls():
    import numpy as np
    from relightable3dgaussian_tpu.ops import losses
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (40, 48, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (40, 48, 3)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0, 1, (40, 48, 3)).astype(np.float32))
    sa, sb = losses.ssim_pair(a, b, g)
    np.testing.assert_allclose(float(sa), float(losses.ssim(a, g)),
                               rtol=1e-6)
    np.testing.assert_allclose(float(sb), float(losses.ssim(b, g)),
                               rtol=1e-6)
