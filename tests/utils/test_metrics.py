"""Golden-value tests for image metrics against independent references.

Mirrors the reference's torchmetrics/pytorch-msssim usage
(reference nerfstudio/models/nerfacto.py:246-252): our fused-jax SSIM is
validated against a direct scipy/numpy implementation of the standard
Wang et al. SSIM with gaussian window (the same formulation torchmetrics
uses with gaussian_kernel=True, sigma=1.5, k1=0.01, k2=0.03)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from nerfstudio_tpu.utils.metrics import psnr, ssim


def _ssim_reference(a: np.ndarray, b: np.ndarray, sigma=1.5, k1=0.01, k2=0.03):
    """Independent SSIM: per-channel gaussian-window moments via scipy."""
    # truncate at the same 11-tap support as the framework kernel
    # (gaussian_filter radius 5 == filter_size 11)
    f = lambda x: np.stack(
        [gaussian_filter(x[..., c], sigma, truncate=5 / sigma, mode="nearest")
         for c in range(x.shape[-1])], axis=-1
    )
    mu_a, mu_b = f(a), f(b)
    va = f(a * a) - mu_a**2
    vb = f(b * b) - mu_b**2
    vab = f(a * b) - mu_a * mu_b
    c1, c2 = k1**2, k2**2
    s = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def test_ssim_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(1.0, abs=1e-5)


def test_ssim_vs_independent_reference():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    for noise in (0.02, 0.1, 0.3):
        b = np.clip(a + rng.normal(scale=noise, size=a.shape).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = _ssim_reference(a, b)
        # boundary handling differs slightly (valid-window vs nearest-pad);
        # interior-dominated 64x64 images agree to ~1e-2
        assert ours == pytest.approx(ref, abs=2e-2), (noise, ours, ref)


def test_ssim_immune_to_default_low_precision():
    """On TPU the DEFAULT conv precision truncates f32 operands to bf16 and
    SSIM's variance cancellation (mu_pp - mu_p^2) collapses — measured
    0.88 -> 0.30 on a real eval pair (r4). The convs must pin
    Precision.HIGHEST so the metric is identical under any default."""
    import jax

    rng = np.random.default_rng(7)
    a = rng.uniform(size=(96, 96, 3)).astype(np.float32)
    # smooth, low-contrast content — the cancellation-sensitive regime
    from scipy.ndimage import gaussian_filter

    a = gaussian_filter(a, (3, 3, 0)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.03, size=a.shape).astype(np.float32), 0, 1)
    exact = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    with jax.default_matmul_precision("bfloat16"):
        low = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert low == pytest.approx(exact, abs=1e-3), (low, exact)


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(48, 48, 3)).astype(np.float32)
    vals = []
    for noise in (0.01, 0.05, 0.2, 0.5):
        b = np.clip(a + rng.normal(scale=noise, size=a.shape).astype(np.float32), 0, 1)
        vals.append(float(ssim(jnp.asarray(a), jnp.asarray(b))))
    assert vals == sorted(vals, reverse=True)


def test_psnr_golden():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = -10 log10(0.01) = 20
    assert float(psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(20.0, abs=1e-4)


def test_lpips_rand_vgg_properties():
    """Perceptual-metric sanity of the random-VGG LPIPS fallback: identity is
    zero, distance grows monotonically with distortion strength, and small
    geometric shifts of texture cost less than matched-MSE pixel noise (the
    deep-feature hallmark pointwise metrics lack)."""
    from nerfstudio_tpu.utils.lpips import lpips_fn

    fn, name = lpips_fn()
    assert name in ("lpips", "lpips_rand_vgg")
    rng = np.random.default_rng(5)
    # smooth textured image (noise is too feature-less for the shift check)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    img = np.stack(
        [np.sin(9 * xx + 4 * yy), np.sin(7 * yy), np.cos(5 * (xx + yy))], axis=-1
    ).astype(np.float32) * 0.4 + 0.5

    assert float(fn(jnp.asarray(img), jnp.asarray(img))) == pytest.approx(0.0, abs=1e-6)

    vals = []
    for noise in (0.02, 0.08, 0.25):
        b = np.clip(img + rng.normal(scale=noise, size=img.shape).astype(np.float32), 0, 1)
        vals.append(float(fn(jnp.asarray(img), jnp.asarray(b))))
    assert vals == sorted(vals) and vals[0] > 0.0

    # 2px translation vs noise at MATCHED mse
    shifted = np.roll(img, 2, axis=1)
    mse = float(((shifted - img) ** 2).mean())
    noisy = np.clip(
        img + rng.normal(scale=np.sqrt(mse), size=img.shape).astype(np.float32), 0, 1
    )
    d_shift = float(fn(jnp.asarray(img), jnp.asarray(shifted)))
    d_noise = float(fn(jnp.asarray(img), jnp.asarray(noisy)))
    assert d_shift < d_noise, (d_shift, d_noise)


def test_knn_vs_bruteforce():
    from nerfstudio_tpu.utils.math import k_nearest_neighbors

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    d, idx = k_nearest_neighbors(jnp.asarray(pts), 3, block=64)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref_i = np.argsort(d2, axis=1)[:, :3]
    ref_d = np.sqrt(np.take_along_axis(d2, ref_i, 1))
    # distances agree (exact recompute); indices may flip on near-ties
    assert np.abs(np.asarray(d) - ref_d).max() < 5e-2
    assert (np.asarray(idx)[:, 0] == ref_i[:, 0]).mean() > 0.97
