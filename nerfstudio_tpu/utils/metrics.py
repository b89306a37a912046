"""Image quality metrics in pure JAX: PSNR, SSIM (LPIPS in utils/lpips.py).

Replaces torchmetrics / pytorch-msssim / lpips (reference
models/nerfacto.py:246-252)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10) / max_val**2)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _filter2d(img: jnp.ndarray, kernel1d: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Separable gaussian blur. img: (H, W, C).

    precision=HIGHEST (the ssim() default) is load-bearing: on TPU the
    DEFAULT conv precision truncates f32 operands to bf16, and SSIM's
    variance terms (mu_pp - mu_p^2) then cancel catastrophically — measured
    0.88 -> 0.30 on a real eval pair. Every r2/r3 on-device gate SSIM
    silently underestimated quality because of this (the r3 'nerfacto basic
    SSIM failure' was this metric bug, not the model)."""
    k = kernel1d
    pad = len(k) // 2
    img = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        img, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn, precision=precision
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn, precision=precision
    )
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Structural similarity for (H, W, C) images in [0, max_val].

    ``precision`` pins the conv operand precision; the HIGHEST default is
    required for a correct METRIC on TPU (see _filter2d). A training LOSS
    may pass None to keep the fast bf16-operand convs — gradient noise
    there is harmless and the 1024^2 splat loss conv is 16x cheaper."""
    kernel = _gaussian_kernel(filter_size, filter_sigma)
    _filter2d_p = functools.partial(_filter2d, precision=precision)
    mu_p = _filter2d_p(pred, kernel)
    mu_t = _filter2d_p(target, kernel)
    mu_pp = _filter2d_p(pred * pred, kernel)
    mu_tt = _filter2d_p(target * target, kernel)
    mu_pt = _filter2d_p(pred * target, kernel)
    sigma_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    sigma_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    sigma_pt = mu_pt - mu_p * mu_t
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * sigma_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (sigma_p + sigma_t + c2)
    )
    return jnp.mean(ssim_map)


# LPIPS lives in utils/lpips.py (real VGG weights when available, else a
# clearly-labeled proxy). Kept as a compat alias; prefer lpips_fn().
def lpips(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    from nerfstudio_tpu.utils.lpips import lpips_fn

    fn, _ = lpips_fn()
    return fn(pred, target)
