"""Image quality metrics in pure JAX: PSNR, SSIM, LPIPS.

Replaces torchmetrics / pytorch-msssim / lpips (reference
models/nerfacto.py:246-252). LPIPS uses a small conv feature network; without
pretrained VGG weights available offline it runs with normalized random
features (NOTE: correlates with but does not equal torch-lpips — gate any
cross-framework comparison on PSNR/SSIM)."""

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


def _filter2d(img: jnp.ndarray, kernel1d: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur. img: (H, W, C)."""
    k = kernel1d
    pad = len(k) // 2
    img = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity for (H, W, C) images in [0, max_val]."""
    kernel = _gaussian_kernel(filter_size, filter_sigma)
    mu_p = _filter2d(pred, kernel)
    mu_t = _filter2d(target, kernel)
    mu_pp = _filter2d(pred * pred, kernel)
    mu_tt = _filter2d(target * target, kernel)
    mu_pt = _filter2d(pred * target, kernel)
    sigma_p = jnp.maximum(mu_pp - mu_p**2, 0.0)
    sigma_t = jnp.maximum(mu_tt - mu_t**2, 0.0)
    sigma_pt = mu_pt - mu_p * mu_t
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * sigma_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (sigma_p + sigma_t + c2)
    )
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# LPIPS-style perceptual distance
# ---------------------------------------------------------------------------

_LPIPS_CHANNELS = (16, 32, 64, 128)


def _lpips_features(img: jnp.ndarray, weights) -> list:
    """Small strided conv stack; features unit-normalized per-pixel."""
    x = (img - 0.5) * 2.0  # [-1, 1]
    x = jnp.moveaxis(x, -1, 0)[None]  # (1, C, H, W)
    feats = []
    for i, w in enumerate(weights):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(x, w, (2, 2), "SAME", dimension_numbers=dn)
        x = jax.nn.relu(x) if i < len(weights) - 1 else x
        norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True) + 1e-10)
        feats.append(x / norm)
    return feats


@functools.lru_cache(maxsize=1)
def _lpips_weights():
    rng = np.random.default_rng(1234)
    weights = []
    cin = 3
    for cout in _LPIPS_CHANNELS:
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        w /= np.sqrt(cin * 9)
        weights.append(jnp.asarray(w))
        cin = cout
    return tuple(weights)


def lpips(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between (H, W, 3) images in [0,1]."""
    weights = _lpips_weights()
    fp = _lpips_features(pred, weights)
    ft = _lpips_features(target, weights)
    dist = 0.0
    for a, b in zip(fp, ft):
        dist = dist + jnp.mean((a - b) ** 2)
    return dist
