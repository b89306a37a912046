"""LPIPS perceptual metric (reference models/nerfacto.py:252 uses
torchmetrics' LPIPS with a pretrained VGG/AlexNet backbone).

Pure-JAX VGG16-feature LPIPS. Pretrained weights cannot be bundled in this
offline build, so there are two modes:

  * real mode — a weights file (``.npz``) converted from torchvision VGG16 +
    lpips linear heads is provided via ``NST_LPIPS_WEIGHTS`` (or found at
    ``~/.cache/nerfstudio_tpu/lpips_vgg.npz``). The metric is then reported
    as ``lpips`` and matches the published metric.
  * random-VGG mode — the FULL VGG16/LPIPS architecture with fixed-seed
    He-initialized filters and uniform linear heads. The LPIPS paper itself
    measures random networks under this protocol at ~0.61 2AFC — above
    SSIM/FSIM, below trained nets. NOT comparable to published LPIPS
    numbers, so it is reported under the distinct key ``lpips_rand_vgg``.

Use ``tools/convert_lpips_weights.py`` (requires torch + torchvision + lpips
with network access) to produce the npz.

Fallback validation (``tools/validate_lpips.py`` ->
``benchmarks/lpips_validation.json``): perfect per-family monotonicity
(Spearman rho = 1.0 over noise/blur/contrast/block/quantize x 5 strengths x
3 texture classes), pooled rho 0.90 vs (1-SSIM) / 0.83 vs MSE, and a
matched-MSE shift-vs-noise ratio < 1 (the deep-feature hallmark pointwise
metrics lack).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 "features" layout: conv indices within nn.Sequential and
# the relu outputs LPIPS taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512)
_VGG16_TAPS = (1, 3, 6, 9, 12)  # conv index (0-based among convs) after which to tap
# LPIPS input normalization (the "scaling layer" in richzhang/PerceptualSimilarity)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray]) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    # f32 operands (TPU default truncates conv operands to bf16; published
    # LPIPS values are f32 — see utils/metrics._filter2d for the SSIM case)
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST
    )
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _normalize(feat: jnp.ndarray) -> jnp.ndarray:
    return feat / jnp.sqrt(jnp.sum(feat**2, axis=1, keepdims=True) + 1e-10)


def _vgg16_taps(x: jnp.ndarray, params) -> list:
    """x: (1, 3, H, W) in [-1, 1] after LPIPS scaling. Returns tapped relus."""
    x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    taps = []
    conv_i = 0
    for c in _VGG16_CFG:
        if c == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        else:
            x = jax.nn.relu(_conv(x, params[f"conv{conv_i}_w"], params.get(f"conv{conv_i}_b")))
            if conv_i in _VGG16_TAPS:
                taps.append(x)
            conv_i += 1
    return taps


def _lpips_real(pred: jnp.ndarray, target: jnp.ndarray, params) -> jnp.ndarray:
    """pred/target: (H, W, 3) in [0, 1]."""

    def prep(img):
        return jnp.moveaxis(img * 2.0 - 1.0, -1, 0)[None]

    fp = _vgg16_taps(prep(pred), params)
    ft = _vgg16_taps(prep(target), params)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        d = (_normalize(a) - _normalize(b)) ** 2
        lin = params[f"lin{i}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


# ---------------------------------------------------------------------------
# random-VGG mode: the FULL VGG16/LPIPS architecture with deterministic
# He-initialized random filters and uniform (1/C) linear heads.
#
# Why this is a principled offline fallback: the LPIPS paper (Zhang et al.,
# CVPR 2018, "The Unreasonable Effectiveness of Deep Features...", Table 5)
# measures RANDOMLY-initialized networks under the same unit-normalized
# feature-distance protocol at ~0.61 2AFC — clearly above the best
# traditional metrics (SSIM/FSIM ~0.58-0.60) though below the trained nets
# (~0.69). The architecture + normalization carry most of the signal.
# Reported under the distinct key ``lpips_rand_vgg``: NOT comparable to
# published LPIPS values, but a real perceptual metric with documented
# provenance (replaces the round-1/2 4-layer ``lpips_proxy``).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _rand_vgg_params():
    rng = np.random.default_rng(20260819)
    params = {}
    cin = 3
    conv_i = 0
    for c in _VGG16_CFG:
        if c == "M":
            continue
        fan_in = cin * 9
        params[f"conv{conv_i}_w"] = jnp.asarray(
            rng.standard_normal((c, cin, 3, 3)).astype(np.float32)
            * np.sqrt(2.0 / fan_in)
        )
        params[f"conv{conv_i}_b"] = jnp.zeros((c,), jnp.float32)
        cin = c
        conv_i += 1
    # uniform linear heads: mean over channels (the paper's "lin" setting
    # collapses to this when untrained)
    tap_channels = (64, 128, 256, 512, 512)
    for i, ch in enumerate(tap_channels):
        params[f"lin{i}_w"] = jnp.full((1, ch, 1, 1), 1.0 / ch, jnp.float32)
    return params


def _lpips_rand(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return _lpips_real(pred, target, _rand_vgg_params())


# ---------------------------------------------------------------------------


def _default_weight_paths():
    env = os.environ.get("NST_LPIPS_WEIGHTS")
    paths = []
    if env:
        paths.append(Path(env))
    paths.append(Path.home() / ".cache" / "nerfstudio_tpu" / "lpips_vgg.npz")
    return paths


@functools.lru_cache(maxsize=1)
def _load_weights():
    for p in _default_weight_paths():
        if p.is_file():
            data = np.load(p)
            return {k: jnp.asarray(data[k]) for k in data.files}
    return None


def lpips_fn() -> Tuple[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray], str]:
    """Return (metric_fn, metric_name).

    ``metric_name`` is "lpips" only when real pretrained weights are loaded;
    otherwise "lpips_rand_vgg" (full VGG16/LPIPS architecture, fixed-seed
    He-random filters — see the provenance note above) so eval JSONs are
    never mistaken for published LPIPS numbers."""
    params = _load_weights()
    if params is not None:
        return functools.partial(_lpips_real, params=params), "lpips"
    return _lpips_rand, "lpips_rand_vgg"
