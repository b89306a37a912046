"""Empirical validation of the offline LPIPS fallback (utils/lpips.py).

No pretrained VGG weights can enter this zero-egress image, so eval reports
``lpips_rand_vgg`` — the FULL VGG16/LPIPS architecture with fixed-seed
He-random filters (the LPIPS paper, Zhang et al. CVPR 2018 Table 5, measures
random nets under this protocol at ~0.61 2AFC: above SSIM/FSIM, below
trained nets). This tool documents how the fallback BEHAVES as a perceptual
metric (VERDICT r2 #6: "validate ... documenting the correlation"):

  1. monotonicity: Spearman rank correlation between distortion strength and
     metric value, per distortion family (noise/blur/contrast/block/JPEG-ish)
     on several procedural texture classes;
  2. cross-metric agreement: pooled Spearman vs (1-SSIM) and vs MSE —
     a sane perceptual metric correlates with but does not equal either;
  3. the deep-feature hallmark: small geometric shifts cost LESS than
     matched-MSE pixel noise (pointwise metrics can't do this) — reported
     as the shift/noise distance ratio (<1 = perceptual behavior).

Writes ``benchmarks/lpips_validation.json``. Reference metric contract:
reference nerfstudio/models/nerfacto.py:246-252 (torchmetrics LPIPS-VGG).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter
from scipy.stats import spearmanr

from nerfstudio_tpu.utils.lpips import lpips_fn
from nerfstudio_tpu.utils.metrics import ssim

HW = 96


def _bases():
    """Three texture classes: smooth waves, checker, filtered noise."""
    yy, xx = np.mgrid[0:HW, 0:HW] / HW
    waves = np.stack(
        [np.sin(9 * xx + 4 * yy), np.sin(7 * yy + 1.0), np.cos(5 * (xx + yy))], -1
    ).astype(np.float32) * 0.4 + 0.5
    checker = np.stack(
        [
            ((np.floor(8 * xx) + np.floor(8 * yy)) % 2),
            ((np.floor(16 * xx) + np.floor(16 * yy)) % 2) * 0.6 + 0.2,
            np.clip(xx + 0.2, 0, 1),
        ],
        -1,
    ).astype(np.float32)
    rng = np.random.default_rng(7)
    tex = gaussian_filter(rng.uniform(size=(HW, HW, 3)).astype(np.float32), (2, 2, 0))
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-9)
    return {"waves": waves, "checker": checker, "texture": tex}


def _distort(img: np.ndarray, family: str, s: float, rng) -> np.ndarray:
    if family == "noise":
        out = img + rng.normal(scale=s, size=img.shape).astype(np.float32)
    elif family == "blur":
        out = np.stack([gaussian_filter(img[..., c], s) for c in range(3)], -1)
    elif family == "contrast":
        out = (img - 0.5) * (1.0 - s) + 0.5
    elif family == "block":
        out = img.copy()
        n = int(s * 24)
        for _ in range(n):
            y, x = rng.integers(0, HW - 8, 2)
            out[y : y + 8, x : x + 8] = rng.uniform(size=3)
    elif family == "quantize":
        levels = max(2, int(64 * (1.0 - s) + 2))
        out = np.round(img * levels) / levels
    else:
        raise ValueError(family)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def main() -> None:
    fn, name = lpips_fn()
    f = jax.jit(fn)
    bases = _bases()
    strengths = {
        "noise": [0.02, 0.05, 0.1, 0.2, 0.35],
        "blur": [0.5, 1.0, 2.0, 3.5, 5.0],
        "contrast": [0.1, 0.25, 0.45, 0.65, 0.85],
        "block": [0.1, 0.3, 0.5, 0.7, 1.0],
        "quantize": [0.2, 0.5, 0.75, 0.9, 0.97],
    }
    rng = np.random.default_rng(3)

    per_family = {}
    pooled_lpips, pooled_dssim, pooled_mse = [], [], []
    for family, ss in strengths.items():
        rhos = []
        for bname, img in bases.items():
            vals = []
            for s in ss:
                d = _distort(img, family, s, rng)
                v = float(f(jnp.asarray(img), jnp.asarray(d)))
                vals.append(v)
                pooled_lpips.append(v)
                pooled_dssim.append(1.0 - float(ssim(jnp.asarray(img), jnp.asarray(d))))
                pooled_mse.append(float(((img - d) ** 2).mean()))
            rho = spearmanr(ss, vals).statistic
            rhos.append(float(rho))
        per_family[family] = {
            "spearman_strength_vs_metric": round(float(np.mean(rhos)), 4),
            "per_base": [round(r, 4) for r in rhos],
        }

    rho_dssim = float(spearmanr(pooled_lpips, pooled_dssim).statistic)
    rho_mse = float(spearmanr(pooled_lpips, pooled_mse).statistic)

    # deep-feature hallmark: matched-MSE 2px shift vs noise
    ratios = []
    for img in bases.values():
        shifted = np.roll(img, 2, axis=1)
        mse = float(((shifted - img) ** 2).mean())
        noisy = np.clip(
            img + rng.normal(scale=np.sqrt(mse), size=img.shape).astype(np.float32), 0, 1
        )
        d_shift = float(f(jnp.asarray(img), jnp.asarray(shifted)))
        d_noise = float(f(jnp.asarray(img), jnp.asarray(noisy)))
        ratios.append(d_shift / max(d_noise, 1e-9))

    result = {
        "metric": name,
        "protocol": "procedural textures x {noise, blur, contrast, block, quantize} x 5 strengths",
        "per_family_monotonicity": per_family,
        "pooled_spearman_vs_1minus_ssim": round(rho_dssim, 4),
        "pooled_spearman_vs_mse": round(rho_mse, 4),
        "shift_vs_matched_mse_noise_ratio": round(float(np.mean(ratios)), 4),
        "paper_context": "random nets ~0.61 2AFC vs SSIM 0.58-0.60, trained ~0.69 (Zhang et al. 2018, Table 5)",
    }
    out = Path(__file__).parent.parent / "benchmarks" / "lpips_validation.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))
    print(f"wrote {out}")

    assert all(
        v["spearman_strength_vs_metric"] > 0.9 for v in per_family.values()
    ), "monotonicity regression"
    assert result["shift_vs_matched_mse_noise_ratio"] < 1.0, "no perceptual margin"


if __name__ == "__main__":
    main()
