"""Rasterizer budget-truncation parity (VERDICT r1 weak #11): the bounded
tiles_per_gauss / max_per_tile capacities must not visibly change renders —
compare default budgets against 4x budgets, and against an unbounded
brute-force per-pixel blend."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.ops.gsplat.rasterize import rasterize


def _scene(n=120, hw=64, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    means2d = jax.random.uniform(ks[0], (n, 2), minval=4.0, maxval=hw - 4.0)
    sigma = jax.random.uniform(ks[1], (n,), minval=1.0, maxval=4.0)
    conics = jnp.stack([1.0 / sigma**2, jnp.zeros(n), 1.0 / sigma**2], axis=-1)
    colors = jax.random.uniform(ks[2], (n, 3))
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    depths = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=5.0)
    radii = 3.0 * sigma
    valid = jnp.ones((n,), bool)
    return means2d, conics, colors, opac, depths, radii, valid


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return -10 * np.log10(max(mse, 1e-12))


def test_budget_truncation_parity():
    hw = 64
    scene = _scene(hw=hw)
    rgb_small, _, _ = rasterize(*scene, width=hw, height=hw, tiles_per_gauss=16,
                                max_per_tile=128, tile_chunk=16)
    rgb_big, _, _ = rasterize(*scene, width=hw, height=hw, tiles_per_gauss=64,
                              max_per_tile=512, tile_chunk=16)
    p = _psnr(rgb_small, rgb_big)
    assert p > 40.0, f"budget truncation changes the render: psnr {p:.1f} dB"


def test_matches_bruteforce_blend():
    """Front-to-back alpha blending over ALL gaussians per pixel (no tiles,
    no budgets) — the ground truth the tiled kernel must reproduce."""
    hw = 48
    means2d, conics, colors, opac, depths, radii, valid = _scene(n=60, hw=hw, seed=3)
    rgb, alpha, _ = rasterize(
        means2d, conics, colors, opac, depths, radii, valid,
        width=hw, height=hw, tiles_per_gauss=64, max_per_tile=512, tile_chunk=16,
    )

    order = np.argsort(np.asarray(depths))
    m2 = np.asarray(means2d)[order]
    cn = np.asarray(conics)[order]
    cl = np.asarray(colors)[order]
    op = np.asarray(opac)[order]
    ys, xs = np.mgrid[0:hw, 0:hw]
    px = np.stack([xs + 0.5, ys + 0.5], axis=-1)  # pixel centers
    out = np.zeros((hw, hw, 3))
    T = np.ones((hw, hw))
    for g in range(len(m2)):
        d = px - m2[g]
        power = -0.5 * (cn[g, 0] * d[..., 0] ** 2 + cn[g, 2] * d[..., 1] ** 2) - cn[g, 1] * d[..., 0] * d[..., 1]
        a = np.clip(op[g] * np.exp(power), 0, 0.999)
        a = np.where(a < 1.0 / 255.0, 0.0, a)  # match the kernel's alpha cutoff
        out += (T * a)[..., None] * cl[g]
        T = T * (1 - a)

    p = _psnr(jnp.asarray(out), rgb)
    assert p > 30.0, f"tiled rasterizer deviates from brute force: {p:.1f} dB"
