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


def test_big_splat_two_class_emission():
    """1 MP-scale coverage (VERDICT r2 #4): a huge near splat spans far more
    tiles than the base 4x4 window. With big_frac the top-radius splats get a
    wider second window — the render must match a uniformly-large window, and
    the duplicate suppression must not double-blend (alpha <= brute force)."""
    hw = 256  # 16x16 tiles
    n = 80
    key = jax.random.PRNGKey(5)
    ks = jax.random.split(key, 6)
    means2d = jax.random.uniform(ks[0], (n, 2), minval=8.0, maxval=hw - 8.0)
    sigma = jax.random.uniform(ks[1], (n,), minval=1.5, maxval=4.0)
    # one giant splat covering most of the screen
    means2d = means2d.at[0].set(jnp.array([hw / 2, hw / 2]))
    sigma = sigma.at[0].set(40.0)
    conics = jnp.stack([1.0 / sigma**2, jnp.zeros(n), 1.0 / sigma**2], axis=-1)
    colors = jax.random.uniform(ks[2], (n, 3))
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    depths = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=5.0)
    radii = 3.0 * sigma
    valid = jnp.ones((n,), bool)
    scene = (means2d, conics, colors, opac, depths, radii, valid)

    # base window only (4x4 = 16 tiles): giant splat clipped
    rgb_clip, _, _ = rasterize(*scene, width=hw, height=hw, tiles_per_gauss=16,
                               max_per_tile=256, tile_chunk=16)
    # two-class emission: base 16 + big 256-tile window for top n//8 radii
    rgb_big, a_big, _ = rasterize(*scene, width=hw, height=hw, tiles_per_gauss=16,
                                  max_per_tile=256, tile_chunk=16,
                                  big_frac=8, big_tiles_per_gauss=256)
    # reference: everyone gets the huge window
    rgb_ref, a_ref, _ = rasterize(*scene, width=hw, height=hw, tiles_per_gauss=256,
                                  max_per_tile=256, tile_chunk=16)

    p_clip = _psnr(rgb_clip, rgb_ref)
    p_big = _psnr(rgb_big, rgb_ref)
    assert p_big > 45.0, f"big-splat window missing coverage: {p_big:.1f} dB"
    assert p_big > p_clip + 5.0, (p_big, p_clip)
    # duplicate suppression: alpha must never exceed the reference
    assert float(jnp.max(a_big - a_ref)) < 1e-4, "double-blended duplicates"
