"""Saturating-blend rasterizer (ops/gsplat/rasterize.py mode="saturating"):
values against the brute-force per-pixel blend and the bounded path on
shallow scenes; gradients against autodiff of the bounded path (identical
programs when nothing truncates/saturates) and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.ops.gsplat.rasterize import rasterize


def _scene(n=120, hw=64, seed=0, opac_range=(0.3, 0.9)):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    means2d = jax.random.uniform(ks[0], (n, 2), minval=4.0, maxval=hw - 4.0)
    sigma = jax.random.uniform(ks[1], (n,), minval=1.0, maxval=4.0)
    conics = jnp.stack([1.0 / sigma**2, jnp.zeros(n), 1.0 / sigma**2], axis=-1)
    colors = jax.random.uniform(ks[2], (n, 3))
    opac = jax.random.uniform(ks[3], (n,), minval=opac_range[0], maxval=opac_range[1])
    depths = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=5.0)
    radii = 3.0 * sigma
    valid = jnp.ones((n,), bool)
    return means2d, conics, colors, opac, depths, radii, valid


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return -10 * np.log10(max(mse, 1e-12))


def _brute(scene, hw):
    means2d, conics, colors, opac, depths, _, _ = scene
    order = np.argsort(np.asarray(depths))
    m2 = np.asarray(means2d)[order]
    cn = np.asarray(conics)[order]
    cl = np.asarray(colors)[order]
    op = np.asarray(opac)[order]
    ys, xs = np.mgrid[0:hw, 0:hw]
    px = np.stack([xs + 0.5, ys + 0.5], axis=-1)
    out = np.zeros((hw, hw, 3))
    T = np.ones((hw, hw))
    for g in range(len(m2)):
        d = px - m2[g]
        power = (
            -0.5 * (cn[g, 0] * d[..., 0] ** 2 + cn[g, 2] * d[..., 1] ** 2)
            - cn[g, 1] * d[..., 0] * d[..., 1]
        )
        a = np.clip(op[g] * np.exp(power), 0, 0.999)
        a = np.where(a < 1.0 / 255.0, 0.0, a)
        out += (T * a)[..., None] * cl[g]
        T = T * (1 - a)
    return out, 1.0 - T


def test_saturating_matches_bruteforce():
    hw = 48
    scene = _scene(n=60, hw=hw, seed=3)
    rgb, alpha, _ = rasterize(
        *scene, width=hw, height=hw, tiles_per_gauss=64, tile_chunk=16,
        mode="saturating", blend_chunk_size=16,
    )
    out, acc = _brute(scene, hw)
    assert _psnr(jnp.asarray(out), rgb) > 30.0
    np.testing.assert_allclose(np.asarray(alpha)[..., 0], acc, atol=2e-3)


def test_saturating_beats_bounded_on_deep_tiles():
    """Many low-opacity gaussians stacked: the bounded path truncates, the
    saturating path must still match brute force."""
    hw = 32
    scene = _scene(n=600, hw=hw, seed=5, opac_range=(0.02, 0.08))
    out, _ = _brute(scene, hw)
    rgb_sat, _, _ = rasterize(
        *scene, width=hw, height=hw, tiles_per_gauss=16, tile_chunk=4,
        mode="saturating", blend_chunk_size=32,
    )
    rgb_bnd, _, _ = rasterize(
        *scene, width=hw, height=hw, tiles_per_gauss=16, max_per_tile=64,
        tile_chunk=4, mode="bounded",
    )
    p_sat = _psnr(jnp.asarray(out), rgb_sat)
    p_bnd = _psnr(jnp.asarray(out), rgb_bnd)
    assert p_sat > 38.0, f"saturating deviates: {p_sat:.1f} dB"
    assert p_sat > p_bnd + 5.0, f"sat {p_sat:.1f} vs bounded {p_bnd:.1f}"


def test_saturating_grads_match_bounded_autodiff():
    """On a shallow scene (no truncation, no saturation) the two paths
    compute the same function — gradients must agree."""
    hw = 32
    scene = _scene(n=40, hw=hw, seed=7)
    means2d, conics, colors, opac, depths, radii, valid = scene
    tgt = jax.random.uniform(jax.random.PRNGKey(9), (hw, hw, 3))

    def loss(mode):
        def f(m2, cl, op):
            rgb, alpha, dep = rasterize(
                m2, conics, cl, op, depths, radii, valid,
                width=hw, height=hw, tiles_per_gauss=64, max_per_tile=256,
                tile_chunk=4, mode=mode, blend_chunk_size=16,
            )
            return jnp.sum((rgb - tgt) ** 2) + jnp.sum(alpha) * 0.1 + jnp.sum(dep) * 1e-3
        return f

    g_sat = jax.grad(loss("saturating"), argnums=(0, 1, 2))(means2d, colors, opac)
    g_bnd = jax.grad(loss("bounded"), argnums=(0, 1, 2))(means2d, colors, opac)
    for gs, gb, name in zip(g_sat, g_bnd, ("means2d", "colors", "opac")):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gb), rtol=2e-3, atol=2e-4, err_msg=name
        )


def test_saturating_grads_fd_deep():
    """Finite-difference spot check on a deep scene where early termination
    is active (opacity gradient through the full recurrence)."""
    hw = 16
    scene = _scene(n=120, hw=hw, seed=11, opac_range=(0.3, 0.95))
    means2d, conics, colors, opac, depths, radii, valid = scene

    def loss(op):
        rgb, _, _ = rasterize(
            means2d, conics, colors, op, depths, radii, valid,
            width=hw, height=hw, tiles_per_gauss=16, tile_chunk=1,
            mode="saturating", blend_chunk_size=8,
        )
        return jnp.sum(rgb * jnp.cos(jnp.arange(rgb.size).reshape(rgb.shape)))

    g = np.asarray(jax.grad(loss)(opac))
    rng = np.random.default_rng(0)
    op0 = np.asarray(opac, np.float64)
    picks = rng.choice(len(op0), 8, replace=False)
    for i in picks:
        eps = 1e-4
        p = op0.copy(); p[i] += eps
        m = op0.copy(); m[i] -= eps
        fd = (float(loss(jnp.asarray(p, jnp.float32))) - float(loss(jnp.asarray(m, jnp.float32)))) / (2 * eps)
        assert abs(fd - g[i]) <= 0.02 * max(1.0, abs(g[i])) + 5e-2, (i, fd, g[i])
