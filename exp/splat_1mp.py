"""Splatfacto at 1 MP / 500k-gaussian scale (VERDICT r2 #4): step-time and
sort-share measurements on synthetic gaussians — no dataset needed, pure
kernel-scaling numbers. Readback-synced.

python exp/splat_1mp.py [--side 1024] [--n 500000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.ops.gsplat.rasterize import TILE, _tile_keys_packed, rasterize


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., 0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=1024)
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--big-frac", type=int, default=16)
    args = ap.parse_args()
    side, n = args.side, args.n

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    means2d = jax.random.uniform(ks[0], (n, 2), minval=0.0, maxval=float(side))
    # radius distribution like a trained scene: mostly small, long tail
    sigma = jnp.exp(jax.random.normal(ks[1], (n,)) * 0.8 + 0.7)  # ~2px median
    conics = jnp.stack([1.0 / sigma**2, jnp.zeros(n), 1.0 / sigma**2], axis=-1)
    colors = jax.random.uniform(ks[2], (n, 3))
    opac = jax.random.uniform(ks[3], (n,), minval=0.3, maxval=0.9)
    depths = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=8.0)
    radii = 3.0 * sigma
    valid = jnp.ones((n,), bool)
    scene = (means2d, conics, colors, opac, depths, radii, valid)

    tiles_x = (side + TILE - 1) // TILE

    # --- sort share, old 3-operand vs packed single-key ---
    @jax.jit
    def keys_and_sort_packed(m, r, d, v):
        keys, gids, _ = _tile_keys_packed(m, r, d, v, tiles_x, tiles_x, 16,
                                          big_frac=args.big_frac)
        ks_, ids_ = jax.lax.sort((keys, gids), num_keys=1)
        return ids_

    @jax.jit
    def keys_and_sort_3op(m, r, d, v):
        # the r2 scheme: 16 keys/gauss, 3-operand lexicographic sort
        keys, gids, _ = _tile_keys_packed(m, r, d, v, tiles_x, tiles_x, 16)
        tile = (keys >> jnp.uint32(19)).astype(jnp.int32)
        ks_, _, ids_ = jax.lax.sort((tile, d[gids], gids), num_keys=2)
        return ids_

    for name, fn in [("packed 1-key sort", keys_and_sort_packed),
                     ("3-operand sort   ", keys_and_sort_3op)]:
        r = fn(means2d, radii, depths, valid)
        float(r[0])
        t0 = time.perf_counter()
        for _ in range(5):
            r = fn(means2d, radii, depths, valid)
            float(r[0])
        dt = (time.perf_counter() - t0) / 5
        print(f"{name}: {dt*1e3:8.1f} ms ({r.shape[0]/1e6:.1f}M keys)", flush=True)

    # --- full rasterize fwd and fwd+bwd at scale ---
    def loss(m, cn, cl, op, d):
        rgb, a, _ = rasterize(m, cn, cl, op, d, radii, valid, width=side,
                              height=side, tiles_per_gauss=16, tile_chunk=64,
                              mode="saturating", big_frac=args.big_frac)
        return jnp.mean(rgb) + jnp.mean(a)

    fwd = jax.jit(loss)
    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
    for name, fn in [("rasterize fwd", fwd), ("rasterize fwd+bwd", grad)]:
        r = fn(means2d, conics, colors, opac, depths)
        sync(r if not isinstance(r, tuple) else r[0])
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(means2d, conics, colors, opac, depths)
            sync(r if not isinstance(r, tuple) else r[0])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name} {side}^2 n={n}: {dt*1e3:8.1f} ms", flush=True)

    # emission-clipping rate: fraction of valid splats whose 3-sigma bbox
    # exceeds their emission window (base 4x4 / big 8x8)
    r_np = np.asarray(radii)
    span = np.ceil(2 * r_np / TILE)  # tiles per side
    base_clip = float(np.mean(span > 4))
    b = n // args.big_frac
    thresh = np.partition(r_np, -b)[-b]
    big_clip = float(np.mean((span > 8) & (r_np >= thresh)))
    print(f"bbox > base window: {base_clip*100:.2f}% of splats; "
          f"> big window among top-{args.big_frac}th: {big_clip*100:.3f}%",
          flush=True)


if __name__ == "__main__":
    main()
