"""Multiresolution hash-grid encoding op (Instant-NGP).

Replaces tiny-cuda-nn's HashGrid (reference field_components/encodings.py:
307-463 torch fallback; tcnn config :362-380). Two implementations:

  * ``hash_encode`` — pure-XLA, TPU-layout-aware: the level and corner loops
    are statically unrolled so every large intermediate is a flat ``(N,)``
    vector (f32 tiles are (8,128) — ANY big tensor with a tiny trailing dim
    pads catastrophically, e.g. (N,L,8,3) int32 corners pad 16-64x and OOM'd
    a 16G chip at N=1M). The table is stored feature-major ``(F, L*T)`` so
    each gather is a flat vector gather.
  * a Pallas fused hash-encode+MLP kernel lives in ``ops/fused_hash_mlp.py``
    (the tcnn ``NetworkWithInputEncoding`` equivalent).

Hash function: XOR of coordinate-wise products with primes
(1, 2654435761, 805459861) — the Instant-NGP spatial hash (paper eq. 4;
reference encodings.py:398-415 uses the same primes). Coarse levels whose
dense grid fits in the table are indexed densely (collision-free), matching
tcnn behaviour; dense-vs-hashed is static per level."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def compute_level_resolutions(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Geometric growth factor exp((ln max - ln min)/(L-1)) (reference :341)."""
    if num_levels > 1:
        growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    return np.floor(min_res * growth ** np.arange(num_levels)).astype(np.int64)


@functools.partial(jax.jit, static_argnames=("num_levels", "min_res", "max_res", "hash_table_size"))
def hash_encode(
    positions: jnp.ndarray,
    table: jnp.ndarray,
    *,
    num_levels: int,
    min_res: int,
    max_res: int,
    hash_table_size: int,
) -> jnp.ndarray:
    """Encode positions in [0,1]^3.

    positions: (..., 3); table: (num_levels * hash_table_size, F).
    Returns (..., num_levels * F).
    """
    features_per_level = table.shape[-1]
    batch_shape = positions.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    pos = positions.reshape(n, 3)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]  # flat (N,) vectors

    resolutions = compute_level_resolutions(num_levels, min_res, max_res)
    # feature-major flat table: (F, L*T) — vector gathers, no trailing-dim pad
    table_t = table.T.reshape(features_per_level, num_levels * hash_table_size)

    out_channels = []
    for level in range(num_levels):
        res = float(resolutions[level])
        res_i = int(resolutions[level])
        dense = (res_i + 1) ** 3 <= hash_table_size
        level_offset = level * hash_table_size

        sx, sy, sz = x * res, y * res, z * res
        fx, fy, fz = jnp.floor(sx), jnp.floor(sy), jnp.floor(sz)
        ox, oy, oz = sx - fx, sy - fy, sz - fz
        ix0, iy0, iz0 = fx.astype(jnp.int32), fy.astype(jnp.int32), fz.astype(jnp.int32)

        acc = [jnp.zeros((n,), dtype=jnp.float32) for _ in range(features_per_level)]
        for corner in range(8):
            dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
            cx, cy, cz = ix0 + dx, iy0 + dy, iz0 + dz
            if dense:
                side = res_i + 1
                cxc = jnp.clip(cx, 0, side - 1)
                cyc = jnp.clip(cy, 0, side - 1)
                czc = jnp.clip(cz, 0, side - 1)
                idx = (cxc * side + cyc) * side + czc
            else:
                cu_x = cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
                cu_y = cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
                cu_z = cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
                idx = ((cu_x ^ cu_y ^ cu_z) % jnp.uint32(hash_table_size)).astype(jnp.int32)
            idx = idx + level_offset
            w = (
                (ox if dx else 1.0 - ox)
                * (oy if dy else 1.0 - oy)
                * (oz if dz else 1.0 - oz)
            )
            for f in range(features_per_level):
                acc[f] = acc[f] + w * jnp.take(table_t[f], idx, axis=0)
        out_channels.extend(acc)

    out = jnp.stack(out_channels, axis=-1)  # (N, L*F)
    return out.reshape(batch_shape + (num_levels * features_per_level,))


def init_hash_table(
    key: jax.Array,
    num_levels: int,
    hash_table_size: int,
    features_per_level: int,
    scale: float = 1e-4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Uniform(-scale, scale) init (reference encodings.py:352-356)."""
    return jax.random.uniform(
        key,
        (num_levels * hash_table_size, features_per_level),
        minval=-scale,
        maxval=scale,
        dtype=dtype,
    )
