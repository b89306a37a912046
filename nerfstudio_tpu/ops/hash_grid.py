"""Multiresolution hash-grid encoding op (Instant-NGP).

Replaces tiny-cuda-nn's HashGrid (reference field_components/encodings.py:
307-463 torch fallback; tcnn config :362-380). Two implementations:

  * ``hash_encode`` — pure-XLA: one fused gather across all levels (table is
    flattened to (L*T, F) so a single ``take`` covers every level/corner),
    trilinear weights as FMAs. XLA fuses the interpolation with downstream
    matmuls; grads scatter-add into the table via the transpose of gather.
  * a Pallas fused hash-encode+MLP kernel lives in ``ops/fused_hash_mlp.py``
    (the tcnn ``NetworkWithInputEncoding`` equivalent).

Hash function: XOR of coordinate-wise products with primes
(1, 2654435761, 805459861) — the Instant-NGP spatial hash (paper eq. 4;
reference encodings.py:398-415 uses the same primes).

Coarse levels whose dense grid fits in the table are indexed *densely*
(collision-free), matching tcnn behaviour; the dense/hashed choice is static
per level so XLA compiles a single gather either way.
"""

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
    x = positions.reshape(-1, 3)  # (N, 3)

    resolutions = compute_level_resolutions(num_levels, min_res, max_res)  # (L,)
    scales = jnp.asarray(resolutions, dtype=jnp.float32)  # (L,)

    # (N, L, 3) scaled coordinates
    scaled = x[:, None, :] * scales[None, :, None]
    scaled_f = jnp.floor(scaled)
    offset = scaled - scaled_f  # (N, L, 3) in [0,1)
    base = scaled_f.astype(jnp.int32)

    # 8 corner offsets (8, 3)
    corners = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
    )
    coords = base[:, :, None, :] + corners[None, None, :, :]  # (N, L, 8, 3)

    # Hashed index per level; dense index where the level grid fits the table.
    # uint32 wrap-around multiply + XOR (Instant-NGP spatial hash).
    cu = coords.astype(jnp.uint32)
    hashed = (
        (cu[..., 0] * jnp.uint32(_PRIMES[0]))
        ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
        ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))
    ) % jnp.uint32(hash_table_size)
    hashed = hashed.astype(jnp.int32)

    dense_mask = np.asarray((resolutions + 1) ** 3 <= hash_table_size)  # (L,) static
    if dense_mask.any():
        res1 = scales.astype(jnp.int32) + 1  # dense grid side per level
        cc = jnp.clip(coords, 0, res1[None, :, None, None] - 1)
        dense_idx = (cc[..., 0] * res1[None, :, None] + cc[..., 1]) * res1[
            None, :, None
        ] + cc[..., 2]
        use_dense = jnp.asarray(dense_mask)[None, :, None]
        idx = jnp.where(use_dense, dense_idx % hash_table_size, hashed)
    else:
        idx = hashed

    # flatten level offset into one big gather
    level_offsets = (jnp.arange(num_levels, dtype=jnp.int32) * hash_table_size)[None, :, None]
    flat_idx = idx + level_offsets  # (N, L, 8)
    feats = jnp.take(table, flat_idx.reshape(-1), axis=0).reshape(
        -1, num_levels, 8, features_per_level
    )  # (N, L, 8, F)

    # trilinear weights — corner order matches `corners` above
    ox, oy, oz = offset[..., 0:1], offset[..., 1:2], offset[..., 2:3]  # (N, L, 1)
    wx = jnp.concatenate([1 - ox, ox], axis=-1)  # (N, L, 2)
    wy = jnp.concatenate([1 - oy, oy], axis=-1)
    wz = jnp.concatenate([1 - oz, oz], axis=-1)
    w = (
        wx[:, :, :, None, None] * wy[:, :, None, :, None] * wz[:, :, None, None, :]
    ).reshape(-1, num_levels, 8, 1)  # (N, L, 8, 1)

    out = jnp.sum(feats * w, axis=2)  # (N, L, F)
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
