"""Grid interpolation ops — XLA-native replacement for torch.F.grid_sample.

The reference leans on ``F.grid_sample`` (CUDA) for TensoRF/Triplane/K-Planes
encodings and the bilateral grid (reference field_components/encodings.py:
466-749, model_components/lib_bilagrid.py). On TPU these lower to gathers +
fused multiply-adds, which XLA handles well when written as below (one gather
per corner, vectorized over channels).

Convention: coords in [-1, 1], align_corners=False (torch default), border
padding (clamp).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1,1] -> pixel coords, align_corners=False."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample. grid: (C, H, W); coords: (..., 2) as (x, y) in [-1,1].

    Returns (..., C).
    """
    C, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)

    # (..., C) gathers; grid transposed to (H, W, C) for trailing-channel gather
    g = jnp.transpose(grid, (1, 2, 0))
    v00 = g[y0i, x0i]
    v01 = g[y0i, x1i]
    v10 = g[y1i, x0i]
    v11 = g[y1i, x1i]
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def grid_sample_1d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Linear sample along one axis. grid: (C, L); coords: (...,) in [-1,1].

    Returns (..., C).
    """
    C, L = grid.shape
    x = _unnormalize(coords, L)
    x0 = jnp.floor(x)
    w = (x - x0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, L - 1)
    x1i = jnp.clip(x0i + 1, 0, L - 1)
    g = jnp.transpose(grid)  # (L, C)
    return g[x0i] * (1 - w) + g[x1i] * w


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample. grid: (C, D, H, W); coords: (..., 3) as (x, y, z) in [-1,1]
    where x indexes W, y indexes H, z indexes D (torch grid_sample convention).

    Returns (..., C).
    """
    C, D, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    z = _unnormalize(coords[..., 2], D)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, D - 1)
    z1i = jnp.clip(z0i + 1, 0, D - 1)

    g = jnp.transpose(grid, (1, 2, 3, 0))  # (D, H, W, C)
    c000 = g[z0i, y0i, x0i]
    c001 = g[z0i, y0i, x1i]
    c010 = g[z0i, y1i, x0i]
    c011 = g[z0i, y1i, x1i]
    c100 = g[z1i, y0i, x0i]
    c101 = g[z1i, y0i, x1i]
    c110 = g[z1i, y1i, x0i]
    c111 = g[z1i, y1i, x1i]
    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def resize_linear(grid: jnp.ndarray, new_spatial: tuple) -> jnp.ndarray:
    """Linear-resample a (C, *spatial) grid to (C, *new_spatial) — the
    progressive ``upsample_grid`` used by TensoRF (reference
    encodings.py:531-541 uses F.interpolate)."""
    import jax

    return jax.image.resize(grid, (grid.shape[0],) + tuple(new_spatial), method="linear")
