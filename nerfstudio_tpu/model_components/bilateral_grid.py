"""Bilateral grid for per-image ISP/exposure correction (reference:
nerfstudio/model_components/lib_bilagrid.py:56-547, vendored there from
BilaRF "Bilateral Guided Radiance Field Processing").

A learnable low-res 3D bilateral grid per training image stores a 3x4 affine
color transform in each cell over (x, y, guidance) space, where guidance is
the pixel luminance. Slicing = trilinear sample of the 12 coefficients at
(x, y, luma(rgb)) followed by the affine apply. Pure-JAX grid_sample
(ops/interp.grid_sample_3d), TV regularizer, and the post-hoc ``color_correct``
least-squares fit used for fair eval metrics."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.ops.interp import grid_sample_3d

# Rec. 709 luma — the guidance channel (reference lib_bilagrid.py color_affine)
_LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def init_bilateral_grid(
    num_images: int, grid_x: int = 16, grid_y: int = 16, grid_w: int = 8
) -> jnp.ndarray:
    """Identity-affine init: (N, 12, W, Y, X) with the transform = identity."""
    ident = np.zeros((12,), np.float32)
    ident[0] = ident[5] = ident[10] = 1.0  # rows of [I | 0] flattened 3x4
    grid = np.tile(ident.reshape(1, 12, 1, 1, 1), (num_images, 1, grid_w, grid_y, grid_x))
    return jnp.asarray(grid)


def slice_bilateral_grid(
    grid: jnp.ndarray, rgb: jnp.ndarray, xy: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Apply one image's bilateral grid to rendered rgb.

    grid: (12, W, Y, X) — a single image's grid.
    rgb: (H, W, 3) in [0, 1]; xy: optional (H, W, 2) normalized [0,1] pixel
    coords (defaults to the full-image lattice).
    Returns corrected (H, W, 3)."""
    h, w, _ = rgb.shape
    if xy is None:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        xy = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    luma = jnp.clip(rgb @ jnp.asarray(_LUMA), 0.0, 1.0)
    # grid_sample_3d expects coords (x, y, z) in [-1, 1] over (D=W, H=Y, W=X)
    coords = jnp.stack(
        [xy[..., 0] * 2 - 1, xy[..., 1] * 2 - 1, luma * 2 - 1], axis=-1
    )
    affine = grid_sample_3d(grid, coords)  # (H, W, 12)
    A = affine.reshape(h, w, 3, 4)
    return jnp.einsum("hwij,hwj->hwi", A[..., :3], rgb) + A[..., 3]


def bilateral_grid_tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Total variation over the grid's 3 spatial dims (reference
    lib_bilagrid.total_variation_loss)."""
    tv = 0.0
    for axis in (-3, -2, -1):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d**2)
    return tv


def color_correct(
    img: jnp.ndarray, ref: jnp.ndarray, num_iters: int = 5, eps: float = 0.5 / 255
) -> jnp.ndarray:
    """Post-hoc per-channel quadratic color fit of ``img`` to ``ref``
    (reference lib_bilagrid.color_correct, used for fair eval when training
    with per-image appearance). Solves a small least-squares per channel."""
    img_f = img.reshape(-1, 3)
    ref_f = ref.reshape(-1, 3)
    # feature matrix: [r, g, b, r*g, r*b, g*b, r^2, g^2, b^2, 1]
    r, g, b = img_f[:, 0], img_f[:, 1], img_f[:, 2]
    A = jnp.stack([r, g, b, r * g, r * b, g * b, r * r, g * g, b * b, jnp.ones_like(r)], axis=-1)
    out = []
    for c in range(3):
        # ridge-regularized normal equations (host-free, tiny 10x10 solve)
        AtA = A.T @ A + 1e-4 * jnp.eye(A.shape[-1])
        Atb = A.T @ ref_f[:, c]
        w = jnp.linalg.solve(AtA, Atb)
        out.append(jnp.clip(A @ w, 0.0, 1.0))
    return jnp.stack(out, axis=-1).reshape(img.shape)
