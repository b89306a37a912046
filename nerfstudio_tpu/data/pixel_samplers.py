"""Pixel samplers — device-side, jit-composable (reference:
nerfstudio/data/pixel_samplers.py:55-590).

TPU-native re-design: the reference samples pixels on CPU in dataloader
workers and ships ray batches to the device every step. Here sampling is a
pure function of a PRNG key that runs *inside* the jitted train step: indices
via jax.random, RGB via one gather from the HBM-resident uint8 image stack.
Zero host involvement in the hot loop.

Masked sampling uses a precomputed (static) flat list of valid pixel indices
— equivalent to the reference's rejection sampling (:82-129) but O(1) and
shape-static.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PixelSamplerConfig:
    """(reference pixel_samplers.py:33-52)"""

    num_rays_per_batch: int = 4096
    keep_full_image: bool = False
    is_equirectangular: bool = False


def sample_pixel_indices_fisheye(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """Fisheye-aware sampling: uniform in (radius, theta) around the image
    center so the heavily-distorted rim is not oversampled relative to solid
    angle (reference pixel_samplers.py:206-240 sample_method fisheye)."""
    kc, kr, kt = jax.random.split(key, 3)
    c = jax.random.randint(kc, (num_rays,), 0, num_images)
    max_r = min(image_height, image_width) / 2.0
    # sqrt-uniform radius would be area-uniform; the reference samples radius
    # uniformly (denser near the center, matching fisheye solid angle)
    radius = jax.random.uniform(kr, (num_rays,)) * max_r
    theta = jax.random.uniform(kt, (num_rays,)) * (2 * jnp.pi)
    row = jnp.clip(
        (image_height / 2.0 + radius * jnp.sin(theta)).astype(jnp.int32), 0, image_height - 1
    )
    col = jnp.clip(
        (image_width / 2.0 + radius * jnp.cos(theta)).astype(jnp.int32), 0, image_width - 1
    )
    return jnp.stack([c, row, col], axis=-1).astype(jnp.int32)


def sample_pixel_indices(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """Uniform (camera, row, col) indices: (num_rays, 3) int32
    (reference collate_image_dataset_batch :265-331)."""
    kc, kr, kw = jax.random.split(key, 3)
    c = jax.random.randint(kc, (num_rays,), 0, num_images)
    r = jax.random.randint(kr, (num_rays,), 0, image_height)
    w = jax.random.randint(kw, (num_rays,), 0, image_width)
    return jnp.stack([c, r, w], axis=-1).astype(jnp.int32)


def sample_pixel_indices_equirectangular(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """Solid-angle-correct equirect sampling: rows ~ acos(1-2u)
    (reference :176-204)."""
    kc, kr, kw = jax.random.split(key, 3)
    c = jax.random.randint(kc, (num_rays,), 0, num_images)
    u = jax.random.uniform(kr, (num_rays,))
    r = (jnp.arccos(1.0 - 2.0 * u) / jnp.pi * image_height).astype(jnp.int32)
    r = jnp.clip(r, 0, image_height - 1)
    w = jax.random.randint(kw, (num_rays,), 0, image_width)
    return jnp.stack([c, r, w], axis=-1).astype(jnp.int32)


def sample_pixel_indices_from_valid(
    key: jax.Array, num_rays: int, valid_indices: jnp.ndarray
) -> jnp.ndarray:
    """Sample among precomputed mask-valid (cam,row,col) rows
    (replaces rejection sampling, reference :82-129)."""
    pick = jax.random.randint(key, (num_rays,), 0, valid_indices.shape[0])
    return valid_indices[pick]


def sample_patch_pixel_indices(
    key: jax.Array,
    num_rays: int,
    patch_size: int,
    num_images: int,
    image_height: int,
    image_width: int,
) -> jnp.ndarray:
    """Patch-based sampling for LPIPS/gradient losses
    (reference PatchPixelSampler :424-479). num_rays must be a multiple of
    patch_size^2; returns patches flattened in row-major order."""
    n_patches = num_rays // (patch_size**2)
    kc, kr, kw = jax.random.split(key, 3)
    c = jax.random.randint(kc, (n_patches,), 0, num_images)
    r0 = jax.random.randint(kr, (n_patches,), 0, image_height - patch_size + 1)
    w0 = jax.random.randint(kw, (n_patches,), 0, image_width - patch_size + 1)
    dr = jnp.arange(patch_size)
    grid_r, grid_w = jnp.meshgrid(dr, dr, indexing="ij")
    r = (r0[:, None, None] + grid_r[None]).reshape(-1)
    w = (w0[:, None, None] + grid_w[None]).reshape(-1)
    c = jnp.repeat(c, patch_size**2)
    return jnp.stack([c, r, w], axis=-1).astype(jnp.int32)


def sample_pair_pixel_indices(
    key: jax.Array,
    num_rays: int,
    num_images: int,
    image_height: int,
    image_width: int,
    radius: int = 2,
) -> jnp.ndarray:
    """Adjacent-pixel pairs for depth-ranking losses
    (reference PairPixelSampler :528-590). Consecutive rows are pairs."""
    n_pairs = num_rays // 2
    kc, kr, kw, kd = jax.random.split(key, 4)
    c = jax.random.randint(kc, (n_pairs,), 0, num_images)
    r = jax.random.randint(kr, (n_pairs,), radius, image_height - radius)
    w = jax.random.randint(kw, (n_pairs,), radius, image_width - radius)
    offs = jax.random.randint(kd, (n_pairs, 2), -radius, radius + 1)
    first = jnp.stack([c, r, w], axis=-1)
    second = jnp.stack([c, r + offs[:, 0], w + offs[:, 1]], axis=-1)
    pairs = jnp.stack([first, second], axis=1).reshape(-1, 3)
    return pairs.astype(jnp.int32)


def gather_pixels(images: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather RGB at (cam,row,col): images (N,H,W,C) uint8|f32 -> (num_rays, C)
    float32 in [0,1]."""
    vals = images[indices[:, 0], indices[:, 1], indices[:, 2]]
    if vals.dtype == jnp.uint8:
        vals = vals.astype(jnp.float32) / 255.0
    return vals


def build_valid_indices(masks: np.ndarray) -> np.ndarray:
    """Host-side: (N,H,W,1) bool -> (M, 3) int32 valid (cam,row,col) rows."""
    idx = np.argwhere(masks[..., 0])
    return idx.astype(np.int32)
