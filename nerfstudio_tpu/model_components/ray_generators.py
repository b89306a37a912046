"""Ray generator: pixel indices -> RayBundle (reference:
nerfstudio/model_components/ray_generators.py:26-57).

Functional: takes the (possibly camera-optimized) Cameras and an
(num_rays, 3) int array of (camera, row, col), returns a RayBundle. The
camera-opt pose deltas are applied by the caller (they are model params)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from nerfstudio_tpu.cameras.cameras import Cameras
from nerfstudio_tpu.core.rays import RayBundle


def generate_rays_from_indices(
    cameras: Cameras,
    ray_indices: jnp.ndarray,
    camera_opt_to_camera: Optional[jnp.ndarray] = None,
    pixel_offset: float = 0.5,
) -> RayBundle:
    """ray_indices: (N, 3) int (camera_idx, row, col)."""
    c = ray_indices[:, 0:1]
    y = ray_indices[:, 1].astype(jnp.float32)
    x = ray_indices[:, 2].astype(jnp.float32)
    coords = jnp.stack([y + pixel_offset, x + pixel_offset], axis=-1)
    return cameras._generate_rays_from_coords(
        camera_indices=c,
        coords=coords,
        camera_opt_to_camera=camera_opt_to_camera,
    )
