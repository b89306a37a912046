"""Poisson surface reconstruction on a regular grid via FFT (reference's
``ns-export poisson`` delegates to open3d's screened-Poisson; that library is
unavailable here, so this is an independent grid/FFT formulation of the same
Poisson equation — a natural TPU/XLA fit).

Method (Kazhdan's Poisson reconstruction, regular-grid variant):
  1. splat oriented points into a smoothed normal vector field V on a grid
  2. solve the Poisson equation  Δχ = ∇·V  with an FFT diagonalization
  3. choose the iso-level as the weighted mean of χ at the input samples
  4. marching cubes on χ - iso."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def poisson_reconstruct(
    points: np.ndarray,  # (N, 3)
    normals: np.ndarray,  # (N, 3) oriented (outward)
    aabb: Optional[Tuple] = None,
    resolution: int = 128,
    smooth_sigma: float = 1.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (chi volume (R,R,R), iso level, aabb used)."""
    points = np.asarray(points, np.float32)
    normals = np.asarray(normals, np.float32)
    if aabb is None:
        lo = points.min(axis=0)
        hi = points.max(axis=0)
        pad = 0.1 * (hi - lo).max()
        aabb = (lo - pad, hi + pad)
    aabb = (np.asarray(aabb[0], np.float32), np.asarray(aabb[1], np.float32))
    res = resolution

    # 1. splat normals into the grid (trilinear scatter)
    u = (points - aabb[0]) / (aabb[1] - aabb[0]) * (res - 1)
    u = jnp.asarray(np.clip(u, 0, res - 1 - 1e-4))
    nrm = jnp.asarray(normals)
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base

    V = jnp.zeros((res, res, res, 3))
    W = jnp.zeros((res, res, res))
    for corner in range(8):
        d = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
        idx = base + d
        wgt = jnp.prod(jnp.where(d == 1, frac, 1 - frac), axis=-1)
        V = V.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(nrm * wgt[:, None])
        W = W.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(wgt)

    # gaussian smoothing in fourier domain (combined with the solve)
    k = jnp.fft.fftfreq(res) * 2 * jnp.pi  # grid units
    kx, ky, kz = jnp.meshgrid(k, k, k, indexing="ij")
    k2 = kx**2 + ky**2 + kz**2
    gauss = jnp.exp(-0.5 * smooth_sigma**2 * k2)

    # 2. div V in fourier space: i k · V_hat, then chi_hat = div_hat / (-k2)
    Vx_h = jnp.fft.fftn(V[..., 0]) * gauss
    Vy_h = jnp.fft.fftn(V[..., 1]) * gauss
    Vz_h = jnp.fft.fftn(V[..., 2]) * gauss
    div_h = 1j * (kx * Vx_h + ky * Vy_h + kz * Vz_h)
    denom = jnp.where(k2 > 1e-12, -k2, 1.0)
    chi_h = jnp.where(k2 > 1e-12, div_h / denom, 0.0)
    chi = jnp.real(jnp.fft.ifftn(chi_h))

    # 3. iso level = weighted mean of chi at the samples
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, res - 1)
    samp = chi[ui[:, 0], ui[:, 1], ui[:, 2]]
    iso = float(jnp.mean(samp))
    return np.asarray(chi), iso, aabb


def export_poisson_mesh(
    points: np.ndarray,
    normals: np.ndarray,
    resolution: int = 128,
    aabb=None,
):
    """Points+normals -> (verts, faces) mesh."""
    from nerfstudio_tpu.exporter.marching_cubes import marching_cubes

    chi, iso, box = poisson_reconstruct(points, normals, aabb, resolution)
    return marching_cubes(chi - iso, level=0.0, aabb=(tuple(box[0]), tuple(box[1])))
