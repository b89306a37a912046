"""Core math utilities (reference: nerfstudio/utils/math.py).

Pure jnp functions — everything here is jit/vmap/grad-safe with static shapes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.tensor_dataclass import TensorDataclass, tensor_dataclass


@tensor_dataclass
class Gaussians(TensorDataclass):
    """Mean/covariance pair (reference math.py:29-38)."""

    mean: jnp.ndarray  # (..., 3)
    cov: jnp.ndarray  # (..., 3, 3)

    _field_custom_dimensions = {"mean": 1, "cov": 2}


def compute_3d_gaussian(
    directions: jnp.ndarray,
    means: jnp.ndarray,
    dir_variance: jnp.ndarray,
    radius_variance: jnp.ndarray,
) -> Gaussians:
    """Gaussian along a ray from directional/radial variances (math.py:41-70)."""
    dir_outer = directions[..., :, None] * directions[..., None, :]
    dir_mag_sq = jnp.maximum(jnp.sum(directions**2, axis=-1, keepdims=True), 1e-10)
    eye = jnp.eye(3, dtype=directions.dtype)
    null_outer = eye - directions[..., :, None] * (directions / dir_mag_sq)[..., None, :]
    dir_cov = dir_variance[..., None, None] * dir_outer
    radius_cov = radius_variance[..., None, None] * null_outer
    return Gaussians(mean=means, cov=dir_cov + radius_cov)


def conical_frustum_to_gaussian(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    radius: jnp.ndarray,
) -> Gaussians:
    """mip-NeRF conical-frustum gaussian approximation (math.py:95-122)."""
    mu = (starts + ends) / 2.0
    hw = (ends - starts) / 2.0
    means = origins + directions * (mu + (2.0 * mu * hw**2) / (3.0 * mu**2 + hw**2))
    dir_variance = (hw**2) / 3 - (4 / 15) * ((hw**4 * (12 * mu**2 - hw**2)) / (3 * mu**2 + hw**2) ** 2)
    radius_variance = radius**2 * ((mu**2) / 4 + (5 / 12) * hw**2 - (4 / 15) * (hw**4) / (3 * mu**2 + hw**2))
    return compute_3d_gaussian(directions, means, dir_variance[..., 0], radius_variance[..., 0])


def expected_sin(x_means: jnp.ndarray, x_vars: jnp.ndarray) -> jnp.ndarray:
    """E[sin(x)] for x ~ N(mean, var) (math.py:124-135)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)


def intersect_aabb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    aabb: jnp.ndarray,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test ray/AABB intersection (math.py:138-175). aabb: (6,) flat."""
    inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    t_min = (aabb[:3] - origins) * inv_d
    t_max = (aabb[3:] - origins) * inv_d
    t1 = jnp.minimum(t_min, t_max)
    t2 = jnp.maximum(t_min, t_max)
    nears = jnp.max(t1, axis=-1)
    fars = jnp.min(t2, axis=-1)
    nears = jnp.clip(nears, 0.0, max_bound)
    fars = jnp.minimum(fars, max_bound)
    miss = nears > fars
    nears = jnp.where(miss, invalid_value, nears)
    fars = jnp.where(miss, invalid_value, fars)
    return nears, fars


def intersect_obb(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    R: jnp.ndarray,
    T: jnp.ndarray,
    S: jnp.ndarray,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
):
    """Oriented-box intersection by transforming rays into box frame (math.py:178-218)."""
    o = (origins - T) @ R.T
    d = directions @ R.T
    half = S / 2.0
    aabb = jnp.concatenate([-half, half])
    return intersect_aabb(o, d, aabb, max_bound=max_bound, invalid_value=invalid_value)


def safe_normalize(v: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def masked_reduction(
    input_tensor: jnp.ndarray, mask: jnp.ndarray, reduction_type: Literal["image", "batch"]
) -> jnp.ndarray:
    """Mean over mask, per-image or per-batch (math.py:221-256)."""
    if reduction_type == "batch":
        divisor = jnp.sum(mask)
        return jnp.where(divisor == 0, 0.0, jnp.sum(input_tensor) / jnp.maximum(divisor, 1))
    # image: reduce last two dims
    valid = jnp.sum(mask, axis=(-2, -1))
    s = jnp.sum(input_tensor, axis=(-2, -1))
    out = jnp.where(valid == 0, 0.0, s / jnp.maximum(valid, 1))
    return jnp.sum(out)


def normalized_depth_scale_and_shift(
    prediction: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form scale/shift aligning monocular depth (math.py:259-294)."""
    a_00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a_01 = jnp.sum(mask * prediction, axis=(1, 2))
    a_11 = jnp.sum(mask, axis=(1, 2))
    b_0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b_1 = jnp.sum(mask * target, axis=(1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det > 0
    scale = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / jnp.where(valid, det, 1.0), 0.0)
    shift = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / jnp.where(valid, det, 1.0), 0.0)
    return scale, shift


def columnwise_squared_l2_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(math.py:300-315)"""
    return (
        jnp.sum(x * x, axis=-1)[:, None]
        + jnp.sum(y * y, axis=-1)[None, :]
        - 2.0 * x @ y.T
    )


def _sym_faces(v):
    return np.concatenate([v, -v], axis=0)


def generate_polyhedron_basis(
    basis_shape: Literal["icosahedron", "octahedron"],
    angular_tesselation: int,
    remove_symmetries: bool = True,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Tesselated polyhedron vertex basis for mip-360 PolyhedronFFEncoding
    (math.py:318-459). Host-side numpy; returns a constant array."""
    if basis_shape == "icosahedron":
        a = (np.sqrt(5) + 1) / 2
        verts = np.array(
            [
                (-1, 0, a), (1, 0, a), (-1, 0, -a), (1, 0, -a),
                (0, a, 1), (0, a, -1), (0, -a, 1), (0, -a, -1),
                (a, 1, 0), (-a, 1, 0), (a, -1, 0), (-a, -1, 0),
            ],
            dtype=np.float64,
        ) / np.sqrt(a + 2)
        faces = np.array(
            [
                (0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
                (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
                (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
                (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11),
            ]
        )
        verts = _tesselate(verts, faces, angular_tesselation)
    elif basis_shape == "octahedron":
        verts = np.array(
            [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0)],
            dtype=np.float64,
        )
        corners = np.array(list(__import__("itertools").product([-1, 1], repeat=3)), dtype=np.float64)
        pairs = np.argwhere(columnwise_squared_l2_distance(jnp.asarray(corners), jnp.asarray(verts)) == 2)
        faces = np.sort(np.reshape(pairs[:, 1], [3, -1]).T, axis=1)
        verts = _tesselate(verts, faces, angular_tesselation)
    else:
        raise ValueError(basis_shape)

    if remove_symmetries:
        match = columnwise_squared_l2_distance(jnp.asarray(verts), jnp.asarray(-verts))
        match = np.asarray(match) < eps
        keep = np.ones(len(verts), dtype=bool)
        for i in range(len(verts)):
            if keep[i]:
                dup = np.argwhere(match[i]).ravel()
                for j in dup:
                    if j > i:
                        keep[j] = False
        verts = verts[keep]
    return jnp.asarray(verts.T, dtype=jnp.float32)


def _tesselate(verts: np.ndarray, faces: np.ndarray, v: int) -> np.ndarray:
    """Subdivide each edge/face v times and project onto the sphere."""
    if v <= 1:
        return verts
    tri = verts[faces]
    pts = [verts]
    for i in range(v + 1):
        for j in range(v + 1 - i):
            k = v - i - j
            if (i and j) or (j and k) or (k and i) or True:
                p = (tri[:, 0] * i + tri[:, 1] * j + tri[:, 2] * k) / v
                pts.append(p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-12))
    allp = np.concatenate(pts, axis=0)
    # dedupe
    uniq = np.unique(np.round(allp, 6), axis=0)
    return uniq


def random_quat(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random unit quaternions wxyz (math.py:462-484)."""
    u, v, w = jax.random.uniform(key, (3, n))
    return jnp.stack(
        [
            jnp.sqrt(1 - u) * jnp.sin(2 * jnp.pi * v),
            jnp.sqrt(1 - u) * jnp.cos(2 * jnp.pi * v),
            jnp.sqrt(u) * jnp.sin(2 * jnp.pi * w),
            jnp.sqrt(u) * jnp.cos(2 * jnp.pi * w),
        ],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("k", "block"))
def k_nearest_neighbors(
    points: jnp.ndarray, k: int, block: int = 2048
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN distances via a row-blocked distance matrix (math.py:487-503's
    sklearn call, done on-device). Blocked + jitted so peak memory is
    O(n*block), not O(n^2) eager temporaries — 3DGS init can seed from 1e6
    SfM points on one chip."""
    n = points.shape[0]
    n_pad = (n + block - 1) // block * block
    pts_p = jnp.concatenate(
        [points, jnp.full((n_pad - n, points.shape[-1]), jnp.inf, points.dtype)], axis=0
    )
    sq = jnp.sum(points * points, axis=-1)  # (n,)

    def row_block(args):
        rows, row_start = args  # (block, 3), scalar
        d2 = (
            jnp.sum(rows * rows, axis=-1)[:, None]
            + sq[None, :]
            - 2.0 * rows @ points.T
        )  # (block, n)
        # mask self-distance
        col = jnp.arange(n)[None, :]
        row_ids = row_start + jnp.arange(block)[:, None]
        d2 = jnp.where(col == row_ids, jnp.inf, d2)
        _, idx = jax.lax.top_k(-d2, k)
        # recompute exact distances for the winners: the matmul identity
        # loses ~1e-3 absolute to f32 cancellation, which wrecks
        # log(avg_dist) scale init for near-duplicate SfM points
        nbr = points[idx]  # (block, k, 3)
        exact = jnp.sum((rows[:, None, :] - nbr) ** 2, axis=-1)
        return -exact, idx

    nb = n_pad // block
    neg_d, idx = jax.lax.map(
        row_block,
        (pts_p.reshape(nb, block, -1), jnp.arange(nb, dtype=jnp.int32) * block),
    )
    neg_d = neg_d.reshape(n_pad, k)[:n]
    idx = idx.reshape(n_pad, k)[:n]
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx


def power_fn(x: jnp.ndarray, lam: float = -1.5) -> jnp.ndarray:
    """Power-transformation warp (math.py:506-520)."""
    if lam == 1:
        return x
    if lam == 0:
        return jnp.log1p(x)
    return (jnp.abs(lam - 1) / lam) * ((x / jnp.abs(lam - 1) + 1) ** lam - 1)


def erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.special.erf(x)


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d2 = columnwise_squared_l2_distance(x, y)
    return jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))
