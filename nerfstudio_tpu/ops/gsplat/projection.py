"""3DGS projection: 3D gaussians -> screen-space 2D gaussians.

TPU-native replacement for gsplat's CUDA ``fully_fused_projection``
(reference models/splatfacto.py:555-575 consumes gsplat.rasterization).
Pure jnp — all (N, ...) vectorized, autodiff-able; XLA fuses the chain.

Conventions: OpenCV camera (x right, y down, z forward); w2c viewmat;
intrinsics K (fx, fy, cx, cy); quats wxyz (normalized inside)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) wxyz -> (N, 3, 3)."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """(N,3) linear scales + (N,4) quats -> (N,3,3) covariance R S^2 R^T."""
    R = quat_to_rotmat(quats)
    M = R * scales[..., None, :]  # R @ diag(S)
    return jnp.einsum("nij,nkj->nik", M, M, precision="highest")


def project_gaussians(
    means: jnp.ndarray,  # (N, 3) world
    scales: jnp.ndarray,  # (N, 3) linear
    quats: jnp.ndarray,  # (N, 4)
    viewmat: jnp.ndarray,  # (4, 4) w2c
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    near: float = 0.01,
    eps2d: float = 0.3,
    antialiased: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """EWA splatting projection.

    Returns (means2d (N,2), depths (N,), conics (N,3), radii (N,),
    valid (N,) bool, compensations (N,)).
    conic = inverse 2D covariance packed (a, b, c) for [[a,b],[b,c]].
    """
    # Structure-of-arrays throughout: every intermediate is an (N,) lane-major
    # array. Batched (N,3,3)/(N,2,3) einsums pad their trailing dims to the
    # (8,128) TPU tile — a 6-7x measured slowdown (exp/proj_bench.py) — so the
    # tiny per-gaussian matrix algebra is expanded by hand over components.
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    px = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + t[0]
    py = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + t[1]
    z = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + t[2]

    # perspective project
    inv_z = 1.0 / jnp.maximum(z, 1e-6)
    xs = px * inv_z
    ys = py * inv_z
    means2d = jnp.stack([xs * fx + cx, ys * fy + cy], axis=-1)

    # 3D cov R_g S^2 R_g^T, component form
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-8)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    g00 = 1 - 2 * (qy * qy + qz * qz); g01 = 2 * (qx * qy - qw * qz); g02 = 2 * (qx * qz + qw * qy)
    g10 = 2 * (qx * qy + qw * qz); g11 = 1 - 2 * (qx * qx + qz * qz); g12 = 2 * (qy * qz - qw * qx)
    g20 = 2 * (qx * qz - qw * qy); g21 = 2 * (qy * qz + qw * qx); g22 = 1 - 2 * (qx * qx + qy * qy)
    s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
    c00 = g00 * g00 * s0 + g01 * g01 * s1 + g02 * g02 * s2
    c01 = g00 * g10 * s0 + g01 * g11 * s1 + g02 * g12 * s2
    c02 = g00 * g20 * s0 + g01 * g21 * s1 + g02 * g22 * s2
    c11 = g10 * g10 * s0 + g11 * g11 * s1 + g12 * g12 * s2
    c12 = g10 * g20 * s0 + g11 * g21 * s1 + g12 * g22 * s2
    c22 = g20 * g20 * s0 + g21 * g21 * s1 + g22 * g22 * s2

    # camera-frame cov: V = R C R^T (R is the scalar 3x3 camera rotation).
    # First A = R C (rows of R times C), then V = A R^T; only the upper
    # triangle of V is needed.
    def _rowA(r0, r1, r2):
        a0 = r0 * c00 + r1 * c01 + r2 * c02
        a1 = r0 * c01 + r1 * c11 + r2 * c12
        a2 = r0 * c02 + r1 * c12 + r2 * c22
        return a0, a1, a2

    a00, a01, a02 = _rowA(R[0, 0], R[0, 1], R[0, 2])
    a10, a11, a12 = _rowA(R[1, 0], R[1, 1], R[1, 2])
    a20, a21, a22 = _rowA(R[2, 0], R[2, 1], R[2, 2])
    v00 = a00 * R[0, 0] + a01 * R[0, 1] + a02 * R[0, 2]
    v01 = a00 * R[1, 0] + a01 * R[1, 1] + a02 * R[1, 2]
    v02 = a00 * R[2, 0] + a01 * R[2, 1] + a02 * R[2, 2]
    v11 = a10 * R[1, 0] + a11 * R[1, 1] + a12 * R[1, 2]
    v12 = a10 * R[2, 0] + a11 * R[2, 1] + a12 * R[2, 2]
    v22 = a20 * R[2, 0] + a21 * R[2, 1] + a22 * R[2, 2]

    # EWA Jacobian J = [[fx/z, 0, -fx tx/z], [0, fy/z, -fy ty/z]];
    # cov2d = J V J^T expanded (clip xs/ys to stabilize off-screen gaussians)
    lim_x = 1.3 * (width / (2 * fx))
    lim_y = 1.3 * (height / (2 * fy))
    txz = jnp.clip(xs, -lim_x, lim_x)
    tyz = jnp.clip(ys, -lim_y, lim_y)
    jx = fx * inv_z
    jy = fy * inv_z
    kx = -fx * txz * inv_z
    ky = -fy * tyz * inv_z
    # row0 = jx * V[0,:] + kx * V[2,:]; row1 = jy * V[1,:] + ky * V[2,:]
    cov2d_00 = jx * (jx * v00 + kx * v02) + kx * (jx * v02 + kx * v22)
    cov2d_01 = jy * (jx * v01 + kx * v12) + ky * (jx * v02 + kx * v22)
    cov2d_11 = jy * (jy * v11 + ky * v12) + ky * (jy * v12 + ky * v22)

    det_orig = cov2d_00 * cov2d_11 - cov2d_01 ** 2
    cov2d_00 = cov2d_00 + eps2d
    cov2d_11 = cov2d_11 + eps2d
    det = cov2d_00 * cov2d_11 - cov2d_01 ** 2
    det_safe = jnp.maximum(det, 1e-10)
    # antialiasing compensation (gsplat "antialiased" mode)
    compensations = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    inv_det = 1.0 / det_safe
    conics = jnp.stack(
        [cov2d_11 * inv_det, -cov2d_01 * inv_det, cov2d_00 * inv_det],
        axis=-1,
    )

    # 3-sigma radius from max eigenvalue
    b = 0.5 * (cov2d_00 + cov2d_11)
    v1 = b + jnp.sqrt(jnp.maximum(b * b - det_safe, 0.01))
    radii = jnp.ceil(3.0 * jnp.sqrt(v1))

    inside = (
        (means2d[..., 0] + radii > 0)
        & (means2d[..., 0] - radii < width)
        & (means2d[..., 1] + radii > 0)
        & (means2d[..., 1] - radii < height)
    )
    valid = (z > near) & inside & (det > 0)
    radii = jnp.where(valid, radii, 0.0)
    if not antialiased:
        compensations = jnp.ones_like(compensations)
    return means2d, z, conics, radii, valid, compensations


def get_viewmat(c2w_opengl: jnp.ndarray) -> jnp.ndarray:
    """OpenGL c2w (3,4) -> OpenCV w2c (4,4) (reference splatfacto.py:65-81)."""
    R = c2w_opengl[:3, :3]
    T = c2w_opengl[:3, 3]
    # flip y and z axes (OpenGL -> OpenCV)
    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    R_cv = R @ flip
    R_inv = R_cv.T
    T_inv = -R_inv @ T
    viewmat = jnp.eye(4)
    viewmat = viewmat.at[:3, :3].set(R_inv)
    viewmat = viewmat.at[:3, 3].set(T_inv)
    return viewmat
