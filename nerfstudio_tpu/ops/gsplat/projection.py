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
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t  # (N, 3)
    z = p_cam[..., 2]

    # perspective project
    inv_z = 1.0 / jnp.maximum(z, 1e-6)
    xs = p_cam[..., 0] * inv_z
    ys = p_cam[..., 1] * inv_z
    means2d = jnp.stack([xs * fx + cx, ys * fy + cy], axis=-1)

    # 3D cov in camera frame
    cov3d = compute_cov3d(scales, quats)
    cov_cam = jnp.einsum("ij,njk,lk->nil", R, cov3d, R, precision="highest")

    # EWA Jacobian (clip xs/ys to stabilize off-screen gaussians)
    lim_x = 1.3 * (width / (2 * fx))
    lim_y = 1.3 * (height / (2 * fy))
    txz = jnp.clip(xs, -lim_x, lim_x)
    tyz = jnp.clip(ys, -lim_y, lim_y)
    J = jnp.zeros(means.shape[:-1] + (2, 3))
    J = J.at[..., 0, 0].set(fx * inv_z)
    J = J.at[..., 0, 2].set(-fx * txz * inv_z)
    J = J.at[..., 1, 1].set(fy * inv_z)
    J = J.at[..., 1, 2].set(-fy * tyz * inv_z)
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_cam, J, precision="highest")

    det_orig = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    cov2d = cov2d.at[..., 0, 0].add(eps2d)
    cov2d = cov2d.at[..., 1, 1].add(eps2d)
    det = cov2d[..., 0, 0] * cov2d[..., 1, 1] - cov2d[..., 0, 1] ** 2
    det_safe = jnp.maximum(det, 1e-10)
    # antialiasing compensation (gsplat "antialiased" mode)
    compensations = jnp.sqrt(jnp.maximum(det_orig / det_safe, 0.0))

    inv_det = 1.0 / det_safe
    conics = jnp.stack(
        [
            cov2d[..., 1, 1] * inv_det,
            -cov2d[..., 0, 1] * inv_det,
            cov2d[..., 0, 0] * inv_det,
        ],
        axis=-1,
    )

    # 3-sigma radius from max eigenvalue
    b = 0.5 * (cov2d[..., 0, 0] + cov2d[..., 1, 1])
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
