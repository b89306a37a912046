"""Camera/pose utilities (reference: nerfstudio/cameras/camera_utils.py).

Host-or-device pure functions. The iterative undistortion runs as a
fixed-iteration fori_loop (compiler-friendly; no data-dependent trip count).
"""

from __future__ import annotations

import math
from typing import List, Literal, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = np.finfo(np.float32).eps * 4.0


def unit_vector(data, axis: Optional[int] = None):
    data = np.array(data, dtype=np.float64, copy=True)
    if axis is None:
        return data / math.sqrt(np.dot(data, data))
    length = np.atleast_1d(np.sum(data * data, axis))
    np.sqrt(length, length)
    length = np.expand_dims(length, axis)
    return data / length


def quaternion_from_matrix(matrix) -> np.ndarray:
    """Rotation matrix -> quaternion wxyz via the Bar-Itzhack eigenvalue
    method: the unit quaternion is the dominant eigenvector of the symmetric
    4x4 K matrix built from R (also robust to slightly non-orthonormal
    input). Replaces the reference's transformations.py-vendored routine
    (reference camera_utils.py:64-121) with the textbook construction."""
    R = np.asarray(matrix, dtype=np.float64)[:3, :3]
    Km = np.empty((4, 4))
    # order (x, y, z, w)
    Km[0, 0] = R[0, 0] - R[1, 1] - R[2, 2]
    Km[1, 1] = R[1, 1] - R[0, 0] - R[2, 2]
    Km[2, 2] = R[2, 2] - R[0, 0] - R[1, 1]
    Km[3, 3] = R[0, 0] + R[1, 1] + R[2, 2]
    Km[0, 1] = Km[1, 0] = R[0, 1] + R[1, 0]
    Km[0, 2] = Km[2, 0] = R[0, 2] + R[2, 0]
    Km[1, 2] = Km[2, 1] = R[1, 2] + R[2, 1]
    Km[0, 3] = Km[3, 0] = R[2, 1] - R[1, 2]
    Km[1, 3] = Km[3, 1] = R[0, 2] - R[2, 0]
    Km[2, 3] = Km[3, 2] = R[1, 0] - R[0, 1]
    Km /= 3.0
    eigvals, eigvecs = np.linalg.eigh(Km)
    q = eigvecs[:, np.argmax(eigvals)]  # (x, y, z, w)
    q = q[[3, 0, 1, 2]]  # -> wxyz
    return q if q[0] >= 0.0 else -q


def quaternion_slerp(quat0, quat1, fraction: float, shortestpath: bool = True) -> np.ndarray:
    """Spherical linear interpolation from the definition:
    slerp(q0, q1, t) = [sin((1-t)θ) q0 + sin(tθ) q1] / sin(θ), cos θ = q0·q1
    (reference camera_utils.py:124-160)."""
    q0 = unit_vector(np.asarray(quat0, np.float64)[:4])
    q1 = unit_vector(np.asarray(quat1, np.float64)[:4])
    d = float(np.dot(q0, q1))
    if shortestpath and d < 0.0:
        d, q1 = -d, -q1
    d = min(max(d, -1.0), 1.0)
    theta = math.acos(d)
    if theta < _EPS:  # nearly parallel: lerp is exact enough
        out = (1.0 - fraction) * q0 + fraction * q1
        return out / np.linalg.norm(out)
    return (
        math.sin((1.0 - fraction) * theta) * q0 + math.sin(fraction * theta) * q1
    ) / math.sin(theta)


def quaternion_matrix(quaternion) -> np.ndarray:
    """Quaternion wxyz -> 4x4 rotation matrix (reference :163-185)."""
    q = np.array(quaternion, dtype=np.float64, copy=True)
    n = np.dot(q, q)
    if n < _EPS:
        return np.identity(4)
    q *= math.sqrt(2.0 / n)
    q = np.outer(q, q)
    return np.array(
        [
            [1.0 - q[2, 2] - q[3, 3], q[1, 2] - q[3, 0], q[1, 3] + q[2, 0], 0.0],
            [q[1, 2] + q[3, 0], 1.0 - q[1, 1] - q[3, 3], q[2, 3] - q[1, 0], 0.0],
            [q[1, 3] - q[2, 0], q[2, 3] + q[1, 0], 1.0 - q[1, 1] - q[2, 2], 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def get_interpolated_poses(pose_a: np.ndarray, pose_b: np.ndarray, steps: int = 10) -> List[np.ndarray]:
    """Interpolate two 3x4/4x4 poses: slerp rotation, lerp translation (:188-211)."""
    quat_a = quaternion_from_matrix(pose_a[:3, :3])
    quat_b = quaternion_from_matrix(pose_b[:3, :3])
    ts = np.linspace(0, 1, steps)
    poses = []
    for t in ts:
        q = quaternion_slerp(quat_a, quat_b, float(t))
        R = quaternion_matrix(q)[:3, :3]
        T = (1 - t) * pose_a[:3, 3] + t * pose_b[:3, 3]
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = T
        poses.append(pose[:3])
    return poses


def get_interpolated_k(k_a: np.ndarray, k_b: np.ndarray, steps: int = 10) -> List[np.ndarray]:
    ts = np.linspace(0, 1, steps)
    return [(1 - t) * k_a + t * k_b for t in ts]


def get_ordered_poses_and_k(poses: np.ndarray, Ks: np.ndarray):
    """Greedy nearest-neighbor ordering of poses (:233-269)."""
    poses_num = len(poses)
    ordered_poses = poses[:1]
    ordered_ks = Ks[:1]
    poses = poses[1:]
    Ks = Ks[1:]
    for _ in range(poses_num - 1):
        distances = np.linalg.norm(poses[:, :3, 3] - ordered_poses[-1, :3, 3], axis=1)
        idx = np.argmin(distances)
        ordered_poses = np.concatenate([ordered_poses, poses[idx : idx + 1]], axis=0)
        ordered_ks = np.concatenate([ordered_ks, Ks[idx : idx + 1]], axis=0)
        poses = np.delete(poses, idx, axis=0)
        Ks = np.delete(Ks, idx, axis=0)
    return ordered_poses, ordered_ks


def get_interpolated_poses_many(
    poses: np.ndarray,
    Ks: np.ndarray,
    steps_per_transition: int = 10,
    order_poses: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """(:272-315)"""
    traj = []
    k_interp = []
    if order_poses:
        poses, Ks = get_ordered_poses_and_k(poses, Ks)
    for idx in range(len(poses) - 1):
        traj += get_interpolated_poses(poses[idx], poses[idx + 1], steps=steps_per_transition)
        k_interp += get_interpolated_k(Ks[idx], Ks[idx + 1], steps=steps_per_transition)
    return np.stack(traj, axis=0).astype(np.float32), np.stack(k_interp, axis=0).astype(np.float32)


def normalize(x) -> np.ndarray:
    return x / np.linalg.norm(x)


def normalize_with_norm(x: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    norm = np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-10)
    return x / norm, norm


def viewmatrix(lookat: np.ndarray, up: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Camera-to-world from look-at (reference :342-360)."""
    vec2 = normalize(lookat)
    vec1_avg = normalize(up)
    vec0 = normalize(np.cross(vec1_avg, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def get_distortion_params(
    k1: float = 0.0, k2: float = 0.0, k3: float = 0.0, k4: float = 0.0, p1: float = 0.0, p2: float = 0.0
) -> np.ndarray:
    """OpenCV radial (k1..k4) + tangential (p1, p2), packed (reference :363-392)."""
    return np.array([k1, k2, k3, k4, p1, p2], dtype=np.float32)


def _compute_residual_and_jacobian(x, y, xd, yd, distortion_params):
    """(:395-438)"""
    k1, k2, k3, k4 = (
        distortion_params[..., 0],
        distortion_params[..., 1],
        distortion_params[..., 2],
        distortion_params[..., 3],
    )
    p1, p2 = distortion_params[..., 4], distortion_params[..., 5]
    r = x * x + y * y
    d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
    fx = d * x + 2 * p1 * x * y + p2 * (r + 2 * x * x) - xd
    fy = d * y + 2 * p2 * x * y + p1 * (r + 2 * y * y) - yd
    d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
    d_x = 2.0 * x * d_r
    d_y = 2.0 * y * d_r
    fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
    fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
    fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
    fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
    return fx, fy, fx_x, fx_y, fy_x, fy_y


def radial_and_tangential_undistort(
    coords: jnp.ndarray,
    distortion_params: jnp.ndarray,
    eps: float = 1e-3,
    max_iterations: int = 10,
) -> jnp.ndarray:
    """Newton undistortion, fixed iterations (reference :441-489).

    coords (..., 2) distorted -> undistorted. fori_loop keeps the trace tiny.
    """
    xd, yd = coords[..., 0], coords[..., 1]

    def body(_, xy):
        x, y = xy
        fx, fy, fx_x, fx_y, fy_x, fy_y = _compute_residual_and_jacobian(x, y, xd, yd, distortion_params)
        denom = fx_x * fy_y - fx_y * fy_x
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        ok = jnp.abs(denom) > eps
        step_x = jnp.where(ok, x_num / jnp.where(ok, denom, 1.0), 0.0)
        step_y = jnp.where(ok, y_num / jnp.where(ok, denom, 1.0), 0.0)
        return (x - step_x, y - step_y)

    x, y = jax.lax.fori_loop(0, max_iterations, body, (xd, yd))
    return jnp.stack([x, y], axis=-1)


def rotation_matrix_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation taking a to b (reference :492-522)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-8:
        if c > 0:
            return np.eye(3)
        # 180 deg: any perpendicular axis
        perp = np.cross(a, np.array([1.0, 0, 0]))
        if np.linalg.norm(perp) < 1e-8:
            perp = np.cross(a, np.array([0, 1.0, 0]))
        perp = perp / np.linalg.norm(perp)
        return 2.0 * np.outer(perp, perp) - np.eye(3)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * (1.0 / (1.0 + c))


def focus_of_attention(poses: np.ndarray, initial_focus: np.ndarray) -> np.ndarray:
    """Closest point to all camera optical axes (reference :525-549)."""
    active_directions = -poses[:, :3, 2:3]
    active_origins = poses[:, :3, 3:4]
    focus_pt = initial_focus
    active = (
        np.sum(active_directions.squeeze(-1) * (focus_pt - active_origins.squeeze(-1)), axis=-1) > 0
    )
    done = False
    for _ in range(10):
        if active.sum() == 0:
            break
        ad = active_directions[active]
        ao = active_origins[active]
        m = np.eye(3) - ad * np.transpose(ad, (0, 2, 1))
        mt_m = np.transpose(m, (0, 2, 1)) @ m
        focus_pt = np.linalg.inv(mt_m.mean(0)) @ (mt_m @ ao).mean(0)[:, 0]
        new_active = (
            np.sum(active_directions.squeeze(-1) * (focus_pt - active_origins.squeeze(-1)), axis=-1) > 0
        )
        if (new_active == active).all():
            done = True
            break
        active = new_active
    del done
    return focus_pt


def auto_orient_and_center_poses(
    poses: np.ndarray,
    method: Literal["pca", "up", "vertical", "none"] = "up",
    center_method: Literal["poses", "focus", "none"] = "poses",
) -> Tuple[np.ndarray, np.ndarray]:
    """Orient + center poses; returns (new_poses, applied 3x4 transform)
    (reference :552-662). Host-side numpy."""
    origins = poses[..., :3, 3]
    mean_origin = origins.mean(axis=0)
    if center_method == "poses":
        translation = mean_origin
    elif center_method == "focus":
        translation = focus_of_attention(poses, mean_origin)
    elif center_method == "none":
        translation = np.zeros_like(mean_origin)
    else:
        raise ValueError(center_method)

    if method == "pca":
        centered = origins - mean_origin
        _, eigvec = np.linalg.eigh(centered.T @ centered)
        eigvec = np.flip(eigvec, axis=-1)
        if np.linalg.det(eigvec) < 0:
            eigvec[:, 2] = -eigvec[:, 2]
        transform = np.concatenate([eigvec.T, eigvec.T @ -translation[..., None]], axis=-1)
        oriented = transform @ np.concatenate([poses, np.broadcast_to(np.array([[0.0, 0, 0, 1]]), (len(poses), 1, 4))], axis=1)
        if oriented.mean(axis=0)[2, 1] < 0:
            oriented[:, 1:3] = -oriented[:, 1:3]
            transform[1:3] = -transform[1:3]
        return oriented, transform
    if method in ("up", "vertical"):
        up = poses[:, :3, 1].mean(0)
        up = up / np.linalg.norm(up)
        if method == "vertical":
            x_axis_matrix = poses[:, :3, 0]
            _, S, Vh = np.linalg.svd(x_axis_matrix, full_matrices=False)
            up_vertical = Vh[2, :]
            up = up_vertical if np.dot(up_vertical, up) > 0 else -up_vertical
        rotation = rotation_matrix_between(up, np.array([0.0, 0, 1]))
        transform = np.concatenate([rotation, rotation @ -translation[..., None]], axis=-1)
        bottom = np.broadcast_to(np.array([[0.0, 0, 0, 1]]), (len(poses), 1, 4))
        oriented = transform @ np.concatenate([poses[:, :3], bottom], axis=1)
        return oriented, transform
    if method == "none":
        transform = np.eye(4)[:3]
        transform[:, 3] = -translation
        oriented = poses[:, :3].copy()
        oriented[:, :, 3] -= translation
        return oriented, transform
    raise ValueError(method)


def fisheye624_project(xyz: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
    """Fisheye624 (OculusVisionFishEye) projection (reference :665-751).

    params (..., 16): fx fy cx cy k1..k6 p1 p2 s1..s4.
    """
    assert params.shape[-1] == 16
    eps = 1e-9
    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k = params[..., 4:10]
    p1, p2 = params[..., 10], params[..., 11]
    s = params[..., 12:16]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    theta2 = theta * theta
    theta_pows = jnp.stack([theta2 ** (i + 1) for i in range(6)], axis=-1)
    th_radial = 1.0 + jnp.sum(theta_pows * k, axis=-1)
    th_divr = jnp.where(r < eps, 1.0, theta / jnp.maximum(r, eps))
    xr_yr_x = th_radial * th_divr * x
    xr_yr_y = th_radial * th_divr * y
    xr_yr_x = jnp.where(r < eps, x, xr_yr_x)
    xr_yr_y = jnp.where(r < eps, y, xr_yr_y)
    uv_x = xr_yr_x
    uv_y = xr_yr_y
    r2 = xr_yr_x**2 + xr_yr_y**2
    uv_x = uv_x + 2 * p1 * xr_yr_x * xr_yr_y + p2 * (r2 + 2 * xr_yr_x**2)
    uv_y = uv_y + 2 * p2 * xr_yr_x * xr_yr_y + p1 * (r2 + 2 * xr_yr_y**2)
    uv_x = uv_x + s[..., 0] * r2 + s[..., 1] * r2 * r2
    uv_y = uv_y + s[..., 2] * r2 + s[..., 3] * r2 * r2
    return jnp.stack([uv_x * fx + cx, uv_y * fy + cy], axis=-1)


def fisheye624_unproject(uv: jnp.ndarray, params: jnp.ndarray, max_iters: int = 5) -> jnp.ndarray:
    """Newton inverse of fisheye624_project (reference :754-882): returns unit rays."""
    assert params.shape[-1] == 16

    def proj(xy):
        xyz = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
        return fisheye624_project(xyz, params)

    fx, fy, cx, cy = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    init = jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)

    def body(_, xy):
        f = proj(xy) - uv
        J = jax.vmap(jax.jacobian(lambda p: proj(p[None])[0]))(xy.reshape(-1, 2)).reshape(xy.shape[:-1] + (2, 2))
        delta = jnp.linalg.solve(J + 1e-8 * jnp.eye(2), f[..., None])[..., 0]
        return xy - delta

    xy = jax.lax.fori_loop(0, max_iters, body, init)
    ray = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
