"""3x4 pose matrix helpers (reference: nerfstudio/utils/poses.py)."""

from __future__ import annotations

import jax.numpy as jnp


def to4x4(pose: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) -> (..., 4, 4)."""
    bottom = jnp.zeros_like(pose[..., :1, :])
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([pose, bottom], axis=-2)


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 3, 4) rigid transform."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.matmul(R_inv, t, precision="highest")
    return jnp.concatenate([R_inv, t_inv], axis=-1)


def multiply(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Compose two (..., 3, 4) rigid transforms: a @ b."""
    R = jnp.matmul(pose_a[..., :3, :3], pose_b[..., :3, :3], precision="highest")
    t = pose_a[..., :3, 3:] + jnp.matmul(pose_a[..., :3, :3], pose_b[..., :3, 3:], precision="highest")
    return jnp.concatenate([R, t], axis=-1)


def normalize(poses: jnp.ndarray) -> jnp.ndarray:
    """Scale translations so the largest norm is <= 1."""
    max_t = jnp.max(jnp.abs(poses[..., :3, 3]))
    return poses.at[..., :3, 3].set(poses[..., :3, 3] / (max_t + 1e-10))
