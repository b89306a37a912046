"""Scene bounds (reference: nerfstudio/data/scene_box.py:28-118)."""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.tensor_dataclass import TensorDataclass, tensor_dataclass


@tensor_dataclass
class SceneBox(TensorDataclass):
    """Axis-aligned scene bounding box. aabb: (2, 3) [[min], [max]]."""

    aabb: jnp.ndarray

    _field_custom_dimensions = {"aabb": 2}

    def within(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Boolean mask of points inside the box."""
        return jnp.all((pts > self.aabb[0]) & (pts < self.aabb[1]), axis=-1)

    def get_diagonal_length(self) -> jnp.ndarray:
        diff = self.aabb[1] - self.aabb[0]
        return jnp.sqrt(jnp.sum(diff**2))

    def get_center(self) -> jnp.ndarray:
        return (self.aabb[0] + self.aabb[1]) / 2.0

    def get_centered_and_scaled_scene_box(self, scale_factor: Union[float, jnp.ndarray] = 1.0) -> "SceneBox":
        return SceneBox(aabb=(self.aabb - self.get_center()) * scale_factor)

    @staticmethod
    def get_normalized_positions(positions: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
        """Map positions into [0, 1]^3 within the aabb (reference :62-70)."""
        aabb_lengths = aabb[1] - aabb[0]
        return (positions - aabb[0]) / aabb_lengths

    @staticmethod
    def from_camera_poses(poses: jnp.ndarray, scale_factor: float) -> "SceneBox":
        xyzs = poses[..., :3, -1]
        aabb = jnp.stack([xyzs.min(axis=0), xyzs.max(axis=0)])
        return SceneBox(aabb=aabb * scale_factor)


@tensor_dataclass
class OrientedBox(TensorDataclass):
    """Oriented box: rotation R (3,3), translation T (3,), scale S (3,)."""

    R: jnp.ndarray
    T: jnp.ndarray
    S: jnp.ndarray

    _field_custom_dimensions = {"R": 2, "T": 1, "S": 1}

    def within(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Mask of points inside the oriented box (reference :88-100)."""
        pts_local = (pts - self.T) @ self.R.T
        half = self.S / 2.0
        return jnp.all((pts_local > -half) & (pts_local < half), axis=-1)

    @staticmethod
    def from_params(pos, rpy, scale) -> "OrientedBox":
        r, p, y = rpy
        cr, sr = np.cos(r), np.sin(r)
        cp, sp = np.cos(p), np.sin(p)
        cy, sy = np.cos(y), np.sin(y)
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        Ry = np.array([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
        Rx = np.array([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
        R = Rz @ Ry @ Rx
        return OrientedBox(
            R=jnp.asarray(R, dtype=jnp.float32),
            T=jnp.asarray(pos, dtype=jnp.float32),
            S=jnp.asarray(scale, dtype=jnp.float32),
        )
