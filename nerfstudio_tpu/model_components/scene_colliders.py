"""Scene colliders — set nears/fars on a RayBundle (reference:
nerfstudio/model_components/scene_colliders.py, 191 LoC).

Pure functions returning a *new* RayBundle (functional; no in-place mutation)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.data.scene_box import SceneBox


@dataclasses.dataclass(frozen=True)
class AABBBoxCollider:
    """Slab-test AABB collider (reference scene_colliders.py:59-130)."""

    scene_box: SceneBox
    near_plane: float = 0.0

    def __call__(self, ray_bundle: RayBundle, training: bool = True) -> RayBundle:
        aabb = self.scene_box.aabb
        d = ray_bundle.directions
        o = ray_bundle.origins
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-10, 1e-10, d)
        t_min = (aabb[0] - o) * inv_d
        t_max = (aabb[1] - o) * inv_d
        t1 = jnp.minimum(t_min, t_max)
        t2 = jnp.maximum(t_min, t_max)
        nears = jnp.max(t1, axis=-1, keepdims=True)
        fars = jnp.min(t2, axis=-1, keepdims=True)
        near_plane = self.near_plane if training else 0.0
        nears = jnp.maximum(nears, near_plane)
        fars = jnp.maximum(fars, nears + 1e-6)
        return ray_bundle.replace(nears=nears, fars=fars)


@dataclasses.dataclass(frozen=True)
class SphereCollider:
    """Ray/sphere intersection (reference scene_colliders.py:133-166)."""

    center: jnp.ndarray
    radius: float
    soft_intersect_scale: float = 1.0
    near_plane: float = 0.0

    def __call__(self, ray_bundle: RayBundle, training: bool = True) -> RayBundle:
        o = ray_bundle.origins - jnp.asarray(self.center)
        d = ray_bundle.directions
        a = jnp.sum(d * d, axis=-1, keepdims=True)
        b = 2.0 * jnp.sum(o * d, axis=-1, keepdims=True)
        c = jnp.sum(o * o, axis=-1, keepdims=True) - self.radius**2
        disc = b**2 - 4 * a * c
        safe = jnp.maximum(disc, 0.0)
        sq = jnp.sqrt(safe) * self.soft_intersect_scale
        nears = (-b - sq) / (2 * a)
        fars = (-b + sq) / (2 * a)
        near_plane = self.near_plane if training else 0.0
        nears = jnp.maximum(nears, near_plane)
        fars = jnp.maximum(fars, nears + 1e-6)
        return ray_bundle.replace(nears=nears, fars=fars)


@dataclasses.dataclass(frozen=True)
class NearFarCollider:
    """Constant near/far planes (reference scene_colliders.py:169-191)."""

    near_plane: float
    far_plane: float

    def __call__(self, ray_bundle: RayBundle, training: bool = True) -> RayBundle:
        near = self.near_plane if training else max(self.near_plane, 1e-4)
        ones = jnp.ones_like(ray_bundle.origins[..., :1])
        return ray_bundle.replace(nears=ones * near, fars=ones * self.far_plane)
