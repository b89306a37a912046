"""Shaders (reference: nerfstudio/model_components/shaders.py, 78 LoC)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def lambertian_shader(
    rgb: jnp.ndarray,
    normals: jnp.ndarray,
    light_direction: jnp.ndarray,
    shading_weight: float = 1.0,
    detach_normals: bool = True,
) -> jnp.ndarray:
    """(reference shaders.py:24-56)"""
    import jax

    if detach_normals:
        normals = jax.lax.stop_gradient(normals)
    lambertian = jnp.clip(jnp.sum(normals * light_direction, axis=-1, keepdims=True), 0.0, None)
    shading = (1.0 - shading_weight) + shading_weight * lambertian
    return rgb * shading


def normals_shader(normals: jnp.ndarray) -> jnp.ndarray:
    """Map normals [-1,1] -> color [0,1] (reference shaders.py:59-78)."""
    return (normals + 1.0) / 2.0
