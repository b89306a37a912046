"""Field base API (reference: nerfstudio/fields/base_field.py, 142 LoC).

A Field is a flax module mapping RaySamples -> {FieldHeadNames: array}. The
reference's density-caching autograd-normals trick (base_field.py get_normals)
becomes an explicit jax.grad of the density w.r.t. positions — no hidden
state, and XLA shares the forward computation between value and gradient.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames


def get_normalized_directions(directions: jnp.ndarray) -> jnp.ndarray:
    """SH encodings expect directions in [0,1] (reference base_field.py:135-142)."""
    return (directions + 1.0) / 2.0


class Field(nn.Module):
    """Base field (reference base_field.py:29-133)."""

    def get_density(self, ray_samples: RaySamples) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (density (..., 1), geo_features (..., G))"""
        raise NotImplementedError

    def get_outputs(
        self, ray_samples: RaySamples, density_embedding: Optional[jnp.ndarray] = None
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        raise NotImplementedError

    def density_fn(self, positions: jnp.ndarray, times: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Density at raw positions — the proposal-sampler hook
        (reference base_field.py:49-79). Builds point-like samples."""
        from nerfstudio_tpu.core.rays import Frustums

        frustums = Frustums(
            origins=positions,
            directions=jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), positions.shape),
            starts=jnp.zeros_like(positions[..., :1]),
            ends=jnp.zeros_like(positions[..., :1]),
            pixel_area=jnp.ones_like(positions[..., :1]),
        )
        ray_samples = RaySamples(frustums=frustums, times=times)
        density, _ = self.get_density(ray_samples)
        return density

    def __call__(
        self, ray_samples: RaySamples, compute_normals: bool = False, **density_kwargs
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        """Evaluate density + heads; optionally normals = -∇σ/|∇σ|
        (reference base_field.py:81-133). ``density_kwargs`` are forwarded to
        ``get_density`` (e.g. nerfacto's static ``bwd_levels`` gate)."""
        if compute_normals:
            positions = ray_samples.frustums.get_positions()

            def density_of(pos):
                rs = ray_samples.replace(
                    frustums=ray_samples.frustums.replace(
                        origins=pos,
                        starts=jnp.zeros_like(pos[..., :1]),
                        ends=jnp.zeros_like(pos[..., :1]),
                    )
                )
                d, emb = self.get_density(rs, **density_kwargs)
                return jnp.sum(d), (d, emb)

            grads, (density, density_embedding) = jax.grad(density_of, has_aux=True)(positions)
            normals = -grads / jnp.maximum(
                jnp.linalg.norm(grads, axis=-1, keepdims=True), 1e-10
            )
        else:
            density, density_embedding = self.get_density(ray_samples, **density_kwargs)
            normals = None

        field_outputs = self.get_outputs(ray_samples, density_embedding=density_embedding)
        field_outputs[FieldHeadNames.DENSITY] = density
        if normals is not None:
            field_outputs[FieldHeadNames.NORMALS] = normals
        return field_outputs
