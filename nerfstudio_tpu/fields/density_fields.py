"""Small proposal density fields (reference: nerfstudio/fields/density_fields.py, 120 LoC).

Hash grid + tiny MLP (or linear), density only — the nerfacto proposal
networks. Positions normalized through the optional SceneContraction."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.data.scene_box import SceneBox
from nerfstudio_tpu.field_components.activations import trunc_exp
from nerfstudio_tpu.field_components.mlp import MLPWithHashEncoding
from nerfstudio_tpu.field_components.spatial_distortions import SceneContraction
from nerfstudio_tpu.fields.base_field import Field


class HashMLPDensityField(Field):
    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-1.0, -1.0, -1.0),
        (1.0, 1.0, 1.0),
    )
    num_layers: int = 2
    hidden_dim: int = 16
    use_spatial_distortion: bool = False
    num_levels: int = 5
    max_res: int = 128
    base_res: int = 16
    log2_hashmap_size: int = 17
    features_per_level: int = 2
    average_init_density: float = 1.0
    implementation: str = "xla"
    bwd_corner_sample: bool = False
    stochastic_corner: bool = False
    z_pair: bool = False
    # block-packed tables: one row gather serves the FULL trilerp stencil
    # (density noise only perturbs sample placement, so proposal nets keep
    # the stochastic path in eval too)
    block: bool = False

    def setup(self):
        self.mlp_base = MLPWithHashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1,
            implementation=self.implementation,
            bwd_corner_sample=self.bwd_corner_sample,
            stochastic_corner=self.stochastic_corner and not self.block,
            z_pair=self.z_pair,
            block=self.block,
        )
        self._distortion = SceneContraction(order="inf") if self.use_spatial_distortion else None

    def get_density(self, ray_samples: RaySamples):
        positions = ray_samples.frustums.get_positions()
        aabb = jnp.asarray(self.aabb, dtype=jnp.float32)
        if self._distortion is not None:
            positions = self._distortion(positions)
            positions = (positions + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(positions, aabb)
        selector = jnp.all((positions > 0.0) & (positions < 1.0), axis=-1, keepdims=True)
        positions = positions * selector
        h = self.mlp_base(positions)
        density = self.average_init_density * trunc_exp(h)
        density = density * selector
        return density, None

    def get_outputs(self, ray_samples: RaySamples, density_embedding=None):
        return {}
