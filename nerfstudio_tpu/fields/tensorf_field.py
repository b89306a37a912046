"""TensoRF field (reference: nerfstudio/fields/tensorf_field.py, 142 LoC).

VM-decomposed density + color features; small MLP color head with direction
encoding."""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.data.scene_box import SceneBox
from nerfstudio_tpu.field_components.encodings import NeRFEncoding, TensorVMEncoding
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.field_components.mlp import MLP
from nerfstudio_tpu.fields.base_field import Field


class TensoRFField(Field):
    aabb: tuple = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    density_resolution: int = 128
    color_resolution: int = 128
    density_components: int = 16
    color_components: int = 48
    appearance_dim: int = 27
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128

    def setup(self):
        self.density_encoding = TensorVMEncoding(
            resolution=self.density_resolution, num_components=self.density_components
        )
        self.color_encoding = TensorVMEncoding(
            resolution=self.color_resolution, num_components=self.color_components
        )
        self.feature_encoding = NeRFEncoding(
            in_dim=self.appearance_dim, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0
        )
        self.B = nn.Dense(self.appearance_dim, use_bias=False)
        self.head = MLP(
            in_dim=1,  # recomputed at call
            num_layers=self.head_mlp_num_layers,
            layer_width=self.head_mlp_layer_width,
            out_dim=3,
            out_activation="sigmoid",
        )

    def get_density(self, ray_samples: RaySamples):
        positions = ray_samples.frustums.get_positions()
        aabb = jnp.asarray(self.aabb, jnp.float32)
        norm = SceneBox.get_normalized_positions(positions, aabb) * 2.0 - 1.0  # [-1,1]
        feats = self.density_encoding(norm)
        density = jax.nn.relu(jnp.sum(feats, axis=-1, keepdims=True))
        return density, None

    def get_outputs(self, ray_samples: RaySamples, density_embedding=None):
        positions = ray_samples.frustums.get_positions()
        aabb = jnp.asarray(self.aabb, jnp.float32)
        norm = SceneBox.get_normalized_positions(positions, aabb) * 2.0 - 1.0
        directions = ray_samples.frustums.directions
        rgb_features = self.color_encoding(norm)
        rgb_features = self.B(rgb_features)
        d_enc = self.direction_encoding(directions)
        f_enc = self.feature_encoding(rgb_features)
        h = jnp.concatenate([rgb_features, d_enc, f_enc], axis=-1)
        rgb = self.head(h)
        return {FieldHeadNames.RGB: rgb}
