"""Vanilla NeRF field (reference: nerfstudio/fields/vanilla_nerf_field.py, 107 LoC).

8-layer 256-wide base MLP on positional encoding (10 freq) with skip at 4;
density head; color head on [base_features, dir-enc(4 freq)]."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.field_components.encodings import NeRFEncoding
from nerfstudio_tpu.field_components.field_heads import (
    DensityFieldHead,
    FieldHeadNames,
    RGBFieldHead,
)
from nerfstudio_tpu.field_components.mlp import MLP
from nerfstudio_tpu.fields.base_field import Field


class NeRFField(Field):
    position_encoding_num_frequencies: int = 10
    direction_encoding_num_frequencies: int = 4
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128
    skip_connections: Tuple[int, ...] = (4,)
    use_integrated_encoding: bool = False

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.position_encoding_num_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=float(self.position_encoding_num_frequencies - 2),
            include_input=True,
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3,
            num_frequencies=self.direction_encoding_num_frequencies,
            min_freq_exp=0.0,
            max_freq_exp=float(self.direction_encoding_num_frequencies - 2),
            include_input=True,
        )
        self.mlp_base = MLP(
            in_dim=self.position_encoding.get_out_dim(),
            num_layers=self.base_mlp_num_layers,
            layer_width=self.base_mlp_layer_width,
            skip_connections=self.skip_connections,
            activation="relu",
            out_activation="relu",
        )
        self.mlp_head = MLP(
            in_dim=self.base_mlp_layer_width + self.direction_encoding.get_out_dim(),
            num_layers=self.head_mlp_num_layers,
            layer_width=self.head_mlp_layer_width,
            activation="relu",
            out_activation="relu",
        )
        self.field_output_density = DensityFieldHead()
        self.field_output_color = RGBFieldHead()

    def get_density(self, ray_samples: RaySamples):
        if self.use_integrated_encoding:
            gaussians = ray_samples.frustums.get_gaussian_blob()
            encoded = self.position_encoding(gaussians.mean, gaussians.cov)
        else:
            positions = ray_samples.frustums.get_positions()
            encoded = self.position_encoding(positions)
        base_out = self.mlp_base(encoded)
        density = self.field_output_density(base_out)
        return density, base_out

    def get_outputs(
        self, ray_samples: RaySamples, density_embedding: Optional[jnp.ndarray] = None
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        directions = ray_samples.frustums.directions
        encoded_dir = self.direction_encoding(directions)
        assert density_embedding is not None
        head_in = jnp.concatenate([encoded_dir, density_embedding], axis=-1)
        rgb = self.field_output_color(self.mlp_head(head_in))
        return {FieldHeadNames.RGB: rgb}
