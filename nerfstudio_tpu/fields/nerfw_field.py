"""NeRF-W field (reference: nerfstudio/fields/nerfw_field.py, 158 LoC).

Vanilla NeRF base + per-image appearance and transient embeddings; transient
head emits its own density/rgb/uncertainty. Used by semantic-nerfw and
phototourism."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.field_components.embedding import Embedding
from nerfstudio_tpu.field_components.encodings import NeRFEncoding
from nerfstudio_tpu.field_components.field_heads import (
    DensityFieldHead,
    FieldHeadNames,
    RGBFieldHead,
    SemanticFieldHead,
    TransientDensityFieldHead,
    TransientRGBFieldHead,
    UncertaintyFieldHead,
)
from nerfstudio_tpu.field_components.mlp import MLP
from nerfstudio_tpu.fields.base_field import Field


class VanillaNerfWField(Field):
    """(reference nerfw_field.py:33-158)"""

    num_images: int = 1
    appearance_embedding_dim: int = 48
    transient_embedding_dim: int = 16
    use_transient_embedding: bool = True
    use_semantics: bool = False
    num_semantic_classes: int = 100
    base_mlp_num_layers: int = 8
    base_mlp_layer_width: int = 256
    head_mlp_num_layers: int = 2
    head_mlp_layer_width: int = 128
    train: bool = True

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=10, min_freq_exp=0.0, max_freq_exp=8.0, include_input=True
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0, include_input=True
        )
        self.embedding_appearance = Embedding(self.num_images, self.appearance_embedding_dim)
        if self.use_transient_embedding:
            self.embedding_transient = Embedding(self.num_images, self.transient_embedding_dim)
        self.mlp_base = MLP(
            in_dim=self.position_encoding.get_out_dim(),
            num_layers=self.base_mlp_num_layers,
            layer_width=self.base_mlp_layer_width,
            skip_connections=(4,),
            out_activation="relu",
        )
        self.mlp_head = MLP(
            in_dim=self.base_mlp_layer_width
            + self.direction_encoding.get_out_dim()
            + self.appearance_embedding_dim,
            num_layers=self.head_mlp_num_layers,
            layer_width=self.head_mlp_layer_width,
            out_activation="relu",
        )
        if self.use_transient_embedding:
            self.mlp_transient = MLP(
                in_dim=self.base_mlp_layer_width + self.transient_embedding_dim,
                num_layers=4,
                layer_width=128,
                out_activation="relu",
            )
            self.field_head_transient_uncertainty = UncertaintyFieldHead()
            self.field_head_transient_rgb = TransientRGBFieldHead()
            self.field_head_transient_density = TransientDensityFieldHead()
        if self.use_semantics:
            self.mlp_semantic = MLP(
                in_dim=self.base_mlp_layer_width, num_layers=2, layer_width=128,
                out_activation="relu",
            )
            self.field_head_semantic = SemanticFieldHead(out_dim=self.num_semantic_classes)
        self.field_head_density = DensityFieldHead()
        self.field_head_rgb = RGBFieldHead()

    def get_density(self, ray_samples: RaySamples):
        encoded = self.position_encoding(ray_samples.frustums.get_positions())
        base = self.mlp_base(encoded)
        return self.field_head_density(base), base

    def get_outputs(
        self, ray_samples: RaySamples, density_embedding: Optional[jnp.ndarray] = None
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        outputs: Dict[FieldHeadNames, jnp.ndarray] = {}
        assert density_embedding is not None
        d_enc = self.direction_encoding(ray_samples.frustums.directions)
        if ray_samples.camera_indices is not None and self.train:
            emb_a = self.embedding_appearance(ray_samples.camera_indices[..., 0])
        else:
            emb_a = jnp.broadcast_to(
                self.embedding_appearance.mean(),
                density_embedding.shape[:-1] + (self.appearance_embedding_dim,),
            )
        head_in = jnp.concatenate([density_embedding, d_enc, emb_a], axis=-1)
        outputs[FieldHeadNames.RGB] = self.field_head_rgb(self.mlp_head(head_in))

        if self.use_transient_embedding and self.train and ray_samples.camera_indices is not None:
            emb_t = self.embedding_transient(ray_samples.camera_indices[..., 0])
            t_out = self.mlp_transient(jnp.concatenate([density_embedding, emb_t], axis=-1))
            outputs[FieldHeadNames.UNCERTAINTY] = self.field_head_transient_uncertainty(t_out)
            outputs[FieldHeadNames.TRANSIENT_RGB] = self.field_head_transient_rgb(t_out)
            outputs[FieldHeadNames.TRANSIENT_DENSITY] = self.field_head_transient_density(t_out)
        if self.use_semantics:
            outputs[FieldHeadNames.SEMANTICS] = self.field_head_semantic(
                self.mlp_semantic(density_embedding)
            )
        return outputs
