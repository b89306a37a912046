"""Nerfacto field (reference: nerfstudio/fields/nerfacto_field.py:42-310).

Hash-grid base MLP -> (density, 15 geo features); SH(4) direction encoding;
per-image appearance embedding (mean at eval); color head MLP(3x64, sigmoid);
optional transient / semantic / predicted-normal heads. Density activation is
``average_init_density * trunc_exp(x)`` computed in f32 (the reference keeps
density in f32 under AMP for the same reason — nerfacto_field.py:226-231).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.data.scene_box import SceneBox
from nerfstudio_tpu.field_components.activations import trunc_exp
from nerfstudio_tpu.field_components.embedding import Embedding
from nerfstudio_tpu.field_components.encodings import SHEncoding
from nerfstudio_tpu.field_components.field_heads import (
    FieldHeadNames,
    PredNormalsFieldHead,
    SemanticFieldHead,
    TransientDensityFieldHead,
    TransientRGBFieldHead,
    UncertaintyFieldHead,
)
from nerfstudio_tpu.field_components.mlp import MLP, MLPWithHashEncoding
from nerfstudio_tpu.field_components.spatial_distortions import SceneContraction
from nerfstudio_tpu.fields.base_field import Field, get_normalized_directions


class NerfactoField(Field):
    aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-1.0, -1.0, -1.0),
        (1.0, 1.0, 1.0),
    )
    num_images: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_average_appearance_embedding: bool = True
    use_transient_embedding: bool = False
    transient_embedding_dim: int = 16
    use_semantics: bool = False
    num_semantic_classes: int = 100
    use_pred_normals: bool = False
    use_appearance_embedding: bool = True
    disable_scene_contraction: bool = False
    average_init_density: float = 1.0
    implementation: str = "xla"
    bwd_corner_sample: bool = False
    z_pair: bool = False
    # block-packed hash tables: ONE row gather per trilerp while training
    # (stochastic odd-axis rounding); eval renders through the exact
    # 8-corner path over the same layout (ops/hash_grid.py block mode)
    hash_block: bool = False
    # exact 8-corner trilerp at eval (noise-free renders). False = keep the
    # train-path one-gather stochastic trilerp at eval too — the viewer
    # "preview" mode (~8x less gather traffic, slight per-pixel noise).
    exact_eval: bool = True
    train: bool = True

    def setup(self):
        self.direction_encoding = SHEncoding(levels=4)
        self.mlp_base = MLPWithHashEncoding(
            num_levels=self.num_levels,
            min_res=self.base_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
            implementation=self.implementation,
            bwd_corner_sample=self.bwd_corner_sample,
            z_pair=self.z_pair,
            block=self.hash_block and (self.train or not self.exact_eval),
            block_exact=self.hash_block and not self.train and self.exact_eval,
        )
        if self.use_appearance_embedding and self.appearance_embedding_dim > 0:
            self.embedding_appearance = Embedding(self.num_images, self.appearance_embedding_dim)
        if self.use_transient_embedding:
            self.embedding_transient = Embedding(self.num_images, self.transient_embedding_dim)
            self.mlp_transient = MLP(
                in_dim=self.geo_feat_dim + self.transient_embedding_dim,
                num_layers=2,
                layer_width=64,
                out_dim=64,
            )
            self.field_head_transient_uncertainty = UncertaintyFieldHead()
            self.field_head_transient_rgb = TransientRGBFieldHead()
            self.field_head_transient_density = TransientDensityFieldHead()
        if self.use_semantics:
            self.mlp_semantics = MLP(in_dim=self.geo_feat_dim, num_layers=2, layer_width=64, out_dim=64)
            self.field_head_semantics = SemanticFieldHead(out_dim=self.num_semantic_classes)
        if self.use_pred_normals:
            self.mlp_pred_normals = MLP(in_dim=self.geo_feat_dim + 3, num_layers=3, layer_width=64, out_dim=64)
            self.field_head_pred_normals = PredNormalsFieldHead()

        color_in = self.direction_encoding.get_out_dim() + self.geo_feat_dim
        if self.use_appearance_embedding and self.appearance_embedding_dim > 0:
            color_in += self.appearance_embedding_dim
        self.mlp_head = MLP(
            in_dim=color_in,
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_dim=3,
            out_activation="sigmoid",
        )

    def density_from_normalized(self, positions01: jnp.ndarray) -> jnp.ndarray:
        """Density at already contracted+normalized coords in [0,1]^3.

        Used by the occupancy-grid aux update, whose grid lives directly in
        the field's normalized input space (no inverse contraction needed)."""
        selector = jnp.all((positions01 > 0.0) & (positions01 < 1.0), axis=-1, keepdims=True)
        p = positions01 * selector
        h = self.mlp_base(p)
        density = self.average_init_density * trunc_exp(h[..., :1].astype(jnp.float32))
        return density * selector

    def get_density(self, ray_samples: RaySamples, bwd_levels=None, bwd_scale: float = 1.0):
        """(reference nerfacto_field.py:203-232). ``bwd_levels``/``bwd_scale``:
        static level-subsampled table backward (ops/hash_grid.hash_encode)."""
        positions = ray_samples.frustums.get_positions()
        if not self.disable_scene_contraction:
            positions = SceneContraction(order="inf")(positions)
            positions = (positions + 2.0) / 4.0
        else:
            positions = SceneBox.get_normalized_positions(
                positions, jnp.asarray(self.aabb, dtype=jnp.float32)
            )
        selector = jnp.all((positions > 0.0) & (positions < 1.0), axis=-1, keepdims=True)
        positions = positions * selector
        h = self.mlp_base(positions, bwd_levels=bwd_levels, bwd_scale=bwd_scale)
        density_before, geo_feat = h[..., :1].astype(jnp.float32), h[..., 1:]
        density = self.average_init_density * trunc_exp(density_before)
        density = density * selector
        return density, geo_feat

    def get_outputs(
        self, ray_samples: RaySamples, density_embedding: Optional[jnp.ndarray] = None
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        """(reference nerfacto_field.py:234-310)"""
        assert density_embedding is not None
        outputs: Dict[FieldHeadNames, jnp.ndarray] = {}
        directions = get_normalized_directions(ray_samples.frustums.directions)
        d = self.direction_encoding(directions)

        head_inputs = [d, density_embedding]
        if self.use_appearance_embedding and self.appearance_embedding_dim > 0:
            if ray_samples.camera_indices is not None and self.train:
                camera_indices = ray_samples.camera_indices[..., 0]
                embedded_appearance = self.embedding_appearance(camera_indices)
            else:
                if self.use_average_appearance_embedding:
                    mean_emb = self.embedding_appearance.mean()
                else:
                    mean_emb = jnp.zeros((self.appearance_embedding_dim,))
                embedded_appearance = jnp.broadcast_to(
                    mean_emb, density_embedding.shape[:-1] + (self.appearance_embedding_dim,)
                )
            head_inputs.append(embedded_appearance)

        if self.use_transient_embedding and self.train and ray_samples.camera_indices is not None:
            camera_indices = ray_samples.camera_indices[..., 0]
            emb_t = self.embedding_transient(camera_indices)
            t_in = jnp.concatenate([density_embedding, emb_t], axis=-1)
            t_out = self.mlp_transient(t_in)
            outputs[FieldHeadNames.UNCERTAINTY] = self.field_head_transient_uncertainty(t_out)
            outputs[FieldHeadNames.TRANSIENT_RGB] = self.field_head_transient_rgb(t_out)
            outputs[FieldHeadNames.TRANSIENT_DENSITY] = self.field_head_transient_density(t_out)

        if self.use_semantics:
            s_in = jax.lax.stop_gradient(density_embedding)
            outputs[FieldHeadNames.SEMANTICS] = self.field_head_semantics(self.mlp_semantics(s_in))

        if self.use_pred_normals:
            positions = ray_samples.frustums.get_positions()
            pn_in = jnp.concatenate([density_embedding, positions], axis=-1)
            outputs[FieldHeadNames.PRED_NORMALS] = self.field_head_pred_normals(
                self.mlp_pred_normals(pn_in)
            )

        rgb = self.mlp_head(jnp.concatenate(head_inputs, axis=-1))
        outputs[FieldHeadNames.RGB] = rgb
        return outputs
