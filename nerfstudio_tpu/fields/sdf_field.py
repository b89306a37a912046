"""SDF field for NeuS/VolSDF surface reconstruction (reference:
nerfstudio/fields/sdf_field.py:111-460).

Geometric initialization (sphere SDF prior), LearnedVariance (inv_s), NeuS
alpha from SDF section estimates with cos annealing, numerical or analytical
gradients for normals."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.field_components.embedding import Embedding
from nerfstudio_tpu.field_components.encodings import NeRFEncoding
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames


class LearnedVariance(nn.Module):
    """exp(10 * variance) single learned scalar (reference sdf_field.py:39-57)."""

    init_val: float = 0.3

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        variance = self.param("variance", lambda k: jnp.asarray(self.init_val))
        return jnp.exp(variance * 10.0)


def _geometric_init(key, shape, out_bias=0.5, last_layer=False, first_layer=False, in_dim_raw=3):
    """SAL geometric init (reference sdf_field.py:167-203)."""
    fan_in, fan_out = shape
    if last_layer:
        mean = float(np.sqrt(np.pi) / np.sqrt(fan_in))
        return mean + 0.0001 * jax.random.normal(key, shape)
    w = jax.random.normal(key, shape) * np.sqrt(2.0 / fan_out)
    if first_layer:
        # zero weights for the positional-encoding part (keep raw xyz)
        w = w.at[in_dim_raw:, :].set(0.0)
    return w


class SDFField(nn.Module):
    """(reference sdf_field.py:111-460)"""

    num_layers: int = 8
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 4
    hidden_dim_color: int = 256
    appearance_embedding_dim: int = 32
    num_images: int = 1
    bias: float = 0.5  # sphere radius for geometric init
    geometric_init: bool = True
    use_appearance_embedding: bool = True
    use_average_appearance_embedding: bool = False
    use_numerical_gradients: bool = False
    numerical_gradient_delta: float = 1e-4
    train: bool = True

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=6, min_freq_exp=0.0, max_freq_exp=5.0, include_input=True
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0, include_input=True
        )
        if self.use_appearance_embedding:
            self.embedding_appearance = Embedding(self.num_images, self.appearance_embedding_dim)
        self.deviation_network = LearnedVariance()

        in_dim = self.position_encoding.get_out_dim()
        dims = [in_dim] + [self.hidden_dim] * (self.num_layers - 1) + [1 + self.geo_feat_dim]
        layers = []
        for i in range(len(dims) - 1):
            first = i == 0
            last = i == len(dims) - 2

            def make_init(first=first, last=last, fan=(dims[i], dims[i + 1])):
                def init(key, shape, dtype=jnp.float32):
                    if not self.geometric_init:
                        return nn.initializers.lecun_normal()(key, shape, dtype)
                    return _geometric_init(key, shape, last_layer=last, first_layer=first)

                return init

            def bias_init(last=last):
                def init(key, shape, dtype=jnp.float32):
                    if self.geometric_init and last:
                        return jnp.full(shape, -self.bias)
                    return jnp.zeros(shape)

                return init

            layers.append(
                nn.Dense(dims[i + 1], kernel_init=make_init(), bias_init=bias_init())
            )
        self.glin = layers

        color_in = (
            3  # point
            + self.direction_encoding.get_out_dim()
            + 3  # normal
            + self.geo_feat_dim
            + (self.appearance_embedding_dim if self.use_appearance_embedding else 0)
        )
        clayers = []
        cdims = [color_in] + [self.hidden_dim_color] * (self.num_layers_color - 1) + [3]
        for i in range(len(cdims) - 1):
            clayers.append(nn.Dense(cdims[i + 1]))
        self.clin = clayers

    # ------------------------------------------------------------------
    def forward_geonetwork(self, positions: jnp.ndarray) -> jnp.ndarray:
        """positions -> (sdf, geo_features) concatenated (reference :255-292)."""
        h = self.position_encoding(positions)
        for i, layer in enumerate(self.glin):
            h = layer(h)
            if i < len(self.glin) - 1:
                h = jax.nn.softplus(h * 100.0) / 100.0  # beta=100 softplus
        return h

    def get_sdf(self, ray_samples: RaySamples) -> jnp.ndarray:
        positions = ray_samples.frustums.get_positions()
        return self.forward_geonetwork(positions)[..., :1]

    def gradient(self, positions: jnp.ndarray) -> jnp.ndarray:
        """SDF spatial gradient (normals); numerical or analytical
        (reference :294-330)."""
        if self.use_numerical_gradients:
            d = self.numerical_gradient_delta
            offsets = jnp.asarray(
                [[d, 0, 0], [-d, 0, 0], [0, d, 0], [0, -d, 0], [0, 0, d], [0, 0, -d]]
            )
            pts = positions[..., None, :] + offsets  # (..., 6, 3)
            sdf = self.forward_geonetwork(pts.reshape(-1, 3))[..., 0].reshape(
                positions.shape[:-1] + (6,)
            )
            grad = jnp.stack(
                [
                    (sdf[..., 0] - sdf[..., 1]) / (2 * d),
                    (sdf[..., 2] - sdf[..., 3]) / (2 * d),
                    (sdf[..., 4] - sdf[..., 5]) / (2 * d),
                ],
                axis=-1,
            )
            return grad

        def sdf_sum(p):
            return jnp.sum(self.forward_geonetwork(p)[..., 0])

        return jax.grad(sdf_sum)(positions)

    def get_alpha(
        self,
        ray_samples: RaySamples,
        sdf: jnp.ndarray,
        gradients: jnp.ndarray,
        cos_anneal_ratio: float = 1.0,
    ) -> jnp.ndarray:
        """NeuS alpha computation (reference sdf_field.py:294-357)."""
        inv_s = self.deviation_network()
        dirs = ray_samples.frustums.directions
        true_cos = jnp.sum(dirs * gradients, axis=-1, keepdims=True)
        # cos annealing (reference: mix of relu'd cosines)
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + jax.nn.relu(-true_cos) * cos_anneal_ratio
        )
        deltas = ray_samples.deltas
        est_next = sdf + iter_cos * deltas * 0.5
        est_prev = sdf - iter_cos * deltas * 0.5
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5), 0.0, 1.0)
        return alpha

    def get_colors(
        self,
        points: jnp.ndarray,
        directions: jnp.ndarray,
        normals: jnp.ndarray,
        geo_features: jnp.ndarray,
        camera_indices: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """(reference sdf_field.py:359-410)"""
        d = self.direction_encoding(directions)
        inputs = [points, d, normals, geo_features]
        if self.use_appearance_embedding:
            if camera_indices is not None and self.train:
                emb = self.embedding_appearance(camera_indices[..., 0])
            elif self.use_average_appearance_embedding:
                emb = jnp.broadcast_to(
                    self.embedding_appearance.mean(),
                    points.shape[:-1] + (self.appearance_embedding_dim,),
                )
            else:
                emb = jnp.zeros(points.shape[:-1] + (self.appearance_embedding_dim,))
            inputs.append(emb)
        h = jnp.concatenate(inputs, axis=-1)
        for i, layer in enumerate(self.clin):
            h = layer(h)
            if i < len(self.clin) - 1:
                h = jax.nn.relu(h)
        return jax.nn.sigmoid(h)

    def __call__(
        self, ray_samples: RaySamples, cos_anneal_ratio: float = 1.0
    ) -> Dict[FieldHeadNames, jnp.ndarray]:
        """(reference sdf_field.py:412-460)"""
        positions = ray_samples.frustums.get_positions()
        h = self.forward_geonetwork(positions)
        sdf, geo = h[..., :1], h[..., 1:]
        gradients = self.gradient(positions)
        normals = gradients / jnp.maximum(
            jnp.linalg.norm(gradients, axis=-1, keepdims=True), 1e-10
        )
        alpha = self.get_alpha(ray_samples, sdf, gradients, cos_anneal_ratio)
        rgb = self.get_colors(
            positions, ray_samples.frustums.directions, normals, geo, ray_samples.camera_indices
        )
        return {
            FieldHeadNames.RGB: rgb,
            FieldHeadNames.SDF: sdf,
            FieldHeadNames.ALPHA: alpha,
            FieldHeadNames.NORMALS: normals,
            FieldHeadNames.GRADIENT: gradients,
        }
