"""SDF field for NeuS/VolSDF surface reconstruction (reference:
nerfstudio/fields/sdf_field.py:111-460).

Geometric (SAL sphere) initialization, LearnedVariance (inv_s), NeuS alpha
from SDF section estimates with cos annealing, weight-normalized geometric
MLP with the reference's skip connection at layer 4.

Layout note (r5 root-cause of the ~12 dB neus gates): the geometric net's
input is ``[xyz, positional_encoding]`` with the RAW xyz FIRST (reference
sdf_field.py:266-268 concatenates inputs before the encoding). The SAL init
zeroes the first layer's weights on every encoding dim and draws only the
xyz rows, so the net starts as an exact sphere SDF with |grad|=1. The old
code appended xyz LAST (``include_input=True``) while still zeroing rows
3:, i.e. it kept three sin-features and killed the xyz path — the field
initialized with |grad| ~ 10 and the eikonal term dominated training."""

from __future__ import annotations

from typing import Dict, Optional

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

    init_val: float = 0.1

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        variance = self.param("variance", lambda k: jnp.asarray(self.init_val))
        return jnp.exp(variance * 10.0)


class WNDense(nn.Module):
    """Weight-normalized Dense: y = x @ (g * v / ||v||_col) + b.

    The scale ``g`` initializes to the column norms of the initial kernel,
    so the function at init equals the plain geometric init exactly (torch
    ``weight_norm`` semantics — reference sdf_field.py:247 wraps every geo
    layer when ``weight_norm=True``, the shipped default)."""

    features: int
    kernel_init: nn.initializers.Initializer
    bias_init: nn.initializers.Initializer

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        v = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        g = self.param("scale", lambda key, shape: jnp.linalg.norm(v, axis=0), (self.features,))
        b = self.param("bias", self.bias_init, (self.features,))
        norm = jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12)
        return x @ (v * (g / norm)) + b


def _first_layer_init(key, shape, dtype=jnp.float32):
    """Zero every encoding row, draw the 3 raw-xyz rows (reference :236-238).

    Kernel is (in, out); the geo input layout is [xyz(3), pe...]."""
    fan_in, fan_out = shape
    w = jnp.zeros(shape, dtype)
    w = w.at[:3, :].set(
        jax.random.normal(key, (3, fan_out), dtype) * np.sqrt(2.0 / fan_out)
    )
    return w


def _skip_layer_init(in_dim0: int):
    """Skip-consuming layer: normal everywhere, zero the PE rows of the
    re-concatenated input (keep its xyz rows live — reference :239-242)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape
        w = jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)
        # the concat tail is [xyz(3), pe(in_dim0-3)]; zero the pe rows
        return w.at[fan_in - (in_dim0 - 3):, :].set(0.0)

    return init


def _hidden_layer_init(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape
    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan_out)


def _last_layer_init(sign: float):
    """normal(mean=sign*sqrt(pi)/sqrt(fan_in), std=1e-4) (reference :229-234)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape
        mean = sign * float(np.sqrt(np.pi) / np.sqrt(fan_in))
        return mean + 0.0001 * jax.random.normal(key, shape, dtype)

    return init


class SDFField(nn.Module):
    """(reference sdf_field.py:111-460)"""

    num_layers: int = 8
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 4
    hidden_dim_color: int = 256
    appearance_embedding_dim: int = 32
    num_images: int = 1
    bias: float = 0.8  # sphere radius for geometric init (reference :79-80)
    geometric_init: bool = True
    # False = object-centric outward sphere (DTU/blender protocol); True =
    # inverted init for inward-facing indoor captures (reference default is
    # True for its sdfstudio/ScanNet protocol; our shipped gate protocol is
    # bounded objects, so False ships — flip via config for indoor scenes)
    inside_outside: bool = False
    weight_norm: bool = True
    use_appearance_embedding: bool = False  # reference sdf_field.py:77
    use_average_appearance_embedding: bool = False
    use_numerical_gradients: bool = False
    numerical_gradient_delta: float = 1e-4
    skip_in: tuple = (4,)
    train: bool = True

    def setup(self):
        self.position_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=6, min_freq_exp=0.0, max_freq_exp=5.0, include_input=False
        )
        self.direction_encoding = NeRFEncoding(
            in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0, include_input=True
        )
        if self.use_appearance_embedding:
            self.embedding_appearance = Embedding(self.num_images, self.appearance_embedding_dim)
        self.deviation_network = LearnedVariance()

        in_dim = 3 + self.position_encoding.get_out_dim()
        dims = [in_dim] + [self.hidden_dim] * (self.num_layers - 1) + [1 + self.geo_feat_dim]
        # a skip is representable only when the receiving hidden width
        # exceeds the input dim (tiny test configs shrink hidden below it)
        self._skips = tuple(
            s for s in self.skip_in if 0 < s < len(dims) - 1 and dims[s] - in_dim > 0
        )
        Dense = WNDense if self.weight_norm else (
            lambda features, kernel_init, bias_init: nn.Dense(
                features, kernel_init=kernel_init, bias_init=bias_init
            )
        )
        layers = []
        for i in range(len(dims) - 1):
            out_dim = dims[i + 1] - in_dim if (i + 1) in self._skips else dims[i + 1]
            last = i == len(dims) - 2
            if not self.geometric_init:
                kinit = nn.initializers.lecun_normal()
            elif last:
                kinit = _last_layer_init(-1.0 if self.inside_outside else 1.0)
            elif i == 0:
                kinit = _first_layer_init
            elif i in self._skips:
                kinit = _skip_layer_init(in_dim)
            else:
                kinit = _hidden_layer_init
            if self.geometric_init and last:
                sdf_bias = self.bias if self.inside_outside else -self.bias
                binit = lambda key, shape, dtype=jnp.float32, b=sdf_bias: jnp.full(shape, b, dtype)
            else:
                binit = nn.initializers.zeros
            layers.append(Dense(out_dim, kernel_init=kinit, bias_init=binit))
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
        """positions -> (sdf, geo_features) concatenated (reference :255-292).

        Input layout [xyz, pe] (raw first) — see module docstring."""
        inputs = jnp.concatenate([positions, self.position_encoding(positions)], axis=-1)
        h = inputs
        for i, layer in enumerate(self.glin):
            if i in self._skips:
                h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2.0)
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
