"""Typed field output heads (reference: nerfstudio/field_components/field_heads.py:29-205)."""

from __future__ import annotations

import enum
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class FieldHeadNames(enum.Enum):
    """Possible field outputs (reference field_heads.py:29-43)."""

    RGB = "rgb"
    SH = "sh"
    DENSITY = "density"
    NORMALS = "normals"
    PRED_NORMALS = "pred_normals"
    UNCERTAINTY = "uncertainty"
    TRANSIENT_RGB = "transient_rgb"
    TRANSIENT_DENSITY = "transient_density"
    SEMANTICS = "semantics"
    SDF = "sdf"
    ALPHA = "alpha"
    GRADIENT = "gradient"


class FieldHead(nn.Module):
    """Linear head + activation (reference field_heads.py:46-102)."""

    out_dim: int
    field_head_name: FieldHeadNames = FieldHeadNames.RGB
    activation: Optional[Callable] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        out = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32)(
            in_tensor.astype(self.dtype)
        ).astype(jnp.float32)
        if self.activation is not None:
            out = self.activation(out)
        return out


class DensityFieldHead(FieldHead):
    out_dim: int = 1
    field_head_name: FieldHeadNames = FieldHeadNames.DENSITY
    activation: Optional[Callable] = nn.softplus


class RGBFieldHead(FieldHead):
    out_dim: int = 3
    field_head_name: FieldHeadNames = FieldHeadNames.RGB
    activation: Optional[Callable] = nn.sigmoid


class SHFieldHead(FieldHead):
    """SH coefficient head (reference field_heads.py:119-136)."""

    coeffs: int = 16  # (levels)^2
    channels: int = 3
    out_dim: int = 48
    field_head_name: FieldHeadNames = FieldHeadNames.SH
    activation: Optional[Callable] = None


class UncertaintyFieldHead(FieldHead):
    out_dim: int = 1
    field_head_name: FieldHeadNames = FieldHeadNames.UNCERTAINTY
    activation: Optional[Callable] = nn.softplus


class TransientRGBFieldHead(FieldHead):
    out_dim: int = 3
    field_head_name: FieldHeadNames = FieldHeadNames.TRANSIENT_RGB
    activation: Optional[Callable] = nn.sigmoid


class TransientDensityFieldHead(FieldHead):
    out_dim: int = 1
    field_head_name: FieldHeadNames = FieldHeadNames.TRANSIENT_DENSITY
    activation: Optional[Callable] = nn.softplus


class SemanticFieldHead(FieldHead):
    """Semantic logits head (no activation) (reference field_heads.py:184-196)."""

    out_dim: int = 1  # num_classes; set explicitly
    field_head_name: FieldHeadNames = FieldHeadNames.SEMANTICS
    activation: Optional[Callable] = None


def _tanh_normalize(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.tanh(x)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


class PredNormalsFieldHead(FieldHead):
    """Predicted normals: tanh then normalize (reference field_heads.py:199-205)."""

    out_dim: int = 3
    field_head_name: FieldHeadNames = FieldHeadNames.PRED_NORMALS
    activation: Optional[Callable] = _tanh_normalize
