"""MLP field components (reference: nerfstudio/field_components/mlp.py).

TPU-first design notes:
  * compute in bfloat16 (MXU native), params in float32 — replaces the
    reference's tcnn FullyFusedMLP/CutlassMLP (mlp.py:121-140) and AMP.
  * ``MLPWithHashEncoding`` is the tcnn ``NetworkWithInputEncoding``
    equivalent (reference mlp.py:187-296): the XLA path composes
    hash_encode + MLP into one fusion group — see the design note in
    ``MLPWithHashEncoding.__call__`` for why this IS the fused TPU path
    (a Mosaic gather kernel is blocked on current toolchain constraints,
    PERF.md roadmap).
"""

from __future__ import annotations

from typing import Callable, Literal, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerfstudio_tpu.field_components.encodings import HashEncoding


def _activation(name) -> Callable:
    if callable(name):
        return name
    return {
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "softplus": nn.softplus,
        "tanh": nn.tanh,
        "gelu": nn.gelu,
        "none": lambda x: x,
        None: lambda x: x,
    }[name]


class MLP(nn.Module):
    """Multi-layer perceptron with skip connections (reference mlp.py:30-185).

    dtype=bfloat16 keeps matmuls on the MXU fast path; the final output is
    cast back to float32.
    """

    in_dim: int
    num_layers: int
    layer_width: int
    out_dim: Optional[int] = None
    skip_connections: Optional[Tuple[int, ...]] = None
    activation: str = "relu"
    out_activation: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def get_out_dim(self) -> int:
        return self.out_dim if self.out_dim is not None else self.layer_width

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skips = set(self.skip_connections or ())
        assert 0 not in skips, "skip connection at layer 0 is nonsensical"
        act = _activation(self.activation)
        out_act = _activation(self.out_activation)
        in_dtype = x.dtype
        h = x.astype(self.dtype)
        x0 = h
        for i in range(self.num_layers - 1):
            if i in skips:
                h = jnp.concatenate([h, x0], axis=-1)
            h = nn.Dense(
                self.layer_width, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layers_{i}"
            )(h)
            h = act(h)
        h = nn.Dense(
            self.get_out_dim(), dtype=self.dtype, param_dtype=self.param_dtype,
            name=f"layers_{self.num_layers - 1}",
        )(h)
        h = h.astype(jnp.float32 if in_dtype == jnp.float32 else in_dtype)
        return out_act(h)


class MLPWithHashEncoding(nn.Module):
    """Fused hash-encode + MLP — nerfacto/instant-ngp's hot kernel
    (reference mlp.py:187-296)."""

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    num_layers: int = 2
    layer_width: int = 64
    out_dim: Optional[int] = None
    skip_connections: Optional[Tuple[int, ...]] = None
    activation: str = "relu"
    out_activation: Optional[str] = None
    implementation: Literal["xla", "pallas"] = "xla"
    bwd_corner_sample: bool = False
    stochastic_corner: bool = False
    z_pair: bool = False
    block: bool = False
    block_exact: bool = False

    def get_out_dim(self) -> int:
        return self.out_dim if self.out_dim is not None else self.layer_width

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        encoding = HashEncoding(
            num_levels=self.num_levels,
            min_res=self.min_res,
            max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            hash_init_scale=self.hash_init_scale,
            bwd_corner_sample=self.bwd_corner_sample,
            stochastic_corner=self.stochastic_corner,
            z_pair=self.z_pair,
            block=self.block,
            block_exact=self.block_exact,
            name="encoding",
        )
        mlp = MLP(
            in_dim=encoding.get_out_dim(),
            num_layers=self.num_layers,
            layer_width=self.layer_width,
            out_dim=self.out_dim,
            skip_connections=self.skip_connections,
            activation=self.activation,
            out_activation=self.out_activation,
            name="mlp",
        )
        # DESIGN NOTE (tcnn NetworkWithInputEncoding parity): the reference's
        # fused CUDA kernel exists because GPU kernel-launch + global-memory
        # round trips dominate; under XLA the encode->MLP composition is one
        # fusion group already, and the gather itself is the measured wall
        # (PERF.md). A Mosaic-level fused gather+trilerp kernel was explored
        # and is blocked on dynamic_gather layout constraints (PERF.md
        # roadmap, exp/pallas_gather.py) — until then the composed XLA path
        # IS the TPU-native fused implementation.
        return mlp(encoding(x))
