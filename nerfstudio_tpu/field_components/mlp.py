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
import numpy as np

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
    def __call__(self, x: jnp.ndarray, first_layer_apply=None) -> jnp.ndarray:
        """``first_layer_apply``: optional callable receiving the layer-0
        Dense module and returning the layer-0 pre-activation directly (used
        by the fused hash+MLP path to fold the first matmul into the hash
        gather); ``x`` then only supplies the output dtype."""
        skips = set(self.skip_connections or ())
        assert 0 not in skips, "skip connection at layer 0 is nonsensical"
        assert first_layer_apply is None or not skips, "fused first layer incompatible with skips"
        act = _activation(self.activation)
        out_act = _activation(self.out_activation)
        in_dtype = x.dtype
        h = x.astype(self.dtype)
        x0 = h
        for i in range(self.num_layers - 1):
            dense = nn.Dense(
                self.layer_width, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layers_{i}"
            )
            if i == 0 and first_layer_apply is not None:
                h = first_layer_apply(dense).astype(self.dtype)
            else:
                if i in skips:
                    h = jnp.concatenate([h, x0], axis=-1)
                h = dense(h)
            h = act(h)
        dense = nn.Dense(
            self.get_out_dim(), dtype=self.dtype, param_dtype=self.param_dtype,
            name=f"layers_{self.num_layers - 1}",
        )
        if self.num_layers == 1 and first_layer_apply is not None:
            h = first_layer_apply(dense)
        else:
            h = dense(h)
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
    # Fold the first MLP matmul into the per-level block gather
    # (ops/hash_grid._row_gather_block_mm). Verified numerically equal to the
    # composed path (tests/field_components/test_fused_hash_mlp.py) but
    # measured SLOWER end-to-end on v5e (108k vs 120k rays/s): the fused
    # backward adds per-level (M,128)@(128,H) + (128,M)@(M,H) matmuls that
    # cost more than the (M, L*F) activation round-trip they save. Kept
    # opt-in for future toolchains / wider MLPs where the tradeoff flips.
    fused_first_layer: bool = False

    def get_out_dim(self) -> int:
        return self.out_dim if self.out_dim is not None else self.layer_width

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, bwd_levels=None, bwd_scale: float = 1.0
    ) -> jnp.ndarray:
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
        # FUSED PATH (tcnn NetworkWithInputEncoding parity, the TPU way):
        # for the block-packed train layout, the first MLP matmul is folded
        # INTO the per-level gather op (ops/hash_grid._row_gather_block_mm),
        # so the (M, L*F) feature array — whose transposed small-minor-dim
        # layout forced XLA into ~50 GB/s strided passes — never
        # materializes. The layer-0 Dense still owns its parameters; it is
        # applied to the per-level lane-embedding basis to produce the
        # (128, H) folded weights (gradients flow to W1/b1 through that
        # application).
        if self.fused_first_layer and self.block and not self.block_exact:
            assert bwd_levels is None, (
                "level-subsampled backward is unsupported on the fused "
                "first-layer path (opt-in; disable one of the two)"
            )
            from nerfstudio_tpu.ops.hash_grid import (
                _proj_level_np,
                _row_gather_block_mm,
                block_level_geometry,
            )

            batch_shape = x.shape[:-1]
            pos = x.reshape(-1, 3)
            geom = block_level_geometry(
                pos,
                num_levels=self.num_levels,
                min_res=self.min_res,
                max_res=self.max_res,
                hash_table_size=encoding.hash_table_size,
                features_per_level=self.features_per_level,
            )
            table = encoding.hash_table
            F = self.features_per_level
            L = self.num_levels

            def first_layer_apply(dense):
                zero = jnp.zeros((1, L * F), jnp.float32)
                b = dense(zero)  # (1, H) = bias only
                # per-level folded weights A_l = P_l @ W1 (+0 bias)
                P_all = jnp.asarray(
                    np.concatenate([_proj_level_np(F, L, l) for l in range(L)], axis=0)
                )  # (L*128, L*F)
                A_all = dense(P_all) - b  # (L*128, H)
                h1 = None
                for l, (rows, slot, w8) in enumerate(geom):
                    part = _row_gather_block_mm(
                        table[l], rows, slot, w8, A_all[l * 128 : (l + 1) * 128], F
                    )
                    h1 = part if h1 is None else h1 + part
                h1 = h1 + b.astype(h1.dtype)
                return h1.reshape(batch_shape + (h1.shape[-1],))

            return mlp(x, first_layer_apply=first_layer_apply)
        return mlp(encoding(x, bwd_levels=bwd_levels, bwd_scale=bwd_scale))
