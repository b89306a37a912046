"""Temporal distortions for dynamic scenes (reference:
nerfstudio/field_components/temporal_distortions.py — DNeRFDistortion).

A time-conditioned offset MLP: positions + encoded(time) -> delta_x. Used by
the dnerf method."""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerfstudio_tpu.field_components.encodings import NeRFEncoding
from nerfstudio_tpu.field_components.mlp import MLP


class DNeRFDistortion(nn.Module):
    """Deformation network from D-NeRF (reference temporal_distortions.py:56-92)."""

    position_encoding: NeRFEncoding = None  # type: ignore[assignment]
    temporal_encoding: NeRFEncoding = None  # type: ignore[assignment]
    mlp_num_layers: int = 4
    mlp_layer_width: int = 256
    skip_connections: Tuple[int, ...] = (4,)

    @nn.compact
    def __call__(self, positions: jnp.ndarray, times: Optional[jnp.ndarray]) -> jnp.ndarray:
        if times is None:
            return positions
        pos_enc = self.position_encoding or NeRFEncoding(
            in_dim=3, num_frequencies=10, min_freq_exp=0.0, max_freq_exp=8.0, include_input=True
        )
        time_enc = self.temporal_encoding or NeRFEncoding(
            in_dim=1, num_frequencies=10, min_freq_exp=0.0, max_freq_exp=8.0, include_input=True
        )
        p = pos_enc(positions)
        t = time_enc(times)
        feat = jnp.concatenate([p, t], axis=-1)
        offsets = MLP(
            in_dim=feat.shape[-1],
            num_layers=self.mlp_num_layers,
            layer_width=self.mlp_layer_width,
            skip_connections=self.skip_connections,
            out_dim=3,
        )(feat)
        return positions + offsets
