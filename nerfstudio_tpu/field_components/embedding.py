"""Per-index latent embeddings (reference: nerfstudio/field_components/embedding.py).

Appearance / transient per-image codes. ``mean()`` supports the reference's
use-average-at-eval behaviour (nerfacto_field.py:249-261)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Embedding(nn.Module):
    in_dim: int  # number of embeddings
    out_dim: int  # embedding size

    def setup(self):
        self.embedding = nn.Embed(self.in_dim, self.out_dim, param_dtype=jnp.float32)

    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        return self.embedding(in_tensor)

    def mean(self) -> jnp.ndarray:
        """Average embedding (eval-time appearance code)."""
        return self.embedding.embedding.mean(axis=0)
