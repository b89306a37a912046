"""Score-distillation guidance facade for text-to-3D.

Backends: generative/stable_diffusion.py (latent SDS), generative/deepfloyd.py
(pixel SDS) — both gated on local HF weights; the pure-jax noise/guidance math
lives in generative/schedules.py and the view-dependent prompting in
generative/positional_text_embeddings.py (mirroring the reference's module
split). Zero-egress environments fall back to a gaussian-score stub so the
generfacto pipeline stays runnable/testable end-to-end."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionGuidance:
    """SDS guidance interface (reference stable_diffusion.py:60-330)."""

    def text_embedding(self, prompt: str, negative_prompt: str = ""):
        raise NotImplementedError

    def sds_grad(
        self, key: jax.Array, rgb: jnp.ndarray, text_embedding, guidance_scale: float = 100.0
    ) -> jnp.ndarray:
        """d(SDS loss)/d(rgb image) for an (H, W, 3) render."""
        raise NotImplementedError


class StubGuidance(DiffusionGuidance):
    """Weights-free fallback: pulls renders toward a prompt-seeded color
    statistic. Keeps the SDS plumbing testable without model downloads."""

    def text_embedding(self, prompt: str, negative_prompt: str = ""):
        seed = abs(hash(prompt)) % (2**31)
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.uniform(0.2, 0.8, (3,)).astype(np.float32))

    def sds_grad(self, key, rgb, text_embedding, guidance_scale: float = 100.0):
        noise = jax.random.normal(key, rgb.shape) * 0.1
        return (rgb - text_embedding + noise) / rgb.size


def load_guidance(backend: str = "stable-diffusion") -> DiffusionGuidance:
    """Pick the best available backend (reference generfacto's
    diffusion_model switch); stub when no local weights exist."""
    try:  # pragma: no cover - requires diffusers + local HF cache
        if backend == "deepfloyd":
            from nerfstudio_tpu.generative.deepfloyd import DeepFloyd

            return DeepFloyd()
        from nerfstudio_tpu.generative.stable_diffusion import StableDiffusion

        return StableDiffusion()
    except Exception:
        import sys

        print(
            "[generfacto] WARNING: no diffusion weights found (diffusers/HF cache "
            "unavailable) — falling back to STUB guidance. The run will only pull "
            "renders toward a prompt-seeded color; it will NOT produce a real "
            "text-to-3D object. Install diffusers + download StableDiffusion or "
            "DeepFloyd weights for real SDS guidance.",
            file=sys.stderr,
            flush=True,
        )
        return StubGuidance()


# re-exported for API parity with the reference module layout
from nerfstudio_tpu.generative.positional_text_embeddings import (  # noqa: E402
    PositionalTextEmbeddings,
)

__all__ = [
    "DiffusionGuidance",
    "StubGuidance",
    "load_guidance",
    "PositionalTextEmbeddings",
]
