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
                """SDS image-space gradient (DreamFusion eq. 2, as the
                reference's stable_diffusion.sds_loss): w(t)(eps_pred - eps)
                in latent space, back-propagated through the VAE encoder to
                pixels via a VJP."""
                import torch

                img = torch.from_numpy(np.asarray(rgb)).permute(2, 0, 1)[None] * 2 - 1
                img = img.float().requires_grad_(True)
                t = int(jax.random.randint(key, (), 20, 980))
                noise = torch.randn(1, 4, img.shape[-2] // 8, img.shape[-1] // 8)

                latents = self.pipe.vae.encode(img).latent_dist.mean * 0.18215
                with torch.no_grad():
                    noisy = self.pipe.scheduler.add_noise(
                        latents.detach(), noise, torch.tensor([t])
                    )
                    emb = torch.from_numpy(np.asarray(text_embedding))[None]
                    eps = self.pipe.unet(noisy, t, encoder_hidden_states=emb).sample
                # w(t) = 1 - alpha_bar_t (reference uses the same weighting)
                alpha_bar = self.pipe.scheduler.alphas_cumprod[t]
                grad_lat = (1.0 - alpha_bar) * (eps - noise) * guidance_scale / 100.0
                # chain rule to pixels: d(latents)/d(img)^T @ grad_lat
                latents.backward(gradient=grad_lat)
                g = img.grad[0].permute(1, 2, 0).numpy() * 2.0  # d(img_pm1)/d(rgb01)
                return jnp.asarray(g.astype(np.float32))

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
