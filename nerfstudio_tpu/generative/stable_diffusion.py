"""Stable Diffusion SDS wrapper (reference:
nerfstudio/generative/stable_diffusion.py, 330 LoC).

The SDS math (noise schedule, timestep band, classifier-free guidance,
w(t)(eps_pred - eps)) runs in pure JAX (generative/schedules.py). The UNet/
VAE/text-encoder load from a local HuggingFace cache when present; with no
weights on disk (zero-egress build hosts) ``available()`` is False and
callers fall back to the stub guidance in generative/sds.py."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.generative.schedules import (
    DDPMSchedule,
    classifier_free_guidance,
    sample_timestep,
    sds_gradient,
)

IMG_DIM = 512
LATENT_DIM = IMG_DIM // 8
CONST_SCALE = 0.18215  # SD VAE latent scale (reference stable_diffusion.py:53)
SD_IDENTIFIERS = {
    "1-5": "runwayml/stable-diffusion-v1-5",
    "2-0": "stabilityai/stable-diffusion-2-base",
    "2-1": "stabilityai/stable-diffusion-2-1-base",
}


def available() -> bool:
    try:  # pragma: no cover - requires diffusers + local weights
        import diffusers  # noqa: F401
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


class StableDiffusion:
    """Latent-space SDS guidance (reference stable_diffusion.py:60-330)."""

    def __init__(self, version: str = "1-5", guidance_scale: float = 100.0):
        if not available():  # pragma: no cover
            raise RuntimeError(
                "diffusers/torch weights unavailable; use generative.sds.load_guidance()"
            )
        import torch
        from diffusers import StableDiffusionPipeline

        self.torch = torch
        self.pipe = StableDiffusionPipeline.from_pretrained(
            SD_IDENTIFIERS[version], local_files_only=True
        )
        self.guidance_scale = guidance_scale
        self.schedule = DDPMSchedule(kind="scaled_linear")

    # -- text ---------------------------------------------------------------
    def get_text_embeds(self, prompt: str, negative_prompt: str = "") -> np.ndarray:
        """-> (2, 77, D): [uncond, text] stacked for classifier-free guidance
        (reference stable_diffusion.py:115-143)."""
        torch = self.torch
        embeds = []
        for p in (negative_prompt, prompt):
            tok = self.pipe.tokenizer(
                p, padding="max_length",
                max_length=self.pipe.tokenizer.model_max_length,
                return_tensors="pt", truncation=True,
            )
            with torch.no_grad():
                embeds.append(self.pipe.text_encoder(tok.input_ids)[0])
        return torch.cat(embeds).numpy()

    # -- latents ------------------------------------------------------------
    def imgs_to_latent(self, rgb01: np.ndarray):
        """(H, W, 3) [0,1] -> torch latents with grad to pixels."""
        torch = self.torch
        img = torch.from_numpy(np.asarray(rgb01)).permute(2, 0, 1)[None].float() * 2 - 1
        img.requires_grad_(True)
        latents = self.pipe.vae.encode(img).latent_dist.mean * CONST_SCALE
        return img, latents

    # -- SDS ----------------------------------------------------------------
    def sds_grad(
        self,
        key: jax.Array,
        rgb: jnp.ndarray,
        text_embedding,
        guidance_scale: Optional[float] = None,
    ) -> jnp.ndarray:
        """d(SDS)/d(rgb) for an (H, W, 3) render: latent-space score
        w(t)(eps_pred - eps) chained through the VAE encoder by a VJP
        (reference sds_loss stable_diffusion.py:145-208)."""
        torch = self.torch
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        t = int(sample_timestep(key, self.schedule))

        img, latents = self.imgs_to_latent(np.asarray(rgb))
        noise_np = np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1), latents.shape, jnp.float32)
        )
        noise = torch.from_numpy(noise_np)
        noisy = self.schedule.add_noise(
            jnp.asarray(latents.detach().numpy()), jnp.asarray(noise_np), jnp.asarray(t)
        )
        noisy_t = torch.from_numpy(np.asarray(noisy)).float()
        emb = torch.from_numpy(np.asarray(text_embedding)).float()
        with torch.no_grad():
            eps = self.pipe.unet(
                torch.cat([noisy_t, noisy_t]), t, encoder_hidden_states=emb
            ).sample
        eps_uncond, eps_text = eps.chunk(2)
        eps_cfg = classifier_free_guidance(
            jnp.asarray(eps_uncond.numpy()), jnp.asarray(eps_text.numpy()), gs
        )
        grad_lat = sds_gradient(self.schedule, eps_cfg, jnp.asarray(noise_np), jnp.asarray(t))
        # chain to pixels: latents.backward(grad) computes (dlat/dimg)^T grad
        latents.backward(gradient=torch.from_numpy(np.asarray(grad_lat)).float())
        g = img.grad[0].permute(1, 2, 0).numpy() * 2.0  # d(img_pm1)/d(rgb01)
        return jnp.asarray(g.astype(np.float32))
