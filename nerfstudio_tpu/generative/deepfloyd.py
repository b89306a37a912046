"""DeepFloyd IF SDS wrapper (reference: nerfstudio/generative/deepfloyd.py,
248 LoC). Pixel-space diffusion (no VAE): the SDS gradient applies directly
to the rendered 64x64 image; T5 text embeddings."""

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

IMG_DIM = 64


def available() -> bool:
    try:  # pragma: no cover
        import diffusers  # noqa: F401
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


class DeepFloyd:
    """(reference deepfloyd.py:40-248)"""

    def __init__(self, guidance_scale: float = 100.0):
        if not available():  # pragma: no cover
            raise RuntimeError(
                "diffusers/torch weights unavailable; use generative.sds.load_guidance()"
            )
        import torch
        from diffusers import DiffusionPipeline

        self.torch = torch
        self.pipe = DiffusionPipeline.from_pretrained(
            "DeepFloyd/IF-I-XL-v1.0", local_files_only=True
        )
        self.guidance_scale = guidance_scale
        self.schedule = DDPMSchedule(kind="linear", beta_start=0.0001, beta_end=0.02)

    def get_text_embeds(self, prompt: str, negative_prompt: str = "") -> np.ndarray:
        emb, neg = self.pipe.encode_prompt(prompt, negative_prompt=negative_prompt)
        return self.torch.cat([neg, emb]).numpy()

    def delete_text_encoder(self) -> None:
        """Free the T5 after caching embeddings (reference deepfloyd.py:90)."""
        self.pipe.text_encoder = None

    def sds_grad(
        self,
        key: jax.Array,
        rgb: jnp.ndarray,
        text_embedding,
        guidance_scale: Optional[float] = None,
    ) -> jnp.ndarray:
        """Pixel-space SDS: w(t)(eps_pred - eps) directly on the image
        (reference deepfloyd.py sds_loss)."""
        torch = self.torch
        gs = self.guidance_scale if guidance_scale is None else guidance_scale
        t = int(sample_timestep(key, self.schedule))
        img01 = jnp.asarray(rgb)
        img = img01 * 2.0 - 1.0  # (H, W, 3) in [-1, 1]
        noise = jax.random.normal(jax.random.fold_in(key, 1), img.shape, jnp.float32)
        noisy = self.schedule.add_noise(img, noise, jnp.asarray(t))

        x = torch.from_numpy(np.asarray(noisy)).permute(2, 0, 1)[None].float()
        emb = torch.from_numpy(np.asarray(text_embedding)).float()
        with torch.no_grad():
            eps = self.pipe.unet(
                torch.cat([x, x]), t, encoder_hidden_states=emb
            ).sample[:, :3]
        eps_uncond, eps_text = eps.chunk(2)
        eps_cfg = classifier_free_guidance(
            jnp.asarray(eps_uncond[0].permute(1, 2, 0).numpy()),
            jnp.asarray(eps_text[0].permute(1, 2, 0).numpy()),
            gs,
        )
        grad = sds_gradient(self.schedule, eps_cfg, noise, jnp.asarray(t))
        return grad * 2.0  # d(img_pm1)/d(rgb01)
