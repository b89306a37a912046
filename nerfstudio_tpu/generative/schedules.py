"""Diffusion noise schedules in pure JAX — the numerical core shared by the
StableDiffusion (latent) and DeepFloyd (pixel) SDS wrappers.

Reference: the schedulers consumed at nerfstudio/generative/
stable_diffusion.py:91-99 (PNDMScheduler alphas_cumprod, add_noise) and
deepfloyd.py; the SDS weighting w(t) = 1 - alpha_bar_t from DreamFusion."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Discrete DDPM schedule. ``scaled_linear`` is Stable Diffusion's
    (sqrt-space linear betas, beta_start 0.00085 beta_end 0.012);
    ``linear`` is DeepFloyd/classic DDPM."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    kind: str = "scaled_linear"  # scaled_linear | linear

    def betas(self) -> jnp.ndarray:
        t = jnp.linspace(0.0, 1.0, self.num_train_timesteps)
        if self.kind == "scaled_linear":
            return (
                jnp.sqrt(self.beta_start)
                + t * (jnp.sqrt(self.beta_end) - jnp.sqrt(self.beta_start))
            ) ** 2
        return self.beta_start + t * (self.beta_end - self.beta_start)

    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.cumprod(1.0 - self.betas())

    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) forward sample: sqrt(a_t) x0 + sqrt(1-a_t) eps."""
        a = self.alphas_cumprod()[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def sds_weight(self, t: jnp.ndarray) -> jnp.ndarray:
        """DreamFusion w(t) = 1 - alpha_bar_t."""
        return 1.0 - self.alphas_cumprod()[t]


def sample_timestep(
    key: jax.Array, schedule: DDPMSchedule, t_min_frac: float = 0.02, t_max_frac: float = 0.98
) -> jnp.ndarray:
    """Uniform SDS timestep in the reference's [0.02, 0.98] band
    (stable_diffusion.py min_step/max_step)."""
    lo = int(schedule.num_train_timesteps * t_min_frac)
    hi = int(schedule.num_train_timesteps * t_max_frac)
    return jax.random.randint(key, (), lo, hi)


def classifier_free_guidance(
    eps_uncond: jnp.ndarray, eps_text: jnp.ndarray, guidance_scale: float
) -> jnp.ndarray:
    """eps = eps_uncond + s (eps_text - eps_uncond)
    (stable_diffusion.py:200-207)."""
    return eps_uncond + guidance_scale * (eps_text - eps_uncond)


def sds_gradient(
    schedule: DDPMSchedule,
    eps_pred: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """d(SDS)/d(x) = w(t) (eps_pred - eps): the score-distillation gradient
    w.r.t. whatever space eps lives in (latents for SD, pixels for IF)."""
    return schedule.sds_weight(t) * (eps_pred - noise)
