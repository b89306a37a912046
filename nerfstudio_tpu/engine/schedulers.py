"""LR schedulers as optax schedules (reference: nerfstudio/engine/schedulers.py:63-174)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class SchedulerConfig:
    def build(self, lr_init: float) -> optax.Schedule:
        raise NotImplementedError


@dataclasses.dataclass
class MultiStepSchedulerConfig(SchedulerConfig):
    """Decay by gamma at each milestone (reference schedulers.py:63-87)."""

    max_steps: int = 1000000
    gamma: float = 0.33
    milestones: Tuple[int, ...] = (500000, 750000, 900000)

    def build(self, lr_init: float) -> optax.Schedule:
        return optax.piecewise_constant_schedule(
            init_value=lr_init,
            boundaries_and_scales={m: self.gamma for m in self.milestones},
        )


@dataclasses.dataclass
class ExponentialDecaySchedulerConfig(SchedulerConfig):
    """Warmup ramp then log-space exponential decay (reference schedulers.py:109-141)."""

    lr_pre_warmup: float = 1e-8
    lr_final: Optional[float] = None
    warmup_steps: int = 0
    max_steps: int = 100000
    ramp: str = "cosine"

    def build(self, lr_init: float) -> optax.Schedule:
        lr_final = self.lr_final if self.lr_final is not None else lr_init
        pre, warm, mx = self.lr_pre_warmup, self.warmup_steps, self.max_steps

        def schedule(step):
            step = jnp.asarray(step, dtype=jnp.float32)
            if self.ramp == "cosine":
                warm_lr = pre + (lr_init - pre) * jnp.sin(
                    0.5 * jnp.pi * jnp.clip(step / jnp.maximum(warm, 1), 0, 1)
                )
            else:
                warm_lr = pre + (lr_init - pre) * jnp.clip(step / jnp.maximum(warm, 1), 0, 1)
            t = jnp.clip((step - warm) / jnp.maximum(mx - warm, 1), 0, 1)
            decay_lr = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
            return jnp.where(step < warm, warm_lr, decay_lr)

        return schedule


@dataclasses.dataclass
class CosineDecaySchedulerConfig(SchedulerConfig):
    """Warmup then cosine to zero (reference schedulers.py:144-174)."""

    warm_up_end: int = 5000
    learning_rate_alpha: float = 0.05
    max_steps: int = 300000

    def build(self, lr_init: float) -> optax.Schedule:
        alpha, warm, mx = self.learning_rate_alpha, self.warm_up_end, self.max_steps

        def schedule(step):
            step = jnp.asarray(step, dtype=jnp.float32)
            warm_f = jnp.clip(step / jnp.maximum(warm, 1), 0, 1)
            progress = jnp.clip((step - warm) / jnp.maximum(mx - warm, 1), 0, 1)
            cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5
            factor = jnp.where(step < warm, warm_f, (1 - alpha) * cos + alpha)
            return lr_init * factor

        return schedule
