"""Per-param-group optimizers (reference: nerfstudio/engine/optimizers.py:32-211).

The reference keeps a dict of torch optimizers keyed by param group
("fields", "proposal_networks", "camera_opt", ...). TPU-native equivalent:
ONE optax.multi_transform whose labels are derived from the top-level module
names in the flax param tree — the whole update is a single fused XLA
program, and the optimizer state is one pytree (one orbax checkpoint entry).

Gradient clipping (max_norm) composes per group; no grad scaler is needed
(bf16 matmuls accumulate in f32)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import optax

from nerfstudio_tpu.engine.schedulers import SchedulerConfig


@dataclasses.dataclass
class OptimizerConfig:
    """(reference optimizers.py:51-72)"""

    lr: float = 5e-4
    eps: float = 1e-8
    max_norm: Optional[float] = None
    weight_decay: float = 0.0

    def build(self, schedule) -> optax.GradientTransformation:
        raise NotImplementedError


@dataclasses.dataclass
class AdamOptimizerConfig(OptimizerConfig):
    """(reference optimizers.py:75-87)"""

    betas: tuple = (0.9, 0.999)

    def build(self, schedule) -> optax.GradientTransformation:
        chain = []
        if self.max_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_norm))
        chain.append(
            optax.adamw(
                schedule, b1=self.betas[0], b2=self.betas[1], eps=self.eps,
                weight_decay=self.weight_decay,
            )
            if self.weight_decay
            else optax.adam(schedule, b1=self.betas[0], b2=self.betas[1], eps=self.eps)
        )
        return optax.chain(*chain)


@dataclasses.dataclass
class RAdamOptimizerConfig(OptimizerConfig):
    """(reference optimizers.py:90-102)"""

    betas: tuple = (0.9, 0.999)

    def build(self, schedule) -> optax.GradientTransformation:
        chain = []
        if self.max_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_norm))
        chain.append(optax.radam(schedule, b1=self.betas[0], b2=self.betas[1], eps=self.eps))
        return optax.chain(*chain)


def build_optimizers(
    optimizer_configs: Dict[str, Dict[str, Any]],
    params: Any,
    default_group: Optional[str] = None,
) -> optax.GradientTransformation:
    """Build one multi_transform from {group: {"optimizer": cfg, "scheduler": cfg}}.

    Groups match top-level keys of params['params'] by prefix: a flax
    submodule named ``proposal_networks_0`` lands in group
    ``proposal_networks``. Unmatched modules raise (mirroring the reference's
    missing-group error, optimizers.py:107-117) unless default_group is set.
    """
    transforms = {}
    for group, cfgs in optimizer_configs.items():
        opt_cfg: OptimizerConfig = cfgs["optimizer"]
        sched_cfg: Optional[SchedulerConfig] = cfgs.get("scheduler")
        schedule = sched_cfg.build(opt_cfg.lr) if sched_cfg is not None else opt_cfg.lr
        tx = opt_cfg.build(schedule)
        # per-group gradient accumulation (reference engine/trainer.py:87,
        # 494-509 zero_grad_some/step_some): optax.MultiSteps accumulates k
        # microbatch grads and applies the group update every k-th step
        accum = int(cfgs.get("gradient_accumulation_steps", 1) or 1)
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        transforms[group] = tx

    groups = sorted(optimizer_configs.keys(), key=len, reverse=True)

    def label_for(name: str) -> str:
        for g in groups:
            if name == g or name.startswith(g):
                return g
        if default_group is not None:
            return default_group
        raise ValueError(
            f"no optimizer group for param module '{name}'; groups: {list(groups)}"
        )

    top = params["params"] if "params" in params else params
    labels = {"params": {name: label_for(name) for name in top.keys()}}
    if "params" not in params:
        labels = labels["params"]
    return optax.multi_transform(transforms, labels)


def current_learning_rates(
    optimizer_configs: Dict[str, Dict[str, Any]], step: int
) -> Dict[str, float]:
    out = {}
    for group, cfgs in optimizer_configs.items():
        opt_cfg = cfgs["optimizer"]
        sched_cfg = cfgs.get("scheduler")
        if sched_cfg is None:
            out[group] = opt_cfg.lr
        else:
            out[group] = float(sched_cfg.build(opt_cfg.lr)(step))
    return out
