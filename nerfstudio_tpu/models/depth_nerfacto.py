"""Depth-supervised nerfacto (reference: nerfstudio/models/depth_nerfacto.py, 158 LoC).

Adds a DS-NeRF (sigma likelihood) or URF (line-of-sight) loss on the
termination distribution when the batch carries ``depth_image``."""

from __future__ import annotations

import dataclasses
from typing import Dict, Literal, Optional

import jax
import jax.numpy as jnp

from nerfstudio_tpu.model_components.losses import depth_loss as depth_loss_fn
from nerfstudio_tpu.models.nerfacto import NerfactoModel, NerfactoModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class DepthNerfactoModelConfig(NerfactoModelConfig):
    """(reference depth_nerfacto.py:34-52)"""

    depth_loss_mult: float = 1e-3
    is_euclidean_depth: bool = False
    depth_sigma: float = 0.01
    should_decay_sigma: bool = True
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: Literal["ds_nerf", "urf"] = "ds_nerf"

    def __post_init__(self):
        if self._target is None:
            self._target = DepthNerfactoModel
        super().__post_init__()


class DepthNerfactoModel(NerfactoModel):
    """(reference depth_nerfacto.py:55-158)"""

    config: DepthNerfactoModelConfig = None

    def get_outputs(self, ray_bundle, key=None, **kwargs):
        outputs = super().get_outputs(ray_bundle, key=key, **kwargs)
        if ray_bundle.metadata is not None and "directions_norm" in ray_bundle.metadata:
            outputs["directions_norm"] = ray_bundle.metadata["directions_norm"]
        return outputs

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        loss_dict = NerfactoModel.get_loss_dict(
            outputs, batch, metrics_dict, params, config, **kw
        )
        if "depth_image" in batch and "weights_list" in outputs and config is not None:
            sigma = kw.get("depth_sigma", config.depth_sigma)
            termination_depth = batch["depth_image"]
            loss_dict["depth_loss"] = config.depth_loss_mult * depth_loss_fn(
                weights=outputs["weights_list"][-1],
                ray_samples=outputs["ray_samples_list"][-1],
                termination_depth=termination_depth,
                predicted_depth=outputs["expected_depth"],
                sigma=jnp.asarray(sigma),
                directions_norm=outputs.get(
                    "directions_norm", jnp.ones_like(termination_depth)
                ),
                is_euclidean=config.is_euclidean_depth,
                depth_loss_type=config.depth_loss_type,
            )
        return loss_dict

    @staticmethod
    def step_kwargs(step: int, config) -> Dict:
        kwargs = NerfactoModel.step_kwargs(step, config)
        if config.should_decay_sigma:
            sigma = max(
                config.starting_depth_sigma * config.sigma_decay_rate**step,
                config.depth_sigma,
            )
        else:
            sigma = config.depth_sigma
        kwargs["depth_sigma"] = sigma
        return kwargs
