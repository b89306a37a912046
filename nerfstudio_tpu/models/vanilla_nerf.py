"""Vanilla NeRF model — coarse/fine hierarchy (reference:
nerfstudio/models/vanilla_nerf.py, 264 LoC).

UniformSampler(64) -> coarse NeRFField -> PDFSampler(128) -> fine NeRFField.
Optional D-NeRF temporal distortion (the ``dnerf`` method)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Type

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.field_components.temporal_distortions import DNeRFDistortion
from nerfstudio_tpu.fields.vanilla_nerf_field import NeRFField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import mse_loss
from nerfstudio_tpu.model_components.ray_samplers import PDFSampler, UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import AABBBoxCollider, NearFarCollider
from nerfstudio_tpu.models.base_model import Model, ModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class VanillaModelConfig(ModelConfig):
    """(reference vanilla_nerf.py:57-80)"""

    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    background_color: str = "white"
    enable_temporal_distortion: bool = False

    def __post_init__(self):
        if self._target is None:
            self._target = NeRFModel


class NeRFModel(Model):
    """(reference vanilla_nerf.py:83-264)"""

    config: VanillaModelConfig = None

    def setup(self):
        self.field_coarse = NeRFField()
        self.field_fine = NeRFField()
        if self.config.enable_temporal_distortion:
            self.temporal_distortion = DNeRFDistortion()

    def get_outputs(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        cfg = self.config
        if cfg.enable_collider and cfg.collider_params is not None:
            ray_bundle = NearFarCollider(
                near_plane=cfg.collider_params["near_plane"],
                far_plane=cfg.collider_params["far_plane"],
            )(ray_bundle, training=self.train)

        k_bg = k1 = k2 = None
        if key is not None:
            k1, k2, k_bg = jax.random.split(key, 3)

        sampler_uniform = UniformSampler(cfg.num_coarse_samples)
        sampler_pdf = PDFSampler(cfg.num_importance_samples, include_original=True)

        # coarse
        ray_samples_uniform = sampler_uniform(ray_bundle, key=k1)
        if cfg.enable_temporal_distortion and ray_samples_uniform.times is not None:
            pos = self.temporal_distortion(
                ray_samples_uniform.frustums.get_positions(), ray_samples_uniform.times
            )
            ray_samples_uniform = ray_samples_uniform.replace(
                frustums=ray_samples_uniform.frustums.replace(offsets=pos - ray_samples_uniform.frustums.get_positions())
            )
        field_out_coarse = self.field_coarse(ray_samples_uniform)
        weights_coarse = ray_samples_uniform.get_weights(field_out_coarse[FieldHeadNames.DENSITY])
        rgb_coarse = renderers.render_rgb(
            field_out_coarse[FieldHeadNames.RGB], weights_coarse,
            background_color=cfg.background_color, key=k_bg,
        )
        acc_coarse = renderers.render_accumulation(weights_coarse)
        depth_coarse = renderers.render_depth(weights_coarse, ray_samples_uniform)

        # fine
        ray_samples_pdf = sampler_pdf(ray_bundle, ray_samples_uniform, weights_coarse, key=k2)
        if cfg.enable_temporal_distortion and ray_samples_pdf.times is not None:
            pos = self.temporal_distortion(
                ray_samples_pdf.frustums.get_positions(), ray_samples_pdf.times
            )
            ray_samples_pdf = ray_samples_pdf.replace(
                frustums=ray_samples_pdf.frustums.replace(offsets=pos - ray_samples_pdf.frustums.get_positions())
            )
        field_out_fine = self.field_fine(ray_samples_pdf)
        weights_fine = ray_samples_pdf.get_weights(field_out_fine[FieldHeadNames.DENSITY])
        rgb_fine = renderers.render_rgb(
            field_out_fine[FieldHeadNames.RGB], weights_fine,
            background_color=cfg.background_color, key=k_bg,
        )
        acc_fine = renderers.render_accumulation(weights_fine)
        depth_fine = renderers.render_depth(weights_fine, ray_samples_pdf)

        return {
            "rgb_coarse": rgb_coarse,
            "rgb_fine": rgb_fine,
            "rgb": rgb_fine,
            "accumulation_coarse": acc_coarse,
            "accumulation_fine": acc_fine,
            "accumulation": acc_fine,
            "depth_coarse": depth_coarse,
            "depth_fine": depth_fine,
            "depth": depth_fine,
        }

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None):
        pred_c, gt_c = renderers.blend_background_for_loss_computation(
            outputs["rgb_coarse"], outputs["accumulation_coarse"], batch["image"],
            background_color="white",
        )
        pred_f, gt_f = renderers.blend_background_for_loss_computation(
            outputs["rgb_fine"], outputs["accumulation_fine"], batch["image"],
            background_color="white",
        )
        return {
            "psnr_coarse": psnr(pred_c, gt_c),
            "psnr": psnr(pred_f, gt_f),
        }

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, **kw):
        pred_c, gt_c = renderers.blend_background_for_loss_computation(
            outputs["rgb_coarse"], outputs["accumulation_coarse"], batch["image"],
            background_color="white",
        )
        pred_f, gt_f = renderers.blend_background_for_loss_computation(
            outputs["rgb_fine"], outputs["accumulation_fine"], batch["image"],
            background_color="white",
        )
        return {
            "rgb_loss_coarse": mse_loss(pred_c, gt_c),
            "rgb_loss_fine": mse_loss(pred_f, gt_f),
        }
