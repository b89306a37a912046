"""Mip-NeRF model (reference: nerfstudio/models/mipnerf.py:38-213).

Integrated positional encoding over conical-frustum gaussians; ONE shared
field evaluated coarse and fine."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.fields.vanilla_nerf_field import NeRFField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import mse_loss
from nerfstudio_tpu.model_components.ray_samplers import PDFSampler, UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import NearFarCollider
from nerfstudio_tpu.models.base_model import Model, ModelConfig
from nerfstudio_tpu.models.vanilla_nerf import VanillaModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class MipNerfModelConfig(VanillaModelConfig):
    def __post_init__(self):
        self._target = MipNerfModel


class MipNerfModel(Model):
    """(reference mipnerf.py:38-213)"""

    config: VanillaModelConfig = None

    def setup(self):
        self.field = NeRFField(
            position_encoding_num_frequencies=16,
            direction_encoding_num_frequencies=4,
            use_integrated_encoding=True,
        )

    def get_outputs(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        cfg = self.config
        if cfg.enable_collider and cfg.collider_params is not None:
            ray_bundle = NearFarCollider(
                near_plane=cfg.collider_params["near_plane"],
                far_plane=cfg.collider_params["far_plane"],
            )(ray_bundle, training=self.train)
        k1 = k2 = k_bg = None
        if key is not None:
            k1, k2, k_bg = jax.random.split(key, 3)

        uniform = UniformSampler(cfg.num_coarse_samples)
        pdf = PDFSampler(cfg.num_importance_samples, include_original=False)

        rs_coarse = uniform(ray_bundle, key=k1)
        out_coarse = self.field(rs_coarse)
        w_coarse = rs_coarse.get_weights(out_coarse[FieldHeadNames.DENSITY])
        rgb_coarse = renderers.render_rgb(
            out_coarse[FieldHeadNames.RGB], w_coarse,
            background_color=cfg.background_color, key=k_bg,
        )
        acc_coarse = renderers.render_accumulation(w_coarse)
        depth_coarse = renderers.render_depth(w_coarse, rs_coarse)

        rs_fine = pdf(ray_bundle, rs_coarse, w_coarse, key=k2)
        out_fine = self.field(rs_fine)
        w_fine = rs_fine.get_weights(out_fine[FieldHeadNames.DENSITY])
        rgb_fine = renderers.render_rgb(
            out_fine[FieldHeadNames.RGB], w_fine,
            background_color=cfg.background_color, key=k_bg,
        )
        acc_fine = renderers.render_accumulation(w_fine)
        depth_fine = renderers.render_depth(w_fine, rs_fine)

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

    get_metrics_dict = staticmethod(
        __import__(
            "nerfstudio_tpu.models.vanilla_nerf", fromlist=["NeRFModel"]
        ).NeRFModel.get_metrics_dict
    )
    get_loss_dict = staticmethod(
        __import__(
            "nerfstudio_tpu.models.vanilla_nerf", fromlist=["NeRFModel"]
        ).NeRFModel.get_loss_dict
    )
