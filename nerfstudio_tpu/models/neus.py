"""NeuS surface models (reference: nerfstudio/models/base_surface_model.py:47-405,
neus.py, neus_facto.py).

``NeuSModel``: SDFField + NeuS alpha compositing via the iterative
NeuSSampler; eikonal loss on SDF gradients; cos-anneal schedule as a
step kwarg. ``NeuSFactoModel``: proposal-sampler variant (neus-facto)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle, RaySamples
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.fields.density_fields import HashMLPDensityField
from nerfstudio_tpu.fields.sdf_field import SDFField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import mse_loss
from nerfstudio_tpu.model_components.ray_samplers import (
    NeuSSampler,
    ProposalNetworkSampler,
    UniformSampler,
)
from nerfstudio_tpu.model_components.scene_colliders import NearFarCollider, SphereCollider
from nerfstudio_tpu.models.base_model import Model, ModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class NeuSModelConfig(ModelConfig):
    """(reference base_surface_model.py:47-101 + neus.py:35-50)"""

    num_samples: int = 64
    num_samples_importance: int = 64
    num_upsample_steps: int = 4
    near_plane: float = 0.05
    far_plane: float = 4.0
    background_color: str = "black"
    eikonal_loss_mult: float = 0.1
    cos_anneal_end: int = 20000
    use_sphere_collider: bool = True
    # SDF field hyperparameters, forwarded to SDFField (reference nests an
    # SDFFieldConfig at base_surface_model.py:69; flattened here)
    num_layers: int = 8
    hidden_dim: int = 256
    geo_feat_dim: int = 256
    num_layers_color: int = 4
    hidden_dim_color: int = 256
    sdf_bias: float = 0.8
    inside_outside: bool = False
    sdf_weight_norm: bool = True
    use_appearance_embedding: bool = False

    def __post_init__(self):
        if self._target is None:
            self._target = NeuSModel


class NeuSModel(Model):
    """(reference neus.py:53-115)"""

    config: NeuSModelConfig = None

    def setup(self):
        cfg = self.config
        self.field = SDFField(
            num_images=self.num_train_data,
            train=self.train,
            num_layers=cfg.num_layers,
            hidden_dim=cfg.hidden_dim,
            geo_feat_dim=cfg.geo_feat_dim,
            num_layers_color=cfg.num_layers_color,
            hidden_dim_color=cfg.hidden_dim_color,
            bias=cfg.sdf_bias,
            inside_outside=cfg.inside_outside,
            weight_norm=cfg.sdf_weight_norm,
            use_appearance_embedding=cfg.use_appearance_embedding,
        )

    def sample_and_render(
        self, ray_bundle: RayBundle, ray_samples: RaySamples, cos_anneal: float, k_bg
    ):
        field_outputs = self.field(ray_samples, cos_anneal_ratio=cos_anneal)
        alphas = field_outputs[FieldHeadNames.ALPHA]
        weights, transmittance = RaySamples.get_weights_and_transmittance_from_alphas(alphas)
        rgb, background = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB], weights,
            background_color=self.config.background_color, key=k_bg,
            return_background=True,
        )
        depth = renderers.render_depth(weights, ray_samples, method="expected")
        accumulation = renderers.render_accumulation(weights)
        normals = renderers.render_normals(field_outputs[FieldHeadNames.NORMALS], weights)
        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": depth,
            "normals": normals,
        }
        if self.train:
            outputs["eikonal_gradients"] = field_outputs[FieldHeadNames.GRADIENT]
            outputs["weights"] = weights
            outputs["background"] = background
        return outputs

    def get_outputs(
        self,
        ray_bundle: RayBundle,
        key: Optional[jax.Array] = None,
        cosine_anneal: float = 1.0,
        **kwargs,
    ):
        cfg = self.config
        if ray_bundle.nears is None or ray_bundle.fars is None:
            if cfg.use_sphere_collider:
                ray_bundle = SphereCollider(center=jnp.zeros(3), radius=1.0)(
                    ray_bundle, training=self.train
                )
            else:
                ray_bundle = NearFarCollider(cfg.near_plane, cfg.far_plane)(
                    ray_bundle, training=self.train
                )
        k_samp = k_bg = None
        if key is not None:
            k_samp, k_bg = jax.random.split(key)
        sampler = NeuSSampler(
            num_samples=cfg.num_samples,
            num_samples_importance=cfg.num_samples_importance,
            num_upsample_steps=cfg.num_upsample_steps,
        )

        def sdf_fn(rs):
            return self.field.get_sdf(rs)

        ray_samples = sampler(ray_bundle, sdf_fn, key=k_samp)
        return self.sample_and_render(ray_bundle, ray_samples, cosine_anneal, k_bg)

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None):
        # blend RGBA GT over the background the renderer ACTUALLY used, so the
        # logged train psnr is comparable to the rgb loss (a black-blend here
        # once reported psnr 3 while the white-bg rgb_loss implied psnr 16)
        pred, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background=outputs.get("background"),
        )
        return {"psnr": psnr(pred, gt)}

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        pred, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background=outputs.get("background"),
            background_color=config.background_color if config else "black",
        )
        loss_dict = {"rgb_loss": mse_loss(pred, gt)}
        if "eikonal_gradients" in outputs:
            g = outputs["eikonal_gradients"]
            mult = config.eikonal_loss_mult if config else 0.1
            loss_dict["eikonal_loss"] = mult * jnp.mean(
                (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
            )
        return loss_dict

    @staticmethod
    def step_kwargs(step: int, config) -> Dict:
        anneal_end = getattr(config, "cos_anneal_end", 20000)
        return {"cosine_anneal": min(1.0, step / max(anneal_end, 1))}


@dataclasses.dataclass
class NeuSFactoModelConfig(NeuSModelConfig):
    """(reference neus_facto.py:43-76)"""

    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_neus_samples_per_ray: int = 48
    num_proposal_iterations: int = 2
    use_single_jitter: bool = True

    def __post_init__(self):
        if self._target is None:
            self._target = NeuSFactoModel


class NeuSFactoModel(NeuSModel):
    """NeuS + proposal sampling (reference neus_facto.py:79-219)."""

    config: NeuSFactoModelConfig = None

    def setup(self):
        cfg = self.config
        self.field = SDFField(
            num_images=self.num_train_data,
            train=self.train,
            num_layers=cfg.num_layers,
            hidden_dim=cfg.hidden_dim,
            geo_feat_dim=cfg.geo_feat_dim,
            num_layers_color=cfg.num_layers_color,
            hidden_dim_color=cfg.hidden_dim_color,
            bias=cfg.sdf_bias,
            inside_outside=cfg.inside_outside,
            weight_norm=cfg.sdf_weight_norm,
            use_appearance_embedding=cfg.use_appearance_embedding,
        )
        self.proposal_networks = [
            HashMLPDensityField(use_spatial_distortion=False)
            for _ in range(self.config.num_proposal_iterations)
        ]

    def get_outputs(
        self,
        ray_bundle: RayBundle,
        key: Optional[jax.Array] = None,
        cosine_anneal: float = 1.0,
        anneal: float = 1.0,
        update_proposals: bool = True,
        **kwargs,
    ):
        cfg = self.config
        if ray_bundle.nears is None or ray_bundle.fars is None:
            ray_bundle = SphereCollider(center=jnp.zeros(3), radius=1.0)(
                ray_bundle, training=self.train
            )
        k_samp = k_bg = None
        if key is not None:
            k_samp, k_bg = jax.random.split(key)
        sampler = ProposalNetworkSampler(
            num_proposal_samples_per_ray=cfg.num_proposal_samples_per_ray,
            num_nerf_samples_per_ray=cfg.num_neus_samples_per_ray,
            num_proposal_network_iterations=cfg.num_proposal_iterations,
            single_jitter=cfg.use_single_jitter,
            initial_sampler=UniformSampler(
                cfg.num_proposal_samples_per_ray[0], single_jitter=cfg.use_single_jitter
            ),
        )
        density_fns = [net.density_fn for net in self.proposal_networks]
        ray_samples, weights_list, ray_samples_list = sampler(
            ray_bundle, density_fns, key=k_samp, anneal=anneal,
            update_proposals=update_proposals,
        )
        outputs = self.sample_and_render(ray_bundle, ray_samples, cosine_anneal, k_bg)
        if self.train:
            outputs["weights_list"] = weights_list + [outputs.pop("weights")]
            outputs["ray_samples_list"] = ray_samples_list + [ray_samples]
        return outputs

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        from nerfstudio_tpu.model_components.losses import interlevel_loss

        loss_dict = NeuSModel.get_loss_dict(
            outputs, batch, metrics_dict, params, config, **kw
        )
        if "weights_list" in outputs:
            loss_dict["interlevel_loss"] = interlevel_loss(
                outputs["weights_list"], outputs["ray_samples_list"]
            )
        return loss_dict

    @staticmethod
    def step_kwargs(step: int, config) -> Dict:
        kw = NeuSModel.step_kwargs(step, config)
        kw["anneal"] = 1.0
        kw["update_proposals"] = True
        return kw
