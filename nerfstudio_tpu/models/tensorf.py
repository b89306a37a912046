"""TensoRF model (reference: nerfstudio/models/tensorf.py, 378 LoC).

VM decomposition with uniform+PDF sampling; L1 sparsity + TV regularizers.
Progressive grid upsampling (reference :119-160) is a staged re-jit in the
TPU design: grids are resampled between stages by the aux-update hook (the
resolution schedule lives in config.upsampling_iters)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.fields.tensorf_field import TensoRFField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import mse_loss, tv_loss
from nerfstudio_tpu.model_components.ray_samplers import PDFSampler, UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import AABBBoxCollider
from nerfstudio_tpu.models.base_model import Model, ModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class TensoRFModelConfig(ModelConfig):
    """(reference tensorf.py:48-88)"""

    init_resolution: int = 128
    final_resolution: int = 300
    upsampling_iters: Tuple[int, ...] = (2000, 3000, 4000, 5500, 7000)
    num_uniform_samples: int = 200
    num_samples: int = 50
    num_den_components: int = 16
    num_color_components: int = 48
    appearance_dim: int = 27
    regularization: str = "tv"  # none | l1 | tv
    l1_mult: float = 8e-5
    tv_mult: float = 1e-3
    background_color: str = "white"

    def __post_init__(self):
        if self._target is None:
            self._target = TensoRFModel


class TensoRFModel(Model):
    """(reference tensorf.py:91-378)"""

    config: TensoRFModelConfig = None

    # -- progressive grid upsampling (reference tensorf.py:119-160) ----------
    #
    # TPU design: the VM grids' shapes live in the param leaves (flax reads
    # them from the dict at apply time), so upsampling = linear-resample the
    # plane/line leaves + reinit the optimizer state; XLA re-jits on the new
    # shapes automatically. The hook runs host-side between steps.

    @staticmethod
    def upsample_resolutions(config: TensoRFModelConfig):
        n = len(config.upsampling_iters)
        return (
            np.round(
                np.exp(
                    np.linspace(
                        np.log(config.init_resolution),
                        np.log(config.final_resolution),
                        n + 1,
                    )
                )
            )
            .astype(int)[1:]
            .tolist()
        )

    @staticmethod
    def make_upsample_hook(pipeline, config: TensoRFModelConfig):
        milestones = dict(
            zip(config.upsampling_iters, TensoRFModel.upsample_resolutions(config))
        )

        def hook(state, step: int, key):
            if step not in milestones:
                return state
            new_res = int(milestones[step])

            def resize(path, leaf):
                name = getattr(path[-1], "key", None)
                if name == "plane_coef":
                    return jax.image.resize(
                        leaf, leaf.shape[:2] + (new_res, new_res), "linear"
                    )
                if name == "line_coef":
                    return jax.image.resize(leaf, leaf.shape[:2] + (new_res,), "linear")
                return leaf

            new_params = jax.tree_util.tree_map_with_path(resize, state.params)
            # rebuild the model objects so flax's param-shape validation sees
            # the new grid resolution, and drop the cached jitted programs
            new_cfg = dataclasses.replace(config, init_resolution=new_res)
            old = pipeline.model_train
            pipeline.model_train = TensoRFModel(
                config=new_cfg, scene_aabb=old.scene_aabb,
                num_train_data=old.num_train_data, train=True,
            )
            pipeline.model_eval = TensoRFModel(
                config=new_cfg, scene_aabb=old.scene_aabb,
                num_train_data=old.num_train_data, train=False,
            )
            pipeline._train_step = None
            pipeline._eval_chunk = None
            # reference reinitializes the optimizer after each upsample
            new_opt = pipeline.tx.init(new_params)
            return state.replace(params=new_params, opt_state=new_opt)

        return hook

    def setup(self):
        self.field = TensoRFField(
            aabb=self.scene_aabb,
            density_resolution=self.config.init_resolution,
            color_resolution=self.config.init_resolution,
            density_components=self.config.num_den_components,
            color_components=self.config.num_color_components,
            appearance_dim=self.config.appearance_dim,
        )

    def get_outputs(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        cfg = self.config
        if ray_bundle.nears is None or ray_bundle.fars is None:
            from nerfstudio_tpu.data.scene_box import SceneBox

            aabb = jnp.asarray(self.scene_aabb, jnp.float32)
            ray_bundle = AABBBoxCollider(SceneBox(aabb=aabb), near_plane=0.05)(
                ray_bundle, training=self.train
            )
        k1 = k2 = k_bg = None
        if key is not None:
            k1, k2, k_bg = jax.random.split(key, 3)

        coarse = UniformSampler(cfg.num_uniform_samples, single_jitter=True)(ray_bundle, key=k1)
        dens_coarse, _ = self.field.get_density(coarse)
        weights_coarse = coarse.get_weights(dens_coarse)

        pdf = PDFSampler(cfg.num_samples, single_jitter=False, include_original=False)
        fine = pdf(ray_bundle, coarse, weights_coarse, key=k2)
        field_outputs = self.field(fine)
        weights = fine.get_weights(field_outputs[FieldHeadNames.DENSITY])
        rgb, background = renderers.render_rgb(
            field_outputs[FieldHeadNames.RGB], weights,
            background_color=cfg.background_color, key=k_bg, return_background=True,
        )
        depth = renderers.render_depth(weights, fine)
        accumulation = renderers.render_accumulation(weights)
        outputs = {"rgb": rgb, "accumulation": accumulation, "depth": depth}
        if self.train:
            outputs["background"] = background
        return outputs

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None):
        pred, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background=outputs.get("background"), background_color="white",
        )
        return {"psnr": psnr(pred, gt)}

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        pred, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background=outputs.get("background"), background_color="white",
        )
        loss_dict = {"rgb_loss": mse_loss(pred, gt)}
        if params is not None and config is not None and config.regularization != "none":
            field_params = params["params"].get("field", {})
            denc = field_params.get("density_encoding", {})
            plane = denc.get("plane_coef")
            line = denc.get("line_coef")
            if plane is not None:
                if config.regularization == "l1":
                    loss_dict["l1_reg"] = config.l1_mult * (
                        jnp.mean(jnp.abs(plane)) + jnp.mean(jnp.abs(line))
                    )
                else:
                    loss_dict["tv_reg_density"] = config.tv_mult * tv_loss(plane)
                    cenc = field_params.get("color_encoding", {})
                    if cenc.get("plane_coef") is not None:
                        loss_dict["tv_reg_color"] = config.tv_mult * tv_loss(
                            cenc["plane_coef"]
                        )
        return loss_dict

    @staticmethod
    def step_kwargs(step: int, config) -> Dict:
        return {}
