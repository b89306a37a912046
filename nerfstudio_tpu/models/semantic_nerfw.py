"""Semantic NeRF-W model (reference: nerfstudio/models/semantic_nerfw.py, 311 LoC).

NeRF-W transients + semantic head; uncertainty-weighted RGB loss + transient
density regularizer + semantic cross-entropy. Also used (without semantics)
as the ``phototourism`` method."""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.field_components.field_heads import FieldHeadNames
from nerfstudio_tpu.fields.nerfw_field import VanillaNerfWField
from nerfstudio_tpu.model_components import renderers
from nerfstudio_tpu.model_components.losses import mse_loss
from nerfstudio_tpu.model_components.ray_samplers import PDFSampler, UniformSampler
from nerfstudio_tpu.model_components.scene_colliders import NearFarCollider
from nerfstudio_tpu.models.base_model import Model, ModelConfig
from nerfstudio_tpu.utils.metrics import psnr


@dataclasses.dataclass
class SemanticNerfWModelConfig(ModelConfig):
    """(reference semantic_nerfw.py:51-72)"""

    num_coarse_samples: int = 64
    num_importance_samples: int = 64
    background_color: str = "black"
    # reference parity: transients ship OFF (reference semantic_nerfw.py:55);
    # with them on, the transient head + per-image embeddings can explain the
    # whole image and eval (mean embedding) collapses — observed 6.5 dB on
    # the r4 gate before this flip
    use_transient_embedding: bool = False
    use_semantics: bool = True
    num_semantic_classes: int = 100
    semantic_loss_weight: float = 1.0
    pass_semantic_gradients: bool = False

    def __post_init__(self):
        if self._target is None:
            self._target = SemanticNerfWModel


class SemanticNerfWModel(Model):
    """(reference semantic_nerfw.py:75-311)"""

    config: SemanticNerfWModelConfig = None

    def setup(self):
        cfg = self.config
        self.field = VanillaNerfWField(
            num_images=self.num_train_data,
            use_transient_embedding=cfg.use_transient_embedding,
            use_semantics=cfg.use_semantics,
            num_semantic_classes=cfg.num_semantic_classes,
            train=self.train,
        )

    def get_outputs(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        cfg = self.config
        if ray_bundle.nears is None or ray_bundle.fars is None:
            ray_bundle = NearFarCollider(0.05, 10.0)(ray_bundle, training=self.train)
        k1 = k2 = k_bg = None
        if key is not None:
            k1, k2, k_bg = jax.random.split(key, 3)

        coarse = UniformSampler(cfg.num_coarse_samples)(ray_bundle, key=k1)
        out_coarse = self.field(coarse)
        w_coarse = coarse.get_weights(out_coarse[FieldHeadNames.DENSITY])
        fine = PDFSampler(cfg.num_importance_samples, include_original=True)(
            ray_bundle, coarse, w_coarse, key=k2
        )
        out_fine = self.field(fine)

        static_density = out_fine[FieldHeadNames.DENSITY]
        outputs: Dict[str, jnp.ndarray] = {}
        if (
            cfg.use_transient_embedding
            and self.train
            and FieldHeadNames.TRANSIENT_DENSITY in out_fine
        ):
            transient_density = out_fine[FieldHeadNames.TRANSIENT_DENSITY]
            total = static_density + transient_density
            weights = fine.get_weights(total)
            w_static = fine.get_weights(static_density)
            rgb_static = renderers.render_rgb(
                out_fine[FieldHeadNames.RGB], weights,
                background_color=cfg.background_color, key=k_bg,
            )
            # composite transient rgb contribution
            t_w, _ = fine.get_weights_and_transmittance(transient_density)
            rgb = rgb_static + jnp.sum(
                t_w * out_fine[FieldHeadNames.TRANSIENT_RGB], axis=-2
            )
            rgb = jnp.clip(rgb, 0.0, 1.0)
            uncertainty = (
                renderers.render_uncertainty(out_fine[FieldHeadNames.UNCERTAINTY], t_w) + 0.03
            )
            outputs["uncertainty"] = uncertainty
            outputs["density_transient"] = transient_density
        else:
            weights = fine.get_weights(static_density)
            w_static = weights
            rgb = renderers.render_rgb(
                out_fine[FieldHeadNames.RGB], weights,
                background_color=cfg.background_color, key=k_bg,
            )

        outputs["rgb"] = rgb
        outputs["accumulation"] = renderers.render_accumulation(weights)
        outputs["depth"] = renderers.render_depth(weights, fine)
        if cfg.use_semantics and FieldHeadNames.SEMANTICS in out_fine:
            sem_w = w_static
            if not cfg.pass_semantic_gradients:
                sem_w = jax.lax.stop_gradient(sem_w)
            outputs["semantics"] = renderers.render_semantics(
                out_fine[FieldHeadNames.SEMANTICS], sem_w
            )

        # coarse branch for its rgb loss
        rgb_coarse = renderers.render_rgb(
            out_coarse[FieldHeadNames.RGB], w_coarse,
            background_color=cfg.background_color, key=k_bg,
        )
        outputs["rgb_coarse"] = rgb_coarse
        outputs["accumulation_coarse"] = renderers.render_accumulation(w_coarse)
        return outputs

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None):
        pred, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"],
            background_color="black",
        )
        return {"psnr": psnr(pred, gt)}

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, config=None, **kw):
        """(reference semantic_nerfw.py:214-255): uncertainty-weighted MSE +
        betas regularizer + transient density L1 + semantic CE."""
        bg = config.background_color if config else "black"
        pred_c, gt = renderers.blend_background_for_loss_computation(
            outputs["rgb_coarse"], outputs["accumulation_coarse"], batch["image"],
            background_color=bg,
        )
        pred_f, gt_f = renderers.blend_background_for_loss_computation(
            outputs["rgb"], outputs["accumulation"], batch["image"], background_color=bg
        )
        loss_dict = {"rgb_loss_coarse": mse_loss(pred_c, gt)}
        if "uncertainty" in outputs:
            beta = outputs["uncertainty"]
            loss_dict["rgb_loss_fine"] = jnp.mean(
                ((gt_f - pred_f) ** 2) / (2 * beta**2)
            )
            loss_dict["uncertainty_loss"] = jnp.mean(3.0 + jnp.log(beta))
            loss_dict["density_loss"] = 0.01 * jnp.mean(outputs["density_transient"])
        else:
            loss_dict["rgb_loss_fine"] = mse_loss(pred_f, gt_f)
        if "semantics" in outputs and "semantics" in batch:
            labels = batch["semantics"][..., 0].astype(jnp.int32)
            logits = outputs["semantics"]
            log_probs = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(log_probs, labels[..., None], axis=-1)
            w = config.semantic_loss_weight if config else 1.0
            loss_dict["semantics_loss"] = w * jnp.mean(ce)
        return loss_dict
