"""Built-in method registry (reference: nerfstudio/configs/method_configs.py:87-814).

Each entry is a full MethodConfig: trainer + datamanager + dataparser + model
+ per-group optimizers. Methods registered here appear as ``nst-train``
subcommands; plugins extend the dict via entry points
(nerfstudio_tpu/plugins.py)."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

from nerfstudio_tpu.data.datamanagers import DataManagerConfig
from nerfstudio_tpu.data.dataparsers.base_dataparser import DataParserConfig
from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import NerfstudioDataParserConfig
from nerfstudio_tpu.engine.optimizers import AdamOptimizerConfig, RAdamOptimizerConfig
from nerfstudio_tpu.engine.schedulers import (
    CosineDecaySchedulerConfig,
    ExponentialDecaySchedulerConfig,
    MultiStepSchedulerConfig,
)
from nerfstudio_tpu.data.dataparsers.extra_dataparsers import DNeRFDataParserConfig
from nerfstudio_tpu.engine.trainer import TrainerConfig
from nerfstudio_tpu.models.base_model import ModelConfig
from nerfstudio_tpu.models.nerfacto import NerfactoModelConfig
from nerfstudio_tpu.models.vanilla_nerf import VanillaModelConfig


@dataclasses.dataclass
class MethodConfig:
    """Top-level per-method config (the reference's TrainerConfig bundle)."""

    method_name: str = "base"
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    datamanager: DataManagerConfig = dataclasses.field(default_factory=DataManagerConfig)
    dataparser: DataParserConfig = dataclasses.field(default_factory=NerfstudioDataParserConfig)
    model: ModelConfig = dataclasses.field(default_factory=NerfactoModelConfig)
    optimizers: Dict[str, Dict[str, Any]] = dataclasses.field(default_factory=dict)
    data: Optional[Path] = None
    seed: int = 42
    # dataset class the datamanager wraps the dataparser outputs in
    # (reference: the DataManager's generic dataset type) — "depth" activates
    # DepthDataset (on-disk depth files or the SfM sparse-depth fallback)
    dataset: str = "input"  # input | depth | semantic | sdf

    def __post_init__(self):
        self.trainer.method_name = self.method_name


method_configs: Dict[str, MethodConfig] = {}
descriptions = {
    "nerfacto": "Recommended real->nerf model. Hash grid + proposal sampling.",
    "nerfacto-big": "Larger nerfacto (more features, longer schedule).",
    "nerfacto-huge": "Largest nerfacto.",
    "depth-nerfacto": "Nerfacto with depth supervision.",
    "vanilla-nerf": "Original NeRF (coarse/fine MLPs).",
    "mipnerf": "Mip-NeRF with integrated positional encoding.",
    "dnerf": "Dynamic NeRF (temporal deformation).",
    "instant-ngp": "Instant-NGP: occupancy-grid marching + fused hash MLP.",
    "instant-ngp-bounded": "Instant-NGP, bounded scene variant.",
    "tensorf": "TensoRF vector-matrix decomposition.",
    "splatfacto": "3D Gaussian Splatting.",
    "splatfacto-big": "3DGS with more gaussians.",
    "splatfacto-mcmc": "3DGS with MCMC densification.",
    "neus": "NeuS SDF surface reconstruction.",
    "neus-facto": "NeuS with proposal sampling.",
    "semantic-nerfw": "Semantic NeRF-W.",
    "phototourism": "NeRF-W for unstructured photo collections.",
    "generfacto": "Text-to-3D (SDS).",
}


def _nerfacto_optimizers(max_steps=30000):
    return {
        "field": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=max_steps),
        },
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=max_steps),
        },
        "camera_optimizer": {
            "optimizer": AdamOptimizerConfig(lr=6e-4, eps=1e-15),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=6e-6, max_steps=max_steps),
        },
    }


method_configs["nerfacto"] = MethodConfig(
    method_name="nerfacto",
    trainer=TrainerConfig(
        max_num_iterations=30000, steps_per_eval_image=500, steps_per_save=2000
    ),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096, eval_num_rays_per_batch=4096),
    dataparser=NerfstudioDataParserConfig(),
    model=NerfactoModelConfig(
        eval_num_rays_per_chunk=1 << 15,
        # TPU-tuned speed knobs (quality-gated in r4:
        # benchmarks/gate_nerfacto_fastbwd*.json — each IMPROVES the gate);
        # values scaled to this entry's 30k-iteration schedule and kept OFF
        # on the model-config defaults (ADVICE r4: the reference never
        # freezes proposals — derived configs opt in per schedule)
        field_bwd_level_period=2,
        proposal_freeze_after=2500,
    ),
    optimizers=_nerfacto_optimizers(),
)

method_configs["nerfacto-big"] = MethodConfig(
    method_name="nerfacto-big",
    trainer=TrainerConfig(max_num_iterations=100000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=8192),
    dataparser=NerfstudioDataParserConfig(),
    model=NerfactoModelConfig(
        eval_num_rays_per_chunk=1 << 15,
        num_nerf_samples_per_ray=128,
        num_proposal_samples_per_ray=(512, 256),
        hidden_dim=128,
        hidden_dim_color=128,
        appearance_embed_dim=32,
        max_res=4096,
        proposal_weights_anneal_max_num_iters=5000,
        log2_hashmap_size=21,
        # TPU speed knobs scaled to the 100k schedule (see nerfacto entry)
        field_bwd_level_period=2,
        proposal_freeze_after=8000,
    ),
    optimizers=_nerfacto_optimizers(max_steps=100000),
)

method_configs["nerfacto-huge"] = MethodConfig(
    method_name="nerfacto-huge",
    trainer=TrainerConfig(max_num_iterations=100000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=16384),
    dataparser=NerfstudioDataParserConfig(),
    model=NerfactoModelConfig(
        eval_num_rays_per_chunk=1 << 15,
        num_nerf_samples_per_ray=64,
        num_proposal_samples_per_ray=(512, 512),
        proposal_net_args_list=(
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 512},
            {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 7, "max_res": 2048},
        ),
        hidden_dim=256,
        hidden_dim_color=256,
        appearance_embed_dim=32,
        max_res=8192,
        proposal_weights_anneal_max_num_iters=5000,
        log2_hashmap_size=21,
        features_per_level=4,
        num_levels=16,
        # TPU speed knobs scaled to the 100k schedule (see nerfacto entry)
        field_bwd_level_period=2,
        proposal_freeze_after=8000,
    ),
    optimizers=_nerfacto_optimizers(max_steps=100000),
)

from nerfstudio_tpu.models.instant_ngp import InstantNGPModelConfig  # noqa: E402

method_configs["instant-ngp"] = MethodConfig(
    method_name="instant-ngp",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    dataparser=NerfstudioDataParserConfig(),
    model=InstantNGPModelConfig(eval_num_rays_per_chunk=8192),
    optimizers={
        "field": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=30000),
        },
    },
)

method_configs["instant-ngp-bounded"] = MethodConfig(
    method_name="instant-ngp-bounded",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    dataparser=NerfstudioDataParserConfig(),
    model=InstantNGPModelConfig(
        eval_num_rays_per_chunk=8192,
        grid_resolution=128,
        disable_scene_contraction=True,
        near_plane=0.01,
        background_color="black",
    ),
    optimizers={
        "field": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=1e-4, max_steps=30000),
        },
    },
)

from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig  # noqa: E402

method_configs["splatfacto"] = MethodConfig(
    method_name="splatfacto",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500, steps_per_save=2000),
    datamanager=DataManagerConfig(),
    dataparser=NerfstudioDataParserConfig(load_3D_points=True),
    model=SplatfactoModelConfig(),
    optimizers={},  # splat pipeline builds its own per-array optimizers
)

method_configs["splatfacto-big"] = MethodConfig(
    method_name="splatfacto-big",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500, steps_per_save=2000),
    datamanager=DataManagerConfig(),
    dataparser=NerfstudioDataParserConfig(load_3D_points=True),
    model=SplatfactoModelConfig(
        cull_alpha_thresh=0.005,
        densify_grad_thresh=0.0006,
        max_gaussians=1000000,
    ),
    optimizers={},
)

method_configs["splatfacto-mcmc"] = MethodConfig(
    method_name="splatfacto-mcmc",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500, steps_per_save=2000),
    datamanager=DataManagerConfig(),
    dataparser=NerfstudioDataParserConfig(load_3D_points=True),
    # gsplat MCMCStrategy semantics: relocation + growth toward cap_max +
    # per-step position noise + opacity/scale regularizers
    model=SplatfactoModelConfig(
        strategy="mcmc",
        cull_alpha_thresh=0.005,
        max_gaussians=1000000,
    ),
    optimizers={},
)

method_configs["vanilla-nerf"] = MethodConfig(
    method_name="vanilla-nerf",
    trainer=TrainerConfig(max_num_iterations=16500, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    dataparser=BlenderDataParserConfig(),
    model=VanillaModelConfig(),
    optimizers={
        "field": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-8),
            "scheduler": None,
        },
        "temporal_distortion": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-8),
            "scheduler": None,
        },
    },
)


from nerfstudio_tpu.models.depth_nerfacto import DepthNerfactoModelConfig  # noqa: E402
from nerfstudio_tpu.models.mipnerf import MipNerfModelConfig  # noqa: E402
from nerfstudio_tpu.models.neus import NeuSFactoModelConfig, NeuSModelConfig  # noqa: E402
from nerfstudio_tpu.models.tensorf import TensoRFModelConfig  # noqa: E402

method_configs["depth-nerfacto"] = MethodConfig(
    method_name="depth-nerfacto",
    dataset="depth",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    # 3D points on: fuels the SfM sparse-depth fallback when no depth files
    dataparser=NerfstudioDataParserConfig(load_3D_points=True),
    model=DepthNerfactoModelConfig(
        eval_num_rays_per_chunk=1 << 15,
        # TPU speed knobs scaled to the 30k schedule (see nerfacto entry)
        field_bwd_level_period=2,
        proposal_freeze_after=2500,
    ),
    optimizers=_nerfacto_optimizers(),
)

method_configs["mipnerf"] = MethodConfig(
    method_name="mipnerf",
    trainer=TrainerConfig(max_num_iterations=1000000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    dataparser=BlenderDataParserConfig(),
    model=MipNerfModelConfig(
        num_coarse_samples=128, num_importance_samples=128, eval_num_rays_per_chunk=8192
    ),
    optimizers={
        "field": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-8),
            "scheduler": None,
        },
    },
)

method_configs["dnerf"] = MethodConfig(
    method_name="dnerf",
    trainer=TrainerConfig(max_num_iterations=16500, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    # reference parity: dnerf ships the dnerf parser (blender + per-frame
    # time), reference method_configs.py dnerf entry
    dataparser=DNeRFDataParserConfig(),
    model=VanillaModelConfig(enable_temporal_distortion=True),
    optimizers={
        "field": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-8),
            "scheduler": None,
        },
        "temporal_distortion": {
            "optimizer": RAdamOptimizerConfig(lr=5e-4, eps=1e-8),
            "scheduler": None,
        },
    },
)

method_configs["tensorf"] = MethodConfig(
    method_name="tensorf",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    dataparser=BlenderDataParserConfig(),
    model=TensoRFModelConfig(),
    optimizers={
        "field": {
            "optimizer": AdamOptimizerConfig(lr=0.001),
            "scheduler": ExponentialDecaySchedulerConfig(lr_final=0.0001, max_steps=30000),
        },
    },
)

method_configs["neus"] = MethodConfig(
    method_name="neus",
    trainer=TrainerConfig(max_num_iterations=100000, steps_per_eval_image=2500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=1024),
    dataparser=NerfstudioDataParserConfig(),
    model=NeuSModelConfig(eval_num_rays_per_chunk=1024),
    optimizers={
        "field": {
            "optimizer": AdamOptimizerConfig(lr=5e-4),
            "scheduler": CosineDecaySchedulerConfig(warm_up_end=5000, max_steps=300000),
        },
    },
)

method_configs["neus-facto"] = MethodConfig(
    method_name="neus-facto",
    trainer=TrainerConfig(max_num_iterations=20000, steps_per_eval_image=2500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=2048),
    dataparser=NerfstudioDataParserConfig(),
    model=NeuSFactoModelConfig(eval_num_rays_per_chunk=2048),
    optimizers={
        "field": {
            "optimizer": AdamOptimizerConfig(lr=5e-4, eps=1e-15),
            "scheduler": CosineDecaySchedulerConfig(warm_up_end=500, max_steps=20000),
        },
        "proposal_networks": {
            "optimizer": AdamOptimizerConfig(lr=1e-2, eps=1e-15),
            "scheduler": MultiStepSchedulerConfig(max_steps=20000),
        },
    },
)


from nerfstudio_tpu.data.dataparsers.extra_dataparsers import (  # noqa: E402
    PhototourismDataParserConfig,
)
from nerfstudio_tpu.data.dataparsers.specialty_dataparsers import (  # noqa: E402
    Sitcoms3DDataParserConfig,
)
from nerfstudio_tpu.models.generfacto import GenerfactoModelConfig  # noqa: E402
from nerfstudio_tpu.models.semantic_nerfw import SemanticNerfWModelConfig  # noqa: E402

# nerfacto stack + semantics head (reference method_configs.py semantic-nerfw
# entry: SemanticNerfWModelConfig(NerfactoModelConfig), nerfacto optimizers)
method_configs["semantic-nerfw"] = MethodConfig(
    method_name="semantic-nerfw",
    dataset="semantic",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    dataparser=Sitcoms3DDataParserConfig(),
    model=SemanticNerfWModelConfig(eval_num_rays_per_chunk=1 << 14),
    optimizers=_nerfacto_optimizers(),
)

# NeRF-W on unstructured photo collections: nerfacto model + phototourism
# parser (reference method_configs.py phototourism entry — "one of the only
# differences with nerfacto" is the dataparser)
method_configs["phototourism"] = MethodConfig(
    method_name="phototourism",
    trainer=TrainerConfig(max_num_iterations=30000, steps_per_eval_image=500),
    datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
    dataparser=PhototourismDataParserConfig(),
    model=NerfactoModelConfig(
        eval_num_rays_per_chunk=1 << 15, use_appearance_embedding=True
    ),
    optimizers=_nerfacto_optimizers(),
)

method_configs["generfacto"] = MethodConfig(
    method_name="generfacto",
    trainer=TrainerConfig(max_num_iterations=20000, steps_per_eval_image=0, steps_per_save=5000),
    datamanager=DataManagerConfig(),
    dataparser=NerfstudioDataParserConfig(),  # unused: random cameras
    model=GenerfactoModelConfig(),
    optimizers={},
)


# live invariant: the hand-maintained descriptions dict must track the registry
# exactly (drift here silently hides/misdocuments methods in the CLI listing)
assert set(descriptions) == set(method_configs), (
    "method_configs/descriptions drift: "
    f"missing descriptions {set(method_configs) - set(descriptions)}, "
    f"stale descriptions {set(descriptions) - set(method_configs)}"
)


def get_method(name: str) -> MethodConfig:
    import copy

    from nerfstudio_tpu.plugins import discover_methods

    all_methods = dict(method_configs)
    all_methods.update(discover_methods())
    if name not in all_methods:
        from nerfstudio_tpu.configs.external_methods import get_external_methods

        _, install = get_external_methods()
        if name in install:
            raise SystemExit(
                f"method {name!r} is an external plugin. Install it first:\n\n"
                f"{install[name]}\n"
            )
        raise SystemExit(
            f"unknown method {name!r}; available: {', '.join(sorted(all_methods))}"
        )
    return copy.deepcopy(all_methods[name])
