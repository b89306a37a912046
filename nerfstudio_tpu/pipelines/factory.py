"""Assemble a MethodConfig into a runnable Trainer (the reference's
``TrainerConfig.setup()`` + ``Pipeline.__init__`` wiring,
reference engine/trainer.py:149-231 + pipelines/base_pipeline.py:242-300)."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from nerfstudio_tpu.configs.method_configs import MethodConfig
from nerfstudio_tpu.data.datamanagers import DeviceCacheDataManager, FullImageDatamanager
from nerfstudio_tpu.data.datasets import InputDataset
from nerfstudio_tpu.engine.optimizers import build_optimizers
from nerfstudio_tpu.engine.trainer import Trainer
from nerfstudio_tpu.parallel.mesh import make_mesh
from nerfstudio_tpu.pipelines.base_pipeline import TrainState, VanillaPipeline


def _eval_split_candidates(parser) -> Tuple[str, ...]:
    # blender ships explicit test/val splits (reference blender_dataparser);
    # other parsers derive "val" from a train fraction
    name = type(parser).__name__.lower()
    return ("test", "val") if "blender" in name else ("val", "test")


def build_datasets(config: MethodConfig):
    if config.data is not None:
        config.dataparser.data = Path(config.data)
    parser = config.dataparser.setup()
    train_out = parser.get_dataparser_outputs("train")
    eval_out = train_out
    for split in _eval_split_candidates(parser):
        try:
            eval_out = parser.get_dataparser_outputs(split)
            break
        except FileNotFoundError:
            continue
    # method-selected dataset class (reference: DataManager generic dataset
    # type): "depth" feeds DepthDataset's per-pixel depth stack (on-disk files
    # or the SfM sparse-depth fallback) into the datamanager
    from nerfstudio_tpu.data.datasets import DepthDataset, SDFDataset, SemanticDataset

    cls = {
        "input": InputDataset,
        "depth": DepthDataset,
        "semantic": SemanticDataset,
        "sdf": SDFDataset,
    }[getattr(config, "dataset", "input")]
    return cls(train_out), cls(eval_out), train_out


def build_pipeline(
    config: MethodConfig, use_mesh: bool = True
) -> Tuple[VanillaPipeline, TrainState, MethodConfig]:
    train_ds, eval_ds, train_out = build_datasets(config)
    mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
    datamanager = DeviceCacheDataManager(config.datamanager, train_ds, eval_ds)

    # dataset-driven semantic class count (reference semantic_nerfw.py:96:
    # num_semantic_classes = len(metadata["semantics"].classes))
    sem = getattr(train_ds, "semantics", None)
    if sem is not None and sem.classes and hasattr(config.model, "num_semantic_classes"):
        config.model.num_semantic_classes = len(sem.classes)

    aabb = tuple(tuple(float(v) for v in row) for row in np.asarray(train_out.scene_box.aabb))
    ModelCls = config.model._target
    num_train = len(train_ds)
    model_train = ModelCls(
        config=config.model, scene_aabb=aabb, num_train_data=num_train, train=True
    )
    model_eval = ModelCls(
        config=config.model, scene_aabb=aabb, num_train_data=num_train, train=False
    )

    pipeline = VanillaPipeline(
        datamanager, model_train, model_eval, tx=None, mesh=mesh,
        loss_coefficients=config.model.loss_coefficients if hasattr(config.model, "loss_coefficients") else None,
    )
    if hasattr(ModelCls, "make_upsample_hook"):
        pipeline.aux_update_fn = ModelCls.make_upsample_hook(pipeline, config.model)
    if hasattr(ModelCls, "init_aux"):
        pipeline.init_aux = lambda: ModelCls.init_aux(model_train, config.model)
    if hasattr(ModelCls, "make_aux_update_fn"):
        pipeline.aux_update_fn = ModelCls.make_aux_update_fn(model_train, config.model)
    key = jax.random.PRNGKey(config.seed)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(config.optimizers, params)
    state = pipeline.init_state(key, params=params)
    return pipeline, state, config


def build_trainer(config: MethodConfig, use_mesh: bool = True) -> Trainer:
    pipeline, state, config = build_pipeline(config, use_mesh=use_mesh)
    ModelCls = config.model._target
    step_kwargs_fn = (
        (lambda step: ModelCls.step_kwargs(step, config.model))
        if hasattr(ModelCls, "step_kwargs")
        else (lambda step: {})
    )
    trainer = Trainer(config.trainer, pipeline, step_kwargs_fn=step_kwargs_fn, seed=config.seed)
    trainer.state = state
    trainer.pipeline.build_train_step()
    if config.trainer.load_dir is not None:
        trainer._load_checkpoint()
    return trainer
