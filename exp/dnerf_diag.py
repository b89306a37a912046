"""Diagnose the dnerf time-varying gate FAIL (r5: 9.51 dB at 8000 steps
while vanilla-nerf passes the static blender protocol at 24.35).

CPU repro on the dnerf gate scene: train shrunk dnerf, watch train/eval
PSNR, and compare against the same run with the temporal distortion
disabled (pure vanilla-nerf on the moving scene) to separate "deformation
MLP scrambles everything" from "scene is just harder".
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from pathlib import Path

from nerfstudio_tpu.configs.method_configs import get_method
from nerfstudio_tpu.data.dataparsers.extra_dataparsers import DNeRFDataParserConfig
from nerfstudio_tpu.pipelines.factory import build_pipeline

STEPS = int(os.environ.get("DNERF_DIAG_STEPS", "500"))
DISABLE = os.environ.get("DNERF_DIAG_DISABLE_TEMPORAL", "0") == "1"

config = get_method("dnerf")
scene_dir = Path("/tmp/gate_scenes/dnerf")
config.dataparser = DNeRFDataParserConfig(data=scene_dir)
config.data = scene_dir
config.trainer.max_num_iterations = STEPS
for a in ("steps_per_eval_image", "steps_per_eval_batch", "steps_per_eval_all_images", "steps_per_save"):
    setattr(config.trainer, a, 0)
config.trainer.vis = "none"
config.trainer.output_dir = Path("/tmp/dnerf_diag")
config.datamanager.train_num_rays_per_batch = 256
config.model.num_coarse_samples = 24
config.model.num_importance_samples = 24
if DISABLE:
    config.model.enable_temporal_distortion = False

pipeline, state, config = build_pipeline(config, use_mesh=False)
ModelCls = config.model._target
key = jax.random.PRNGKey(config.seed)
kwargs_fn = (
    (lambda s: ModelCls.step_kwargs(s, config.model))
    if hasattr(ModelCls, "step_kwargs")
    else (lambda s: {})
)
aux_hook = pipeline.aux_update_fn


def eval_stats(state, label):
    m, imgs = pipeline.get_eval_image_metrics_and_images(state, 0, chunk_size=8192)
    img = np.asarray(imgs["img"])
    w = img.shape[1] // 2
    gt, pred = img[:, :w], img[:, w:]
    print(
        f"[{label}] psnr={float(m['psnr']):.3f} ssim={float(m['ssim']):.3f} "
        f"pred mean={pred.mean():.3f} std={pred.std():.3f} gt mean={gt.mean():.3f} std={gt.std():.3f}",
        flush=True,
    )


eval_stats(state, "step0")
t0 = time.time()
for step in range(STEPS):
    key, k_aux, k = jax.random.split(key, 3)
    if aux_hook is not None:
        state = aux_hook(state, step, k_aux)
    state, m = pipeline.train_step(
        state, pipeline.datamanager.train_images, k, **kwargs_fn(step)
    )
    if step % max(1, STEPS // 10) == 0 or step == STEPS - 1:
        print(f"step {step}: loss={float(m['loss']):.5f} "
              + " ".join(f"{k}={float(v):.4f}" for k, v in sorted(m.items()) if k != "loss"),
              flush=True)
print(f"train {STEPS} steps in {time.time()-t0:.0f}s")
eval_stats(state, f"step{STEPS}")
