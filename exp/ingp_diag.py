"""Diagnose the contracted instant-ngp gates (r5: unbounded 12.7, blender
16.5, masked 18.7 at 5000 steps while nerfacto passes the same scenes).

CPU repro at reduced scale: train on the unbounded gate scene, watch train
loss vs eval PSNR, and dump render statistics (accumulation, depth) to
separate "never learns" from "trains but eval diverges" from "too few
steps".
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
from nerfstudio_tpu.pipelines.factory import build_pipeline

STEPS = int(os.environ.get("INGP_DIAG_STEPS", "600"))
SCENE = os.environ.get("INGP_DIAG_SCENE", "unbounded")
BOUNDED = os.environ.get("INGP_DIAG_BOUNDED", "0") == "1"

config = get_method("instant-ngp")
scene_dir = Path(f"/tmp/gate_scenes/{SCENE}")
if SCENE == "blender":
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=scene_dir, alpha_color="white")
else:
    from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import (
        NerfstudioDataParserConfig,
    )

    config.dataparser = NerfstudioDataParserConfig(
        data=scene_dir, train_split_fraction=0.9, downscale_factor=1
    )
config.data = scene_dir
config.trainer.max_num_iterations = STEPS
for a in ("steps_per_eval_image", "steps_per_eval_batch", "steps_per_eval_all_images", "steps_per_save"):
    setattr(config.trainer, a, 0)
config.trainer.vis = "none"
config.trainer.output_dir = Path("/tmp/ingp_diag")
# shrink for CPU but keep the contracted machinery intact
config.datamanager.train_num_rays_per_batch = 512
config.model.log2_hashmap_size = 15
config.model.max_res = 256
config.model.num_levels = 6
config.model.grid_resolution = 64
config.model.occ_cells_per_update = 8192
if BOUNDED:
    config.model.disable_scene_contraction = True

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
    acc = np.asarray(imgs["accumulation"]) if "accumulation" in imgs else None
    print(
        f"[{label}] psnr={float(m['psnr']):.3f} ssim={float(m['ssim']):.3f} "
        f"pred mean={pred.mean():.3f} std={pred.std():.3f} gt mean={gt.mean():.3f} "
        + (f"acc mean={acc.mean():.3f} min={acc.min():.3f}" if acc is not None else ""),
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
        aux = state.aux
        occ_frac = ""
        if aux is not None and hasattr(aux, "binary"):
            occ_frac = f" occ_frac={float(np.asarray(aux.binary).mean()):.3f}"
        print(f"step {step}: loss={float(m['loss']):.5f} psnr={float(m.get('psnr', float('nan'))):.3f}{occ_frac}", flush=True)
print(f"train {STEPS} steps in {time.time()-t0:.0f}s")
eval_stats(state, f"step{STEPS}")
