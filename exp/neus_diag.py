"""Diagnose the neus blender-gate failure (12.1 dB, r5): does training move
the eval output at all, and what does the render look like statistically?

Runs on CPU (device may be busy with the gate matrix). Small steps.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pathlib import Path

from nerfstudio_tpu.configs.method_configs import get_method
from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
from nerfstudio_tpu.pipelines.factory import build_pipeline

STEPS = int(os.environ.get("NEUS_DIAG_STEPS", "150"))
METHOD = os.environ.get("NEUS_DIAG_METHOD", "neus")

config = get_method(METHOD)
scene_dir = Path("/tmp/gate_scenes/blender")
alpha = None if getattr(config.model, "background_color", "") == "black" else "white"
config.dataparser = BlenderDataParserConfig(data=scene_dir, alpha_color=alpha)
config.data = scene_dir
config.trainer.max_num_iterations = STEPS
config.trainer.steps_per_eval_image = 0
config.trainer.steps_per_eval_batch = 0
config.trainer.steps_per_eval_all_images = 0
config.trainer.steps_per_save = 0
config.trainer.vis = "none"
config.trainer.output_dir = Path("/tmp/neus_diag")
# shrink for CPU
config.datamanager.train_num_rays_per_batch = 256

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
    m, imgs = pipeline.get_eval_image_metrics_and_images(state, 0, chunk_size=4096)
    img = np.asarray(imgs["img"])  # [gt | pred]
    w = img.shape[1] // 2
    gt, pred = img[:, :w], img[:, w:]
    print(
        f"[{label}] psnr={float(m['psnr']):.3f} ssim={float(m['ssim']):.3f} "
        f"pred mean={pred.mean():.3f} std={pred.std():.3f} "
        f"gt mean={gt.mean():.3f} std={gt.std():.3f}",
        flush=True,
    )
    return pred


p0 = eval_stats(state, "step0")

t0 = time.time()
losses = []
for step in range(STEPS):
    key, k_aux, k = jax.random.split(key, 3)
    if aux_hook is not None:
        state = aux_hook(state, step, k_aux)
    state, m = pipeline.train_step(
        state, pipeline.datamanager.train_images, k, **kwargs_fn(step)
    )
    if step % max(1, STEPS // 10) == 0 or step == STEPS - 1:
        losses.append((step, float(m["loss"])))
        print(f"step {step}: loss={float(m['loss']):.5f} "
              + " ".join(f"{k}={float(v):.4f}" for k, v in m.items() if k != "loss"),
              flush=True)
print(f"train {STEPS} steps in {time.time()-t0:.0f}s")

p1 = eval_stats(state, f"step{STEPS}")
print("pred delta L2 (trained vs untrained eval):", float(np.sqrt(((p1 - p0) ** 2).mean())))

# inspect learned variance + sdf scale on a probe grid
params = state.params if hasattr(state, "params") else state["params"]
flat = jax.tree_util.tree_flatten_with_path(params)[0]
for path, leaf in flat:
    name = jax.tree_util.keystr(path)
    if "variance" in name or "deviation" in name:
        print("param", name, np.asarray(leaf))
