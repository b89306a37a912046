import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

from nerfstudio_tpu.configs.method_configs import get_method
from nerfstudio_tpu.pipelines.splat_pipeline import build_splat_pipeline
from nerfstudio_tpu.utils.metrics import ssim, psnr

cfg = get_method("splatfacto")
cfg.data = "/tmp/synth200"
from nerfstudio_tpu.data.dataparsers.registry import get_dataparser_config
cfg.dataparser = get_dataparser_config("blender-data")
cfg.model.max_gaussians = 150_000
cfg.trainer.output_dir = "/tmp/conv/out"
cfg.trainer.experiment_name = "prof"

pipe, state = build_splat_pipeline(cfg)
ts = pipe.build_train_step()
dm = pipe.datamanager
cams = dm.train_cameras
cam_idx, image = dm.next_train(0)
c2w = cams.camera_to_worlds[cam_idx]
K = jnp.stack([cams.fx[cam_idx, 0], cams.fy[cam_idx, 0], cams.cx[cam_idx, 0], cams.cy[cam_idx, 0]])
h = int(np.asarray(cams.height[cam_idx, 0])); w = int(np.asarray(cams.width[cam_idx, 0]))
key = jax.random.PRNGKey(0)


def run(state, n=20):
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = ts(state, c2w, K, image, key, width=w, height=h, sh_degree=3, means_lr=1e-3, cam_idx=int(cam_idx))
    jax.tree_util.tree_map(lambda l: np.asarray(l), metrics)
    return (time.perf_counter() - t0) / n * 1000, state


# warmup / compile
_, state = run(state, n=1)
t, state = run(state)
print(f"full train_step: {t:.1f} ms")

# ssim alone
a = jax.random.uniform(key, (h, w, 3)); b = jax.random.uniform(key, (h, w, 3))
s = jax.jit(lambda a, b: ssim(a, b))
float(s(a, b))
t0 = time.perf_counter()
for _ in range(20):
    r = s(a, b)
float(r)
print(f"ssim {h}x{w}: {(time.perf_counter()-t0)/20*1000:.2f} ms")

# refine alone
rf = pipe.build_refine()
st2 = rf(state, key, do_split=True, do_cull_scale=True, reset_alpha=False)
jax.tree_util.tree_map(lambda l: np.asarray(l).ravel()[:1], st2.aux.alive)
t0 = time.perf_counter()
for _ in range(5):
    st2 = rf(state, key, do_split=True, do_cull_scale=True, reset_alpha=False)
np.asarray(st2.aux.alive)[:1]
print(f"refine: {(time.perf_counter()-t0)/5*1000:.1f} ms")
