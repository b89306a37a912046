"""Capture a jax.profiler device trace of the nerfacto train step and print
the top HLO ops by self-time (via tensorboard_plugin_profile parsing)."""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

TRACE_DIR = "/tmp/nst_trace"


def build():
    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    rays = int(os.environ.get("NST_BENCH_RAYS", "8192"))
    cfg, dm, model_train, model_eval = _synthetic_setup(hw=128, n_images=16, rays=rays, tiny=False)
    pipeline = VanillaPipeline(dm, model_train, model_eval, tx=None, mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(cfg.optimizers, params)
    pipeline.init_aux = lambda: NerfactoModel.init_aux(model_train, cfg.model)
    state = pipeline.init_state(key, params=params)
    aux_hook = NerfactoModel.make_aux_update_fn(model_train, cfg.model)

    def run(state, key, start, n):
        m = None
        for i in range(n):
            step = start + i
            key, k_aux, k_step = jax.random.split(key, 3)
            if aux_hook is not None:
                state = aux_hook(state, step, k_aux)
            kw = NerfactoModel.step_kwargs(step, cfg.model)
            state, m = pipeline.train_step(state, dm.train_images, k_step, **kw)
        return state, key, m

    return run, state, key


def main():
    run, state, key = build()
    state, key, m = run(state, key, 6000, 12)
    _ = float(m["loss"])
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        state, key, m = run(state, key, 6012, 10)
        _ = float(m["loss"])

    # parse xplane
    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "framework_op_stats^", {})
    out = f"{TRACE_DIR}/op_stats.json"
    if isinstance(data, bytes):
        data = data.decode()
    with open(out, "w") as f:
        f.write(data)
    try:
        rows = json.loads(data)
        print(type(rows))
    except Exception:
        print("wrote raw tool data to", out, "len", len(data))


if __name__ == "__main__":
    main()
