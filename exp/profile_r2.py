"""Round-2 profile: trace N bench-identical train steps, attribute op time.

Parses the perfetto trace.json.gz that jax.profiler writes and prints the
top ops by total device time, split by step variant (proposal-grad gated
steps vs update_proposals steps).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

TRACE_DIR = "/tmp/nst_trace_r2"


def main():
    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    rays = 8192
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
            kwargs = NerfactoModel.step_kwargs(step, cfg.model)
            state, m = pipeline.train_step(state, dm.train_images, k_step, **kwargs)
        return state, key, m

    # warmup + compile all variants
    state, key, m = run(state, key, 6000, 12)
    float(m["loss"])

    t0 = time.perf_counter()
    state, key, m = run(state, key, 6012, 50)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"50 steps: {dt*1000:.0f} ms total, {dt/50*1000:.1f} ms/step, {rays*50/dt:.0f} rays/s")

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    state, key, m = run(state, key, 6062, 20)
    float(m["loss"])
    jax.profiler.stop_trace()

    # parse
    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace found under {TRACE_DIR}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find TPU device pids (XLA Ops lines)
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Op" not in tname and "Steps" not in tname and tname != "":
            # keep only op lines; XLA Modules line double-counts
            if "XLA Modules" in tname or "Framework" in tname:
                continue
        name = e.get("name", "?")
        op_time[name] += e.get("dur", 0)
        op_count[name] += 1
    total = sum(op_time.values())
    print(f"\ndevice total (all lines, 20 steps): {total/1000:.1f} ms")
    print(f"{'op':<72} {'ms/20step':>10} {'count':>6} {'pct':>5}")
    for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:72]:<72} {t/1000:>10.2f} {op_count[name]:>6} {100*t/total:>5.1f}")


if __name__ == "__main__":
    main()
