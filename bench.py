"""Benchmark: nerfacto train throughput (rays/sec) on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference nerfacto-big reaches ~70k rays/sec on 1x V100
(reference docs/quickstart/first_nerf.md:129; BASELINE.md)."""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 70000.0  # nerfacto-big, 1x V100


def main() -> None:
    import jax

    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    rays_per_batch = 4096
    cfg, dm, model_train, model_eval = _synthetic_setup(
        hw=128, n_images=16, rays=rays_per_batch, tiny=False
    )

    pipeline = VanillaPipeline(dm, model_train, model_eval, tx=None, mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(cfg.optimizers, params)
    state = pipeline.init_state(key, params=params)
    kwargs = NerfactoModel.step_kwargs(2000, cfg.model)

    # warmup (compile)
    for i in range(3):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(state, dm.train_images, k, **kwargs)
    jax.block_until_ready(state.params)

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(state, dm.train_images, k, **kwargs)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    rays_per_sec = rays_per_batch * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "nerfacto_train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
