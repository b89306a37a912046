"""Benchmark: nerfacto train throughput (rays/sec) on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference nerfacto-big reaches ~70k rays/sec on 1x V100
(reference docs/quickstart/first_nerf.md:129; BASELINE.md).

Timing is honest: the tunneled TPU runtime's ``block_until_ready`` can return
before execution finishes, so the loop is state-chained and synced by a host
readback of the final step's loss (which transitively depends on every step).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 70000.0  # nerfacto-big, 1x V100


def _device_watchdog(timeout_s: float = 600.0) -> None:
    """Abort (exit 3) if the accelerator backend never comes up.

    The tunneled PJRT client blocks forever inside ``make_c_api_client`` when
    the device relay is down; without this the driver's bench run hangs
    instead of failing with a diagnosable message."""
    import os
    import threading

    def _bail() -> None:
        import sys

        print(
            f"bench: accelerator backend failed to initialize within "
            f"{timeout_s:.0f}s (device tunnel down?); aborting",
            file=sys.stderr,
            flush=True,
        )
        os._exit(3)

    t = threading.Timer(timeout_s, _bail)
    t.daemon = True
    t.start()
    import jax

    jax.devices()  # force backend init under the watchdog
    t.cancel()


def main() -> None:
    _device_watchdog()
    import jax

    # persistent compile cache: the tunneled runtime's compile RPCs run
    # minutes-slow under congestion (observed r5: a cold bench exceeded 20
    # min waiting on compiles the gate matrix had already done); reuse the
    # same cache dir as the gate tool so warm runs skip them entirely
    jax.config.update("jax_compilation_cache_dir", "/tmp/xla_cache_gate")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    import os

    rays_per_batch = int(os.environ.get("NST_BENCH_RAYS", "8192"))
    cfg, dm, model_train, model_eval = _synthetic_setup(
        hw=128, n_images=16, rays=rays_per_batch, tiny=False
    )
    if os.environ.get("NST_BENCH_LVL_PERIOD") or os.environ.get("NST_BENCH_PROP_FREEZE"):
        # measure the level-subsampled backward / proposal freeze BEFORE
        # flipping their defaults (both flow through step_kwargs)
        cfg.model.field_bwd_level_period = int(os.environ.get("NST_BENCH_LVL_PERIOD", "0"))
        cfg.model.field_bwd_level_warmup = 0
        if os.environ.get("NST_BENCH_PROP_FREEZE"):
            cfg.model.proposal_freeze_after = int(os.environ["NST_BENCH_PROP_FREEZE"])
        from nerfstudio_tpu.models.nerfacto import NerfactoModel as _NM

        aabb = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        model_train = _NM(config=cfg.model, scene_aabb=aabb, num_train_data=16, train=True)
        model_eval = _NM(config=cfg.model, scene_aabb=aabb, num_train_data=16, train=False)
    if (
        os.environ.get("NST_BENCH_Z_PAIR")
        or os.environ.get("NST_BENCH_BLOCK")
        or os.environ.get("NST_BENCH_HYBRID")
    ):
        cfg.model.field_z_pair = os.environ.get("NST_BENCH_Z_PAIR") == "1"
        if os.environ.get("NST_BENCH_BLOCK") == "1":
            cfg.model.field_block = True
            cfg.model.prop_block = True
        if os.environ.get("NST_BENCH_HYBRID") == "1":
            # block-packed proposals (stochastic rounding) + exact z-pair field
            cfg.model.prop_block = True
            cfg.model.field_z_pair = True
        from nerfstudio_tpu.models.nerfacto import NerfactoModel as _NM

        aabb = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        model_train = _NM(config=cfg.model, scene_aabb=aabb, num_train_data=16, train=True)
        model_eval = _NM(config=cfg.model, scene_aabb=aabb, num_train_data=16, train=False)

    pipeline = VanillaPipeline(dm, model_train, model_eval, tx=None, mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(cfg.optimizers, params)
    if hasattr(NerfactoModel, "init_aux"):
        pipeline.init_aux = lambda: NerfactoModel.init_aux(model_train, cfg.model)
    state = pipeline.init_state(key, params=params)
    aux_hook = NerfactoModel.make_aux_update_fn(model_train, cfg.model)

    scan_k = int(os.environ.get("NST_BENCH_SCAN", "0"))
    if scan_k > 1:
        # K steps per dispatch: schedules + occupancy updates move in-graph
        aux_traced = NerfactoModel.make_aux_update_traced(model_train, cfg.model)
        scan_fn = pipeline.build_train_step_scan(
            NerfactoModel, cfg.model, aux_update=aux_traced
        )
        # align the step counter so in-graph schedules see the right step
        import jax.numpy as jnp

        state = state.replace(step=jnp.asarray(6000, state.step.dtype))

        def run(state, key, start_step, n_steps):
            metrics = None
            n_disp = max(1, n_steps // scan_k)
            for _ in range(n_disp):
                key, k = jax.random.split(key)
                state, metrics = scan_fn(state, dm.train_images, k, n_steps=scan_k)
            run.steps_done = n_disp * scan_k
            return state, key, metrics

    else:

        def run(state, key, start_step, n_steps):
            """Steady-state trainer loop: aux updates + per-step kwargs."""
            metrics = None
            for i in range(n_steps):
                step = start_step + i
                key, k_aux, k_step = jax.random.split(key, 3)
                if aux_hook is not None:
                    state = aux_hook(state, step, k_aux)
                kwargs = NerfactoModel.step_kwargs(step, cfg.model)
                state, metrics = pipeline.train_step(state, dm.train_images, k_step, **kwargs)
            return state, key, metrics

    # warmup: compile every variant (update_proposals on/off, aux update)
    state, key, metrics = run(state, key, 6000, 12)
    _ = float(metrics["loss"])  # host readback = true sync

    n_steps = 50
    t0 = time.perf_counter()
    state, key, metrics = run(state, key, 6012, n_steps)
    loss = float(metrics["loss"])  # forces the whole chained loop
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"bench loss not finite: {loss}"

    rays_per_sec = rays_per_batch * getattr(run, "steps_done", n_steps) / dt
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
