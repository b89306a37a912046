"""Eval/render path attribution (VERDICT r2 task #2).

Measures, readback-synced and SINGLE-TENANT, where the 512^2 nerfacto render
spends its time: full render_camera (shipped path), isolated eval_chunk
dispatches, and config-variant ablations that zero out one stage at a time
(the params are structure-compatible across all variants, so one init serves
them all).

Usage: python exp/eval_profile.py [--hw 512] [--scene basic|unbounded]
"""

import argparse
import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn())
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--scene", default="basic")
    ap.add_argument("--scenes-root", type=Path, default=Path("/tmp/gate_scenes"))
    args = ap.parse_args()

    scene_dir = args.scenes_root / args.scene
    if not (scene_dir / "transforms.json").exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(Path(__file__).parent.parent / "tools/make_synthetic_dataset.py"),
             str(scene_dir), "--hw", "200", "--n-train", "40", "--n-test", "8",
             "--scene", args.scene],
            check=True,
        )

    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import (
        NerfstudioDataParserConfig,
    )
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    config = get_method("nerfacto")
    config.dataparser = NerfstudioDataParserConfig(
        data=scene_dir, train_split_fraction=0.9, downscale_factor=1
    )
    config.data = scene_dir
    pipeline, state, config = build_pipeline(config, use_mesh=False)
    params, aux = state.params, state.aux
    dm = pipeline.datamanager

    hw = args.hw
    n_rays = hw * hw
    print(f"== eval attribution, {hw}x{hw} = {n_rays} rays, scene={args.scene} ==",
          flush=True)

    # rays: a contiguous pixel block of the (upscaled) eval camera — the real
    # render access pattern, not random train pixels
    cams = dm.eval_cameras
    c0 = jax.tree_util.tree_map(lambda x: x[:1] if x is not None else None, cams,
                                is_leaf=lambda x: x is None)
    scale = hw / float(np.asarray(cams.height).reshape(-1)[0])
    c0 = c0.rescale_output_resolution(scale)
    rb_full = c0.generate_rays(camera_indices=0).flatten()

    def chunk_rays(n):
        return jax.tree_util.tree_map(
            lambda x: x[:n] if x is not None else None, rb_full,
            is_leaf=lambda x: x is None)

    # --- 1. full shipped path ---
    for chunk in (16384,):
        pipeline._eval_chunk = None
        pipeline.render_camera(params, c0, 0, chunk_size=chunk, aux=aux)  # compile
        t0 = time.perf_counter()
        pipeline.render_camera(params, c0, 0, chunk_size=chunk, aux=aux)
        dt = time.perf_counter() - t0
        print(f"render_camera chunk={chunk:6d}: {dt*1e3:8.1f} ms "
              f"({n_rays/dt/1e3:8.1f}k rays/s)", flush=True)

    # --- 2. config-variant eval chunks (same params pytree) ---
    def model_for(cfg, train=False):
        return NerfactoModel(
            config=cfg,
            scene_aabb=pipeline.model_eval.scene_aabb,
            num_train_data=pipeline.model_eval.num_train_data,
            train=train,
        )

    base = config.model
    variants = {
        "eval default": (base, False, True),
        "eval no-occ-probes": (base, False, None),  # aux=None -> uniform probe wts
        "eval field-block-stoch": (
            dataclasses_replace(base, eval_exact_trilerp=False), False, True),
        "eval nerf-samp-8": (
            dataclasses_replace(base, num_nerf_samples_per_ray=8), False, True),
        "eval prop-samp-16": (
            dataclasses_replace(base, num_proposal_samples_per_ray=(256, 16)),
            False, True),
        "eval probes-32": (
            dataclasses_replace(base, occ_num_probes=32), False, True),
        "eval no-prop-round": (
            dataclasses_replace(base, num_proposal_iterations=0), False, True),
        "train fwd (ref)": (base, True, True),
    }
    for chunk in (16384, 65536):
        rb = chunk_rays(chunk)
        print(f"-- chunk n={chunk} --", flush=True)
        for name, (cfg, train, use_aux) in variants.items():
            m = model_for(cfg, train=train)
            a = aux if use_aux else None

            @jax.jit
            def run(params, rb, a=a, m=m, train=train):
                out = m.apply(params, rb,
                              key=jax.random.PRNGKey(0) if train else None,
                              model_aux=a)
                return out["rgb"]

            try:
                dt = timeit(lambda: run(params, rb))
                print(f"  {name:26s}: {dt*1e3:8.1f} ms ({chunk/dt/1e3:8.1f}k rays/s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:26s}: FAILED {type(e).__name__}: {e}", flush=True)


def dataclasses_replace(cfg, **kw):
    import dataclasses as dc

    return dc.replace(copy.deepcopy(cfg), **kw)


if __name__ == "__main__":
    main()
