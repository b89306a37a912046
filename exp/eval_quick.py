"""Quick end-to-end eval timing after a change (single-tenant, readback-synced).

python exp/eval_quick.py [--hw 512] [--chunks 16384 65536] [--scene basic]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--chunks", type=int, nargs="+", default=[16384, 65536])
    ap.add_argument("--scene", default="basic")
    ap.add_argument("--preview", action="store_true",
                    help="stochastic-trilerp eval (viewer preview mode)")
    ap.add_argument("--scenes-root", type=Path, default=Path("/tmp/gate_scenes"))
    args = ap.parse_args()

    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import (
        NerfstudioDataParserConfig,
    )
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    config = get_method("nerfacto")
    config.dataparser = NerfstudioDataParserConfig(
        data=args.scenes_root / args.scene, train_split_fraction=0.9,
        downscale_factor=1,
    )
    config.data = args.scenes_root / args.scene
    if args.preview:
        config.model.eval_exact_trilerp = False
    pipeline, state, config = build_pipeline(config, use_mesh=False)
    params, aux = state.params, state.aux

    cams = pipeline.datamanager.eval_cameras
    c0 = jax.tree_util.tree_map(lambda x: x[:1] if x is not None else None, cams,
                                is_leaf=lambda x: x is None)
    c0 = c0.rescale_output_resolution(
        args.hw / float(np.asarray(cams.height).reshape(-1)[0]))
    n_rays = args.hw * args.hw
    mode = "preview" if args.preview else "exact"

    for chunk in args.chunks:
        pipeline._eval_chunk = None
        pipeline.render_camera(params, c0, 0, chunk_size=chunk, aux=aux)  # compile
        t0 = time.perf_counter()
        pipeline.render_camera(params, c0, 0, chunk_size=chunk, aux=aux)
        dt = time.perf_counter() - t0
        print(f"render {args.hw}^2 {mode} chunk={chunk:6d}: {dt*1e3:8.1f} ms "
              f"({n_rays/dt/1e3:8.1f}k rays/s)", flush=True)


if __name__ == "__main__":
    main()
