"""nst-eval: compute average eval-image metrics -> JSON (reference:
nerfstudio/scripts/eval.py:33-62)."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: nst-eval RUN_DIR [--output-path out.json]")
        return
    run_dir = Path(argv[0])
    out_path = Path("eval.json")
    if "--output-path" in argv:
        out_path = Path(argv[argv.index("--output-path") + 1])

    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig

    if isinstance(config.model, SplatfactoModelConfig):
        import numpy as np

        metrics_list = []
        for i in range(len(pipeline.datamanager.eval_dataset)):
            m, _ = pipeline.get_eval_image_metrics(state, i)
            metrics_list.append(m)
        metrics = {
            k: float(np.mean([m[k] for m in metrics_list])) for k in metrics_list[0]
        }
    else:
        metrics = pipeline.get_average_eval_image_metrics(state)
    benchmark_info = {
        "experiment_name": config.trainer.experiment_name,
        "method_name": config.method_name,
        "checkpoint": str(run_dir),
        "results": metrics,
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(benchmark_info, indent=2), "utf8")
    print(json.dumps(metrics, indent=2))
    print(f"saved results to {out_path}")


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
