"""End-to-end drive of the user-facing CLI surfaces: nst-train produces a
run dir; nst-eval consumes it and writes metrics JSON; nst-render renders an
interpolated path from it. (Reference surface contract:
nerfstudio/scripts/train.py, eval.py:33-62, render.py:368-926 — exercised
here in-process via each script's ``main(argv)``.)"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from fixtures import make_nerfstudio_fixture  # noqa: E402


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    data = tmp_path_factory.mktemp("cli_data")
    make_nerfstudio_fixture(data, hw=24)
    out = tmp_path_factory.mktemp("cli_out")
    from nerfstudio_tpu.scripts.train import main as train_main

    train_main([
        "instant-ngp", "--data", str(data),
        "--trainer.output_dir", str(out),
        "--trainer.max_num_iterations", "4",
        "--trainer.steps_per_save", "4",
        "--trainer.steps_per_eval_image", "0",
        "--trainer.vis", "none",
        "--trainer.timestamp", "clirun",
        "--datamanager.train_num_rays_per_batch", "64",
        "--model.log2_hashmap_size", "9",
        "--model.max_res", "64",
        "--model.grid_resolution", "32",
        "--model.eval_num_rays_per_chunk", "256",
    ])
    runs = list(out.glob("*/instant-ngp/clirun"))
    assert runs, f"train CLI produced no run dir under {out}"
    return runs[0]


def test_train_cli_writes_config_and_checkpoint(run_dir):
    assert (run_dir / "config.yml").exists()
    ckpts = list((run_dir / "nerfstudio_models").glob("*"))
    assert ckpts, "no checkpoint written at steps_per_save"


def test_eval_cli_from_run_dir(run_dir, tmp_path):
    from nerfstudio_tpu.scripts.eval import main as eval_main

    out = tmp_path / "eval.json"
    eval_main([str(run_dir), "--output-path", str(out)])
    res = json.loads(out.read_text())
    assert res["method_name"] == "instant-ngp"
    assert "psnr" in res["results"] and res["results"]["psnr"] > 0


def test_export_cli_cameras_and_pointcloud(run_dir, tmp_path):
    from nerfstudio_tpu.scripts.exporter import main as export_main

    out = tmp_path / "exports"
    export_main(["cameras", "--load-config", str(run_dir),
                 "--output-dir", str(out)])
    export_main(["pointcloud", "--load-config", str(run_dir),
                 "--output-dir", str(out), "--num-points", "2000"])
    files = {f.name for f in out.glob("*")}
    assert any("camera" in n or n.endswith(".json") for n in files), files
    assert any(n.endswith(".ply") for n in files), files


def test_render_cli_interpolate(run_dir, tmp_path):
    from nerfstudio_tpu.scripts.render import main as render_main

    out = tmp_path / "frames"
    render_main([
        "interpolate", "--load-config", str(run_dir),
        "--steps", "2", "--output-path", str(out),
    ])
    frames = list(out.glob("*.png"))
    assert len(frames) >= 2, f"render wrote {len(frames)} frames"
