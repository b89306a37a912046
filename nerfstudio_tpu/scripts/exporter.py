"""nst-export: pointcloud / gaussian-splat / cameras / marching-cubes / tsdf
(reference: nerfstudio/scripts/exporter.py:51-676).

The gaussian-splat PLY property layout matches the standard 3DGS format
(x y z nx ny nz f_dc_* f_rest_* opacity scale_* rot_*) so exports open in
any 3DGS viewer (reference exporter.py:501-556)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def export_pointcloud(run_dir: Path, output_dir: Path, num_points: int = 1000000) -> None:
    from nerfstudio_tpu.exporter.exporter_utils import generate_point_cloud
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    points, colors = generate_point_cloud(pipeline, state, num_points=num_points)
    n = len(points)
    fields = {
        "x": points[:, 0].astype(np.float32),
        "y": points[:, 1].astype(np.float32),
        "z": points[:, 2].astype(np.float32),
        "red": (colors[:, 0] * 255).astype(np.uint8),
        "green": (colors[:, 1] * 255).astype(np.uint8),
        "blue": (colors[:, 2] * 255).astype(np.uint8),
    }
    write_ply(output_dir / "point_cloud.ply", n, fields)
    print(f"exported {n} points to {output_dir / 'point_cloud.ply'}")


def export_gaussian_splat(run_dir: Path, output_dir: Path) -> None:
    """3DGS PLY export (reference exporter.py:501-556 format)."""
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    params = state.params
    alive = np.asarray(state.aux.alive)
    means = np.asarray(params["means"])[alive]
    scales = np.asarray(params["scales"])[alive]
    quats = np.asarray(params["quats"])[alive]
    f_dc = np.asarray(params["features_dc"])[alive]
    f_rest = np.asarray(params["features_rest"])[alive]
    opac = np.asarray(params["opacities"])[alive]
    n = len(means)
    fields = {
        "x": means[:, 0].astype(np.float32),
        "y": means[:, 1].astype(np.float32),
        "z": means[:, 2].astype(np.float32),
        "nx": np.zeros(n, np.float32),
        "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    for i in range(3):
        fields[f"f_dc_{i}"] = f_dc[:, i].astype(np.float32)
    rest = f_rest.transpose(0, 2, 1).reshape(n, -1)  # (n, 3*(K-1)) channel-major
    for i in range(rest.shape[1]):
        fields[f"f_rest_{i}"] = rest[:, i].astype(np.float32)
    fields["opacity"] = opac[:, 0].astype(np.float32)
    for i in range(3):
        fields[f"scale_{i}"] = scales[:, i].astype(np.float32)
    for i in range(4):
        fields[f"rot_{i}"] = quats[:, i].astype(np.float32)
    write_ply(output_dir / "splat.ply", n, fields)
    print(f"exported {n} gaussians to {output_dir / 'splat.ply'}")


def export_cameras(run_dir: Path, output_dir: Path) -> None:
    """(reference exporter.py cameras subcommand)"""
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    cams = pipeline.datamanager.train_cameras
    out = []
    for i in range(cams.shape[0]):
        out.append(cams.to_json(i))
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "cameras.json").write_text(json.dumps(out, indent=2), "utf8")
    print(f"exported {len(out)} cameras")


def export_marching_cubes(run_dir: Path, output_dir: Path, resolution: int = 256) -> None:
    from nerfstudio_tpu.exporter.marching_cubes import evaluate_grid, marching_cubes
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    model = pipeline.model_eval
    params = state.params

    def density(pos):
        return model.apply(params, pos, method=lambda m, p: m.field.density_fn(p))

    vol = evaluate_grid(density, resolution=resolution)
    verts, faces = marching_cubes(vol, level=max(float(vol.mean()), 1.0))
    n = len(verts)
    write_ply(
        output_dir / "mesh_points.ply",
        n,
        {
            "x": verts[:, 0].astype(np.float32),
            "y": verts[:, 1].astype(np.float32),
            "z": verts[:, 2].astype(np.float32),
        },
    )
    print(f"exported {n} surface vertices")


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: nst-export {pointcloud,gaussian-splat,cameras,marching-cubes} "
            "--load-config RUN_DIR --output-dir DIR"
        )
        return
    mode = argv[0]
    args = dict(zip(argv[1::2], argv[2::2]))
    run_dir = Path(args["--load-config"])
    output_dir = Path(args.get("--output-dir", "exports"))
    output_dir.mkdir(parents=True, exist_ok=True)
    if mode == "pointcloud":
        export_pointcloud(run_dir, output_dir, int(args.get("--num-points", "1000000")))
    elif mode == "gaussian-splat":
        export_gaussian_splat(run_dir, output_dir)
    elif mode == "cameras":
        export_cameras(run_dir, output_dir)
    elif mode == "marching-cubes":
        export_marching_cubes(run_dir, output_dir, int(args.get("--resolution", "256")))
    else:
        raise SystemExit(f"unknown export mode {mode}")


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
