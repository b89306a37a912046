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
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    write_splat_ply(state.params, np.asarray(state.aux.alive), output_dir / "splat.ply")


def write_splat_ply(params, alive: np.ndarray, out_path: Path) -> None:
    """Write live gaussians in the standard 3DGS PLY layout."""
    from nerfstudio_tpu.exporter.ply_io import write_ply

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
    write_ply(Path(out_path), n, fields)
    print(f"exported {n} gaussians to {out_path}")


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


def export_tsdf(run_dir: Path, output_dir: Path, resolution: int = 128, num_views: int = 40) -> None:
    """TSDF fusion of rendered train-view depths -> colored mesh
    (reference exporter.py tsdf subcommand)."""
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.exporter.tsdf_utils import export_tsdf_mesh
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    verts, faces, colors = export_tsdf_mesh(
        pipeline, state, output_dir, resolution=resolution, num_views=num_views
    )
    fields = {
        "x": verts[:, 0].astype(np.float32),
        "y": verts[:, 1].astype(np.float32),
        "z": verts[:, 2].astype(np.float32),
    }
    if colors is not None:
        for i, c in enumerate("red green blue".split()):
            fields[c] = np.clip(colors[:, i] * 255, 0, 255).astype(np.uint8)
    write_ply(output_dir / "tsdf_mesh.ply", len(verts), fields)
    if faces is not None:
        np.save(output_dir / "tsdf_faces.npy", faces)
    print(f"exported TSDF mesh: {len(verts)} vertices")


def export_poisson(run_dir: Path, output_dir: Path, num_points: int = 500000, resolution: int = 128) -> None:
    """Poisson reconstruction from a rendered point cloud with normals
    (reference exporter.py poisson subcommand; FFT-grid formulation)."""
    from nerfstudio_tpu.exporter.exporter_utils import generate_point_cloud
    from nerfstudio_tpu.exporter.poisson import export_poisson_mesh
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    pts, rgb, normals = generate_point_cloud(
        pipeline, state, num_points=num_points, return_normals=True
    )
    verts, faces = export_poisson_mesh(pts, normals, resolution=resolution)
    write_ply(
        output_dir / "poisson_mesh.ply",
        len(verts),
        {
            "x": verts[:, 0].astype(np.float32),
            "y": verts[:, 1].astype(np.float32),
            "z": verts[:, 2].astype(np.float32),
        },
    )
    if faces is not None:
        np.save(output_dir / "poisson_faces.npy", faces)
    print(f"exported poisson mesh: {len(verts)} vertices")


def export_texture_mesh(run_dir: Path, output_dir: Path, resolution: int = 128) -> None:
    """Marching-cubes mesh + baked texture OBJ/MTL/PNG
    (reference texture_utils.export_textured_mesh)."""
    from nerfstudio_tpu.exporter.marching_cubes import evaluate_grid, marching_cubes
    from nerfstudio_tpu.exporter.texture_utils import export_textured_mesh
    from nerfstudio_tpu.utils.eval_utils import eval_setup

    import jax.numpy as jnp

    config, pipeline, state = eval_setup(run_dir)
    model = pipeline.model_eval
    params = state.params

    def density(pos):
        return model.apply(params, pos, method=lambda m, p: m.field.density_fn(p))

    vol = evaluate_grid(density, resolution=resolution)
    verts, faces = marching_cubes(vol, level=max(float(vol.mean()), 1.0))
    if faces is None:
        raise SystemExit("marching cubes unavailable (needs skimage); cannot bake")

    def query_rgb(points):
        # radiance toward a fixed viewing direction (reference bakes along
        # per-face normals; a fixed dir is the field's view-avg approximation)
        from nerfstudio_tpu.core.rays import RayBundle

        n = points.shape[0]
        rb = RayBundle(
            origins=jnp.asarray(points, jnp.float32),
            directions=jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, -1.0]), (n, 3)
            ),
            pixel_area=jnp.ones((n, 1)) * 1e-6,
            nears=jnp.zeros((n, 1)),
            fars=jnp.full((n, 1), 1e-3),
        )
        out = model.apply(params, rb, key=None, model_aux=state.aux)
        return np.asarray(out["rgb"])

    export_textured_mesh(verts, faces, query_rgb, output_dir, name="textured_mesh")
    print(f"exported textured mesh: {len(verts)} verts, {len(faces)} faces")


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: nst-export {pointcloud,gaussian-splat,cameras,marching-cubes,"
            "tsdf,poisson,texture-mesh} --load-config RUN_DIR --output-dir DIR"
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
    elif mode == "tsdf":
        export_tsdf(
            run_dir, output_dir,
            int(args.get("--resolution", "128")), int(args.get("--num-views", "40")),
        )
    elif mode == "poisson":
        export_poisson(
            run_dir, output_dir,
            int(args.get("--num-points", "500000")), int(args.get("--resolution", "128")),
        )
    elif mode == "texture-mesh":
        export_texture_mesh(run_dir, output_dir, int(args.get("--resolution", "128")))
    else:
        raise SystemExit(f"unknown export mode {mode}")


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
