"""nst-render: render camera paths to video/images (reference:
nerfstudio/scripts/render.py:368-926 — camera-path / interpolated / spiral /
dataset subcommands)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def _write_frames(frames, output_path: Path, fps: int = 24):
    output_path.parent.mkdir(parents=True, exist_ok=True)
    try:
        import imageio.v2 as imageio

        if output_path.suffix in (".mp4", ".gif"):
            imageio.mimwrite(output_path, frames, fps=fps)
        else:
            output_path.mkdir(parents=True, exist_ok=True)
            for i, f in enumerate(frames):
                imageio.imwrite(output_path / f"{i:05d}.png", f)
    except Exception:
        output_path.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(f).save(output_path / f"{i:05d}.png")
    print(f"wrote {len(frames)} frames to {output_path}")


def _render_cameras(config, pipeline, state, cameras, rendered_output_names=("rgb",)):
    from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig
    from nerfstudio_tpu.utils.colormaps import apply_depth_colormap

    frames = []
    n = cameras.shape[0]
    for i in range(n):
        if isinstance(config.model, SplatfactoModelConfig):
            c2w = cameras.camera_to_worlds[i]
            out = pipeline.model.render(
                state.params, state.aux.alive, c2w,
                (
                    float(np.asarray(cameras.fx[i])[0]),
                    float(np.asarray(cameras.fy[i])[0]),
                    float(np.asarray(cameras.cx[i])[0]),
                    float(np.asarray(cameras.cy[i])[0]),
                ),
                int(np.asarray(cameras.width[i])[0]),
                int(np.asarray(cameras.height[i])[0]),
                sh_degree_active=config.model.sh_degree,
            )
        else:
            out = pipeline.render_camera(state.params, cameras, i, aux=state.aux)
        pieces = []
        for name in rendered_output_names:
            img = np.asarray(out[name])
            if name == "depth":
                img = np.asarray(
                    apply_depth_colormap(out["depth"], out.get("accumulation"))
                )
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            pieces.append(img)
        frame = np.concatenate(pieces, axis=1)
        frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
    return frames


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "usage: nst-render {camera-path,interpolate,spiral,dataset} "
            "--load-config RUN_DIR [--camera-path-filename PATH.json] "
            "[--output-path renders/out.mp4] [--rendered-output-names rgb,depth]"
        )
        return
    mode = argv[0]
    args = dict(zip(argv[1::2], argv[2::2]))
    run_dir = Path(args["--load-config"])
    output_path = Path(args.get("--output-path", "renders/output.mp4"))
    out_names = tuple(args.get("--rendered-output-names", "rgb").split(","))

    from nerfstudio_tpu.utils.eval_utils import eval_setup

    config, pipeline, state = eval_setup(run_dir)
    eval_cams = pipeline.datamanager.eval_cameras

    from nerfstudio_tpu.cameras import camera_paths

    if mode == "camera-path":
        with open(args["--camera-path-filename"], encoding="utf-8") as f:
            path_json = json.load(f)
        cameras = camera_paths.get_path_from_json(path_json)
    elif mode == "interpolate":
        cameras = camera_paths.get_interpolated_camera_path(
            pipeline.datamanager.train_cameras, steps=int(args.get("--steps", "10"))
        )
    elif mode == "spiral":
        cameras = camera_paths.get_spiral_path(
            eval_cams[0:1], steps=int(args.get("--steps", "30")), radius=0.1
        )
    elif mode == "dataset":
        cameras = eval_cams
    else:
        raise SystemExit(f"unknown mode {mode}")

    frames = _render_cameras(config, pipeline, state, cameras, out_names)
    _write_frames(frames, output_path, fps=int(args.get("--fps", "24")))


def entrypoint():
    main()


if __name__ == "__main__":
    entrypoint()
