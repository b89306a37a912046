"""Blender synthetic dataset parser (reference:
nerfstudio/data/dataparsers/blender_dataparser.py, 129 LoC).

Reads transforms_{split}.json (camera_angle_x + per-frame c2w), scene box
[-1.5, 1.5]^3, optional alpha color."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Type

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras.cameras import Cameras, CameraType
from nerfstudio_tpu.data.dataparsers.base_dataparser import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)
from nerfstudio_tpu.data.scene_box import SceneBox
from nerfstudio_tpu.utils.colors import get_color


@dataclasses.dataclass
class BlenderDataParserConfig(DataParserConfig):
    data: Path = Path("data/blender/lego")
    scale_factor: float = 1.0
    alpha_color: Optional[str] = "white"
    ply_path: Optional[Path] = None

    _target: Type = dataclasses.field(default_factory=lambda: Blender)

    def setup(self) -> "Blender":
        return Blender(config=self)


@dataclasses.dataclass
class Blender(DataParser):
    config: BlenderDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        data_dir = Path(self.config.data)
        with open(data_dir / f"transforms_{split}.json", encoding="utf-8") as f:
            meta = json.load(f)

        image_filenames = []
        poses = []
        for frame in meta["frames"]:
            fname = data_dir / Path(frame["file_path"].replace("./", "") + ".png")
            if not fname.exists():
                fname = data_dir / Path(frame["file_path"].replace("./", ""))
            image_filenames.append(fname)
            poses.append(np.array(frame["transform_matrix"], dtype=np.float32))
        poses = np.stack(poses, axis=0)

        # read first image for H/W
        from PIL import Image

        with Image.open(image_filenames[0]) as im:
            image_width, image_height = im.size

        camera_angle_x = float(meta["camera_angle_x"])
        focal_length = 0.5 * image_width / np.tan(0.5 * camera_angle_x)
        cx = image_width / 2.0
        cy = image_height / 2.0

        poses[:, :3, 3] *= self.config.scale_factor
        camera_to_world = poses[:, :3]

        scene_box = SceneBox(aabb=jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]]))
        cameras = Cameras(
            camera_to_worlds=camera_to_world,
            fx=focal_length,
            fy=focal_length,
            cx=cx,
            cy=cy,
            width=image_width,
            height=image_height,
            camera_type=CameraType.PERSPECTIVE,
        )

        alpha_color = (
            get_color(self.config.alpha_color) if self.config.alpha_color is not None else None
        )

        metadata = {}
        ply_path = self.config.ply_path
        if ply_path is None and (data_dir / "points3D.ply").exists():
            # auto-pick seed points written next to transforms.json (e.g. by
            # tools/make_synthetic_dataset.py) so splatfacto seeds from them
            ply_path = data_dir / "points3D.ply"
        if ply_path is not None:
            metadata.update(_load_3D_points(Path(ply_path), 1.0))

        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            alpha_color=alpha_color,
            scene_box=scene_box,
            dataparser_scale=self.config.scale_factor,
            metadata=metadata,
        )


def _load_3D_points(ply_path: Path, scale: float) -> dict:
    """Minimal ASCII/binary PLY xyz+rgb loader for seed points."""
    from nerfstudio_tpu.exporter.ply_io import read_ply

    pts, colors = read_ply(ply_path)
    return {
        "points3D_xyz": jnp.asarray(pts * scale, dtype=jnp.float32),
        "points3D_rgb": jnp.asarray(colors, dtype=jnp.uint8) if colors is not None else None,
    }
