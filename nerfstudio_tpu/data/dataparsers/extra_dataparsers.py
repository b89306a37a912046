"""Additional dataparsers (reference: nerfstudio/data/dataparsers/*):
instant-ngp (228 LoC), minimal (105), dnerf (110), phototourism (182),
sdfstudio (157). Each reads its capture format host-side into
DataparserOutputs."""

from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Literal, Optional

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras import camera_utils
from nerfstudio_tpu.cameras.cameras import Cameras, CameraType
from nerfstudio_tpu.data.dataparsers.base_dataparser import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)
from nerfstudio_tpu.data.scene_box import SceneBox


# ---------------------------------------------------------------------------
# instant-ngp format (transforms.json with aabb_scale + per-frame intrinsics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class InstantNGPDataParserConfig(DataParserConfig):
    data: Path = Path()
    scene_scale: float = 0.3333

    def setup(self):
        return InstantNGP(config=self)


@dataclasses.dataclass
class InstantNGP(DataParser):
    config: InstantNGPDataParserConfig

    def _generate_dataparser_outputs(self, split="train", **kwargs) -> DataparserOutputs:
        data = Path(self.config.data)
        meta_path = data / "transforms.json" if data.is_dir() else data
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)
        data_dir = meta_path.parent

        image_filenames, poses = [], []
        for frame in meta["frames"]:
            fname = data_dir / frame["file_path"]
            if not fname.suffix:
                fname = fname.with_suffix(".png")
            image_filenames.append(fname)
            poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
        poses = np.stack(poses)[:, :3]

        h = int(meta.get("h", 1080))
        w = int(meta.get("w", 1920))
        if "fl_x" in meta:
            fl_x = float(meta["fl_x"])
            fl_y = float(meta.get("fl_y", fl_x))
        else:
            fl_x = 0.5 * w / math.tan(0.5 * float(meta["camera_angle_x"]))
            fl_y = (
                0.5 * h / math.tan(0.5 * float(meta["camera_angle_y"]))
                if "camera_angle_y" in meta
                else fl_x
            )
        distort = camera_utils.get_distortion_params(
            k1=float(meta.get("k1", 0)), k2=float(meta.get("k2", 0)),
            p1=float(meta.get("p1", 0)), p2=float(meta.get("p2", 0)),
        )
        aabb_scale = float(meta.get("aabb_scale", 1))
        # ngp poses are offset by 0.5 center
        poses[:, :3, 3] = (poses[:, :3, 3] - 0.5) * self.config.scene_scale
        scene_box = SceneBox(
            aabb=jnp.array([[-1, -1, -1], [1, 1, 1]], dtype=jnp.float32) * aabb_scale * self.config.scene_scale
        )
        cameras = Cameras(
            camera_to_worlds=poses,
            fx=fl_x, fy=fl_y,
            cx=float(meta.get("cx", w / 2)), cy=float(meta.get("cy", h / 2)),
            width=w, height=h,
            distortion_params=np.tile(distort, (len(poses), 1)),
        )
        return DataparserOutputs(
            image_filenames=image_filenames, cameras=cameras, scene_box=scene_box,
            dataparser_scale=self.config.scene_scale,
        )


# ---------------------------------------------------------------------------
# minimal (npz dump of a previous DataparserOutputs — for tests/benchmarks)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MinimalDataParserConfig(DataParserConfig):
    data: Path = Path()

    def setup(self):
        return Minimal(config=self)


@dataclasses.dataclass
class Minimal(DataParser):
    config: MinimalDataParserConfig

    def _generate_dataparser_outputs(self, split="train", **kwargs) -> DataparserOutputs:
        path = Path(self.config.data) / f"{split}.npz"
        d = np.load(path, allow_pickle=True)
        cameras = Cameras(
            camera_to_worlds=d["camera_to_worlds"].astype(np.float32),
            fx=d["fx"].astype(np.float32),
            fy=d["fy"].astype(np.float32),
            cx=d["cx"].astype(np.float32),
            cy=d["cy"].astype(np.float32),
            width=d["width"].astype(np.int32),
            height=d["height"].astype(np.int32),
        )
        aabb = d["aabb"] if "aabb" in d else np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        return DataparserOutputs(
            image_filenames=[Path(p) for p in d["image_filenames"]],
            cameras=cameras,
            scene_box=SceneBox(aabb=jnp.asarray(aabb, dtype=jnp.float32)),
        )


# ---------------------------------------------------------------------------
# dnerf (blender + per-frame time)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DNeRFDataParserConfig(DataParserConfig):
    data: Path = Path()
    scale_factor: float = 1.0
    alpha_color: str = "white"

    def setup(self):
        return DNeRF(config=self)


@dataclasses.dataclass
class DNeRF(DataParser):
    config: DNeRFDataParserConfig

    def _generate_dataparser_outputs(self, split="train", **kwargs) -> DataparserOutputs:
        from nerfstudio_tpu.utils.colors import get_color

        data_dir = Path(self.config.data)
        with open(data_dir / f"transforms_{split}.json", encoding="utf-8") as f:
            meta = json.load(f)
        image_filenames, poses, times = [], [], []
        for frame in meta["frames"]:
            fname = data_dir / Path(frame["file_path"].replace("./", "") + ".png")
            image_filenames.append(fname)
            poses.append(np.array(frame["transform_matrix"], dtype=np.float32))
            times.append(float(frame.get("time", 0.0)))
        poses = np.stack(poses)
        from PIL import Image

        with Image.open(image_filenames[0]) as im:
            w, h = im.size
        focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
        poses[:, :3, 3] *= self.config.scale_factor
        cameras = Cameras(
            camera_to_worlds=poses[:, :3],
            fx=focal, fy=focal, cx=w / 2, cy=h / 2, width=w, height=h,
            times=np.asarray(times, np.float32),
        )
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            alpha_color=get_color(self.config.alpha_color),
            scene_box=SceneBox(aabb=jnp.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])),
            dataparser_scale=self.config.scale_factor,
        )


# ---------------------------------------------------------------------------
# phototourism (colmap reconstruction of landmark photo collections)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PhototourismDataParserConfig(DataParserConfig):
    data: Path = Path()
    scale_factor: float = 3.0
    alpha_color: Optional[str] = None
    train_split_fraction: float = 0.9
    scene_scale: float = 1.0
    orientation_method: Literal["pca", "up", "vertical", "none"] = "up"
    center_method: Literal["poses", "focus", "none"] = "poses"
    auto_scale_poses: bool = True

    def setup(self):
        return Phototourism(config=self)


@dataclasses.dataclass
class Phototourism(DataParser):
    config: PhototourismDataParserConfig

    def _generate_dataparser_outputs(self, split="train", **kwargs) -> DataparserOutputs:
        from nerfstudio_tpu.data.dataparsers.colmap_dataparser import (
            ColmapDataParser,
            ColmapDataParserConfig,
        )

        inner = ColmapDataParserConfig(
            data=self.config.data,
            colmap_path=Path("dense/sparse"),
            images_path=Path("dense/images"),
            orientation_method=self.config.orientation_method,
            center_method=self.config.center_method,
            auto_scale_poses=self.config.auto_scale_poses,
            train_split_fraction=self.config.train_split_fraction,
            eval_mode="fraction",
        ).setup()
        return inner.get_dataparser_outputs(split)


# ---------------------------------------------------------------------------
# sdfstudio format (meta_data.json with frames + intrinsics + mono priors)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SDFStudioDataParserConfig(DataParserConfig):
    data: Path = Path()
    include_mono_prior: bool = False

    def setup(self):
        return SDFStudio(config=self)


@dataclasses.dataclass
class SDFStudio(DataParser):
    config: SDFStudioDataParserConfig

    def _generate_dataparser_outputs(self, split="train", **kwargs) -> DataparserOutputs:
        data_dir = Path(self.config.data)
        with open(data_dir / "meta_data.json", encoding="utf-8") as f:
            meta = json.load(f)
        indices = list(range(len(meta["frames"])))
        image_filenames, poses, fx, fy, cx, cy = [], [], [], [], [], []
        depth_filenames, normal_filenames = [], []
        for i in indices:
            frame = meta["frames"][i]
            image_filenames.append(data_dir / frame["rgb_path"])
            c2w = np.array(frame["camtoworld"], dtype=np.float32)
            K = np.array(frame["intrinsics"], dtype=np.float32)
            poses.append(c2w)
            fx.append(K[0, 0])
            fy.append(K[1, 1])
            cx.append(K[0, 2])
            cy.append(K[1, 2])
            if self.config.include_mono_prior:
                depth_filenames.append(data_dir / frame["mono_depth_path"])
                normal_filenames.append(data_dir / frame["mono_normal_path"])
        poses = np.stack(poses)
        # sdfstudio stores OpenCV convention; convert to OpenGL
        poses[:, 0:3, 1:3] *= -1
        h = int(meta["height"])
        w = int(meta["width"])
        cameras = Cameras(
            camera_to_worlds=poses[:, :3],
            fx=np.asarray(fx), fy=np.asarray(fy),
            cx=np.asarray(cx), cy=np.asarray(cy), width=w, height=h,
        )
        bbox = np.array(meta.get("scene_box", {}).get("aabb", [[-1, -1, -1], [1, 1, 1]]))
        return DataparserOutputs(
            image_filenames=image_filenames,
            cameras=cameras,
            scene_box=SceneBox(aabb=jnp.asarray(bbox, dtype=jnp.float32)),
            metadata={
                "depth_filenames": depth_filenames or None,
                "normal_filenames": normal_filenames or None,
            },
        )
