"""COLMAP dataparser (reference: nerfstudio/data/dataparsers/colmap_dataparser.py, 709 LoC).

Reads a COLMAP sparse reconstruction (bin or text), converts w2c->OpenGL c2w,
auto-orients/centers/scales, splits train/eval, loads 3D seed points."""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Literal, Optional

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras import camera_utils
from nerfstudio_tpu.cameras.cameras import CAMERA_MODEL_TO_TYPE, Cameras, CameraType
from nerfstudio_tpu.data.dataparsers.base_dataparser import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)
from nerfstudio_tpu.data.dataparsers.colmap_parsing_utils import qvec2rotmat, read_model
from nerfstudio_tpu.data.scene_box import SceneBox


@dataclasses.dataclass
class ColmapDataParserConfig(DataParserConfig):
    data: Path = Path()
    colmap_path: Path = Path("colmap/sparse/0")
    images_path: Path = Path("images")
    masks_path: Optional[Path] = None
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: Literal["pca", "up", "vertical", "none"] = "up"
    center_method: Literal["poses", "focus", "none"] = "poses"
    auto_scale_poses: bool = True
    train_split_fraction: float = 0.9
    eval_mode: Literal["fraction", "interval", "all"] = "interval"
    eval_interval: int = 8
    load_3D_points: bool = True
    max_2D_matches_per_3D_point: int = 0

    def setup(self) -> "ColmapDataParser":
        return ColmapDataParser(config=self)


@dataclasses.dataclass
class ColmapDataParser(DataParser):
    config: ColmapDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        cfg = self.config
        data_dir = Path(cfg.data)
        cameras_raw, images_raw, (pts_xyz, pts_rgb, pts_err) = read_model(
            data_dir / cfg.colmap_path
        )

        image_filenames = []
        poses = []
        fx, fy, cx, cy, h, w, distort = [], [], [], [], [], [], []
        cam_types = []
        for im in sorted(images_raw.values(), key=lambda im: im.name):
            cam = cameras_raw[im.camera_id]
            R = qvec2rotmat(im.qvec)
            t = im.tvec.reshape(3, 1)
            w2c = np.concatenate([np.concatenate([R, t], 1), [[0, 0, 0, 1]]], 0)
            c2w = np.linalg.inv(w2c)
            # COLMAP (OpenCV) -> OpenGL: flip y and z axes of the rotation
            c2w[0:3, 1:3] *= -1
            poses.append(c2w[:3].astype(np.float32))
            image_filenames.append(data_dir / cfg.images_path / im.name)

            params = cam.params
            if cam.model == "SIMPLE_PINHOLE":
                fxi = fyi = params[0]
                cxi, cyi = params[1], params[2]
                d = camera_utils.get_distortion_params()
            elif cam.model == "PINHOLE":
                fxi, fyi, cxi, cyi = params[:4]
                d = camera_utils.get_distortion_params()
            elif cam.model == "SIMPLE_RADIAL":
                fxi = fyi = params[0]
                cxi, cyi = params[1], params[2]
                d = camera_utils.get_distortion_params(k1=params[3])
            elif cam.model == "RADIAL":
                fxi = fyi = params[0]
                cxi, cyi = params[1], params[2]
                d = camera_utils.get_distortion_params(k1=params[3], k2=params[4])
            elif cam.model == "OPENCV":
                fxi, fyi, cxi, cyi = params[:4]
                d = camera_utils.get_distortion_params(
                    k1=params[4], k2=params[5], p1=params[6], p2=params[7]
                )
            elif cam.model == "OPENCV_FISHEYE":
                fxi, fyi, cxi, cyi = params[:4]
                d = camera_utils.get_distortion_params(
                    k1=params[4], k2=params[5], k3=params[6], k4=params[7]
                )
            else:
                raise NotImplementedError(f"camera model {cam.model}")
            fx.append(fxi)
            fy.append(fyi)
            cx.append(cxi)
            cy.append(cyi)
            h.append(cam.height)
            w.append(cam.width)
            distort.append(d)
            cam_types.append(
                CAMERA_MODEL_TO_TYPE.get(cam.model, CameraType.PERSPECTIVE).value
            )

        poses = np.stack(poses)
        poses, transform = camera_utils.auto_orient_and_center_poses(
            poses, method=cfg.orientation_method, center_method=cfg.center_method
        )
        poses = poses[:, :3]
        scale = 1.0
        if cfg.auto_scale_poses:
            scale = 1.0 / max(float(np.max(np.abs(poses[:, :3, 3]))), 1e-8)
        scale *= cfg.scale_factor
        poses[:, :3, 3] *= scale

        n = len(image_filenames)
        idx_all = np.arange(n)
        if cfg.eval_mode == "interval":
            eval_idx = idx_all[:: cfg.eval_interval]
            train_idx = np.setdiff1d(idx_all, eval_idx)
        elif cfg.eval_mode == "fraction":
            import math

            num_train = math.ceil(n * cfg.train_split_fraction)
            train_idx = np.linspace(0, n - 1, num_train, dtype=np.int64)
            eval_idx = np.setdiff1d(idx_all, train_idx)
        else:
            train_idx = eval_idx = idx_all
        indices = train_idx if split == "train" else eval_idx

        df = cfg.downscale_factor or 1
        cameras = Cameras(
            camera_to_worlds=poses[indices],
            fx=np.asarray(fx, np.float32)[indices] / df,
            fy=np.asarray(fy, np.float32)[indices] / df,
            cx=np.asarray(cx, np.float32)[indices] / df,
            cy=np.asarray(cy, np.float32)[indices] / df,
            width=np.asarray(w, np.int32)[indices] // df,
            height=np.asarray(h, np.int32)[indices] // df,
            distortion_params=np.stack(distort)[indices],
            camera_type=np.asarray(cam_types, np.int32)[indices],
        )

        ss = cfg.scene_scale
        scene_box = SceneBox(aabb=jnp.array([[-ss, -ss, -ss], [ss, ss, ss]]))

        metadata = {}
        if cfg.load_3D_points and len(pts_xyz):
            pts_h = np.concatenate([pts_xyz, np.ones_like(pts_xyz[:, :1])], axis=-1)
            pts_w = (transform @ pts_h[..., None])[..., 0] * scale
            metadata["points3D_xyz"] = jnp.asarray(pts_w, dtype=jnp.float32)
            metadata["points3D_rgb"] = jnp.asarray(pts_rgb)
            metadata["points3D_error"] = jnp.asarray(pts_err, dtype=jnp.float32)

        return DataparserOutputs(
            image_filenames=[image_filenames[i] for i in indices],
            cameras=cameras,
            scene_box=scene_box,
            dataparser_transform=np.asarray(transform, np.float32)[:3],
            dataparser_scale=scale,
            metadata=metadata,
        )
