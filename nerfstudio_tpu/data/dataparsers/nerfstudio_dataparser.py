"""Nerfstudio-format (transforms.json) dataparser (reference:
nerfstudio/data/dataparsers/nerfstudio_dataparser.py, 491 LoC).

Handles global or per-frame intrinsics, OpenCV distortion, mask/depth paths,
auto orient+center ("up"), auto pose scaling, fractional train/eval split,
downscale factors, and COLMAP/ply 3D seed points for splatfacto."""

from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Literal, Optional, Type

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras import camera_utils
from nerfstudio_tpu.cameras.cameras import CAMERA_MODEL_TO_TYPE, Cameras, CameraType
from nerfstudio_tpu.data.dataparsers.base_dataparser import (
    DataParser,
    DataParserConfig,
    DataparserOutputs,
)
from nerfstudio_tpu.data.scene_box import SceneBox

MAX_AUTO_RESOLUTION = 1600


@dataclasses.dataclass
class NerfstudioDataParserConfig(DataParserConfig):
    data: Path = Path()
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: Literal["pca", "up", "vertical", "none"] = "up"
    center_method: Literal["poses", "focus", "none"] = "poses"
    auto_scale_poses: bool = True
    eval_mode: Literal["fraction", "filename", "interval", "all"] = "fraction"
    train_split_fraction: float = 0.9
    eval_interval: int = 8
    depth_unit_scale_factor: float = 1e-3
    load_3D_points: bool = False

    def setup(self) -> "Nerfstudio":
        return Nerfstudio(config=self)


@dataclasses.dataclass
class Nerfstudio(DataParser):
    config: NerfstudioDataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        cfg = self.config
        data = Path(cfg.data)
        meta_path = data / "transforms.json" if data.is_dir() else data
        data_dir = meta_path.parent
        with open(meta_path, encoding="utf-8") as f:
            meta = json.load(f)

        image_filenames, mask_filenames, depth_filenames = [], [], []
        semantic_filenames = []
        poses = []
        fx, fy, cx, cy, height, width, distort = [], [], [], [], [], [], []

        fx_fixed = "fl_x" in meta
        fy_fixed = "fl_y" in meta
        cx_fixed = "cx" in meta
        cy_fixed = "cy" in meta
        h_fixed = "h" in meta
        w_fixed = "w" in meta
        distort_fixed = any(k in meta for k in ("k1", "k2", "k3", "p1", "p2", "distortion_params"))

        def get_distort(src) -> np.ndarray:
            if "distortion_params" in src:
                return np.asarray(src["distortion_params"], dtype=np.float32)
            return camera_utils.get_distortion_params(
                k1=float(src.get("k1", 0)),
                k2=float(src.get("k2", 0)),
                k3=float(src.get("k3", 0)),
                k4=float(src.get("k4", 0)),
                p1=float(src.get("p1", 0)),
                p2=float(src.get("p2", 0)),
            )

        frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])
        for frame in frames:
            fpath = data_dir / frame["file_path"]
            image_filenames.append(fpath)
            poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
            if not fx_fixed:
                fx.append(float(frame["fl_x"]))
            if not fy_fixed:
                fy.append(float(frame["fl_y"]))
            if not cx_fixed:
                cx.append(float(frame["cx"]))
            if not cy_fixed:
                cy.append(float(frame["cy"]))
            if not h_fixed:
                height.append(int(frame["h"]))
            if not w_fixed:
                width.append(int(frame["w"]))
            if not distort_fixed:
                distort.append(get_distort(frame))
            if "mask_path" in frame:
                mask_filenames.append(data_dir / frame["mask_path"])
            if "depth_file_path" in frame:
                depth_filenames.append(data_dir / frame["depth_file_path"])
            if "semantic_path" in frame:
                semantic_filenames.append(data_dir / frame["semantic_path"])

        assert len(mask_filenames) in (0, len(image_filenames))
        assert len(depth_filenames) in (0, len(image_filenames))
        assert len(semantic_filenames) in (0, len(image_filenames))

        # train/eval split (reference :175-230)
        num_images = len(image_filenames)
        idx = np.arange(num_images)
        if cfg.eval_mode == "fraction":
            num_train = math.ceil(num_images * cfg.train_split_fraction)
            train_idx = np.linspace(0, num_images - 1, num_train, dtype=np.int64)
            eval_idx = np.setdiff1d(idx, train_idx)
        elif cfg.eval_mode == "interval":
            eval_idx = idx[:: cfg.eval_interval]
            train_idx = np.setdiff1d(idx, eval_idx)
        elif cfg.eval_mode == "all":
            train_idx = eval_idx = idx
        else:
            raise NotImplementedError(cfg.eval_mode)
        if eval_idx.size == 0:
            # tiny captures: ceil(n * fraction) can swallow every image —
            # fall back to evaluating on the last frame rather than crashing
            eval_idx = idx[-1:]
        indices = train_idx if split == "train" else eval_idx

        poses = np.stack(poses, axis=0)
        # transforms.json stores OpenGL c2w (applied_transform already folded
        # into the poses at process-data time). The raw COLMAP/ply 3D points
        # are NOT pre-transformed, so the applied_transform must be composed
        # into the dataparser transform before mapping points/external
        # geometry into the pose frame (reference nerfstudio_dataparser.py:
        # applied_transform handling, incl. the implicit COLMAP default).
        applied = meta.get("applied_transform")
        if applied is None and (data_dir / "colmap" / "sparse" / "0").exists():
            applied = [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, -1, 0]]
        poses, transform_matrix = camera_utils.auto_orient_and_center_poses(
            poses, method=cfg.orientation_method, center_method=cfg.center_method
        )
        poses = poses[:, :3]
        if applied is not None:
            a44 = np.eye(4, dtype=np.float32)
            a44[:3] = np.asarray(applied, dtype=np.float32)[:3]
            t44 = np.eye(4, dtype=np.float32)
            t44[:3] = np.asarray(transform_matrix, dtype=np.float32)[:3]
            transform_matrix = (t44 @ a44)[:3]
        scale = 1.0
        if cfg.auto_scale_poses:
            scale = 1.0 / max(float(np.max(np.abs(poses[:, :3, 3]))), 1e-8)
        scale *= cfg.scale_factor
        poses[:, :3, 3] *= scale

        aabb_scale = cfg.scene_scale
        scene_box = SceneBox(
            aabb=jnp.array(
                [[-aabb_scale, -aabb_scale, -aabb_scale], [aabb_scale, aabb_scale, aabb_scale]]
            )
        )

        def pick(lst_or_scalar, key):
            if key in meta:
                return np.full(len(indices), float(meta[key]), dtype=np.float32)
            return np.asarray(lst_or_scalar, dtype=np.float32)[indices]

        fx_arr = pick(fx, "fl_x")
        fy_arr = pick(fy, "fl_y")
        cx_arr = pick(cx, "cx")
        cy_arr = pick(cy, "cy")
        if h_fixed:
            h_arr = np.full(len(indices), int(meta["h"]), dtype=np.int32)
            w_arr = np.full(len(indices), int(meta["w"]), dtype=np.int32)
        else:
            h_arr = np.asarray(height, dtype=np.int32)[indices]
            w_arr = np.asarray(width, dtype=np.int32)[indices]
        if distort_fixed:
            d_arr = np.tile(get_distort(meta), (len(indices), 1))
        elif distort:
            d_arr = np.stack(distort, axis=0)[indices]
        else:
            d_arr = None

        cam_type = CAMERA_MODEL_TO_TYPE.get(
            meta.get("camera_model", "OPENCV"), CameraType.PERSPECTIVE
        )

        df = cfg.downscale_factor
        if df is None:
            max_side = int(max(h_arr.max(), w_arr.max()))
            df = 1
            while max_side // (2 * df) > MAX_AUTO_RESOLUTION:
                df *= 2
        if df > 1:
            image_filenames = [
                data_dir / f"images_{df}" / Path(p).name
                if (data_dir / f"images_{df}" / Path(p).name).exists()
                else p
                for p in image_filenames
            ]
            fx_arr, fy_arr = fx_arr / df, fy_arr / df
            cx_arr, cy_arr = cx_arr / df, cy_arr / df
            h_arr, w_arr = h_arr // df, w_arr // df

        cameras = Cameras(
            camera_to_worlds=poses[indices],
            fx=fx_arr,
            fy=fy_arr,
            cx=cx_arr,
            cy=cy_arr,
            width=w_arr,
            height=h_arr,
            distortion_params=d_arr,
            camera_type=cam_type,
        )

        metadata = {
            "depth_filenames": [depth_filenames[i] for i in indices] if depth_filenames else None,
            "depth_unit_scale_factor": cfg.depth_unit_scale_factor,
        }
        if semantic_filenames:
            # per-frame "semantic_path" label maps (repo extension of the
            # transforms.json format; the reference carries semantics via the
            # sitcoms3d parser only — base_dataparser.py:34-47 Semantics)
            from nerfstudio_tpu.data.dataparsers.base_dataparser import Semantics

            classes = list(meta.get("semantic_classes", []))
            if not classes:
                classes = [f"class_{i}" for i in range(256)]
            rng = np.random.default_rng(0)
            metadata["semantics"] = Semantics(
                filenames=[semantic_filenames[i] for i in indices],
                classes=classes,
                colors=rng.uniform(size=(len(classes), 3)).astype(np.float32),
            )
        if cfg.load_3D_points:
            ply_path = meta.get("ply_file_path")
            if ply_path is not None and (data_dir / ply_path).exists():
                from nerfstudio_tpu.exporter.ply_io import read_ply

                pts, rgb = read_ply(data_dir / ply_path)
                pts_h = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=-1)
                pts = (transform_matrix @ pts_h[..., None])[..., 0] * scale
                metadata["points3D_xyz"] = jnp.asarray(pts, dtype=jnp.float32)
                metadata["points3D_rgb"] = jnp.asarray(rgb) if rgb is not None else None

        return DataparserOutputs(
            image_filenames=[image_filenames[i] for i in indices],
            cameras=cameras,
            scene_box=scene_box,
            mask_filenames=[mask_filenames[i] for i in indices] if mask_filenames else None,
            dataparser_transform=np.asarray(transform_matrix, dtype=np.float32)[:3],
            dataparser_scale=scale,
            metadata=metadata,
        )
