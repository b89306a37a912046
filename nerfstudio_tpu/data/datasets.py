"""Datasets: image loading host-side (reference:
nerfstudio/data/datasets/base_dataset.py:39-187 and specialty variants).

Images load PIL -> numpy float32 [0,1]; alpha blended over the dataparser's
alpha_color; masks load as bool. ``load_all`` stacks the whole split into one
uint8 array — the device-cache datamanager feeds it straight into HBM."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from nerfstudio_tpu.data.dataparsers.base_dataparser import DataparserOutputs


class InputDataset:
    """(reference base_dataset.py:39-187)"""

    exclude_batch_keys_from_device: List[str] = ["image", "mask"]

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        self._dataparser_outputs = dataparser_outputs
        self.scale_factor = scale_factor
        self.scene_box = dataparser_outputs.scene_box
        self.metadata = dataparser_outputs.metadata
        self.cameras = dataparser_outputs.cameras
        if scale_factor != 1.0:
            self.cameras = self.cameras.rescale_output_resolution(scaling_factor=scale_factor)

    def __len__(self) -> int:
        return len(self._dataparser_outputs.image_filenames)

    @property
    def image_filenames(self):
        return self._dataparser_outputs.image_filenames

    def get_numpy_image(self, image_idx: int) -> np.ndarray:
        """uint8 HWC image, resized by scale_factor (reference :74-96)."""
        from PIL import Image

        path = self._dataparser_outputs.image_filenames[image_idx]
        pil = Image.open(path)
        if self.scale_factor != 1.0:
            w, h = pil.size
            pil = pil.resize(
                (int(w * self.scale_factor), int(h * self.scale_factor)), Image.BILINEAR
            )
        image = np.asarray(pil, dtype=np.uint8)
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        return image

    def get_image_float32(self, image_idx: int) -> np.ndarray:
        """float32 [0,1] RGB with alpha blending (reference :98-122)."""
        image = self.get_numpy_image(image_idx).astype(np.float32) / 255.0
        alpha_color = self._dataparser_outputs.alpha_color
        if image.shape[-1] == 4:
            if alpha_color is not None:
                image = image[..., :3] * image[..., 3:] + np.asarray(alpha_color) * (
                    1.0 - image[..., 3:]
                )
            else:
                image = image[..., :3] * image[..., 3:]
        return image

    def get_mask(self, image_idx: int) -> Optional[np.ndarray]:
        if self._dataparser_outputs.mask_filenames is None:
            return None
        from PIL import Image

        mask = np.asarray(Image.open(self._dataparser_outputs.mask_filenames[image_idx]))
        if mask.ndim == 3:
            mask = mask[..., 0]
        return (mask > 127)[..., None]

    def get_data(self, image_idx: int) -> Dict:
        data = {"image_idx": image_idx, "image": self.get_image_float32(image_idx)}
        mask = self.get_mask(image_idx)
        if mask is not None:
            data["mask"] = mask
        data.update(self.get_metadata(image_idx))
        return data

    def get_metadata(self, image_idx: int) -> Dict:
        return {}

    def __getitem__(self, image_idx: int) -> Dict:
        return self.get_data(image_idx)

    def _load_all_native(self) -> Optional[np.ndarray]:
        """Batch-decode the split with the C++ loader; None -> use PIL."""
        if self.scale_factor != 1.0:
            return None  # native path has no fractional resize
        files = list(self._dataparser_outputs.image_filenames)
        if not files or any(
            Path(f).suffix.lower() not in (".png", ".jpg", ".jpeg") for f in files
        ):
            return None
        try:
            from nerfstudio_tpu.native import decode_image_batch, native_loader

            mod = native_loader()
            if mod is None:
                return None
            h, w, c = mod.image_size(str(files[0]))
            # header-only size check: the C++ decoder box-downscales any
            # mismatched image into the target shape, which would silently
            # train variable-res captures with the wrong intrinsics — mixed
            # resolutions must route to load_all_bucketed() instead
            for f in files[1:]:
                if tuple(mod.image_size(str(f))) != (h, w, c):
                    return None
            return decode_image_batch(files, h, w, c)
        except Exception:  # noqa: BLE001 — any native failure falls back
            return None

    def load_all(self) -> Dict[str, np.ndarray]:
        """Stack the whole split: uint8 images (N,H,W,3|4) + optional masks.

        The TPU datamanager moves this once into HBM; per-step pixel
        sampling then happens on device (no host round-trips). Uses the
        native C++ thread-pool decoder (nerfstudio_tpu.native) when built —
        the host analog of the reference's ParallelDataManager workers —
        falling back to PIL."""
        stacked = self._load_all_native()
        if stacked is None:
            images = [self.get_numpy_image(i) for i in range(len(self))]
            shapes = {im.shape for im in images}
            if len(shapes) != 1:
                raise ValueError(
                    f"variable resolutions {shapes}: use load_all_bucketed() "
                    "(the datamanager does this automatically)"
                )
            stacked = np.stack(images, axis=0)
        out = {"images": stacked}
        if self._dataparser_outputs.mask_filenames is not None:
            out["masks"] = np.stack([self.get_mask(i) for i in range(len(self))], axis=0)
        return out

    def load_all_bucketed(self) -> List[Dict[str, np.ndarray]]:
        """Variable-resolution split as resolution buckets.

        The TPU answer to the reference's ``variable_res_collate``
        (reference data/utils/dataloaders.py:46): instead of Python lists of
        jagged tensors (which XLA cannot trace), images are grouped by exact
        (H, W, C) into dense uint8 stacks. Each bucket is one HBM-resident
        array with a bucket->original-camera index map; per-step pixel
        sampling draws a STATIC number of rays from every bucket
        (proportional to its pixel share) so the train step stays one fixed-
        shape XLA program.

        Returns a list of ``{"images": (B,H,W,C) uint8,
        "camera_indices": (B,) int32[, "masks": (B,H,W,1) bool,
        "depths": (B,H,W) f32]}``, largest bucket first. Masks/depths are
        included when the dataset carries them (mixed-res v2: per-bucket
        mask-valid sampling and depth supervision).
        """
        images = [self.get_numpy_image(i) for i in range(len(self))]
        has_masks = self._dataparser_outputs.mask_filenames is not None
        has_depth = getattr(self, "provides_depth", False) or getattr(
            self, "depth_filenames", None
        )
        buckets: Dict[tuple, List[int]] = {}
        for i, im in enumerate(images):
            buckets.setdefault(im.shape, []).append(i)
        out = []
        for shape, idxs in sorted(
            buckets.items(), key=lambda kv: -len(kv[1]) * kv[0][0] * kv[0][1]
        ):
            b = {
                "images": np.stack([images[i] for i in idxs], axis=0),
                "camera_indices": np.asarray(idxs, np.int32),
            }
            if has_masks:
                b["masks"] = np.stack([self.get_mask(i) for i in idxs], axis=0)
            if has_depth:
                b["depths"] = np.stack(
                    [self.get_metadata(i)["depth_image"] for i in idxs], axis=0
                ).astype(np.float32)
            out.append(b)
        return out


class DepthDataset(InputDataset):
    """Dataset with per-image depth maps (reference
    data/datasets/depth_dataset.py).

    When the capture ships no depth files, the reference generates dense
    pseudo-depth with a pretrained DPT transformer (reference
    depth_dataset.py:56-118) — unavailable offline. Here the fallback is
    *sparse SfM depth*: the dataparser's 3D seed points (COLMAP
    ``points3D_xyz``, already in model space) are projected into every
    training camera, giving exact-but-sparse termination depths. That is the
    supervision DS-NeRF's sigma loss was designed for (the depth losses mask
    ``depth > 0``, so unsupervised pixels contribute nothing)."""

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        super().__init__(dataparser_outputs, scale_factor)
        self.depth_filenames = dataparser_outputs.metadata.get("depth_filenames")
        self.depth_unit_scale_factor = dataparser_outputs.metadata.get(
            "depth_unit_scale_factor", 1e-3
        )
        self._sfm_points = None
        if not self.depth_filenames:
            pts = dataparser_outputs.metadata.get("points3D_xyz")
            if pts is not None and len(pts):
                self._sfm_points = np.asarray(pts, np.float32)
                print(
                    "[depth-dataset] no depth files: projecting "
                    f"{len(self._sfm_points)} SfM points into each camera for "
                    "sparse depth supervision (DPT pseudo-depth needs weights "
                    "unavailable offline)"
                )
            else:
                print(
                    "[depth-dataset] WARNING: no depth files and no SfM points "
                    "— depth supervision disabled (provide depth_file_path per "
                    "frame or COLMAP points3D)"
                )

    @property
    def provides_depth(self) -> bool:
        return bool(self.depth_filenames) or self._sfm_points is not None

    def _sfm_depth_map(self, image_idx: int) -> np.ndarray:
        """(H, W, 1) z-depth map: SfM points splatted to their nearest pixel
        (nearest-point wins on collisions); 0 where unsupervised."""
        cams = self.cameras
        c2w = np.asarray(cams.camera_to_worlds).reshape(-1, 3, 4)[image_idx]
        fx = float(np.asarray(cams.fx).reshape(-1)[image_idx])
        fy = float(np.asarray(cams.fy).reshape(-1)[image_idx])
        cx = float(np.asarray(cams.cx).reshape(-1)[image_idx])
        cy = float(np.asarray(cams.cy).reshape(-1)[image_idx])
        h = int(np.asarray(cams.height).reshape(-1)[image_idx])
        w = int(np.asarray(cams.width).reshape(-1)[image_idx])
        R, t = c2w[:3, :3], c2w[:3, 3]
        p_cam = (self._sfm_points - t) @ R  # world -> camera (OpenGL, -z fwd)
        depth = -p_cam[:, 2]
        ok = depth > 1e-6
        a = p_cam[:, 0] / np.maximum(depth, 1e-6)
        b = p_cam[:, 1] / np.maximum(depth, 1e-6)
        col = np.round(a * fx + cx).astype(np.int64)
        row = np.round(cy - b * fy).astype(np.int64)
        ok &= (col >= 0) & (col < w) & (row >= 0) & (row < h)
        dm = np.full((h * w,), np.inf, np.float32)
        flat = row[ok] * w + col[ok]
        np.minimum.at(dm, flat, depth[ok])
        dm[~np.isfinite(dm)] = 0.0
        return dm.reshape(h, w, 1)

    def get_metadata(self, image_idx: int) -> Dict:
        if not self.depth_filenames:
            if self._sfm_points is not None:
                return {"depth_image": self._sfm_depth_map(image_idx)}
            return {}
        from PIL import Image

        path = Path(self.depth_filenames[image_idx])
        if path.suffix == ".npy":
            depth = np.load(path)
        else:
            depth = np.asarray(Image.open(path), dtype=np.float32)
        depth = depth * self.depth_unit_scale_factor
        if depth.ndim == 2:
            depth = depth[..., None]
        return {"depth_image": depth.astype(np.float32)}


class SemanticDataset(InputDataset):
    """Dataset with semantic masks (reference data/datasets/semantic_dataset.py)."""

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        super().__init__(dataparser_outputs, scale_factor)
        md = dataparser_outputs.metadata or {}
        sem = md.get("semantics")
        if sem is None and md.get("semantics_filenames"):
            # sitcoms3d-style flat metadata keys -> Semantics object
            from nerfstudio_tpu.data.dataparsers.base_dataparser import Semantics

            classes = list(md.get("semantics_classes", []))
            sem = Semantics(
                filenames=md["semantics_filenames"], classes=classes,
                colors=np.random.default_rng(0).uniform(size=(max(len(classes), 1), 3)).astype(np.float32),
            )
        self.semantics = sem

    def get_metadata(self, image_idx: int) -> Dict:
        if self.semantics is None:
            return {}
        from PIL import Image

        label = np.asarray(Image.open(self.semantics.filenames[image_idx]))
        if label.ndim == 3:
            label = label[..., 0]
        return {"semantics": label[..., None].astype(np.int32)}


class SDFDataset(InputDataset):
    """Dataset with monocular depth + normal priors for SDF training
    (reference data/datasets/sdf_dataset.py: sdfstudio-format mono priors)."""

    def __init__(self, dataparser_outputs: DataparserOutputs, scale_factor: float = 1.0):
        super().__init__(dataparser_outputs, scale_factor)
        md = dataparser_outputs.metadata
        self.depth_filenames = md.get("depth_filenames")
        self.normal_filenames = md.get("normal_filenames")
        self.c2ws = np.asarray(dataparser_outputs.cameras.camera_to_worlds)

    def get_metadata(self, image_idx: int) -> Dict:
        out: Dict = {}
        if self.depth_filenames:
            depth = np.load(Path(self.depth_filenames[image_idx]))
            out["depth_image"] = depth[..., None].astype(np.float32) if depth.ndim == 2 else depth
        if self.normal_filenames:
            normal = np.load(Path(self.normal_filenames[image_idx]))  # (H, W, 3) in [0,1] cam space
            normal = normal * 2.0 - 1.0
            # camera space -> world space via the camera rotation
            R = self.c2ws[image_idx, :3, :3]
            h, w, _ = normal.shape
            out["normal_image"] = (normal.reshape(-1, 3) @ R.T).reshape(h, w, 3).astype(np.float32)
        return out
