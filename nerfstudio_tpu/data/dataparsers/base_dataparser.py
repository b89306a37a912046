"""Dataparser base (reference: nerfstudio/data/dataparsers/base_dataparser.py:50-209).

A DataParser reads a capture from disk (host-side numpy) and emits
DataparserOutputs: filenames, a Cameras pytree, scene bounds, and metadata
(3D seed points for splatfacto live here)."""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras.cameras import Cameras
from nerfstudio_tpu.data.scene_box import SceneBox


@dataclasses.dataclass
class Semantics:
    """Semantic label info (reference base_dataparser.py:34-47)."""

    filenames: List[Path]
    classes: List[str]
    colors: np.ndarray
    mask_classes: List[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class DataparserOutputs:
    """(reference base_dataparser.py:50-111)"""

    image_filenames: List[Path]
    cameras: Cameras
    alpha_color: Optional[np.ndarray] = None
    scene_box: SceneBox = dataclasses.field(
        default_factory=lambda: SceneBox(aabb=jnp.array([[-1.0, -1, -1], [1.0, 1, 1]]))
    )
    mask_filenames: Optional[List[Path]] = None
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dataparser_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4)[:3].astype(np.float32)
    )
    dataparser_scale: float = 1.0

    def as_dict(self) -> dict:
        return vars(self)

    def save_dataparser_transform(self, path: Path):
        """Persist transform for downstream tools (reference :86-103)."""
        data = {
            "transform": np.asarray(self.dataparser_transform).tolist(),
            "scale": float(self.dataparser_scale),
        }
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=4)

    def transform_poses_to_original_space(self, poses: np.ndarray) -> np.ndarray:
        """Undo orientation/scaling (reference :105-111)."""
        return transform_poses_to_original_space(
            poses, self.dataparser_transform, self.dataparser_scale
        )


def transform_poses_to_original_space(
    poses: np.ndarray, applied_transform: np.ndarray, applied_scale: float
) -> np.ndarray:
    out = poses.copy()
    out[..., :3, 3] /= applied_scale
    t44 = np.eye(4)
    t44[:3] = applied_transform
    inv = np.linalg.inv(t44)
    bottom = np.broadcast_to(np.array([[0.0, 0, 0, 1]]), (len(out), 1, 4))
    out = (inv @ np.concatenate([out, bottom], axis=1))[:, :3]
    return out.astype(np.float32)


@dataclasses.dataclass
class DataParserConfig:
    """(reference base_dataparser.py:114-122)"""

    data: Path = Path()

    def setup(self) -> "DataParser":
        raise NotImplementedError


@dataclasses.dataclass
class DataParser:
    """(reference base_dataparser.py:125-209)"""

    config: DataParserConfig

    def _generate_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        raise NotImplementedError

    def get_dataparser_outputs(self, split: str = "train", **kwargs) -> DataparserOutputs:
        return self._generate_dataparser_outputs(split, **kwargs)
