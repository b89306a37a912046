"""Synthetic test fixtures: a tiny Blender-format capture of a shaded sphere.

Analog of the reference's ``tests/data/lego_test`` fixture, but generated
procedurally (no binary assets in the repo). The scene is a red unit-radius/2
sphere at the origin on white background; cameras orbit at distance 4."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def look_at_origin(position: np.ndarray) -> np.ndarray:
    """OpenGL c2w: camera at `position` looking at the origin, +z back."""
    forward = position / np.linalg.norm(position)  # camera z points AWAY from target
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(forward, up)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, forward)
    right /= np.linalg.norm(right)
    true_up = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = forward
    c2w[:3, 3] = position
    return c2w


def render_sphere_image(c2w: np.ndarray, h: int, w: int, focal: float, radius: float = 0.5):
    """Analytic ray-traced sphere: returns uint8 RGBA."""
    ys, xs = np.mgrid[0:h, 0:w]
    dirs_cam = np.stack(
        [
            (xs + 0.5 - w / 2) / focal,
            -(ys + 0.5 - h / 2) / focal,
            -np.ones_like(xs, dtype=np.float64),
        ],
        axis=-1,
    )
    R = c2w[:3, :3]
    d = dirs_cam @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = c2w[:3, 3]
    b = 2 * (d @ o)
    c = float(o @ o) - radius**2
    disc = b**2 - 4 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    p = o + d * t[..., None]
    n = p / radius
    light = np.array([0.5, 0.5, 0.7071])
    lam = np.clip(n @ light, 0, 1)
    base = np.array([0.8, 0.2, 0.2])
    rgb = np.where(hit[..., None], base * (0.3 + 0.7 * lam[..., None]), 1.0)
    alpha = hit.astype(np.float64)
    rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
    return (rgba * 255).astype(np.uint8)


def make_blender_fixture(root: Path, n_train: int = 4, n_val: int = 1, hw: int = 32) -> Path:
    """Write a transforms_{train,val,test}.json + PNGs capture under root."""
    from PIL import Image

    root = Path(root)
    camera_angle_x = 0.8
    focal = 0.5 * hw / np.tan(0.5 * camera_angle_x)

    def write_split(split: str, n: int, phase: float):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * i / max(n, 1) + phase
            pos = np.array([3.0 * np.cos(theta), 3.0 * np.sin(theta), 1.5])
            c2w = look_at_origin(pos)
            img = render_sphere_image(c2w, hw, hw, focal)
            name = f"{split}/r_{i}"
            Image.fromarray(img).save(root / f"{name}.png")
            frames.append({"file_path": f"./{name}", "transform_matrix": c2w.tolist()})
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)

    write_split("train", n_train, 0.0)
    write_split("val", n_val, 0.4)
    write_split("test", n_val, 0.9)
    return root


def make_nerfstudio_fixture(root: Path, n: int = 6, hw: int = 32) -> Path:
    """Write a transforms.json capture (nerfstudio format) under root."""
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    focal = 40.0
    frames = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        pos = np.array([3.0 * np.cos(theta), 3.0 * np.sin(theta), 1.5])
        c2w = look_at_origin(pos)
        img = render_sphere_image(c2w, hw, hw, focal)
        name = f"images/frame_{i:05d}.png"
        Image.fromarray(img[..., :3]).save(root / name)
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {
        "camera_model": "OPENCV",
        "fl_x": focal,
        "fl_y": focal,
        "cx": hw / 2,
        "cy": hw / 2,
        "w": hw,
        "h": hw,
        "k1": 0.0,
        "k2": 0.0,
        "p1": 0.0,
        "p2": 0.0,
        "frames": frames,
    }
    with open(root / "transforms.json", "w") as f:
        json.dump(meta, f)
    return root


def make_mixed_res_fixture(root: Path, n: int = 6, hws=(32, 24, 32), masks: bool = False) -> Path:
    """nerfstudio-format capture with PER-FRAME resolutions (phototourism's
    real shape): frame i gets hws[i % len(hws)] square images with matching
    per-frame intrinsics. Exercises the bucketed variable-res data path.
    ``masks=True`` adds a per-frame mask excluding the left quarter of each
    image (mask_path semantics, reference pixel_samplers.py:82)."""
    from PIL import Image

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    if masks:
        (root / "masks").mkdir(parents=True, exist_ok=True)
    frames = []
    for i in range(n):
        hw = int(hws[i % len(hws)])
        focal = 1.25 * hw
        theta = 2 * np.pi * i / n
        pos = np.array([3.0 * np.cos(theta), 3.0 * np.sin(theta), 1.5])
        c2w = look_at_origin(pos)
        img = render_sphere_image(c2w, hw, hw, focal)
        name = f"images/frame_{i:05d}.png"
        Image.fromarray(img[..., :3]).save(root / name)
        frame = {
            "file_path": name,
            "transform_matrix": c2w.tolist(),
            "fl_x": focal,
            "fl_y": focal,
            "cx": hw / 2,
            "cy": hw / 2,
            "w": hw,
            "h": hw,
        }
        if masks:
            m = np.full((hw, hw), 255, np.uint8)
            m[:, : hw // 4] = 0  # exclude the left quarter
            mname = f"masks/frame_{i:05d}.png"
            Image.fromarray(m).save(root / mname)
            frame["mask_path"] = mname
        frames.append(frame)
    meta = {"camera_model": "OPENCV", "frames": frames}
    with open(root / "transforms.json", "w") as f:
        json.dump(meta, f)
    return root
