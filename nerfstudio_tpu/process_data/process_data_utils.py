"""Shared capture-ingestion helpers (reference:
nerfstudio/process_data/process_data_utils.py).

Host-side only: image listing/copying/downscaling with PIL, video frame
extraction via ffmpeg (subprocess, gated on the binary being present)."""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

ALLOWED_EXTS = (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp")


def list_images(directory: Path) -> List[Path]:
    return sorted(
        p for p in Path(directory).iterdir() if p.suffix.lower() in ALLOWED_EXTS
    )


def copy_images(
    source: Path, dest_dir: Path, num_downscales: int = 3, rename: bool = True
) -> List[Path]:
    """Copy images into dest_dir/images (+ images_2, images_4, ... pyramids).

    Returns the copied full-res paths (reference copy_images + downscale)."""
    from PIL import Image

    dest_dir = Path(dest_dir)
    images = list_images(source)
    if not images:
        raise FileNotFoundError(f"no images found in {source}")
    out_paths = []
    dirs = [dest_dir / "images"] + [
        dest_dir / f"images_{2**i}" for i in range(1, num_downscales + 1)
    ]
    for d in dirs:
        d.mkdir(parents=True, exist_ok=True)
    for i, src in enumerate(images):
        name = f"frame_{i + 1:05d}{src.suffix.lower()}" if rename else src.name
        dst = dest_dir / "images" / name
        shutil.copy2(src, dst)
        out_paths.append(dst)
        img = Image.open(dst)
        for level in range(1, num_downscales + 1):
            f = 2**level
            small = img.resize((max(1, img.width // f), max(1, img.height // f)))
            small.save(dest_dir / f"images_{f}" / name)
    return out_paths


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def convert_video_to_images(
    video_path: Path, output_dir: Path, num_frames_target: int = 300
) -> List[Path]:
    """Extract evenly spaced frames with ffmpeg (reference
    convert_video_to_images). Requires the ffmpeg binary."""
    if not ffmpeg_available():
        raise RuntimeError(
            "ffmpeg is required for video ingestion but was not found on PATH"
        )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # probe duration
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries", "format=duration",
         "-of", "default=noprint_wrappers=1:nokey=1", str(video_path)],
        capture_output=True, text=True, check=True,
    )
    duration = float(probe.stdout.strip() or 1.0)
    fps = max(num_frames_target / max(duration, 1e-6), 0.1)
    subprocess.run(
        ["ffmpeg", "-y", "-i", str(video_path), "-vf", f"fps={fps:.4f}",
         str(output_dir / "frame_%05d.png")],
        check=True, capture_output=True,
    )
    return list_images(output_dir)


def downscale_factor_dirs(base: Path, factors=(2, 4, 8)) -> None:
    from PIL import Image

    imgs = list_images(base / "images")
    for f in factors:
        d = base / f"images_{f}"
        d.mkdir(exist_ok=True)
        for p in imgs:
            img = Image.open(p)
            img.resize((max(1, img.width // f), max(1, img.height // f))).save(d / p.name)
