"""Native host runtime pieces (C++): the multithreaded batch image decoder
that feeds the HBM-resident datamanagers (the TPU-host equivalent of the
reference's ParallelDataManager worker pool, data/utils/dataloaders.py:405-592).

The extension compiles lazily on first use (g++ against libjpeg/libpng) and
caches the .so next to this file; everything gracefully falls back to PIL
when the toolchain or libraries are unavailable."""

from __future__ import annotations

import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_lock = threading.Lock()
_mod = None
_tried = False


def _build() -> Optional[object]:
    src = Path(__file__).parent / "loader.cpp"
    so_path = Path(__file__).parent / "_native_loader.so"
    if not so_path.exists() or so_path.stat().st_mtime < src.stat().st_mtime:
        include = sysconfig.get_paths()["include"]
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", str(src), "-ljpeg", "-lpng",
            "-o", str(so_path),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location("_native_loader", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def native_loader() -> Optional[object]:
    """The compiled extension, or None if unavailable."""
    global _mod, _tried
    with _lock:
        if not _tried:
            _tried = True
            try:
                _mod = _build()
            except Exception:  # noqa: BLE001 — toolchain/library missing
                _mod = None
    return _mod


def decode_image_batch(
    filenames: List, height: int, width: int, channels: int,
    downscale: int = 1, num_threads: int = 0,
) -> Optional[np.ndarray]:
    """Decode a batch of JPEG/PNG files into one (N, H, W, C) uint8 array
    with a C++ thread pool. Returns None when the extension is unavailable
    (callers fall back to PIL)."""
    mod = native_loader()
    if mod is None:
        return None
    out = np.empty((len(filenames), height, width, channels), np.uint8)
    mod.decode_batch([str(f) for f in filenames], out, height, width, channels,
                     int(downscale), int(num_threads))
    return out
