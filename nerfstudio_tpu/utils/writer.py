"""Event writer fan-out (reference: nerfstudio/utils/writer.py, 535 LoC).

Scalars/images buffered per step, flushed to a console table and (optionally)
TensorBoard via tensorboardX. Wandb/Comet hooks gated on availability."""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class EventWriter:
    """(reference writer.py:160-235)"""

    def __init__(self, log_dir: Path, vis: str = "tensorboard"):
        self.log_dir = Path(log_dir)
        self.vis = vis
        self._tb = None
        self._wandb = None
        self._start = time.time()
        self._last_print: Dict[str, float] = {}
        if "tensorboard" in vis:
            try:
                from tensorboardX import SummaryWriter

                self.log_dir.mkdir(parents=True, exist_ok=True)
                self._tb = SummaryWriter(logdir=str(self.log_dir))
            except ImportError:
                pass
        if "wandb" in vis:
            try:
                import wandb

                wandb.init(dir=str(self.log_dir), project="nerfstudio-tpu")
                self._wandb = wandb
            except ImportError:
                pass

    def put_scalar(self, name: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._wandb is not None:
            self._wandb.log({name: value}, step=step)

    def put_dict(self, prefix: str, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.put_scalar(f"{prefix}/{k}", v, step)
        # console line at most every 2s per prefix
        now = time.time()
        if now - self._last_print.get(prefix, 0.0) > 2.0:
            self._last_print[prefix] = now
            msg = " ".join(
                f"{k}={v:.4g}" for k, v in values.items() if isinstance(v, (int, float))
            )
            print(f"[{prefix} {step}] {msg}", flush=True)

    def put_image(self, name: str, image: np.ndarray, step: int) -> None:
        if self._tb is not None:
            img = np.asarray(image)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            self._tb.add_image(name, img, step, dataformats="HWC")

    def put_config(self, config: dict) -> None:
        if self._tb is not None:
            self._tb.add_text("config", str(config))

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
