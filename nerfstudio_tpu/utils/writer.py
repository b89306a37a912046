"""Event writer fan-out (reference: nerfstudio/utils/writer.py, 535 LoC).

Scalars/images buffered per step, flushed to a console table and (optionally)
TensorBoard via tensorboardX. Wandb/Comet hooks gated on availability
(reference writer.py:202-235 CometWriter / WandbWriter)."""

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
        self._comet = None
        self._start = time.time()
        self._last_print: Dict[str, float] = {}
        self._avg_buffer: Dict[str, float] = {}
        self.max_steps = 0
        if "tensorboard" in vis:
            try:
                from tensorboardX import SummaryWriter

                self.log_dir.mkdir(parents=True, exist_ok=True)
                # flush_secs=2: tensorboardX's flush() only flushes the file
                # buffer, NOT the async event queue — with the default 120 s
                # cadence, eval images would not appear in TensorBoard until
                # 2 minutes after the eval step (or at close)
                self._tb = SummaryWriter(logdir=str(self.log_dir), flush_secs=2)
            except ImportError:
                pass
        if "wandb" in vis:
            try:
                import wandb

                wandb.init(dir=str(self.log_dir), project="nerfstudio-tpu")
                self._wandb = wandb
            except ImportError:
                pass
        if "comet" in vis:
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(project_name="nerfstudio-tpu")
            except ImportError:
                print("comet selected but comet_ml is not installed; skipping")
            except Exception as e:  # noqa: BLE001
                # Experiment() raises (ValueError/ConfigurationError) without
                # an API key — degrade gracefully like the wandb/tb paths
                print(f"comet init failed ({type(e).__name__}: {e}); skipping")

    def put_scalar(self, name: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._wandb is not None:
            self._wandb.log({name: value}, step=step)
        if self._comet is not None:
            self._comet.log_metric(name, value, step=step)

    max_steps: int = 0  # set by the trainer for ETA computation

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
        # periodic stats table with running averages + ETA (the reference's
        # rich LocalWriter table, writer.py:125-235)
        if prefix == "train":
            buf = self._avg_buffer
            for k in ("train_rays_per_sec", "loss", "psnr"):
                if k in values:
                    buf[k] = 0.9 * buf.get(k, float(values[k])) + 0.1 * float(values[k])
            if now - self._last_print.get("_table", 0.0) > 30.0 and step > 0:
                self._last_print["_table"] = now
                elapsed = now - self._start
                eta = ""
                if self.max_steps and step:
                    remaining = elapsed / max(step, 1) * (self.max_steps - step)
                    eta = time.strftime("%H:%M:%S", time.gmtime(remaining))
                cols = [("step", f"{step}"), ("elapsed", time.strftime("%H:%M:%S", time.gmtime(elapsed)))]
                cols += [(k, f"{v:.4g}") for k, v in buf.items()]
                if eta:
                    cols.append(("ETA", eta))
                widths = [max(len(a), len(b)) for a, b in cols]
                line1 = " | ".join(a.ljust(w) for (a, _), w in zip(cols, widths))
                line2 = " | ".join(b.ljust(w) for (_, b), w in zip(cols, widths))
                print("-" * len(line1))
                print(line1)
                print(line2, flush=True)

    def put_image(self, name: str, image: np.ndarray, step: int) -> None:
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        if self._tb is not None:
            self._tb.add_image(name, img, step, dataformats="HWC")
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(img)}, step=step)
        if self._comet is not None:
            self._comet.log_image(img, name=name, step=step)

    def put_config(self, config: dict) -> None:
        if self._tb is not None:
            self._tb.add_text("config", str(config))
        if self._comet is not None:
            self._comet.log_parameters(config)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
