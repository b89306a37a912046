"""Writer fan-out: scalars and eval image composites must actually land in
the TensorBoard event file (VERDICT r3 #10; reference utils/writer.py:202-235
WandbWriter/CometWriter parity is import-gated)."""

from __future__ import annotations

import numpy as np
import pytest

from nerfstudio_tpu.utils.writer import EventWriter


def test_tensorboard_scalar_and_image_land_in_event_file(tmp_path):
    w = EventWriter(tmp_path, vis="tensorboard")
    if w._tb is None:
        pytest.skip("tensorboardX not installed")
    w.put_dict("train", {"loss": 0.5, "psnr": 21.0}, step=3)
    w.put_image("eval/img", np.full((4, 8, 3), 0.5, np.float32), step=3)
    w.put_config({"method": "nerfacto"})
    w.flush()
    # tensorboardX's event-writer thread drains its queue asynchronously
    # after flush(); poll briefly before asserting
    import time

    data = b""
    for _ in range(50):
        files = list(tmp_path.glob("events.*"))
        data = b"".join(f.read_bytes() for f in files)
        if b"eval/img" in data:
            break
        time.sleep(0.1)
    assert files, "no TensorBoard event file written"
    assert b"train/loss" in data
    assert b"eval/img" in data, "eval image composite missing from event file"
    assert b"config" in data


def test_comet_and_wandb_absent_degrade_gracefully(tmp_path, capsys):
    w = EventWriter(tmp_path, vis="viewer+comet")
    # comet_ml isn't installed in this image: the hook must not raise and
    # scalars must still route to any other configured backend
    w.put_scalar("train/loss", 1.0, 0)
    w.put_image("eval/img", np.zeros((2, 2, 3), np.uint8), 0)
    w.flush()
