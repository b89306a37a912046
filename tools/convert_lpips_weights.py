"""Convert torchvision VGG16 + lpips linear-head weights to the npz layout
consumed by ``nerfstudio_tpu.utils.lpips`` (real mode).

Run on a machine with network access:

    pip install torch torchvision lpips
    python tools/convert_lpips_weights.py ~/.cache/nerfstudio_tpu/lpips_vgg.npz

The npz holds ``conv{i}_w``/``conv{i}_b`` for the 13 VGG16 convs (OIHW) and
``lin{i}_w`` (1, C, 1, 1) for the 5 LPIPS linear heads."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_lib  # type: ignore
    import torch

    net = lpips_lib.LPIPS(net="vgg", spatial=False)
    net.eval()

    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + [
        m for m in net.net.slice3
    ] + [m for m in net.net.slice4] + [m for m in net.net.slice5]
    conv_i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{conv_i}_w"] = m.weight.detach().numpy().astype(np.float32)
            out[f"conv{conv_i}_b"] = m.bias.detach().numpy().astype(np.float32)
            conv_i += 1
    assert conv_i == 13, f"expected 13 convs, got {conv_i}"
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy().astype(np.float32)  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w

    path = Path(out_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else str(Path.home() / ".cache/nerfstudio_tpu/lpips_vgg.npz"))
