"""Native C++ batch decoder tests (nerfstudio_tpu/native/loader.cpp)."""

import numpy as np
import pytest
from PIL import Image

from nerfstudio_tpu.native import decode_image_batch, native_loader


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    td = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    files = []
    for i in range(6):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        p = td / f"im{i}.png"
        Image.fromarray(arr).save(p)
        files.append((p, arr))
    return files


def test_native_decode_exact_png(image_dir):
    if native_loader() is None:
        pytest.skip("native toolchain unavailable")
    files = [p for p, _ in image_dir]
    out = decode_image_batch(files, 32, 32, 3)
    for i, (_, arr) in enumerate(image_dir):
        np.testing.assert_array_equal(out[i], arr)


def test_native_decode_downscale(image_dir):
    if native_loader() is None:
        pytest.skip("native toolchain unavailable")
    files = [p for p, _ in image_dir]
    out = decode_image_batch(files, 16, 16, 3, downscale=2)
    assert out.shape == (6, 16, 16, 3)
    # box filter mean must match a numpy 2x2 average
    _, arr = image_dir[0]
    ref = arr.reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
    assert np.abs(out[0].astype(float) - ref).max() <= 1.0


def test_dataset_load_all_uses_native(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from fixtures import make_blender_fixture

    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.data.datasets import InputDataset

    root = make_blender_fixture(tmp_path, hw=16)
    ds = InputDataset(BlenderDataParserConfig(data=root).setup().get_dataparser_outputs("train"))
    stacked = ds.load_all()["images"]
    # must agree with the PIL path exactly
    pil = np.stack([ds.get_numpy_image(i) for i in range(len(ds))])
    np.testing.assert_array_equal(stacked, pil)
