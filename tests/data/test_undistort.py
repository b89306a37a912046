"""Undistortion tests: identity round-trip + agreement with cv2 when present
(the reference's own backend — gives us a golden check)."""

import numpy as np
import pytest

from nerfstudio_tpu.cameras.cameras import CameraType
from nerfstudio_tpu.data.undistort import undistort_image


def _test_image(h=64, w=64):
    rng = np.random.default_rng(0)
    img = np.zeros((h, w, 3), np.uint8)
    # smooth gradient + blocks for structure
    ys, xs = np.mgrid[0:h, 0:w]
    img[..., 0] = (xs * 255 / w).astype(np.uint8)
    img[..., 1] = (ys * 255 / h).astype(np.uint8)
    img[..., 2] = rng.integers(0, 255, (h, w))
    return img


def test_zero_distortion_is_identity():
    img = _test_image()
    out = undistort_image(img, 60.0, 60.0, 32.0, 32.0, np.zeros(6))
    np.testing.assert_array_equal(out, img)


def test_matches_cv2_radial():
    cv2 = pytest.importorskip("cv2")
    img = _test_image()
    fx = fy = 60.0
    cx = cy = 32.0
    k1, k2, p1, p2 = 0.05, -0.02, 0.001, -0.001
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    ours = undistort_image(
        img, fx, fy, cx, cy, np.array([k1, k2, 0, 0, p1, p2]),
        CameraType.PERSPECTIVE.value,
    )
    theirs = cv2.undistort(img, K, np.array([k1, k2, p1, p2, 0.0]), None, K)
    # compare away from borders (border handling differs)
    a = ours[8:-8, 8:-8].astype(float)
    b = theirs[8:-8, 8:-8].astype(float)
    assert np.mean(np.abs(a - b)) < 2.0, np.mean(np.abs(a - b))


def test_matches_cv2_fisheye():
    cv2 = pytest.importorskip("cv2")
    img = _test_image()
    fx = fy = 60.0
    cx = cy = 32.0
    dist = np.array([0.05, -0.01, 0.0, 0.0])
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    ours = undistort_image(img, fx, fy, cx, cy, dist, CameraType.FISHEYE.value)
    theirs = cv2.fisheye.undistortImage(img, K, dist.reshape(-1, 1), None, K)
    a = ours[12:-12, 12:-12].astype(float)
    b = theirs[12:-12, 12:-12].astype(float)
    assert np.mean(np.abs(a - b)) < 2.0, np.mean(np.abs(a - b))


def test_full_image_manager_undistorts(tmp_path):
    """FullImageDatamanager must zero distortion after undistorting."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from fixtures import make_blender_fixture

    from nerfstudio_tpu.data.datamanagers import DataManagerConfig, FullImageDatamanager
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.data.datasets import InputDataset

    root = make_blender_fixture(tmp_path, hw=16)
    parser = BlenderDataParserConfig(data=root).setup()
    out = parser.get_dataparser_outputs("train")
    # inject distortion
    n = len(out.image_filenames)
    d = np.tile(np.array([0.05, 0.0, 0.0, 0.0, 0.0, 0.0], np.float32), (n, 1))
    out = out.replace(cameras=out.cameras.replace(distortion_params=d)) if hasattr(out, "replace") else out
    try:
        out.cameras.distortion_params  # ensure attribute path exists
    except AttributeError:
        pytest.skip("cameras lack distortion")
    ds = InputDataset(out)
    dm = FullImageDatamanager(DataManagerConfig(), ds)
    assert dm.train_cameras.distortion_params is None or not np.any(
        np.abs(np.asarray(dm.train_cameras.distortion_params)) > 1e-12
    )
