"""Tiny-fixture parse tests for the specialty dataparsers (VERDICT r1 item 9:
scannet, scannetpp, nuscenes, arkitscenes, nerfosr, dycheck, sitcoms3d)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from nerfstudio_tpu.data.dataparsers.specialty_dataparsers import (
    ARKitScenesDataParserConfig,
    DycheckDataParserConfig,
    NeRFOSRDataParserConfig,
    NuScenesDataParserConfig,
    ScanNetDataParserConfig,
    ScanNetppDataParserConfig,
    Sitcoms3DDataParserConfig,
)


def _img(path: Path, hw=8):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.random.default_rng(0).integers(0, 255, (hw, hw, 3), dtype=np.uint8)).save(path)


def _pose(i, n=4):
    theta = 2 * np.pi * i / n
    c2w = np.eye(4)
    c2w[:3, 3] = [2 * np.cos(theta), 2 * np.sin(theta), 1.0]
    return c2w


def _check(out, n_expected=None):
    n = len(out.image_filenames)
    assert n > 0
    if n_expected:
        assert n == n_expected
    c2w = np.asarray(out.cameras.camera_to_worlds)
    assert c2w.shape == (n, 3, 4)
    assert np.isfinite(c2w).all()
    assert np.isfinite(float(out.dataparser_scale))
    return out


def test_scannet(tmp_path):
    for i in range(4):
        _img(tmp_path / "color" / f"{i}.jpg")
        _img(tmp_path / "depth" / f"{i}.png")
        (tmp_path / "pose").mkdir(exist_ok=True)
        np.savetxt(tmp_path / "pose" / f"{i}.txt", _pose(i))
    (tmp_path / "intrinsic").mkdir()
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2] = K[1, 2] = 4.0
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", K)
    parser = ScanNetDataParserConfig(data=tmp_path, train_split_fraction=0.75).setup()
    out = _check(parser.get_dataparser_outputs("train"))
    assert out.metadata["depth_filenames"] is not None
    _check(parser.get_dataparser_outputs("val"))


def test_scannetpp(tmp_path):
    frames = []
    for i in range(4):
        _img(tmp_path / "dslr" / "resized_images" / f"f{i}.jpg")
        frames.append({"file_path": f"f{i}.jpg", "transform_matrix": _pose(i).tolist()})
    meta = {
        "fl_x": 100.0, "fl_y": 100.0, "cx": 4.0, "cy": 4.0, "w": 8, "h": 8,
        "k1": 0.01, "k2": 0.0, "k3": 0.0, "k4": 0.0, "p1": 0.0, "p2": 0.0,
        "camera_model": "OPENCV", "frames": frames[:3], "test_frames": frames[3:],
    }
    (tmp_path / "dslr" / "nerfstudio").mkdir(parents=True)
    with open(tmp_path / "dslr" / "nerfstudio" / "transforms.json", "w") as f:
        json.dump(meta, f)
    parser = ScanNetppDataParserConfig(data=tmp_path).setup()
    _check(parser.get_dataparser_outputs("train"), 3)
    _check(parser.get_dataparser_outputs("test"), 1)


def test_arkitscenes(tmp_path):
    vid = tmp_path.name
    fdir = tmp_path / f"{vid}_frames"
    lines = []
    for i in range(4):
        ts = 1000.0 + i * 0.1
        _img(fdir / "lowres_wide" / f"{vid}_{ts:.3f}.png")
        (fdir / "lowres_wide_intrinsics").mkdir(parents=True, exist_ok=True)
        np.savetxt(fdir / "lowres_wide_intrinsics" / f"{vid}_{ts:.3f}.pincam",
                   np.array([[8, 8, 100.0, 100.0, 4.0, 4.0]]))
        rvec = np.array([0.0, 0.0, 0.1 * i])
        t = np.array([np.cos(i), np.sin(i), 1.0])
        lines.append(f"{ts:.3f} {rvec[0]} {rvec[1]} {rvec[2]} {t[0]} {t[1]} {t[2]}")
    (fdir / "lowres_wide.traj").write_text("\n".join(lines))
    parser = ARKitScenesDataParserConfig(data=tmp_path, train_split_fraction=0.75).setup()
    _check(parser.get_dataparser_outputs("train"))


def test_nuscenes(tmp_path):
    root = tmp_path
    tdir = root / "v1.0-mini"
    tdir.mkdir()
    scene_tok, sample_tok, ego_tok, cal_tok = "s0", "sa0", "e0", "c0"
    tables = {
        "scene": [{"token": scene_tok, "name": "scene-0001"}],
        "sample": [{"token": sample_tok, "scene_token": scene_tok}],
        "ego_pose": [
            {"token": ego_tok, "rotation": [1, 0, 0, 0], "translation": [10.0, 5.0, 0.0]}
        ],
        "calibrated_sensor": [
            {
                "token": cal_tok,
                "rotation": [0.5, -0.5, 0.5, -0.5],
                "translation": [1.0, 0.0, 1.5],
                "camera_intrinsic": [[1266.0, 0, 800.0], [0, 1266.0, 450.0], [0, 0, 1]],
            }
        ],
        "sample_data": [
            {
                "token": "sd0",
                "sample_token": sample_tok,
                "ego_pose_token": ego_tok,
                "calibrated_sensor_token": cal_tok,
                "is_key_frame": True,
                "timestamp": 1,
                "filename": "samples/CAM_FRONT/img0.jpg",
            },
            {
                "token": "sd1",
                "sample_token": sample_tok,
                "ego_pose_token": ego_tok,
                "calibrated_sensor_token": cal_tok,
                "is_key_frame": True,
                "timestamp": 2,
                "filename": "samples/CAM_FRONT/img1.jpg",
            },
        ],
    }
    for name, rows in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            json.dump(rows, f)
    for i in range(2):
        _img(root / "samples" / "CAM_FRONT" / f"img{i}.jpg")
    parser = NuScenesDataParserConfig(
        data="scene-0001", data_dir=root, train_split_fraction=0.5
    ).setup()
    _check(parser.get_dataparser_outputs("train"))


def test_nerfosr(tmp_path):
    base = tmp_path / "stjacob" / "final" / "train"
    for i in range(3):
        _img(base / "rgb" / f"im{i}.png")
        (base / "pose").mkdir(parents=True, exist_ok=True)
        (base / "intrinsics").mkdir(parents=True, exist_ok=True)
        np.savetxt(base / "pose" / f"im{i}.txt", _pose(i).reshape(1, -1))
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 100.0
        np.savetxt(base / "intrinsics" / f"im{i}.txt", K.reshape(1, -1))
    parser = NeRFOSRDataParserConfig(data=tmp_path, scene="stjacob").setup()
    _check(parser.get_dataparser_outputs("train"), 3)


def test_dycheck(tmp_path):
    with open(tmp_path / "scene.json", "w") as f:
        json.dump({"center": [0, 0, 0], "scale": 1.0, "near": 0.1, "far": 10.0}, f)
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({"num_frames": 3}, f)
    (tmp_path / "splits").mkdir()
    with open(tmp_path / "splits" / "train.json", "w") as f:
        json.dump({"frame_names": [f"0_{i:05d}" for i in range(3)], "time_ids": [0, 1, 2]}, f)
    (tmp_path / "camera").mkdir()
    for i in range(3):
        with open(tmp_path / "camera" / f"0_{i:05d}.json", "w") as f:
            json.dump(
                {
                    "orientation": np.eye(3).tolist(),
                    "position": [0.0, 0.0, float(i)],
                    "focal_length": 100.0,
                    "principal_point": [4.0, 4.0],
                    "image_size": [8, 8],
                },
                f,
            )
        _img(tmp_path / "rgb" / "2x" / f"0_{i:05d}.png", hw=4)
    parser = DycheckDataParserConfig(data=tmp_path, downscale_factor=2).setup()
    out = _check(parser.get_dataparser_outputs("train"), 3)
    assert out.cameras.times is not None


def test_sitcoms3d(tmp_path):
    frames = []
    for i in range(3):
        _img(tmp_path / "images_4" / f"im{i}.png")
        K = [[400.0, 0, 100.0], [0, 400.0, 80.0], [0, 0, 1]]
        frames.append({"image_name": f"im{i}.png", "intrinsics": K, "camtoworld": _pose(i).tolist()})
    with open(tmp_path / "cameras.json", "w") as f:
        json.dump({"frames": frames, "bbox": [[-1, -1, -1], [1, 1, 1]]}, f)
    parser = Sitcoms3DDataParserConfig(data=tmp_path, include_semantics=False).setup()
    _check(parser.get_dataparser_outputs("train"), 3)


def test_registry_contains_specialty():
    from nerfstudio_tpu.data.dataparsers.registry import dataparser_registry

    reg = dataparser_registry()
    for name in ("scannet-data", "scannetpp-data", "arkitscenes-data", "nuscenes-data",
                 "nerfosr-data", "dycheck-data", "sitcoms3d-data"):
        assert name in reg, name
