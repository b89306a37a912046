"""Process-data tests: COLMAP model -> transforms.json round trip into the
nerfstudio dataparser, plus the vendor-format converters on tiny fixtures."""

import json
import math
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from nerfstudio_tpu.data.dataparsers.colmap_parsing_utils import (
    ColmapCamera,
    ColmapImage,
    qvec2rotmat,
    write_cameras_text,
    write_images_text,
)
from nerfstudio_tpu.process_data.colmap_utils import colmap_to_json


def _img(path: Path, hw=8):
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((hw, hw, 3), np.uint8)).save(path)


def _quat_from_R(R):
    from nerfstudio_tpu.cameras.camera_utils import quaternion_from_matrix

    M = np.eye(4)
    M[:3, :3] = R
    return quaternion_from_matrix(M)  # wxyz


def make_colmap_model(model_dir: Path, n=4):
    model_dir.mkdir(parents=True, exist_ok=True)
    cams = {
        1: ColmapCamera(id=1, model="OPENCV", width=8, height=8,
                        params=np.array([10.0, 10.0, 4.0, 4.0, 0.01, 0.0, 0.0, 0.0]))
    }
    images = {}
    rng = np.random.default_rng(0)
    for i in range(1, n + 1):
        theta = 2 * np.pi * i / n
        pos = np.array([2 * np.cos(theta), 2 * np.sin(theta), 1.0])
        # simple w2c: camera at pos looking at origin (OpenCV convention)
        fwd = -pos / np.linalg.norm(pos)  # +z toward target
        up = np.array([0.0, 0, -1])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        R_c2w = np.stack([right, np.cross(fwd, right), fwd], axis=1)
        R_w2c = R_c2w.T
        t = -R_w2c @ pos
        images[i] = ColmapImage(
            id=i, qvec=_quat_from_R(R_w2c), tvec=t, camera_id=1,
            name=f"frame_{i:05d}.png", xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        )
    write_cameras_text(cams, model_dir / "cameras.txt")
    write_images_text(images, model_dir / "images.txt")
    (model_dir / "points3D.txt").write_text("# empty\n")
    return cams, images


def test_colmap_to_json_roundtrip(tmp_path):
    model = tmp_path / "sparse" / "0"
    cams, images = make_colmap_model(model)
    out = tmp_path / "out"
    n = colmap_to_json(model, out)
    assert n == 4
    with open(out / "transforms.json") as f:
        meta = json.load(f)
    assert len(meta["frames"]) == 4
    assert "applied_transform" in meta
    assert meta["camera_model"] == "OPENCV"  # hoisted shared intrinsics
    assert meta["fl_x"] == 10.0 and meta["k1"] == 0.01

    # the emitted c2w must reproduce the COLMAP camera center under the
    # applied world transform
    A = np.asarray(meta["applied_transform"])
    for fr in meta["frames"]:
        im = images[fr["colmap_im_id"]]
        R = qvec2rotmat(im.qvec)
        center_colmap = -R.T @ im.tvec
        c2w = np.asarray(fr["transform_matrix"])
        expect = A[:3, :3] @ center_colmap + A[:3, 3]
        np.testing.assert_allclose(c2w[:3, 3], expect, atol=1e-6)


def test_colmap_to_json_feeds_dataparser(tmp_path):
    """End-to-end: converted transforms.json parses with the nerfstudio
    dataparser and yields sane cameras."""
    model = tmp_path / "colmap" / "sparse" / "0"
    make_colmap_model(model)
    colmap_to_json(model, tmp_path)
    for i in range(1, 5):
        _img(tmp_path / "images" / f"frame_{i:05d}.png")

    from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import (
        NerfstudioDataParserConfig,
    )

    parser = NerfstudioDataParserConfig(data=tmp_path, train_split_fraction=0.75).setup()
    out = parser.get_dataparser_outputs("train")
    c2w = np.asarray(out.cameras.camera_to_worlds)
    assert c2w.shape[-2:] == (3, 4)
    assert np.isfinite(c2w).all()
    # poses were auto-scaled into the unit box
    assert np.abs(c2w[:, :3, 3]).max() <= 1.0 + 1e-5


def test_polycam(tmp_path):
    kf = tmp_path / "keyframes"
    for i in range(3):
        (kf / "cameras").mkdir(parents=True, exist_ok=True)
        cam = {"fx": 100.0, "fy": 100.0, "cx": 4.0, "cy": 4.0, "width": 8,
               "height": 8, "blur_score": 100.0}
        m = np.eye(4)
        m[:3, 3] = [i, 0, 1]
        for r in range(3):
            for c in range(4):
                cam[f"t_{r}{c}"] = float(m[r, c])
        with open(kf / "cameras" / f"{i}.json", "w") as f:
            json.dump(cam, f)
        _img(kf / "images" / f"{i}.jpg")
    from nerfstudio_tpu.process_data.converters import polycam_to_json

    n = polycam_to_json(tmp_path, tmp_path / "out")
    assert n == 3
    meta = json.load(open(tmp_path / "out" / "transforms.json"))
    assert meta["frames"][0]["fl_x"] == 100.0


def test_record3d(tmp_path):
    K = np.array([[100.0, 0, 0], [0, 100.0, 0], [4.0, 4.0, 1]])  # column-major
    poses = [[0, 0, 0, 1, float(i), 0.0, 1.0] for i in range(3)]
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({"K": K.reshape(-1).tolist(), "poses": poses, "w": 8, "h": 8}, f)
    for i in range(3):
        _img(tmp_path / "rgbd" / f"{i}.jpg")
    from nerfstudio_tpu.process_data.converters import record3d_to_json

    n = record3d_to_json(tmp_path, tmp_path / "out")
    assert n == 3
    meta = json.load(open(tmp_path / "out" / "transforms.json"))
    assert meta["fl_x"] == 100.0
    assert meta["frames"][1]["transform_matrix"][0][3] == 1.0


def test_metashape(tmp_path):
    xml = """<document><chunk>
      <sensors><sensor id="0"><calibration>
        <resolution width="8" height="8"/><f>100.0</f><cx>0.5</cx><cy>-0.5</cy>
        <k1>0.01</k1></calibration></sensor></sensors>
      <cameras>
        <camera sensor_id="0" label="a.jpg"><transform>1 0 0 0 0 1 0 0 0 0 1 2 0 0 0 1</transform></camera>
        <camera sensor_id="0" label="b.jpg"><transform>1 0 0 1 0 1 0 0 0 0 1 2 0 0 0 1</transform></camera>
      </cameras></chunk></document>"""
    (tmp_path / "cameras.xml").write_text(xml)
    from nerfstudio_tpu.process_data.converters import metashape_to_json

    n = metashape_to_json(tmp_path / "cameras.xml", "images", tmp_path / "out")
    assert n == 2
    meta = json.load(open(tmp_path / "out" / "transforms.json"))
    fr = meta["frames"][0]
    assert fr["cx"] == 4.5 and fr["cy"] == 3.5 and fr["k1"] == 0.01


def test_realitycapture(tmp_path):
    csv = "#name,x,y,alt,heading,pitch,roll,f,px,py,k1,k2,k3,k4,t1,t2\n"
    csv += "a.jpg,0,0,1,0,0,0,36.0,0,0,0,0,0,0,0,0\n"
    csv += "b.jpg,1,0,1,90,0,0,36.0,0,0,0,0,0,0,0,0\n"
    (tmp_path / "poses.csv").write_text(csv)
    from nerfstudio_tpu.process_data.converters import realitycapture_to_json

    n = realitycapture_to_json(tmp_path / "poses.csv", "images", tmp_path / "out")
    assert n == 2
    meta = json.load(open(tmp_path / "out" / "transforms.json"))
    # f=36mm on a 36mm sensor -> fov = 2*atan(0.5)
    assert abs(meta["frames"][0]["camera_angle_x"] - 2 * math.atan(0.5)) < 1e-6


def test_odm(tmp_path):
    recon = [{
        "cameras": {"cam0": {"focal": 0.9, "width": 8, "height": 8, "k1": 0.0, "k2": 0.0}},
        "shots": {
            "a.jpg": {"camera": "cam0", "rotation": [0, 0, 0], "translation": [0, 0, -2]},
            "b.jpg": {"camera": "cam0", "rotation": [0, 0, 0.3], "translation": [1, 0, -2]},
        },
    }]
    with open(tmp_path / "reconstruction.json", "w") as f:
        json.dump(recon, f)
    from nerfstudio_tpu.process_data.converters import odm_to_json

    n = odm_to_json(tmp_path / "reconstruction.json", "images", tmp_path / "out")
    assert n == 2
    meta = json.load(open(tmp_path / "out" / "transforms.json"))
    assert meta["frames"][0]["fl_x"] == 0.9 * 8


def test_copy_images_with_pyramids(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        _img(src / f"photo{i}.jpg", hw=16)
    from nerfstudio_tpu.process_data.process_data_utils import copy_images

    out = copy_images(src, tmp_path / "proc", num_downscales=2)
    assert len(out) == 3
    assert (tmp_path / "proc" / "images_2" / "frame_00001.jpg").exists()
    assert (tmp_path / "proc" / "images_4" / "frame_00001.jpg").exists()
    im = Image.open(tmp_path / "proc" / "images_4" / "frame_00001.jpg")
    assert im.size == (4, 4)


def test_equirect_to_perspective_geometry():
    """A panorama whose color encodes longitude: the forward view (yaw=0) must
    sample the panorama's center column band, and yaw=90 the +x band."""
    import numpy as np

    from nerfstudio_tpu.process_data.equirect_utils import equirect_to_perspective

    h, w = 64, 128
    pano = np.zeros((h, w, 3), np.float32)
    pano[..., 0] = np.linspace(0, 1, w)[None, :]  # red ramps with longitude
    persp = equirect_to_perspective(pano, fov_deg=60.0, yaw_deg=0.0, pitch_deg=0.0, out_h=32, out_w=32)
    center_red = float(persp[16, 16, 0])
    # lon=0 maps to u=0.5*w -> red ~0.5
    assert abs(center_red - 0.5) < 0.02
    persp90 = equirect_to_perspective(pano, fov_deg=60.0, yaw_deg=90.0, pitch_deg=0.0, out_h=32, out_w=32)
    assert abs(float(persp90[16, 16, 0]) - 0.75) < 0.02
    # pitch looks toward a pole: same longitude, so red stays ~0.5 at center
    persp_up = equirect_to_perspective(pano, fov_deg=60.0, yaw_deg=0.0, pitch_deg=-45.0, out_h=32, out_w=32)
    assert abs(float(persp_up[16, 16, 0]) - 0.5) < 0.05


def test_generate_planar_projections(tmp_path):
    import numpy as np

    from nerfstudio_tpu.process_data.equirect_utils import (
        compute_resolution_from_equirect,
        generate_planar_projections_from_equirectangular,
        sample_view_directions,
    )

    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.uniform(0, 255, (32, 64, 3))).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"pano{i}.png")
    size = compute_resolution_from_equirect(tmp_path, 6)
    assert size[0] >= 64 and size[0] == size[1]
    out = generate_planar_projections_from_equirectangular(tmp_path, (24, 24), 6)
    files = sorted(out.glob("*.png"))
    assert len(files) == 2 * len(sample_view_directions(6))
    im = Image.open(files[0])
    assert im.size == (24, 24)


def test_hloc_unavailable_raises(tmp_path):
    import pytest as _pytest

    from nerfstudio_tpu.process_data.hloc_utils import hloc_available, run_hloc

    if hloc_available():
        _pytest.skip("hloc installed; error path not reachable")
    with _pytest.raises(RuntimeError, match="hloc"):
        run_hloc(tmp_path, tmp_path / "colmap")
