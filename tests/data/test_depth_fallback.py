"""DepthDataset SfM sparse-depth fallback (reference depth_dataset.py:56-118
generates DPT pseudo-depth; offline, the fallback projects the capture's SfM
points into each camera instead — exact-but-sparse termination depths)."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import make_nerfstudio_fixture  # noqa: E402

from nerfstudio_tpu.cameras.cameras import Cameras
from nerfstudio_tpu.data.dataparsers.base_dataparser import DataparserOutputs
from nerfstudio_tpu.data.datasets import DepthDataset
from nerfstudio_tpu.data.scene_box import SceneBox


def _outputs_with_points(points):
    c2w = np.eye(4, dtype=np.float32)[None, :3]  # camera at origin, looking -z
    cameras = Cameras(
        camera_to_worlds=c2w, fx=50.0, fy=50.0, cx=16.0, cy=16.0, width=32, height=32
    )
    return DataparserOutputs(
        image_filenames=["unused.png"],
        cameras=cameras,
        scene_box=SceneBox(aabb=np.array([[-2.0] * 3, [2.0] * 3], np.float32)),
        metadata={"points3D_xyz": np.asarray(points, np.float32)},
    )


def test_sfm_depth_projection_exact():
    # point straight ahead at depth 3 -> pixel (cy, cx), z-depth 3
    # point offset: cam coords (0.3, -0.2, -2) -> col = 0.3/2*50+16 = 23.5,
    #   row = 16 - (-0.2/2)*50 = 21 -> rounds to (21, 24), depth 2
    ds = DepthDataset(_outputs_with_points([[0.0, 0.0, -3.0], [0.3, -0.2, -2.0]]))
    assert ds.provides_depth
    dm = ds._sfm_depth_map(0)
    assert dm.shape == (32, 32, 1)
    assert dm[16, 16, 0] == pytest.approx(3.0)
    assert dm[21, 24, 0] == pytest.approx(2.0)
    # only those two pixels supervised
    assert (dm > 0).sum() == 2


def test_sfm_depth_collision_keeps_nearest_and_culls_behind():
    ds = DepthDataset(
        _outputs_with_points(
            [[0.0, 0.0, -3.0], [0.0, 0.0, -1.5], [0.0, 0.0, 4.0]]  # last is behind
        )
    )
    dm = ds._sfm_depth_map(0)
    assert dm[16, 16, 0] == pytest.approx(1.5)
    assert (dm > 0).sum() == 1


def test_no_points_no_depth():
    out = _outputs_with_points([[0.0, 0.0, -3.0]])
    out.metadata.clear()
    ds = DepthDataset(out)
    assert not ds.provides_depth
    assert ds.get_metadata(0) == {}


def test_depth_nerfacto_trains_on_rgb_only_capture(tmp_path):
    """depth-nerfacto end-to-end on an RGB-only capture with SfM seed points
    (VERDICT #9 done-criterion)."""
    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.exporter.ply_io import write_ply
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    root = make_nerfstudio_fixture(tmp_path / "cap", n=4, hw=24)
    # seed points on the fixture's sphere surface (radius 0.5 at origin)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(64, 3))
    v = 0.5 * v / np.linalg.norm(v, axis=-1, keepdims=True)
    write_ply(
        root / "sparse.ply", 64,
        {"x": v[:, 0].astype(np.float32), "y": v[:, 1].astype(np.float32),
         "z": v[:, 2].astype(np.float32)},
    )
    meta = json.loads((root / "transforms.json").read_text())
    meta["ply_file_path"] = "sparse.ply"
    (root / "transforms.json").write_text(json.dumps(meta))

    config = get_method("depth-nerfacto")
    assert config.dataset == "depth"
    config.data = root
    config.dataparser.train_split_fraction = 1.0
    config.dataparser.downscale_factor = 1
    config.dataparser.load_3D_points = True
    config.trainer.output_dir = tmp_path / "outputs"
    config.datamanager.train_num_rays_per_batch = 32
    m = config.model
    m.log2_hashmap_size = 9
    m.max_res = 64
    m.hidden_dim = 8
    m.hidden_dim_color = 8
    m.num_nerf_samples_per_ray = 4
    m.num_proposal_samples_per_ray = (4, 4)
    m.eval_num_rays_per_chunk = 64

    pipeline, state, config = build_pipeline(config, use_mesh=False)
    assert pipeline.datamanager.train_depths is not None, "SfM depth stack missing"
    ModelCls = config.model._target
    key = jax.random.PRNGKey(0)
    seen_depth_loss = False
    for step in range(2):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(
            state, pipeline.datamanager.train_images, k,
            **ModelCls.step_kwargs(step, config.model),
        )
        if "depth_loss" in metrics:
            seen_depth_loss = True
    assert np.isfinite(float(metrics["loss"]))
    assert seen_depth_loss, "depth supervision never activated"
