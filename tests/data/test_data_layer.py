"""Data layer tests: dataparsers, dataset, pixel samplers, datamanager."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import make_blender_fixture, make_nerfstudio_fixture  # noqa: E402

from nerfstudio_tpu.data.datamanagers import DataManagerConfig, DeviceCacheDataManager, FullImageDatamanager
from nerfstudio_tpu.data.dataparsers.blender_dataparser import Blender, BlenderDataParserConfig
from nerfstudio_tpu.data.dataparsers.nerfstudio_dataparser import (
    Nerfstudio,
    NerfstudioDataParserConfig,
)
from nerfstudio_tpu.data.datasets import InputDataset
from nerfstudio_tpu.data.pixel_samplers import (
    gather_pixels,
    sample_pair_pixel_indices,
    sample_patch_pixel_indices,
    sample_pixel_indices,
)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender"))


@pytest.fixture(scope="module")
def ns_dir(tmp_path_factory):
    return make_nerfstudio_fixture(tmp_path_factory.mktemp("nsdata"))


def test_blender_dataparser(blender_dir):
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 4
    assert out.cameras.shape == (4,)
    assert float(out.scene_box.aabb[1, 0]) == 1.5
    val = parser.get_dataparser_outputs("val")
    assert len(val.image_filenames) == 1


def test_nerfstudio_dataparser(ns_dir):
    parser = NerfstudioDataParserConfig(data=ns_dir, train_split_fraction=0.5).setup()
    out = parser.get_dataparser_outputs("train")
    assert len(out.image_filenames) == 3
    ev = parser.get_dataparser_outputs("val")
    assert len(ev.image_filenames) == 3
    # poses centered+scaled: |t| <= 1
    assert float(jnp.abs(out.cameras.camera_to_worlds[..., :3, 3]).max()) <= 1.0 + 1e-5


def test_input_dataset(blender_dir):
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    out = parser.get_dataparser_outputs("train")
    ds = InputDataset(out)
    assert len(ds) == 4
    img = ds.get_image_float32(0)
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # alpha blending with white: corners are background -> white
    assert np.allclose(img[0, 0], 1.0, atol=1e-2)
    stacked = ds.load_all()
    assert stacked["images"].shape == (4, 32, 32, 4)
    assert stacked["images"].dtype == np.uint8


def test_pixel_samplers():
    key = jax.random.PRNGKey(0)
    idx = sample_pixel_indices(key, 256, 4, 32, 32)
    assert idx.shape == (256, 3)
    assert int(idx[:, 0].max()) < 4
    assert int(idx[:, 1].max()) < 32

    patch = sample_patch_pixel_indices(key, 64, 4, 2, 32, 32)
    assert patch.shape == (64, 3)
    # first patch is contiguous 4x4
    rows = np.asarray(patch[:16, 1]).reshape(4, 4)
    assert (rows == rows[:, :1]).all()

    pairs = sample_pair_pixel_indices(key, 64, 2, 32, 32)
    assert pairs.shape == (64, 3)
    d = np.abs(np.asarray(pairs[0::2, 1:]) - np.asarray(pairs[1::2, 1:]))
    assert d.max() <= 2

    images = jnp.arange(4 * 32 * 32 * 3, dtype=jnp.uint8).reshape(4, 32, 32, 3)
    rgb = gather_pixels(images, idx)
    assert rgb.shape == (256, 3)
    assert rgb.dtype == jnp.float32


def test_device_cache_datamanager(blender_dir):
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    train_out = parser.get_dataparser_outputs("train")
    dm = DeviceCacheDataManager(DataManagerConfig(train_num_rays_per_batch=128), InputDataset(train_out))
    assert dm.train_images.shape == (4, 32, 32, 4)

    @jax.jit
    def draw(key, images):
        return dm.sample_train_batch(key, images)

    idx, batch = draw(jax.random.PRNGKey(0), dm.train_images)
    assert idx.shape == (128, 3)
    assert batch["image"].shape == (128, 4)
    # two different keys give different batches
    idx2, _ = draw(jax.random.PRNGKey(1), dm.train_images)
    assert not jnp.array_equal(idx, idx2)


def test_device_cache_subset_remaps_camera_indices(blender_dir):
    """With max_images_in_memory, sampled batches must carry ORIGINAL camera
    indices while pixels come from the resident subset (ADVICE r1 high)."""
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    train_out = parser.get_dataparser_outputs("train")
    ds = InputDataset(train_out)
    dm = DeviceCacheDataManager(
        DataManagerConfig(
            train_num_rays_per_batch=64, max_images_in_memory=2, steps_per_reload=5
        ),
        ds,
    )
    assert dm.train_images.shape[0] == 2
    all_images = np.asarray(dm._all_images_host).astype(np.float32) / 255.0

    for step in [0, 5]:  # second pass swaps the resident subset
        dm.maybe_reload(step)
        idx, batch = jax.jit(
            lambda k, imgs, rmap: dm.sample_train_batch(k, imgs, resident_map=rmap)
        )(jax.random.PRNGKey(step), dm.train_images, dm.resident_map)
        idx = np.asarray(idx)
        resident = set(np.asarray(dm._resident).tolist())
        assert set(idx[:, 0].tolist()) <= resident, "camera indices must be original"
        # the gathered pixel must equal the ORIGINAL image at (cam,row,col)
        expect = all_images[idx[:, 0], idx[:, 1], idx[:, 2]]
        np.testing.assert_allclose(np.asarray(batch["image"]), expect, atol=1e-6)


def test_full_image_datamanager(blender_dir):
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    dm = FullImageDatamanager(DataManagerConfig(), InputDataset(parser.get_dataparser_outputs("train")))
    seen = set()
    for step in range(4):
        idx, img = dm.next_train(step)
        seen.add(idx)
        assert img.shape == (32, 32, 4)
        assert img.dtype == jnp.float32
    assert len(seen) == 4  # full permutation before repeats


def test_ply_roundtrip(tmp_path):
    from nerfstudio_tpu.exporter.ply_io import read_ply, write_ply

    n = 10
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    fields = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "red": rgb[:, 0], "green": rgb[:, 1], "blue": rgb[:, 2],
    }
    write_ply(tmp_path / "test.ply", n, fields)
    xyz2, rgb2 = read_ply(tmp_path / "test.ply")
    assert np.allclose(xyz, xyz2, atol=1e-6)
    assert (rgb == rgb2).all()


def test_full_image_fps_camera_sampling(blender_dir):
    parser = BlenderDataParserConfig(data=blender_dir).setup()
    ds = InputDataset(parser.get_dataparser_outputs("train"))
    dm = FullImageDatamanager(DataManagerConfig(camera_sampling="fps"), ds)
    order = [dm.next_train(s)[0] for s in range(len(ds))]
    assert sorted(order) == list(range(len(ds)))  # a permutation
    # consecutive fps picks must be far apart: the 2nd pick is the farthest
    pos = np.asarray(dm.train_cameras.camera_to_worlds)[:, :3, 3]
    d01 = np.linalg.norm(pos[order[1]] - pos[order[0]])
    dists = np.linalg.norm(pos - pos[order[0]], axis=-1)
    assert np.isclose(d01, dists.max())
