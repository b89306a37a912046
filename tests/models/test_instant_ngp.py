"""Instant-NGP occupancy grid + model tests."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import make_blender_fixture  # noqa: E402

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.ops.occupancy import (
    OccupancyGridSampler,
    _cell_indices,
    init_occupancy_grid,
    update_occupancy_grid,
)


def test_cell_indices_roundtrip():
    aabb = jnp.array([[-1.0, -1, -1], [1.0, 1, 1]])
    res = 8
    # cell centers map to their own indices
    ijk = jnp.stack(jnp.meshgrid(*([jnp.arange(res)] * 3), indexing="ij"), axis=-1).reshape(-1, 3)
    centers = -1.0 + (ijk + 0.5) / res * 2.0
    idx = _cell_indices(centers, aabb, res)
    expected = (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]
    assert jnp.array_equal(idx, expected)


def test_occupancy_update():
    aabb = jnp.array([[-1.0, -1, -1], [1.0, 1, 1]])
    grid = init_occupancy_grid(aabb, resolution=16)

    def density_fn(positions):
        # occupied only in sphere radius 0.5
        return jnp.where(
            jnp.linalg.norm(positions, axis=-1, keepdims=True) < 0.5, 100.0, 0.0
        )

    grid = update_occupancy_grid(grid, density_fn, jax.random.PRNGKey(0))
    binary = np.asarray(grid.binary).reshape(16, 16, 16)
    # center occupied, corners not
    assert binary[8, 8, 8]
    assert not binary[0, 0, 0]
    frac = binary.mean()
    assert 0.01 < frac < 0.3  # sphere fills ~6.5% of the cube


def test_occupancy_sampler_concentrates():
    aabb = jnp.array([[-1.0, -1, -1], [1.0, 1, 1]])
    grid = init_occupancy_grid(aabb, resolution=16)

    def density_fn(positions):
        return jnp.where(
            jnp.linalg.norm(positions, axis=-1, keepdims=True) < 0.5, 100.0, 0.0
        )

    grid = update_occupancy_grid(grid, density_fn, jax.random.PRNGKey(0))
    rb = RayBundle(
        origins=jnp.array([[0.0, 0, -3]]),
        directions=jnp.array([[0.0, 0, 1.0]]),
        pixel_area=jnp.ones((1, 1)),
        nears=jnp.full((1, 1), 0.1),
        fars=jnp.full((1, 1), 6.0),
    )
    sampler = OccupancyGridSampler(num_coarse_probes=64, num_samples=32)
    rs = sampler(rb, grid, key=jax.random.PRNGKey(1))
    mids = np.asarray((rs.frustums.starts + rs.frustums.ends) / 2)[0, :, 0]
    # ray hits sphere between t=2.5 and t=3.5; most samples should be there
    frac_in = ((mids > 2.4) & (mids < 3.6)).mean()
    assert frac_in > 0.7


def test_instant_ngp_trains(tmp_path):
    root = make_blender_fixture(tmp_path / "bl", hw=16)
    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    cfg = get_method("instant-ngp-bounded")
    cfg.dataparser = BlenderDataParserConfig(data=root)
    cfg.datamanager.train_num_rays_per_batch = 32
    m = cfg.model
    m.grid_resolution = 16
    m.grid_update_every = 2
    m.grid_warmup_steps = 1
    m.num_coarse_probes = 16
    m.num_samples_per_ray = 8
    m.log2_hashmap_size = 9
    m.max_res = 64
    pipeline, state, cfg = build_pipeline(cfg, use_mesh=False)
    key = jax.random.PRNGKey(0)
    for step in range(4):
        key, k1, k2 = jax.random.split(key, 3)
        state = pipeline.aux_update_fn(state, step, k1)
        state, metrics = pipeline.train_step(state, pipeline.datamanager.train_images, k2)
    assert np.isfinite(float(metrics["loss"]))
    assert state.aux is not None
    assert state.aux.binary.shape == (16**3,)


def test_eval_respects_configured_background():
    """A white-background protocol must render WHITE held-out backgrounds:
    with an untrained (near-zero-density) field, every pixel is ~background.
    Regression: eval used to hardcode black, scoring PSNR ~4 on white-bg
    datasets whose training PSNR was 27+."""
    from nerfstudio_tpu.models.instant_ngp import InstantNGPModel, InstantNGPModelConfig

    cfg = InstantNGPModelConfig(
        background_color="white", log2_hashmap_size=9, max_res=64,
        grid_resolution=16, num_samples_per_ray=8, num_coarse_probes=8,
        average_init_density=1e-8,  # empty field -> pure background render
    )
    aabb = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
    model = InstantNGPModel(config=cfg, scene_aabb=aabb, num_train_data=2, train=False)
    key = jax.random.PRNGKey(0)
    n = 16
    origins = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    rb = RayBundle(origins=origins, directions=dirs, pixel_area=jnp.full((n, 1), 1e-6))
    params = model.init(key, rb, key=key)
    out = model.apply(params, rb, key=key)
    # untrained density ~0 -> accumulation ~0 -> rgb ~ white background
    assert float(out["accumulation"].max()) < 0.2
    assert float(out["rgb"].min()) > 0.8
