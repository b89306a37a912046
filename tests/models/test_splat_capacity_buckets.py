"""Capacity buckets: splat state arrays are sized to a power-of-2 bucket
with 2x headroom over the live count, growing (one re-jit) at boundaries.

The r4 profile measured 290 ms/step at the full 300k padded capacity with
only 30k alive (projection + key sort over dead slots) vs 38 ms at a
fitting capacity — buckets are the TPU answer to gsplat's in-place param
resizing at production scale (reference splatfacto.py:343-356, :365-409).
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.models.splatfacto import (
    SplatfactoModel,
    SplatfactoModelConfig,
    capacity_bucket,
)
from nerfstudio_tpu.pipelines.splat_pipeline import SplatPipeline


def test_capacity_bucket_values():
    cfg = SplatfactoModelConfig(max_gaussians=300_000)
    assert capacity_bucket(10, cfg) == 256
    assert capacity_bucket(128, cfg) == 256
    assert capacity_bucket(129, cfg) == 512
    assert capacity_bucket(30_000, cfg) == 65_536
    assert capacity_bucket(200_000, cfg) == 300_000  # clamped to max
    tiny = SplatfactoModelConfig(max_gaussians=128)
    assert capacity_bucket(100, tiny) == 128


def _tiny_pipeline(n_seed=200, max_gaussians=4096):
    cfg = SplatfactoModelConfig(
        max_gaussians=max_gaussians,
        num_random=n_seed,
        random_init=True,
        random_scale=2.0,
        warmup_length=0,
        refine_every=1,
        num_downscales=0,
        densify_grad_thresh=0.0,  # densify aggressively so growth triggers
        max_refine_new=512,
        tile_chunk=1,
    )
    model = SplatfactoModel(cfg, scene_scale=1.0)
    rng = np.random.default_rng(0)
    hw = 16

    class _Cams:
        fx = jnp.full((2, 1), float(hw))
        fy = jnp.full((2, 1), float(hw))
        cx = jnp.full((2, 1), hw / 2.0)
        cy = jnp.full((2, 1), hw / 2.0)
        width = jnp.full((2, 1), hw, jnp.int32)
        height = jnp.full((2, 1), hw, jnp.int32)
        camera_to_worlds = jnp.asarray(
            np.stack([np.eye(3, 4, dtype=np.float32)] * 2)
        )

    imgs = jnp.asarray(rng.random((2, hw, hw, 3), dtype=np.float32))

    class _DM:
        config = SimpleNamespace(camera_sampling="random")
        train_cameras = _Cams()
        train_images = imgs
        train_dataset = [0, 0]
        _i = 0

        def __len__(self):
            return 2

        def next_train(self, step):
            i = self._i % 2
            self._i += 1
            return i, imgs[i]

    pipeline = SplatPipeline(_DM(), model, max_steps=100, mesh=None)
    state = pipeline.init_state(seed_points=None, scene_scale=1.0, seed=0)
    return pipeline, state, cfg


def test_init_state_uses_seed_bucket_not_max():
    pipeline, state, cfg = _tiny_pipeline(n_seed=200, max_gaussians=4096)
    # 200 seeds -> bucket 512 (2x headroom), NOT the 4096 max capacity
    assert state.params["means"].shape[0] == 512
    assert state.aux.alive.shape[0] == 512
    assert int(jnp.sum(state.aux.alive)) == 200


def test_grow_state_preserves_live_content_and_dead_slots():
    pipeline, state, cfg = _tiny_pipeline(n_seed=200, max_gaussians=4096)
    means_before = np.asarray(state.params["means"][:200])
    grown = pipeline.grow_state(state, 1024)
    assert grown.params["means"].shape[0] == 1024
    np.testing.assert_array_equal(np.asarray(grown.params["means"][:200]), means_before)
    # new slots: dead, opacity logit -10, unit quat
    assert not bool(jnp.any(grown.aux.alive[512:]))
    assert float(grown.params["opacities"][512:].max()) == -10.0
    assert float(grown.params["quats"][512:, 0].min()) == 1.0
    # optimizer moments padded to the new bucket
    for leaf in jax.tree_util.tree_leaves(grown.opt_state):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] in (512, 1024):
            assert leaf.shape[0] == 1024


def test_train_loop_grows_bucket_under_densification():
    pipeline, state, cfg = _tiny_pipeline(n_seed=200, max_gaussians=4096)
    cap0 = state.params["means"].shape[0]
    state = pipeline.train(state, 8, jax.random.PRNGKey(0))
    n_alive = int(jnp.sum(state.aux.alive))
    cap1 = state.params["means"].shape[0]
    assert cap1 >= cap0
    # the invariant the growth check maintains: capacity covers 2x live set
    # (or is pinned at max_gaussians)
    assert cap1 == 4096 or cap1 >= min(2 * n_alive, 4096) // 2
    assert np.isfinite(float(jnp.sum(state.params["means"])))
