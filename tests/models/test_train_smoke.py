"""End-to-end smoke train for every registered method (mirrors reference
tests/test_train.py:18-89: 2 iterations, tiny fixture, CPU)."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import make_blender_fixture  # noqa: E402

from nerfstudio_tpu.configs.method_configs import get_method, method_configs
from nerfstudio_tpu.pipelines.factory import build_pipeline, build_trainer

# splatfacto methods use the dedicated SplatPipeline (tested in
# test_splatfacto.py + test_splat_smoke below); generfacto uses the
# GenerativePipeline (test_generfacto_smoke below)
BLACKLIST = ["splatfacto", "splatfacto-big", "splatfacto-mcmc", "generfacto"]


def _shrink(config):
    """Tiny settings so 2 steps run fast on CPU."""
    config.trainer.max_num_iterations = 2
    config.trainer.steps_per_eval_image = 0
    config.trainer.steps_per_save = 0
    config.datamanager.train_num_rays_per_batch = 32
    m = config.model
    for attr, val in [
        ("num_coarse_samples", 4),
        ("num_importance_samples", 4),
        ("num_nerf_samples_per_ray", 4),
        ("num_proposal_samples_per_ray", (4, 4)),
        ("log2_hashmap_size", 9),
        ("max_res", 64),
        ("hidden_dim", 8),
        ("hidden_dim_color", 8),
        ("eval_num_rays_per_chunk", 64),
        # compile-time shrinkers: CPU XLA compile scales with program op
        # count — unrolled per-level hash code, probe counts, occupancy
        # update size, and SDF upsample rounds dominate the cold suite
        ("num_levels", 4),
        ("occ_num_probes", 16),
        ("occ_grid_resolution", 32),
        ("occ_cells_per_update", 4096),
        ("grid_resolution", 32),
        ("num_probes", 16),
        ("num_upsample_steps", 2),
        ("num_samples", 8),
        ("num_samples_importance", 8),
        ("num_samples_outside", 4),
        # the two proposal nets are 5-level hash fields — the unrolled
        # per-level code is a big share of the train program's op count
        ("proposal_net_args_list", (
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 32},
            {"hidden_dim": 8, "log2_hashmap_size": 9, "num_levels": 2, "max_res": 64},
        )),
        ("occ_num_probes", 16),
    ]:
        if hasattr(m, attr):
            setattr(m, attr, val)
    return config


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender"), hw=16)


@pytest.mark.parametrize("method", sorted(method_configs.keys()))
def test_smoke_train(method, blender_dir, tmp_path):
    if method in BLACKLIST:
        pytest.skip("blacklisted")
    config = get_method(method)
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config.data = blender_dir
    config.trainer.output_dir = tmp_path / "outputs"
    config = _shrink(config)

    pipeline, state, config = build_pipeline(config, use_mesh=False)
    ModelCls = config.model._target
    kwargs_fn = (
        (lambda step: ModelCls.step_kwargs(step, config.model))
        if hasattr(ModelCls, "step_kwargs")
        else (lambda step: {})
    )
    key = jax.random.PRNGKey(0)
    for step in range(2):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(
            state, pipeline.datamanager.train_images, k, **kwargs_fn(step)
        )
    assert np.isfinite(float(metrics["loss"])), f"{method} loss not finite"
    # step counter advanced
    assert int(state.step) == 2


def test_eval_render(blender_dir, tmp_path):
    """Chunked full-image render produces an (H, W, 3) image."""
    config = get_method("vanilla-nerf")
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config = _shrink(config)
    pipeline, state, config = build_pipeline(config, use_mesh=False)
    metrics, images = pipeline.get_eval_image_metrics_and_images(state, 0, chunk_size=64)
    assert "psnr" in metrics and np.isfinite(metrics["psnr"])
    assert images["img"].shape == (16, 32, 3)  # gt|pred side by side


def test_splat_smoke(blender_dir, tmp_path):
    """Two splatfacto steps + one refine through the splat pipeline."""
    import jax.numpy as jnp

    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.pipelines.splat_pipeline import build_splat_pipeline

    config = get_method("splatfacto")
    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    m = config.model
    m.max_gaussians = 128
    m.num_random = 32
    m.random_init = True
    m.random_scale = 2.0
    m.warmup_length = 0
    m.refine_every = 2
    m.max_refine_new = 16
    m.num_downscales = 0
    m.tile_chunk = 1
    m.max_per_tile = 32
    pipeline, state = build_splat_pipeline(config)
    key = jax.random.PRNGKey(0)
    state = pipeline.train(state, 3, key)
    assert int(state.step) == 3
    assert bool(jnp.isfinite(state.params["means"]).all())


def test_generfacto_smoke():
    """2-step generative (SDS) training with the stub guidance."""
    from nerfstudio_tpu.data.random_cameras_datamanager import RandomCamerasConfig
    from nerfstudio_tpu.pipelines.generative_pipeline import GenerativePipeline

    config = _shrink(get_method("generfacto"))
    config.model.num_samples_per_ray = 8
    config.random_cameras = RandomCamerasConfig(train_resolution=16, eval_resolution=16)
    pipeline = GenerativePipeline(config, seed=0)
    key = jax.random.PRNGKey(0)
    state = pipeline.init_state(key)
    for step in range(2):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(state, step, k)
    assert np.isfinite(float(metrics["loss"]))
    out = pipeline.render_eval_image(state, 0)
    assert out["rgb"].shape == (16, 16, 3)


def test_tensorf_progressive_upsampling(blender_dir):
    """Grid leaves must grow at milestone steps and training continues
    (reference tensorf.py:119-160)."""
    config = get_method("tensorf")
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config.datamanager.train_num_rays_per_batch = 16
    config.model.init_resolution = 8
    config.model.final_resolution = 16
    config.model.upsampling_iters = (2,)
    config.model.num_uniform_samples = 8
    config.model.num_samples = 4
    pipeline, state, config = build_pipeline(config, use_mesh=False)
    key = jax.random.PRNGKey(0)

    def plane_shape(params):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            if getattr(path[-1], "key", None) == "plane_coef":
                return leaf.shape
        raise AssertionError("no plane_coef leaf")

    assert plane_shape(state.params)[-1] == 8
    for step in range(4):
        state = pipeline.aux_update_fn(state, step, key)
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(state, pipeline.datamanager.train_images, k)
    assert plane_shape(state.params)[-1] == 16
    assert np.isfinite(float(metrics["loss"]))


def test_nerfacto_block_mode_smoke(blender_dir, tmp_path):
    """Block-packed hash tables (field_block + prop_block): two train steps
    plus an eval-image render through the EXACT block path."""
    config = get_method("nerfacto")
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config.data = blender_dir
    config.trainer.output_dir = tmp_path / "outputs"
    config = _shrink(config)
    config.model.field_block = True
    config.model.prop_block = True

    pipeline, state, config = build_pipeline(config, use_mesh=False)
    ModelCls = config.model._target
    key = jax.random.PRNGKey(0)
    for step in range(2):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(
            state, pipeline.datamanager.train_images, k,
            **ModelCls.step_kwargs(step, config.model),
        )
    assert np.isfinite(float(metrics["loss"]))
    metrics, images = pipeline.get_eval_image_metrics_and_images(state, 0, chunk_size=64)
    assert np.isfinite(metrics["psnr"])


def test_nerfacto_level_gated_backward_smoke(blender_dir, tmp_path):
    """field_bwd_level_period: static round-robin level gating trains with a
    finite loss across a full gate cycle, step_kwargs emits the expected
    static tuples (warmup -> full backward), and proposal_freeze_after turns
    the proposal-update gate off."""
    from nerfstudio_tpu.models.nerfacto import NerfactoModel

    config = get_method("nerfacto")
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig

    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config.data = blender_dir
    config.trainer.output_dir = tmp_path / "outputs"
    config = _shrink(config)
    # 2 levels: this test compiles 3-4 distinct static program variants
    # (warmup/odd/even/frozen) — the smallest field halves its 60 s cost
    config.model.num_levels = 2
    config.model.field_bwd_level_period = 2
    config.model.field_bwd_level_warmup = 1
    config.model.proposal_freeze_after = 3

    kw0 = NerfactoModel.step_kwargs(0, config.model)
    assert "field_bwd_levels" not in kw0  # warmup: full backward
    kw1 = NerfactoModel.step_kwargs(1, config.model)
    L = config.model.num_levels
    assert kw1["field_bwd_levels"] == tuple(l for l in range(L) if l % 2 == 1)
    assert kw1["field_bwd_scale"] == 2.0
    kw2 = NerfactoModel.step_kwargs(2, config.model)
    assert kw2["field_bwd_levels"] == tuple(l for l in range(L) if l % 2 == 0)
    assert NerfactoModel.step_kwargs(4, config.model)["update_proposals"] is False

    pipeline, state, config = build_pipeline(config, use_mesh=False)
    key = jax.random.PRNGKey(0)
    # 3 steps = warmup/odd/even gate variants (each its own XLA program —
    # the frozen-proposal variant is covered by the kw assertion above)
    for step in range(3):
        key, k = jax.random.split(key)
        state, metrics = pipeline.train_step(
            state, pipeline.datamanager.train_images, k,
            **NerfactoModel.step_kwargs(step, config.model),
        )
    assert np.isfinite(float(metrics["loss"]))
