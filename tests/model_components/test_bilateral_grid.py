"""Bilateral grid (reference lib_bilagrid.py) unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.model_components.bilateral_grid import (
    bilateral_grid_tv_loss,
    color_correct,
    init_bilateral_grid,
    slice_bilateral_grid,
)


def test_identity_grid_is_identity():
    grids = init_bilateral_grid(2)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
    out = slice_bilateral_grid(grids[0], rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_grid_learns_exposure_shift():
    """A few gradient steps on a constant exposure gain should converge."""
    grids = init_bilateral_grid(1)
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3), minval=0.1, maxval=0.6)
    target = jnp.clip(rgb * 1.4 + 0.05, 0, 1)

    def loss(g):
        return jnp.mean((slice_bilateral_grid(g[0], rgb) - target) ** 2)

    import optax

    tx = optax.adam(0.05)
    g = grids
    opt = tx.init(g)
    lf = jax.jit(jax.value_and_grad(loss))
    v0 = float(lf(g)[0])
    for _ in range(150):
        v, dg = lf(g)
        upd, opt = tx.update(dg, opt)
        g = optax.apply_updates(g, upd)
    assert float(v) < 0.02 * v0, (float(v), v0)


def test_tv_loss_zero_for_constant():
    grids = init_bilateral_grid(1)
    assert float(bilateral_grid_tv_loss(grids)) == 0.0
    noisy = grids + jax.random.normal(jax.random.PRNGKey(0), grids.shape) * 0.1
    assert float(bilateral_grid_tv_loss(noisy)) > 0


def test_color_correct_fixes_affine():
    rng = jax.random.PRNGKey(0)
    ref = jax.random.uniform(rng, (32, 32, 3))
    img = jnp.clip(ref * 0.8 + 0.07, 0, 1)
    fixed = color_correct(img, ref)
    before = float(jnp.mean((img - ref) ** 2))
    after = float(jnp.mean((fixed - ref) ** 2))
    assert after < before * 0.05


def test_splat_pipeline_with_bilateral_and_camera_opt(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from fixtures import make_blender_fixture

    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.pipelines.splat_pipeline import build_splat_pipeline

    root = make_blender_fixture(tmp_path, hw=16)
    config = get_method("splatfacto")
    config.dataparser = BlenderDataParserConfig(data=root)
    m = config.model
    m.max_gaussians = 128
    m.num_random = 32
    m.random_init = True
    m.random_scale = 2.0
    m.warmup_length = 100
    m.num_downscales = 0
    m.tile_chunk = 1
    m.max_per_tile = 32
    m.use_bilateral_grid = True
    m.camera_optimizer_mode = "SO3xR3"
    pipeline, state = build_splat_pipeline(config)
    assert "bilateral_grids" in state.params and "camera_opt" in state.params
    state = pipeline.train(state, 2, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(state.params["means"])).all()
    metrics, _ = pipeline.get_eval_image_metrics(state, 0)
    assert np.isfinite(metrics["psnr"])
