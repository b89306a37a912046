"""Multi-step scan dispatch: K steps in one jitted program must reproduce K
sequential single-step dispatches exactly (same rng schedule, in-graph
anneal/update-gate vs host-computed step kwargs).

Reference semantics: nerfacto proposal anneal + update gating
(reference nerfstudio/models/nerfacto.py:262-296, ray_samplers.py:601-609);
the scan is a TPU-side optimization hiding per-step dispatch latency.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import make_blender_fixture  # noqa: E402


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender_scan"), hw=16)


def _tiny_nerfacto(blender_dir):
    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    config = get_method("nerfacto")
    config.dataparser = BlenderDataParserConfig(data=blender_dir)
    config.data = blender_dir
    config.datamanager.train_num_rays_per_batch = 32
    m = config.model
    m.num_proposal_samples_per_ray = (8, 8)
    m.num_nerf_samples_per_ray = 8
    m.log2_hashmap_size = 9
    m.max_res = 32
    # compile-time shrinkers (the scan program replays the step body twice —
    # once straight-line, once as a scan — so op count matters double here)
    m.num_levels = 4
    m.hidden_dim = 8
    m.hidden_dim_color = 8
    m.occ_num_probes = 16
    m.occ_grid_resolution = 32
    m.occ_cells_per_update = 4096
    m.use_appearance_embedding = False
    # exercise the anneal + update-gate schedules inside the window
    m.proposal_warmup = 2
    m.proposal_update_every = 2
    m.proposal_weights_anneal_max_num_iters = 4
    return build_pipeline(config, use_mesh=False)


def test_scan_matches_sequential(blender_dir):
    from nerfstudio_tpu.models.nerfacto import NerfactoModel

    pipeline, state, config = _tiny_nerfacto(blender_dir)
    images = pipeline.datamanager.train_images
    base_key = jax.random.PRNGKey(3)
    n = 4

    # sequential: one dispatch per step, host-computed step kwargs
    seq_state = state
    for i in range(n):
        kwargs = NerfactoModel.step_kwargs(i, config.model)
        seq_state, seq_metrics = pipeline.train_step(
            seq_state, images, jax.random.fold_in(base_key, i), **kwargs
        )

    # scan: all steps in one program
    pipeline2, state2, config2 = _tiny_nerfacto(blender_dir)
    scan = pipeline2.build_train_step_scan(NerfactoModel, config2.model)
    scan_state, scan_metrics = scan(state2, images, base_key, n_steps=n)

    assert int(scan_state.step) == int(seq_state.step) == n
    np.testing.assert_allclose(
        # rtol: the trilerp matmul-reduce sums lanes in a different order than
        # the scan path's refused fusion, so losses differ in the last ~3 ulps
        float(scan_metrics["loss"]), float(seq_metrics["loss"]), rtol=1e-3
    )
    a = jax.tree_util.tree_leaves(seq_state.params)
    b = jax.tree_util.tree_leaves(scan_state.params)
    for x, y in zip(a, b):
        # XLA orders the trilerp lane-reduce matmul differently inside the
        # scan body than in the straight-line program; the tiny per-step
        # difference is amplified by Adam's grad/sqrt(v) on near-zero params,
        # so compare with an absolute floor rather than pure rtol.
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-2, atol=2e-2)


def test_scan_matches_sequential_sgd_tight(blender_dir):
    """Same scan-vs-sequential contract, but under plain SGD so the tiny
    XLA reduce-order drift is NOT amplified by Adam's grad/sqrt(v) on
    near-zero params — this one runs at tight tolerance and would catch a
    real scan-dispatch/donation bug (wrong rng schedule, stale state, wrong
    step kwargs) that the loose Adam check above cannot."""
    import optax

    from nerfstudio_tpu.models.nerfacto import NerfactoModel

    n = 3
    pipeline, state, config = _tiny_nerfacto(blender_dir)
    pipeline.tx = optax.sgd(1e-3)
    state = pipeline.init_state(jax.random.PRNGKey(0), params=state.params)
    images = pipeline.datamanager.train_images
    base_key = jax.random.PRNGKey(3)
    seq_state = state
    for i in range(n):
        kwargs = NerfactoModel.step_kwargs(i, config.model)
        seq_state, seq_metrics = pipeline.train_step(
            seq_state, images, jax.random.fold_in(base_key, i), **kwargs
        )

    pipeline2, state2, config2 = _tiny_nerfacto(blender_dir)
    pipeline2.tx = optax.sgd(1e-3)
    state2 = pipeline2.init_state(jax.random.PRNGKey(0), params=state2.params)
    scan = pipeline2.build_train_step_scan(NerfactoModel, config2.model)
    scan_state, scan_metrics = scan(state2, images, base_key, n_steps=n)

    assert int(scan_state.step) == int(seq_state.step) == n
    np.testing.assert_allclose(
        float(scan_metrics["loss"]), float(seq_metrics["loss"]), rtol=1e-4
    )
    a = jax.tree_util.tree_leaves(seq_state.params)
    b = jax.tree_util.tree_leaves(scan_state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-6)


def test_traced_step_kwargs_match_host():
    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.models.nerfacto import NerfactoModel

    cfg = get_method("nerfacto").model
    for step in [0, 1, 5, 100, 1000, 5000, 10000]:
        host = NerfactoModel.step_kwargs(step, cfg)
        traced = NerfactoModel.step_kwargs_traced(jnp.int32(step), cfg)
        np.testing.assert_allclose(
            float(traced["anneal"]), host["anneal"], rtol=1e-6
        )
        assert bool(traced["update_proposals"]) == bool(host["update_proposals"]), step
