"""End-to-end quality regression for instant-ngp on the white-background
blender protocol (reference tests/test_nerfacto_integration.py:51-86 gate
pattern, scaled to a tiny fixture).

Guards the r3 shipped-defaults failure (benchmarks/gate_instant_ngp_blender
PSNR 3.41): GT is pre-blended onto the dataparser's alpha_color (white) at
load, so eval predictions must composite onto that SAME color. A black-bg
eval render of a converged model scores PSNR ~4 on this protocol — the
existing test_instant_ngp.py checks occupancy mechanics, not end-to-end
quality, and missed it.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import pytest

from tests.fixtures import make_blender_fixture


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    return make_blender_fixture(tmp_path_factory.mktemp("blender"), n_train=6, n_val=2, hw=24)


def _tiny(cfg):
    m = cfg.model
    # this test guards the white-bg COMPOSITING regression; pin the bounded
    # sampling path so it isn't confounded by the contraction default's
    # near-camera floater overfit on a 6-view 24px fixture (r5 ablation:
    # train 45 dB / eval 12 dB at this scale — scale-specific, the 200^2
    # 40-view gate cells measure the shipped contraction default)
    m.disable_scene_contraction = True
    m.log2_hashmap_size = 12
    m.max_res = 128
    m.num_coarse_probes = 32
    m.num_samples_per_ray = 24
    m.grid_resolution = 32
    m.grid_warmup_steps = 50
    # 256 rays / 120 steps measure PSNR ~37 on this fixture (r5) — an order
    # of magnitude above both the 11.0 floor and the ~4 dB broken regime, at
    # a third of the 512-ray/400-step cost on the 1-CPU CI box
    cfg.datamanager.train_num_rays_per_batch = 256
    return cfg


def test_instant_ngp_blender_protocol_quality(blender_dir):
    """Train ~400 steps on the RGBA/white fixture; eval PSNR must clear a
    floor no black-vs-white background mismatch can reach."""
    from nerfstudio_tpu.configs.method_configs import get_method
    from nerfstudio_tpu.data.dataparsers.blender_dataparser import BlenderDataParserConfig
    from nerfstudio_tpu.pipelines.factory import build_pipeline

    cfg = _tiny(get_method("instant-ngp"))
    cfg.dataparser = BlenderDataParserConfig(data=blender_dir)
    cfg.data = blender_dir

    pipeline, state, cfg = build_pipeline(cfg, use_mesh=False)
    key = jax.random.PRNGKey(0)
    aux_hook = pipeline.aux_update_fn
    # 120 steps: the regimes this test separates sit far apart well before
    # convergence (white-composited ~37 dB measured here vs background-
    # mismatch ~4 dB), and the corner-whiteness check below is the direct
    # compositing guard — the original 400-step/512-ray version measured
    # 445 s of the 26-min cold suite (r5) for no extra regression power
    for step in range(120):
        key, k_aux, k = jax.random.split(key, 3)
        if aux_hook is not None:
            state = aux_hook(state, step, k_aux)
        state, m = pipeline.train_step(state, pipeline.datamanager.train_images, k)
    assert np.isfinite(float(m["loss"]))

    metrics, images = pipeline.get_eval_image_metrics_and_images(state, 0, chunk_size=1 << 12)
    # a correct model on this trivial sphere clears 11 by 150 steps; the
    # background-mismatch failure mode scores ~4 (white GT vs black bg)
    assert metrics["psnr"] > 11.0, f"blender-protocol eval broke: {metrics}"

    # the void region of the render must actually be WHITE (composited onto
    # the dataparser's alpha_color), not black
    img = images["img"]  # [gt | pred] side by side, float [0,1]
    pred = img[:, img.shape[1] // 2 :]
    corner = pred[:2, -2:]  # top-right corner is void on every fixture view
    assert corner.mean() > 0.8, f"void pixels not white: mean={corner.mean():.3f}"
