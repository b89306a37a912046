"""Unit tests for the pure-jax SDS math and view-dependent prompting
(reference: generative/stable_diffusion.py schedulers + DreamFusion SDS;
positional_text_embeddings.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.generative.positional_text_embeddings import PositionalTextEmbeddings
from nerfstudio_tpu.generative.schedules import (
    DDPMSchedule,
    classifier_free_guidance,
    sample_timestep,
    sds_gradient,
)


def test_schedule_alphas_monotone():
    for kind in ("scaled_linear", "linear"):
        s = DDPMSchedule(kind=kind)
        a = np.asarray(s.alphas_cumprod())
        assert a.shape == (1000,)
        assert np.all(np.diff(a) < 0)
        assert 0 < a[-1] < a[0] < 1


def test_add_noise_limits():
    s = DDPMSchedule()
    x0 = jnp.ones((4, 4, 3))
    eps = jnp.full((4, 4, 3), 2.0)
    near_clean = s.add_noise(x0, eps, jnp.asarray(0))
    assert float(jnp.abs(near_clean - x0).max()) < 0.1
    # late t: mostly noise
    late = s.add_noise(x0, eps, jnp.asarray(999))
    assert float(jnp.abs(late - eps).max()) < 0.7


def test_sds_weight_increases_with_t():
    s = DDPMSchedule()
    w = [float(s.sds_weight(jnp.asarray(t))) for t in (10, 300, 900)]
    assert w == sorted(w)
    assert 0 < w[0] < w[-1] < 1


def test_timestep_band():
    s = DDPMSchedule()
    ts = [int(sample_timestep(jax.random.PRNGKey(i), s)) for i in range(50)]
    assert min(ts) >= 20 and max(ts) < 980


def test_cfg_golden():
    u = jnp.zeros((2, 2))
    c = jnp.ones((2, 2))
    out = classifier_free_guidance(u, c, 7.5)
    assert float(out[0, 0]) == pytest.approx(7.5)


def test_sds_gradient_is_weighted_residual():
    s = DDPMSchedule()
    eps_pred = jnp.ones((3, 3))
    noise = jnp.zeros((3, 3))
    t = jnp.asarray(500)
    g = sds_gradient(s, eps_pred, noise, t)
    assert float(g[0, 0]) == pytest.approx(float(s.sds_weight(t)))


class _FakeDiffusion:
    def get_text_embeds(self, prompt, negative_prompt=""):
        # distinct constant embedding per direction keyword
        for i, k in enumerate(("base", "top", "side", "back", "front")):
            if k in prompt:
                return np.full((2, 4), float(i + 1), np.float32)
        return np.zeros((2, 4), np.float32)


def _pte(mode):
    return PositionalTextEmbeddings(
        "base", "top", "side", "back", "front", _FakeDiffusion(), mode
    )


def test_discrete_selection():
    p = _pte("discrete")
    assert float(p.get_text_embedding(10, 0)[0, 0]) == 2.0  # top
    assert float(p.get_text_embedding(80, 0)[0, 0]) == 5.0  # front
    assert float(p.get_text_embedding(80, 90)[0, 0]) == 3.0  # side
    assert float(p.get_text_embedding(80, 180)[0, 0]) == 4.0  # back
    assert float(p.get_text_embedding(80, 270)[0, 0]) == 3.0  # side
    assert float(p.get_text_embedding(80, -10)[0, 0]) == 5.0  # wraps to 350 -> front


def test_interpolated_blends():
    p = _pte("interpolated")
    # at v=90 (no top blend), h=45: halfway front(5)/side(3) -> 4
    e = p.get_text_embedding(90, 45)
    assert float(e[0, 0]) == pytest.approx(4.0, abs=1e-5)
    # v=0 -> pure top
    e0 = p.get_text_embedding(0, 45)
    assert float(e0[0, 0]) == pytest.approx(2.0, abs=1e-5)


def test_off_returns_base():
    p = _pte("off")
    assert float(p.get_text_embedding(80, 123)[0, 0]) == 1.0
