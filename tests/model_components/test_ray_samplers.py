"""Sampler tests (mirrors reference tests/model_components/test_ray_sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.model_components.ray_samplers import (
    LinearDisparitySampler,
    LogSampler,
    PDFSampler,
    ProposalNetworkSampler,
    SqrtSampler,
    UniformLinDispPiecewiseSampler,
    UniformSampler,
)


def _bundle(n=4):
    return RayBundle(
        origins=jnp.zeros((n, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (n, 3)),
        pixel_area=jnp.ones((n, 1)),
        nears=jnp.full((n, 1), 2.0),
        fars=jnp.full((n, 1), 6.0),
    )


def test_uniform_sampler_deterministic():
    rb = _bundle()
    rs = UniformSampler(num_samples=8)(rb)  # no key -> deterministic bins
    assert rs.frustums.starts.shape == (4, 8, 1)
    assert jnp.allclose(rs.frustums.starts[:, 0, 0], 2.0, atol=1e-5)
    assert jnp.allclose(rs.frustums.ends[:, -1, 0], 6.0, atol=1e-5)
    # uniform spacing
    deltas = rs.deltas[0, :, 0]
    assert jnp.allclose(deltas, 0.5, atol=1e-5)


def test_uniform_sampler_stratified():
    rb = _bundle()
    rs = UniformSampler(num_samples=8)(rb, key=jax.random.PRNGKey(0))
    starts = rs.frustums.starts
    assert starts.shape == (4, 8, 1)
    # jittered but still ordered and in range
    assert bool(jnp.all(rs.frustums.ends >= rs.frustums.starts))
    assert float(starts.min()) >= 2.0 - 1e-5
    assert float(rs.frustums.ends.max()) <= 6.0 + 1e-5


def test_other_spacings():
    rb = _bundle()
    for sampler in [
        LinearDisparitySampler(8),
        SqrtSampler(8),
        LogSampler(8),
        UniformLinDispPiecewiseSampler(8),
    ]:
        rs = sampler(rb)
        assert rs.frustums.starts.shape == (4, 8, 1)
        assert bool(jnp.all(rs.deltas >= -1e-6))
        assert jnp.allclose(rs.frustums.starts[:, 0, 0], 2.0, atol=1e-4)
        assert jnp.allclose(rs.frustums.ends[:, -1, 0], 6.0, atol=1e-4)


def test_pdf_sampler_concentrates():
    """PDF sampling should place most new samples where weights are high."""
    rb = _bundle(n=2)
    coarse = UniformSampler(num_samples=16)(rb)
    # weights peaked in bins 8..11 (t in [4.0, 5.0])
    w = np.full((2, 16, 1), 1e-5, np.float32)
    w[:, 8:12] = 1.0
    fine = PDFSampler(num_samples=32, histogram_padding=0.0)(
        rb, coarse, jnp.asarray(w), key=jax.random.PRNGKey(0)
    )
    mids = np.asarray((fine.frustums.starts + fine.frustums.ends) / 2)[..., 0]
    frac_in_peak = ((mids > 4.0) & (mids < 5.0)).mean()
    assert frac_in_peak > 0.8


def test_pdf_sampler_include_original():
    rb = _bundle(n=2)
    coarse = UniformSampler(num_samples=8)(rb)
    w = jnp.ones((2, 8, 1))
    fine = PDFSampler(num_samples=8, include_original=True)(rb, coarse, w)
    # (8+1) original edges + (8+1) new edges -> 18 edges -> 17 samples
    assert fine.frustums.starts.shape[-2] == 17


def test_proposal_sampler():
    rb = _bundle(n=3)

    def density_fn(positions):
        # density blob at z=4
        return jnp.exp(-((positions[..., 2:3] - 4.0) ** 2))

    sampler = ProposalNetworkSampler(
        num_proposal_samples_per_ray=(16, 12),
        num_nerf_samples_per_ray=8,
        num_proposal_network_iterations=2,
    )
    rs, weights_list, rs_list = sampler(
        rb, [density_fn, density_fn], key=jax.random.PRNGKey(0)
    )
    assert rs.frustums.starts.shape == (3, 8, 1)
    assert len(weights_list) == 2
    assert len(rs_list) == 2
    assert weights_list[0].shape == (3, 16, 1)
    assert weights_list[1].shape == (3, 12, 1)


def test_proposal_sampler_stop_gradient():
    rb = _bundle(n=2)
    scale = jnp.ones(())

    def run(s, update):
        def density_fn(positions):
            return s * jnp.ones_like(positions[..., :1])

        sampler = ProposalNetworkSampler(
            num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=4,
            num_proposal_network_iterations=1,
        )
        _, weights_list, _ = sampler(rb, [density_fn], update_proposals=update)
        return jnp.sum(weights_list[0])

    g_on = jax.grad(run)(scale, True)
    g_off = jax.grad(run)(scale, False)
    assert float(jnp.abs(g_on)) > 0
    assert float(jnp.abs(g_off)) == 0
