"""SDFField geometric-initialization regression (r5 neus root cause).

The r4/r5 neus gates failed at ~12-13 dB because the SAL geometric init
zeroed the first layer's raw-xyz rows instead of the encoding rows (the
encoding appended xyz LAST while the init assumed it FIRST): the field
initialized with |grad sdf| ~ 10 and the eikonal term (0.1 x ~95) dominated
the rgb loss for thousands of steps. These tests pin the init contract from
the reference (nerfstudio/fields/sdf_field.py:215-247):

  * sdf(x) at init is approximately the sphere |x| - bias
  * |grad sdf| at init is approximately 1 (eikonal residual tiny)
  * weight norm is a reparametrization only: function at init is unchanged
  * the skip connection keeps shapes consistent at full and tiny widths
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

from nerfstudio_tpu.fields.sdf_field import SDFField


@pytest.fixture(scope="module")
def probe_points():
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (2048, 3), minval=-1.0, maxval=1.0)


def _init_and_eval(field, pts):
    params = field.init(jax.random.PRNGKey(1), pts, method=SDFField.forward_geonetwork)
    sdf = field.apply(params, pts, method=SDFField.forward_geonetwork)[..., 0]
    return params, np.asarray(sdf)


def test_geometric_init_is_sphere_sdf(probe_points):
    field = SDFField(num_images=4)
    _, sdf = _init_and_eval(field, probe_points)
    r = np.linalg.norm(np.asarray(probe_points), axis=-1)
    target = r - field.bias
    corr = np.corrcoef(sdf, target)[0, 1]
    # seed-dependent approximation quality; the broken init measured ~0 here
    assert corr > 0.9, f"init sdf is not a sphere (corr={corr:.3f})"
    assert np.sqrt(np.mean((sdf - target) ** 2)) < 0.35


def test_geometric_init_unit_gradient(probe_points):
    field = SDFField(num_images=4)
    params = field.init(
        jax.random.PRNGKey(1), probe_points, method=SDFField.forward_geonetwork
    )
    grad = field.apply(params, probe_points, method=SDFField.gradient)
    gn = np.linalg.norm(np.asarray(grad), axis=-1)
    eik = float(np.mean((gn - 1.0) ** 2))
    # the broken init measured eikonal ~95 here; the correct one ~0.01
    assert eik < 0.1, f"eikonal residual at init = {eik:.3f}"


def test_inside_outside_flips_sign(probe_points):
    field = SDFField(num_images=4, inside_outside=True)
    _, sdf = _init_and_eval(field, probe_points)
    r = np.linalg.norm(np.asarray(probe_points), axis=-1)
    corr = np.corrcoef(sdf, field.bias - r)[0, 1]
    assert corr > 0.9


def test_weight_norm_is_identity_at_init(probe_points):
    plain = SDFField(num_images=4, weight_norm=False)
    wn = SDFField(num_images=4, weight_norm=True)
    _, sdf_plain = _init_and_eval(plain, probe_points)
    _, sdf_wn = _init_and_eval(wn, probe_points)
    np.testing.assert_allclose(sdf_plain, sdf_wn, rtol=1e-4, atol=1e-5)


def test_tiny_width_drops_skip_but_runs(probe_points):
    # smoke-test configs shrink hidden_dim below the input dim; the skip
    # must be dropped (not crash with a negative pre-skip width)
    field = SDFField(num_images=2, hidden_dim=8, geo_feat_dim=8, num_layers=6)
    _, sdf = _init_and_eval(field, probe_points[:64])
    assert sdf.shape == (64,)
    assert np.all(np.isfinite(sdf))


def test_full_field_outputs_finite(probe_points):
    from nerfstudio_tpu.core.rays import Frustums, RaySamples

    n, s = 16, 8
    key = jax.random.PRNGKey(3)
    origins = jnp.zeros((n, s, 3))
    dirs = jax.random.normal(key, (n, s, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    starts = jnp.broadcast_to(jnp.linspace(0.1, 2.0, s)[None, :, None], (n, s, 1))
    ends = starts + 0.1
    rs = RaySamples(
        frustums=Frustums(
            origins=origins, directions=dirs, starts=starts, ends=ends,
            pixel_area=jnp.ones((n, s, 1)) * 1e-4,
        ),
        camera_indices=jnp.zeros((n, s, 1), jnp.int32),
        deltas=ends - starts,
        spacing_starts=starts, spacing_ends=ends,
    )
    field = SDFField(num_images=4, hidden_dim=32, geo_feat_dim=16, num_layers=4,
                     hidden_dim_color=16, num_layers_color=2)
    params = field.init(jax.random.PRNGKey(4), rs)
    out = field.apply(params, rs)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), f"{k} has non-finite values"
