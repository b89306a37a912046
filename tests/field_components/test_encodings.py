"""Encoding tests (mirrors reference tests/field_components/test_encodings.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.field_components.encodings import (
    HashEncoding,
    Identity,
    KPlanesEncoding,
    NeRFEncoding,
    SHEncoding,
    ScalingAndOffset,
    TensorCPEncoding,
    TensorVMEncoding,
    TriplaneEncoding,
    polyhedron_ff_encoding,
    rff_encoding,
)


def _init_apply(module, x, rng_seed=0):
    params = module.init(jax.random.PRNGKey(rng_seed), x)
    return module.apply(params, x), params


def test_identity_and_scaling():
    x = jnp.ones((4, 3))
    out, _ = _init_apply(Identity(in_dim=3), x)
    assert jnp.allclose(out, x)
    out, _ = _init_apply(ScalingAndOffset(in_dim=3, scaling=2.0, offset=1.0), x)
    assert jnp.allclose(out, 3.0)


def test_nerf_encoding():
    enc = NeRFEncoding(in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0)
    x = jnp.zeros((8, 3))
    out, _ = _init_apply(enc, x)
    assert out.shape == (8, enc.get_out_dim())
    assert enc.get_out_dim() == 3 * 4 * 2
    # at x=0: sin(0)=0, cos(0)=1
    assert jnp.allclose(out[:, :12], 0.0, atol=1e-6)
    assert jnp.allclose(out[:, 12:], 1.0, atol=1e-6)


def test_nerf_encoding_integrated():
    enc = NeRFEncoding(in_dim=3, num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0)
    x = jnp.ones((8, 3)) * 0.3
    covs = jnp.broadcast_to(jnp.eye(3) * 0.1, (8, 3, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out_plain = enc.apply(params, x)
    out_ipe = enc.apply(params, x, covs)
    assert out_ipe.shape == out_plain.shape
    # integration shrinks magnitudes
    assert float(jnp.abs(out_ipe).mean()) < float(jnp.abs(out_plain).mean())


def test_hash_encoding_shapes_and_grad():
    enc = HashEncoding(num_levels=4, min_res=4, max_res=32, log2_hashmap_size=9, features_per_level=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 3)).astype(np.float32))
    out, params = _init_apply(enc, x)
    assert out.shape == (16, 8)
    assert enc.get_out_dim() == 8

    # gradient flows into the table
    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    table_grad = g["params"]["hash_table"]
    assert float(jnp.abs(table_grad).sum()) > 0


def test_hash_encoding_interpolation_continuity():
    """Encoding should be continuous: tiny position deltas -> tiny output deltas."""
    enc = HashEncoding(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=11)
    x = jnp.asarray([[0.37, 0.52, 0.61]])
    params = enc.init(jax.random.PRNGKey(0), x)
    a = enc.apply(params, x)
    b = enc.apply(params, x + 1e-5)
    assert float(jnp.abs(a - b).max()) < 1e-3


def test_sh_encoding():
    enc = SHEncoding(in_dim=3, levels=4)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out, _ = _init_apply(enc, dirs)
    assert out.shape == (2, 16)
    assert jnp.allclose(out[:, 0], 0.28209479, atol=1e-5)


def test_tensor_cp():
    enc = TensorCPEncoding(resolution=8, num_components=4)
    x = jnp.zeros((6, 3))
    out, _ = _init_apply(enc, x)
    assert out.shape == (6, 4)


def test_tensor_vm():
    enc = TensorVMEncoding(resolution=8, num_components=4)
    x = jnp.zeros((6, 3))
    out, _ = _init_apply(enc, x)
    assert out.shape == (6, 12)


def test_triplane():
    enc = TriplaneEncoding(resolution=8, num_components=16)
    x = jnp.zeros((6, 3))
    out, _ = _init_apply(enc, x)
    assert out.shape == (6, 16)


def test_kplanes_3d_and_4d():
    enc = KPlanesEncoding(resolution=(8, 8, 8), num_components=12)
    out, _ = _init_apply(enc, jnp.zeros((6, 3)))
    assert out.shape == (6, 12)
    enc4 = KPlanesEncoding(resolution=(8, 8, 8, 4), num_components=12, reduce="product")
    out4, _ = _init_apply(enc4, jnp.zeros((6, 4)))
    assert out4.shape == (6, 12)


def test_rff_and_polyhedron():
    enc = rff_encoding(in_dim=3, num_frequencies=16, scale=1.0)
    out, _ = _init_apply(enc, jnp.zeros((4, 3)))
    assert out.shape == (4, 32)
    enc2 = polyhedron_ff_encoding(num_frequencies=2, min_freq_exp=0.0, max_freq_exp=1.0)
    out2, _ = _init_apply(enc2, jnp.zeros((4, 3)))
    assert out2.shape == (4, enc2.get_out_dim())
