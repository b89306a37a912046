"""MLP / field head / embedding / distortion tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.field_components.activations import trunc_exp
from nerfstudio_tpu.field_components.embedding import Embedding
from nerfstudio_tpu.field_components.field_heads import (
    DensityFieldHead,
    PredNormalsFieldHead,
    RGBFieldHead,
)
from nerfstudio_tpu.field_components.mlp import MLP, MLPWithHashEncoding
from nerfstudio_tpu.field_components.spatial_distortions import SceneContraction
from nerfstudio_tpu.utils.math import Gaussians


def test_mlp_shapes_and_skip():
    mlp = MLP(in_dim=10, num_layers=4, layer_width=32, out_dim=7, skip_connections=(2,))
    x = jnp.ones((5, 10))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (5, 7)
    assert out.dtype == jnp.float32
    # skip layer consumes width+in_dim
    k = params["params"]["layers_2"]["kernel"]
    assert k.shape[0] == 32 + 10


def test_mlp_with_hash():
    m = MLPWithHashEncoding(num_levels=2, min_res=4, max_res=8, log2_hashmap_size=9,
                            num_layers=2, layer_width=16, out_dim=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6, 3)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (6, 4)


def test_field_heads():
    x = jnp.ones((5, 16))
    for head, dim, rng in [
        (RGBFieldHead(), 3, (0.0, 1.0)),
        (DensityFieldHead(), 1, (0.0, np.inf)),
    ]:
        params = head.init(jax.random.PRNGKey(0), x)
        out = head.apply(params, x)
        assert out.shape == (5, dim)
        assert float(out.min()) >= rng[0]
    head = PredNormalsFieldHead()
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert jnp.allclose(jnp.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_embedding_mean():
    emb = Embedding(in_dim=10, out_dim=4)
    idx = jnp.array([0, 3])
    params = emb.init(jax.random.PRNGKey(0), idx)
    out = emb.apply(params, idx)
    assert out.shape == (2, 4)
    mean = emb.apply(params, method=emb.mean)
    assert mean.shape == (4,)


def test_trunc_exp():
    x = jnp.array([0.0, 1.0, 100.0])
    y = trunc_exp(x)
    assert jnp.allclose(y[:2], jnp.exp(x[:2]))
    # gradient is clamped: at x=100 grad should be exp(15), not inf
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    assert jnp.isfinite(g).all()
    assert jnp.allclose(g[2], jnp.exp(15.0))


def test_scene_contraction():
    c = SceneContraction()
    inside = jnp.array([[0.5, 0.0, 0.0]])
    assert jnp.allclose(c(inside), inside)
    outside = jnp.array([[4.0, 0.0, 0.0]])
    out = c(outside)
    assert jnp.allclose(out, jnp.array([[2.0 - 1.0 / 4.0, 0.0, 0.0]]), atol=1e-5)
    # L-inf norm variant maps into [-2, 2]^3
    cinf = SceneContraction(order="inf")
    far = jnp.array([[100.0, 50.0, -100.0]])
    out = cinf(far)
    assert float(jnp.abs(out).max()) <= 2.0


def test_scene_contraction_gaussians():
    c = SceneContraction()
    g = Gaussians(mean=jnp.array([[3.0, 0.0, 0.0]]), cov=jnp.broadcast_to(jnp.eye(3) * 0.01, (1, 3, 3)))
    out = c(g)
    assert out.mean.shape == (1, 3)
    assert out.cov.shape == (1, 3, 3)
    # contraction shrinks covariance outside the unit ball
    assert float(jnp.trace(out.cov[0])) < 0.03
