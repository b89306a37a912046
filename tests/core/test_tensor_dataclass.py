"""TensorDataclass broadcasting/indexing tests (mirrors reference tests/utils/test_tensor_dataclass.py)."""

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import pytest

from nerfstudio_tpu.core.rays import Frustums, RayBundle, RaySamples
from nerfstudio_tpu.core.tensor_dataclass import TensorDataclass, tensor_dataclass


@tensor_dataclass
class Dummy(TensorDataclass):
    a: jnp.ndarray
    b: jnp.ndarray
    c: Optional[jnp.ndarray] = None
    d: Optional[Dict[str, jnp.ndarray]] = None

    _field_custom_dimensions = {"b": 2}


def test_broadcast():
    x = Dummy(a=jnp.ones((4, 3)), b=jnp.ones((1, 3, 4)))
    assert x.shape == (4,)
    assert x.a.shape == (4, 3)
    assert x.b.shape == (4, 3, 4)


def test_broadcast_2d():
    x = Dummy(a=jnp.ones((2, 4, 3)), b=jnp.ones((1, 1, 3, 4)))
    assert x.shape == (2, 4)
    assert x.b.shape == (2, 4, 3, 4)


def test_index_and_reshape():
    x = Dummy(a=jnp.ones((2, 4, 3)), b=jnp.ones((2, 4, 3, 4)))
    y = x[0]
    assert y.shape == (4,)
    assert y.b.shape == (4, 3, 4)
    z = x.reshape((8,))
    assert z.shape == (8,)
    f = x.flatten()
    assert f.shape == (8,)
    assert f.a.shape == (8, 3)


def test_dict_field():
    x = Dummy(a=jnp.ones((4, 3)), b=jnp.ones((4, 3, 4)), d={"m": jnp.ones((4, 7))})
    assert x.d["m"].shape == (4, 7)
    y = x[:2]
    assert y.d["m"].shape == (2, 7)


def test_pytree_roundtrip():
    x = Dummy(a=jnp.ones((4, 3)), b=jnp.ones((4, 3, 4)))
    leaves, treedef = jax.tree_util.tree_flatten(x)
    y = jax.tree_util.tree_unflatten(treedef, leaves)
    assert y.shape == (4,)
    assert jnp.allclose(y.a, x.a)


def test_jit_through():
    x = Dummy(a=jnp.ones((4, 3)), b=jnp.ones((4, 3, 4)))

    @jax.jit
    def f(d: Dummy):
        return d.replace(a=d.a * 2)

    y = f(x)
    assert jnp.allclose(y.a, 2.0)
    assert y.shape == (4,)


def test_raybundle_samples():
    rb = RayBundle(
        origins=jnp.zeros((8, 3)),
        directions=jnp.broadcast_to(jnp.array([0.0, 0, 1.0]), (8, 3)),
        pixel_area=jnp.ones((8, 1)),
    )
    assert rb.shape == (8,)
    bins = jnp.linspace(0, 1, 5)
    starts = jnp.broadcast_to(bins[:-1, None], (8, 4, 1))
    ends = jnp.broadcast_to(bins[1:, None], (8, 4, 1))
    rs = rb.get_ray_samples(starts, ends)
    assert rs.frustums.origins.shape == (8, 4, 3)
    assert rs.deltas.shape == (8, 4, 1)
    pos = rs.frustums.get_positions()
    assert pos.shape == (8, 4, 3)
    # weights sum <= 1, finite
    w = rs.get_weights(jnp.full((8, 4, 1), 10.0))
    assert w.shape == (8, 4, 1)
    assert jnp.all(w >= 0) and jnp.all(jnp.sum(w, axis=-2) <= 1.0 + 1e-5)


def test_weights_match_naive():
    """get_weights equals the explicit transmittance recurrence."""
    import numpy as np

    rng = np.random.default_rng(0)
    dens = jnp.asarray(rng.uniform(0, 5, (3, 6, 1)).astype("float32"))
    deltas = jnp.asarray(rng.uniform(0.01, 0.2, (3, 6, 1)).astype("float32"))
    rb = RayBundle(
        origins=jnp.zeros((3, 3)), directions=jnp.ones((3, 3)), pixel_area=jnp.ones((3, 1))
    )
    starts = jnp.cumsum(deltas, axis=-2) - deltas
    rs = rb.get_ray_samples(starts, starts + deltas)
    w = rs.replace(deltas=deltas).get_weights(dens)

    # naive reference
    alphas = 1 - np.exp(-np.asarray(dens) * np.asarray(deltas))
    T = np.ones((3, 1))
    w_ref = np.zeros_like(alphas)
    for i in range(6):
        w_ref[:, i] = T * alphas[:, i]
        T = T * (1 - alphas[:, i])
    assert jnp.allclose(w, w_ref, atol=1e-5)


def test_alphas_weights():
    alphas = jnp.array([[[0.5], [0.5], [0.5]]])
    w, T = RaySamples.get_weights_and_transmittance_from_alphas(alphas)
    assert jnp.allclose(w[0, :, 0], jnp.array([0.5, 0.25, 0.125]), atol=1e-5)
