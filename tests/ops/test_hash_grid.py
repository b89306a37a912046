"""Numerics tests for the row-packed hash-grid op: values against an
independent numpy trilinear-interpolation reference, gradients against finite
differences (the tcnn-vs-torch duality the reference tests rely on,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.ops.hash_grid import (
    _PRIMES,
    compute_level_resolutions,
    hash_encode,
    init_hash_table,
)


def _reference_encode(pos, tab, L, min_res, max_res, T, F):
    """Independent numpy trilinear reference."""
    res_arr = compute_level_resolutions(L, min_res, max_res)
    epr = 128 // F
    out = np.zeros((pos.shape[0], L * F))
    for l in range(L):
        res = int(res_arr[l])
        side = res + 1
        dense = side**3 <= T
        sp = pos * res
        x0 = np.floor(sp).astype(np.int64)
        o = sp - x0
        for corner in range(8):
            d = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
            c = x0 + d
            if dense:
                cc = np.clip(c, 0, side - 1)
                idx = (cc[:, 0] * side + cc[:, 1]) * side + cc[:, 2]
            else:
                idx = (
                    (c[:, 0].astype(np.uint32) * np.uint32(_PRIMES[0]))
                    ^ (c[:, 1].astype(np.uint32) * np.uint32(_PRIMES[1]))
                    ^ (c[:, 2].astype(np.uint32) * np.uint32(_PRIMES[2]))
                ) % np.uint32(T)
                idx = idx.astype(np.int64)
            w = np.prod(np.where(d[None, :] == 1, o, 1 - o), axis=1)
            for f in range(F):
                out[:, l * F + f] += w * tab[l, idx // epr, (idx % epr) * F + f]
    return out


@pytest.mark.parametrize("F,L,T", [(2, 4, 2048), (4, 3, 4096)])
def test_hash_encode_matches_trilinear_reference(F, L, T):
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(pos, table, num_levels=L, min_res=4, max_res=64, hash_table_size=T)
    # the op gathers in bf16 (tcnn-style fp16 tables): compare against the
    # reference computed on the bf16-quantized table
    import jax.numpy as jnp

    tab_bf16 = np.asarray(jnp.asarray(table).astype(jnp.bfloat16).astype(jnp.float32))
    ref = _reference_encode(np.asarray(pos), tab_bf16, L, 4, 64, T, F)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_hash_encode_table_gradcheck():
    L, T, F = 4, 2048, 2
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    def loss(t):
        return (
            hash_encode(pos, t, num_levels=L, min_res=4, max_res=64, hash_table_size=T) ** 2
        ).sum()

    g = jax.grad(loss)(table)
    rng = np.random.default_rng(0)
    t0 = np.asarray(table)
    for _ in range(5):
        i = (rng.integers(L), rng.integers(t0.shape[1]), rng.integers(128))
        eps = 1e-3
        tp = t0.copy()
        tp[i] += eps
        tm = t0.copy()
        tm[i] -= eps
        fd = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (2 * eps)
        assert abs(float(g[i]) - float(fd)) < 2e-2, (i, float(g[i]), float(fd))


def test_hash_encode_position_grads_flow():
    """Camera-optimizer path: gradients must flow through positions (via
    the trilerp weights)."""
    L, T, F = 4, 2048, 2
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.1, maxval=0.9)
    gp = jax.grad(
        lambda p: (
            hash_encode(p, table, num_levels=L, min_res=4, max_res=64, hash_table_size=T) ** 2
        ).sum()
    )(pos)
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gp).sum()) > 0


def test_hash_encode_continuity():
    """Trilerp must be continuous across voxel boundaries."""
    L, T, F = 2, 2048, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    eps = 1e-5
    base = jnp.array([[0.25 - eps, 0.5, 0.5], [0.25 + eps, 0.5, 0.5]])
    out = hash_encode(base, table, num_levels=L, min_res=4, max_res=8, hash_table_size=T)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-3)
