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


def test_corner_subsampled_bwd_unbiased():
    """bwd_corner_sample: forward is identical; the one-tetrahedron gradient
    estimator agrees with the full trilerp gradient in aggregate (unbiased,
    ~half the scatter accesses)."""
    L, T, F = 2, 4096, 2
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (20000, 3))
    kw = dict(num_levels=L, min_res=4, max_res=8, hash_table_size=T)

    out_full = hash_encode(pos, table, **kw)
    out_cs = hash_encode(pos, table, bwd_corner_sample=True, **kw)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_cs), atol=1e-5)

    g_full = jax.grad(lambda t: hash_encode(pos, t, **kw).sum())(table)
    g_cs = jax.grad(
        lambda t: hash_encode(pos, t, bwd_corner_sample=True, **kw).sum()
    )(table)
    gf = np.asarray(g_full).ravel()
    gc = np.asarray(g_cs).ravel()
    assert np.isfinite(gc).all()
    # aggregate agreement: same total mass and high cosine similarity (the
    # estimator is exact in expectation; with 20k samples over a 9^3 coarse
    # grid each entry averages many coins)
    assert abs(gc.sum() - gf.sum()) / (abs(gf.sum()) + 1e-6) < 0.05
    cos = float((gf * gc).sum() / (np.linalg.norm(gf) * np.linalg.norm(gc) + 1e-9))
    assert cos > 0.95, cos


def test_stochastic_corner_unbiased():
    """stochastic_corner: one corner sampled with its trilerp probability —
    unbiased estimate of the full trilerp in expectation over positions."""
    L, T, F = 1, 4096, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (100000, 3))
    kw = dict(num_levels=L, min_res=4, max_res=4, hash_table_size=T)
    full = hash_encode(pos, table, **kw)
    stoch = hash_encode(pos, table, stochastic_corner=True, **kw)
    mf = np.asarray(full).mean(axis=0)
    ms = np.asarray(stoch).mean(axis=0)
    # population means agree (CLT tolerance); per-sample values differ
    np.testing.assert_allclose(ms, mf, atol=4e-3)
    assert np.abs(np.asarray(full) - np.asarray(stoch)).max() > 1e-3
    # gradients flow to the table and are finite
    g = jax.grad(
        lambda t: hash_encode(pos[:1000], t, stochastic_corner=True, **kw).sum()
    )(table)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def _reference_encode_block(pos, tab, L, min_res, max_res, T, F):
    """Independent numpy reference for the BLOCK layout (2x2x2 vertex blocks,
    entry = blk*8 + parity bits), exact 8-corner trilerp."""
    res_arr = compute_level_resolutions(L, min_res, max_res)
    epr = 128 // F
    nblocks = T // 8
    out = np.zeros((pos.shape[0], L * F))
    for l in range(L):
        res = int(res_arr[l])
        side = res + 1
        bs = (side + 1) // 2
        dense_b = bs**3 * 8 <= T
        sp = pos * res
        x0 = np.clip(np.floor(sp).astype(np.int64), 0, res - 1)
        o = np.clip(sp - x0, 0.0, 1.0)
        for corner in range(8):
            d = np.array([(corner >> 2) & 1, (corner >> 1) & 1, corner & 1])
            v = x0 + d
            b = v >> 1
            if dense_b:
                blk = (b[:, 0] * bs + b[:, 1]) * bs + b[:, 2]
            else:
                blk = (
                    (b[:, 0].astype(np.uint32) * np.uint32(_PRIMES[0]))
                    ^ (b[:, 1].astype(np.uint32) * np.uint32(_PRIMES[1]))
                    ^ (b[:, 2].astype(np.uint32) * np.uint32(_PRIMES[2]))
                ) % np.uint32(nblocks)
                blk = blk.astype(np.int64)
            e = blk * 8 + ((v[:, 0] & 1) << 2 | (v[:, 1] & 1) << 1 | (v[:, 2] & 1))
            w = np.prod(np.where(d[None, :] == 1, o, 1 - o), axis=1)
            for f in range(F):
                out[:, l * F + f] += w * tab[l, e // epr, (e % epr) * F + f]
    return out


@pytest.mark.parametrize("F,L,T", [(2, 3, 2048), (4, 3, 4096)])
def test_block_exact_matches_reference(F, L, T):
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(
        pos, table, num_levels=L, min_res=4, max_res=64, hash_table_size=T,
        block_exact=True,
    )
    tab_bf16 = np.asarray(jnp.asarray(table).astype(jnp.bfloat16).astype(jnp.float32))
    ref = _reference_encode_block(np.asarray(pos), tab_bf16, L, 4, 64, T, F)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_block_stochastic_exact_on_even_cells():
    """When the base cell is even on every axis the whole stencil fits one
    block: the stochastic path must return the EXACT trilerp (== block_exact)."""
    L, T, F = 2, 4096, 4
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    # res=8 and res=16: even base cells at both levels -> cells 4..5/8 etc.
    # pick positions whose base cell is even at BOTH levels: cell index at
    # res r is floor(x*r); choose x in [0.5, 0.625) -> cells 4 (res 8) and
    # 8,9 (res 16)... restrict to [0.5, 0.5625) -> cell 8 (even) at res 16.
    pos = jax.random.uniform(
        jax.random.PRNGKey(1), (256, 3), minval=0.5, maxval=0.5625 - 1e-6
    )
    kw = dict(num_levels=L, min_res=8, max_res=16, hash_table_size=T)
    out_s = hash_encode(pos, table, block=True, **kw)
    out_e = hash_encode(pos, table, block_exact=True, **kw)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_e), rtol=1e-4, atol=1e-5)


def test_block_stochastic_unbiased():
    """Population mean of the stochastic block estimator matches the exact
    block trilerp (per-axis rounding probability = fractional offset)."""
    L, T, F = 1, 4096, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (100000, 3))
    kw = dict(num_levels=L, min_res=4, max_res=4, hash_table_size=T)
    exact = hash_encode(pos, table, block_exact=True, **kw)
    stoch = hash_encode(pos, table, block=True, **kw)
    np.testing.assert_allclose(
        np.asarray(stoch).mean(axis=0), np.asarray(exact).mean(axis=0), atol=4e-3
    )
    assert np.abs(np.asarray(exact) - np.asarray(stoch)).max() > 1e-3


def test_block_table_gradcheck():
    """Finite-difference check of the block op's table gradient on even-cell
    positions (where the stochastic path is exact and deterministic)."""
    L, T, F = 2, 2048, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(
        jax.random.PRNGKey(1), (32, 3), minval=0.5, maxval=0.5625 - 1e-6
    )
    kw = dict(num_levels=L, min_res=8, max_res=16, hash_table_size=T)

    def loss(t):
        return (hash_encode(pos, t, block=True, **kw) ** 2).sum()

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    rng = np.random.default_rng(0)
    t0 = np.asarray(table)
    nz = np.argwhere(np.abs(np.asarray(g)) > 1e-6)
    assert len(nz) > 0
    for k in rng.choice(len(nz), size=min(5, len(nz)), replace=False):
        i = tuple(nz[k])
        # eps must clear the bf16 ulp (~2e-3 at |v|=0.5): the op gathers in
        # bf16, so a smaller perturbation is quantized away in the FD probe
        eps = 1.6e-2
        tp = t0.copy(); tp[i] += eps
        tm = t0.copy(); tm[i] -= eps
        fd = (loss(jnp.asarray(tp)) - loss(jnp.asarray(tm))) / (2 * eps)
        # relative tolerance: the FD probe itself carries bf16 rounding noise
        # of up to ~ulp/(2 eps) ~ 6% of the slope
        tol = 0.06 * max(1.0, abs(float(fd)))
        assert abs(float(g[i]) - float(fd)) < tol, (i, float(g[i]), float(fd))


def test_block_grad_aggregate_agreement():
    """Aggregate table gradient of the stochastic block path agrees with the
    exact block path (unbiased estimator, coarse grid, many samples)."""
    L, T, F = 1, 4096, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (20000, 3))
    kw = dict(num_levels=L, min_res=4, max_res=4, hash_table_size=T)
    g_e = jax.grad(lambda t: hash_encode(pos, t, block_exact=True, **kw).sum())(table)
    g_s = jax.grad(lambda t: hash_encode(pos, t, block=True, **kw).sum())(table)
    ge, gs = np.asarray(g_e).ravel(), np.asarray(g_s).ravel()
    assert np.isfinite(gs).all()
    assert abs(gs.sum() - ge.sum()) / (abs(ge.sum()) + 1e-6) < 0.05
    cos = float((ge * gs).sum() / (np.linalg.norm(ge) * np.linalg.norm(gs) + 1e-9))
    assert cos > 0.95, cos


def test_block_position_grads_flow():
    L, T, F = 2, 2048, 2
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.5)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.1, maxval=0.9)
    gp = jax.grad(
        lambda p: (
            hash_encode(p, table, num_levels=L, min_res=4, max_res=64,
                        hash_table_size=T, block=True) ** 2
        ).sum()
    )(pos)
    assert np.isfinite(np.asarray(gp)).all()
    assert float(jnp.abs(gp).sum()) > 0


def test_level_gated_backward():
    """Static level-subsampled backward (bwd_levels/bwd_scale): the forward
    is bit-identical, skipped levels get exactly zero table gradient, active
    levels get the full gradient x bwd_scale, position (trilerp-weight)
    gradients keep flowing on EVERY level, and a full round-robin cycle sums
    to cycle_period x the ungated gradient (unbiasedness)."""
    L, T, F = 4, 2**12, 4
    table = init_hash_table(jax.random.PRNGKey(0), L, T, F, scale=0.1)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=0.05, maxval=0.95)
    kw = dict(num_levels=L, min_res=16, max_res=256, hash_table_size=T, block=True)

    def loss(tab, p, bl=None, sc=1.0):
        out = hash_encode(p, tab, **kw, bwd_levels=bl, bwd_scale=sc)
        return jnp.sum(out * jnp.arange(out.size).reshape(out.shape))

    o_full = hash_encode(pos, table, **kw)
    o_gate = hash_encode(pos, table, **kw, bwd_levels=(0, 2), bwd_scale=2.0)
    assert np.array_equal(np.asarray(o_full), np.asarray(o_gate))

    g_full = np.asarray(jax.grad(loss)(table, pos))
    g_gate = np.asarray(jax.grad(lambda t: loss(t, pos, (0, 2), 2.0))(table))
    for l in range(L):
        if l in (0, 2):
            np.testing.assert_allclose(g_gate[l], 2.0 * g_full[l], rtol=1e-6)
        else:
            assert np.all(g_gate[l] == 0.0), f"level {l} table grad leaked"

    # position grads (the camera-opt pose path) stay EXACT under gating
    gp_full = np.asarray(jax.grad(loss, argnums=1)(table, pos))
    gp_gate = np.asarray(
        jax.grad(lambda t, p: loss(t, p, (0, 2), 2.0), argnums=1)(table, pos)
    )
    np.testing.assert_allclose(gp_gate, gp_full, rtol=1e-6)

    # unbiasedness over one period-2 round-robin cycle
    g1 = np.asarray(jax.grad(lambda t: loss(t, pos, (1, 3), 2.0))(table))
    np.testing.assert_allclose(g_gate + g1, 2.0 * g_full, rtol=1e-6)
