"""Full 8-level field-encode fwd/bwd micro-bench: current per-level ops vs a
combined-projection design ((M, L*F) output assembled inside the matmuls,
corner-major (8, M) weights)."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

M = 262144
S = 16384
F = 4
L = 8
key = jax.random.PRNGKey(0)
tables = jax.random.normal(key, (L, S, 128), jnp.float32)
rows = jax.random.randint(key, (L, M), 0, S)
slot = jax.random.randint(jax.random.fold_in(key, 1), (L, M), 0, 4)
w8m = jax.random.uniform(jax.random.fold_in(key, 2), (L, M, 8))   # sample-major
w8c = jnp.swapaxes(w8m, 1, 2)                                     # corner-major (L, 8, M)
g = jax.random.normal(jax.random.fold_in(key, 3), (M, L * F))

lane = np.arange(128)
corner_of_lane = (lane % (8 * F)) // F
feat_of_lane = lane % F
blk_np = lane // (8 * F)
P_feat = jnp.asarray((feat_of_lane.reshape(128, 1) == np.arange(F).reshape(1, F)), jnp.float32)


def P_level(l):
    """(128, L*F): lane -> level-l column window."""
    E = np.zeros((128, L * F), np.float32)
    for i in range(F):
        E[feat_of_lane == i, l * F + i] = 1.0
    return jnp.asarray(E)


corner_iota = jnp.asarray(corner_of_lane.reshape(1, 128))
blk_iota = jnp.asarray(blk_np.reshape(1, 128))


def weighted_lanes_cm(x_lane, w8_l, slot_l):
    """corner-major weights (8, M)."""
    acc = jnp.zeros_like(x_lane)
    for c in range(8):
        acc = acc + jnp.where(corner_iota == c, w8_l[c][:, None] * x_lane, 0.0)
    return jnp.where(blk_iota == slot_l[:, None], acc, 0.0)


@jax.jit
def fwd_combined(tables, rows, slot, w8c):
    out = None
    for l in range(L):
        vals = tables[l].astype(jnp.bfloat16)[rows[l]]
        wv = weighted_lanes_cm(vals.astype(jnp.float32), w8c[l], slot[l])
        part = jnp.dot(wv, P_level(l), preferred_element_type=jnp.float32)
        out = part if out is None else out + part
    return out  # (M, L*F)


@jax.jit
def bwd_combined(tables, rows, slot, w8c, g):
    dtabs, dw8 = [], []
    for l in range(L):
        g_lane = jnp.dot(g, P_level(l).T, preferred_element_type=jnp.float32)
        dtab = jnp.zeros((S, 128), jnp.float32).at[rows[l]].add(
            weighted_lanes_cm(g_lane, w8c[l], slot[l])
        )
        vals = tables[l].astype(jnp.bfloat16)[rows[l]].astype(jnp.float32)
        gv = jnp.where(blk_iota == slot[l][:, None], g_lane * vals, 0.0)
        dw8.append(
            jnp.stack(
                [jnp.sum(jnp.where(corner_iota == c, gv, 0.0), axis=-1) for c in range(8)],
                axis=0,
            )
        )
        dtabs.append(dtab)
    return jnp.stack(dtabs), jnp.stack(dw8)


# current design, for comparison
from nerfstudio_tpu.ops.hash_grid import _row_gather_block_tw


@jax.jit
def fwd_current(tables, rows, slot, w8m):
    outs = []
    for l in range(L):
        outs.append(_row_gather_block_tw(tables[l], rows[l], slot[l], w8m[l], F))
    out = None
    for l, feats in enumerate(outs):
        part = jax.lax.pad(feats, jnp.zeros((), feats.dtype), [(0, 0, 0), (l * F, (L - 1 - l) * F, 0)])
        out = part if out is None else out + part
    return out


@jax.jit
def full_current(tables, rows, slot, w8m, g):
    def loss(tabs, w):
        return jnp.sum(fwd_current(tabs, rows, slot, w) * g)
    return jax.grad(loss, argnums=(0, 1))(tables, w8m)


@jax.jit
def full_combined(tables, rows, slot, w8c, g):
    o = fwd_combined(tables, rows, slot, w8c)
    dt, dw = bwd_combined(tables, rows, slot, w8c, g)
    return o, dt, dw


def timeit(fn, *args, n=20):
    out = fn(*args)
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l.ravel()[0])
    return (time.perf_counter() - t0) / n * 1000


a = fwd_current(tables, rows, slot, w8m)
b = fwd_combined(tables, rows, slot, w8c)
print("fwd agree:", float(jnp.max(jnp.abs(a - b))))

print(f"fwd current  : {timeit(fwd_current, tables, rows, slot, w8m):7.2f} ms")
print(f"fwd combined : {timeit(fwd_combined, tables, rows, slot, w8c):7.2f} ms")
print(f"fwd+bwd current (autodiff): {timeit(full_current, tables, rows, slot, w8m, g):7.2f} ms")
print(f"fwd+bwd combined          : {timeit(full_combined, tables, rows, slot, w8c, g):7.2f} ms")
