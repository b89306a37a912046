"""Bench trilerp-reduce formulations for the block-packed hash layout.

Variants for fwd (gather row + apply 8 corner weights -> (M, f)):
  A) masked per-feature jnp.sum reductions (round-2 fused op — slow: XLA
     emits one full (M,128) pass per reduction)
  B) w_lane*vals @ P(128,f) matmul reduce (MXU, one pass)
  C) old: (M,8,f) via 32 masked reduces + outside weighted sum
Backward variants for d_table+d_w8 analogous.
"""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

M = 262144
S = 16384
F = 4
key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (S, 128), jnp.float32)
rows = jax.random.randint(key, (M,), 0, S)
slot = jax.random.randint(jax.random.fold_in(key, 1), (M,), 0, 4)
w8 = jax.random.uniform(jax.random.fold_in(key, 2), (M, 8))
g = jax.random.normal(jax.random.fold_in(key, 3), (M, F))

lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
blk_of_lane = lane // (8 * F)
corner_of_lane = (lane % (8 * F)) // F
feat_of_lane = lane % F
# one-hot projection matrices (static)
P_feat = (feat_of_lane.reshape(128, 1) == jnp.arange(F).reshape(1, F)).astype(jnp.bfloat16)
P_corner = (corner_of_lane.reshape(128, 1) == jnp.arange(8).reshape(1, 8)).astype(jnp.bfloat16)


def w_lane_of(w8, slot):
    wl = jnp.zeros((M, 128), jnp.float32)
    for c in range(8):
        wl = jnp.where(corner_of_lane == c, w8[:, c : c + 1], wl)
    return jnp.where(blk_of_lane == slot[:, None], wl, 0.0)


@jax.jit
def fwd_A(table, rows, slot, w8):
    vals = table.astype(jnp.bfloat16)[rows]
    wl = w_lane_of(w8, slot)
    wv = wl * vals.astype(jnp.float32)
    outs = [jnp.sum(jnp.where(feat_of_lane == i, wv, 0.0), axis=-1) for i in range(F)]
    return jnp.stack(outs, axis=-1)


@jax.jit
def fwd_B(table, rows, slot, w8):
    vals = table.astype(jnp.bfloat16)[rows]
    wv = (w_lane_of(w8, slot) * vals.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(wv, P_feat, preferred_element_type=jnp.float32)


@jax.jit
def fwd_C(table, rows, slot, w8):
    vals = table.astype(jnp.bfloat16)[rows]
    sel = jnp.where(blk_of_lane == slot[:, None], vals, 0)
    outs = []
    for c in range(8):
        outs.append(
            jnp.stack(
                [
                    jnp.sum(jnp.where((corner_of_lane == c) & (feat_of_lane == i), sel, 0).astype(jnp.float32), axis=-1)
                    for i in range(F)
                ],
                axis=-1,
            )
        )
    feats8 = jnp.stack(outs, axis=1)
    return jnp.einsum("mc,mcf->mf", w8, feats8)


@jax.jit
def bwd_B(table, rows, slot, w8, g):
    """d_table scatter + d_w8 via matmul."""
    g_lane = jnp.dot(g.astype(jnp.bfloat16), P_feat.T, preferred_element_type=jnp.float32)
    wl = w_lane_of(w8, slot)
    dtab = jnp.zeros((S, 128), jnp.float32).at[rows].add(wl * g_lane)
    vals = table.astype(jnp.bfloat16)[rows].astype(jnp.float32)
    gv = (jnp.where(blk_of_lane == slot[:, None], g_lane * vals, 0.0)).astype(jnp.bfloat16)
    dw8 = jnp.dot(gv, P_corner, preferred_element_type=jnp.float32)
    return dtab, dw8


@jax.jit
def bwd_scatter_only(table, rows, slot, w8, g):
    g_lane = jnp.dot(g.astype(jnp.bfloat16), P_feat.T, preferred_element_type=jnp.float32)
    wl = w_lane_of(w8, slot)
    return jnp.zeros((S, 128), jnp.float32).at[rows].add(wl * g_lane)


def timeit(fn, *args, n=20):
    out = fn(*args)
    # scalar-only host readback (full-array device_get over the tunnel would
    # dominate the timing)
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    for l in jax.tree_util.tree_leaves(out):
        np.asarray(l.ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000
    return dt


a = fwd_A(table, rows, slot, w8)
b = fwd_B(table, rows, slot, w8)
c = fwd_C(table, rows, slot, w8)
print("fwd agreement A-B:", float(jnp.max(jnp.abs(a - b))), "A-C:", float(jnp.max(jnp.abs(a - c))))

print(f"fwd_A masked-reduce : {timeit(fwd_A, table, rows, slot, w8):7.2f} ms")
print(f"fwd_B matmul-reduce : {timeit(fwd_B, table, rows, slot, w8):7.2f} ms")
print(f"fwd_C old (M,8,f)   : {timeit(fwd_C, table, rows, slot, w8):7.2f} ms")
print(f"bwd_B dtab+dw8      : {timeit(bwd_B, table, rows, slot, w8, g):7.2f} ms")
print(f"bwd scatter only    : {timeit(bwd_scatter_only, table, rows, slot, w8, g):7.2f} ms")


@jax.jit
def fwd_B32(table, rows, slot, w8):
    vals = table.astype(jnp.bfloat16)[rows]
    wv = w_lane_of(w8, slot) * vals.astype(jnp.float32)
    return jnp.dot(wv, P_feat.astype(jnp.float32), preferred_element_type=jnp.float32)


import time as _t
t0 = _t.perf_counter()
fwd_B32(table, rows, slot, w8)
print(f"fwd_B32 compile+run: {_t.perf_counter()-t0:.1f} s")
print(f"fwd_B32 f32 matmul  : {timeit(fwd_B32, table, rows, slot, w8):7.2f} ms")
