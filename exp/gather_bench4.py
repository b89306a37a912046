"""Row-gather strategy: table as (S, 128) rows; gather full rows (tile-aligned,
contiguous 512B) and select the wanted entry in-register via one-hot.

Honest timing via host readback (block_until_ready is unreliable through the
axon tunnel)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
T = 2**19  # entries per level
F = 2
M = 12_500_000  # corner accesses to time (half of nerfacto's 25M; scale x2)

ENTRIES_PER_ROW = 128 // F  # 64 entries of 2 features per 128-lane row
S = T // ENTRIES_PER_ROW  # 8192 rows

tab = jax.random.normal(key, (S, 128), jnp.float32)
idx = jax.random.randint(key, (M,), 0, T, jnp.int32)
g = jax.random.normal(key, (M, F), jnp.float32)


def bench(fn, *args, iters=5):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


@jax.jit
def row_gather_select(tab, idx):
    rows = idx // ENTRIES_PER_ROW  # (M,)
    slot = idx % ENTRIES_PER_ROW  # which entry within the row
    vals = tab[rows]  # (M, 128) — contiguous row gather
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // F  # entry id per lane
    feat = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % F
    mask = (lanes == slot[:, None]).astype(tab.dtype)
    f0 = jnp.sum(vals * mask * (feat == 0), axis=1)
    f1 = jnp.sum(vals * mask * (feat == 1), axis=1)
    return f0.sum() + f1.sum()


dt = bench(row_gather_select, tab, idx)
print(f"row-gather+select f32:   {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")

tab_bf = tab.astype(jnp.bfloat16)


@jax.jit
def row_gather_select_bf16(tab, idx):
    rows = idx // ENTRIES_PER_ROW
    slot = idx % ENTRIES_PER_ROW
    vals = tab[rows].astype(jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // F
    mask = (lanes == slot[:, None]).astype(jnp.float32)
    return jnp.sum(vals * mask)


dt = bench(row_gather_select_bf16, tab_bf, idx)
print(f"row-gather+select bf16:  {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")


# element gather baseline at same M (the round-1 path)
tab_t = jax.random.normal(key, (F, T), jnp.float32)


@jax.jit
def col_gather(tab_t, idx):
    return tab_t[:, idx].sum()


dt = bench(col_gather, tab_t, idx)
print(f"column element gather:   {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")


# scatter-add of rows (backward)
@jax.jit
def row_scatter(idx, g):
    rows = idx // ENTRIES_PER_ROW
    slot = idx % ENTRIES_PER_ROW
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // F
    feat = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % F
    mask = (lanes == slot[:, None]).astype(jnp.float32)
    vals = mask * (g[:, 0:1] * (feat == 0) + g[:, 1:2] * (feat == 1))  # (M,128)
    return jnp.zeros((S, 128), jnp.float32).at[rows].add(vals)


dt = bench(row_scatter, idx, g, iters=3)
print(f"row scatter-add f32:     {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")


# sorted row scatter
@jax.jit
def row_scatter_sorted(idx, g):
    rows = idx // ENTRIES_PER_ROW
    slot = idx % ENTRIES_PER_ROW
    rs, ss, g0, g1 = jax.lax.sort((rows, slot, g[:, 0], g[:, 1]), num_keys=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // F
    feat = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) % F
    mask = (lanes == ss[:, None]).astype(jnp.float32)
    vals = mask * (g0[:, None] * (feat == 0) + g1[:, None] * (feat == 1))
    return jnp.zeros((S, 128), jnp.float32).at[rs].add(vals, indices_are_sorted=True)


dt = bench(row_scatter_sorted, idx, g, iters=3)
print(f"row scatter-add sorted:  {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")


# element scatter baselines (round-1 path)
@jax.jit
def elem_scatter_sorted(idx, g):
    si, g0 = jax.lax.sort((idx, g[:, 0]), num_keys=1)
    return jnp.zeros((T,), jnp.float32).at[si].add(g0, indices_are_sorted=True)


dt = bench(elem_scatter_sorted, idx, g, iters=3)
print(f"elem scatter sorted(1f): {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/access")


# honest sort cost
@jax.jit
def just_sort(idx, g):
    return jax.lax.sort((idx, g[:, 0], g[:, 1]), num_keys=1)


dt = bench(just_sort, idx, g, iters=3)
print(f"lax.sort 3 ops:          {dt*1e3:8.2f} ms  {dt/M*1e9:5.2f} ns/el")
