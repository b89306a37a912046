"""Honest (chained) benchmark: per-level VMEM-resident gathers vs the round-1
single concatenated-table gather, at nerfacto scale.

nerfacto field: N = 4096 rays x 48 samples = 196,608 samples, L=16 levels,
8 corners, F=2 features -> 25.2M table accesses per forward.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


L, T, F = 16, 2**19, 2
N = 4096 * 48
M_per_level = 8 * N  # corner-gathers per level
M_total = L * M_per_level
key = jax.random.PRNGKey(0)

print(f"N={N} samples, {M_total/1e6:.1f}M total accesses")

big_table = jax.random.normal(key, (F, L * T), jnp.float32)
per_level = big_table.reshape(F, L, T).transpose(1, 0, 2)  # (L, F, T)
idx_big = jax.random.randint(key, (M_total,), 0, L * T, jnp.int32)
idx_lvl = jax.random.randint(key, (L, M_per_level), 0, T, jnp.int32)


@jax.jit
def gather_concat(tab, idx):
    return tab[:, idx].sum()


@jax.jit
def gather_per_level(tabs, idx):
    acc = 0.0
    for l in range(L):
        acc += tabs[l][:, idx[l]].sum()
    return acc


@jax.jit
def gather_per_level_bf16(tabs, idx):
    acc = jnp.float32(0)
    for l in range(L):
        acc += tabs[l][:, idx[l]].astype(jnp.float32).sum()
    return acc


dt = timeit(gather_concat, big_table, idx_big)
print(f"concat (F, L*T) single gather:      {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")

dt = timeit(gather_per_level, per_level, idx_lvl)
print(f"per-level loop f32:                 {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")

dt = timeit(gather_per_level_bf16, per_level.astype(jnp.bfloat16), idx_lvl)
print(f"per-level loop bf16:                {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")


# backward: per-level scatter-add, unsorted vs sorted
g = jax.random.normal(key, (L, M_per_level), jnp.float32)


@jax.jit
def scatter_per_level(idx, g):
    acc = []
    for l in range(L):
        acc.append(jnp.zeros((T,), jnp.float32).at[idx[l]].add(g[l]))
    return jnp.stack(acc)


@jax.jit
def scatter_per_level_sorted(idx, g):
    acc = []
    for l in range(L):
        si, sg = jax.lax.sort((idx[l], g[l]), num_keys=1)
        acc.append(jnp.zeros((T,), jnp.float32).at[si].add(sg, indices_are_sorted=True))
    return jnp.stack(acc)


@jax.jit
def scatter_concat(idx, g):
    return jnp.zeros((L * T,), jnp.float32).at[idx].add(g.reshape(-1))


dt = timeit(scatter_per_level, idx_lvl, g, iters=5)
print(f"per-level scatter-add unsorted:     {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")
dt = timeit(scatter_per_level_sorted, idx_lvl, g, iters=5)
print(f"per-level scatter-add sorted:       {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")
dt = timeit(scatter_concat, idx_big, g, iters=5)
print(f"concat scatter-add unsorted:        {dt*1e3:8.2f} ms  {dt/M_total*1e9:6.2f} ns/el")

# full hash_encode comparison: current op vs per-level restructure
import sys

sys.path.insert(0, "/root/repo")
from nerfstudio_tpu.ops.hash_grid import hash_encode, init_hash_table

pos = jax.random.uniform(key, (N, 3))
table = init_hash_table(key, L, T, F)

enc = jax.jit(
    lambda p, t: hash_encode(p, t, num_levels=L, min_res=16, max_res=2048, hash_table_size=T)
)
dt = timeit(enc, pos, table, iters=5)
print(f"hash_encode (round-1 op) fwd:       {dt*1e3:8.2f} ms")

loss = jax.jit(
    lambda p, t: hash_encode(
        p, t, num_levels=L, min_res=16, max_res=2048, hash_table_size=T
    ).sum()
)
gradf = jax.jit(jax.grad(loss, argnums=1))
dt = timeit(gradf, pos, table, iters=5)
print(f"hash_encode (round-1 op) fwd+bwd:   {dt*1e3:8.2f} ms")
