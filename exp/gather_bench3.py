"""Chained-dependency gather benchmark: each iteration's indices depend on the
previous result, so the runtime cannot overlap or elide anything."""

import time

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
L, T, F = 16, 2**19, 2
N = 4096 * 48
M = 8 * N * L  # 25.2M

big = jax.random.normal(key, (F, L * T), jnp.float32)
idx0 = jax.random.randint(key, (M,), 0, L * T, jnp.int32)


@jax.jit
def step_concat(idx, tab):
    vals = tab[:, idx]  # (F, M)
    # derive next indices from the values (forces dependency)
    nxt = (idx + (vals[0] * 1e6).astype(jnp.int32)) % (L * T)
    return nxt, vals.sum()


@jax.jit
def step_per_level(idx, tabs):
    # idx: (L, M//L)
    acc = jnp.float32(0)
    outs = []
    for l in range(L):
        v = tabs[l][:, idx[l]]
        acc += v.sum()
        outs.append((idx[l] + (v[0] * 1e6).astype(jnp.int32)) % T)
    return jnp.stack(outs), acc


def chained(fn, idx, tab, iters=10):
    idx, s = fn(idx, tab)  # warmup/compile
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        idx, s = fn(idx, tab)
    jax.block_until_ready(s)
    jax.block_until_ready(idx)
    return (time.perf_counter() - t0) / iters


dt = chained(step_concat, idx0, big)
print(f"CHAINED concat gather:    {dt*1e3:8.2f} ms   {dt/M*1e9:6.2f} ns/el")

tabs = big.reshape(F, L, T).transpose(1, 0, 2)
idxl = jax.random.randint(key, (L, M // L), 0, T, jnp.int32)
dt = chained(step_per_level, idxl, tabs)
print(f"CHAINED per-level gather: {dt*1e3:8.2f} ms   {dt/M*1e9:6.2f} ns/el")

tabs_bf16 = tabs.astype(jnp.bfloat16)


@jax.jit
def step_per_level_bf16(idx, tabs):
    acc = jnp.float32(0)
    outs = []
    for l in range(L):
        v = tabs[l][:, idx[l]].astype(jnp.float32)
        acc += v.sum()
        outs.append((idx[l] + (v[0] * 1e6).astype(jnp.int32)) % T)
    return jnp.stack(outs), acc


dt = chained(step_per_level_bf16, idxl, tabs_bf16)
print(f"CHAINED per-level bf16:   {dt*1e3:8.2f} ms   {dt/M*1e9:6.2f} ns/el")
