"""Micro-benchmarks for hash-table gather strategies on TPU (round 2).

Explores paths to beat the ~6-10 ns/element XLA feature-major gather floor
(PERF.md): Pallas take_along_axis (Mosaic dynamic_gather), one-hot matmul,
sorted-index XLA gather, bf16 tables. Run on the real chip:

    python exp/gather_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, dt, n_elements):
    print(f"{name:55s} {dt * 1e3:9.3f} ms  {dt / n_elements * 1e9:7.2f} ns/el")


def main():
    key = jax.random.PRNGKey(0)
    M = 4_000_000  # gathers
    T = 2**19  # table entries
    F = 2

    table = jax.random.normal(key, (F, T), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

    # 1. baseline: feature-major column gather (current hash_grid.py path)
    f1 = jax.jit(lambda t, i: t[:, i])
    report("xla column gather f32 (F,T)[:,idx]", timeit(f1, table, idx), M)

    # 1b. bf16 table
    f1b = jax.jit(lambda t, i: t[:, i])
    report("xla column gather bf16", timeit(f1b, table.astype(jnp.bfloat16), idx), M)

    # 1c. sorted indices
    idx_sorted = jnp.sort(idx)
    report("xla column gather f32 SORTED idx", timeit(f1, table, idx_sorted), M)

    # 2. row-major 1D gather baseline
    tab1d = table[0]
    f2 = jax.jit(lambda t, i: t[i])
    report("xla 1d gather t[idx] (per feature row)", timeit(f2, tab1d, idx), M)

    # 3. take_along_axis shaped (S,128): table as (T//128, 128), idx as rows
    #    out[i, l] = tab2d[rows[i, l], l] — needs idx pre-binned by lane.
    S = T // 128
    tab2d = table[0].reshape(S, 128)
    rows = jax.random.randint(key, (M // 128, 128), 0, S, jnp.int32)
    f3 = jax.jit(lambda t, r: jnp.take_along_axis(t, r % S, axis=0))
    try:
        dt = timeit(f3, tab2d, rows)
        report("xla take_along_axis (M/128,128) over (S,128)", dt, M)
    except Exception as e:
        print("take_along_axis XLA failed:", str(e)[:120])

    # 4. pallas take_along_axis kernel (table resident in VMEM)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CHUNK = 2048  # rows of output per grid step

    def gather_kernel(tab_ref, rows_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], rows_ref[:] % S, axis=0)

    @jax.jit
    def f4(tab, rows):
        n = rows.shape[0]
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((n, 128), tab.dtype),
            grid=(n // CHUNK,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(tab, rows)

    try:
        dt = timeit(f4, tab2d, rows)
        report("pallas take_along_axis VMEM-resident table", dt, M)
    except Exception as e:
        print("pallas take_along_axis failed:", str(e)[:300])

    # 5. one-hot matmul gather for small tables (T=4096)
    Ts = 4096
    tab_small = jax.random.normal(key, (Ts, 8), jnp.bfloat16)
    idx_small = jax.random.randint(key, (M,), 0, Ts, jnp.int32)

    @jax.jit
    def f5(tab, i):
        oh = jax.nn.one_hot(i, Ts, dtype=jnp.bfloat16)  # (M, Ts)
        return oh @ tab

    try:
        dt = timeit(f5, tab_small, idx_small, iters=5)
        report("one-hot matmul gather T=4096 F=8 bf16", dt, M)
    except Exception as e:
        print("one-hot failed:", str(e)[:120])

    # 6. scatter-add backward baselines
    g = jax.random.normal(key, (M,), jnp.float32)
    f6 = jax.jit(lambda t, i, g: jnp.zeros((T,), jnp.float32).at[i].add(g))
    report("xla scatter-add unsorted", timeit(f6, tab1d, idx, g, iters=5), M)
    sorted_ops = jax.jit(lambda i, g: jax.lax.sort((i, g), num_keys=1))(idx, g)
    f7 = jax.jit(
        lambda i, g: jnp.zeros((T,), jnp.float32).at[i].add(g, indices_are_sorted=True)
    )
    report("xla scatter-add sorted", timeit(f7, *sorted_ops, iters=5), M)
    f8 = jax.jit(lambda i, g: jax.lax.sort((i, g), num_keys=1))
    report("lax.sort 2 operands", timeit(f8, idx, g, iters=5), M)


if __name__ == "__main__":
    main()
