"""Stage-wise feasibility of a VMEM-resident hash-table row gather in Pallas.

Stage 1: pure sublane gather  out[i, :] = table[rows[i], :]
Stage 2: gather + one-hot lane select + 8-corner weighted accumulate
         (the full hash-grid forward inner loop for one level).

All timings host-readback synced (tunnel block_until_ready lies).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16384  # table rows (T=2^19, F=4 -> epr=32)
F = 4
M = 1 << 21  # total row accesses to time (2M, ~field fwd scale)
BLK = 2048  # samples per grid step


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- stage 1
def g1_kernel(table_ref, rows_ref, out_ref):
    rows = rows_ref[0]  # (BLK,)
    idx2d = jnp.broadcast_to(rows[:, None], (BLK, 128))
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx2d, axis=0)


def stage1(dtype):
    nb = M // BLK
    table = jax.random.normal(jax.random.PRNGKey(0), (S, 128), jnp.float32).astype(dtype)
    rows = jax.random.randint(jax.random.PRNGKey(1), (nb, BLK), 0, S, jnp.int32)

    @jax.jit
    def run(table, rows):
        return pl.pallas_call(
            g1_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda b: (b * BLK, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), dtype),
        )(table, rows)

    try:
        out = run(table, rows)
        ref = np.asarray(table, np.float32)[np.asarray(rows[0])]
        np.testing.assert_allclose(np.asarray(out[:BLK], np.float32), ref, rtol=1e-2, atol=1e-2)
        dt = timeit(run, table, rows)
        print(f"stage1 {np.dtype(dtype).name}: {dt*1e3:.2f} ms, {dt/M*1e9:.3f} ns/row-access")
    except Exception as e:
        print(f"stage1 {np.dtype(dtype).name}: FAILED {str(e)[:240]}")


# ---------------------------------------------------------------- stage 1b: XLA baseline
def stage1_xla(dtype):
    table = jax.random.normal(jax.random.PRNGKey(0), (S, 128), jnp.float32).astype(dtype)
    rows = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, S, jnp.int32)

    @jax.jit
    def run(table, rows):
        return table[rows]

    dt = timeit(run, table, rows)
    print(f"stage1-XLA {np.dtype(dtype).name}: {dt*1e3:.2f} ms, {dt/M*1e9:.3f} ns/row-access")


# ---------------------------------------------------------------- stage 2
def g2_kernel(table_ref, rows_ref, slot_ref, w_ref, out_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
    entry_of_lane = lane // F
    acc = jnp.zeros((BLK, 128), jnp.float32)
    for c in range(8):
        rows = rows_ref[0, c]  # (BLK,)
        idx2d = jnp.broadcast_to(rows[:, None], (BLK, 128))
        g = jnp.take_along_axis(table_ref[:], idx2d, axis=0)  # (BLK,128)
        sel = jnp.where(entry_of_lane == slot_ref[0, c][:, None], g.astype(jnp.float32), 0.0)
        acc = acc + sel * w_ref[0, c][:, None]
    out_ref[:] = acc


def stage2(dtype):
    n = M // 8  # samples; 8 corners each
    nb = n // BLK
    table = jax.random.normal(jax.random.PRNGKey(0), (S, 128), jnp.float32).astype(dtype)
    rows = jax.random.randint(jax.random.PRNGKey(1), (nb, 8, BLK), 0, S, jnp.int32)
    slots = jax.random.randint(jax.random.PRNGKey(2), (nb, 8, BLK), 0, 128 // F, jnp.int32)
    w = jax.random.uniform(jax.random.PRNGKey(3), (nb, 8, BLK), jnp.float32)

    @jax.jit
    def run(table, rows, slots, w):
        return pl.pallas_call(
            g2_kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, BLK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, BLK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, BLK), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda b: (b * BLK, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        )(table, rows, slots, w)

    try:
        out = run(table, rows, slots, w)
        # numpy reference on first block
        tab = np.asarray(table, np.float32)
        r, s, ww = (np.asarray(a[0]) for a in (rows, slots, w))
        lane = np.arange(128)
        ref = np.zeros((BLK, 128), np.float32)
        for c in range(8):
            g = tab[r[c]]
            sel = np.where((lane // F)[None, :] == s[c][:, None], g, 0.0)
            ref += sel * ww[c][:, None]
        np.testing.assert_allclose(np.asarray(out[:BLK]), ref, rtol=1e-2, atol=1e-2)
        dt = timeit(run, table, rows, slots, w)
        print(f"stage2 {np.dtype(dtype).name}: {dt*1e3:.2f} ms, {dt/M*1e9:.3f} ns/row-access (fused select+lerp)")
    except Exception as e:
        print(f"stage2 {np.dtype(dtype).name}: FAILED {str(e)[:240]}")


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        stage1_xla(dt)
        stage1(dt)
        stage2(dt)
