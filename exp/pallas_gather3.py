"""Stage 1 retry: VMEM sublane gather with indices already in (BLK,128) lane
layout (pre-broadcast on host; feasibility/timing only — production would
compute idx2d in-kernel from per-sample packed metadata)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16384


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def run_case(BLK, M, dtype=jnp.float32, table_rows=S):
    nb = M // BLK
    table = jax.random.normal(jax.random.PRNGKey(0), (table_rows, 128), jnp.float32).astype(dtype)
    rows = jax.random.randint(jax.random.PRNGKey(1), (M, 128), 0, table_rows, jnp.int32)

    def kernel(table_ref, rows_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], rows_ref[:], axis=0)

    @jax.jit
    def run(table, rows):
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((table_rows, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, 128), lambda b: (b * BLK, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda b: (b * BLK, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), dtype),
        )(table, rows)

    try:
        out = run(table, rows)
        tab = np.asarray(table, np.float32)
        r = np.asarray(rows[:64])
        ref = np.take_along_axis(tab[: r.max() + 1], r, axis=0) if False else None
        # direct check: out[i,j] == table[rows[i,j], j]
        got = np.asarray(out[:64], np.float32)
        want = tab[r, np.arange(128)[None, :]]
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
        dt = timeit(run, table, rows)
        print(f"BLK={BLK} T={table_rows} {np.dtype(dtype).name}: {dt*1e3:.2f} ms, {dt/M*1e9:.3f} ns/row")
    except Exception as e:
        print(f"BLK={BLK} T={table_rows} {np.dtype(dtype).name}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    run_case(BLK=2048, M=1 << 20)
    run_case(BLK=S, M=1 << 20)
    run_case(BLK=512, M=1 << 20, table_rows=512)
