"""Feasibility: fused row-gather + lane-select + corner-accumulate Pallas
kernel for the hash grid. Key trick: tpu.dynamic_gather along sublanes with
per-lane-broadcast row indices = a vectorized row gather from a VMEM-resident
table."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 16384  # table rows (T=2^19, F=4 -> epr=32)
F = 4
N_BLOCKS = 16  # index blocks of S each
CORNERS = 8


def kernel(table_ref, rows_ref, slot_ref, w_ref, out_ref):
    c = pl.program_id(1)
    rows = rows_ref[0, 0, :]  # (S,)
    idx2d = jnp.broadcast_to(rows[:, None], (S, 128))
    gathered = jnp.take_along_axis(table_ref[:], idx2d, axis=0)  # (S,128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    lane_idx = slot_ref[0, 0, :][:, None] * F + (lane % F)
    sel = jnp.take_along_axis(gathered, lane_idx, axis=1)
    contrib = (sel.astype(jnp.float32)) * w_ref[0, 0, :][:, None]

    @pl.when(c == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(c > 0)
    def _():
        out_ref[0] = out_ref[0] + contrib


@jax.jit
def fused_gather(table, rows, slots, w):
    # table (S,128); rows/slots/w (CORNERS, N_BLOCKS, S)
    return pl.pallas_call(
        kernel,
        grid=(N_BLOCKS, CORNERS),
        in_specs=[
            pl.BlockSpec((S, 128), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, c: (c, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, c: (c, b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b, c: (c, b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, 128), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS, S, 128), jnp.float32),
    )(table, rows, slots, w)


def main():
    key = jax.random.PRNGKey(0)
    for dtype in (jnp.bfloat16, jnp.float32):
        table = jax.random.normal(key, (S, 128), dtype)
        rows = jax.random.randint(key, (CORNERS, N_BLOCKS, S), 0, S, jnp.int32)
        slots = jax.random.randint(key, (CORNERS, N_BLOCKS, S), 0, 128 // F, jnp.int32)
        w = jax.random.uniform(key, (CORNERS, N_BLOCKS, S), jnp.float32)
        try:
            out = fused_gather(table, rows, slots, w)
            _ = float(out.sum())
        except Exception as e:
            print(f"{dtype.__name__}: FAILED {str(e)[:300]}")
            continue
        # correctness vs numpy
        tab = np.asarray(table, np.float32)
        r = np.asarray(rows)
        s = np.asarray(slots)
        ww = np.asarray(w)
        ref = np.zeros((N_BLOCKS, S, F), np.float32)
        for c in range(CORNERS):
            g = tab[r[c]]  # (NB, S, 128)
            lane = np.arange(F)
            selv = np.take_along_axis(
                g, (s[c][..., None] * F + lane[None, None, :]), axis=-1
            )
            ref += selv * ww[c][..., None]
        np.testing.assert_allclose(np.asarray(out)[..., :F], ref, rtol=2e-2, atol=1e-2)
        print(f"{dtype.__name__}: CORRECT")
        t0 = time.perf_counter()
        for _ in range(20):
            out = fused_gather(table, rows, slots, w)
        _ = float(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / 20
        n_access = CORNERS * N_BLOCKS * S
        print(f"{dtype.__name__}: {dt*1e3:.2f} ms for {n_access/1e6:.1f}M accesses = {dt/n_access*1e9:.3f} ns/access")


if __name__ == "__main__":
    main()
