"""A/B select-reduce variants for the row-gather lane select, at real shapes.

v0: current — per-feature masked reduce with astype(f32) inside
v1: reshape (M, epr, f) + jnp.sum(axis=1, dtype=f32) on bf16 (one pass)
v2: per-feature masked reduce, jnp.sum(dtype=f32) on bf16 (no astype)
"""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def make(f, S, variant):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    epr = 128 // f

    def fwd(table, rows, slot, w):
        vals = table.astype(jnp.bfloat16)[rows]
        sel = jnp.where(entry_of_lane == slot[:, None], vals, 0)
        if variant == 0:
            outs = [
                jnp.sum(jnp.where(feat_of_lane == i, sel, 0).astype(jnp.float32), axis=-1)
                for i in range(f)
            ]
            feats = jnp.stack(outs, axis=-1)
        elif variant == 1:
            feats = jnp.sum(sel.reshape(sel.shape[0], epr, f), axis=1, dtype=jnp.float32)
        elif variant == 2:
            outs = [
                jnp.sum(jnp.where(feat_of_lane == i, sel, 0), axis=-1, dtype=jnp.float32)
                for i in range(f)
            ]
            feats = jnp.stack(outs, axis=-1)
        elif variant == 3:
            # slot-major layout simulation: lane = feat*epr + slot; feature
            # extraction = contiguous 32-lane slice reductions (static slices)
            entry_slotmajor = lane % epr
            sel3 = jnp.where(entry_slotmajor == slot[:, None], vals, 0)
            outs = [
                jnp.sum(
                    sel3[:, i * epr : (i + 1) * epr].astype(jnp.float32), axis=-1
                )
                for i in range(f)
            ]
            feats = jnp.stack(outs, axis=-1)
        return jnp.sum(feats * w[:, None])

    return jax.jit(fwd)


def run(name, f, S, M):
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (S, 128), jnp.float32)
    rows = jax.random.randint(key, (M,), 0, S, jnp.int32)
    slot = jax.random.randint(key, (M,), 0, 128 // f, jnp.int32)
    w = jax.random.uniform(key, (M,))
    ref = None
    for v in (0, 1, 2, 3):
        fn = make(f, S, v)
        try:
            out = float(fn(table, rows, slot, w))
            if ref is None:
                ref = out
            ok = (abs(out - ref) / (abs(ref) + 1e-6) < 1e-2) if v < 3 else 'n/a(layout)'
            dt = timeit(fn, table, rows, slot, w)
            print(f"{name} v{v}: {dt*1e3:6.1f} ms ({dt/M*1e9:5.2f} ns/acc) ok={ok}")
        except Exception as e:
            print(f"{name} v{v}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    run("prop F2 S2048 M21M ", 2, 2048, 21_000_000)
    run("field F4 S16384 M16.8M", 4, 16384, 16_800_000)
