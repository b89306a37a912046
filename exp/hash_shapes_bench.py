"""Honest timing of hash_encode fwd / fwd+bwd at the exact nerfacto step
shapes (8192 rays): proposal net (64 samp, L5, log2 17, F2) and field
(32 samp, L8, log2 19, F4). Includes occupancy probe gather."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from nerfstudio_tpu.ops.hash_grid import hash_encode, init_hash_table

RAYS = 8192


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench(name, n_samples, L, log2_T, F, min_res=16, max_res=2048, corner_sample=False):
    T = 1 << log2_T
    key = jax.random.PRNGKey(0)
    table = init_hash_table(key, L, T, F)
    pos = jax.random.uniform(key, (n_samples, 3))

    @jax.jit
    def fwd(table, pos):
        return hash_encode(pos, table, num_levels=L, min_res=min_res,
                           max_res=max_res, hash_table_size=T,
                           bwd_corner_sample=corner_sample).sum()

    @jax.jit
    def fwdbwd(table, pos):
        return jax.grad(lambda t: hash_encode(pos, t, num_levels=L, min_res=min_res,
                        max_res=max_res, hash_table_size=T,
                        bwd_corner_sample=corner_sample).sum())(table)

    acc = n_samples * L * 8
    tf = timeit(fwd, table, pos)
    tfb = timeit(fwdbwd, table, pos)
    print(f"{name}: fwd {tf*1e3:.1f} ms ({tf/acc*1e9:.2f} ns/acc) | "
          f"fwd+bwd {tfb*1e3:.1f} ms | bwd-only {(tfb-tf)/acc*1e9:.2f} ns/acc | {acc/1e6:.1f}M acc")


def bench_occupancy(n_probes):
    grid = (jax.random.uniform(jax.random.PRNGKey(0), (128 ** 3,)) > 0.5)
    cells = jax.random.randint(jax.random.PRNGKey(1), (RAYS * n_probes,), 0, 128 ** 3)

    @jax.jit
    def probe(grid, cells):
        return jnp.where(grid[cells], 1.0, 1e-3).sum()

    t = timeit(probe, grid, cells)
    print(f"occupancy probes ({RAYS}x{n_probes}): {t*1e3:.1f} ms ({t/(RAYS*n_probes)*1e9:.2f} ns/probe)")


if __name__ == "__main__":
    bench_occupancy(256)
    bench("prop L5 F2 2^17 64samp", RAYS * 64, 5, 17, 2, max_res=256)
    bench("field L8 F4 2^19 32samp", RAYS * 32, 8, 19, 4)
    bench("prop  + corner-sample bwd", RAYS * 64, 5, 17, 2, max_res=256, corner_sample=True)
    bench("field + corner-sample bwd", RAYS * 32, 8, 19, 4, corner_sample=True)
