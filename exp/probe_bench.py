"""Occupancy probe speed: element-gather (old) vs row-gather (new), plus
bf16-vs-f32 scatter destination cost at the field-level shape."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

M = 8192 * 256


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    res = 128
    key = jax.random.PRNGKey(0)
    binary = jax.random.uniform(key, (res**3,)) > 0.5
    rows_tab = binary.reshape(res * res, res).astype(jnp.float32)
    cells = jax.random.randint(key, (M,), 0, res**3, jnp.int32)
    rows = cells // res
    z = cells % res

    @jax.jit
    def old(binary, cells):
        return jnp.where(binary[cells], 1.0, 1e-3).sum()

    @jax.jit
    def new(rows_tab, rows, z):
        from nerfstudio_tpu.ops.hash_grid import _row_gather_select
        v = _row_gather_select(rows_tab, rows, z, 1)
        return jnp.where(v[..., 0] > 0.5, 1.0, 1e-3).sum()

    t_old = timeit(old, binary, cells)
    t_new = timeit(new, rows_tab, rows, z)
    print(f"probe old (element bool): {t_old*1e3:.1f} ms ({t_old/M*1e9:.2f} ns)")
    print(f"probe new (row f32):      {t_new*1e3:.1f} ms ({t_new/M*1e9:.2f} ns)")

    # scatter destination dtype at field shape
    Msc = 1 << 21
    g = jax.random.normal(key, (Msc, 128))
    rws = jax.random.randint(key, (Msc,), 0, 16384, jnp.int32)
    for dt in (jnp.float32, jnp.bfloat16):
        @jax.jit
        def scat(rws, g):
            return jnp.zeros((16384, 128), dt).at[rws].add(g.astype(dt))[0, 0].astype(jnp.float32)
        t = timeit(scat, rws, g)
        print(f"scatter dest {np.dtype(dt).name}: {t*1e3:.1f} ms ({t/Msc*1e9:.2f} ns/acc)")


if __name__ == "__main__":
    main()
