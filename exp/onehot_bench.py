"""One-hot matmul scatter/gather vs row scatter/gather at REAL in-model
shapes. Full results are contracted with a random matrix (vdot) so XLA
cannot slice the dots; 8 independent ops per jit call amortize the ~1ms
tunnel dispatch."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

M = 262144
S_TAB = 16384
REP = 8
key = jax.random.PRNGKey(0)
gs = [jax.random.normal(jax.random.fold_in(key, i), (M, 128), jnp.float32) for i in range(REP)]
tab = jax.random.normal(key, (S_TAB, 128), jnp.float32)
Rm = jax.random.normal(jax.random.fold_in(key, 99), (M, 128), jnp.float32)

def timed(f, *a, n=10):
    r = jax.jit(f)
    o = r(*a); _ = float(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = r(*a)
    _ = float(o)
    return (time.perf_counter() - t0) / (n * REP) * 1000

for S_eff in (183, 729, 3042, 4913):
    import sys; sys.stdout.flush()
    rows = jax.random.randint(key, (M,), 0, S_eff)
    Rs = jax.random.normal(key, (S_eff, 128), jnp.float32)

    def scatter(rows, *gs):
        return sum(jnp.vdot(Rs, jnp.zeros((S_TAB, 128), jnp.float32).at[rows].add(g)[:S_eff]) for g in gs)

    def onehot_scatter(rows, *gs):
        O = (rows[:, None] == jnp.arange(S_eff)[None, :]).astype(jnp.bfloat16)
        return sum(jnp.vdot(Rs, jnp.dot(O.T, g.astype(jnp.bfloat16), preferred_element_type=jnp.float32)) for g in gs)

    def gather(rows, *gs):
        return sum(jnp.vdot(Rm, tab.astype(jnp.bfloat16)[rows].astype(jnp.float32) * g) for g in gs)

    def onehot_gather(rows, *gs):
        O = (rows[:, None] == jnp.arange(S_eff)[None, :]).astype(jnp.bfloat16)
        return sum(jnp.vdot(Rm, jnp.dot(O, tab[:S_eff].astype(jnp.bfloat16), preferred_element_type=jnp.float32) * g) for g in gs)

    print(f"S_eff={S_eff:6d}: scatter {timed(scatter, rows, *gs):7.3f} | onehot_scatter {timed(onehot_scatter, rows, *gs):7.3f} | gather {timed(gather, rows, *gs):7.3f} | onehot_gather {timed(onehot_gather, rows, *gs):7.3f} ms/op")

P = jax.random.normal(key, (128, 4), jnp.float32)
Rp = jax.random.normal(key, (M, 4), jnp.float32)
def dot_f32(*gs): return sum(jnp.vdot(Rp, jnp.dot(g, P, preferred_element_type=jnp.float32)) for g in gs)
def dot_bf16(*gs): return sum(jnp.vdot(Rp, jnp.dot(g.astype(jnp.bfloat16), P.astype(jnp.bfloat16), preferred_element_type=jnp.float32)) for g in gs)
print(f"lane dot f32 {timed(dot_f32, *gs):.3f} | bf16 {timed(dot_bf16, *gs):.3f} ms/op")
