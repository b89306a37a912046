import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N = 150_000
key = jax.random.PRNGKey(0)
quats = jax.random.normal(key, (N, 4))
scales = jnp.exp(jax.random.normal(key, (N, 3)) * 0.1)
means = jax.random.normal(key, (N, 3))


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))[..., :1]


def timeit(fn, *a, n=20):
    o = fn(*a); sync(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    sync(o)
    return (time.perf_counter() - t0) / n * 1000


@jax.jit
def cov3d_aos(scales, quats):
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x*y - w*z), 2 * (x*z + w*y)], -1),
        jnp.stack([2 * (x*y + w*z), 1 - 2 * (x**2 + z**2), 2 * (y*z - w*x)], -1),
        jnp.stack([2 * (x*z - w*y), 2 * (y*z + w*x), 1 - 2 * (x**2 + y**2)], -1),
    ], -2)
    M = R * scales[..., None, :]
    return jnp.einsum("nij,nkj->nik", M, M, precision="highest")


@jax.jit
def cov3d_soa(scales, quats):
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z); r01 = 2 * (x * y - w * z); r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z); r11 = 1 - 2 * (x * x + z * z); r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y); r21 = 2 * (y * z + w * x); r22 = 1 - 2 * (x * x + y * y)
    s0, s1, s2 = scales[:, 0] ** 2, scales[:, 1] ** 2, scales[:, 2] ** 2
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return c00, c01, c02, c11, c12, c22


t1 = timeit(cov3d_aos, scales, quats)
t2 = timeit(cov3d_soa, scales, quats)
print(f"cov3d AoS einsum: {t1:.2f} ms   SoA scalars: {t2:.2f} ms")

# check numerics
a = cov3d_aos(scales, quats)
c00, c01, c02, c11, c12, c22 = cov3d_soa(scales, quats)
print("max err", float(jnp.abs(a[:, 0, 0] - c00).max()), float(jnp.abs(a[:, 1, 2] - c12).max()))
