"""Honest (host-readback-synced) profiling of the splatfacto train step.

Breaks the step into: projection+SH, tile keys, global sort, blend fwd,
full fwd, full fwd+bwd, optax update. Run on the real TPU.
"""

import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.models.splatfacto import SplatfactoModelConfig, SplatfactoModel, init_gaussian_params

N_CAP = 150_000
N_ALIVE = 100_000
W = H = 200


def sync(x):
    jax.tree_util.tree_map(
        lambda l: np.asarray(jax.device_get(l)).ravel()[0] if hasattr(l, "ravel") else l,
        jax.tree_util.tree_leaves(x)[:1],
    )


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    cfg = SplatfactoModelConfig(max_gaussians=N_CAP, random_init=True, num_random=N_ALIVE)
    model = SplatfactoModel(cfg, scene_scale=1.0)
    params, aux = init_gaussian_params(cfg, None, 1.0, num_images=10)
    c2w = jnp.asarray(
        np.array([[1, 0, 0, 0], [0, 0, -1, -4], [0, 1, 0, 1.0]], np.float32)
    )
    K = (220.0, 220.0, W / 2, H / 2)
    key = jax.random.PRNGKey(0)
    gt = jax.random.uniform(key, (H, W, 3))

    render = jax.jit(
        lambda p, alive: model.render(
            p, alive, c2w, K, W, H, sh_degree_active=3, key=key,
            means2d_probe=jnp.zeros((N_CAP, 2)),
        )
    )
    t_fwd = timeit(render, params, aux.alive)
    print(f"full render fwd: {t_fwd:.1f} ms")

    def loss_fn(p):
        out = model.render(
            p, aux.alive, c2w, K, W, H, sh_degree_active=3, key=key,
            means2d_probe=jnp.zeros((N_CAP, 2)),
        )
        loss, _ = model.get_loss(out, gt, p, aux.alive)
        return loss

    grad_fn = jax.jit(jax.grad(loss_fn))
    t_bwd = timeit(grad_fn, params)
    print(f"full fwd+bwd:    {t_bwd:.1f} ms")

    # --- piecewise ---
    from nerfstudio_tpu.ops.gsplat.projection import project_gaussians

    from nerfstudio_tpu.models.splatfacto import get_viewmat
    viewmat = get_viewmat(c2w)
    proj = jax.jit(
        lambda p: project_gaussians(
            p["means"], jnp.exp(p["scales"]), p["quats"],
            viewmat, K[0], K[1], K[2], K[3], W, H,
        )
    )
    try:
        t_proj = timeit(proj, params)
        print(f"projection:      {t_proj:.1f} ms")
    except Exception as e:
        print("projection standalone failed:", type(e).__name__, str(e)[:200])

    # sort cost at this scale
    n_keys = N_CAP * 16
    ti = jax.random.randint(key, (n_keys,), 0, 170, jnp.int32)
    dep = jax.random.uniform(key, (n_keys,))
    gid = jnp.arange(n_keys, dtype=jnp.int32)
    sort3 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    t_sort = timeit(sort3, ti, dep, gid)
    print(f"3-op sort {n_keys/1e6:.1f}M keys: {t_sort:.1f} ms")

    # composite single-key sort (tile<<22 | rank) + payload
    comp = (ti.astype(jnp.int64) << 22) | (gid.astype(jnp.int64) & 0x3FFFFF)
    comp32 = (ti << 22) | (gid & 0x3FFFFF)
    sort2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    t_sort2 = timeit(sort2, comp32, gid)
    print(f"1-key sort {n_keys/1e6:.1f}M keys: {t_sort2:.1f} ms")

    # depth-only pre-sort of gaussians
    t_dsort = timeit(jax.jit(lambda d, g: jax.lax.sort((d, g), num_keys=1)),
                     jax.random.uniform(key, (N_CAP,)), jnp.arange(N_CAP, dtype=jnp.int32))
    print(f"depth sort {N_CAP/1e3:.0f}k: {t_dsort:.2f} ms")


if __name__ == "__main__":
    main()
