"""Decompose the nerfacto train step: time jitted sub-programs at bench
shapes (8192 rays) to attribute the 60.6 ms steady-state step.

Each timing is a state-chained loop synced by host readback (the tunneled
runtime's block_until_ready is unreliable)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, n=20, chain=None):
    """fn jitted; chain: fn returns new first arg to thread through."""
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    cur = args
    for _ in range(n):
        out = f(*cur)
        if chain:
            cur = chain(out, cur)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def main():
    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.model_components.ray_generators import generate_rays_from_indices
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    rays = int(os.environ.get("NST_BENCH_RAYS", "8192"))
    cfg, dm, model_train, model_eval = _synthetic_setup(hw=128, n_images=16, rays=rays, tiny=False)
    pipeline = VanillaPipeline(dm, model_train, model_eval, tx=None, mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(cfg.optimizers, params)
    pipeline.init_aux = lambda: NerfactoModel.init_aux(model_train, cfg.model)
    state = pipeline.init_state(key, params=params)
    kwargs = NerfactoModel.step_kwargs(6001, cfg.model)  # steady state, no prop update
    kwargs_up = NerfactoModel.step_kwargs(6000, cfg.model)

    images = dm.train_images
    model = model_train

    def sample_and_raygen(k):
        idx, batch = dm.sample_train_batch(k, images)
        rb = generate_rays_from_indices(dm.train_cameras, idx)
        return rb.origins.sum() + batch["image"].sum()

    def fwd_loss(params, k, kw):
        k_pix, k_model = jax.random.split(k)
        idx, batch = dm.sample_train_batch(k_pix, images)
        rb = generate_rays_from_indices(dm.train_cameras, idx)
        outputs = model.apply(params, rb, key=k_model, model_aux=state.aux, **kw)
        metrics = model.get_metrics_dict(outputs, batch, params)
        loss_dict = model.get_loss_dict(outputs, batch, metrics, params, config=model.config)
        return sum(jnp.asarray(v) for v in loss_dict.values())

    def grad_only(params, k, kw):
        return jax.tree_util.tree_map(
            lambda g: g.sum(), jax.grad(lambda p: fwd_loss(p, k, kw))(params)
        )

    def full_step(state, k, kw):
        s, m = None, None
        s, m = pipeline.train_step(state, images, k, **kw)
        return s, m

    ms_sample = timed(sample_and_raygen, (key,))
    print(f"sample+raygen:                {ms_sample:7.2f} ms")
    ms_fwd = timed(lambda k: fwd_loss(state.params, k, kwargs), (key,))
    print(f"forward+loss (gated):         {ms_fwd:7.2f} ms")
    ms_fwdU = timed(lambda k: fwd_loss(state.params, k, kwargs_up), (key,))
    print(f"forward+loss (update):        {ms_fwdU:7.2f} ms")
    ms_grad = timed(lambda k: grad_only(state.params, k, kwargs), (key,))
    print(f"forward+backward (gated):     {ms_grad:7.2f} ms")
    ms_gradU = timed(lambda k: grad_only(state.params, k, kwargs_up), (key,))
    print(f"forward+backward (update):    {ms_gradU:7.2f} ms")

    # optax update alone
    grads = jax.jit(lambda p, k: jax.grad(lambda q: fwd_loss(q, k, kwargs))(p))(state.params, key)
    def adam(opt_state, grads_):
        upd, new_os = pipeline.tx.update(grads_, opt_state, state.params)
        return new_os, upd
    ms_adam = timed(adam, (state.opt_state, grads))
    print(f"optax update:                 {ms_adam:7.2f} ms")

    # full train step, steady-state gated
    pipeline.build_train_step()
    f = pipeline._train_step
    st = state
    st, m = f(st, images, key, **kwargs)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(20):
        st, m = f(st, images, jax.random.fold_in(key, i), **kwargs)
    _ = float(m["loss"])
    print(f"full step (gated):            {(time.perf_counter()-t0)/20*1000:7.2f} ms")


if __name__ == "__main__":
    main()
