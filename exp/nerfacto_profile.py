"""Honest per-component profile of the nerfacto TPU train step.

Times (host-readback synced): full step, field fwd, field fwd+bwd, proposal
sampling, occupancy probe, losses+optax remainder. Run on the real TPU with
nothing else using the device."""

import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[-1])).ravel()[:1]


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.engine.optimizers import build_optimizers
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    rays = 8192
    cfg, dm, model_train, model_eval = _synthetic_setup(hw=128, n_images=16, rays=rays, tiny=False)
    pipeline = VanillaPipeline(dm, model_train, model_eval, tx=None, mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.tx = build_optimizers(cfg.optimizers, params)
    if hasattr(NerfactoModel, "init_aux"):
        pipeline.init_aux = lambda: NerfactoModel.init_aux(model_train, cfg.model)
    state = pipeline.init_state(key, params=params)
    aux_hook = NerfactoModel.make_aux_update_fn(model_train, cfg.model)

    kwargs = NerfactoModel.step_kwargs(9000, cfg.model)
    print("step_kwargs:", kwargs)

    # full step
    def full(state):
        s, m = pipeline.train_step(state, dm.train_images, key, **kwargs)
        return m["loss"]

    # can't donate in repeated timing: use non-donated variant via jit of pipeline fn?
    # train_step donates; rebuild state each call is costly. Instead chain:
    def chain(state, n):
        m = None
        for _ in range(n):
            state, m = pipeline.train_step(state, dm.train_images, key, **kwargs)
        return state, m

    state, m = chain(state, 3)
    float(m["loss"])
    t0 = time.perf_counter()
    state, m = chain(state, 30)
    float(m["loss"])
    t_step = (time.perf_counter() - t0) / 30 * 1000
    print(f"full train step: {t_step:.1f} ms  ({rays / t_step * 1000:.0f} rays/s)")

    # aux update (occupancy)
    if aux_hook is not None:
        t_aux = timeit(lambda s: aux_hook(s, 9000, key), state, n=5)
        print(f"aux update: {t_aux:.1f} ms (amortized per its cadence)")

    # components: build a model fn from params
    params2 = state.params
    from nerfstudio_tpu.model_components.ray_generators import generate_rays_from_indices

    # sample a ray bundle like the step does
    import functools

    @jax.jit
    def make_rb(key):
        idx = jax.random.randint(key, (rays, 3), 0, 16)
        idx = idx.at[:, 1].set(jax.random.randint(jax.random.fold_in(key, 1), (rays,), 0, 128))
        idx = idx.at[:, 2].set(jax.random.randint(jax.random.fold_in(key, 2), (rays,), 0, 128))
        return generate_rays_from_indices(dm.train_cameras, idx)

    rb = make_rb(key)

    @jax.jit
    def fwd(params, rb):
        out = model_train.get_outputs(params, rb, aux=state.aux, **kwargs)
        return out["rgb"].sum()

    t_fwd = timeit(fwd, params2, rb)
    print(f"model fwd: {t_fwd:.1f} ms")

    @jax.jit
    def fwdbwd(params, rb):
        return jax.grad(lambda p: fwd(p, rb))(params)

    t_fb = timeit(fwdbwd, params2, rb)
    print(f"model fwd+bwd: {t_fb:.1f} ms")

    # field-only eval on fixed positions
    n_samp = rays * cfg.model.num_nerf_samples_per_ray
    pos = jax.random.uniform(key, (n_samp, 3), minval=-1, maxval=1)

    field = model_train.field if hasattr(model_train, "field") else None
    if field is not None:
        @jax.jit
        def field_fwd(params, pos):
            d = field.density_fn(params["field"], pos) if hasattr(field, "density_fn") else None
            return d.sum() if d is not None else 0.0

        try:
            t_field = timeit(field_fwd, params2, pos)
            print(f"field density fwd ({n_samp} samples): {t_field:.1f} ms")
            t_field_b = timeit(jax.jit(jax.grad(lambda p: field_fwd(p, pos))), params2)
            print(f"field density fwd+bwd: {t_field_b:.1f} ms")
        except Exception as e:
            print("field-only timing failed:", str(e)[:150])


if __name__ == "__main__":
    main()
