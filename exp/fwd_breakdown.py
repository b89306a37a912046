"""Attribute the nerfacto forward+backward by finite differences in sample
counts: time model.apply (fwd) and its grad (fwd+bwd) at the default config
and at halved occ-probes / proposal-samples / field-samples. The slope per
stage gives its per-step cost without touching model internals.

Sample counts do not change parameter shapes, so one param set serves all
variants."""
import sys
import time

sys.path.insert(0, "/root/repo")
import dataclasses

import jax
import numpy as np


def timed(fn, *args, n=25):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1])
    return (time.perf_counter() - t0) / n * 1000


def main():
    from __graft_entry__ import _synthetic_setup
    from nerfstudio_tpu.model_components.ray_generators import generate_rays_from_indices
    from nerfstudio_tpu.models.nerfacto import NerfactoModel
    from nerfstudio_tpu.pipelines.base_pipeline import VanillaPipeline

    import optax

    rays = 8192
    cfg, dm, model_train, _, = _synthetic_setup(hw=128, n_images=16, rays=rays, tiny=False)
    pipeline = VanillaPipeline(dm, model_train, model_train, tx=optax.adam(1e-3), mesh=None)
    key = jax.random.PRNGKey(0)
    params = pipeline.init_params(key)
    pipeline.init_aux = lambda: NerfactoModel.init_aux(model_train, cfg.model)
    state = pipeline.init_state(key, params=params)
    aabb = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

    idx, batch = dm.sample_train_batch(jax.random.PRNGKey(1), dm.train_images)
    rb = jax.device_put(generate_rays_from_indices(dm.train_cameras, idx))
    kwargs = NerfactoModel.step_kwargs(6001, cfg.model)

    def variant(**overrides):
        c = dataclasses.replace(cfg.model, **overrides)
        return NerfactoModel(config=c, scene_aabb=aabb, num_train_data=16, train=True)

    variants = {
        "default (occ128 prop64 field32)": {},
        "occ_num_probes=64": {"occ_num_probes": 64},
        "prop_samples=32": {"num_proposal_samples_per_ray": (256, 32)},
        "field_samples=16": {"num_nerf_samples_per_ray": 16},
    }
    base_f = base_g = None
    for name, ov in variants.items():
        m = variant(**ov)

        def fwd(p, r):
            out = m.apply(p, r, key=jax.random.PRNGKey(2), model_aux=state.aux, **kwargs)
            return out["rgb"].sum() + sum(
                w.sum() for w in out.get("weights_list", [])
            )

        def fwdbwd(p, r):
            return jax.tree_util.tree_map(lambda g: g.sum(), jax.grad(lambda q: fwd(q, r))(p))

        tf = timed(fwd, state.params, rb)
        tg = timed(fwdbwd, state.params, rb)
        if base_f is None:
            base_f, base_g = tf, tg
            print(f"{name:34s} fwd {tf:7.2f}  fwd+bwd {tg:7.2f} ms")
        else:
            print(
                f"{name:34s} fwd {tf:7.2f} (Δ {base_f - tf:6.2f})  "
                f"fwd+bwd {tg:7.2f} (Δ {base_g - tg:6.2f}) ms"
            )


if __name__ == "__main__":
    main()
