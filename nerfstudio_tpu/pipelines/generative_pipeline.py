"""Generative (text-to-3D) pipeline for generfacto (reference:
nerfstudio/models/generfacto.py + RandomCamerasDataManager wiring in
configs/method_configs.py generfacto entry).

Per step: sample a random orbit camera -> render a full low-res image
(jitted) -> the diffusion guidance produces the SDS image-space gradient
host-side -> a second jitted pass re-renders and applies the surrogate loss
whose rgb-gradient equals the SDS gradient, plus opacity/orientation
regularizers. Runs against the weights-free stub guidance in zero-egress
environments; a HF StableDiffusion backend is selected by config when
weights are available."""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerfstudio_tpu.data.random_cameras_datamanager import (
    RandomCamerasConfig,
    RandomCamerasDataManager,
)
from nerfstudio_tpu.generative.sds import load_guidance
from nerfstudio_tpu.models.generfacto import GenerfactoModel, GenerfactoModelConfig


@flax.struct.dataclass
class GenerativeTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class GenerativePipeline:
    def __init__(self, config, seed: int = 42):
        self.config = config
        self.model_cfg: GenerfactoModelConfig = config.model
        cam_cfg = getattr(config, "random_cameras", None) or RandomCamerasConfig()
        self.datamanager = RandomCamerasDataManager(cam_cfg, seed=seed)
        self.model = GenerfactoModel(
            config=self.model_cfg, scene_aabb=((-1.0,) * 3, (1.0,) * 3),
            num_train_data=1, train=True,
        )
        self.guidance = load_guidance(self.model_cfg.guidance_backend)
        self.text_embedding = self.guidance.text_embedding(self.model_cfg.prompt)
        self.tx = optax.adam(1e-2, eps=1e-15)
        self._render = None
        self._update = None

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> GenerativeTrainState:
        cams, _, _ = self.datamanager.next_train(0)
        rb = cams.generate_rays(camera_indices=0)
        rb = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]) if x is not None else None, rb
        )
        params = jax.jit(self.model.init)(key, rb, key=jax.random.PRNGKey(0))
        return GenerativeTrainState(
            params=params, opt_state=self.tx.init(params), step=jnp.zeros((), jnp.int32)
        )

    def _build(self, res: int):
        model = self.model
        tx = self.tx

        @jax.jit
        def render_fn(params, rb, key, density_strength):
            out = model.apply(params, rb, key=key, density_strength=density_strength)
            return out["rgb"].reshape(res, res, 3)

        @jax.jit
        def update_fn(state, rb, key, sds_grad, density_strength):
            def loss_fn(params):
                out = model.apply(params, rb, key=key, density_strength=density_strength)
                batch = {"sds_grad": sds_grad.reshape(-1, 3)}
                loss_dict = model.get_loss_dict(out, batch, None, params, config=model.config)
                total = sum(loss_dict.values())
                return total, loss_dict

            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return (
                GenerativeTrainState(
                    params=new_params, opt_state=new_opt, step=state.step + 1
                ),
                {"loss": loss, **loss_dict},
            )

        self._render, self._update = render_fn, update_fn

    # ------------------------------------------------------------------
    def train_step(self, state: GenerativeTrainState, step: int, key: jax.Array):
        cams, vertical, horizontal = self.datamanager.next_train(step)
        rb = cams.generate_rays(camera_indices=0)
        res = int(np.asarray(cams.height).reshape(-1)[0])
        rb = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]) if x is not None else None, rb
        )
        if self._render is None:
            self._build(res)
        kwargs = GenerfactoModel.step_kwargs(step, self.model_cfg)
        k1, k2, k3 = jax.random.split(key, 3)
        rgb = self._render(state.params, rb, k1, kwargs["density_strength"])
        sds_grad = self.guidance.sds_grad(
            k2, rgb, self.text_embedding, guidance_scale=self.model_cfg.guidance_scale
        )
        state, metrics = self._update(
            state, rb, k1, jnp.asarray(sds_grad), kwargs["density_strength"]
        )
        return state, metrics

    def train(self, state, num_iterations: int, key: jax.Array, writer=None, log_every=50):
        for step in range(int(state.step), num_iterations):
            key, k = jax.random.split(key)
            state, metrics = self.train_step(state, step, k)
            if writer is not None and step % log_every == 0:
                writer.put_dict("train", {k2: float(v) for k2, v in metrics.items()}, step)
        return state

    # ------------------------------------------------------------------
    def render_eval_image(self, state, angle_idx: int = 0):
        cams = self.datamanager.eval_cameras()[angle_idx]
        rb = cams.generate_rays(camera_indices=0)
        res = int(np.asarray(cams.height).reshape(-1)[0])
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]) if x is not None else None, rb
        )
        model_eval = GenerfactoModel(
            config=self.model_cfg, scene_aabb=((-1.0,) * 3, (1.0,) * 3),
            num_train_data=1, train=False,
        )
        out = model_eval.apply(state.params, flat, key=None)
        return {k: np.asarray(v).reshape(res, res, -1) for k, v in out.items()
                if hasattr(v, "reshape")}


def train_generfacto(config) -> None:
    """CLI path for the generfacto method."""
    from nerfstudio_tpu.utils.writer import EventWriter

    pipeline = GenerativePipeline(config, seed=config.seed)
    key = jax.random.PRNGKey(config.seed)
    state = pipeline.init_state(key)
    base = config.trainer.get_base_dir()
    writer = EventWriter(base, vis=config.trainer.vis)
    state = pipeline.train(state, config.trainer.max_num_iterations, key, writer=writer)

    import orbax.checkpoint as ocp

    ckpt_dir = config.trainer.get_checkpoint_dir(base)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    mgr = ocp.CheckpointManager(ckpt_dir.absolute())
    mgr.save(int(state.step), args=ocp.args.StandardSave({"params": state.params, "step": state.step}))
    mgr.wait_until_finished()
    print(f"training finished; checkpoints in {ckpt_dir}")
