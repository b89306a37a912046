"""Trainer (reference: nerfstudio/engine/trainer.py:93-567).

Hosts the train loop around the pipeline's jitted train_step: per-step
host work is only key splitting + step-kwargs computation (the functional
TrainingCallback replacement); eval/checkpoint cadences; rays/sec metrics;
orbax checkpointing (preemption-safe resume — SURVEY.md §5)."""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.pipelines.base_pipeline import TrainState, VanillaPipeline
from nerfstudio_tpu.utils import writer as writer_lib
from nerfstudio_tpu.utils.profiler import time_function


@dataclasses.dataclass
class TrainerConfig:
    """(reference engine/trainer.py:54-90)"""

    method_name: str = "base"
    experiment_name: Optional[str] = None
    output_dir: Path = Path("outputs")
    timestamp: str = "{timestamp}"
    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 25000
    save_only_latest_checkpoint: bool = True
    load_dir: Optional[Path] = None
    load_step: Optional[int] = None
    log_gradients: bool = False
    vis: str = "tensorboard"

    def get_base_dir(self) -> Path:
        exp = self.experiment_name or "unnamed"
        ts = self.timestamp
        if ts == "{timestamp}":
            ts = time.strftime("%Y-%m-%d_%H%M%S")
        return Path(self.output_dir) / exp / self.method_name / ts

    def get_checkpoint_dir(self, base_dir: Path) -> Path:
        return base_dir / "nerfstudio_models"


class Trainer:
    """(reference engine/trainer.py:93-567)"""

    def __init__(
        self,
        config: TrainerConfig,
        pipeline: VanillaPipeline,
        step_kwargs_fn=None,
        seed: int = 42,
    ):
        self.config = config
        self.pipeline = pipeline
        self.step_kwargs_fn = step_kwargs_fn or (lambda step: {})
        self.base_dir = config.get_base_dir()
        self.checkpoint_dir = config.get_checkpoint_dir(self.base_dir)
        self.key = jax.random.PRNGKey(seed)
        self.state: Optional[TrainState] = None
        self.writer = writer_lib.EventWriter(self.base_dir, vis=config.vis)
        self.writer.max_steps = config.max_num_iterations
        self.viewer = None
        self._ckpt_mgr = None
        # serializes step DISPATCH against the viewer's param-snapshot copy:
        # train_step donates state buffers, so a render reading live params
        # races with donation ("Array has been deleted"); the viewer copies
        # under this lock instead (reference trainer.py:117 train_lock)
        import threading

        self.train_lock = threading.Lock()

    # ------------------------------------------------------------------
    def setup(self) -> None:
        self.key, init_key = jax.random.split(self.key)
        self.state = self.pipeline.init_state(init_key)
        self.pipeline.build_train_step()
        if self.config.load_dir is not None:
            self._load_checkpoint()

    # ------------------------------------------------------------------
    def _checkpoint_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
            options = ocp.CheckpointManagerOptions(
                max_to_keep=1 if self.config.save_only_latest_checkpoint else None,
                create=True,
            )
            self._ckpt_mgr = ocp.CheckpointManager(
                self.checkpoint_dir.absolute(), options=options
            )
        return self._ckpt_mgr

    def save_checkpoint(self, step: int) -> None:
        """(reference trainer.py:456-484)"""
        import orbax.checkpoint as ocp

        mgr = self._checkpoint_manager()
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        # model-family aux state (e.g. instant-ngp occupancy grid) must
        # survive resume — dropping it silently degrades sampling after
        # restart (reference keeps it in the model state_dict)
        if self.state.aux is not None:
            payload["aux"] = self.state.aux
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()

    def _load_checkpoint(self) -> None:
        """(reference trainer.py:420-453)"""
        import orbax.checkpoint as ocp

        load_dir = Path(self.config.load_dir)
        options = ocp.CheckpointManagerOptions(create=False)
        mgr = ocp.CheckpointManager(load_dir.absolute(), options=options)
        step = self.config.load_step or mgr.latest_step()
        assert step is not None, f"no checkpoints in {load_dir}"
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if self.state.aux is not None:
            template["aux"] = self.state.aux
        try:
            restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        except ValueError:
            if "aux" not in template:
                raise
            # checkpoint without aux, or aux whose structure drifted across
            # versions: restore everything else (strict=False ignores on-disk
            # keys absent from the template) and keep the freshly-built aux
            template.pop("aux", None)
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(template, strict=False)
            )
            print(
                "warning: checkpoint aux state incompatible with this version; "
                "re-initialized (sampling state rebuilds over the next updates)"
            )
        self.state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            aux=restored.get("aux", self.state.aux),
        )
        print(f"loaded checkpoint at step {step} from {load_dir}")

    # ------------------------------------------------------------------
    @time_function
    def train_iteration(self, step: int) -> Dict[str, float]:
        """(reference trainer.py:487-530)"""
        self.key, step_key = jax.random.split(self.key)
        kwargs = self.step_kwargs_fn(step)
        dm = self.pipeline.datamanager
        dm.maybe_reload(step)
        with self.train_lock:
            if self.pipeline.aux_update_fn is not None:
                self.key, aux_key = jax.random.split(self.key)
                self.state = self.pipeline.aux_update_fn(self.state, step, aux_key)
            if getattr(dm, "_subsetting", False):
                kwargs = dict(kwargs, resident_map=dm.resident_map)
            self.state, metrics = self.pipeline.train_step(
                self.state, dm.train_images, step_key, **kwargs
            )
        return metrics

    def train(self) -> None:
        """Main loop (reference trainer.py:233-312)."""
        assert self.state is not None, "call setup() first"
        cfg = self.config
        num_rays = self.pipeline.datamanager.config.train_num_rays_per_batch
        self.base_dir.mkdir(parents=True, exist_ok=True)

        if "viewer" in cfg.vis and self.viewer is None:
            try:
                from nerfstudio_tpu.viewer.server import Viewer

                self.viewer = Viewer(
                    self.pipeline, lambda: self.state, train_lock=self.train_lock
                )
                self.viewer.start()
            except Exception as e:  # noqa: BLE001
                print(f"viewer unavailable: {e}")

        t_last = time.perf_counter()
        steps_since_log = 0
        for step in range(int(self.state.step), cfg.max_num_iterations):
            metrics = self.train_iteration(step)
            steps_since_log += 1

            if step % 10 == 0 or step == cfg.max_num_iterations - 1:
                jax.block_until_ready(self.state.params)
                now = time.perf_counter()
                rays_per_sec = num_rays * steps_since_log / (now - t_last)
                t_last = now
                steps_since_log = 0
                host_metrics = {k: float(v) for k, v in metrics.items()}
                host_metrics["train_rays_per_sec"] = rays_per_sec
                self.writer.put_dict("train", host_metrics, step)
                self.last_host_metrics = host_metrics

            if self.viewer is not None:
                self.viewer.update(self, step)
                # pause-state spin (reference trainer.py:233-312 train loop).
                # Flush the writer and checkpoint once while paused so a long
                # pause on a preemptible host can't lose work, and keep the
                # viewer fed.
                paused_once = False
                while getattr(self.viewer, "paused", False):
                    if not paused_once:
                        paused_once = True
                        self.writer.flush()
                        if cfg.steps_per_save:
                            self.save_checkpoint(step + 1)
                    self.viewer.update(self, step)
                    time.sleep(0.1)

            if cfg.steps_per_eval_batch and step % cfg.steps_per_eval_batch == 0 and step > 0:
                self.eval_batch_iteration(step)
            if cfg.steps_per_eval_image and step % cfg.steps_per_eval_image == 0 and step > 0:
                self.eval_iteration(step)
            if (
                cfg.steps_per_eval_all_images
                and step % cfg.steps_per_eval_all_images == 0
                and step > 0
            ):
                all_metrics = self.pipeline.get_average_eval_image_metrics(self.state)
                self.writer.put_dict("eval_all", all_metrics, step)
            if cfg.steps_per_save and (step + 1) % cfg.steps_per_save == 0:
                self.save_checkpoint(step + 1)

        self.save_checkpoint(cfg.max_num_iterations)
        self.writer.flush()
        print(f"training finished; checkpoints in {self.checkpoint_dir}")

    def eval_batch_iteration(self, step: int) -> Dict[str, float]:
        """Eval-ray-batch PSNR (reference trainer.py eval_iteration's
        get_eval_loss_dict path): random pixels of a random eval image."""
        from nerfstudio_tpu.model_components.ray_generators import (
            generate_rays_from_indices,
        )
        from nerfstudio_tpu.utils.metrics import psnr

        dm = self.pipeline.datamanager
        n_eval = len(dm.eval_dataset)
        rng = np.random.default_rng(step)
        img_idx = int(rng.integers(n_eval))
        gt = np.asarray(dm.eval_dataset.get_image_float32(img_idx))
        h, w = gt.shape[:2]
        n_rays = min(dm.config.eval_num_rays_per_batch, 1024)
        rows = rng.integers(0, h, n_rays)
        cols = rng.integers(0, w, n_rays)
        idx = jnp.stack(
            [jnp.full(n_rays, img_idx, jnp.int32), jnp.asarray(rows), jnp.asarray(cols)],
            axis=-1,
        )
        rb = generate_rays_from_indices(dm.eval_cameras, idx)
        if self.pipeline._eval_chunk is None:
            self.pipeline.build_eval_chunk()
        out = self.pipeline._eval_chunk(self.state.params, rb, self.state.aux)
        pred = np.asarray(out["rgb"])
        metrics = {"eval_batch_psnr": float(psnr(jnp.asarray(pred), jnp.asarray(gt[rows, cols])))}
        self.writer.put_dict("eval_batch", metrics, step)
        return metrics

    def eval_iteration(self, step: int) -> Dict[str, float]:
        """(reference trainer.py:533-567)"""
        n_eval = len(self.pipeline.datamanager.eval_dataset)
        idx = step % max(n_eval, 1)
        metrics, images = self.pipeline.get_eval_image_metrics_and_images(self.state, idx)
        self.writer.put_dict("eval", metrics, step)
        self.writer.put_image("eval/img", images["img"], step)
        return metrics
