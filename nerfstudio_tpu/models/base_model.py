"""Model base (reference: nerfstudio/models/base_model.py:58-259).

A Model is a flax module: ``__call__(ray_bundle, key=None) -> outputs dict``.
Step-dependent quantities (proposal anneal, schedules) enter as explicit
arguments — the functional replacement for the reference's mutable
TrainingCallback state. Loss/metric computation are plain static methods so
they trace into the same jitted train step as the forward pass.

Chunked full-image inference (reference base_model.py:185-205) pads the ray
grid to a multiple of the chunk size and scans fixed-size chunks — one
compilation, any image size."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Type

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras.cameras import Cameras
from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.data.scene_box import SceneBox


@dataclasses.dataclass
class ModelConfig:
    """(reference base_model.py:37-56)"""

    _target: Type = dataclasses.field(default=None)  # type: ignore[assignment]
    enable_collider: bool = True
    collider_params: Optional[Dict[str, float]] = dataclasses.field(
        default_factory=lambda: {"near_plane": 2.0, "far_plane": 6.0}
    )
    loss_coefficients: Dict[str, float] = dataclasses.field(
        default_factory=lambda: {"rgb_loss_coarse": 1.0, "rgb_loss_fine": 1.0}
    )
    eval_num_rays_per_chunk: int = 4096
    prompt: Optional[str] = None

    def setup(self, **kwargs):
        return self._target(self, **kwargs)


class Model(nn.Module):
    """Base model module. Subclasses set ``config`` + scene info attributes."""

    config: Any = None
    scene_aabb: Tuple[Tuple[float, float, float], Tuple[float, float, float]] = (
        (-1.0, -1.0, -1.0),
        (1.0, 1.0, 1.0),
    )
    num_train_data: int = 1
    train: bool = True

    def __call__(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        return self.get_outputs(ray_bundle, key=key, **kwargs)

    def get_outputs(self, ray_bundle: RayBundle, key: Optional[jax.Array] = None, **kwargs):
        raise NotImplementedError

    # -- loss/metrics: pure, trace into the train step ---------------------

    @staticmethod
    def get_metrics_dict(outputs, batch, params=None) -> Dict[str, jnp.ndarray]:
        return {}

    @staticmethod
    def get_loss_dict(outputs, batch, metrics_dict=None, params=None, **kw) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    # -- training callbacks as data ----------------------------------------

    @staticmethod
    def step_kwargs(step: int, config) -> Dict[str, Any]:
        """Map step -> per-step kwargs for get_outputs (anneal factors etc.).

        Host-side; the returned values become jit inputs. The functional
        replacement for reference TrainingCallbacks (engine/callbacks.py)."""
        return {}


def get_rgba_image(outputs: Dict[str, jnp.ndarray], output_name: str = "rgb") -> jnp.ndarray:
    """RGBA from rgb+accumulation (reference base_model.py:245-259)."""
    rgb = outputs[output_name]
    acc = outputs["accumulation"]
    return jnp.concatenate([rgb, acc], axis=-1)


def render_camera(
    apply_fn,
    cameras: Cameras,
    camera_idx: int,
    chunk_size: int = 4096,
    camera_opt_to_camera=None,
) -> Dict[str, np.ndarray]:
    """Chunked full-image inference (reference base_model.py:166-205).

    apply_fn: jitted (ray_bundle) -> outputs dict for a flat chunk of rays.
    Pads the flattened ray grid to a chunk multiple; reassembles (H, W, C).
    """
    rb = cameras.generate_rays(camera_indices=camera_idx)
    h, w = rb.shape
    flat = rb.flatten()
    n = flat.size
    n_pad = (-n) % chunk_size
    if n_pad:
        pad_rb = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], n_pad, axis=0)], axis=0)
            if x is not None
            else None,
            flat,
        )
    else:
        pad_rb = flat
    num_chunks = (n + n_pad) // chunk_size

    # ASYNC python loop over chunks: dispatch every chunk without waiting
    # (jax queues them), then ONE device_get at the end. This beats both the
    # naive per-chunk round-trip loop AND a lax.map whole-image program — the
    # scan body re-reads the closed-over hash tables per iteration, measured
    # 6x slower than the same chunks as separate dispatches (67.2 s vs 11.2 s
    # per 512^2 frame, exp/eval_profile.py, r3). Per-dispatch overhead is
    # ~1 ms through the tunnel; at >= 16k-ray chunks it is noise.
    chunk_outs = []
    for i in range(num_chunks):
        rb_i = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, i * chunk_size, chunk_size, 0)
            if x is not None
            else None,
            pad_rb,
        )
        chunk_outs.append(apply_fn(rb_i))
    out = jax.device_get(chunk_outs)
    images = {}
    for k in out[0]:
        arr = np.concatenate([c[k] for c in out], axis=0)[:n]
        images[k] = arr.reshape((h, w) + arr.shape[1:])
    return images
