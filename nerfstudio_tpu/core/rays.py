"""Ray datastructures: Frustums, RaySamples, RayBundle.

TPU-native re-design of reference nerfstudio/cameras/rays.py:33-296. All three
are JAX pytrees (see ``tensor_dataclass``); the alpha-compositing transmittance
math lives here as pure functions of static-shape arrays so it fuses into one
XLA program with the field evaluation (no packed/jagged tensors — TPU wants
fixed ``(num_rays, num_samples)`` grids with masks).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.tensor_dataclass import TensorDataclass, tensor_dataclass


@tensor_dataclass
class Frustums(TensorDataclass):
    """Cone frustums along rays (reference rays.py:33-104)."""

    origins: jnp.ndarray  # (..., 3)
    directions: jnp.ndarray  # (..., 3)
    starts: jnp.ndarray  # (..., 1)
    ends: jnp.ndarray  # (..., 1)
    pixel_area: jnp.ndarray  # (..., 1)
    offsets: Optional[jnp.ndarray] = None  # (..., 3)

    _field_custom_dimensions = {"origins": 1, "directions": 1, "offsets": 1}

    def get_positions(self) -> jnp.ndarray:
        """Midpoint positions (reference rays.py:50-62)."""
        pos = self.origins + self.directions * (self.starts + self.ends) / 2
        if self.offsets is not None:
            pos = pos + self.offsets
        return pos

    def get_start_positions(self) -> jnp.ndarray:
        return self.origins + self.directions * self.starts

    def get_gaussian_blob(self):
        """Conical-frustum gaussian for mip-NeRF IPE (reference rays.py:73-95)."""
        from nerfstudio_tpu.utils.math import conical_frustum_to_gaussian

        cone_radius = jnp.sqrt(self.pixel_area) / 1.7724538509055159  # sqrt(pi)
        return conical_frustum_to_gaussian(
            origins=self.origins,
            directions=self.directions,
            starts=self.starts,
            ends=self.ends,
            radius=cone_radius,
        )


@tensor_dataclass
class RaySamples(TensorDataclass):
    """Samples along rays (reference rays.py:107-188).

    ``spacing_starts/ends`` are in the warped [0,1] "spacing" domain used by
    spaced samplers; euclidean bin edges live in ``frustums.starts/ends``.
    """

    frustums: Frustums
    camera_indices: Optional[jnp.ndarray] = None  # (..., 1) int32
    deltas: Optional[jnp.ndarray] = None  # (..., 1)
    spacing_starts: Optional[jnp.ndarray] = None  # (..., num_samples, 1)
    spacing_ends: Optional[jnp.ndarray] = None
    metadata: Optional[Dict[str, jnp.ndarray]] = None
    times: Optional[jnp.ndarray] = None  # (..., 1)
    spacing_to_euclidean_fn: Optional[Callable] = None

    # spacing_to_euclidean_fn is a host-side callable, not a leaf
    def __post_init__(self):
        fn = self.spacing_to_euclidean_fn
        object.__setattr__(self, "spacing_to_euclidean_fn", None)
        super().__post_init__()
        object.__setattr__(self, "spacing_to_euclidean_fn", fn)

    def get_weights(self, densities: jnp.ndarray) -> jnp.ndarray:
        """Transmittance-weighted alpha compositing weights.

        Reference rays.py:129-152: ``alpha = 1 - exp(-sigma * delta)``;
        ``T_i = exp(-sum_{j<i} sigma_j delta_j)`` (exclusive cumsum — cheaper
        and more stable on TPU than the reference's cat+cumsum), weight =
        ``alpha * T``.
        """
        return render_weights_from_density(densities, self.deltas)

    def get_weights_and_transmittance(self, densities: jnp.ndarray):
        delta_density = self.deltas * densities
        alphas = 1.0 - jnp.exp(-delta_density)
        transmittance = jnp.exp(
            -(jnp.cumsum(delta_density, axis=-2) - delta_density)
        )
        return alphas * transmittance, transmittance

    @staticmethod
    def get_weights_and_transmittance_from_alphas(alphas: jnp.ndarray):
        """Weights from per-sample alphas (reference rays.py:154-188).

        Exclusive cumprod of (1 - alpha) in log-space (cumsum of log1p) —
        avoids torch's cumprod which XLA lowers poorly for long axes.
        """
        log_1m = jnp.log(jnp.clip(1.0 - alphas, 1e-10, 1.0))
        transmittance = jnp.exp(jnp.cumsum(log_1m, axis=-2) - log_1m)
        return alphas * transmittance, transmittance


def render_weights_from_density(densities: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Pure-function compositing weights; fuses into surrounding XLA program."""
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    # exclusive cumulative optical depth
    transmittance = jnp.exp(-(jnp.cumsum(delta_density, axis=-2) - delta_density))
    return alphas * transmittance


@tensor_dataclass
class RayBundle(TensorDataclass):
    """A bundle of rays (reference rays.py:191-296)."""

    origins: jnp.ndarray  # (..., 3)
    directions: jnp.ndarray  # (..., 3)
    pixel_area: jnp.ndarray  # (..., 1)
    camera_indices: Optional[jnp.ndarray] = None  # (..., 1) int32
    nears: Optional[jnp.ndarray] = None  # (..., 1)
    fars: Optional[jnp.ndarray] = None  # (..., 1)
    metadata: Optional[Dict[str, jnp.ndarray]] = None
    times: Optional[jnp.ndarray] = None  # (..., 1)

    _field_custom_dimensions = {"origins": 1, "directions": 1}

    def set_camera_indices(self, camera_index: int) -> "RayBundle":
        ci = jnp.full(self.shape + (1,), camera_index, dtype=jnp.int32)
        return self.replace(camera_indices=ci)

    @property
    def num_rays(self) -> int:
        return self.size

    def get_row_major_sliced_ray_bundle(self, start: int, end: int) -> "RayBundle":
        return self.flatten()[start:end]

    def get_ray_samples(
        self,
        bin_starts: jnp.ndarray,
        bin_ends: jnp.ndarray,
        spacing_starts: Optional[jnp.ndarray] = None,
        spacing_ends: Optional[jnp.ndarray] = None,
        spacing_to_euclidean_fn: Optional[Callable] = None,
    ) -> RaySamples:
        """Produce RaySamples from bin edges (reference rays.py:251-296)."""
        deltas = bin_ends - bin_starts
        broadcast = lambda x: (
            jnp.broadcast_to(x[..., None, :], bin_starts.shape[:-1] + x.shape[-1:])
            if x is not None
            else None
        )
        frustums = Frustums(
            origins=broadcast(self.origins),
            directions=broadcast(self.directions),
            starts=bin_starts,
            ends=bin_ends,
            pixel_area=broadcast(self.pixel_area),
        )
        return RaySamples(
            frustums=frustums,
            camera_indices=broadcast(self.camera_indices),
            deltas=deltas,
            spacing_starts=spacing_starts,
            spacing_ends=spacing_ends,
            metadata=(
                jax.tree_util.tree_map(broadcast, self.metadata)
                if self.metadata is not None
                else None
            ),
            times=broadcast(self.times),
            spacing_to_euclidean_fn=spacing_to_euclidean_fn,
        )
