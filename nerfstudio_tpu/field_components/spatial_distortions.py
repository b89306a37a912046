"""Spatial distortions (reference: nerfstudio/field_components/spatial_distortions.py).

``SceneContraction``: mip-NeRF 360 unbounded contraction
x -> (2 - 1/||x||) * x/||x|| for ||x|| > 1 (order=None: L2; order=inf: L∞,
the variant used with hash grids since it maps into the cube [-2,2]^3).

Pure functions of arrays — no parameters — so they compose into any jitted
field. The Gaussian overload propagates covariance with vmapped jacfwd
(reference uses torch.func vmap(jacrev)).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from nerfstudio_tpu.utils.math import Gaussians


class SpatialDistortion:
    def __call__(self, positions):
        raise NotImplementedError


class SceneContraction(SpatialDistortion):
    """(reference spatial_distortions.py:42-90)"""

    def __init__(self, order: Optional[Union[float, int, str]] = None):
        if order == "inf":
            order = jnp.inf
        self.order = order

    def _contract(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.order == jnp.inf:
            mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        else:
            mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
        mag = jnp.maximum(mag, 1e-10)
        contracted = (2.0 - 1.0 / mag) * (x / mag)
        return jnp.where(mag < 1.0, x, contracted)

    def __call__(self, positions):
        if isinstance(positions, Gaussians):
            mean = self._contract(positions.mean)
            flat = positions.mean.reshape(-1, 3)

            def jac(p):
                return jax.jacfwd(self._contract)(p)

            J = jax.vmap(jac)(flat).reshape(positions.mean.shape[:-1] + (3, 3))
            cov = jnp.einsum(
                "...ij,...jk,...lk->...il", J, positions.cov, J, precision="highest"
            )
            return Gaussians(mean=mean, cov=cov)
        return self._contract(positions)
