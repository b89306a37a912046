"""Custom activations (reference: nerfstudio/field_components/activations.py).

``trunc_exp``: exp forward, gradient computed with the input clamped to
[-15, 15] — the density activation used by instant-ngp/nerfacto. Implemented
as a jax.custom_vjp (reference uses a torch autograd.Function)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    # forward exponent clamped at 30 (density ~1e13): prevents f32 overflow ->
    # inf*delta -> (inf - inf) NaNs inside the transmittance cumsum
    return jnp.exp(jnp.minimum(x, 30.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.minimum(x, 30.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
