"""SO(3)/SE(3) exponential maps (reference: nerfstudio/cameras/lie_groups.py:25-117).

Taylor-safe near theta=0 via jnp.where on both branches (grad-safe: the
untaken branch is finite)."""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _skew(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def _rodrigues_terms(w: jnp.ndarray):
    """Shared Rodrigues terms. W2 computed analytically as w w^T - theta^2 I
    (never via matmul — TPU f32 matmuls default to bf16 MXU precision, which
    is far too coarse for pose math)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # NaN-safe under autodiff: the UNTAKEN where-branch must stay finite AND
    # have finite derivatives (0 * NaN = NaN in the where-VJP), so every
    # denominator uses a clamped theta2.
    theta2_safe = jnp.maximum(theta2, _EPS * _EPS)
    theta = jnp.sqrt(theta2_safe)
    W = _skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    W2 = w[..., :, None] * w[..., None, :] - theta2[..., None, None] * eye
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2_safe)
    return W, W2, eye, A, B, C


def exp_map_SO3xR3(tangent: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [t, w] -> (..., 3, 4). Rotation via Rodrigues, translation raw."""
    t, w = tangent[..., :3], tangent[..., 3:]
    W, W2, eye, A, B, _ = _rodrigues_terms(w)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def exp_map_SE3(tangent: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [t, w] -> (..., 3, 4) full SE(3) exponential (V @ t)."""
    t, w = tangent[..., :3], tangent[..., 3:]
    W, W2, eye, A, B, C = _rodrigues_terms(w)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    Vt = jnp.einsum("...ij,...j->...i", V, t, precision="highest")
    return jnp.concatenate([R, Vt[..., :, None]], axis=-1)
