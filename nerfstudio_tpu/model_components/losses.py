"""Losses (reference: nerfstudio/model_components/losses.py, 586 LoC).

Pure jnp functions. The mip-NeRF 360 interlevel ("proposal") loss uses a
batched searchsorted outer-measure; the distortion loss uses the O(S^2)
pairwise form (S<=64, negligible on the VPU and fully fusable).
"""

from __future__ import annotations

from typing import Dict, List, Literal, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RaySamples
from nerfstudio_tpu.utils.math import masked_reduction, normalized_depth_scale_and_shift

EPS = 1.0e-7

# depth losses that force the termination distribution to match a prior
FORCE_PSEUDODEPTH_LOSS = ("sparsenerf_ranking",)


def masked_l1(pred, gt, mask=None):
    err = jnp.abs(pred - gt)
    if mask is None:
        return jnp.mean(err)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def _searchsorted(a: jnp.ndarray, v: jnp.ndarray, side: str = "left") -> jnp.ndarray:
    """Batched searchsorted over the last axis (fused comparison-count —
    see ray_samplers.searchsorted_batched for the TPU rationale)."""
    from nerfstudio_tpu.model_components.ray_samplers import searchsorted_batched

    return searchsorted_batched(a, v, side=side)


def outer(
    t0_starts: jnp.ndarray,
    t0_ends: jnp.ndarray,
    t1_starts: jnp.ndarray,
    t1_ends: jnp.ndarray,
    y1: jnp.ndarray,
) -> jnp.ndarray:
    """Outer measure of histogram (t1, y1) over intervals [t0_starts, t0_ends]
    (reference losses.py:53-84, mip-NeRF 360 sec. 3.3)."""
    cy1 = jnp.concatenate([jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo = jnp.clip(_searchsorted(t1_starts, t0_starts, side="right") - 1, 0, y1.shape[-1] - 1)
    idx_hi = jnp.clip(_searchsorted(t1_ends, t0_ends, side="right"), 0, y1.shape[-1] - 1)
    from nerfstudio_tpu.ops.select import take_last_axis

    # one-hot select instead of take_along_axis: lane gathers (and their
    # scatter backward) serialize on TPU — this was 290 ms/step in nerfacto
    cy1_lo = take_last_axis(cy1[..., :-1], idx_lo)
    cy1_hi = take_last_axis(cy1[..., 1:], idx_hi)
    return cy1_hi - cy1_lo


def lossfun_outer(
    t: jnp.ndarray, w: jnp.ndarray, t_env: jnp.ndarray, w_env: jnp.ndarray
) -> jnp.ndarray:
    """Proposal histogram must upper-bound the fine histogram
    (reference losses.py:87-106)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, 0.0, None) ** 2 / (w + EPS)


def ray_samples_to_sdist(ray_samples: RaySamples) -> jnp.ndarray:
    """Spacing-domain bin edges (..., S+1) (reference losses.py:109-117)."""
    starts = ray_samples.spacing_starts[..., 0]
    ends = ray_samples.spacing_ends[..., 0]
    return jnp.concatenate([starts, ends[..., -1:]], axis=-1)


def interlevel_loss(weights_list: List[jnp.ndarray], ray_samples_list: List[RaySamples]) -> jnp.ndarray:
    """mip-NeRF 360 interlevel loss (reference losses.py:120-133).

    The *final* (nerf) histogram is the target (detached); each proposal level
    is pulled to bound it."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1][..., 0])
    loss_interlevel = 0.0
    for rs, wl in zip(ray_samples_list[:-1], weights_list[:-1]):
        sdist = ray_samples_to_sdist(rs)
        cp = sdist
        wp = wl[..., 0]
        loss_interlevel = loss_interlevel + jnp.mean(lossfun_outer(c, w, cp, wp))
    return loss_interlevel


def lossfun_distortion(t: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF 360 distortion: concentrate+shrink the histogram
    (reference losses.py:135-148)."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w**2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list: List[jnp.ndarray], ray_samples_list: List[RaySamples]) -> jnp.ndarray:
    """(reference losses.py:150-155)"""
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1][..., 0]
    return jnp.mean(lossfun_distortion(c, w))


def orientation_loss(
    weights: jnp.ndarray, normals: jnp.ndarray, view_dirs: jnp.ndarray
) -> jnp.ndarray:
    """Ref-NeRF orientation: normals must not face away from the camera
    (reference losses.py:201-213)."""
    v = -view_dirs  # towards camera
    n_dot_v = jnp.sum(normals * v[..., None, :], axis=-1)
    return jnp.sum(weights[..., 0] * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)


def pred_normal_loss(
    weights: jnp.ndarray, normals: jnp.ndarray, pred_normals: jnp.ndarray
) -> jnp.ndarray:
    """Predicted normals follow density-gradient normals (reference :216-222)."""
    return jnp.sum(
        weights[..., 0] * (1.0 - jnp.sum(normals * pred_normals, axis=-1)), axis=-1
    )


def ds_nerf_depth_loss(
    weights: jnp.ndarray,
    termination_depth: jnp.ndarray,
    steps: jnp.ndarray,
    lengths: jnp.ndarray,
    sigma: jnp.ndarray,
) -> jnp.ndarray:
    """DS-NeRF likelihood depth loss (reference losses.py:225-250)."""
    depth_mask = (termination_depth > 0).astype(weights.dtype)
    loss = (
        -jnp.log(weights + EPS)
        * jnp.exp(-((steps - termination_depth[:, None]) ** 2) / (2 * sigma))
        * lengths
    )
    loss = jnp.sum(loss, axis=-2) * depth_mask
    return jnp.mean(loss)


def urf_depth_loss(
    weights: jnp.ndarray,
    termination_depth: jnp.ndarray,
    predicted_depth: jnp.ndarray,
    steps: jnp.ndarray,
    sigma: jnp.ndarray,
) -> jnp.ndarray:
    """Urban-RF expected-depth + line-of-sight loss (reference losses.py:253-300)."""
    depth_mask = (termination_depth > 0).astype(weights.dtype)
    expected_depth_loss = (termination_depth - predicted_depth) ** 2
    line_of_sight_obj_mask = (jnp.abs(steps - termination_depth[:, None]) < sigma).astype(
        weights.dtype
    )
    target = jnp.exp(
        -((steps - termination_depth[:, None]) ** 2) / (2 * sigma)
    ) / jnp.sqrt(2 * jnp.pi * sigma)
    line_of_sight_obj_loss = jnp.sum(
        line_of_sight_obj_mask * (weights - target * (2 * sigma / steps.shape[-2])) ** 2, axis=-2
    )
    empty_mask = (steps < termination_depth[:, None] - sigma).astype(weights.dtype)
    line_of_sight_empty_loss = jnp.sum(empty_mask * weights**2, axis=-2)
    loss = expected_depth_loss + line_of_sight_obj_loss + line_of_sight_empty_loss
    return jnp.mean(loss * depth_mask)


def depth_loss(
    weights: jnp.ndarray,
    ray_samples: RaySamples,
    termination_depth: jnp.ndarray,
    predicted_depth: jnp.ndarray,
    sigma: jnp.ndarray,
    directions_norm: jnp.ndarray,
    is_euclidean: bool,
    depth_loss_type: Literal["ds_nerf", "urf"] = "ds_nerf",
) -> jnp.ndarray:
    """Dispatch (reference losses.py:303-326)."""
    if not is_euclidean:
        termination_depth = termination_depth * directions_norm
    steps = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2
    if depth_loss_type == "ds_nerf":
        lengths = ray_samples.frustums.ends - ray_samples.frustums.starts
        return ds_nerf_depth_loss(weights, termination_depth, steps, lengths, sigma)
    if depth_loss_type == "urf":
        return urf_depth_loss(weights, termination_depth, predicted_depth, steps, sigma)
    raise ValueError(depth_loss_type)


def monosdf_normal_loss(normal_pred: jnp.ndarray, normal_gt: jnp.ndarray) -> jnp.ndarray:
    """L1 + cosine normal consistency (reference losses.py:328-344)."""
    normal_gt = normal_gt / jnp.maximum(jnp.linalg.norm(normal_gt, axis=-1, keepdims=True), 1e-10)
    normal_pred = normal_pred / jnp.maximum(
        jnp.linalg.norm(normal_pred, axis=-1, keepdims=True), 1e-10
    )
    l1 = jnp.mean(jnp.sum(jnp.abs(normal_pred - normal_gt), axis=-1))
    cos = jnp.mean(jnp.abs(1.0 - jnp.sum(normal_pred * normal_gt, axis=-1)))
    return l1 + cos


def scale_and_shift_invariant_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    alpha: float = 0.5,
    scales: int = 4,
    reduction_type: Literal["image", "batch"] = "batch",
) -> jnp.ndarray:
    """MiDaS scale/shift-invariant MSE + multiscale gradient matching
    (reference losses.py:346-515). Inputs (B, H, W)."""
    scale, shift = normalized_depth_scale_and_shift(prediction, target, mask)
    scaled = scale[:, None, None] * prediction + shift[:, None, None]
    # data term
    res = (scaled - target) ** 2 * mask
    data_loss = masked_reduction(res, mask, reduction_type)
    # gradient term over scales
    reg = 0.0
    for s in range(scales):
        step = 2**s
        d = scaled[:, ::step, ::step] - target[:, ::step, ::step]
        m = mask[:, ::step, ::step]
        gx = jnp.abs(d[:, :, 1:] - d[:, :, :-1]) * (m[:, :, 1:] * m[:, :, :-1])
        gy = jnp.abs(d[:, 1:, :] - d[:, :-1, :]) * (m[:, 1:, :] * m[:, :-1, :])
        reg = reg + masked_reduction(gx, m[:, :, 1:] * m[:, :, :-1], reduction_type)
        reg = reg + masked_reduction(gy, m[:, 1:, :] * m[:, :-1, :], reduction_type)
    return data_loss + alpha * reg


def tv_loss(grids: jnp.ndarray) -> jnp.ndarray:
    """Total variation on feature grids (..., C, H, W) (reference losses.py:517-531)."""
    h_tv = jnp.mean((grids[..., 1:, :] - grids[..., :-1, :]) ** 2)
    w_tv = jnp.mean((grids[..., :, 1:] - grids[..., :, :-1]) ** 2)
    return h_tv + w_tv


def depth_ranking_loss(rendered_depth: jnp.ndarray, gt_depth: jnp.ndarray, m: float = 1e-4) -> jnp.ndarray:
    """SparseNeRF ranking loss on consecutive pixel pairs
    (reference losses.py:572-585). Inputs (..., 2k, 1) where adjacent pairs
    come from the PairPixelSampler."""
    g = gt_depth[..., ::2, :] - gt_depth[..., 1::2, :]
    r = rendered_depth[..., ::2, :] - rendered_depth[..., 1::2, :]
    differing_signs = jnp.sign(g) != jnp.sign(r)
    return jnp.mean(jnp.where(differing_signs, jnp.abs(r) + m, 0.0))


def scale_gradients_by_distance_squared(
    field_outputs: Dict, ray_samples: RaySamples
) -> Dict:
    """Radiance-gradient scaling by 1/d^2 ("Floaters No More", reference
    losses.py:534-570). Implemented with a custom_vjp-free trick:
    out = x * s + stop_grad(x) * (1 - s)."""
    scaling = jnp.clip(ray_samples.frustums.starts**2 * 4.0, None, 1.0)
    out = {}
    for k, v in field_outputs.items():
        s = scaling
        out[k] = v * s + jax.lax.stop_gradient(v) * (1.0 - s)
    return out
