"""Renderers — composite per-sample quantities along rays (reference:
nerfstudio/model_components/renderers.py, 449 LoC).

Pure functions of static-shape (..., num_samples, C) arrays. The packed
nerfacc variants (reference renderers.py:97-102) are unnecessary: the TPU
design always uses fixed-width masked samples, so compositing is a plain
weighted sum that XLA fuses with the field evaluation.

Background color override: a module-level context manager mirroring the
reference's BACKGROUND_COLOR_OVERRIDE (renderers.py:42-57) for
renders-with-custom-background.
"""

from __future__ import annotations

import contextlib
from typing import Literal, Optional, Union

import jax
import jax.numpy as jnp

BackgroundColor = Union[Literal["random", "last_sample", "black", "white"], jnp.ndarray]

BACKGROUND_COLOR_OVERRIDE: Optional[jnp.ndarray] = None

_COLORS = {
    "black": jnp.array([0.0, 0.0, 0.0]),
    "white": jnp.array([1.0, 1.0, 1.0]),
}


@contextlib.contextmanager
def background_color_override_context(color: jnp.ndarray):
    """(reference renderers.py:42-57)"""
    global BACKGROUND_COLOR_OVERRIDE
    old = BACKGROUND_COLOR_OVERRIDE
    try:
        BACKGROUND_COLOR_OVERRIDE = color
        yield
    finally:
        BACKGROUND_COLOR_OVERRIDE = old


def get_background_color(
    background_color: BackgroundColor,
    shape,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if BACKGROUND_COLOR_OVERRIDE is not None:
        return jnp.broadcast_to(BACKGROUND_COLOR_OVERRIDE, shape)
    if isinstance(background_color, str):
        if background_color in _COLORS:
            return jnp.broadcast_to(_COLORS[background_color], shape)
        if background_color == "random":
            assert key is not None, "random background needs a PRNG key"
            return jax.random.uniform(key, shape)
        raise ValueError(background_color)
    return jnp.broadcast_to(background_color, shape)


def render_rgb(
    rgb: jnp.ndarray,
    weights: jnp.ndarray,
    background_color: BackgroundColor = "random",
    key: Optional[jax.Array] = None,
    return_background: bool = False,
):
    """Weighted-sum compositing + background fill (reference renderers.py:60-146).

    rgb: (..., S, 3); weights: (..., S, 1) -> (..., 3).
    With return_background=True also returns the background color used (so
    models can stash it for alpha-GT loss blending).
    """
    comp = jnp.sum(weights * rgb, axis=-2)
    accumulation = jnp.sum(weights, axis=-2)
    if background_color == "last_sample":
        bg = rgb[..., -1, :]
        if BACKGROUND_COLOR_OVERRIDE is not None:
            bg = jnp.broadcast_to(BACKGROUND_COLOR_OVERRIDE, bg.shape)
    else:
        bg = get_background_color(background_color, comp.shape, key=key)
    out = comp + bg * (1.0 - accumulation)
    if return_background:
        return out, bg
    return out


def blend_background(image: jnp.ndarray, background_color: BackgroundColor = "random", key=None):
    """Alpha-blend an RGBA image over a background (reference renderers.py:148-173)."""
    if image.shape[-1] < 4:
        return image
    rgb, alpha = image[..., :3], image[..., 3:]
    bg = get_background_color(background_color, rgb.shape, key=key)
    return rgb * alpha + bg * (1.0 - alpha)


def blend_background_for_loss_computation(
    pred_image: jnp.ndarray,
    pred_accumulation: jnp.ndarray,
    gt_image: jnp.ndarray,
    background_color: BackgroundColor = "black",
    background: Optional[jnp.ndarray] = None,
) -> tuple:
    """Prepare (pred, gt) for the RGB loss when GT has alpha
    (reference renderers.py:175-199): GT is blended over a CONCRETE color so
    the background IS supervised. ``background`` (the color the renderer
    actually used — stash from render_rgb(return_background=True)) takes
    precedence; "last_sample" degrades to black."""
    if gt_image.shape[-1] != 4:
        return pred_image, gt_image
    alpha = gt_image[..., 3:]
    if background is not None:
        bg = background
    elif background_color in ("last_sample", "random"):
        bg = jnp.zeros_like(pred_image)
    else:
        bg = get_background_color(background_color, pred_image.shape)
    gt = gt_image[..., :3] * alpha + bg * (1.0 - alpha)
    return pred_image, gt


def render_sh(
    sh_coeffs: jnp.ndarray,
    directions: jnp.ndarray,
    weights: jnp.ndarray,
    levels: int,
) -> jnp.ndarray:
    """Evaluate SH color along view dirs then composite (reference :235-286)."""
    from nerfstudio_tpu.utils.spherical_harmonics import components_from_spherical_harmonics

    num_comps = levels**2
    sh = sh_coeffs.reshape(sh_coeffs.shape[:-1] + (3, num_comps))
    basis = components_from_spherical_harmonics(levels, directions)[..., None, :]
    rgb = jnp.sum(sh * basis, axis=-1)
    rgb = jax.nn.sigmoid(rgb)
    return jnp.sum(weights * rgb, axis=-2)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    """(reference renderers.py:289-317)"""
    return jnp.sum(weights, axis=-2)


def render_depth(
    weights: jnp.ndarray,
    ray_samples,
    method: Literal["median", "expected"] = "median",
) -> jnp.ndarray:
    """Depth compositing (reference renderers.py:320-385).

    median: smallest t where cumulative weight >= 0.5 (via searchsorted on the
    cumsum — static shapes). expected: weight-normalized mean t.
    """
    steps = (ray_samples.frustums.starts + ray_samples.frustums.ends) / 2  # (..., S, 1)
    if method == "expected":
        eps = 1e-10
        depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
        return jnp.clip(depth, steps[..., 0, :].min(), steps[..., -1, :].max())
    if method == "median":
        from nerfstudio_tpu.model_components.ray_samplers import searchsorted_batched

        cum = jnp.cumsum(weights[..., 0], axis=-1)  # (..., S)
        split = jnp.full(cum.shape[:-1] + (1,), 0.5)
        idx = searchsorted_batched(cum, split, side="left")
        idx = jnp.clip(idx, 0, steps.shape[-2] - 1)
        from nerfstudio_tpu.ops.select import take_last_axis

        return take_last_axis(steps[..., 0], idx)
    raise ValueError(method)


def render_uncertainty(betas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(reference renderers.py:388-405)"""
    return jnp.sum(weights * betas, axis=-2)


def render_semantics(semantics: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """(reference renderers.py:408-426)"""
    return jnp.sum(weights * semantics, axis=-2)


def render_normals(normals: jnp.ndarray, weights: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """(reference renderers.py:429-449)"""
    n = jnp.sum(weights * normals, axis=-2)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-10)
    return n
