"""Named colors (reference: nerfstudio/utils/colors.py)."""

from __future__ import annotations

import jax.numpy as jnp

WHITE = jnp.array([1.0, 1.0, 1.0])
BLACK = jnp.array([0.0, 0.0, 0.0])
RED = jnp.array([1.0, 0.0, 0.0])
GREEN = jnp.array([0.0, 1.0, 0.0])
BLUE = jnp.array([0.0, 0.0, 1.0])

COLORS_DICT = {"white": WHITE, "black": BLACK, "red": RED, "green": GREEN, "blue": BLUE}


def get_color(color) -> jnp.ndarray:
    """Name or [r,g,b] -> array (reference colors.py:36-56)."""
    if isinstance(color, str):
        color = color.lower()
        if color not in COLORS_DICT:
            raise ValueError(f"{color} is not a valid preset color")
        return COLORS_DICT[color]
    if isinstance(color, (list, tuple)):
        if len(color) != 3:
            raise ValueError(f"Color should be 3 values (RGB) instead got {color}")
        return jnp.asarray(color, dtype=jnp.float32)
    raise ValueError(f"Color should be an RGB list or string, instead got {type(color)}")
