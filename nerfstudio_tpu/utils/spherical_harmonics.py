"""Real spherical harmonics (reference: nerfstudio/utils/spherical_harmonics.py).

Used both as a direction encoding (fields) and for 3DGS color. Evaluated with
hard-coded polynomials — pure VPU work that XLA fuses with neighbors.
"""

from __future__ import annotations

import jax.numpy as jnp

MAX_SH_DEGREE = 4

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005, -1.0925484305920792, 0.5462742152960396)
C3 = (
    -0.5900435899266435, 2.890611442640554, -0.4570457994644658, 0.3731763325901154,
    -0.4570457994644658, 1.445305721320277, -0.5900435899266435,
)
C4 = (
    2.5033429417967046, -1.7701307697799304, 0.9461746957575601, -0.6690465435572892,
    0.10578554691520431, -0.6690465435572892, 0.47308734787878004, -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_bases(degree: int) -> int:
    """Bases for SH of degree <= 4 (reference :90-96)."""
    assert degree <= MAX_SH_DEGREE
    return (degree + 1) ** 2


def components_from_spherical_harmonics(levels: int, directions: jnp.ndarray) -> jnp.ndarray:
    """SH basis values for unit directions; levels in [1, 5].

    Returns (..., levels**2). Reference :24-87.
    """
    num_components = levels**2
    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]
    comps = [jnp.full_like(x, C0)]
    if levels > 1:
        comps += [-C1 * y, C1 * z, -C1 * x]
    if levels > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if levels > 3:
        comps += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if levels > 4:
        comps += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    out = jnp.stack(comps, axis=-1)
    assert out.shape[-1] == num_components
    return out


def eval_sh(degree: int, coeffs: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color: coeffs (..., K, C), directions (..., 3) -> (..., C)."""
    basis = components_from_spherical_harmonics(degree + 1, directions)  # (..., K)
    return jnp.sum(basis[..., :, None] * coeffs, axis=-2)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
