"""Input encodings as flax.linen modules.

TPU-native re-design of reference nerfstudio/field_components/encodings.py
(799 LoC). The tcnn CUDA backends (HashGrid / Frequency / SphericalHarmonics)
are replaced by XLA-fused jnp code and, for the hash grid, an optional Pallas
fused path (ops/fused_hash_mlp.py). All encodings take (..., in_dim) and
return (..., out_dim) with static shapes.
"""

from __future__ import annotations

from typing import Literal, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.ops.hash_grid import hash_encode, init_hash_table
from nerfstudio_tpu.ops.interp import grid_sample_1d, grid_sample_2d, grid_sample_3d
from nerfstudio_tpu.utils.math import expected_sin, generate_polyhedron_basis
from nerfstudio_tpu.utils.spherical_harmonics import components_from_spherical_harmonics


class Encoding(nn.Module):
    """Base encoding API (reference encodings.py:37-63)."""

    in_dim: int = 3

    def get_out_dim(self) -> int:
        raise NotImplementedError


class Identity(Encoding):
    def get_out_dim(self) -> int:
        return self.in_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x


class ScalingAndOffset(Encoding):
    """(reference encodings.py:66-91)"""

    scaling: float = 1.0
    offset: float = 0.0

    def get_out_dim(self) -> int:
        return self.in_dim

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.scaling * x + self.offset


class NeRFEncoding(Encoding):
    """Multiscale sin/cos positional encoding, optionally integrated
    (mip-NeRF expected_sin over covariances) (reference encodings.py:94-186)."""

    num_frequencies: int = 10
    min_freq_exp: float = 0.0
    max_freq_exp: float = 9.0
    include_input: bool = False

    def get_out_dim(self) -> int:
        out = self.in_dim * self.num_frequencies * 2
        if self.include_input:
            out += self.in_dim
        return out

    @nn.compact
    def __call__(
        self, in_tensor: jnp.ndarray, covs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        scaled_in = 2.0 * jnp.pi * in_tensor
        freqs = 2.0 ** jnp.linspace(self.min_freq_exp, self.max_freq_exp, self.num_frequencies)
        scaled = scaled_in[..., None] * freqs  # (..., D, F)
        scaled = scaled.reshape(scaled.shape[:-2] + (-1,))  # (..., D*F)
        if covs is None:
            enc = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
        else:
            var = jnp.diagonal(covs, axis1=-2, axis2=-1)[..., :, None] * freqs[None, :] ** 2
            var = (2.0 * jnp.pi) ** 2 * var.reshape(var.shape[:-2] + (-1,))
            enc = expected_sin(
                jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1),
                jnp.concatenate([var, var], axis=-1),
            )
        if self.include_input:
            enc = jnp.concatenate([enc, in_tensor], axis=-1)
        return enc


class FFEncoding(Encoding):
    """Fourier-feature encoding with an explicit basis (reference :189-263)."""

    basis: Optional[np.ndarray] = None  # (in_dim, num_basis)
    num_frequencies: int = 1
    min_freq_exp: float = 0.0
    max_freq_exp: float = 0.0
    include_input: bool = False

    def get_out_dim(self) -> int:
        assert self.basis is not None
        out = self.basis.shape[1] * self.num_frequencies * 2
        if self.include_input:
            out += self.in_dim
        return out

    @nn.compact
    def __call__(
        self, in_tensor: jnp.ndarray, covs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b = jnp.asarray(self.basis, dtype=in_tensor.dtype)
        proj = jnp.matmul(2.0 * jnp.pi * in_tensor, b, precision="highest")
        freqs = 2.0 ** jnp.linspace(self.min_freq_exp, self.max_freq_exp, self.num_frequencies)
        scaled = (proj[..., None] * freqs).reshape(proj.shape[:-1] + (-1,))
        if covs is None:
            enc = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
        else:
            cov_proj = jnp.sum((covs @ b) * b, axis=-2)  # diag(B^T Σ B)
            var = (2.0 * jnp.pi) ** 2 * cov_proj[..., None] * freqs**2
            var = var.reshape(var.shape[:-2] + (-1,))
            enc = expected_sin(
                jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1),
                jnp.concatenate([var, var], axis=-1),
            )
        if self.include_input:
            enc = jnp.concatenate([enc, in_tensor], axis=-1)
        return enc


def rff_encoding(in_dim: int, num_frequencies: int, scale: float, seed: int = 0) -> FFEncoding:
    """Random Fourier features: gaussian basis (reference RFFEncoding :266-285)."""
    rng = np.random.default_rng(seed)
    basis = (scale * rng.standard_normal((in_dim, num_frequencies))).astype(np.float32)
    return FFEncoding(in_dim=in_dim, basis=basis, num_frequencies=1, include_input=False)


def polyhedron_ff_encoding(
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    basis_shape: Literal["octahedron", "icosahedron"] = "octahedron",
    basis_subdivisions: int = 1,
    include_input: bool = False,
) -> FFEncoding:
    """mip-360 polyhedron FF encoding (reference :288-304)."""
    basis = np.asarray(
        generate_polyhedron_basis(basis_shape, basis_subdivisions), dtype=np.float32
    )
    return FFEncoding(
        in_dim=3,
        basis=basis,
        num_frequencies=num_frequencies,
        min_freq_exp=min_freq_exp,
        max_freq_exp=max_freq_exp,
        include_input=include_input,
    )


class HashEncoding(Encoding):
    """Instant-NGP multiresolution hash grid (reference encodings.py:307-463).

    XLA path: one fused gather over all levels (ops/hash_grid.py). The Pallas
    fused hash+MLP path is selected by MLPWithHashEncoding, not here.
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 1024
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    hash_init_scale: float = 0.001
    param_dtype: jnp.dtype = jnp.float32
    # unbiased half-cost backward: scatter one parity tetrahedron per sample
    bwd_corner_sample: bool = False
    # one-corner unbiased trilerp fwd+bwd (1/8 accesses; for density fields
    # whose output only guides sampling, e.g. proposal nets)
    stochastic_corner: bool = False
    # z-pair packed gathers: 4 row gathers per trilerp (ops/hash_grid.py)
    z_pair: bool = False
    # block-packed layout: 2x2x2 vertex blocks per row unit -> ONE row
    # gather per trilerp (stochastic rounding on odd axes, train only)
    block: bool = False
    # exact 8-corner trilerp over the block layout (eval/render path)
    block_exact: bool = False

    def get_out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def hash_table_size(self) -> int:
        return 2**self.log2_hashmap_size

    def setup(self):
        # setup-style (not @nn.compact) so the fused hash+MLP path in
        # MLPWithHashEncoding can read ``self.hash_table`` directly
        self.hash_table = self.param(
            "hash_table",
            lambda key: init_hash_table(
                key,
                self.num_levels,
                self.hash_table_size,
                self.features_per_level,
                self.hash_init_scale,
                self.param_dtype,
            ),
        )

    def __call__(
        self, in_tensor: jnp.ndarray, bwd_levels=None, bwd_scale: float = 1.0
    ) -> jnp.ndarray:
        # bwd_levels/bwd_scale: static level-subsampled table backward
        # (block train path only — see ops/hash_grid.hash_encode)
        return hash_encode(
            in_tensor,
            self.hash_table,
            num_levels=self.num_levels,
            min_res=self.min_res,
            max_res=self.max_res,
            hash_table_size=self.hash_table_size,
            bwd_corner_sample=self.bwd_corner_sample,
            stochastic_corner=self.stochastic_corner,
            z_pair=self.z_pair,
            block=self.block,
            block_exact=self.block_exact,
            bwd_levels=bwd_levels,
            bwd_scale=bwd_scale,
        )


class SHEncoding(Encoding):
    """Spherical-harmonic direction encoding, levels<=4 (reference :752-799)."""

    levels: int = 4

    def get_out_dim(self) -> int:
        return self.levels**2

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        return components_from_spherical_harmonics(self.levels, in_tensor)


class TensorCPEncoding(Encoding):
    """TensoRF CANDECOMP/PARAFAC decomposition (reference encodings.py:466-537)."""

    resolution: int = 256
    num_components: int = 24
    init_scale: float = 0.1

    def get_out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        # line_coef: (3, num_components, resolution)
        line_coef = self.param(
            "line_coef",
            lambda key: self.init_scale
            * jax.random.normal(key, (3, self.num_components, self.resolution)),
        )
        out = (
            grid_sample_1d(line_coef[0], in_tensor[..., 0])
            * grid_sample_1d(line_coef[1], in_tensor[..., 1])
            * grid_sample_1d(line_coef[2], in_tensor[..., 2])
        )
        return out


class TensorVMEncoding(Encoding):
    """TensoRF vector-matrix decomposition (reference encodings.py:540-640)."""

    resolution: int = 128
    num_components: int = 24
    init_scale: float = 0.1

    def get_out_dim(self) -> int:
        return 3 * self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        plane_coef = self.param(
            "plane_coef",
            lambda key: self.init_scale
            * jax.random.normal(
                key, (3, self.num_components, self.resolution, self.resolution)
            ),
        )
        line_coef = self.param(
            "line_coef",
            lambda key: self.init_scale
            * jax.random.normal(key, (3, self.num_components, self.resolution)),
        )
        # planes: xy, xz, yz ; lines: z, y, x (reference :584-590)
        p0 = grid_sample_2d(plane_coef[0], in_tensor[..., (0, 1)])
        p1 = grid_sample_2d(plane_coef[1], in_tensor[..., (0, 2)])
        p2 = grid_sample_2d(plane_coef[2], in_tensor[..., (1, 2)])
        l0 = grid_sample_1d(line_coef[0], in_tensor[..., 2])
        l1 = grid_sample_1d(line_coef[1], in_tensor[..., 1])
        l2 = grid_sample_1d(line_coef[2], in_tensor[..., 0])
        return jnp.concatenate([p0 * l0, p1 * l1, p2 * l2], axis=-1)


class TriplaneEncoding(Encoding):
    """Triplane: three axis-aligned feature planes, sum or product reduce
    (reference encodings.py:643-721)."""

    resolution: int = 32
    num_components: int = 64
    init_scale: float = 0.1
    reduce: Literal["sum", "product"] = "sum"

    def get_out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        plane_coef = self.param(
            "plane_coef",
            lambda key: self.init_scale
            * jax.random.normal(
                key, (3, self.num_components, self.resolution, self.resolution)
            ),
        )
        p0 = grid_sample_2d(plane_coef[0], in_tensor[..., (0, 1)])
        p1 = grid_sample_2d(plane_coef[1], in_tensor[..., (0, 2)])
        p2 = grid_sample_2d(plane_coef[2], in_tensor[..., (1, 2)])
        if self.reduce == "sum":
            return p0 + p1 + p2
        return p0 * p1 * p2


class KPlanesEncoding(Encoding):
    """K-Planes: all axis-pair planes of a 3D/4D volume (reference :724-749).

    For in_dim=4 (space-time) the time-containing planes are initialized to
    one (identity for the product reduction), matching the reference."""

    resolution: Sequence[int] = (128, 128, 128)
    num_components: int = 64
    init_a: float = 0.1
    init_b: float = 0.5
    reduce: Literal["sum", "product"] = "product"

    def get_out_dim(self) -> int:
        return self.num_components

    @nn.compact
    def __call__(self, in_tensor: jnp.ndarray) -> jnp.ndarray:
        import itertools

        in_dim = len(self.resolution)
        coord_combs = list(itertools.combinations(range(in_dim), 2))
        has_time = in_dim == 4

        outs = None
        for ci, (i, j) in enumerate(coord_combs):
            res_i, res_j = self.resolution[i], self.resolution[j]

            def init(key, ci=ci, res_i=res_i, res_j=res_j, i=i, j=j):
                if has_time and 3 in (i, j):
                    return jnp.ones((self.num_components, res_j, res_i))
                return jax.random.uniform(
                    key,
                    (self.num_components, res_j, res_i),
                    minval=self.init_a,
                    maxval=self.init_b,
                )

            plane = self.param(f"plane_{i}{j}", init)
            feat = grid_sample_2d(plane, in_tensor[..., (i, j)])
            if outs is None:
                outs = feat
            elif self.reduce == "product":
                outs = outs * feat
            else:
                outs = outs + feat
        return outs
