"""Ray samplers (reference: nerfstudio/model_components/ray_samplers.py, 786 LoC).

TPU-native re-design: samplers are *pure functions* of (RayBundle, PRNG key)
returning static-shape RaySamples — no nn.Module state, no jagged tensors.
Stochasticity is explicit via jax PRNG keys (None = deterministic midpoints,
the eval path). The PDF sampler's inverse-CDF transform is a vectorized
``searchsorted`` + gather, which XLA lowers to fast sorted lookups.

The nerfacc-driven ``VolumetricSampler`` (packed jagged samples, reference
:385-519) is replaced by the fixed-width occupancy-grid march in
``nerfstudio_tpu/ops/occupancy_march.py`` (TPU cannot do dynamic-length
packed tensors; we march a static max number of samples with masks).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from nerfstudio_tpu.core.rays import RayBundle, RaySamples


# ---------------------------------------------------------------------------
# Spaced samplers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SpacedSampler:
    """Stratified sampling under a spacing warp (reference ray_samplers.py:53-150).

    spacing_fn maps euclidean t -> warped s; spacing_fn_inv inverts it.
    """

    num_samples: int
    spacing_fn: Callable[[jnp.ndarray], jnp.ndarray]
    spacing_fn_inv: Callable[[jnp.ndarray], jnp.ndarray]
    train_stratified: bool = True
    single_jitter: bool = False

    def __call__(
        self,
        ray_bundle: RayBundle,
        key: Optional[jax.Array] = None,
        num_samples: Optional[int] = None,
    ) -> RaySamples:
        n = num_samples or self.num_samples
        num_rays = ray_bundle.shape
        bins = jnp.linspace(0.0, 1.0, n + 1)  # (n+1,)
        bins = jnp.broadcast_to(bins, num_rays + (n + 1,))

        if self.train_stratified and key is not None:
            if self.single_jitter:
                t_rand = jax.random.uniform(key, num_rays + (1,))
            else:
                t_rand = jax.random.uniform(key, num_rays + (n + 1,))
            bin_centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
            bin_upper = jnp.concatenate([bin_centers, bins[..., -1:]], axis=-1)
            bin_lower = jnp.concatenate([bins[..., :1], bin_centers], axis=-1)
            bins = bin_lower + (bin_upper - bin_lower) * t_rand

        s_near = self.spacing_fn(ray_bundle.nears)  # (..., 1)
        s_far = self.spacing_fn(ray_bundle.fars)

        def spacing_to_euclidean(s):
            return self.spacing_fn_inv(s * s_far[..., 0:1] + (1 - s) * s_near[..., 0:1])

        euclidean_bins = spacing_to_euclidean(bins)
        return ray_bundle.get_ray_samples(
            bin_starts=euclidean_bins[..., :-1, None],
            bin_ends=euclidean_bins[..., 1:, None],
            spacing_starts=bins[..., :-1, None],
            spacing_ends=bins[..., 1:, None],
            spacing_to_euclidean_fn=spacing_to_euclidean,
        )


def UniformSampler(num_samples: int, train_stratified=True, single_jitter=False) -> SpacedSampler:
    """(reference ray_samplers.py:153-172)"""
    return SpacedSampler(num_samples, lambda x: x, lambda x: x, train_stratified, single_jitter)


def LinearDisparitySampler(num_samples: int, train_stratified=True, single_jitter=False) -> SpacedSampler:
    """Linear in disparity (reference :175-194)"""
    return SpacedSampler(num_samples, lambda x: 1.0 / x, lambda x: 1.0 / x, train_stratified, single_jitter)


def SqrtSampler(num_samples: int, train_stratified=True, single_jitter=False) -> SpacedSampler:
    """(reference :197-215)"""
    return SpacedSampler(num_samples, jnp.sqrt, lambda x: x**2, train_stratified, single_jitter)


def LogSampler(num_samples: int, train_stratified=True, single_jitter=False) -> SpacedSampler:
    """(reference :218-236)"""
    return SpacedSampler(num_samples, jnp.log, jnp.exp, train_stratified, single_jitter)


def UniformLinDispPiecewiseSampler(num_samples: int, train_stratified=True, single_jitter=False) -> SpacedSampler:
    """Half uniform up to distance 1, half linear-in-disparity beyond
    (reference :239-260)."""
    return SpacedSampler(
        num_samples,
        lambda x: jnp.where(x < 1, x / 2, 1 - 1 / (2 * x)),
        lambda x: jnp.where(x < 0.5, 2 * x, 1 / (2 - 2 * x)),
        train_stratified,
        single_jitter,
    )


# ---------------------------------------------------------------------------
# PDF sampler
# ---------------------------------------------------------------------------


def searchsorted_batched(xp: jnp.ndarray, x: jnp.ndarray, side: str = "left") -> jnp.ndarray:
    """Batched searchsorted on the last axis via a fused comparison-count.

    TPU note: vmapped jnp.searchsorted lowers to a serial binary-search loop
    (~63 ms for a nerfacto batch); the O(M*N) comparison-count fuses into one
    VPU reduce and runs in <1 ms for the bin counts used here (N<=~512).
    """
    if side == "left":
        cmp = xp[..., None, :] < x[..., :, None]
    else:
        cmp = xp[..., None, :] <= x[..., :, None]
    return jnp.sum(cmp.astype(jnp.int32), axis=-1)


def _sorted_interp(x: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear interp of (xp, fp) at x, batched over leading dims.

    x: (..., M); xp: (..., N); fp: (..., N). Vectorized searchsorted+gather —
    replaces torch.searchsorted (reference ray_samplers.py:330-352).
    """
    idx = searchsorted_batched(xp, x, side="left")
    below = jnp.clip(idx - 1, 0, xp.shape[-1] - 1)
    above = jnp.clip(idx, 0, xp.shape[-1] - 1)
    from nerfstudio_tpu.ops.select import take_last_axis

    # one-hot select: minor-axis take_along_axis serializes on TPU
    xp0 = take_last_axis(xp, below)
    xp1 = take_last_axis(xp, above)
    fp0 = take_last_axis(fp, below)
    fp1 = take_last_axis(fp, above)
    denom = xp1 - xp0
    t = jnp.where(denom > 1e-10, (x - xp0) / jnp.where(denom > 1e-10, denom, 1.0), 0.0)
    return fp0 + t * (fp1 - fp0)


@dataclasses.dataclass(frozen=True)
class PDFSampler:
    """Inverse-CDF importance sampling from previous weights
    (reference ray_samplers.py:251-372)."""

    num_samples: int
    train_stratified: bool = True
    single_jitter: bool = False
    include_original: bool = False
    histogram_padding: float = 0.01

    def __call__(
        self,
        ray_bundle: RayBundle,
        ray_samples: RaySamples,
        weights: jnp.ndarray,
        key: Optional[jax.Array] = None,
        num_samples: Optional[int] = None,
    ) -> RaySamples:
        n = num_samples or self.num_samples
        num_bins = n + 1
        w = weights[..., 0] + self.histogram_padding  # (..., S)

        # degenerate-histogram guard (reference :306-310)
        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        padding = jnp.maximum(0.0, 1e-5 - w_sum)
        w = w + padding / w.shape[-1]
        w_sum = w_sum + padding

        pdf = w / w_sum
        cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
        cdf = jnp.concatenate(
            [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], axis=-1
        )  # (..., S+1)

        if self.train_stratified and key is not None:
            if self.single_jitter:
                rand = jax.random.uniform(key, cdf.shape[:-1] + (1,)) / num_bins
            else:
                rand = jax.random.uniform(key, cdf.shape[:-1] + (num_bins,)) / num_bins
            u = jnp.linspace(0.0, 1.0 - (1.0 / num_bins), num_bins)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_bins,)) + rand
        else:
            u = jnp.linspace(0.0, 1.0 - (1.0 / num_bins), num_bins) + 1.0 / (2 * num_bins)
            u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_bins,))

        assert ray_samples.spacing_starts is not None and ray_samples.spacing_ends is not None
        assert ray_samples.spacing_to_euclidean_fn is not None
        existing_bins = jnp.concatenate(
            [ray_samples.spacing_starts[..., 0], ray_samples.spacing_ends[..., -1:, 0]], axis=-1
        )  # (..., S+1)

        bins = _sorted_interp(u, cdf, existing_bins)

        if self.include_original:
            bins = jnp.sort(jnp.concatenate([existing_bins, bins], axis=-1), axis=-1)

        bins = jax.lax.stop_gradient(bins)
        euclidean_bins = ray_samples.spacing_to_euclidean_fn(bins)
        return ray_bundle.get_ray_samples(
            bin_starts=euclidean_bins[..., :-1, None],
            bin_ends=euclidean_bins[..., 1:, None],
            spacing_starts=bins[..., :-1, None],
            spacing_ends=bins[..., 1:, None],
            spacing_to_euclidean_fn=ray_samples.spacing_to_euclidean_fn,
        )


# ---------------------------------------------------------------------------
# Proposal sampler (nerfacto)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ProposalNetworkSampler:
    """Hierarchical proposal sampling (reference ray_samplers.py:522-617).

    density_fns are closures over proposal-field params (the functional
    replacement for the reference's registered density_fns modules). The
    weight-anneal factor and the gradient gate are explicit arguments —
    step-dependent *data*, not hidden mutable state.
    """

    num_proposal_samples_per_ray: Tuple[int, ...] = (64,)
    num_nerf_samples_per_ray: int = 32
    num_proposal_network_iterations: int = 2
    single_jitter: bool = True
    initial_sampler: Optional[SpacedSampler] = None
    pdf_include_original: bool = False
    # TPU redesign: an occupancy-grid (or other net-free) weight source for
    # the FIRST round — replaces the expensive uniform-256-sample proposal-1
    # field eval with cheap grid probes (VERDICT r1 roadmap item (a)).
    # Signature: (probe RaySamples) -> (R, P, 1) weights. Gradients are
    # stopped; probes use `num_initial_probes` samples at the initial spacing.
    initial_weights_fn: Optional[Callable[[RaySamples], jnp.ndarray]] = None
    num_initial_probes: int = 192

    def __post_init__(self):
        if self.num_proposal_network_iterations < 1 and self.initial_weights_fn is None:
            raise ValueError(
                "num_proposal_network_iterations must be >= 1 unless a net-free "
                "initial_weights_fn (occupancy grid) drives the sampling"
            )

    def __call__(
        self,
        ray_bundle: RayBundle,
        density_fns: List[Callable[[jnp.ndarray], jnp.ndarray]],
        key: Optional[jax.Array] = None,
        anneal: float = 1.0,
        update_proposals: bool = True,
    ) -> Tuple[RaySamples, List[jnp.ndarray], List[RaySamples]]:
        assert len(density_fns) == self.num_proposal_network_iterations
        initial = self.initial_sampler or UniformLinDispPiecewiseSampler(
            self.num_proposal_samples_per_ray[0], single_jitter=self.single_jitter
        )
        pdf = PDFSampler(
            num_samples=self.num_nerf_samples_per_ray,
            include_original=self.pdf_include_original,
            single_jitter=self.single_jitter,
        )

        weights_list: List[jnp.ndarray] = []
        ray_samples_list: List[RaySamples] = []
        weights = None
        ray_samples: Optional[RaySamples] = None
        n_rounds = self.num_proposal_network_iterations + 1
        keys = (
            list(jax.random.split(key, n_rounds + 1))
            if key is not None
            else [None] * (n_rounds + 1)
        )
        if self.initial_weights_fn is not None:
            # round 0 from a net-free weight source (occupancy grid probes)
            ray_samples = initial(
                ray_bundle, key=keys[n_rounds], num_samples=self.num_initial_probes
            )
            weights = jax.lax.stop_gradient(self.initial_weights_fn(ray_samples))
        for i in range(n_rounds):
            is_prop = i < self.num_proposal_network_iterations
            num_samples = (
                self.num_proposal_samples_per_ray[i]
                if is_prop
                else self.num_nerf_samples_per_ray
            )
            if i == 0 and weights is None:
                ray_samples = initial(ray_bundle, key=keys[i], num_samples=num_samples)
            else:
                # weight annealing: w^anneal (reference :601)
                annealed = jnp.power(weights, anneal)
                ray_samples = pdf(
                    ray_bundle, ray_samples, annealed, key=keys[i], num_samples=num_samples
                )
            if is_prop:
                density = density_fns[i](ray_samples.frustums.get_positions())
                if isinstance(update_proposals, bool):
                    if not update_proposals:
                        # gate gradients through the proposal density between
                        # update steps (reference :604-609 no_grad trick)
                        density = jax.lax.stop_gradient(density)
                else:
                    # traced gate (scan-able): value is exactly `density`
                    # either way; gradient flows only where g == 1
                    g = update_proposals.astype(density.dtype)
                    density = g * density + (1.0 - g) * jax.lax.stop_gradient(density)
                weights = ray_samples.get_weights(density)
                weights_list.append(weights)
                ray_samples_list.append(ray_samples)
        assert ray_samples is not None
        return ray_samples, weights_list, ray_samples_list


# ---------------------------------------------------------------------------
# NeuS sampler (SDF iterative upsampling)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NeuSSampler:
    """Iterative SDF-guided upsampling (reference ray_samplers.py:620-786).

    Fixed number of upsample rounds; each round computes fixed-inv-s alphas
    from the SDF, importance-samples, and merges (sort) — all static shapes.
    """

    num_samples: int = 64
    num_samples_importance: int = 64
    num_samples_outside: int = 32
    num_upsample_steps: int = 4
    base_variance: float = 64.0
    single_jitter: bool = True

    def __call__(
        self,
        ray_bundle: RayBundle,
        sdf_fn: Callable[[RaySamples], jnp.ndarray],
        key: Optional[jax.Array] = None,
    ) -> RaySamples:
        uniform = UniformSampler(self.num_samples, single_jitter=self.single_jitter)
        k0, key = (None, None) if key is None else jax.random.split(key)
        ray_samples = uniform(ray_bundle, key=k0)
        total_iters = 0
        sorted_ray_samples = ray_samples

        n_per_step = self.num_samples_importance // self.num_upsample_steps
        for step_i in range(self.num_upsample_steps):
            sdf = sdf_fn(sorted_ray_samples)  # (..., S, 1)
            new_var = self.base_variance * 2**step_i
            alphas = self._alphas_from_sdf(sorted_ray_samples, sdf, new_var)
            weights, _ = RaySamples.get_weights_and_transmittance_from_alphas(alphas)
            kp, key = (None, None) if key is None else jax.random.split(key)
            pdf = PDFSampler(
                num_samples=n_per_step,
                include_original=True,
                single_jitter=self.single_jitter,
                histogram_padding=1e-5,
            )
            sorted_ray_samples = pdf(ray_bundle, sorted_ray_samples, weights, key=kp)
            total_iters += 1
        return sorted_ray_samples

    @staticmethod
    def _alphas_from_sdf(ray_samples: RaySamples, sdf: jnp.ndarray, inv_s: float) -> jnp.ndarray:
        """NeuS fixed-inv-s alpha (reference ray_samplers.py:703-751)."""
        deltas = ray_samples.deltas[..., 0]
        s = sdf[..., 0]
        # estimated signed distance at section midpoints
        prev_s = s[..., :-1]
        next_s = s[..., 1:]
        mid_s = (prev_s + next_s) * 0.5
        cos_val = (next_s - prev_s) / jnp.maximum(deltas[..., :-1], 1e-10)
        # clamp cos, monotone along ray (reference uses running min)
        cos_val = jnp.minimum(cos_val, jnp.zeros_like(cos_val))
        cos_val = jnp.clip(cos_val, -1e3, 0.0)
        d = deltas[..., :-1]
        prev_esti = mid_s - cos_val * d * 0.5
        next_esti = mid_s + cos_val * d * 0.5
        prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
        next_cdf = jax.nn.sigmoid(next_esti * inv_s)
        alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
        alpha = jnp.clip(alpha, 0.0, 1.0)
        alpha = jnp.concatenate([alpha, jnp.zeros_like(alpha[..., :1])], axis=-1)
        return alpha[..., None]
