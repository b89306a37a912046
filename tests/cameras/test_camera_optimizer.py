"""CameraOptimizer unit tests (reference camera_optimizers.py:87-208) —
including the zero-mean gauge fix (a coherent drift of every camera is
invisible to the photometric loss but misaligns the world from the
un-optimized eval cameras; centering the tangent table pins that gauge)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras.camera_optimizers import CameraOptimizer
from nerfstudio_tpu.core.rays import RayBundle


def _bundle(n_cams=4, n_rays=16):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32)),
        directions=jnp.asarray(d),
        pixel_area=jnp.ones((n_rays, 1), jnp.float32),
        camera_indices=jnp.asarray(rng.integers(0, n_cams, size=(n_rays, 1))),
    )


def test_zero_adjustment_is_identity():
    opt = CameraOptimizer(num_cameras=4, mode="SO3xR3", zero_mean_gauge=True)
    rb = _bundle()
    params = opt.init(jax.random.PRNGKey(0), rb.camera_indices[..., 0])
    out = opt.apply(params, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(out.origins), np.asarray(rb.origins), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.directions), np.asarray(rb.directions), atol=1e-6
    )


def test_zero_mean_gauge_absorbs_global_drift():
    """A UNIFORM tangent shift across all cameras must be a no-op under the
    zero-mean gauge (it is pure gauge), while per-camera differences are
    preserved exactly."""
    n_cams = 5
    rng = np.random.default_rng(1)
    per_cam = rng.normal(scale=0.05, size=(n_cams, 6)).astype(np.float32)
    global_drift = np.array([0.3, -0.2, 0.1, 0.05, -0.04, 0.02], np.float32)

    rb = _bundle(n_cams=n_cams)
    opt = CameraOptimizer(num_cameras=n_cams, mode="SO3xR3", zero_mean_gauge=True)

    centered = per_cam - per_cam.mean(0, keepdims=True)
    p1 = {"params": {"pose_adjustment": jnp.asarray(centered)}}
    p2 = {"params": {"pose_adjustment": jnp.asarray(centered + global_drift)}}
    o1 = opt.apply(p1, rb, method=CameraOptimizer.apply_to_raybundle)
    o2 = opt.apply(p2, rb, method=CameraOptimizer.apply_to_raybundle)
    np.testing.assert_allclose(np.asarray(o1.origins), np.asarray(o2.origins), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o1.directions), np.asarray(o2.directions), atol=1e-5
    )

    # and per-camera corrections still act (not the identity)
    assert np.abs(np.asarray(o1.origins) - np.asarray(rb.origins)).max() > 1e-3


def test_without_gauge_fix_global_drift_moves_rays():
    n_cams = 5
    global_drift = np.tile(
        np.array([0.3, -0.2, 0.1, 0.05, -0.04, 0.02], np.float32), (n_cams, 1)
    )
    rb = _bundle(n_cams=n_cams)
    opt = CameraOptimizer(num_cameras=n_cams, mode="SO3xR3", zero_mean_gauge=False)
    p = {"params": {"pose_adjustment": jnp.asarray(global_drift)}}
    out = opt.apply(p, rb, method=CameraOptimizer.apply_to_raybundle)
    assert np.abs(np.asarray(out.origins) - np.asarray(rb.origins)).max() > 0.1
