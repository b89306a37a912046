"""Camera ray-generation tests (mirrors reference tests/cameras/test_cameras.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nerfstudio_tpu.cameras.cameras import Cameras, CameraType
from nerfstudio_tpu.cameras.lie_groups import exp_map_SE3, exp_map_SO3xR3
from nerfstudio_tpu.utils.math import intersect_aabb


def _make_cameras(n=2, h=10, w=10, cam_type=CameraType.PERSPECTIVE, distortion=None):
    c2w = np.broadcast_to(np.eye(4)[:3], (n, 3, 4)).copy()
    c2w[:, 0, 3] = np.arange(n)  # distinct origins
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=10.0,
        fy=10.0,
        cx=w / 2,
        cy=h / 2,
        width=w,
        height=h,
        distortion_params=distortion,
        camera_type=cam_type,
    )


def test_full_image_rays():
    cams = _make_cameras()
    rb = cams.generate_rays(camera_indices=0)
    assert rb.origins.shape == (10, 10, 3)
    assert rb.directions.shape == (10, 10, 3)
    assert rb.pixel_area.shape == (10, 10, 1)
    # directions are unit
    assert jnp.allclose(jnp.linalg.norm(rb.directions, axis=-1), 1.0, atol=1e-5)
    # identity pose: ray through principal point looks along -z
    center = rb.directions[5, 5]
    assert center[2] < -0.9


def test_indexed_rays():
    cams = _make_cameras()
    idx = jnp.array([[0], [1], [1]], dtype=jnp.int32)
    coords = jnp.array([[5.5, 5.5], [0.5, 0.5], [9.5, 9.5]])
    rb = cams.generate_rays(camera_indices=idx, coords=coords)
    assert rb.origins.shape == (3, 3)
    assert jnp.allclose(rb.origins[0], jnp.array([0.0, 0, 0]))
    assert jnp.allclose(rb.origins[1], jnp.array([1.0, 0, 0]))
    assert rb.camera_indices.shape == (3, 1)


def test_camera_translation():
    cams = _make_cameras()
    rb0 = cams.generate_rays(camera_indices=0)
    rb1 = cams.generate_rays(camera_indices=1)
    # same directions, shifted origins
    assert jnp.allclose(rb0.directions, rb1.directions, atol=1e-6)
    assert jnp.allclose(rb1.origins - rb0.origins, jnp.array([1.0, 0, 0]), atol=1e-6)


def test_distortion_roundtrip():
    from nerfstudio_tpu.cameras.camera_utils import (
        _compute_residual_and_jacobian,
        get_distortion_params,
        radial_and_tangential_undistort,
    )

    params = jnp.asarray(get_distortion_params(k1=0.01, k2=0.001, p1=0.001, p2=0.002))
    # distort some undistorted coords, then undistort: should roundtrip
    x = jnp.linspace(-0.3, 0.3, 7)
    y = jnp.linspace(-0.2, 0.2, 7)
    xy = jnp.stack(jnp.meshgrid(x, y), axis=-1).reshape(-1, 2)
    fx, fy, *_ = _compute_residual_and_jacobian(
        xy[..., 0], xy[..., 1], jnp.zeros_like(xy[..., 0]), jnp.zeros_like(xy[..., 1]), params
    )
    distorted = jnp.stack([fx, fy], axis=-1)  # residual vs 0 = distorted coords
    undistorted = radial_and_tangential_undistort(distorted, params)
    assert jnp.allclose(undistorted, xy, atol=1e-4)


def test_equirectangular():
    cams = _make_cameras(cam_type=CameraType.EQUIRECTANGULAR, h=8, w=16)
    rb = cams.generate_rays(camera_indices=0)
    assert rb.origins.shape == (8, 16, 3)
    assert jnp.allclose(jnp.linalg.norm(rb.directions, axis=-1), 1.0, atol=1e-5)


def test_fisheye():
    cams = _make_cameras(cam_type=CameraType.FISHEYE)
    rb = cams.generate_rays(camera_indices=0)
    assert jnp.allclose(jnp.linalg.norm(rb.directions, axis=-1), 1.0, atol=1e-5)


def test_rescale():
    cams = _make_cameras()
    half = cams.rescale_output_resolution(0.5)
    assert float(half.fx[0, 0]) == 5.0
    assert int(half.width[0, 0]) == 5


def test_intrinsics_matrix():
    cams = _make_cameras()
    K = cams.get_intrinsics_matrices()
    assert K.shape == (2, 3, 3)
    assert float(K[0, 0, 0]) == 10.0
    assert float(K[0, 2, 2]) == 1.0


def test_lie_groups():
    # zero tangent -> identity
    t = jnp.zeros((5, 6))
    T = exp_map_SO3xR3(t)
    assert jnp.allclose(T[..., :3, :3], jnp.eye(3), atol=1e-6)
    T2 = exp_map_SE3(t)
    assert jnp.allclose(T2[..., :3, :3], jnp.eye(3), atol=1e-6)
    # rotation about z by pi/2
    tang = jnp.array([[0.0, 0, 0, 0, 0, jnp.pi / 2]])
    R = exp_map_SO3xR3(tang)[0, :3, :3]
    assert jnp.allclose(R @ jnp.array([1.0, 0, 0]), jnp.array([0.0, 1, 0]), atol=1e-5)
    # SE3 with translation along x and rotation: V matrix effect
    tang = jnp.array([[1.0, 0, 0, 0, 0, 0]])
    T3 = exp_map_SE3(tang)[0]
    assert jnp.allclose(T3[:, 3], jnp.array([1.0, 0, 0]), atol=1e-6)


def test_intersect_aabb():
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    origins = jnp.array([[0.0, 0, -5], [0.0, 0, 5], [5.0, 5, 5]])
    dirs = jnp.array([[0.0, 0, 1], [0.0, 0, 1], [0.0, 0, 1]])
    nears, fars = intersect_aabb(origins, dirs, aabb)
    assert jnp.allclose(nears[0], 4.0, atol=1e-5)
    assert jnp.allclose(fars[0], 6.0, atol=1e-5)
    assert nears[1] == 1e10  # behind
    assert nears[2] == 1e10  # miss


def test_jagged_resolutions():
    c2w = np.broadcast_to(np.eye(4)[:3], (2, 3, 4)).copy()
    cams = Cameras(
        camera_to_worlds=jnp.asarray(c2w),
        fx=jnp.array([10.0, 20.0]),
        fy=jnp.array([10.0, 20.0]),
        cx=jnp.array([5.0, 10.0]),
        cy=jnp.array([5.0, 10.0]),
        width=jnp.array([10, 20]),
        height=jnp.array([10, 20]),
    )
    assert cams.is_jagged
    rb = cams.generate_rays(camera_indices=1)
    assert rb.origins.shape == (20, 20, 3)


def test_quaternion_vs_scipy():
    """quaternion_from_matrix + slerp agree with scipy's Rotation/Slerp."""
    import numpy as np
    from scipy.spatial.transform import Rotation, Slerp

    from nerfstudio_tpu.cameras.camera_utils import (
        quaternion_from_matrix,
        quaternion_matrix,
        quaternion_slerp,
    )

    rng = np.random.default_rng(0)
    for _ in range(20):
        R0, R1 = Rotation.random(2, rng).as_matrix()
        q0 = quaternion_from_matrix(R0)
        q1 = quaternion_from_matrix(R1)
        assert np.abs(quaternion_matrix(q0)[:3, :3] - R0).max() < 1e-12
        t = float(rng.uniform())
        qs = quaternion_slerp(q0, q1, t)
        Rs = Slerp([0, 1], Rotation.from_matrix([R0, R1]))(t).as_matrix()
        Rq = quaternion_matrix(qs)[:3, :3]
        assert np.abs(Rq - Rs).max() < 1e-12
