"""Camera path generation for rendering (reference:
nerfstudio/cameras/camera_paths.py, 193 LoC)."""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras import camera_utils
from nerfstudio_tpu.cameras.cameras import Cameras, CameraType


def get_interpolated_camera_path(cameras: Cameras, steps: int, order_poses: bool = False) -> Cameras:
    """Interpolate between the given cameras (reference camera_paths.py:30-56)."""
    poses = np.asarray(cameras.camera_to_worlds)
    Ks = np.asarray(cameras.get_intrinsics_matrices())
    poses_i, Ks_i = camera_utils.get_interpolated_poses_many(
        poses, Ks, steps_per_transition=steps, order_poses=order_poses
    )
    return Cameras(
        camera_to_worlds=jnp.asarray(poses_i),
        fx=jnp.asarray(Ks_i[:, 0, 0]),
        fy=jnp.asarray(Ks_i[:, 1, 1]),
        cx=jnp.asarray(Ks_i[:, 0, 2]),
        cy=jnp.asarray(Ks_i[:, 1, 2]),
        width=int(np.asarray(cameras.width).reshape(-1)[0]),
        height=int(np.asarray(cameras.height).reshape(-1)[0]),
    )


def get_spiral_path(
    camera: Cameras,
    steps: int = 30,
    radius: Optional[float] = None,
    radiuses=None,
    rots: int = 2,
    zrate: float = 0.5,
) -> Cameras:
    """Spiral around the first camera's view axis (reference camera_paths.py:59-124)."""
    assert radius is not None or radiuses is not None
    if radiuses is None:
        rad = np.array([radius, radius, radius])
    else:
        rad = np.asarray(radiuses)
    c2w = np.asarray(camera.camera_to_worlds).reshape(-1, 3, 4)[0]
    up = c2w[:3, 1]
    focal = float(np.asarray(camera.fx).reshape(-1)[0])
    target = np.array([0.0, 0, -focal * 0.01])

    c2ws = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, steps + 1)[:-1]:
        center = np.array(
            [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate)]
        ) * rad
        center_world = c2w[:3, 3] + c2w[:3, :3] @ center
        lookat = c2w[:3, :3] @ (center - target)
        c2ws.append(camera_utils.viewmatrix(lookat, up, center_world))
    return Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws), dtype=jnp.float32),
        fx=camera.fx.reshape(-1)[0],
        fy=camera.fy.reshape(-1)[0],
        cx=camera.cx.reshape(-1)[0],
        cy=camera.cy.reshape(-1)[0],
        width=int(np.asarray(camera.width).reshape(-1)[0]),
        height=int(np.asarray(camera.height).reshape(-1)[0]),
    )


def get_path_from_json(camera_path: Dict) -> Cameras:
    """Viewer keyframe JSON -> Cameras (reference camera_paths.py:127-193)."""
    image_height = camera_path["render_height"]
    image_width = camera_path["render_width"]
    c2ws, fxs, fys = [], [], []
    times = [] if any("render_time" in c for c in camera_path["camera_path"]) else None
    for cam in camera_path["camera_path"]:
        c2w = np.array(cam["camera_to_world"], dtype=np.float32).reshape(4, 4)[:3]
        c2ws.append(c2w)
        fov = float(cam["fov"])
        focal = image_height / 2.0 / np.tan(np.deg2rad(fov) / 2.0)
        fxs.append(focal)
        fys.append(focal)
        if times is not None:
            times.append(cam.get("render_time", 0.0))
    camera_type = CameraType.PERSPECTIVE
    ct = camera_path.get("camera_type")
    if ct == "fisheye":
        camera_type = CameraType.FISHEYE
    elif ct == "equirectangular":
        camera_type = CameraType.EQUIRECTANGULAR
    elif ct == "omnidirectional":
        camera_type = CameraType.OMNIDIRECTIONALSTEREO_L
    return Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.asarray(fxs),
        fy=jnp.asarray(fys),
        cx=image_width / 2.0,
        cy=image_height / 2.0,
        width=image_width,
        height=image_height,
        camera_type=camera_type,
        times=jnp.asarray(times) if times is not None else None,
    )
