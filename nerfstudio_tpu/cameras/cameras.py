"""Vectorized camera container + ray generation.

TPU-native re-design of reference nerfstudio/cameras/cameras.py (1,054 LoC).
Same semantics: 9 camera types, OpenGL-convention c2w (x right, y up, z back),
image coords are (row+0.5, col+0.5), distortion via fixed-iteration Newton
undistort, pixel_area from finite-difference of neighbouring ray directions.

TPU-first differences:
  * ``Cameras`` is a pytree (tensor_dataclass) — it jits/shards directly.
  * No boolean masked scatter per camera type (reference cameras.py:782-880):
    each *present* type's direction formula is computed vectorized and blended
    with ``jnp.where``. The set of present types is static aux data, so a
    single-type batch compiles exactly one formula — no wasted FLOPs, no
    dynamic control flow.
  * All shapes static; full-image generation uses concrete H/W host-side.
"""

from __future__ import annotations

import enum
import math
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from nerfstudio_tpu.cameras import camera_utils
from nerfstudio_tpu.core.rays import RayBundle
from nerfstudio_tpu.core.tensor_dataclass import (
    TensorDataclass,
    static_field,
    tensor_dataclass,
)
from nerfstudio_tpu.utils import poses as pose_utils


class CameraType(enum.Enum):
    """Supported camera projection models (reference cameras.py:41-52)."""

    PERSPECTIVE = 1
    FISHEYE = 2
    EQUIRECTANGULAR = 3
    OMNIDIRECTIONALSTEREO_L = 4
    OMNIDIRECTIONALSTEREO_R = 5
    VR180_L = 6
    VR180_R = 7
    ORTHOPHOTO = 8
    FISHEYE624 = 9


CAMERA_MODEL_TO_TYPE = {
    "SIMPLE_PINHOLE": CameraType.PERSPECTIVE,
    "PINHOLE": CameraType.PERSPECTIVE,
    "SIMPLE_RADIAL": CameraType.PERSPECTIVE,
    "RADIAL": CameraType.PERSPECTIVE,
    "OPENCV": CameraType.PERSPECTIVE,
    "OPENCV_FISHEYE": CameraType.FISHEYE,
    "EQUIRECTANGULAR": CameraType.EQUIRECTANGULAR,
    "OMNIDIRECTIONALSTEREO_L": CameraType.OMNIDIRECTIONALSTEREO_L,
    "OMNIDIRECTIONALSTEREO_R": CameraType.OMNIDIRECTIONALSTEREO_R,
    "VR180_L": CameraType.VR180_L,
    "VR180_R": CameraType.VR180_R,
    "ORTHOPHOTO": CameraType.ORTHOPHOTO,
    "FISHEYE624": CameraType.FISHEYE624,
}


def _as_f32(x, trailing_shape=(1,)):
    if x is None:
        return None
    if isinstance(x, (int, float)):
        return jnp.full(trailing_shape, float(x), dtype=jnp.float32)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    return x


@tensor_dataclass
class Cameras(TensorDataclass):
    """Batched cameras (reference cameras.py:55-320)."""

    camera_to_worlds: jnp.ndarray  # (..., 3, 4)
    fx: jnp.ndarray  # (..., 1)
    fy: jnp.ndarray  # (..., 1)
    cx: jnp.ndarray  # (..., 1)
    cy: jnp.ndarray  # (..., 1)
    width: jnp.ndarray  # (..., 1) int32
    height: jnp.ndarray  # (..., 1) int32
    distortion_params: Optional[jnp.ndarray] = None  # (..., 6) or (..., 12) fisheye624
    camera_type: Optional[jnp.ndarray] = None  # (..., 1) int32
    times: Optional[jnp.ndarray] = None  # (..., 1)
    metadata: Optional[Dict[str, jnp.ndarray]] = None
    # Static: which CameraType values appear — drives which formulas compile.
    types_present: Tuple[int, ...] = static_field(default=(CameraType.PERSPECTIVE.value,))

    _field_custom_dimensions = {"camera_to_worlds": 2, "distortion_params": 1}

    def __init__(
        self,
        camera_to_worlds,
        fx,
        fy,
        cx,
        cy,
        width=None,
        height=None,
        distortion_params=None,
        camera_type: Union[CameraType, int, np.ndarray, jnp.ndarray] = CameraType.PERSPECTIVE,
        times=None,
        metadata=None,
        types_present=None,
    ):
        camera_to_worlds = jnp.asarray(camera_to_worlds, dtype=jnp.float32)
        batch = camera_to_worlds.shape[:-2]
        fx = _as_f32(fx, batch + (1,))
        fy = _as_f32(fy, batch + (1,))
        cx = _as_f32(cx, batch + (1,))
        cy = _as_f32(cy, batch + (1,))
        def _unsq(v):
            # per-field: a (batch,) intrinsic needs its trailing 1 added, but
            # one already shaped (batch, 1) (e.g. from a scalar) must not be
            # unsqueezed again — mixing array fx with scalar cx previously
            # produced a phantom (N, N) camera batch
            return v[..., None] if v.ndim == len(batch) else v

        fx, fy, cx, cy = _unsq(fx), _unsq(fy), _unsq(cx), _unsq(cy)
        if width is None:
            width = (cx * 2).astype(jnp.int32)
        elif isinstance(width, (int, np.integer)):
            width = jnp.full(batch + (1,), int(width), dtype=jnp.int32)
        else:
            width = jnp.asarray(width).astype(jnp.int32)
            if width.ndim == len(batch):
                width = width[..., None]
        if height is None:
            height = (cy * 2).astype(jnp.int32)
        elif isinstance(height, (int, np.integer)):
            height = jnp.full(batch + (1,), int(height), dtype=jnp.int32)
        else:
            height = jnp.asarray(height).astype(jnp.int32)
            if height.ndim == len(batch):
                height = height[..., None]

        if isinstance(camera_type, CameraType):
            camera_type = camera_type.value
        if isinstance(camera_type, (int, np.integer)):
            inferred_types = (int(camera_type),)
            camera_type = jnp.full(batch + (1,), int(camera_type), dtype=jnp.int32)
        else:
            ct_np = np.asarray(camera_type)
            if ct_np.dtype == object or (ct_np.size and isinstance(ct_np.reshape(-1)[0], CameraType)):
                ct_np = np.vectorize(lambda c: c.value)(ct_np)
            try:
                inferred_types = tuple(sorted(set(int(v) for v in np.unique(np.asarray(ct_np)))))
            except Exception:  # traced values: caller must pass types_present
                inferred_types = (CameraType.PERSPECTIVE.value,)
            camera_type = jnp.asarray(ct_np).astype(jnp.int32)
            if camera_type.ndim == len(batch):
                camera_type = camera_type[..., None]
        if types_present is None:
            types_present = inferred_types

        if distortion_params is not None:
            distortion_params = jnp.asarray(distortion_params, dtype=jnp.float32)
        if times is not None:
            times = jnp.asarray(times, dtype=jnp.float32)
            if times.ndim == len(batch):
                times = times[..., None]

        object.__setattr__(self, "camera_to_worlds", camera_to_worlds)
        object.__setattr__(self, "fx", fx)
        object.__setattr__(self, "fy", fy)
        object.__setattr__(self, "cx", cx)
        object.__setattr__(self, "cy", cy)
        object.__setattr__(self, "width", width)
        object.__setattr__(self, "height", height)
        object.__setattr__(self, "distortion_params", distortion_params)
        object.__setattr__(self, "camera_type", camera_type)
        object.__setattr__(self, "times", times)
        object.__setattr__(self, "metadata", metadata)
        object.__setattr__(self, "types_present", tuple(types_present))
        self.__post_init__()

    # ------------------------------------------------------------------
    @property
    def device(self):
        return self.camera_to_worlds.devices()

    @property
    def is_jagged(self) -> bool:
        """True if cameras have differing resolutions (reference cameras.py:256)."""
        h = np.asarray(self.height)
        w = np.asarray(self.width)
        return bool((h != h.reshape(-1)[0]).any() or (w != w.reshape(-1)[0]).any())

    @property
    def image_height(self) -> jnp.ndarray:
        return self.height

    @property
    def image_width(self) -> jnp.ndarray:
        return self.width

    def get_image_coords(self, pixel_offset: float = 0.5, index=None) -> jnp.ndarray:
        """Dense (H, W, 2) grid of (row, col) + offset (reference cameras.py:288-309)."""
        if index is None:
            h = int(np.asarray(self.height).reshape(-1)[0])
            w = int(np.asarray(self.width).reshape(-1)[0])
        else:
            h = int(np.asarray(self.height[index]).reshape(-1)[0])
            w = int(np.asarray(self.width[index]).reshape(-1)[0])
        rows = jnp.arange(h, dtype=jnp.float32)
        cols = jnp.arange(w, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(rows, cols, indexing="ij"), axis=-1)
        return grid + pixel_offset

    def get_intrinsics_matrices(self) -> jnp.ndarray:
        """(..., 3, 3) K matrices (reference cameras.py:973-985)."""
        K = jnp.zeros(self.shape + (3, 3), dtype=jnp.float32)
        K = K.at[..., 0, 0].set(self.fx[..., 0])
        K = K.at[..., 1, 1].set(self.fy[..., 0])
        K = K.at[..., 0, 2].set(self.cx[..., 0])
        K = K.at[..., 1, 2].set(self.cy[..., 0])
        K = K.at[..., 2, 2].set(1.0)
        return K

    def rescale_output_resolution(self, scaling_factor, scale_rounding_mode: str = "floor") -> "Cameras":
        """Scale intrinsics (reference cameras.py:987-1034). Returns new Cameras."""
        sf = scaling_factor

        def _round(x):
            if scale_rounding_mode == "floor":
                return jnp.floor(x)
            if scale_rounding_mode == "round":
                return jnp.round(x)
            if scale_rounding_mode == "ceil":
                return jnp.ceil(x)
            raise ValueError(scale_rounding_mode)

        return self.replace(
            fx=self.fx * sf,
            fy=self.fy * sf,
            cx=self.cx * sf,
            cy=self.cy * sf,
            width=_round(self.width * sf).astype(jnp.int32),
            height=_round(self.height * sf).astype(jnp.int32),
        )

    # ------------------------------------------------------------------
    def generate_rays(
        self,
        camera_indices: Union[int, jnp.ndarray],
        coords: Optional[jnp.ndarray] = None,
        camera_opt_to_camera: Optional[jnp.ndarray] = None,
        distortion_params_delta: Optional[jnp.ndarray] = None,
        keep_shape: Optional[bool] = None,
        disable_distortion: bool = False,
        aabb_box=None,
        obb_box=None,
    ) -> RayBundle:
        """Generate rays (reference cameras.py:321-473).

        camera_indices: int or (..., num_batch_dims) int array indexing the
        flattened-or-batched cameras. coords: (..., 2) image coords (row, col);
        None renders the full image of the indexed camera.
        """
        cameras = self
        if isinstance(camera_indices, (int, np.integer)):
            camera_indices = jnp.full((1,), int(camera_indices), dtype=jnp.int32)
            if cameras.ndim > 1:
                raise ValueError("int camera_indices requires <=1 batch dim")
            single = True
        else:
            camera_indices = jnp.asarray(camera_indices).astype(jnp.int32)
            single = False

        if cameras.ndim == 0:
            cameras = cameras.reshape((1,))

        if camera_indices.ndim == 0 or (single and coords is None):
            # full-image path for a single camera
            idx = int(np.asarray(camera_indices).reshape(-1)[0]) if not isinstance(camera_indices, int) else camera_indices
            if coords is None:
                coords = cameras.get_image_coords(index=(idx,))  # (H, W, 2)
            num_rays_shape = coords.shape[:-1]
            camera_indices = jnp.full(num_rays_shape + (1,), idx, dtype=jnp.int32)
        else:
            if camera_indices.ndim == 1 and cameras.ndim == 1 and camera_indices.shape[-1] != 1:
                camera_indices = camera_indices[..., None]
            if coords is None:
                idx = int(np.asarray(camera_indices).reshape(-1)[0])
                coords = cameras.get_image_coords(index=(idx,))
                h, w = coords.shape[:2]
                camera_indices = jnp.broadcast_to(
                    camera_indices.reshape((1,) * 2 + camera_indices.shape), (h, w) + camera_indices.shape
                ).reshape((h, w, camera_indices.shape[-1]))
            num_rays_shape = coords.shape[:-1]

        raybundle = cameras._generate_rays_from_coords(
            camera_indices, coords, camera_opt_to_camera, distortion_params_delta, disable_distortion
        )

        if aabb_box is not None:
            from nerfstudio_tpu.utils.math import intersect_aabb

            aabb = aabb_box.aabb.reshape(-1) if hasattr(aabb_box, "aabb") else jnp.asarray(aabb_box).reshape(-1)
            nears, fars = intersect_aabb(raybundle.origins, raybundle.directions, aabb)
            raybundle = raybundle.replace(nears=nears[..., None], fars=fars[..., None])
        if obb_box is not None:
            from nerfstudio_tpu.utils.math import intersect_obb

            nears, fars = intersect_obb(
                raybundle.origins, raybundle.directions, obb_box.R, obb_box.T, obb_box.S
            )
            raybundle = raybundle.replace(nears=nears[..., None], fars=fars[..., None])
        return raybundle

    def _generate_rays_from_coords(
        self,
        camera_indices: jnp.ndarray,
        coords: jnp.ndarray,
        camera_opt_to_camera: Optional[jnp.ndarray] = None,
        distortion_params_delta: Optional[jnp.ndarray] = None,
        disable_distortion: bool = False,
    ) -> RayBundle:
        """Core vectorized ray generation (reference cameras.py:505-957)."""
        num_rays_shape = camera_indices.shape[:-1]
        if coords.shape != num_rays_shape + (2,):
            raise ValueError(
                f"coords shape {coords.shape} must be {num_rays_shape + (2,)} "
                f"(camera_indices batch shape + (2,))"
            )
        true_indices = tuple(camera_indices[..., i] for i in range(camera_indices.shape[-1]))

        y = coords[..., 0]
        x = coords[..., 1]
        fx = self.fx[true_indices][..., 0]
        fy = self.fy[true_indices][..., 0]
        cx = self.cx[true_indices][..., 0]
        cy = self.cy[true_indices][..., 0]
        cam_type = (
            self.camera_type[true_indices][..., 0]
            if self.camera_type is not None
            else jnp.full(num_rays_shape, CameraType.PERSPECTIVE.value, dtype=jnp.int32)
        )

        # coord + neighbour offsets for the pixel-area finite difference
        # (3, ..., 2): [base, +1 in x, +1 in y]
        coord_stack = jnp.stack(
            [
                jnp.stack([(x - cx) / fx, (y - cy) / fy], axis=-1),
                jnp.stack([(x - cx + 1) / fx, (y - cy) / fy], axis=-1),
                jnp.stack([(x - cx) / fx, (y - cy + 1) / fy], axis=-1),
            ],
            axis=0,
        )

        distortion_params = None
        if not disable_distortion:
            if self.distortion_params is not None:
                distortion_params = self.distortion_params[true_indices]
                if distortion_params_delta is not None:
                    distortion_params = distortion_params + distortion_params_delta
            elif distortion_params_delta is not None:
                distortion_params = distortion_params_delta

        if (
            distortion_params is not None
            and distortion_params.shape[-1] == 6
            and any(
                t not in (CameraType.EQUIRECTANGULAR.value, CameraType.FISHEYE624.value)
                for t in self.types_present
            )
        ):
            undistorted = camera_utils.radial_and_tangential_undistort(
                coord_stack, distortion_params[None]
            )
            skip = cam_type == CameraType.EQUIRECTANGULAR.value
            coord_stack = jnp.where(skip[None, ..., None], coord_stack, undistorted)

        # OpenCV -> OpenGL
        coord_stack = coord_stack.at[..., 1].multiply(-1.0)

        # Per-type direction formulas, blended via where over *present* types.
        directions_stack = jnp.zeros((3,) + num_rays_shape + (3,), dtype=jnp.float32)
        origins_override = None  # (..., 3) for ODS/VR180/orthophoto

        c2w = self.camera_to_worlds[true_indices]
        if camera_opt_to_camera is not None:
            c2w = pose_utils.multiply(c2w, camera_opt_to_camera)
        rotation = c2w[..., :3, :3]

        def blend(dirs, type_value):
            nonlocal directions_stack
            sel = (cam_type == type_value)[None, ..., None]
            directions_stack = jnp.where(sel, dirs, directions_stack)

        tp = set(self.types_present)
        if CameraType.PERSPECTIVE.value in tp:
            dirs = jnp.concatenate(
                [coord_stack, -jnp.ones(coord_stack.shape[:-1] + (1,), dtype=jnp.float32)], axis=-1
            )
            blend(dirs, CameraType.PERSPECTIVE.value)
        if CameraType.FISHEYE.value in tp:
            theta = jnp.sqrt(jnp.sum(coord_stack**2, axis=-1))
            theta = jnp.clip(theta, 0.0, math.pi)
            sinc = jnp.where(theta > 1e-8, jnp.sin(theta) / jnp.maximum(theta, 1e-8), 1.0)
            dirs = jnp.concatenate(
                [coord_stack * sinc[..., None], -jnp.cos(theta)[..., None]], axis=-1
            )
            blend(dirs, CameraType.FISHEYE.value)
        if tp & {
            CameraType.EQUIRECTANGULAR.value,
            CameraType.OMNIDIRECTIONALSTEREO_L.value,
            CameraType.OMNIDIRECTIONALSTEREO_R.value,
            CameraType.VR180_L.value,
            CameraType.VR180_R.value,
        }:
            theta = -math.pi * coord_stack[..., 0]
            phi = math.pi * (0.5 - coord_stack[..., 1])
            dirs = jnp.stack(
                [
                    -jnp.sin(theta) * jnp.sin(phi),
                    jnp.cos(phi),
                    -jnp.cos(theta) * jnp.sin(phi),
                ],
                axis=-1,
            )
            for tv in (
                CameraType.EQUIRECTANGULAR.value,
                CameraType.OMNIDIRECTIONALSTEREO_L.value,
                CameraType.OMNIDIRECTIONALSTEREO_R.value,
            ):
                if tv in tp:
                    blend(dirs, tv)
            if tp & {CameraType.VR180_L.value, CameraType.VR180_R.value}:
                theta180 = -math.pi * ((x - cx) / (fx * 2))
                dirs180 = jnp.stack(
                    [
                        -jnp.sin(theta180)[None] * jnp.sin(phi),
                        jnp.cos(phi),
                        -jnp.cos(theta180)[None] * jnp.sin(phi),
                    ],
                    axis=-1,
                )
                for tv in (CameraType.VR180_L.value, CameraType.VR180_R.value):
                    if tv in tp:
                        blend(dirs180, tv)
            # Stereo eye origin offsets on a circle (reference cameras.py:675-780)
            vr_ipd = 0.064
            eye_sign = jnp.where(
                (cam_type == CameraType.OMNIDIRECTIONALSTEREO_R.value)
                | (cam_type == CameraType.VR180_R.value),
                1.0,
                -1.0,
            )
            is_ods = (cam_type == CameraType.OMNIDIRECTIONALSTEREO_L.value) | (
                cam_type == CameraType.OMNIDIRECTIONALSTEREO_R.value
            )
            is_vr180 = (cam_type == CameraType.VR180_L.value) | (cam_type == CameraType.VR180_R.value)
            if tp & {
                CameraType.OMNIDIRECTIONALSTEREO_L.value,
                CameraType.OMNIDIRECTIONALSTEREO_R.value,
                CameraType.VR180_L.value,
                CameraType.VR180_R.value,
            }:
                ods_theta = -math.pi * ((x - cx) / fx)
                local_offset_ods = jnp.stack(
                    [jnp.cos(ods_theta), jnp.zeros_like(ods_theta), -jnp.sin(ods_theta)], axis=-1
                ) * (vr_ipd / 2.0)
                local_offset_vr180 = jnp.broadcast_to(
                    jnp.array([vr_ipd / 2.0, 0.0, 0.0], dtype=jnp.float32), num_rays_shape + (3,)
                )
                local_offset = jnp.where(is_ods[..., None], local_offset_ods, 0.0) + jnp.where(
                    is_vr180[..., None], local_offset_vr180, 0.0
                )
                local_offset = local_offset * eye_sign[..., None]
                world_offset = jnp.einsum("...ij,...j->...i", rotation, local_offset, precision="highest")
                origins_override = jnp.where(
                    (is_ods | is_vr180)[..., None], c2w[..., :3, 3] + world_offset, c2w[..., :3, 3]
                )
        if CameraType.ORTHOPHOTO.value in tp:
            dirs = jnp.broadcast_to(
                jnp.array([0.0, 0.0, -1.0], dtype=jnp.float32), (3,) + num_rays_shape + (3,)
            )
            blend(dirs, CameraType.ORTHOPHOTO.value)
            grids = coord_stack[0].at[..., 1].multiply(-1.0)
            grids3 = jnp.concatenate([grids, jnp.zeros_like(grids[..., :1])], axis=-1)
            ortho_origin = jnp.einsum("...ij,...j->...i", rotation, grids3, precision="highest") + c2w[..., :3, 3]
            is_ortho = cam_type == CameraType.ORTHOPHOTO.value
            base = origins_override if origins_override is not None else c2w[..., :3, 3]
            origins_override = jnp.where(is_ortho[..., None], ortho_origin, base)
        if CameraType.FISHEYE624.value in tp:
            assert distortion_params is not None and distortion_params.shape[-1] == 12
            pcoord_stack = jnp.stack(
                [
                    jnp.stack([x, y], axis=-1),
                    jnp.stack([x + 1, y], axis=-1),
                    jnp.stack([x, y + 1], axis=-1),
                ],
                axis=0,
            )
            cam_params = jnp.concatenate(
                [fx[..., None], fy[..., None], cx[..., None], cy[..., None], distortion_params],
                axis=-1,
            )
            flat = pcoord_stack.reshape(3, -1, 2)
            params_flat = jnp.broadcast_to(cam_params[None], (3,) + cam_params.shape).reshape(3, -1, 16)
            dirs = camera_utils.fisheye624_unproject(flat.reshape(-1, 2), params_flat.reshape(-1, 16))
            dirs = dirs.reshape((3,) + num_rays_shape + (3,))
            # fisheye624_unproject returns +z forward OpenCV rays; flip to OpenGL
            dirs = dirs * jnp.array([1.0, -1.0, -1.0], dtype=jnp.float32)
            blend(dirs, CameraType.FISHEYE624.value)

        # rotate into world: R @ d
        directions_stack = jnp.einsum("...ij,s...j->s...i", rotation, directions_stack, precision="highest")
        norms = jnp.linalg.norm(directions_stack, axis=-1, keepdims=True)
        directions_stack = directions_stack / jnp.maximum(norms, 1e-10)

        origins = origins_override if origins_override is not None else c2w[..., :3, 3]
        directions = directions_stack[0]
        dx = jnp.sqrt(jnp.sum((directions - directions_stack[1]) ** 2, axis=-1))
        dy = jnp.sqrt(jnp.sum((directions - directions_stack[2]) ** 2, axis=-1))
        pixel_area = (dx * dy)[..., None]

        times = self.times[true_indices] if self.times is not None else None
        metadata = (
            jax.tree_util.tree_map(lambda v: v[true_indices], self.metadata)
            if self.metadata is not None
            else {}
        )
        metadata = dict(metadata)
        metadata["directions_norm"] = jax.lax.stop_gradient(norms[0][..., 0:1])

        return RayBundle(
            origins=origins,
            directions=directions,
            pixel_area=pixel_area,
            camera_indices=camera_indices[..., -1:],
            times=times,
            metadata=metadata,
        )

    def to_json(self, camera_idx: int, image=None, max_size=None) -> Dict:
        """JSON description for viewer (reference cameras.py:959-971)."""
        flat = self.flatten()
        json_ = {
            "type": "PinholeCamera",
            "cx": float(np.asarray(flat.cx[camera_idx])[0]),
            "cy": float(np.asarray(flat.cy[camera_idx])[0]),
            "fx": float(np.asarray(flat.fx[camera_idx])[0]),
            "fy": float(np.asarray(flat.fy[camera_idx])[0]),
            "camera_to_world": np.asarray(flat.camera_to_worlds[camera_idx]).tolist(),
            "camera_index": camera_idx,
            "times": float(np.asarray(flat.times[camera_idx])[0]) if self.times is not None else None,
        }
        return json_
