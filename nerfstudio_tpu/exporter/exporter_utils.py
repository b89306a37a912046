"""Exporter helpers (reference: nerfstudio/exporter/exporter_utils.py).

Point-cloud generation by rendering rays from training views and lifting
depth; std-based outlier filtering; normal estimation from rendered normals
when available."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def generate_point_cloud(
    pipeline,
    state,
    num_points: int = 1000000,
    remove_outliers: bool = True,
    std_ratio: float = 10.0,
    rgb_output_name: str = "rgb",
    depth_output_name: str = "depth",
    max_cameras: int = 50,
    return_normals: bool = False,
):
    """-> (points (N,3), colors (N,3) float [0,1][, normals (N,3)])
    (reference exporter_utils.py:55-156). Normals are estimated from the
    depth map's image-space derivatives (cross product of 3D finite
    differences), oriented toward the camera."""
    cams = pipeline.datamanager.train_cameras
    n_cams = min(cams.shape[0], max_cameras)
    pts_list, rgb_list, nrm_list = [], [], []
    for i in range(n_cams):
        outputs = pipeline.render_camera(state.params, cams, i, aux=getattr(state, "aux", None))
        rb = cams.generate_rays(camera_indices=i)
        depth = np.asarray(outputs[depth_output_name])[..., 0]
        rgb = np.asarray(outputs[rgb_output_name])
        acc = np.asarray(outputs.get("accumulation", np.ones_like(depth)[..., None]))[..., 0]
        origins = np.asarray(rb.origins)
        dirs = np.asarray(rb.directions)
        pts = origins + dirs * depth[..., None]
        mask = acc > 0.5
        if return_normals:
            du = np.gradient(pts, axis=1)
            dv = np.gradient(pts, axis=0)
            nrm = np.cross(dv, du)
            nlen = np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
            nrm = nrm / nlen
            # orient toward the camera
            flip = np.sum(nrm * dirs, axis=-1, keepdims=True) > 0
            nrm = np.where(flip, -nrm, nrm)
            nrm_list.append(nrm[mask])
        pts_list.append(pts[mask])
        rgb_list.append(rgb[mask])
    points = np.concatenate(pts_list, axis=0)
    colors = np.concatenate(rgb_list, axis=0)
    normals = np.concatenate(nrm_list, axis=0) if return_normals else None
    if len(points) > num_points:
        sel = np.random.default_rng(0).choice(len(points), num_points, replace=False)
        points, colors = points[sel], colors[sel]
        normals = normals[sel] if normals is not None else None
    if remove_outliers and len(points) > 10:
        center = points.mean(axis=0)
        d = np.linalg.norm(points - center, axis=-1)
        keep = d < d.mean() + std_ratio * d.std()
        points, colors = points[keep], colors[keep]
        normals = normals[keep] if normals is not None else None
    if return_normals:
        return points, colors, normals
    return points, colors
