"""Mesh export tests: native marching cubes vs analytic SDF, TSDF fusion of
synthetic depth, FFT-Poisson from an oriented sphere cloud, texture baking."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_marching_cubes_sphere():
    from nerfstudio_tpu.exporter.marching_cubes import marching_cubes

    res = 48
    lin = np.linspace(-1, 1, res)
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    vol = np.linalg.norm(g, axis=-1) - 0.5
    verts, faces = marching_cubes(vol, level=0.0)
    assert faces is not None and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(float(r.mean()) - 0.5) < 0.01
    assert float(np.abs(r - 0.5).max()) < 0.05
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    assert abs(area - np.pi) < 0.15  # sphere area 4*pi*r^2 = pi


def test_tsdf_fusion_sphere():
    """Fuse synthetic depth maps of a unit-radius/2 sphere from orbiting
    cameras; the zero crossing must sit at the sphere surface."""
    from nerfstudio_tpu.exporter.tsdf_utils import tsdf_fusion

    h = w = 48
    focal = 48.0
    views, Ks, depths = [], [], []
    for k in range(8):
        theta = 2 * np.pi * k / 8
        pos = 2.0 * np.array([np.cos(theta), np.sin(theta), 0.3])
        fwd = pos / np.linalg.norm(pos)
        up = np.array([0.0, 0, 1])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        c2w = np.stack([right, np.cross(fwd, right), fwd, pos], axis=1)
        ys, xs = np.mgrid[0:h, 0:w]
        d_cam = np.stack(
            [(xs + 0.5 - w / 2) / focal, -(ys + 0.5 - h / 2) / focal, -np.ones_like(xs, float)],
            axis=-1,
        )
        d_world = d_cam @ c2w[:3, :3].T
        norm = np.linalg.norm(d_world, axis=-1)
        d_world_n = d_world / norm[..., None]
        b = 2 * (d_world_n @ pos)
        c = float(pos @ pos) - 0.25
        disc = b * b - 4 * c
        t_hit = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
        # depth map convention: z-depth (along -z of camera) = t / norm_factor
        z = t_hit * (-d_cam[..., 2] / norm * norm)  # t in world units along ray
        # convert ray distance to z-depth: z = t * (unit ray dot -cam_z)
        cam_z = -c2w[:3, 2]
        zdepth = t_hit * (d_world_n @ cam_z)
        depths.append(np.where(disc > 0, zdepth, 0.0))
        views.append(c2w)
        Ks.append([focal, focal, w / 2, h / 2])

    tsdf, _ = tsdf_fusion(
        np.stack(views), np.asarray(Ks), np.stack(depths), None,
        ((-1, -1, -1), (1, 1, 1)), resolution=48,
    )
    lin = (np.arange(48) + 0.5) / 48 * 2 - 1
    g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    r = np.linalg.norm(g, axis=-1)
    observed = np.abs(tsdf) < 0.99
    # inside the sphere (and observed) must be negative, outside positive
    inside = observed & (r < 0.4)
    outside = observed & (r > 0.6) & (r < 0.9)
    assert (tsdf[inside] < 0).mean() > 0.9
    assert (tsdf[outside] > 0).mean() > 0.9


def test_poisson_sphere():
    from nerfstudio_tpu.exporter.poisson import export_poisson_mesh

    rng = np.random.default_rng(0)
    n = 20000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pts = v * 0.5
    verts, faces = export_poisson_mesh(pts, v, resolution=64)
    assert faces is not None and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    assert abs(float(np.median(r)) - 0.5) < 0.08, float(np.median(r))


def test_texture_bake(tmp_path):
    from nerfstudio_tpu.exporter.texture_utils import export_textured_mesh

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]])

    def query(points):
        return np.stack([points[:, 0], points[:, 1], np.zeros(len(points))], axis=-1)

    export_textured_mesh(verts, faces, query, tmp_path, name="m")
    assert (tmp_path / "m.obj").exists()
    assert (tmp_path / "m.mtl").exists()
    assert (tmp_path / "m.png").exists()
    obj = (tmp_path / "m.obj").read_text()
    assert obj.count("\nv ") == 4 and obj.count("\nf ") == 2
