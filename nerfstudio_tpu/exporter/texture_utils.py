"""Texture baking (reference: nerfstudio/exporter/texture_utils.py, 493 LoC
— xatlas UV unwrap + torch rasterize-and-query).

xatlas is unavailable here; this uses per-triangle square charts packed on a
regular atlas grid (the classic "polygon soup" parameterization the reference
falls back to conceptually for unwrap-hostile meshes). Each triangle gets the
lower-left half of its own texel block; colors are baked by querying the
radiance field (or vertex colors) at interpolated surface points. Exports
OBJ + MTL + PNG."""

from __future__ import annotations

import struct
import zlib
from pathlib import Path
from typing import Callable, Optional, Tuple

import numpy as np


def _write_png(path: Path, img_u8: np.ndarray) -> None:
    h, w, c = img_u8.shape
    color_type = 2 if c == 3 else 6
    raw = b"".join(b"\x00" + img_u8[i].tobytes() for i in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    path.write_bytes(
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
    )


def bake_texture(
    vertices: np.ndarray,  # (V, 3)
    faces: np.ndarray,  # (F, 3) int
    query_rgb: Callable[[np.ndarray], np.ndarray],  # (N,3) points -> (N,3) rgb [0,1]
    texels_per_tri: int = 8,
    atlas_max: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (texture (A, A, 3) uint8, uvs (F, 3, 2) in [0,1])."""
    f = len(faces)
    block = texels_per_tri
    per_row = max(1, int(np.ceil(np.sqrt(f))))
    atlas = min(atlas_max, per_row * block)
    per_row = atlas // block
    rows = int(np.ceil(f / per_row))
    atlas_h = rows * block
    atlas_w = per_row * block

    tex = np.zeros((atlas_h, atlas_w, 3), np.float32)
    uvs = np.zeros((f, 3, 2), np.float32)

    # barycentric lattice for one block's lower-left triangle
    jj, ii = np.meshgrid(np.arange(block), np.arange(block), indexing="ij")
    a = (ii + 0.5) / block
    b = (jj + 0.5) / block
    # fold upper half back into the triangle (clamp to bary domain)
    s = a + b
    a_t = np.where(s > 1, 1 - b, a)
    b_t = np.where(s > 1, 1 - a, b)
    w0 = 1 - a_t - b_t

    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]

    # bake in chunks of triangles to bound the query size
    chunkf = max(1, 2_000_000 // (block * block))
    for start in range(0, f, chunkf):
        end = min(f, start + chunkf)
        idx = np.arange(start, end)
        pts = (
            w0[None, ..., None] * v0[idx, None, None]
            + a_t[None, ..., None] * v1[idx, None, None]
            + b_t[None, ..., None] * v2[idx, None, None]
        )  # (C, block, block, 3)
        rgb = np.asarray(query_rgb(pts.reshape(-1, 3))).reshape(len(idx), block, block, 3)
        for k, fi in enumerate(idx):
            r, c = divmod(fi, per_row)
            tex[r * block : (r + 1) * block, c * block : (c + 1) * block] = rgb[k]
            u0 = (c * block + 0.5) / atlas_w
            v0_ = (r * block + 0.5) / atlas_h
            du = (block - 1.0) / atlas_w
            dv = (block - 1.0) / atlas_h
            # uv corners matching barycentric (w0->(0,0), a->(1,0), b->(0,1))
            uvs[fi, 0] = [u0, v0_]
            uvs[fi, 1] = [u0 + du, v0_]
            uvs[fi, 2] = [u0, v0_ + dv]

    tex_u8 = np.clip(tex * 255, 0, 255).astype(np.uint8)
    # OBJ v coordinate is bottom-up
    uvs[..., 1] = 1.0 - uvs[..., 1]
    return tex_u8, uvs


def export_textured_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    query_rgb: Callable[[np.ndarray], np.ndarray],
    output_dir: Path,
    name: str = "mesh",
    texels_per_tri: int = 8,
) -> None:
    """Write OBJ + MTL + texture PNG (reference texture_utils.export_textured_mesh)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    tex, uvs = bake_texture(vertices, faces, query_rgb, texels_per_tri)
    _write_png(output_dir / f"{name}.png", tex)

    with open(output_dir / f"{name}.mtl", "w") as f:
        f.write(f"newmtl baked\nKa 1 1 1\nKd 1 1 1\nmap_Kd {name}.png\n")

    lines = [f"mtllib {name}.mtl", "usemtl baked"]
    for v in vertices:
        lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for fi in range(len(faces)):
        for k in range(3):
            u, vv = uvs[fi, k]
            lines.append(f"vt {u:.6f} {vv:.6f}")
    for fi, face in enumerate(faces):
        t = 3 * fi
        lines.append(
            f"f {face[0]+1}/{t+1} {face[1]+1}/{t+2} {face[2]+1}/{t+3}"
        )
    (output_dir / f"{name}.obj").write_text("\n".join(lines))
