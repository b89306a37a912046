"""Generate a ray-traced multiview dataset (Blender transforms format).

Stand-in for a real capture in the offline build environment: a procedural
scene (checkerboard ground plane + textured/shaded spheres, one point light
with hard shadows) rendered with a tiny numpy ray tracer. Multi-view
consistent real geometry — meaningful for convergence gates (PSNR/SSIM on
held-out views), unlike random-pixel fixtures.

Scene variants (--scene) for the convergence gate matrix (VERDICT r1 #1):
  basic     — checkerboard disc + 4 spheres inside a richly textured dome
              (radius 16): every ray terminates on content, like a capture —
              void backgrounds make background_color="last_sample" methods
              grow unsupervised fog (r3 gate debugging)
  blender   — the classic blender protocol: white background, RGBA with
              alpha, transforms_{train,val,test}.json — for the
              blender-format methods (vanilla-nerf/mipnerf/tensorf/...)
              whose near/far and white-blend assume it
  unbounded — center objects + a ring of distant boulders + a 25-unit
              ground + direction-dependent sky: content far outside the unit
              box, exercising SceneContraction (no round-1 quality run did)
  distorted — basic geometry rendered through OpenCV radial distortion
              (k1=-0.18, k2=0.04): exercises the undistortion/ray-gen path
  masked    — basic + a per-view transient floating sphere with a per-frame
              mask excluding it: exercises mask-based pixel sampling

Usage: python tools/make_synthetic_dataset.py OUT_DIR [--hw 256] [--scene basic]
"""

from __future__ import annotations

import argparse
import json
import struct
import zlib
from pathlib import Path

import numpy as np

BASIC_SPHERES = [
    # center, radius, base color, checker second color (None = solid)
    (np.array([0.0, 0.0, 0.35]), 0.35, np.array([0.85, 0.25, 0.2]), None),
    (np.array([0.55, 0.35, 0.18]), 0.18, np.array([0.2, 0.45, 0.85]), np.array([0.9, 0.9, 0.2])),
    (np.array([-0.5, 0.3, 0.22]), 0.22, np.array([0.2, 0.8, 0.35]), None),
    (np.array([0.1, -0.55, 0.15]), 0.15, np.array([0.9, 0.7, 0.15]), np.array([0.4, 0.1, 0.5])),
]
SPHERES = list(BASIC_SPHERES)
LIGHT = np.array([1.5, -1.0, 2.5])
GROUND_Z = 0.0
PLANE_R = 1.1  # ground disc radius
SKY = False  # direction-dependent sky at infinity (unbounded scene)
DOME_R = None  # finite textured dome radius (basic family)
ALPHA = False  # write RGBA with hit alpha (blender protocol only)
DISTORTION = None  # (k1, k2) OpenCV radial distortion of the rendered images


def set_scene(name: str) -> None:
    global SPHERES, PLANE_R, SKY, DOME_R, ALPHA, DISTORTION
    SPHERES = list(BASIC_SPHERES)
    # dome radius 8 (was 16): keeps it far outside the object shell but 2x
    # deeper inside the contraction's resolvable band (normalized radius
    # 0.969 vs 0.984 — see _dome_color_at's design-constraint note)
    PLANE_R, SKY, DOME_R, ALPHA, DISTORTION = 1.1, False, 8.0, False, None
    if name == "unbounded":
        # ring of distant boulders (checker so distant texture is learnable)
        for k in range(8):
            th = 2 * np.pi * k / 8 + 0.3
            c = np.array([8.0 * np.cos(th), 8.0 * np.sin(th), 1.0])
            col = np.array([0.55 + 0.3 * np.cos(th), 0.45, 0.55 + 0.3 * np.sin(th)])
            SPHERES.append((c, 1.4, np.clip(col, 0.1, 0.9), np.array([0.9, 0.85, 0.75])))
        PLANE_R, SKY, DOME_R = 25.0, True, None
    elif name in ("blender", "dnerf"):
        DOME_R = None  # white void + alpha: the classic blender protocol
        ALPHA = True
    elif name == "distorted":
        DISTORTION = (-0.18, 0.04)
    elif name not in ("basic", "masked", "semantic", "appearance"):
        raise SystemExit(f"unknown scene {name!r}")


def set_scene_time(t: float) -> None:
    """dnerf scene: deterministic time-parameterised geometry. The red
    center sphere sweeps a half orbit and bobs with t in [0,1] (multi-view
    consistent at each t; same t => same geometry across splits).

    Half orbit (pi, was 2*pi): test times fall between train times, so the
    deformation MLP must interpolate in t; a full-circle sweep (~2.8 units
    of travel across a 1.5-unit scene) demanded temporal interpolation far
    beyond the D-NeRF data regime and the eval DIVERGED while train
    improved (r5: train 13.3 / eval 10.0 at 4000 steps, exp/dnerf_diag.py)."""
    c = np.array([
        0.45 * np.cos(np.pi * t),
        0.45 * np.sin(np.pi * t),
        0.35 + 0.2 * np.sin(np.pi * t),
    ])
    SPHERES[0] = (c, 0.3, np.array([0.85, 0.25, 0.2]), None)


def write_png(path: Path, img_u8: np.ndarray) -> None:
    """Minimal RGB(A) PNG writer (no PIL dependency needed)."""
    h, w, c = img_u8.shape
    color_type = 6 if c == 4 else 2
    raw = b"".join(b"\x00" + img_u8[i].tobytes() for i in range(h))

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    path.write_bytes(png)


def look_at(position: np.ndarray, target=np.zeros(3)) -> np.ndarray:
    fwd = position - target
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = np.cross(fwd, right)
    c2w[:3, 2] = fwd
    c2w[:3, 3] = position
    return c2w


def _sphere_hit(o, d, center, radius):
    oc = o - center
    b = np.sum(d * oc, axis=-1)
    c = np.sum(oc * oc, axis=-1) - radius**2
    disc = b * b - c
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    return np.where((disc > 0) & (t > 1e-4), t, np.inf)


def _shadowed(p):
    """Point-light hard shadow: does the segment p->LIGHT hit any sphere?"""
    d = LIGHT - p
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    d = d / dist
    sh = np.zeros(p.shape[:-1], bool)
    for center, radius, _, _ in SPHERES:
        t = _sphere_hit(p + 1e-4 * d, d, center, radius)
        sh |= t < dist[..., 0]
    return sh


def _dome_color_at(p: np.ndarray) -> np.ndarray:
    """Color of a point on the dome (position-keyed => multi-view consistent):
    a vertical gradient with a soft checker and a hue stripe.

    Texture DESIGN CONSTRAINT (r3 gate diagnosis, /tmp gate run
    `gate_nerfacto_diag.json` + dumped eval views): the dome fills ~half of
    every frame, and under SceneContraction ANY far surface lands in the
    outer shell of the hash cube where ray samples are disparity-spaced —
    a razor-sharp high-contrast checker there is unrepresentable by the
    whole contraction method family (the reference's CUDA nerfacto
    included; its real-capture gates never pose sharp in-focus
    high-frequency backgrounds at 16 units). So the dome is textured like a
    REAL capture background: low contrast, medium frequency — enough
    structure that SSIM's structure term is signal (a flat dome makes it
    noise/(noise+c2)), not an adversarial resolution test. A
    near-featureless dome and a checkerboard dome both gate the WRONG
    thing."""
    u = p / DOME_R
    z = np.clip(u[..., 2], -1.0, 1.0)
    zc = (z + 1.0) / 2.0
    az = np.arctan2(u[..., 1], u[..., 0])
    pol = np.arccos(z)
    base = (1 - zc[..., None]) * np.array([0.62, 0.55, 0.5]) + zc[..., None] * np.array(
        [0.4, 0.5, 0.75]
    )
    coarse = (np.floor(3 * az / np.pi) + np.floor(3 * pol / np.pi)) % 2
    stripe = 0.5 + 0.5 * np.sin(5.0 * az + 2.0 * pol)
    col = base * (0.82 + 0.18 * coarse[..., None])
    col[..., 0] = col[..., 0] * (0.85 + 0.15 * stripe)
    col[..., 2] = col[..., 2] * (0.9 + 0.1 * np.sin(2.0 * az)[...])
    return np.clip(col, 0.0, 1.0)


def _dome_color_dirs(o: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Dome color for rays (o, d) that missed everything (camera is inside)."""
    b = np.sum(o * d, axis=-1)
    c = np.sum(o * o, axis=-1) - DOME_R**2
    t = -b + np.sqrt(np.maximum(b * b - c, 0.0))
    p = o + d * t[..., None]
    return _dome_color_at(p)


def _undistort_coords(x, y, k1, k2, iters=12):
    """Invert OpenCV radial distortion: find (xu, yu) with
    xd = xu * (1 + k1 r^2 + k2 r^4) (Newton fixed point, reference
    camera_utils.radial_and_tangential_undistort)."""
    xu, yu = x.copy(), y.copy()
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        f = 1.0 + r2 * (k1 + k2 * r2)
        xu, yu = x / f, y / f
    return xu, yu


def render(c2w: np.ndarray, hw: int, focal: float, transient=None):
    """Ray-trace one view. ``transient`` = (center, radius, color) renders an
    extra non-scene sphere and returns its pixel mask (masked scene).
    Returns (img_u8 RGBA, occluder_mask bool | None)."""
    ys, xs = np.mgrid[0:hw, 0:hw]
    px = (xs + 0.5 - hw / 2) / focal
    py = (ys + 0.5 - hw / 2) / focal
    if DISTORTION is not None:
        # the written pixel grid IS the distorted image: trace the rays a
        # distorted camera would have captured at each pixel
        px, py = _undistort_coords(px, py, *DISTORTION)
    dirs_cam = np.stack([px, -py, -np.ones_like(px, float)], axis=-1)
    d = dirs_cam @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)

    t_best = np.full(d.shape[:-1], np.inf)
    color = np.zeros(d.shape)
    normal = np.zeros(d.shape)
    hit_kind = np.full(d.shape[:-1], -1)

    for si, (center, radius, col, col2) in enumerate(SPHERES):
        t = _sphere_hit(o, d, center, radius)
        closer = t < t_best
        t_best = np.where(closer, t, t_best)
        hit_kind = np.where(closer, si, hit_kind)

    # ground plane z=0 disc
    dz = d[..., 2]
    t_pl = np.where(np.abs(dz) > 1e-6, (GROUND_Z - o[..., 2]) / dz, np.inf)
    p_pl = o + d * t_pl[..., None]
    in_disc = (t_pl > 1e-4) & (np.linalg.norm(p_pl[..., :2], axis=-1) < PLANE_R)
    t_pl = np.where(in_disc, t_pl, np.inf)
    closer = t_pl < t_best
    t_best = np.where(closer, t_pl, t_best)
    hit_kind = np.where(closer, 99, hit_kind)

    hit = np.isfinite(t_best)
    p = o + d * np.where(hit, t_best, 0.0)[..., None]

    # shading
    for si, (center, radius, col, col2) in enumerate(SPHERES):
        m = hit_kind == si
        n = (p - center) / radius
        if col2 is not None:
            u = np.floor(4 * np.arctan2(n[..., 1], n[..., 0]) / np.pi)
            v = np.floor(6 * np.arccos(np.clip(n[..., 2], -1, 1)) / np.pi)
            checker = ((u + v) % 2).astype(bool)
            base = np.where(checker[..., None], col2, col)
        else:
            base = np.broadcast_to(col, p.shape)
        normal = np.where(m[..., None], n, normal)
        color = np.where(m[..., None], base, color)

    m = hit_kind == 99
    checker = ((np.floor(p[..., 0] * 4) + np.floor(p[..., 1] * 4)) % 2).astype(bool)
    plane_col = np.where(checker[..., None], np.array([0.85, 0.85, 0.85]), np.array([0.35, 0.35, 0.4]))
    color = np.where(m[..., None], plane_col, color)
    normal = np.where(m[..., None], np.array([0.0, 0.0, 1.0]), normal)

    ldir = LIGHT - p
    ldir /= np.maximum(np.linalg.norm(ldir, axis=-1, keepdims=True), 1e-8)
    lam = np.clip(np.sum(normal * ldir, axis=-1), 0, 1)
    shadow = _shadowed(p)
    shade = 0.25 + 0.75 * lam * (~shadow)
    rgb = np.clip(color * shade[..., None], 0, 1)
    if SKY:
        # direction-dependent sky (consistent at infinity -> contraction-able)
        z = np.clip(d[..., 2], 0.0, 1.0)[..., None]
        sky = (1 - z) * np.array([0.9, 0.75, 0.6]) + z * np.array([0.35, 0.55, 0.95])
        rgb = np.where(hit[..., None], rgb, sky)
        alpha = np.ones(hit.shape)
    elif DOME_R is not None:
        # finite textured dome: every ray terminates on real, multi-view-
        # consistent, SEEDABLE content (real-capture emulation; white voids
        # destabilize background_color="last_sample" methods and give splats
        # nothing to grow on)
        rgb = np.where(hit[..., None], rgb, _dome_color_dirs(o, d))
        alpha = np.ones(hit.shape)
    else:
        rgb = np.where(hit[..., None], rgb, 1.0)  # white background
        alpha = hit.astype(float)

    occ_mask = None
    if transient is not None:
        tc, tr, tcol = transient
        t_occ = _sphere_hit(o, d, tc, tr)
        occ = t_occ < t_best
        n_occ = (o + d * np.where(np.isfinite(t_occ), t_occ, 0.0)[..., None] - tc) / tr
        lam_o = np.clip(np.sum(n_occ * ldir, axis=-1), 0, 1)
        rgb = np.where(occ[..., None], np.clip(tcol * (0.3 + 0.7 * lam_o)[..., None], 0, 1), rgb)
        alpha = np.where(occ, 1.0, alpha)
        occ_mask = occ
    # RGB by default — a real capture has no alpha. (Alpha GT +
    # background_color="last_sample" leaves empty space unsupervised at train
    # yet black-blended at eval; the blender protocol scene keeps RGBA
    # because its methods white-blend through the parser.)
    if ALPHA:
        img = (np.concatenate([rgb, alpha[..., None]], axis=-1) * 255).astype(np.uint8)
    else:
        img = (rgb * 255).astype(np.uint8)
    # per-pixel semantic class map (multi-view consistent by construction):
    # 0 = background (dome/sky/void), 1 = ground plane, 2+si = sphere si
    sem = np.zeros(hit_kind.shape, np.uint8)
    sem[hit_kind == 99] = 1
    for si in range(len(SPHERES)):
        sem[hit_kind == si] = 2 + si
    return img, occ_mask, sem


def _surface_color(p, n):
    """Color of a surface point (matches render())."""
    col = np.zeros(3)
    for center, radius, base, col2 in SPHERES:
        if abs(np.linalg.norm(p - center) - radius) < 1e-3:
            nn = (p - center) / radius
            if col2 is not None:
                u = np.floor(4 * np.arctan2(nn[1], nn[0]) / np.pi)
                v = np.floor(6 * np.arccos(np.clip(nn[2], -1, 1)) / np.pi)
                col = col2 if (u + v) % 2 else base
            else:
                col = base
            break
    else:
        checker = (np.floor(p[0] * 4) + np.floor(p[1] * 4)) % 2
        col = np.array([0.85, 0.85, 0.85]) if checker else np.array([0.35, 0.35, 0.4])
    ldir = LIGHT - p
    ldir = ldir / np.linalg.norm(ldir)
    lam = max(float(n @ ldir), 0.0)
    shadow = bool(_shadowed(p[None])[0])
    return np.clip(col * (0.25 + 0.75 * lam * (not shadow)), 0, 1)


def sample_surface_points(n_points: int, rng) -> tuple:
    """(points (N,3), colors uint8 (N,3)) on the scene surfaces — the
    SfM-seed-point analog for splatfacto."""
    pts, cols = [], []
    n_dome = n_points // 4 if DOME_R is not None else 0
    areas = [4 * np.pi * r**2 for _, r, _, _ in SPHERES] + [np.pi * PLANE_R**2]
    probs = np.asarray(areas) / np.sum(areas)
    for _ in range(n_points - n_dome):
        k = rng.choice(len(probs), p=probs)
        if k < len(SPHERES):
            center, radius, _, _ = SPHERES[k]
            v = rng.normal(size=3)
            v /= np.linalg.norm(v)
            p = center + radius * v
            n = v
        else:
            rr = PLANE_R * np.sqrt(rng.uniform())
            th = rng.uniform(0, 2 * np.pi)
            p = np.array([rr * np.cos(th), rr * np.sin(th), GROUND_Z])
            n = np.array([0.0, 0, 1])
        pts.append(p)
        cols.append((_surface_color(p, n) * 255).astype(np.uint8))
    for _ in range(n_dome):
        # dome seed points so splat growth has background geometry to refine
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        p = DOME_R * v
        pts.append(p)
        cols.append((np.clip(_dome_color_at(p), 0, 1) * 255).astype(np.uint8))
    return np.asarray(pts, np.float32), np.asarray(cols, np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", type=Path)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=80)
    ap.add_argument("--n-test", type=int, default=10)
    ap.add_argument("--radius", type=float, default=2.6)
    ap.add_argument("--n-points", type=int, default=30000,
                    help="surface seed points written to points3D.ply")
    ap.add_argument("--scene", default="basic",
                    choices=("basic", "blender", "unbounded", "distorted", "masked",
                             "semantic", "dnerf", "appearance"))
    args = ap.parse_args()
    set_scene(args.scene)

    focal = args.hw * 1.1
    rng = np.random.default_rng(7)
    mask_paths: dict = {}
    sem_paths: dict = {}

    for split, n, seed_off in [("train", args.n_train, 0), ("val", args.n_test, 1), ("test", args.n_test, 2)]:
        frames = []
        (args.out / split).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            if split == "train":
                theta = 2 * np.pi * i / n + rng.uniform(-0.03, 0.03)
                phi = np.deg2rad(rng.uniform(25, 60))
            else:
                theta = 2 * np.pi * (i + 0.5 + seed_off * 0.17) / n
                phi = np.deg2rad(30 + 25 * ((i + seed_off) % 3) / 2)
            pos = args.radius * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
            )
            c2w = look_at(pos)
            frame_time = None
            if args.scene == "dnerf":
                frame_time = i / max(n - 1, 1)
                set_scene_time(frame_time)
            transient = None
            if args.scene == "masked" and split == "train":
                # per-view floating sphere: NOT multi-view consistent, must
                # be excluded by the mask or it poisons training
                tc = np.array([rng.uniform(-0.6, 0.6), rng.uniform(-0.6, 0.6),
                               rng.uniform(0.7, 1.2)])
                transient = (tc, 0.16, np.array([0.95, 0.4, 0.75]))
            img, occ, sem = render(c2w, args.hw, focal, transient=transient)
            if args.scene == "appearance" and split == "train":
                # per-view exposure/tint (phototourism protocol: unstructured
                # collections vary in lighting/ISP; the appearance embedding
                # must absorb it). Tints average to ~neutral so the
                # mean-embedding eval render matches the untinted eval GT.
                tint = 1.0 + 0.22 * np.array([
                    np.sin(2 * np.pi * i / n),
                    np.sin(2 * np.pi * i / n + 2.1),
                    np.sin(2 * np.pi * i / n + 4.2),
                ])
                img = np.clip(img.astype(np.float64) * tint, 0, 255).astype(np.uint8)
            name = f"./{split}/r_{i}"
            write_png(args.out / split / f"r_{i}.png", img)
            if args.scene == "semantic":
                write_png(args.out / split / f"s_{i}.png",
                          np.repeat(sem[..., None], 3, axis=-1))
                sem_paths[f"{split}/r_{i}.png"] = f"{split}/s_{i}.png"
            entry = {"file_path": name, "transform_matrix": c2w.tolist()}
            if frame_time is not None:
                entry["time"] = frame_time
            frames.append(entry)
            if args.scene == "masked":
                # mask: 255 = supervise, 0 = transient pixel (reference
                # pixel_samplers mask rejection semantics)
                valid = np.full((args.hw, args.hw), 255, np.uint8)
                if occ is not None:
                    valid[occ] = 0
                mpath = args.out / split / f"m_{i}.png"
                write_png(mpath, np.repeat(valid[..., None], 3, axis=-1))
                mask_paths[f"{split}/r_{i}.png"] = f"{split}/m_{i}.png"
        meta = {"camera_angle_x": 2 * np.arctan(args.hw / (2 * focal)), "frames": frames}
        with open(args.out / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)

    # nerfstudio-format companion: one transforms.json over ALL frames with
    # per-frame intrinsics + ground-truth surface seed points (the SfM-point
    # analog for splatfacto)
    rng_pts = np.random.default_rng(11)
    pts, cols = sample_surface_points(args.n_points, rng_pts)
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from nerfstudio_tpu.exporter.ply_io import write_ply

    write_ply(
        args.out / "points3D.ply",
        len(pts),
        {
            "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
            "red": cols[:, 0], "green": cols[:, 1], "blue": cols[:, 2],
        },
    )
    ns_frames = []
    for split in ("train", "val"):
        with open(args.out / f"transforms_{split}.json") as f:
            m = json.load(f)
        for fr in m["frames"]:
            rel = fr["file_path"].lstrip("./") + ".png"
            entry = {"file_path": rel, "transform_matrix": fr["transform_matrix"]}
            if rel in mask_paths:
                entry["mask_path"] = mask_paths[rel]
            if rel in sem_paths:
                entry["semantic_path"] = sem_paths[rel]
            ns_frames.append(entry)
    if args.scene == "masked":
        # the parser requires masks for every frame or none: eval frames get
        # an all-valid mask
        for entry in ns_frames:
            if "mask_path" not in entry:
                split, stem = entry["file_path"].split("/")
                mpath = args.out / split / f"m_{stem.removesuffix('.png').split('_')[-1]}.png"
                write_png(mpath, np.full((args.hw, args.hw, 3), 255, np.uint8))
                entry["mask_path"] = str(mpath.relative_to(args.out))
    ns_meta = {
        "fl_x": focal, "fl_y": focal, "cx": args.hw / 2, "cy": args.hw / 2,
        "w": args.hw, "h": args.hw, "camera_model": "OPENCV",
        "frames": ns_frames, "ply_file_path": "points3D.ply",
    }
    if args.scene == "semantic":
        ns_meta["semantic_classes"] = (
            ["background", "ground"] + [f"sphere_{i}" for i in range(len(SPHERES))]
        )
    if DISTORTION is not None:
        # the blender-format jsons carry no distortion model — only the
        # nerfstudio-format transforms.json is valid for the distorted scene
        ns_meta.update({"k1": DISTORTION[0], "k2": DISTORTION[1], "p1": 0.0, "p2": 0.0})
        for split in ("train", "val", "test"):
            (args.out / f"transforms_{split}.json").unlink()
    with open(args.out / "transforms.json", "w") as f:
        json.dump(ns_meta, f)
    print(f"wrote {args.out} scene={args.scene} ({args.n_train} train / {args.n_test} val+test @ {args.hw}px, {len(pts)} seed points)")


if __name__ == "__main__":
    main()
