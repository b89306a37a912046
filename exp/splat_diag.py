"""Diagnose splat quality limiters on a trained checkpoint: truncation
(tiles_per_gauss window, max_per_tile), alive count, and train/eval PSNR
with inflated rasterization budgets."""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RUN = sys.argv[1] if len(sys.argv) > 1 else "/tmp/splat30k/synth/splatfacto/bench"


def main():
    from nerfstudio_tpu.utils.eval_utils import eval_setup
    from nerfstudio_tpu.ops.gsplat.projection import get_viewmat, project_gaussians
    from nerfstudio_tpu.ops.gsplat.rasterize import TILE
    from nerfstudio_tpu.utils.metrics import psnr

    config, pipeline, state = eval_setup(Path(RUN))
    cfg = config.model
    model = pipeline.model
    dm = pipeline.datamanager
    alive = np.asarray(state.aux.alive)
    print(f"alive: {alive.sum()} / {alive.size}")

    params = state.params
    scales = np.asarray(jnp.exp(params["scales"]))
    print("scale percentiles (p50/p90/p99/max):",
          [float(np.percentile(scales[alive].max(axis=-1), q)) for q in (50, 90, 99, 100)])

    # per-eval-view projection stats
    cams = dm.eval_cameras
    n_eval = len(dm.eval_dataset)
    for i in range(min(n_eval, 3)):
        c2w = jnp.asarray(dm.eval_cameras.camera_to_worlds[i])
        fx = float(np.asarray(cams.fx).reshape(-1)[i]); fy = float(np.asarray(cams.fy).reshape(-1)[i])
        cx = float(np.asarray(cams.cx).reshape(-1)[i]); cy = float(np.asarray(cams.cy).reshape(-1)[i])
        W = int(np.asarray(cams.width).reshape(-1)[i]); H = int(np.asarray(cams.height).reshape(-1)[i])
        viewmat = get_viewmat(c2w)
        means2d, depths, conics, radii, valid, comp = project_gaussians(
            params["means"], jnp.exp(params["scales"]), params["quats"], viewmat,
            fx, fy, cx, cy, W, H, near=cfg.near_plane,
        )
        valid = np.asarray(valid & state.aux.alive)
        radii = np.asarray(radii)[valid]
        m2d = np.asarray(means2d)[valid]
        d_side = max(int(np.sqrt(cfg.tiles_per_gauss)), 1)
        x0t = np.floor((m2d[:, 0] - radii) / TILE); x1t = np.floor((m2d[:, 0] + radii) / TILE)
        y0t = np.floor((m2d[:, 1] - radii) / TILE); y1t = np.floor((m2d[:, 1] + radii) / TILE)
        wx = x1t - x0t + 1; wy = y1t - y0t + 1
        over = (wx > d_side) | (wy > d_side)
        cover = np.minimum(wx, d_side) * np.minimum(wy, d_side)
        full = wx * wy
        print(f"view {i}: visible={valid.sum()} radii p50/p99/max="
              f"{np.percentile(radii,50):.1f}/{np.percentile(radii,99):.1f}/{radii.max():.1f} "
              f"bbox>window: {over.mean()*100:.1f}% lost-coverage={(1-cover.sum()/full.sum())*100:.1f}%")
        # tile occupancy vs max_per_tile
        tiles_x = (W + TILE - 1) // TILE; tiles_y = (H + TILE - 1) // TILE
        counts = np.zeros(tiles_x * tiles_y, dtype=np.int64)
        tx_lo = np.clip(x0t, 0, tiles_x - 1).astype(int); tx_hi = np.clip(np.minimum(x1t, x0t + d_side - 1), 0, tiles_x - 1).astype(int)
        ty_lo = np.clip(y0t, 0, tiles_y - 1).astype(int); ty_hi = np.clip(np.minimum(y1t, y0t + d_side - 1), 0, tiles_y - 1).astype(int)
        for dy in range(d_side):
            for dx in range(d_side):
                ty = ty_lo + dy; tx = tx_lo + dx
                ok = (ty <= ty_hi) & (tx <= tx_hi)
                np.add.at(counts, (ty * tiles_x + tx)[ok], 1)
        print(f"  tile counts p50/p95/max = {np.percentile(counts,50):.0f}/{np.percentile(counts,95):.0f}/{counts.max()} "
              f"tiles>max_per_tile({cfg.max_per_tile}): {(counts>cfg.max_per_tile).sum()}/{len(counts)}")

    # eval PSNR with default vs inflated budgets
    for tpg, mpt, tag in ((cfg.tiles_per_gauss, cfg.max_per_tile, "default"),
                          (64, 2048, "inflated")):
        model.config = type(cfg)(**{**{f.name: getattr(cfg, f.name) for f in
                                       __import__("dataclasses").fields(cfg)
                                       if f.name != "_target"}})
        model.config.tiles_per_gauss = tpg
        model.config.max_per_tile = mpt
        vals = []
        for i in range(n_eval):
            m, _ = pipeline.get_eval_image_metrics(state, i)
            vals.append(float(m["psnr"]))
        print(f"budgets {tag} (tpg={tpg}, mpt={mpt}): eval PSNR {np.mean(vals):.2f}")


if __name__ == "__main__":
    main()
