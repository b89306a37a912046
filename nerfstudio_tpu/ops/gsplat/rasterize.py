"""Tile-based 3DGS rasterizer — TPU-native replacement for
``gsplat.rasterization`` (reference models/splatfacto.py:555-575).

Static-shape pipeline (no dynamic duplication lists):

  1. tile binning: each projected gaussian emits a FIXED number of
     (tile_id, depth) keys covering its 3-sigma bbox (bboxes larger than the
     per-gaussian tile budget are truncated — bounded-coverage tradeoff for
     static shapes);
  2. ONE global lexicographic ``lax.sort`` over (tile_id, depth) — the
     scaling-friendly primitive TPUs are great at;
  3. per-tile segments located with searchsorted; each tile blends its
     first ``max_per_tile`` gaussians front-to-back over its 16x16 pixels,
     mapped over tile chunks to bound VMEM/HBM;
  4. backward = plain autodiff: sort indices are stop-gradient integers,
     all value paths are gathers (transpose-scatter-add under AD).

Returns rgb, alpha, depth images + the per-gaussian screen xy used (so the
training step can probe dL/dmeans2d for densification stats).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16

# pixel transmittance below this stops a tile batch (gsplat terminates a
# pixel at T < 1e-4; we stop a 64-tile batch when ALL its pixels are there)
_LOG_T_EPS = -9.21  # log(1e-4)


def _pix_local():
    py, px = jnp.meshgrid(
        jnp.arange(TILE, dtype=jnp.float32) + 0.5,
        jnp.arange(TILE, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    return jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (256, 2)


def _alpha_from_gathered(g_mean, g_conic, g_opac, pix, in_seg):
    """Per-entry alpha from already-GATHERED gaussian params.

    g_mean (C, K, 2); g_conic (C, K, 3); g_opac (C, K); pix (C, 256, 2);
    in_seg (C, K) -> alpha (C, 256, K). Taking gathered arrays as direct
    inputs makes its VJP produce COMPACT per-entry gradients (C, K, ...) —
    the backward then does ONE packed row scatter per chunk instead of four
    full-buffer scatter-adds (the r4 attribution's dominant cost)."""
    d = pix[:, :, None, :] - g_mean[:, None, :, :]  # (C, 256, K, 2)
    a, b, c = g_conic[..., 0], g_conic[..., 1], g_conic[..., 2]
    sigma = 0.5 * (
        a[:, None, :] * d[..., 0] ** 2 + c[:, None, :] * d[..., 1] ** 2
    ) + b[:, None, :] * d[..., 0] * d[..., 1]
    alpha = jnp.minimum(0.999, g_opac[:, None, :] * jnp.exp(-sigma))
    return jnp.where(
        (sigma >= 0) & in_seg[:, None, :] & (alpha > 1.0 / 255.0), alpha, 0.0
    )


def _chunk_alpha_ch(means2d, conics, ch, opac, gids, pix, in_seg):
    """One K-chunk of front-to-back inputs.

    gids (C, K) gaussian ids; pix (C, 256, 2); in_seg (C, K) mask.
    -> alpha (C, 256, K), chv (C, K, 5)."""
    alpha = _alpha_from_gathered(means2d[gids], conics[gids], opac[gids], pix, in_seg)
    return alpha, ch[gids]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend_saturating(cfg, means2d, conics, ch, opac, idxs):
    """Exact front-to-back alpha blending over FULL per-tile lists.

    Replaces the bounded top-K blend: each 64-tile batch consumes its
    depth-sorted gaussians in K-sized chunks inside a while_loop that stops
    when every pixel's transmittance is saturated (< 1e-4) or the lists are
    exhausted — the TPU-shaped equivalent of gsplat's per-pixel early
    termination, with no truncation cliff. Backward is a manual chunk-wise
    back-to-front replay (custom VJP; while_loop is not reverse-mode
    differentiable).

    cfg = (K, C, tiles_x) static. ch is (N, 5): [r, g, b, depth, 1].
    idxs = (id_sorted, starts (nb, C), counts (nb, C), tileidx (nb, C)).
    -> ch_out (nb, C, 256, 5), logT (nb, C, 256)."""
    out, _ = _blend_saturating_fwd(cfg, means2d, conics, ch, opac, idxs)
    return out


def _blend_sat_batch_fwd(cfg, means2d, conics, ch, opac, id_sorted, batch):
    K, C, tiles_x = cfg
    c_starts, c_counts, c_tileidx = batch
    ty = (c_tileidx // tiles_x).astype(jnp.float32) * TILE
    tx = (c_tileidx % tiles_x).astype(jnp.float32) * TILE
    pix = _pix_local()[None] + jnp.stack([tx, ty], axis=-1)[:, None, :]
    k_ar = jnp.arange(K, dtype=jnp.int32)
    maxcount = jnp.max(c_counts)

    def cond(carry):
        c, ch_acc, logT = carry
        has_entries = c * K < maxcount
        live = (c * K < c_counts)[:, None]
        unsat = jnp.max(jnp.where(live, logT, -jnp.inf)) > _LOG_T_EPS
        return has_entries & unsat

    def body(carry):
        c, ch_acc, logT = carry
        off = c * K + k_ar
        entry = jnp.clip(c_starts[:, None] + off[None, :], 0, id_sorted.shape[0] - 1)
        in_seg = off[None, :] < c_counts[:, None]
        gids = id_sorted[entry]
        alpha, chv = _chunk_alpha_ch(means2d, conics, ch, opac, gids, pix, in_seg)
        lcum = jnp.cumsum(jnp.log1p(-alpha), axis=-1)
        excl = lcum - jnp.log1p(-alpha)
        w = alpha * jnp.exp(logT[..., None] + excl)
        ch_acc = ch_acc + jnp.einsum("cpk,ckf->cpf", w, chv)
        logT = logT + lcum[..., -1]
        return c + 1, ch_acc, logT

    init = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((C, TILE * TILE, 5), jnp.float32),
        jnp.zeros((C, TILE * TILE), jnp.float32),
    )
    n_c, ch_acc, logT = jax.lax.while_loop(cond, body, init)
    return ch_acc, logT, n_c


def _blend_saturating_fwd(cfg, means2d, conics, ch, opac, idxs):
    id_sorted, starts_b, counts_b, tileidx_b = idxs
    ch_b, logT_b, ncs = jax.lax.map(
        lambda b: _blend_sat_batch_fwd(cfg, means2d, conics, ch, opac, id_sorted, b),
        (starts_b, counts_b, tileidx_b),
    )
    return (ch_b, logT_b), (means2d, conics, ch, opac, idxs, logT_b, ncs)


def _blend_saturating_bwd(cfg, res, cot):
    """Back-to-front replay with COMPACT per-entry gradients.

    Each chunk iteration gathers its entries' params, runs the alpha VJP on
    the GATHERED arrays (gradients come out (C, K, ...) — no full-buffer
    scatters inside the pull), packs d{mean2d, conic, ch, opac} into one
    (C, K, 11) block, and lands it with ONE row scatter-add into the packed
    (N, 11) accumulator. The r4 structure did four `.at[gids].add` scatters
    plus four dense (N, ...) adds per iteration — the step's dominant
    serial cost (PERF.md r4 splat attribution)."""
    K, C, tiles_x = cfg
    means2d, conics, ch, opac, idxs, logT_b, ncs = res
    id_sorted, starts_b, counts_b, tileidx_b = idxs
    g_ch_b, g_logT_b = cot
    k_ar = jnp.arange(K, dtype=jnp.int32)

    grads0 = jnp.zeros((means2d.shape[0], 11), jnp.float32)

    def batch_bwd(grads, batch):
        c_starts, c_counts, c_tileidx, logT_final, n_c, g_ch, g_logT = batch
        ty = (c_tileidx // tiles_x).astype(jnp.float32) * TILE
        tx = (c_tileidx % tiles_x).astype(jnp.float32) * TILE
        pix = _pix_local()[None] + jnp.stack([tx, ty], axis=-1)[:, None, :]

        def body(j, carry):
            grads, logT_exit, GS_carry = carry
            c = n_c - 1 - j
            off = c * K + k_ar
            entry = jnp.clip(
                c_starts[:, None] + off[None, :], 0, id_sorted.shape[0] - 1
            )
            in_seg = off[None, :] < c_counts[:, None]
            gids = id_sorted[entry]
            g_mean = means2d[gids]
            g_conic = conics[gids]
            g_opac = opac[gids]
            chv = ch[gids]
            alpha, pull = jax.vjp(
                lambda m2k, conk, opk: _alpha_from_gathered(
                    m2k, conk, opk, pix, in_seg
                ),
                g_mean,
                g_conic,
                g_opac,
            )
            lcum = jnp.cumsum(jnp.log1p(-alpha), axis=-1)
            excl = lcum - jnp.log1p(-alpha)
            logT_enter = logT_exit - lcum[..., -1]
            T_k = jnp.exp(logT_enter[..., None] + excl)  # (C, 256, K)
            w = alpha * T_k
            G = jnp.einsum("cpf,ckf->cpk", g_ch, chv)
            wG = w * G
            # suffix (exclusive) sum of wG over k, + the later-chunks carry
            suff = jnp.sum(wG, axis=-1, keepdims=True) - jnp.cumsum(wG, axis=-1)
            P = GS_carry[..., None] + suff
            one_m = 1.0 - alpha
            dalpha = G * T_k - P / one_m - g_logT[..., None] / one_m
            dchv = jnp.einsum("cpk,cpf->ckf", w, g_ch)
            d_gmean, d_gconic, d_gopac = pull(dalpha)
            packed = jnp.concatenate(
                [d_gmean, d_gconic, dchv, d_gopac[..., None]], axis=-1
            )  # (C, K, 11)
            # clamped out-of-segment entries alias real slots — zero them
            packed = jnp.where(in_seg[..., None], packed, 0.0)
            grads = grads.at[gids].add(packed)
            GS_carry = GS_carry + jnp.sum(wG, axis=-1)
            return grads, logT_enter, GS_carry

        logT0 = logT_final
        GS0 = jnp.zeros((C, TILE * TILE), jnp.float32)
        grads, _, _ = jax.lax.fori_loop(0, n_c, body, (grads, logT0, GS0))
        return grads, None

    grads, _ = jax.lax.scan(
        batch_bwd,
        grads0,
        (starts_b, counts_b, tileidx_b, logT_b, ncs, g_ch_b, g_logT_b),
    )
    dm2 = grads[:, 0:2]
    dcon = grads[:, 2:5]
    dch = grads[:, 5:10].astype(ch.dtype)
    dop = grads[:, 10].astype(opac.dtype)
    return dm2, dcon, dch, dop, None


_blend_saturating.defvjp(_blend_saturating_fwd, _blend_saturating_bwd)


def _window_tile_ids(
    means2d, radii, valid, gid, tiles_x, tiles_y, d_side
) -> Tuple[list, list]:
    """d_side x d_side emission window CENTERED on the gaussian's tile
    (clipped to the on-screen part of its 3-sigma bbox): a splat wider than
    the window loses its tails symmetrically. Returns per-window-slot lists
    of (tile_id or num_tiles sentinel, gaussian id)."""
    num_tiles = tiles_x * tiles_y
    x0t = jnp.floor((means2d[:, 0] - radii) / TILE).astype(jnp.int32)
    y0t = jnp.floor((means2d[:, 1] - radii) / TILE).astype(jnp.int32)
    x1t = jnp.floor((means2d[:, 0] + radii) / TILE).astype(jnp.int32)
    y1t = jnp.floor((means2d[:, 1] + radii) / TILE).astype(jnp.int32)
    cxt = jnp.floor(means2d[:, 0] / TILE).astype(jnp.int32)
    cyt = jnp.floor(means2d[:, 1] / TILE).astype(jnp.int32)
    half = (d_side - 1) // 2
    lo_x = jnp.maximum(x0t, 0)
    hi_x = jnp.minimum(x1t, tiles_x - 1)
    lo_y = jnp.maximum(y0t, 0)
    hi_y = jnp.minimum(y1t, tiles_y - 1)
    sx = jnp.clip(cxt - half, lo_x, jnp.maximum(lo_x, hi_x - d_side + 1))
    sy = jnp.clip(cyt - half, lo_y, jnp.maximum(lo_y, hi_y - d_side + 1))
    tiles, ids = [], []
    for dy in range(d_side):
        for dx in range(d_side):
            tx = sx + dx
            ty = sy + dy
            ok = (
                valid
                & (tx >= 0) & (tx < tiles_x) & (tx >= x0t) & (tx <= x1t)
                & (ty >= 0) & (ty < tiles_y) & (ty >= y0t) & (ty <= y1t)
            )
            tiles.append(jnp.where(ok, ty * tiles_x + tx, num_tiles))
            ids.append(gid)
    return tiles, ids


def _tile_keys_packed(
    means2d: jnp.ndarray,  # (N, 2)
    radii: jnp.ndarray,  # (N,)
    depths: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    tiles_x: int,
    tiles_y: int,
    tiles_per_gauss: int,
    big_frac: int = 0,
    big_tiles_per_gauss: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """PACKED single-key tile binning: key = tile_id << depth_bits | q(depth).

    One uint32 key per (tile, gaussian) pair replaces the 3-operand
    (tile, depth, id) lexicographic sort — measured 42 ns/el on v5e; the
    packed 2-operand sort roughly halves the comparator traffic. Depth is
    quantized by its float bit pattern (monotone for positive floats), so
    within-tile order matches the exact depth sort up to ties below 2^-19
    relative depth (blending-order ties, invisible).

    ``big_frac`` > 0 enables TWO-CLASS emission for large images: every
    gaussian emits the base ``tiles_per_gauss`` window, and the top
    ``N // big_frac`` by screen radius emit an additional
    ``big_tiles_per_gauss`` window (duplicate (tile, gauss) pairs are
    suppressed by skipping base-window tiles inside the big window). Big
    near-camera splats at 1 MP span far more than the base 4x4-tile window —
    this covers them without paying 64 keys for every tiny splat.

    Returns (keys_u32 (M,), gauss_ids (M,), depth_bits)."""
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    depth_bits = 32 - tile_bits
    assert depth_bits >= 12, f"image too large for packed keys: {num_tiles} tiles"

    d_side = max(int(np.sqrt(tiles_per_gauss)), 1)
    gid = jnp.arange(n, dtype=jnp.int32)
    tiles, ids = _window_tile_ids(means2d, radii, valid, gid, tiles_x, tiles_y, d_side)

    if big_frac:
        b = max(n // big_frac, 1)
        d_big = max(int(np.sqrt(big_tiles_per_gauss)), 1)
        r_big, idx_big = jax.lax.top_k(jnp.where(valid, radii, -1.0), b)
        # only splats genuinely wider than the base window get the big pass
        big_ok = r_big > (d_side * TILE) / 2.0
        bt, bi = _window_tile_ids(
            means2d[idx_big], r_big, big_ok, idx_big, tiles_x, tiles_y, d_big
        )
        # suppress duplicates: drop big-window tiles already covered by the
        # base window, recomputing the base window start with the SAME
        # clipping formula the base pass used (edge clipping shifts it)
        m_big = means2d[idx_big]
        r_base = radii[idx_big]
        x0t = jnp.floor((m_big[:, 0] - r_base) / TILE).astype(jnp.int32)
        y0t = jnp.floor((m_big[:, 1] - r_base) / TILE).astype(jnp.int32)
        x1t = jnp.floor((m_big[:, 0] + r_base) / TILE).astype(jnp.int32)
        y1t = jnp.floor((m_big[:, 1] + r_base) / TILE).astype(jnp.int32)
        cxt = jnp.floor(m_big[:, 0] / TILE).astype(jnp.int32)
        cyt = jnp.floor(m_big[:, 1] / TILE).astype(jnp.int32)
        half = (d_side - 1) // 2
        lo_x = jnp.maximum(x0t, 0)
        hi_x = jnp.minimum(x1t, tiles_x - 1)
        lo_y = jnp.maximum(y0t, 0)
        hi_y = jnp.minimum(y1t, tiles_y - 1)
        bsx = jnp.clip(cxt - half, lo_x, jnp.maximum(lo_x, hi_x - d_side + 1))
        bsy = jnp.clip(cyt - half, lo_y, jnp.maximum(lo_y, hi_y - d_side + 1))
        for t_arr, i_arr in zip(bt, bi):
            tx = t_arr % tiles_x
            ty = t_arr // tiles_x
            in_base = (
                (tx >= bsx) & (tx < bsx + d_side)
                & (ty >= bsy) & (ty < bsy + d_side)
                & (t_arr < num_tiles)
            )
            tiles.append(jnp.where(in_base, num_tiles, t_arr))
            ids.append(i_arr)

    tile_all = jnp.concatenate(tiles)
    id_all = jnp.concatenate(ids)
    # monotone uint depth: positive float32 bit patterns order correctly
    dq = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 1e-20).astype(jnp.float32), jnp.uint32
    ) >> np.uint32(32 - depth_bits)
    keys = (tile_all.astype(jnp.uint32) << np.uint32(depth_bits)) | dq[id_all]
    return keys, id_all, depth_bits


@functools.partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "tiles_per_gauss",
        "max_per_tile",
        "tile_chunk",
        "mode",
        "blend_chunk_size",
        "big_frac",
        "big_tiles_per_gauss",
    ),
)
def rasterize(
    means2d: jnp.ndarray,  # (N, 2)
    conics: jnp.ndarray,  # (N, 3)
    colors: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,) in [0, 1] (already sigmoid*compensation)
    depths: jnp.ndarray,  # (N,)
    radii: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    *,
    width: int,
    height: int,
    tiles_per_gauss: int = 16,
    max_per_tile: int = 256,
    tile_chunk: int = 64,
    mode: str = "bounded",
    blend_chunk_size: int = 64,
    big_frac: int = 0,
    big_tiles_per_gauss: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (rgb (H, W, 3), alpha (H, W, 1), depth (H, W, 1)).

    mode="bounded": blend the nearest max_per_tile gaussians per tile
    (fixed cost, truncates deep tiles). mode="saturating": blend the FULL
    per-tile lists chunk-wise until pixel transmittance saturates — exact
    gsplat front-to-back semantics with adaptive cost. big_frac > 0 adds a
    wider second emission window for the top N//big_frac splats by radius
    (1 MP scale: near splats span more than the base window)."""
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    num_tiles = tiles_x * tiles_y

    keys, gauss_ids, depth_bits = _tile_keys_packed(
        jax.lax.stop_gradient(means2d),
        jax.lax.stop_gradient(radii),
        jax.lax.stop_gradient(depths),
        valid,
        tiles_x,
        tiles_y,
        tiles_per_gauss,
        big_frac=big_frac,
        big_tiles_per_gauss=big_tiles_per_gauss,
    )
    keys_sorted, id_sorted = jax.lax.sort((keys, gauss_ids), num_keys=1)
    # per-tile segment starts / counts: search the packed keys at tile
    # boundaries (tile t's first possible key is t << depth_bits)
    tile_range = (
        jnp.arange(num_tiles + 1, dtype=jnp.uint32) << np.uint32(depth_bits)
    )
    starts = jnp.searchsorted(keys_sorted, tile_range, side="left").astype(jnp.int32)
    counts = starts[1:] - starts[:-1]  # (num_tiles,)
    starts = starts[:-1]

    # pixel offsets within a tile
    py, px = jnp.meshgrid(
        jnp.arange(TILE, dtype=jnp.float32) + 0.5,
        jnp.arange(TILE, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    pix_local = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)  # (256, 2)

    n_chunks = (num_tiles + tile_chunk - 1) // tile_chunk
    pad_tiles = n_chunks * tile_chunk - num_tiles
    starts_p = jnp.pad(starts, (0, pad_tiles))
    counts_p = jnp.pad(counts, (0, pad_tiles))
    tile_idx_p = jnp.pad(jnp.arange(num_tiles, dtype=jnp.int32), (0, pad_tiles))

    if mode == "saturating":
        ch5 = jnp.concatenate(
            [
                colors,
                depths[:, None],
                jnp.ones((colors.shape[0], 1), colors.dtype),
            ],
            axis=-1,
        ).astype(jnp.float32)
        cfg = (blend_chunk_size, tile_chunk, tiles_x)
        ch_b, logT_b = _blend_saturating(
            cfg,
            means2d,
            conics,
            ch5,
            opacities.astype(jnp.float32),
            (
                id_sorted,
                starts_p.reshape(n_chunks, tile_chunk),
                counts_p.reshape(n_chunks, tile_chunk),
                tile_idx_p.reshape(n_chunks, tile_chunk),
            ),
        )
        ch_t = ch_b.reshape(n_chunks * tile_chunk, TILE, TILE, 5)[:num_tiles]
        acc_t = ch_t[..., 4]
        rgb_t = ch_t[..., :3]
        dep_t = ch_t[..., 3] / jnp.maximum(acc_t, 1e-10)

        def tiles_to_image_sat(t):
            extra = t.shape[3:]
            img = t.reshape((tiles_y, tiles_x, TILE, TILE) + extra)
            img = jnp.moveaxis(img, 2, 1)
            return img.reshape((tiles_y * TILE, tiles_x * TILE) + extra)[:height, :width]

        return (
            tiles_to_image_sat(rgb_t),
            tiles_to_image_sat(acc_t)[..., None],
            tiles_to_image_sat(dep_t)[..., None],
        )

    k_arange = jnp.arange(max_per_tile, dtype=jnp.int32)

    def blend_chunk(args):
        c_starts, c_counts, c_tileidx = args  # (C,)
        # gather entries: (C, K)
        entry = c_starts[:, None] + k_arange[None, :]
        in_seg = k_arange[None, :] < jnp.minimum(c_counts[:, None], max_per_tile)
        entry = jnp.clip(entry, 0, id_sorted.shape[0] - 1)
        gids = id_sorted[entry]  # (C, K)

        g_mean = means2d[gids]  # (C, K, 2)
        g_conic = conics[gids]  # (C, K, 3)
        g_color = colors[gids]  # (C, K, 3)
        g_opac = opacities[gids]  # (C, K)
        g_depth = depths[gids]  # (C, K)

        ty = (c_tileidx // tiles_x).astype(jnp.float32) * TILE
        tx = (c_tileidx % tiles_x).astype(jnp.float32) * TILE
        pix = pix_local[None] + jnp.stack([tx, ty], axis=-1)[:, None, :]  # (C, 256, 2)

        d = pix[:, :, None, :] - g_mean[:, None, :, :]  # (C, 256, K, 2)
        a, b, c = g_conic[..., 0], g_conic[..., 1], g_conic[..., 2]
        sigma = 0.5 * (
            a[:, None, :] * d[..., 0] ** 2 + c[:, None, :] * d[..., 1] ** 2
        ) + b[:, None, :] * d[..., 0] * d[..., 1]  # (C, 256, K)
        alpha = jnp.minimum(0.999, g_opac[:, None, :] * jnp.exp(-sigma))
        alpha = jnp.where((sigma >= 0) & in_seg[:, None, :] & (alpha > 1.0 / 255.0), alpha, 0.0)

        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=-1)
        trans = jnp.exp(log_t - jnp.log1p(-alpha))  # exclusive transmittance
        w = alpha * trans  # (C, 256, K)
        rgb = jnp.einsum("cpk,ckj->cpj", w, g_color)  # (C, 256, 3)
        acc = jnp.sum(w, axis=-1)  # (C, 256)
        depth_img = jnp.sum(w * g_depth[:, None, :], axis=-1) / jnp.maximum(acc, 1e-10)
        return rgb, acc, depth_img

    rgb_c, acc_c, dep_c = jax.lax.map(
        blend_chunk,
        (
            starts_p.reshape(n_chunks, tile_chunk),
            counts_p.reshape(n_chunks, tile_chunk),
            tile_idx_p.reshape(n_chunks, tile_chunk),
        ),
    )
    rgb_t = rgb_c.reshape(n_chunks * tile_chunk, TILE, TILE, 3)[:num_tiles]
    acc_t = acc_c.reshape(n_chunks * tile_chunk, TILE, TILE)[:num_tiles]
    dep_t = dep_c.reshape(n_chunks * tile_chunk, TILE, TILE)[:num_tiles]

    def tiles_to_image(t):
        extra = t.shape[3:]
        img = t.reshape((tiles_y, tiles_x, TILE, TILE) + extra)
        img = jnp.moveaxis(img, 2, 1)  # (ty, TILE, tx, TILE, ...)
        return img.reshape((tiles_y * TILE, tiles_x * TILE) + extra)[:height, :width]

    rgb = tiles_to_image(rgb_t)
    alpha = tiles_to_image(acc_t)[..., None]
    depth = tiles_to_image(dep_t)[..., None]
    return rgb, alpha, depth
