"""Multiresolution hash-grid encoding op (Instant-NGP).

Replaces tiny-cuda-nn's HashGrid (reference field_components/encodings.py:
307-463 torch fallback; tcnn config :362-380).

TPU layout notes (measured on v5e with HONEST host-readback timing — the
tunneled runtime's ``block_until_ready`` returns early, so any number taken
without a readback is garbage; see exp/gather_bench4.py):

  * element gathers (feature-major ``(F,T)[:, idx]``) cost ~5.6 ns/access —
    each 4 B value pays a full HBM transaction.
  * **row gathers**: storing the table as ``(S, 128)`` rows (128 lanes = one
    f32 tile line, 512 B contiguous) and gathering whole rows costs
    ~2.4 ns/access *including* the in-register one-hot lane select. 2.3x
    faster, and the (M,128) intermediate fuses into the select-reduce so it
    never hits HBM.
  * backward: ~8-11 ns/access for unsorted scatter-add; pre-sorting is a
    LOSS (lax.sort is ~42 ns/el honest). Row scatter-add ``(S,128).at[rows]
    .add(masked)`` delivers all F features per access, beating F separate
    element scatters for F>=2.

Layout: per level, entries are packed ``entries_per_row = 128 //
features_per_level`` to a row; entry ``e`` of level ``l`` lives at
``table[l, e // epr, (e % epr) * F + f]``.

Hash function: XOR of coordinate-wise products with primes
(1, 2654435761, 805459861) — the Instant-NGP spatial hash (paper eq. 4;
reference encodings.py:398-415 uses the same primes). Coarse levels whose
dense grid fits the table are indexed densely (collision-free, tcnn
behaviour); dense-vs-hashed is static per level."""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


def _u01_hash(o, p1, p2):
    """Deterministic uniform variate from a float's mantissa bits (decorrelated
    from the table hash by distinct multipliers)."""
    b = jax.lax.bitcast_convert_type(o, jnp.uint32)
    h = (b * jnp.uint32(p1)) ^ ((b >> 7) * jnp.uint32(p2))
    return (h >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def compute_level_resolutions(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Geometric growth factor exp((ln max - ln min)/(L-1)) (reference :341)."""
    if num_levels > 1:
        growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    else:
        growth = 1.0
    return np.floor(min_res * growth ** np.arange(num_levels)).astype(np.int64)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _row_gather_select(table_l: jnp.ndarray, rows: jnp.ndarray, slot: jnp.ndarray, f: int):
    """Gather entry features from a row-packed level table.

    table_l: (S, 128); rows/slot: (M,) int32. Returns (M, f) float32.
    Forward = whole-row gather (contiguous 512 B) + one-hot lane select;
    backward = unsorted row scatter-add of the one-hot-masked gradient."""
    # bf16 gather: halves the (M,128) intermediate's HBM traffic (tcnn uses
    # fp16 tables); the select accumulates in f32. Measured ~15% faster fwd.
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    sel = jnp.where(entry_of_lane == slot[:, None], vals, 0)  # (M, 128) bf16
    outs = [
        jnp.sum(jnp.where(feat_of_lane == i, sel, 0).astype(jnp.float32), axis=-1)
        for i in range(f)
    ]
    return jnp.stack(outs, axis=-1)  # (M, f)


def _row_gather_select_fwd(table_l, rows, slot, f):
    # dtype/shape carrier: an empty lane slice keeps residuals as JAX types
    # while preserving the static row count and dtype
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return _row_gather_select(table_l, rows, slot, f), (proto, rows, slot)


def _row_gather_select_bwd(f, res, g):
    proto, rows, slot = res
    s, lanes, dtype = proto.shape[0], 128, proto.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    # g: (M, f) -> expand to (M, 128) rows with the gradient in the entry's
    # lanes. Static select per feature (a lane-wise take_along_axis here
    # crashes XLA's TPU fusion emitter: GatherType != kSublaneGather).
    in_entry = entry_of_lane == slot[:, None]
    masked = jnp.zeros((g.shape[0], 128), jnp.float32)
    for i in range(f):
        masked = jnp.where(in_entry & (feat_of_lane == i), g[:, i : i + 1], masked)
    dtab = jnp.zeros((s, lanes), jnp.float32).at[rows].add(masked)
    return dtab.astype(dtype), None, None


_row_gather_select.defvjp(_row_gather_select_fwd, _row_gather_select_bwd)


# corner index c = (dx<<2)|(dy<<1)|dz; the two bit-parity classes each form a
# tetrahedron spanning the cell
_EVEN_CORNERS = (0, 3, 5, 6)
_ODD_CORNERS = (1, 2, 4, 7)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _row_gather_select_cs(table_l, rows, slot, coin, f):
    """``_row_gather_select`` with a corner-subsampled backward.

    rows/slot are (8n,) corner-major; coin is (n,) bool. Forward is the
    identical row gather; backward scatters only ONE parity tetrahedron
    (4 of 8 corners) per sample, chosen by ``coin``, with a 2x compensation —
    an unbiased gradient estimator at half the scatter cost (scatter-add is
    issue-bound at ~8 ns/row on v5e; see PERF.md)."""
    return _row_gather_select(table_l, rows, slot, f)


def _row_gather_select_cs_fwd(table_l, rows, slot, coin, f):
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return _row_gather_select(table_l, rows, slot, f), (proto, rows, slot, coin)


def _row_gather_select_cs_bwd(f, res, g):
    proto, rows, slot, coin = res
    s, dtype = proto.shape[0], proto.dtype
    n = coin.shape[0]
    rows8 = rows.reshape(8, n)
    slot8 = slot.reshape(8, n)
    g8 = g.reshape(8, n, f)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    rows_parts, masked_parts = [], []
    for e_c, o_c in zip(_EVEN_CORNERS, _ODD_CORNERS):
        r_j = jnp.where(coin, rows8[o_c], rows8[e_c])
        s_j = jnp.where(coin, slot8[o_c], slot8[e_c])
        g_j = jnp.where(coin[:, None], g8[o_c], g8[e_c]) * 2.0
        in_entry = entry_of_lane == s_j[:, None]
        masked = jnp.zeros((n, 128), jnp.float32)
        for i in range(f):
            masked = jnp.where(in_entry & (feat_of_lane == i), g_j[:, i : i + 1], masked)
        rows_parts.append(r_j)
        masked_parts.append(masked)
    dtab = (
        jnp.zeros((s, 128), jnp.float32)
        .at[jnp.concatenate(rows_parts)]
        .add(jnp.concatenate(masked_parts))
    )
    return dtab.astype(dtype), None, None, None


_row_gather_select_cs.defvjp(_row_gather_select_cs_fwd, _row_gather_select_cs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _row_gather_select2(table_l, rows, slot0, slot1, f):
    """Gather TWO entries of the SAME row in one row gather.

    table_l: (S, 128); rows/slot0/slot1: (M,) int32, slot0/slot1 index two
    entries within row ``rows``. Returns (M, 2, f) float32 — the z-pair
    trick: z-adjacent grid cells share a 128-lane row, so one 512 B gather
    feeds both ends of the z-interpolation (half the accesses of the
    corner-per-gather path)."""
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    outs = []
    for slot in (slot0, slot1):
        sel = jnp.where(entry_of_lane == slot[:, None], vals, 0)
        outs.append(
            jnp.stack(
                [
                    jnp.sum(
                        jnp.where(feat_of_lane == i, sel, 0).astype(jnp.float32),
                        axis=-1,
                    )
                    for i in range(f)
                ],
                axis=-1,
            )
        )
    return jnp.stack(outs, axis=1)  # (M, 2, f)


def _row_gather_select2_fwd(table_l, rows, slot0, slot1, f):
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return _row_gather_select2(table_l, rows, slot0, slot1, f), (
        proto,
        rows,
        slot0,
        slot1,
    )


def _masked_rows(slot, g, f):
    """(M, f) grads -> (M, 128) rows with the grad in slot's lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    entry_of_lane = lane // f
    feat_of_lane = lane % f
    in_entry = entry_of_lane == slot[:, None]
    masked = jnp.zeros((g.shape[0], 128), jnp.float32)
    for i in range(f):
        masked = jnp.where(in_entry & (feat_of_lane == i), g[:, i : i + 1], masked)
    return masked


def _row_gather_select2_bwd(f, res, g):
    proto, rows, slot0, slot1 = res
    s, dtype = proto.shape[0], proto.dtype
    # both entries' grads land in ONE row scatter-add (same row)
    masked = _masked_rows(slot0, g[:, 0], f) + _masked_rows(slot1, g[:, 1], f)
    dtab = jnp.zeros((s, 128), jnp.float32).at[rows].add(masked)
    return dtab.astype(dtype), None, None, None


_row_gather_select2.defvjp(_row_gather_select2_fwd, _row_gather_select2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _row_gather_select2_cs(table_l, rows, slot0, slot1, coin, f):
    """``_row_gather_select2`` with an xy-corner-subsampled backward.

    rows/slots are (4n,) xy-combo-major (combo = dx*2+dy); coin is (n,)
    bool. Backward scatters one xy parity pair ({(0,0),(1,1)} or
    {(0,1),(1,0)}) per sample with 2x compensation — the bilinear analog of
    the parity-tetrahedron estimator: unbiased, half the scatter rows."""
    return _row_gather_select2(table_l, rows, slot0, slot1, f)


def _row_gather_select2_cs_fwd(table_l, rows, slot0, slot1, coin, f):
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)
    return _row_gather_select2(table_l, rows, slot0, slot1, f), (
        proto,
        rows,
        slot0,
        slot1,
        coin,
    )


# xy combos (dx*2+dy): parity classes spanning the cell diagonally
_EVEN_XY = (0, 3)  # (0,0), (1,1)
_ODD_XY = (1, 2)  # (0,1), (1,0)


def _row_gather_select2_cs_bwd(f, res, g):
    proto, rows, slot0, slot1, coin = res
    s, dtype = proto.shape[0], proto.dtype
    n = coin.shape[0]
    rows4 = rows.reshape(4, n)
    s04 = slot0.reshape(4, n)
    s14 = slot1.reshape(4, n)
    g4 = g.reshape(4, n, 2, f)
    rows_parts, masked_parts = [], []
    for e_c, o_c in zip(_EVEN_XY, _ODD_XY):
        r_j = jnp.where(coin, rows4[o_c], rows4[e_c])
        s0_j = jnp.where(coin, s04[o_c], s04[e_c])
        s1_j = jnp.where(coin, s14[o_c], s14[e_c])
        g_j = jnp.where(coin[:, None, None], g4[o_c], g4[e_c]) * 2.0
        masked = _masked_rows(s0_j, g_j[:, 0], f) + _masked_rows(s1_j, g_j[:, 1], f)
        rows_parts.append(r_j)
        masked_parts.append(masked)
    dtab = (
        jnp.zeros((s, 128), jnp.float32)
        .at[jnp.concatenate(rows_parts)]
        .add(jnp.concatenate(masked_parts))
    )
    return dtab.astype(dtype), None, None, None, None


_row_gather_select2_cs.defvjp(_row_gather_select2_cs_fwd, _row_gather_select2_cs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _row_gather_block(table_l, rows, slot, f):
    """Gather a full 2x2x2 vertex BLOCK (8 corners x f features = 8f lanes)
    in ONE row gather.

    Block layout: entry unit = one vertex block of 8f lanes, ``blocks_per_row
    = 128 // (8 f)``; lane = block_offset*8f + corner*f + feat with corner =
    (px<<2)|(py<<1)|pz over local vertex parities. table_l: (S, 128);
    rows/slot: (M,) int32 (slot = block offset within the row). Returns
    (M, 8, f) float32 — a trilerp's WHOLE stencil from a single 512 B
    contiguous access (vs 8 row gathers corner-per-gather), with the full
    8-corner gradient landing in ONE row scatter-add on the backward."""
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    blk_of_lane = lane // (8 * f)
    corner_of_lane = (lane % (8 * f)) // f
    feat_of_lane = lane % f
    sel = jnp.where(blk_of_lane == slot[:, None], vals, 0)  # (M, 128) bf16
    outs = []
    for c in range(8):
        outs.append(
            jnp.stack(
                [
                    jnp.sum(
                        jnp.where(
                            (corner_of_lane == c) & (feat_of_lane == i), sel, 0
                        ).astype(jnp.float32),
                        axis=-1,
                    )
                    for i in range(f)
                ],
                axis=-1,
            )
        )
    return jnp.stack(outs, axis=1)  # (M, 8, f)


def _row_gather_block_fwd(table_l, rows, slot, f):
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return _row_gather_block(table_l, rows, slot, f), (proto, rows, slot)


def _row_gather_block_bwd(f, res, g):
    proto, rows, slot = res
    s, dtype = proto.shape[0], proto.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    blk_of_lane = lane // (8 * f)
    corner_of_lane = (lane % (8 * f)) // f
    feat_of_lane = lane % f
    in_blk = blk_of_lane == slot[:, None]
    # g: (M, 8, f) -> one (M, 128) masked row carrying ALL 8 corner grads
    masked = jnp.zeros((g.shape[0], 128), jnp.float32)
    for c in range(8):
        for i in range(f):
            masked = jnp.where(
                in_blk & (corner_of_lane == c) & (feat_of_lane == i),
                g[:, c, i : i + 1],
                masked,
            )
    dtab = jnp.zeros((s, 128), jnp.float32).at[rows].add(masked)
    return dtab.astype(dtype), None, None


_row_gather_block.defvjp(_row_gather_block_fwd, _row_gather_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _row_gather_block_tw(table_l, rows, slot, w8, f):
    """Trilerp-WEIGHTED block gather: one row gather -> (M, f) features.

    Same block layout as :func:`_row_gather_block`, but the 8 corner weights
    ``w8`` (M, 8) are applied INSIDE the op, so the whole trilerp collapses
    to a single fused pass (gather + weighted lane-reduce). This avoids ever
    materializing the (M, 8, f) per-corner intermediate in HBM — round-2
    profiling showed the outer weights-multiply autodiff and the 32 masked
    per-corner reductions cost ~2x the gather itself (25+ ms/step of
    convert_reduce fusions on 262k samples).

    Backward: d_table = ONE row scatter-add of the weight-masked gradient
    row; d_w8 = one re-gather pass with 8 masked reductions (needed for pose
    gradients through the trilerp weights, e.g. camera-opt). rows/slot get
    no gradient.
    """
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    wv = _weighted_lanes(vals.astype(jnp.float32), w8, slot, f)
    # lane reduce on the MXU: one (M,128)@(128,f) matmul instead of f masked
    # reduction passes (each of which re-reads the (M,128) rows from HBM).
    # f32 operands: quantizing w*v to bf16 would break exact-path equality
    # (the tables are bf16-quantized identically on every path; the weighted
    # accumulation must stay f32).
    return jnp.dot(
        wv, _proj_feat(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _lane_splits(f):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    return lane // (8 * f), (lane % (8 * f)) // f, lane % f


def _weighted_lanes(x_lane, w8, slot, f):
    """x_lane (M,128) scaled by the corner weight of each lane, masked to the
    sample's block: out[m, lane] = x[m, lane] * w8[m, corner(lane)] *
    (blk(lane) == slot[m]).

    The multiplicand lives INSIDE the corner selects on purpose: a standalone
    (M,128) weight-lane mask gets CSE'd between the forward product and the
    backward scatter mask, and XLA then materializes it to HBM (measured
    6.5 ms/step of compare_select fusions). Keeping the product inside makes
    the expressions structurally different, so each fuses into its consumer.
    """
    blk_of_lane, corner_of_lane, _ = _lane_splits(f)
    acc = jnp.zeros_like(x_lane)
    for c in range(8):
        acc = acc + jnp.where(corner_of_lane == c, w8[:, c : c + 1] * x_lane, 0.0)
    return jnp.where(blk_of_lane == slot[:, None], acc, 0.0)


@functools.lru_cache(maxsize=None)
def _proj_feat_np(f):
    """(128, f) one-hot: lane -> feature column (numpy constant; a cached
    jnp array would leak tracers across jit scopes)."""
    lane = np.arange(128)
    return np.asarray((lane % f).reshape(128, 1) == np.arange(f).reshape(1, f))


def _proj_feat(f):
    return jnp.asarray(_proj_feat_np(f), jnp.bfloat16)


@functools.lru_cache(maxsize=None)
def _proj_corner_np(f):
    """(128, 8) one-hot: lane -> corner column."""
    lane = np.arange(128)
    corner = (lane % (8 * f)) // f
    return np.asarray(corner.reshape(128, 1) == np.arange(8).reshape(1, 8))


def _proj_corner(f):
    return jnp.asarray(_proj_corner_np(f), jnp.bfloat16)


def _row_gather_block_tw_fwd(table_l, rows, slot, w8, f):
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    wv = _weighted_lanes(vals.astype(jnp.float32), w8, slot, f)
    out = jnp.dot(
        wv, _proj_feat(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )
    # save the gathered rows (bf16) — cheaper than re-gathering in bwd;
    # proto carries the table's static shape/dtype as an empty JAX array
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return out, (vals, rows, slot, w8, proto)


def _row_gather_block_tw_bwd(f, res, g):
    vals, rows, slot, w8, proto = res
    s, tab_dtype = proto.shape[0], proto.dtype
    blk_of_lane, _, _ = _lane_splits(f)
    in_blk = blk_of_lane == slot[:, None]
    # g broadcast to lanes via the transposed feature projection (MXU)
    g_lane = jnp.dot(
        g, _proj_feat(f).T.astype(jnp.float32), preferred_element_type=jnp.float32
    )  # (M, 128)
    # d_table: weight-masked gradient row, ONE scatter-add
    dtab = (
        jnp.zeros((s, 128), jnp.float32)
        .at[rows]
        .add(_weighted_lanes(g_lane, w8, slot, f))
    )
    # d_w8[m, c] = sum_i g[m, i] * entry[m, c, i] — one masked product + a
    # (M,128)@(128,8) matmul (pose gradients through the trilerp weights)
    gv = jnp.where(in_blk, g_lane * vals.astype(jnp.float32), 0.0)
    dw8 = jnp.dot(
        gv, _proj_corner(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return dtab.astype(tab_dtype), None, None, dw8


_row_gather_block_tw.defvjp(_row_gather_block_tw_fwd, _row_gather_block_tw_bwd)


# Row-count threshold below which the one-hot matmul backward beats the
# unsorted row scatter-add (measured on v5e @ M=262k rays*samples:
# scatter 2.1 ms/level flat; one-hot 0.53/0.60/1.4/2.2 ms at S_eff
# 183/729/3042/4913 — exp/onehot_bench.py). Coarse DENSE levels have few
# occupied rows and huge duplication, i.e. the scatter is really a dense
# reduction — which is MXU work, not serial scatter work.
_ONEHOT_BWD_MAX_ROWS = int(os.environ.get("NST_ONEHOT_BWD_MAX_ROWS", "2048"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _row_gather_block_tw_oh(table_l, rows, slot, w8, f, s_eff):
    """_row_gather_block_tw with a ONE-HOT MATMUL table backward.

    Identical forward; for levels whose occupied row extent ``s_eff`` is
    static and small (dense-block coarse levels), d_table is computed as
    ``onehot(rows, s_eff)^T @ masked_grad`` on the MXU instead of a serial
    row scatter-add — 3.5x faster at the bench shapes. Gradients round
    through bf16 once (the one-hot operand and the masked grad row); the
    8-corner accumulation happens in f32 inside the MXU."""
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    wv = _weighted_lanes(vals.astype(jnp.float32), w8, slot, f)
    return jnp.dot(
        wv, _proj_feat(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _row_gather_block_tw_oh_fwd(table_l, rows, slot, w8, f, s_eff):
    out, res = _row_gather_block_tw_fwd(table_l, rows, slot, w8, f)
    return out, res


def _row_gather_block_tw_oh_bwd(f, s_eff, res, g):
    vals, rows, slot, w8, proto = res
    s, tab_dtype = proto.shape[0], proto.dtype
    blk_of_lane, _, _ = _lane_splits(f)
    in_blk = blk_of_lane == slot[:, None]
    g_lane = jnp.dot(
        g, _proj_feat(f).T.astype(jnp.float32), preferred_element_type=jnp.float32
    )  # (M, 128)
    masked = _weighted_lanes(g_lane, w8, slot, f)  # (M, 128)
    onehot = (
        rows[:, None] == jax.lax.broadcasted_iota(rows.dtype, (1, s_eff), 1)
    ).astype(jnp.bfloat16)  # (M, s_eff)
    dtab_head = jnp.dot(
        onehot.T, masked.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )  # (s_eff, 128)
    dtab = jnp.zeros((s, 128), jnp.float32)
    dtab = jax.lax.dynamic_update_slice(dtab, dtab_head, (0, 0))
    gv = jnp.where(in_blk, g_lane * vals.astype(jnp.float32), 0.0)
    dw8 = jnp.dot(
        gv, _proj_corner(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return dtab.astype(tab_dtype), None, None, dw8


_row_gather_block_tw_oh.defvjp(_row_gather_block_tw_oh_fwd, _row_gather_block_tw_oh_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _grad_scale(x, c: float):
    """Identity forward; backward multiplies the cotangent by the static
    ``c``. Used by the level-subsampled backward to keep the expected table
    gradient unbiased (active levels carry x(cycle period))."""
    return x


def _grad_scale_fwd(x, c):
    return x, None


def _grad_scale_bwd(c, _, g):
    return (g * c,)


_grad_scale.defvjp(_grad_scale_fwd, _grad_scale_bwd)


def _block_level_rows_used(res: int, hash_table_size: int, f: int):
    """Static occupied-row extent of a DENSE block level, or None if hashed
    (hashed levels spread over the whole table)."""
    side = res + 1
    bs = (side + 1) // 2
    if bs**3 * 8 > hash_table_size:
        return None
    bpr = (128 // f) // 8
    return -(-(bs**3) // bpr)  # ceil


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _row_gather_block_mm(table_l, rows, slot, w8, A, f):
    """Block gather + trilerp + FIRST MLP LAYER in one op: (M, H).

    ``A`` is the (128, H) first-layer weight pre-projected per level
    (``A = P_level @ W1`` where P_level embeds this level's F features into
    the MLP input window). Keeping the matmul inside means the per-level
    (M, F) feature arrays — whose transposed {0,1} layouts forced XLA into
    ~50 GB/s strided passes — never exist: activations stay {1,0}
    sublane-major from the gather through the MLP. This is the TPU answer to
    tcnn's NetworkWithInputEncoding (reference
    field_components/mlp.py:252-269).

    Backward: d_wv = g @ A^T (one matmul), d_table = one weight-masked row
    scatter-add, d_w8 via the corner projection, dA = wv^T @ g (wv recomputed
    elementwise from the saved gathered rows).
    """
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    wv = _weighted_lanes(vals.astype(jnp.float32), w8, slot, f).astype(jnp.bfloat16)
    return jnp.dot(wv, A.astype(jnp.bfloat16), preferred_element_type=jnp.float32)


def _row_gather_block_mm_fwd(table_l, rows, slot, w8, A, f):
    vals = table_l.astype(jnp.bfloat16)[rows]  # (M, 128)
    wv = _weighted_lanes(vals.astype(jnp.float32), w8, slot, f).astype(jnp.bfloat16)
    out = jnp.dot(wv, A.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    proto = jax.lax.slice_in_dim(table_l, 0, 0, axis=1)  # (S, 0)
    return out, (vals, rows, slot, w8, A, proto)


def _row_gather_block_mm_bwd(f, res, g):
    vals, rows, slot, w8, A, proto = res
    s, tab_dtype = proto.shape[0], proto.dtype
    blk_of_lane, _, _ = _lane_splits(f)
    in_blk = blk_of_lane == slot[:, None]
    g16 = g.astype(jnp.bfloat16)
    d_wv = jnp.dot(
        g16, A.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
    )  # (M, 128)
    dtab = (
        jnp.zeros((s, 128), jnp.float32)
        .at[rows]
        .add(_weighted_lanes(d_wv, w8, slot, f))
    )
    valsf = vals.astype(jnp.float32)
    gv = jnp.where(in_blk, d_wv * valsf, 0.0)
    dw8 = jnp.dot(
        gv, _proj_corner(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )
    wv = _weighted_lanes(valsf, w8, slot, f).astype(jnp.bfloat16)
    dA = jnp.dot(wv.T, g16, preferred_element_type=jnp.float32).astype(A.dtype)
    return dtab.astype(tab_dtype), None, None, dw8, dA


_row_gather_block_mm.defvjp(_row_gather_block_mm_fwd, _row_gather_block_mm_bwd)


def block_level_geometry(
    positions: jnp.ndarray,
    *,
    num_levels: int,
    min_res: int,
    max_res: int,
    hash_table_size: int,
    features_per_level: int,
):
    """Per-level (rows, slot, w8) for the block-packed TRAIN layout.

    positions: (n, 3) in [0,1]. Returns a list of ``num_levels`` tuples
    ``(rows (n,), slot (n,), w8 (n, 8))`` using the stochastic odd-axis
    rounding of the block layout (single source of truth shared by
    ``hash_encode(block=True)`` and the fused hash+MLP path).
    """
    epr = 128 // features_per_level
    assert hash_table_size % 8 == 0 and epr % 8 == 0
    bpr = epr // 8
    nblocks = hash_table_size // 8
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    resolutions = compute_level_resolutions(num_levels, min_res, max_res)
    prime_pairs = (
        (0x85EBCA6B, 0x9E3779B1),
        (0xC2B2AE35, 0x27D4EB2F),
        (0x165667B1, 0xD3A2646C),
    )
    out = []
    for l in range(num_levels):
        res = int(resolutions[l])
        side = res + 1
        bs = (side + 1) // 2  # dense blocks per axis
        dense_b = bs**3 * 8 <= hash_table_size
        sx, sy, sz = x * res, y * res, z * res
        ix0b = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, res - 1)
        iy0b = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, res - 1)
        iz0b = jnp.clip(jnp.floor(sz).astype(jnp.int32), 0, res - 1)
        oxb = jnp.clip(sx - ix0b, 0.0, 1.0)
        oyb = jnp.clip(sy - iy0b, 0.0, 1.0)
        ozb = jnp.clip(sz - iz0b, 0.0, 1.0)
        bcoords, pweights = [], []
        for i0, o, (p1, p2) in zip((ix0b, iy0b, iz0b), (oxb, oyb, ozb), prime_pairs):
            odd = (i0 & 1) == 1
            up = _u01_hash(o, p1, p2) < o
            # representative vertex: stochastic choice on odd axes (its
            # block holds the chosen vertex); base vertex on even axes
            rep = i0 + jnp.where(odd & up, 1, 0)
            bcoords.append(rep >> 1)
            upf = up.astype(jnp.float32)
            # weight on corner parity 0 / parity 1 within the block:
            # even axis -> exact lerp (i0 has parity 0); odd axis ->
            # all weight on the chosen vertex's parity (up -> even=p0)
            w_p0 = jnp.where(odd, upf, 1.0 - o)
            w_p1 = jnp.where(odd, 1.0 - upf, o)
            pweights.append((w_p0, w_p1))
        bx, by, bz = bcoords
        if dense_b:
            blk = (bx * bs + by) * bs + bz
        else:
            blk = _hash_corner(bx, by, bz, nblocks)
        (wx0, wx1), (wy0, wy1), (wz0, wz1) = pweights
        w8 = jnp.stack(
            [
                (wx1 if (c >> 2) & 1 else wx0)
                * (wy1 if (c >> 1) & 1 else wy0)
                * (wz1 if c & 1 else wz0)
                for c in range(8)
            ],
            axis=-1,
        )  # (n, 8)
        out.append((blk // bpr, blk % bpr, w8))
    return out


@functools.lru_cache(maxsize=None)
def _proj_level_np(f, num_levels, level):
    """(128, num_levels*f) one-hot embedding of this level's feature lanes
    into its column window of the MLP input."""
    lane = np.arange(128)
    E = np.zeros((128, num_levels * f), np.float32)
    for i in range(f):
        E[lane % f == i, level * f + i] = 1.0
    return E


def _block_exact_trilerp(
    table_l, ix0, iy0, iz0, ox, oy, oz, *, bs, dense_b, nblocks, bpr, f
):
    """Exact 8-corner trilerp through the block layout (eval/render path).

    One row gather + one parity-masked multiply per corner, accumulated into
    a single (M, 128) weighted-lane buffer, then ONE MXU lane-reduce
    ``(M,128)@(128,f)``. Differentiable by JAX autodiff (gather -> scatter-add)
    — the train path uses the cheaper stochastic one-gather op instead."""
    blk_of_lane, corner_of_lane, _ = _lane_splits(f)
    tab_bf = table_l.astype(jnp.bfloat16)
    wv = None
    for corner in range(8):
        dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
        vx, vy, vz = ix0 + dx, iy0 + dy, iz0 + dz
        if dense_b:
            blk = ((vx >> 1) * bs + (vy >> 1)) * bs + (vz >> 1)
        else:
            blk = _hash_corner(vx >> 1, vy >> 1, vz >> 1, nblocks)
        parity = (vx & 1) << 2 | (vy & 1) << 1 | (vz & 1)
        w_c = (
            (ox if dx else 1.0 - ox)
            * (oy if dy else 1.0 - oy)
            * (oz if dz else 1.0 - oz)
        )
        vals = tab_bf[blk // bpr]  # (M, 128)
        mask = (blk_of_lane == (blk % bpr)[:, None]) & (
            corner_of_lane == parity[:, None]
        )
        part = jnp.where(mask, w_c[:, None] * vals.astype(jnp.float32), 0.0)
        wv = part if wv is None else wv + part
    return jnp.dot(
        wv, _proj_feat(f).astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _hash_corner(cx, cy, cz, hash_table_size):
    cu_x = cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    cu_y = cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
    cu_z = cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    return ((cu_x ^ cu_y ^ cu_z) % jnp.uint32(hash_table_size)).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_levels",
        "min_res",
        "max_res",
        "hash_table_size",
        "bwd_corner_sample",
        "stochastic_corner",
        "z_pair",
        "block",
        "block_exact",
        "bwd_levels",
        "bwd_scale",
    ),
)
def hash_encode(
    positions: jnp.ndarray,
    table: jnp.ndarray,
    *,
    num_levels: int,
    min_res: int,
    max_res: int,
    hash_table_size: int,
    bwd_corner_sample: bool = False,
    stochastic_corner: bool = False,
    z_pair: bool = False,
    block: bool = False,
    block_exact: bool = False,
    bwd_levels: Optional[Tuple[int, ...]] = None,
    bwd_scale: float = 1.0,
) -> jnp.ndarray:
    """Encode positions in [0,1]^3.

    positions: (..., 3); table: (num_levels, S, 128) row-packed
    (see init_hash_table). Returns (..., num_levels * F) float32, channel
    order out[..., l*F + f] (matches tcnn/reference).

    ``bwd_levels`` (block train path only): STATIC tuple of level indices
    that receive table gradients this step; the rest run a gradient-free
    forward (``stop_gradient`` on their table slice, so XLA dead-code-
    eliminates their backward scatter entirely — the scatter is the train
    step's dominant serial cost, PERF.md). Active levels' table grads are
    scaled by the static ``bwd_scale`` (= the round-robin cycle period) so
    the EXPECTED gradient over a cycle is unbiased — the same
    sparser-but-larger-Adam-updates regime as the corner-subsampled backward
    (PERF.md round-2). Trilerp-weight (pose) gradients stay exact on every
    level."""
    L, S, lanes = table.shape
    assert L == num_levels and lanes == 128
    # recover F from S: S = T // (128 // F)  =>  F = 128 * S // T
    features_per_level = 128 * S // hash_table_size
    epr = 128 // features_per_level

    batch_shape = positions.shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    pos = positions.reshape(n, 3)
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]

    resolutions = compute_level_resolutions(num_levels, min_res, max_res)

    if block and not block_exact:
        # train path: one row gather per trilerp via the shared geometry
        # (also used by the fused hash+MLP first-layer path in mlp.py)
        geom = block_level_geometry(
            pos,
            num_levels=num_levels,
            min_res=min_res,
            max_res=max_res,
            hash_table_size=hash_table_size,
            features_per_level=features_per_level,
        )
        F = features_per_level
        out = None
        resolutions_b = compute_level_resolutions(num_levels, min_res, max_res)
        for l, (rows, slot, w8) in enumerate(geom):
            tab_l = table[l]
            if bwd_levels is not None:
                if l in bwd_levels:
                    tab_l = _grad_scale(tab_l, float(bwd_scale))
                else:
                    # gradient-free forward: the level's backward scatter is
                    # statically dead and XLA eliminates it (w8/pose grads
                    # still flow through the op's dw8 path)
                    tab_l = jax.lax.stop_gradient(tab_l)
            s_eff = _block_level_rows_used(int(resolutions_b[l]), hash_table_size, F)
            if s_eff is not None and s_eff <= _ONEHOT_BWD_MAX_ROWS:
                feats = _row_gather_block_tw_oh(tab_l, rows, slot, w8, F, s_eff)
            else:
                feats = _row_gather_block_tw(tab_l, rows, slot, w8, F)
            part = jax.lax.pad(
                feats, jnp.zeros((), feats.dtype), [(0, 0, 0), (l * F, (L - 1 - l) * F, 0)]
            )
            out = part if out is None else out + part
        return out.reshape(batch_shape + (num_levels * F,))

    level_outputs = []
    for l in range(L):
        res = int(resolutions[l])
        side = res + 1
        dense = side**3 <= hash_table_size
        sx, sy, sz = x * res, y * res, z * res
        fx, fy, fz = jnp.floor(sx), jnp.floor(sy), jnp.floor(sz)
        ox, oy, oz = sx - fx, sy - fy, sz - fz
        ix0 = fx.astype(jnp.int32)
        iy0 = fy.astype(jnp.int32)
        iz0 = fz.astype(jnp.int32)

        if block or block_exact:
            # --- block-packed layout: vertex v lives in 2x2x2 block v>>1,
            # entry = blk*8 + ((vx&1)<<2 | (vy&1)<<1 | (vz&1)). One trilerp
            # stencil fits a single block whenever the base cell is even on
            # every axis; odd axes are handled by unbiased stochastic
            # rounding (prob = fractional offset), reducing the whole
            # trilerp to ONE row gather per sample/level. ``block_exact``
            # (eval/render) instead gathers all 8 corners exactly through
            # the same layout (no stochastic noise in rendered images).
            assert hash_table_size % 8 == 0 and epr % 8 == 0
            bpr = epr // 8  # blocks per row
            nblocks = hash_table_size // 8
            bs = (side + 1) // 2  # dense blocks per axis
            dense_b = bs**3 * 8 <= hash_table_size
            # clip the BASE CELL so every stencil vertex is in [0, side-1]
            ix0b = jnp.clip(ix0, 0, res - 1)
            iy0b = jnp.clip(iy0, 0, res - 1)
            iz0b = jnp.clip(iz0, 0, res - 1)
            oxb = jnp.clip(sx - ix0b, 0.0, 1.0)
            oyb = jnp.clip(sy - iy0b, 0.0, 1.0)
            ozb = jnp.clip(sz - iz0b, 0.0, 1.0)

            if block_exact:
                # Exact 8-corner trilerp through the block layout: 8 row
                # gathers, ONE parity-masked multiply per corner (the corner
                # parities are a bijection, parity = base_parity ^ corner),
                # and ONE MXU lane-reduce for the whole stencil. The previous
                # version routed each corner through _row_gather_block_tw,
                # whose 8-pass _weighted_lanes ran 64 masked passes + 8 dots
                # per level — measured 59% of the eval chunk
                # (exp/eval_profile.py r3).
                acc = _block_exact_trilerp(
                    table[l], ix0b, iy0b, iz0b, oxb, oyb, ozb,
                    bs=bs, dense_b=dense_b, nblocks=nblocks, bpr=bpr,
                    f=features_per_level,
                )
                level_outputs.append(acc)
                continue

            raise AssertionError("block train path handled above")  # unreachable

        if stochastic_corner:
            # one-corner unbiased trilerp: round each axis up with
            # probability equal to its fractional offset (corner c is chosen
            # with exactly its trilerp weight w_c). 1/8 the gather+scatter
            # accesses; noisy but unbiased — for density fields whose output
            # only GUIDES sampling (proposal nets), not the rendered image.
            # Uniform variates from the offsets' mantissa bits, decorrelated
            # from the table hash and from the bwd corner coin.
            def _u01(o, p1, p2):
                b = jax.lax.bitcast_convert_type(o, jnp.uint32)
                h = (b * jnp.uint32(p1)) ^ ((b >> 7) * jnp.uint32(p2))
                return (h >> 8).astype(jnp.float32) * (1.0 / 16777216.0)

            up_x = _u01(ox, 0x9E3779B1, 0x85EBCA6B) < ox
            up_y = _u01(oy, 0xC2B2AE35, 0x27D4EB2F) < oy
            up_z = _u01(oz, 0x165667B1, 0xD3A2646C) < oz
            cx = ix0 + up_x.astype(jnp.int32)
            cy = iy0 + up_y.astype(jnp.int32)
            cz = iz0 + up_z.astype(jnp.int32)
            if dense:
                cxc = jnp.clip(cx, 0, side - 1)
                cyc = jnp.clip(cy, 0, side - 1)
                czc = jnp.clip(cz, 0, side - 1)
                idx = (cxc * side + cyc) * side + czc
            else:
                idx = _hash_corner(cx, cy, cz, hash_table_size)
            feats = _row_gather_select(
                table[l], idx // epr, idx % epr, features_per_level
            )  # (n, F)
            level_outputs.append(feats)
            continue

        if z_pair:
            # --- z-pair packed trilerp: 4 row gathers per sample/level ---
            # Hashed levels hash the z-BLOCK (z>>3) and index entry
            # block*8 + (z&7); dense levels are z-contiguous natively. The
            # two z corners of a sample then share one 128-lane row except
            # at block (12.5%) / row (dense, 1/epr) boundaries, where an
            # unbiased stochastic z-rounding picks one corner (value is
            # exact in expectation; those samples lose only the z-position
            # gradient). Halves gather AND scatter accesses vs the
            # corner-per-gather path.
            assert hash_table_size % 8 == 0 and epr % 8 == 0
            cz0, cz1 = iz0, iz0 + 1
            # one stochastic-z coin per sample (shared across xy combos)
            _b = jax.lax.bitcast_convert_type(oz, jnp.uint32)
            _h = (_b * jnp.uint32(0x9E3779B1)) ^ ((_b >> 9) * jnp.uint32(0x27D4EB2F))
            up_z = ((_h >> 8).astype(jnp.float32) * (1.0 / 16777216.0)) < oz
            rows_parts, s0_parts, s1_parts = [], [], []
            wz0_parts, wz1_parts, wxy_parts = [], [], []
            for combo in range(4):
                dx, dy = (combo >> 1) & 1, combo & 1
                cx, cy = ix0 + dx, iy0 + dy
                if dense:
                    cxc = jnp.clip(cx, 0, side - 1)
                    cyc = jnp.clip(cy, 0, side - 1)
                    cz0c = jnp.clip(cz0, 0, side - 1)
                    cz1c = jnp.clip(cz1, 0, side - 1)
                    base = (cxc * side + cyc) * side
                    idx0 = base + cz0c
                    idx1 = base + cz1c
                else:
                    zb0, zo0 = cz0 >> 3, cz0 & 7
                    blk0 = _hash_corner(cx, cy, zb0, hash_table_size // 8)
                    blk1 = _hash_corner(cx, cy, zb0 + 1, hash_table_size // 8)
                    idx0 = blk0 * 8 + zo0
                    idx1 = jnp.where(zo0 != 7, idx0 + 1, blk1 * 8)
                same_row = (idx1 // epr) == (idx0 // epr)
                idx_sel = jnp.where(up_z, idx1, idx0)
                rows_parts.append(jnp.where(same_row, idx0 // epr, idx_sel // epr))
                s0_parts.append(jnp.where(same_row, idx0 % epr, idx_sel % epr))
                s1_parts.append(jnp.where(same_row, idx1 % epr, idx_sel % epr))
                wz0_parts.append(jnp.where(same_row, 1.0 - oz, 1.0))
                wz1_parts.append(jnp.where(same_row, oz, 0.0))
                wxy_parts.append(
                    (ox if dx else 1.0 - ox) * (oy if dy else 1.0 - oy)
                )
            rows4 = jnp.concatenate(rows_parts)
            s04 = jnp.concatenate(s0_parts)
            s14 = jnp.concatenate(s1_parts)
            if bwd_corner_sample:
                u = jax.lax.bitcast_convert_type(ox, jnp.uint32) * jnp.uint32(0x85EBCA6B)
                v = jax.lax.bitcast_convert_type(oy, jnp.uint32) * jnp.uint32(0xC2B2AE35)
                t = jax.lax.bitcast_convert_type(oz, jnp.uint32) * jnp.uint32(0x27D4EB2F)
                coin = (((u ^ v ^ t) >> 13) & jnp.uint32(1)).astype(bool)
                feats2 = _row_gather_select2_cs(
                    table[l], rows4, s04, s14, coin, features_per_level
                )  # (4n, 2, F)
            else:
                feats2 = _row_gather_select2(
                    table[l], rows4, s04, s14, features_per_level
                )
            acc = None
            for combo in range(4):
                f0 = feats2[combo * n : (combo + 1) * n, 0]
                f1 = feats2[combo * n : (combo + 1) * n, 1]
                part = wxy_parts[combo][:, None] * (
                    f0 * wz0_parts[combo][:, None] + f1 * wz1_parts[combo][:, None]
                )
                acc = part if acc is None else acc + part
            level_outputs.append(acc)  # (n, F)
            continue

        idx_parts, w_parts = [], []
        for corner in range(8):
            dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
            cx, cy, cz = ix0 + dx, iy0 + dy, iz0 + dz
            if dense:
                cxc = jnp.clip(cx, 0, side - 1)
                cyc = jnp.clip(cy, 0, side - 1)
                czc = jnp.clip(cz, 0, side - 1)
                idx = (cxc * side + cyc) * side + czc
            else:
                idx = _hash_corner(cx, cy, cz, hash_table_size)
            idx_parts.append(idx)
            w = (
                (ox if dx else 1.0 - ox)
                * (oy if dy else 1.0 - oy)
                * (oz if dz else 1.0 - oz)
            )
            w_parts.append(w)

        idx8 = jnp.concatenate(idx_parts)  # (8n,) corner-major
        w8 = jnp.concatenate(w_parts)  # (8n,)
        if bwd_corner_sample:
            # per-sample coin from the fractional offsets' mantissa bits
            # (different primes than the table hash — decorrelated from entry
            # identity; varies per sample and per step via the random rays)
            u = jax.lax.bitcast_convert_type(ox, jnp.uint32) * jnp.uint32(0x85EBCA6B)
            v = jax.lax.bitcast_convert_type(oy, jnp.uint32) * jnp.uint32(0xC2B2AE35)
            t = jax.lax.bitcast_convert_type(oz, jnp.uint32) * jnp.uint32(0x27D4EB2F)
            coin = (((u ^ v ^ t) >> 13) & jnp.uint32(1)).astype(bool)
            feats = _row_gather_select_cs(
                table[l], idx8 // epr, idx8 % epr, coin, features_per_level
            )  # (8n, F)
        else:
            feats = _row_gather_select(
                table[l], idx8 // epr, idx8 % epr, features_per_level
            )  # (8n, F)
        weighted = feats * w8[:, None]
        acc = weighted[:n]
        for corner in range(1, 8):
            acc = acc + weighted[corner * n : (corner + 1) * n]
        level_outputs.append(acc)  # (n, F)

    # Assemble (n, L*F) WITHOUT stacking to (n, L, F): the stack lowers to
    # per-level dynamic-update-slices into a T(4,128)-tiled buffer (measured
    # ~15 ms/step across field+props at 8192 rays). Zero-padding each level
    # to its column window and summing fuses into one elementwise pass.
    F = features_per_level
    out = None
    for l, feats in enumerate(level_outputs):
        part = jax.lax.pad(
            feats, jnp.zeros((), feats.dtype), [(0, 0, 0), (l * F, (L - 1 - l) * F, 0)]
        )
        out = part if out is None else out + part
    return out.reshape(batch_shape + (num_levels * F,))


def init_hash_table(
    key: jax.Array,
    num_levels: int,
    hash_table_size: int,
    features_per_level: int,
    scale: float = 1e-4,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Uniform(-scale, scale) init (reference encodings.py:352-356).

    Returns the row-packed layout (L, S, 128) with
    S = hash_table_size // (128 // features_per_level)."""
    assert 128 % features_per_level == 0
    epr = 128 // features_per_level
    assert hash_table_size % epr == 0, (
        f"hash_table_size {hash_table_size} must be divisible by {epr}"
    )
    s = hash_table_size // epr
    return jax.random.uniform(
        key,
        (num_levels, s, 128),
        minval=-scale,
        maxval=scale,
        dtype=dtype,
    )
