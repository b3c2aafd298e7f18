"""Motion estimation: full-search integer SAD sweep + quarter-pel refine.

Capability parity with lencod/src/me_fullsearch.c (full_search_motion_
estimation via me_fullsearch.h:21-26) and the sub-pel stage of
me_epzs_sub.c — redesigned as batched tensor sweeps: ALL macroblocks'
search windows are evaluated together (the reference loops candidates
serially per block; SURVEY.md §2.5 TP axis).

Numpy reference implementation; jnp/Pallas twin in me_jax (bench path).
"""

from __future__ import annotations

import numpy as np

from ..ops import interp as P


def ue_len(v: int) -> int:
    return 2 * (v + 1).bit_length() - 1


def se_len(v: int) -> int:
    k = 2 * v - 1 if v > 0 else -2 * v
    return ue_len(k)


def mv_bits(mvd_x: int, mvd_y: int) -> int:
    return se_len(int(mvd_x)) + se_len(int(mvd_y))


_H4 = np.array([[1, 1, 1, 1],
                [1, 1, -1, -1],
                [1, -1, -1, 1],
                [1, -1, 1, -1]], np.int32)


def satd(diff: np.ndarray) -> int:
    """4x4 Hadamard SATD of a residual block (lencod/src/me_distortion.c
    HadamardSAD4x4:175): sum |H d H^T| >> 1, tiled over the block."""
    bh, bw = diff.shape
    d = diff.reshape(bh // 4, 4, bw // 4, 4).transpose(0, 2, 1, 3)
    t = np.einsum("ij,bcjk,lk->bcil", _H4, d.astype(np.int64), _H4)
    return int(np.abs(t).sum() >> 1)


# P8x8 sub-partition geometry: sub_mode -> [(sx, sy, sw, sh)] in 4x4 units
SUB_PARTS = {
    0: [(0, 0, 2, 2)],
    1: [(0, 0, 2, 1), (0, 1, 2, 1)],
    2: [(0, 0, 1, 2), (1, 0, 1, 2)],
    3: [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)],
}
# sub_mb_type header bits (ue) + per-part mvd overhead handled by caller
SUB_MODE_BITS = {0: 1, 1: 3, 2: 3, 3: 5}


def full_search_blk4_sads(orig: np.ndarray, ref_pad: np.ndarray,
                          mb_w: int, mb_h: int, sr: int,
                          pad: int) -> np.ndarray:
    """Integer-pel full-search SAD per 4x4 block, batched over all MBs.

    Returns (n_mbs, side*side, 16) int32: SAD of each 4x4 block (raster
    in MB) at each displacement (row-major (dy, dx)). Any partition's SAD
    is a sum of 4x4 SADs — the full BlockSAD table hierarchy of
    lencod/src/me_fullfast.c (setup_fast_full_search:269, which builds
    all 7 block-type tables from the 4x4 base) as one batched tensor.
    """
    H, W = orig.shape
    n = mb_w * mb_h
    side = 2 * sr + 1
    o = orig.reshape(mb_h, 4, 4, mb_w, 4, 4).transpose(0, 3, 1, 4, 2, 5) \
            .reshape(n, 16, 4, 4).astype(np.int32)   # (n, blk, 4, 4)
    costs = np.empty((n, side * side, 16), np.int32)
    for iy, dy in enumerate(range(-sr, sr + 1)):
        for ix, dx in enumerate(range(-sr, sr + 1)):
            sh = ref_pad[pad + dy: pad + dy + H, pad + dx: pad + dx + W]
            s = sh.reshape(mb_h, 4, 4, mb_w, 4, 4) \
                  .transpose(0, 3, 1, 4, 2, 5) \
                  .reshape(n, 16, 4, 4).astype(np.int32)
            costs[:, iy * side + ix] = np.abs(o - s).sum(axis=(2, 3))
    return costs


# 4x4 raster block ids per 8x8 quadrant
QUAD_BLKS = np.array([[0, 1, 4, 5], [2, 3, 6, 7],
                      [8, 9, 12, 13], [10, 11, 14, 15]], np.int32)


def full_search_quadrant_sads(orig: np.ndarray, ref_pad: np.ndarray,
                              mb_w: int, mb_h: int, sr: int,
                              pad: int) -> np.ndarray:
    """(n, side*side, 4) per-quadrant SADs (aggregated 4x4 table)."""
    b4 = full_search_blk4_sads(orig, ref_pad, mb_w, mb_h, sr, pad)
    return b4[:, :, QUAD_BLKS].sum(axis=3)


def best_int_mv(costs_part: np.ndarray, sr: int):
    """argmin over the displacement axis: (n, side*side) -> mvs (n, 2)."""
    side = 2 * sr + 1
    flat = np.argmin(costs_part, axis=1)
    mv = np.stack([flat % side - sr, flat // side - sr], axis=1).astype(np.int32)
    best = np.take_along_axis(costs_part, flat[:, None], axis=1)[:, 0]
    return mv, best


# se(v) bit length by |qpel value| (mvd rate table, me_distortion.h mv_cost)
_SE_BITS_TAB = np.array(
    [1] + [2 * int(2 * a).bit_length() - 1 for a in range(1, 1 << 14)],
    np.int32)


def int_rate_tab(pred_mv, sr: int, lam: int) -> np.ndarray:
    """lambda-weighted mvd bits of every integer displacement of the
    (2sr+1)^2 window against a quarter-pel predictor — the MV_COST term
    of the reference's integer stage (lencod/src/me_fullsearch.c:93
    mcost = MV_COST via mvbits[]); row-major (dy, dx), (side*side,)."""
    d = 4 * np.arange(-sr, sr + 1, dtype=np.int32)
    bx = _SE_BITS_TAB[np.minimum(np.abs(d - int(pred_mv[0])), (1 << 14) - 1)]
    by = _SE_BITS_TAB[np.minimum(np.abs(d - int(pred_mv[1])), (1 << 14) - 1)]
    return lam * (by[:, None] + bx[None, :]).reshape(-1)


def spiral_rank_tab(pred_mv, sr: int) -> np.ndarray:
    """Tie-break ranks mirroring the reference's spiral evaluation order
    (me_fullsearch.c walks outward rings around the predictor; on equal
    cost the earlier = nearer candidate is kept, where a row-major argmin
    would keep the window's top-left corner). Row-major (side*side,),
    values < 2^13."""
    cx = int(np.clip(round(pred_mv[0] / 4), -sr, sr))
    cy = int(np.clip(round(pred_mv[1] / 4), -sr, sr))
    d = np.arange(-sr, sr + 1, dtype=np.int64)
    ring = np.maximum(np.abs(d[:, None] - cy), np.abs(d[None, :] - cx))
    sub = (np.abs(d[:, None] - cy) + np.abs(d[None, :] - cx))
    return (ring * 64 + np.minimum(sub, 63)).reshape(-1)


def best_int_mv_tiebreak(costs: np.ndarray, rank: np.ndarray, sr: int):
    """argmin with spiral tie-break: (side*side,) costs + ranks."""
    side = 2 * sr + 1
    key = costs.astype(np.int64) * 8192 + rank
    flat = int(np.argmin(key))
    return np.array([flat % side - sr, flat // side - sr], np.int32)


def full_search_int(orig: np.ndarray, ref_pad: np.ndarray, mb_w: int,
                    mb_h: int, sr: int, pad: int) -> np.ndarray:
    """Integer-pel full search, 16x16 blocks (sum of quadrant SADs)."""
    q = full_search_quadrant_sads(orig, ref_pad, mb_w, mb_h, sr, pad)
    mv, _ = best_int_mv(q.sum(axis=2, dtype=np.int64), sr)
    return mv


def subpel_refine(orig_blk: np.ndarray, planes, px: int, py: int,
                  int_mv: np.ndarray, w: int, h: int, pred_mv: np.ndarray,
                  lam: int, extra_bits: int = 0,
                  use_satd: bool = False,
                  qpel_start: bool = False) -> tuple[np.ndarray, int]:
    """Quarter-pel refinement around the integer MV for one block.

    orig_blk: (bh, bw) block at pixel position (px, py). Two-stage (half
    then quarter) 8-neighbor search with cost lam * (bits(mvd) + extra).
    use_satd selects Hadamard distortion for the fractional stage (the
    reference's MEDistortionHPel/QPel = 2 default). Returns (qpel mv, cost).
    """
    o = orig_blk.astype(np.int32)
    bh, bw = o.shape

    def cost_at(mvq):
        blk = P.mc_luma_block(planes, px * 4 + int(mvq[0]),
                              py * 4 + int(mvq[1]), bw, bh, w, h)
        d = o - blk
        dist = satd(d) if use_satd else int(np.abs(d).sum())
        return dist + lam * (mv_bits(int(mvq[0] - pred_mv[0]),
                                     int(mvq[1] - pred_mv[1])) + extra_bits)

    if qpel_start:
        center = np.asarray(int_mv, np.int32).copy()
    else:
        center = np.array([int_mv[0] * 4, int_mv[1] * 4], np.int32)
    best, bcost = center, cost_at(center)
    for step in (2, 1):
        cand_center = best.copy()
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                mv = cand_center + (dx, dy)
                c = cost_at(mv)
                if c < bcost:
                    best, bcost = mv, c
    return best, bcost
