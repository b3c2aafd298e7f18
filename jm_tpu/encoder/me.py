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


def full_search_quadrant_sads(orig: np.ndarray, ref_pad: np.ndarray,
                              mb_w: int, mb_h: int, sr: int,
                              pad: int) -> np.ndarray:
    """Integer-pel full-search SAD per 8x8 quadrant, batched over all MBs.

    Returns (n_mbs, side*side, 4) int32: SAD of each quadrant at each
    displacement (row-major (dy, dx)). Any rectangular partition's SAD is
    a sum of quadrant SADs — the fast-full-search table reuse of
    lencod/src/me_fullfast.c (setup_fast_full_search:269) expressed as one
    batched tensor.
    """
    H, W = orig.shape
    n = mb_w * mb_h
    side = 2 * sr + 1
    o = orig.reshape(mb_h, 2, 8, mb_w, 2, 8).transpose(0, 3, 1, 4, 2, 5) \
            .reshape(n, 4, 8, 8).astype(np.int32)   # (n, quadrant, 8, 8)
    costs = np.empty((n, side * side, 4), np.int32)
    for iy, dy in enumerate(range(-sr, sr + 1)):
        for ix, dx in enumerate(range(-sr, sr + 1)):
            sh = ref_pad[pad + dy: pad + dy + H, pad + dx: pad + dx + W]
            s = sh.reshape(mb_h, 2, 8, mb_w, 2, 8).transpose(0, 3, 1, 4, 2, 5) \
                  .reshape(n, 4, 8, 8).astype(np.int32)
            costs[:, iy * side + ix] = np.abs(o - s).sum(axis=(2, 3))
    return costs


def best_int_mv(costs_part: np.ndarray, sr: int):
    """argmin over the displacement axis: (n, side*side) -> mvs (n, 2)."""
    side = 2 * sr + 1
    flat = np.argmin(costs_part, axis=1)
    mv = np.stack([flat % side - sr, flat // side - sr], axis=1).astype(np.int32)
    best = np.take_along_axis(costs_part, flat[:, None], axis=1)[:, 0]
    return mv, best


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
