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


def full_search_int(orig: np.ndarray, ref_pad: np.ndarray, mb_w: int,
                    mb_h: int, sr: int, pad: int) -> np.ndarray:
    """Integer-pel full search, 16x16 blocks, batched over all MBs.

    orig: (H, W) uint8 current frame. ref_pad: padded reference integer
    plane ((H+2p, W+2p)). Returns (n_mbs, 2) int32 best integer MVs
    (in integer-pel units). Ties resolve to the JM spiral-ish preference:
    smallest |mv| then raster order via lexicographic cost tweak — here:
    first minimum in row-major (dy, dx) order over the window, which the
    jnp twin reproduces exactly (argmin picks first flat index).
    """
    H, W = orig.shape
    n = mb_w * mb_h
    side = 2 * sr + 1
    o = orig.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16).astype(np.int32)
    best = np.zeros((n, 2), np.int32)
    bcost = np.full(n, 1 << 30, np.int64)
    # evaluate per displacement, vectorized over all MBs (window loop is
    # 33x33 = 1089 iterations of cheap whole-frame slices)
    costs = np.empty((side * side, n), np.int64)
    for iy, dy in enumerate(range(-sr, sr + 1)):
        for ix, dx in enumerate(range(-sr, sr + 1)):
            shifted = ref_pad[pad + dy: pad + dy + H, pad + dx: pad + dx + W]
            s = shifted.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16).astype(np.int32)
            costs[iy * side + ix] = np.abs(o - s).sum(axis=(1, 2))
    flat = np.argmin(costs, axis=0)
    best[:, 1] = flat // side - sr   # dy
    best[:, 0] = flat % side - sr    # dx
    return best


def subpel_refine(orig_mb: np.ndarray, planes, px: int, py: int,
                  int_mv: np.ndarray, w: int, h: int, pred_mv: np.ndarray,
                  lam: int) -> tuple[np.ndarray, int]:
    """Quarter-pel refinement around the integer MV for one 16x16 block.

    Two-stage (half then quarter) 8-neighbor search with motion-vector-bit
    cost lam * bits(mvd). Returns (qpel mv (2,), cost).
    """
    o = orig_mb.astype(np.int32)

    def cost_at(mvq):
        blk = P.mc_luma_block(planes, px * 4 + int(mvq[0]),
                              py * 4 + int(mvq[1]), 16, 16, w, h)
        sad = int(np.abs(o - blk).sum())
        return sad + lam * mv_bits(int(mvq[0] - pred_mv[0]),
                                   int(mvq[1] - pred_mv[1]))

    center = np.array([int_mv[0] * 4, int_mv[1] * 4], np.int32)
    best, bcost = center, cost_at(center)
    for step in (2, 1):
        improved = True
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
