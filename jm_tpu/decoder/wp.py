"""Weighted prediction parameters and sample combination (spec 8.4.2.3.2).

Capability parity with ldecod/src/image.c fill_wp_params:488 and
mc_prediction.c weighted_mc_prediction:71 / weighted_bi_prediction:136.
"""

from __future__ import annotations

import numpy as np

from ..common.types import SliceType


def _c_div(a, b):
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


class WPParams:
    """Per-slice weighted-prediction state.

    weight[l][ref][comp], offset[l][ref][comp]; bi weights
    wbp[l][ref0][ref1][comp] (l in {0,1}).
    """

    def __init__(self, hdr, pps, lst0, lst1, cur_poc, bd=(8, 8)):
        self.mode = 0   # 0: off, 1: explicit, 2: implicit
        # >8-bit: explicit offsets scale by 1<<(bd-8) (spec 8.4.2.3.3,
        # ldecod fill_wp_params wp_offset scaling); clip at (1<<bd)-1
        self.maxY = (1 << bd[0]) - 1
        self.maxC = (1 << bd[1]) - 1
        self._oscale = (1 << (bd[0] - 8), 1 << (bd[1] - 8))
        st = hdr.slice_type
        if st in (SliceType.P, SliceType.SP) and pps.weighted_pred_flag:
            self.mode = 1
        elif st == SliceType.B and pps.weighted_bipred_idc in (1, 2):
            self.mode = pps.weighted_bipred_idc
        if self.mode == 0:
            return

        n0, n1 = max(len(lst0), 1), max(len(lst1), 1)
        if self.mode == 1:
            self.luma_denom = hdr.luma_log2_weight_denom
            self.chroma_denom = hdr.chroma_log2_weight_denom
            self.weight = np.zeros((2, max(n0, n1), 3), np.int32)
            self.offset = np.zeros((2, max(n0, n1), 3), np.int32)
            for l, table in ((0, hdr.wp_l0), (1, hdr.wp_l1)):
                for r in range(self.weight.shape[1]):
                    if r < len(table):
                        e = table[r]
                        self.weight[l, r, 0], o0 = e["luma"]
                        self.offset[l, r, 0] = o0 * self._oscale[0]
                        for j in range(2):
                            self.weight[l, r, 1 + j], oc = e["chroma"][j]
                            self.offset[l, r, 1 + j] = oc * self._oscale[1]
                    else:
                        self.weight[l, r, 0] = 1 << self.luma_denom
                        self.weight[l, r, 1:] = 1 << self.chroma_denom
            # bi weights are per-(ref0, ref1) pair but just index per list
            self.wbp_w0 = np.broadcast_to(
                self.weight[0][:, None, :], (self.weight.shape[1],) * 2 + (3,))
            self.wbp_w1 = np.broadcast_to(
                self.weight[1][None, :, :], (self.weight.shape[1],) * 2 + (3,))
        else:  # implicit
            self.luma_denom = 5
            self.chroma_denom = 5
            m = max(n0, n1)
            self.weight = np.full((2, m, 3), 32, np.int32)
            self.offset = np.zeros((2, m, 3), np.int32)
            w0 = np.full((n0, n1, 3), 32, np.int32)
            w1 = np.full((n0, n1, 3), 32, np.int32)
            for i, f0 in enumerate(lst0):
                for j, f1 in enumerate(lst1):
                    td = max(-128, min(127, f1.poc - f0.poc))
                    if td == 0 or f0.is_long_term or f1.is_long_term:
                        continue
                    tb = max(-128, min(127, cur_poc - f0.poc))
                    tx = _c_div(16384 + abs(_c_div(td, 2)), td)
                    dsf = max(-1024, min(1023, (tx * tb + 32) >> 6))
                    wv1 = dsf >> 2
                    wv0 = 64 - wv1
                    if -64 <= wv1 <= 128:
                        w0[i, j, :] = wv0
                        w1[i, j, :] = wv1
            self.wbp_w0, self.wbp_w1 = w0, w1

    # ---- application (all int32 arrays) ------------------------------

    def uni(self, pred, lst, ref, comp):
        """Weighted single-list prediction (rshift_rnd + offset, clip)."""
        w = int(self.weight[lst, ref, comp])
        o = int(self.offset[lst, ref, comp])
        d = self.luma_denom if comp == 0 else self.chroma_denom
        x = pred.astype(np.int64) * w
        if d > 0:
            x = (x + (1 << (d - 1))) >> d
        return np.clip(x + o, 0, self.maxY if comp == 0 else self.maxC)

    def bi(self, p0, p1, ref0, ref1, comp):
        w0 = int(self.wbp_w0[ref0, ref1, comp])
        w1 = int(self.wbp_w1[ref0, ref1, comp])
        o = (int(self.offset[0, ref0, comp])
             + int(self.offset[1, ref1, comp]) + 1) >> 1
        d = (self.luma_denom if comp == 0 else self.chroma_denom) + 1
        x = (p0.astype(np.int64) * w0 + p1.astype(np.int64) * w1
             + (1 << (d - 1))) >> d
        return np.clip(x + o, 0, self.maxY if comp == 0 else self.maxC)
