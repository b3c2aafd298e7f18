"""B-slice machinery: mb_type semantics (Table 7-14/7-18), spatial direct
motion derivation (spec 8.4.1.2.2), and B reference-list construction
(spec 8.2.4.2.3/8.2.4.2.4).

Capability parity with ldecod/src/mc_direct.c (update_direct_mv_info_
spatial_8x8:382, get_colocated_info_8x8:314, prepare_direct_params) and
ldecod/src/mbuffer.c init_lists_b_slice — new implementation (temporal
direct lands with the next feature batch).
"""

from __future__ import annotations

import numpy as np

# prediction directions
PD_L0, PD_L1, PD_BI, PD_DIRECT = 0, 1, 2, 3

# coded B mb_type 1..21 -> (is_16x8 | is_8x16 | is_16x16, pdir per partition)
# shape: '16x16' -> one pdir; '16x8'/'8x16' -> two pdirs
B_MBTYPE = {
    1: ("16x16", (PD_L0,)), 2: ("16x16", (PD_L1,)), 3: ("16x16", (PD_BI,)),
    4: ("16x8", (PD_L0, PD_L0)), 5: ("8x16", (PD_L0, PD_L0)),
    6: ("16x8", (PD_L1, PD_L1)), 7: ("8x16", (PD_L1, PD_L1)),
    8: ("16x8", (PD_L0, PD_L1)), 9: ("8x16", (PD_L0, PD_L1)),
    10: ("16x8", (PD_L1, PD_L0)), 11: ("8x16", (PD_L1, PD_L0)),
    12: ("16x8", (PD_L0, PD_BI)), 13: ("8x16", (PD_L0, PD_BI)),
    14: ("16x8", (PD_L1, PD_BI)), 15: ("8x16", (PD_L1, PD_BI)),
    16: ("16x8", (PD_BI, PD_L0)), 17: ("8x16", (PD_BI, PD_L0)),
    18: ("16x8", (PD_BI, PD_L1)), 19: ("8x16", (PD_BI, PD_L1)),
    20: ("16x8", (PD_BI, PD_BI)), 21: ("8x16", (PD_BI, PD_BI)),
}

# coded B sub_mb_type 0..12 -> (sub partition shape in 4x4 units, pdir)
B_SUBTYPE = {
    0: (None, PD_DIRECT),
    1: ((2, 2), PD_L0), 2: ((2, 2), PD_L1), 3: ((2, 2), PD_BI),
    4: ((2, 1), PD_L0), 5: ((1, 2), PD_L0),
    6: ((2, 1), PD_L1), 7: ((1, 2), PD_L1),
    8: ((2, 1), PD_BI), 9: ((1, 2), PD_BI),
    10: ((1, 1), PD_L0), 11: ((1, 1), PD_L1), 12: ((1, 1), PD_BI),
}


def rsd(x: int) -> int:
    """Round toward the 8x8 corner (lcommon ifunctions.h RSD)."""
    return (x | 1) if (x & 2) else (x & ~1)


class ColMotion:
    """Colocated motion of the list1[0] picture, for direct modes."""

    def __init__(self, mv0, ref0_q, mv1, ref1_q, mb_w, is_long_term,
                 refpic0_q=None, refpic1_q=None):
        # per-4x4 mv (n,16,2); per-8x8 refs (n,4); per-8x8 ref pic uids
        self.mv0, self.ref0_q = mv0, ref0_q
        self.mv1, self.ref1_q = mv1, ref1_q
        self.refpic0_q, self.refpic1_q = refpic0_q, refpic1_q
        self.mb_w = mb_w
        self.is_long_term = is_long_term

    def at(self, gx: int, gy: int):
        """(ref0, mv0, ref1, mv1) at global 4x4 block coords."""
        addr = (gy // 4) * self.mb_w + (gx // 4)
        blk = (gy % 4) * 4 + (gx % 4)
        q = (blk // 8) * 2 + ((blk % 4) // 2)
        return (int(self.ref0_q[addr, q]), self.mv0[addr, blk],
                int(self.ref1_q[addr, q]), self.mv1[addr, blk])

    def at_full(self, gx: int, gy: int):
        """(refList, col_ref_idx, col_ref_uid, mvCol) for temporal direct."""
        addr = (gy // 4) * self.mb_w + (gx // 4)
        blk = (gy % 4) * 4 + (gx % 4)
        q = (blk // 8) * 2 + ((blk % 4) // 2)
        if int(self.ref0_q[addr, q]) != -1:
            return (0, int(self.ref0_q[addr, q]),
                    int(self.refpic0_q[addr, q]), self.mv0[addr, blk])
        return (1, int(self.ref1_q[addr, q]),
                int(self.refpic1_q[addr, q]), self.mv1[addr, blk])

    def col_zero(self, gx: int, gy: int) -> bool:
        """'is_not_moving' (ldecod mc_direct.c get_colocated_info_8x8)."""
        if self.is_long_term:
            return False
        r0, mv0, r1, mv1 = self.at(rsd(gx), rsd(gy))
        if r0 == 0 and (abs(int(mv0[0])) >> 1) == 0 and (abs(int(mv0[1])) >> 1) == 0:
            return True
        if (r0 == -1 and r1 == 0 and (abs(int(mv1[0])) >> 1) == 0
                and (abs(int(mv1[1])) >> 1) == 0):
            return True
        return False


def prepare_direct_params(pctx, addr: int):
    """(l0_rFrame, l1_rFrame, pmvl0, pmvl1) per spec 8.4.1.2.2."""
    def refs_of(bx, by, lst):
        nb = pctx.mv_neighbor(addr, bx, by, 0, lst)
        return -1 if nb is None else nb[1]

    # A, B, C (C falls back to D inside mv_neighbor path: replicate JM's
    # get_neighbors: C = up-right of the 16x16, D fallback)
    def both_refs(bx, by):
        return refs_of(bx, by, 0), refs_of(bx, by, 1)

    a0, a1 = both_refs(-1, 0)
    b0, b1 = both_refs(0, -1)
    c = pctx.mv_neighbor(addr, 4, -1, 0, 0)
    if c is None and pctx.mv_neighbor(addr, 4, -1, 0, 1) is None:
        # up-right unavailable entirely -> D
        c0, c1 = both_refs(-1, -1)
    else:
        c0, c1 = both_refs(4, -1)

    def min_pos(vals):
        # JM: min over unsigned char -> -1 acts as +inf
        u = [v & 0xFF for v in vals]
        m = min(u)
        return m - 256 if m > 127 else m

    l0 = min_pos([a0, b0, c0])
    l1 = min_pos([a1, b1, c1])
    pmv0 = pctx.mv_pred(addr, 0, 0, 4, 4, l0, 0) if l0 >= 0 else np.zeros(2, np.int32)
    pmv1 = pctx.mv_pred(addr, 0, 0, 4, 4, l1, 1) if l1 >= 0 else np.zeros(2, np.int32)
    return l0, l1, pmv0, pmv1


def spatial_direct_quadrant(pic, addr: int, q: int, l0: int, l1: int,
                            pmv0, pmv1, col: ColMotion) -> None:
    """Fill quadrant q of MB addr with spatial-direct motion
    (direct_8x8_inference_flag == 1 path)."""
    mb_w = pic.mb_w
    mbx, mby = addr % mb_w, addr // mb_w
    qx, qy = (q % 2) * 2, (q // 2) * 2
    gx, gy = mbx * 4 + qx, mby * 4 + qy
    not_moving = col.col_zero(gx, gy)

    if l0 < 0 and l1 < 0:
        r0, r1 = 0, 0
        mv0 = np.zeros(2, np.int32)
        mv1 = np.zeros(2, np.int32)
    else:
        r0, r1 = l0, l1
        mv0 = pmv0.copy() if l0 >= 0 else np.zeros(2, np.int32)
        mv1 = pmv1.copy() if l1 >= 0 else np.zeros(2, np.int32)
        if not_moving:
            if l0 == 0:
                mv0 = np.zeros(2, np.int32)
            if l1 == 0:
                mv1 = np.zeros(2, np.int32)

    pic.ref_idx[addr, q] = r0
    pic.ref_idx_l1[addr, q] = r1
    if r0 >= 0 and r1 >= 0:
        pd = PD_BI
    elif r0 >= 0:
        pd = PD_L0
    else:
        pd = PD_L1
    pic.pdir[addr, q] = pd
    for yy in range(qy, qy + 2):
        for xx in range(qx, qx + 2):
            blk = yy * 4 + xx
            pic.mv[addr, blk] = mv0 if r0 >= 0 else 0
            pic.mv_l1[addr, blk] = mv1 if r1 >= 0 else 0


def _c_div(a: int, b: int) -> int:
    """C integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def compute_mvscale(cur_poc: int, list0, list1_0_poc: int) -> list[int]:
    """Per-list0-index temporal scaling factors (ldecod mbuffer.c
    compute_colocated:2775); 9999 = copy unscaled."""
    out = []
    for f in list0:
        trb = max(-128, min(127, cur_poc - f.poc))
        trp = max(-128, min(127, list1_0_poc - f.poc))
        if trp != 0:
            prescale = _c_div(16384 + abs(_c_div(trp, 2)), trp)
            out.append(max(-1024, min(1023, (trb * prescale + 32) >> 6)))
        else:
            out.append(9999)
    return out


def temporal_direct_quadrant(pic, addr: int, q: int, col: ColMotion,
                             list0_uid_to_idx: dict, list0_lt, mvscale) -> None:
    """Temporal direct for one 8x8 quadrant (8x8 inference, frame coding).

    list0_uid_to_idx: map of frame uid -> index in current list0.
    list0_lt: per-index long-term flags. mvscale: from compute_mvscale.
    """
    mb_w = pic.mb_w
    mbx, mby = addr % mb_w, addr // mb_w
    qx, qy = (q % 2) * 2, (q // 2) * 2
    gx, gy = mbx * 4 + qx, mby * 4 + qy
    ref_list, col_ref, col_uid, mv_col = col.at_full(rsd(gx), rsd(gy))

    pic.pdir[addr, q] = PD_BI
    if col_ref == -1:      # colocated intra
        pic.ref_idx[addr, q] = 0
        pic.ref_idx_l1[addr, q] = 0
        for yy in range(qy, qy + 2):
            for xx in range(qx, qx + 2):
                pic.mv[addr, yy * 4 + xx] = 0
                pic.mv_l1[addr, yy * 4 + xx] = 0
        return
    mapped = list0_uid_to_idx.get(col_uid)
    if mapped is None:
        raise ValueError("temporal direct: colocated reference unavailable")
    scale = mvscale[mapped]
    mvx, mvy = int(mv_col[0]), int(mv_col[1])
    if scale == 9999 or list0_lt[mapped]:
        m0 = np.array([mvx, mvy], np.int32)
        m1 = np.zeros(2, np.int32)
    else:
        m0 = np.array([(scale * mvx + 128) >> 8,
                       (scale * mvy + 128) >> 8], np.int32)
        m1 = m0 - (mvx, mvy)
    pic.ref_idx[addr, q] = mapped
    pic.ref_idx_l1[addr, q] = 0
    for yy in range(qy, qy + 2):
        for xx in range(qx, qx + 2):
            pic.mv[addr, yy * 4 + xx] = m0
            pic.mv_l1[addr, yy * 4 + xx] = m1


def direct_quadrant(parser, addr: int, q: int, direct_params=None) -> None:
    """Fill one quadrant with direct motion (spatial or temporal), shared
    by the CAVLC and CABAC parsers (parser: has pic/pctx/ctx)."""
    if parser.ctx.header.direct_spatial_mv_pred_flag:
        l0, l1, pmv0, pmv1 = direct_params
        spatial_direct_quadrant(parser.pic, addr, q, l0, l1, pmv0, pmv1,
                                parser.ctx.b_col)
    else:
        uid_to_idx, lt_flags, mvscale = parser.ctx.b_tdirect
        temporal_direct_quadrant(parser.pic, addr, q, parser.ctx.b_col,
                                 uid_to_idx, lt_flags, mvscale)
    parser.pic.b8_direct[addr, q] = True


def fill_direct_mb(parser, addr: int) -> None:
    dp = (prepare_direct_params(parser.pctx, addr)
          if parser.ctx.header.direct_spatial_mv_pred_flag else None)
    for q in range(4):
        direct_quadrant(parser, addr, q, dp)


def ref_lists_b(frames, cur_poc: int):
    """(list0, list1) for B slices from short-term frames + long-term tail."""
    st = [f for f in frames if not f.is_long_term]
    lt = sorted((f for f in frames if f.is_long_term),
                key=lambda f: f.long_term_frame_idx)
    before = sorted((f for f in st if f.poc < cur_poc),
                    key=lambda f: -f.poc)
    after = sorted((f for f in st if f.poc > cur_poc),
                   key=lambda f: f.poc)
    l0 = before + after + lt
    l1 = after + before + lt
    if len(l0) > 1 and l0 == l1:
        l1 = [l1[1], l1[0]] + l1[2:]
    return l0, l1
