"""In-loop deblocking filter (spec 8.7).

Host numpy reference implementation, bit-exact; the production edge-filter
loops run in the native C++ runtime (native/jm_enc.cpp deblock_frame),
validated byte-exact against this module. Capability parity with
ldecod/src/loop_filter_normal.c (GetStrengthNormal:52ff, EdgeLoopLumaVer:301,
EdgeLoopLumaHor, chroma twins) and the encoder copy lencod/src/loopFilter.c
— new implementation.

Strength derivation here covers frame-coded P/I slices with list-0 motion
(B-slice two-list strength rules land with B support).
"""

from __future__ import annotations

import numpy as np

from ..common.tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE, chroma_qp


def clip3(lo, hi, x):
    return np.minimum(hi, np.maximum(lo, x))


def compute_bs(pic, mb_w: int, mb_h: int):
    """Boundary strengths for vertical and horizontal 4x4-block edges.

    Returns (bs_v, bs_h), each (4*mb_h, 4*mb_w) int8; bs_v[y, x] is the
    strength of the vertical edge at the LEFT side of 4x4 block (y, x);
    column x=0 entries refer to the picture edge and are unused.
    """
    H, W = 4 * mb_h, 4 * mb_w
    mc = pic.mb_class.reshape(mb_h, mb_w)
    intra = np.repeat(np.repeat(mc != 0, 4, 0), 4, 1)
    nnz_mb = pic.luma_nnz.copy()
    # 8x8-transform MBs: any coefficient in an 8x8 marks all four of its
    # 4x4 blocks (ldecod s_cbp.blk semantics, read_comp_cavlc.c:916)
    t8 = np.asarray(pic.transform8x8)
    if t8.any():
        q = nnz_mb.reshape(-1, 2, 2, 2, 2)           # (n, qy, y, qx, x)
        qa = q.sum(axis=(2, 4), keepdims=True)
        nnz_mb = np.where(t8[:, None, None, None, None], qa,
                          q).reshape(-1, 16)
    nnz = nnz_mb.reshape(mb_h, mb_w, 4, 4).transpose(0, 2, 1, 3).reshape(H, W)
    mv0 = pic.mv.reshape(mb_h, mb_w, 4, 4, 2).transpose(0, 2, 1, 3, 4).reshape(H, W, 2)
    mv1 = pic.mv_l1.reshape(mb_h, mb_w, 4, 4, 2).transpose(0, 2, 1, 3, 4).reshape(H, W, 2)

    def expand_q(a8):  # (n, 4) per-8x8 -> (H, W) per-4x4
        return np.repeat(np.repeat(
            a8.reshape(mb_h, mb_w, 2, 2).transpose(0, 2, 1, 3)
              .reshape(2 * mb_h, 2 * mb_w), 2, 0), 2, 1)

    r0 = expand_q(pic.ref_pic_id.astype(np.int64))
    r1 = expand_q(pic.ref_pic_id_l1.astype(np.int64))
    # blocks predicted from one list only carry "no picture" (-1) in the
    # other; JM's NULL ref_pic pointer compares equal across such blocks.

    # field pictures compare vertical MVs against 2 instead of 4 (half
    # vertical resolution; ldecod loop_filter.c mvlimit)
    mv_lim = np.array([4, 2 if getattr(pic, "field_mode", False) else 4])

    def cmp_mv(a, b):
        return (np.abs(a - b) >= mv_lim).any(axis=-1)

    def edge_bs(sl_p, sl_q, is_mb_edge, mb_edge_bs=4):
        (ip, nn_p, m0p, m1p, r0p, r1p) = sl_p
        (iq, nn_q, m0q, m1q, r0q, r1q) = sl_q
        bs = np.zeros(ip.shape, np.int8)
        either_intra = ip | iq
        bs[either_intra & is_mb_edge] = mb_edge_bs
        bs[either_intra & ~is_mb_edge] = 3
        coef = (nn_p > 0) | (nn_q > 0)
        rest = ~either_intra
        bs[rest & coef] = 2
        # motion-based strength (ldecod loop_filter_normal.c:158-196)
        pair_straight = (r0p == r0q) & (r1p == r1q)
        pair_cross = (r0p == r1q) & (r1p == r0q)
        c00 = cmp_mv(m0p, m0q)
        c11 = cmp_mv(m1p, m1q)
        c01 = cmp_mv(m0p, m1q)
        c10 = cmp_mv(m1p, m0q)
        strv_same = (c00 | c11) & (c01 | c10)    # both lists same picture
        strv = np.where(~(pair_straight | pair_cross), 1,
                        np.where(r0p != r1p,
                                 np.where(r0p == r0q, c00 | c11, c01 | c10),
                                 strv_same)).astype(np.int8)
        sel = rest & ~coef
        bs[sel] = strv[sel]
        return bs

    def sl(arrs, s):
        return tuple(a[s] for a in arrs)

    fields = (intra, nnz, mv0, mv1, r0, r1)
    bs_v = np.zeros((H, W), np.int8)
    is_mb_v = np.zeros((H, W - 1), bool)
    is_mb_v[:, 3::4] = True
    bs_v[:, 1:] = edge_bs(sl(fields, np.s_[:, :-1]), sl(fields, np.s_[:, 1:]),
                          is_mb_v)
    bs_h = np.zeros((H, W), np.int8)
    is_mb_h = np.zeros((H - 1, W), bool)
    is_mb_h[3::4, :] = True
    # field pictures: horizontal intra MB edges are bS 3, not 4
    # (ldecod loop_filter_normal.c:124 "p->structure == FRAME")
    hor_mb_bs = 3 if getattr(pic, "field_mode", False) else 4
    bs_h[1:, :] = edge_bs(sl(fields, np.s_[:-1, :]), sl(fields, np.s_[1:, :]),
                          is_mb_h, hor_mb_bs)
    # SP/SI slices: every edge of an SP-slice MbQ is forced to 4 (MB edge)
    # or 3 (internal) regardless of content (ldecod
    # loop_filter_normal.c:100,230; spec 8.7.2.1)
    sp = getattr(pic, "sp_slice", None)
    if sp is not None and sp.any():
        spq = np.repeat(np.repeat(sp.reshape(mb_h, mb_w), 4, 0), 4, 1)
        mbe_v = np.zeros((H, W), bool)
        mbe_v[:, ::4] = True
        mbe_h = np.zeros((H, W), bool)
        mbe_h[::4, :] = True
        bs_v = np.where(spq, np.where(mbe_v, 4, 3), bs_v).astype(np.int8)
        bs_h = np.where(spq, np.where(mbe_h, hor_mb_bs, 3),
                        bs_h).astype(np.int8)
        bs_v[:, 0] = 0
        bs_h[0, :] = 0
    return bs_v, bs_h


def _filter_luma_edge(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0,
                      cmax=255):
    """Filter one luma edge line-batch. All args int32 arrays of same shape.
    Returns new (p2, p1, p0, q0, q1, q2)."""
    fflag = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
             & (np.abs(q1 - q0) < beta) & (bs > 0))
    ap = np.abs(p2 - p0) < beta
    aq = np.abs(q2 - q0) < beta

    # bs < 4 path
    tc = tc0 + ap.astype(np.int32) + aq.astype(np.int32)
    delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, cmax)
    nq0 = np.clip(q0 - delta, 0, cmax)
    np1 = p1 + clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    nq1 = q1 + clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    np1 = np.where(ap, np1, p1)
    nq1 = np.where(aq, nq1, q1)

    # bs == 4 strong path
    strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp0 = np.where(strong & ap, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = np.where(strong & ap, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = np.where(strong & ap, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = np.where(strong & aq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = np.where(strong & aq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = np.where(strong & aq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    rp0 = np.where(is4, sp0, np0)
    rp1 = np.where(is4, sp1, np1)
    rp2 = np.where(is4, sp2, p2)
    rq0 = np.where(is4, sq0, nq0)
    rq1 = np.where(is4, sq1, nq1)
    rq2 = np.where(is4, sq2, q2)

    rp0 = np.where(fflag, rp0, p0)
    rp1 = np.where(fflag, rp1, p1)
    rp2 = np.where(fflag, rp2, p2)
    rq0 = np.where(fflag, rq0, q0)
    rq1 = np.where(fflag, rq1, q1)
    rq2 = np.where(fflag, rq2, q2)
    return rp2, rp1, rp0, rq0, rq1, rq2


def _filter_chroma_edge(p1, p0, q0, q1, bs, alpha, beta, tc0, cmax=255):
    fflag = ((np.abs(p0 - q0) < alpha) & (np.abs(p1 - p0) < beta)
             & (np.abs(q1 - q0) < beta) & (bs > 0))
    tc = tc0 + 1
    delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = np.clip(p0 + delta, 0, cmax)
    nq0 = np.clip(q0 - delta, 0, cmax)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    rp0 = np.where(is4, sp0, np0)
    rq0 = np.where(is4, sq0, nq0)
    rp0 = np.where(fflag, rp0, p0)
    rq0 = np.where(fflag, rq0, q0)
    return rp0, rq0


def _deblock_native(Y, U, V, pic, mb_w, mb_h, qp_arr, slice_params,
                    bs_v, bs_h) -> bool:
    from .. import native as N
    if not N.available:
        return False
    cb_off = slice_params["cb_qp_off"]
    cr_off = slice_params["cr_qp_off"]
    # per-MB chroma QP offsets must be uniform to precompute the QP->QPc
    # tables once per plane (always true for our single-PPS pictures)
    if (cb_off != cb_off[0]).any() or (cr_off != cr_off[0]).any():
        return False
    if not (Y.flags.c_contiguous and U.flags.c_contiguous
            and V.flags.c_contiguous):
        return False
    qpc_cb = np.array([chroma_qp(q, int(cb_off[0])) for q in range(52)],
                      np.int32)
    qpc_cr = np.array([chroma_qp(q, int(cr_off[0])) for q in range(52)],
                      np.int32)
    N.deblock_frame({
        "Y": Y, "U": U, "V": V,
        "bs_v": np.ascontiguousarray(bs_v, np.int8),
        "bs_h": np.ascontiguousarray(bs_h, np.int8),
        "qp": np.ascontiguousarray(qp_arr, np.int32),
        "disable": np.ascontiguousarray(slice_params["disable_idc"], np.int32),
        "a_off": np.ascontiguousarray(slice_params["alpha_off"], np.int32),
        "b_off": np.ascontiguousarray(slice_params["beta_off"], np.int32),
        "slice_id": np.ascontiguousarray(slice_params["slice_id"], np.int32),
        "transform8x8": np.ascontiguousarray(pic.transform8x8, np.uint8),
        "qpc_cb": qpc_cb, "qpc_cr": qpc_cr,
        "alpha_tab": np.ascontiguousarray(ALPHA_TABLE, np.uint8),
        "beta_tab": np.ascontiguousarray(BETA_TABLE, np.uint8),
        "tc0_tab": np.ascontiguousarray(TC0_TABLE, np.uint8),
    }, mb_w, mb_h, getattr(pic, "n_crows", 2))
    return True


def deblock_picture(Y, U, V, pic, mb_w, mb_h, qp_arr, slice_params,
                    force_numpy: bool = False, bd=(8, 8)):
    """In-place deblock of planes. qp_arr: per-MB luma QP. slice_params:
    per-MB (disable_idc, alpha_off, beta_off, cb_off, cr_off, slice_id).

    Boundary strengths are computed vectorized here; the edge filter
    loops run in the native runtime (native/jm_enc.cpp deblock_frame,
    byte-exact twin of the numpy loops below) when available.
    """
    bs_v, bs_h = compute_bs(pic, mb_w, mb_h)
    if not force_numpy and bd == (8, 8) and _deblock_native(
            Y, U, V, pic, mb_w, mb_h, qp_arr, slice_params, bs_v, bs_h):
        return
    # >8-bit: alpha/beta/tc0 scale by 1<<(bd-8) and clips widen
    # (spec 8.7.2.2 threshold derivation)
    sy, sc = 1 << (bd[0] - 8), 1 << (bd[1] - 8)
    maxY, maxC = (1 << bd[0]) - 1, (1 << bd[1]) - 1
    disable = slice_params["disable_idc"]
    a_off = slice_params["alpha_off"]
    b_off = slice_params["beta_off"]
    cb_off = slice_params["cb_qp_off"]
    cr_off = slice_params["cr_qp_off"]
    slice_id = slice_params["slice_id"]
    _qmin = -48      # lowest QPY of the >8-bit profiles (-QpBdOffsetY)
    qpc_tab = {off: np.array([chroma_qp(q, off, bd[1])
                              for q in range(_qmin, 52)], np.int32)
               for off in set(cb_off.tolist()) | set(cr_off.tolist())}
    crows = getattr(pic, "n_crows", 2)   # 2 = 4:2:0, 4 = 4:2:2

    for mby in range(mb_h):
        for mbx in range(mb_w):
            addr = mby * mb_w + mbx
            if disable[addr] == 1:
                continue
            px, py = mbx * 16, mby * 16

            def edge_qp_pair(n_addr):
                return qp_arr[n_addr], qp_arr[addr]

            # ---- vertical edges (filter left to right) ----
            t8 = bool(pic.transform8x8[addr])
            for ex in range(4):
                if t8 and ex in (1, 3):
                    continue   # 8x8 transform: no 4-pel internal edges
                x = px + ex * 4
                if ex == 0:
                    if mbx == 0:
                        continue
                    n_addr = addr - 1
                    if disable[addr] == 2 and slice_id[n_addr] != slice_id[addr]:
                        continue
                    qp_p, qp_q = edge_qp_pair(n_addr)
                else:
                    qp_p = qp_q = qp_arr[addr]
                bs_col = bs_v[4 * mby:4 * mby + 4, (x // 4)]
                if not bs_col.any():
                    continue
                bs_line = np.repeat(bs_col, 4).astype(np.int32)
                qp_av = (int(qp_p) + int(qp_q) + 1) >> 1
                ia = min(max(qp_av + 2 * a_off[addr], 0), 51)
                ib = min(max(qp_av + 2 * b_off[addr], 0), 51)
                alpha = int(ALPHA_TABLE[ia]) * sy
                beta = int(BETA_TABLE[ib]) * sy
                tc0 = TC0_TABLE[np.clip(bs_line, 1, 3) - 1, ia] * sy
                cols = Y[py:py + 16, x - 4:x + 4].astype(np.int32)
                res = _filter_luma_edge(
                    cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3],
                    cols[:, 4], cols[:, 5], cols[:, 6], cols[:, 7],
                    bs_line, alpha, beta, tc0, cmax=maxY)
                Y[py:py + 16, x - 3:x + 3] = np.stack(res, axis=1)

                # chroma vertical edges at luma x offsets 0 and 8
                # (chroma_edge[0] of ldecod/inc/loop_filter.h:49)
                if ex in (0, 2):
                    cx = x // 2
                    if crows == 2:
                        cyy, cnr = py // 2, 8
                    else:          # 4:2:2: full vertical chroma resolution
                        cyy, cnr = py, 16
                    bs_c = np.repeat(bs_col, cnr // 4).astype(np.int32)
                    for plane, off_arr in ((U, cb_off), (V, cr_off)):
                        qpc_p = int(qpc_tab[off_arr[addr]][qp_p - _qmin])
                        qpc_q = int(qpc_tab[off_arr[addr]][qp_q - _qmin])
                        qpc_av = (qpc_p + qpc_q + 1) >> 1
                        ia_c = min(max(qpc_av + 2 * a_off[addr], 0), 51)
                        ib_c = min(max(qpc_av + 2 * b_off[addr], 0), 51)
                        al_c = int(ALPHA_TABLE[ia_c]) * sc
                        be_c = int(BETA_TABLE[ib_c]) * sc
                        tc0_c = TC0_TABLE[np.clip(bs_c, 1, 3) - 1, ia_c] * sc
                        cc = plane[cyy:cyy + cnr, cx - 2:cx + 2].astype(np.int32)
                        rp0, rq0 = _filter_chroma_edge(
                            cc[:, 0], cc[:, 1], cc[:, 2], cc[:, 3],
                            bs_c, al_c, be_c, tc0_c, cmax=maxC)
                        plane[cyy:cyy + cnr, cx - 1] = rp0
                        plane[cyy:cyy + cnr, cx] = rq0

            # ---- horizontal edges (top to bottom) ----
            for ey in range(4):
                # 8x8 transform skips only the LUMA filtering of internal
                # odd edges; 4:2:2 chroma edges at those rows still run
                # (ldecod/src/loopFilter.c:488 perform_db,
                # filterNon8x8LumaEdgesFlag guards just the luma call)
                luma_this_edge = not (t8 and ey in (1, 3))
                if not luma_this_edge and crows == 2:
                    continue
                y = py + ey * 4
                if ey == 0:
                    if mby == 0:
                        continue
                    n_addr = addr - mb_w
                    if disable[addr] == 2 and slice_id[n_addr] != slice_id[addr]:
                        continue
                    qp_p, qp_q = edge_qp_pair(n_addr)
                else:
                    qp_p = qp_q = qp_arr[addr]
                bs_row = bs_h[(y // 4), 4 * mbx:4 * mbx + 4]
                if not bs_row.any():
                    continue
                bs_line = np.repeat(bs_row, 4).astype(np.int32)
                qp_av = (int(qp_p) + int(qp_q) + 1) >> 1
                ia = min(max(qp_av + 2 * a_off[addr], 0), 51)
                ib = min(max(qp_av + 2 * b_off[addr], 0), 51)
                alpha = int(ALPHA_TABLE[ia]) * sy
                beta = int(BETA_TABLE[ib]) * sy
                tc0 = TC0_TABLE[np.clip(bs_line, 1, 3) - 1, ia] * sy
                if luma_this_edge:
                    rows = Y[y - 4:y + 4, px:px + 16].astype(np.int32)
                    res = _filter_luma_edge(
                        rows[0], rows[1], rows[2], rows[3],
                        rows[4], rows[5], rows[6], rows[7],
                        bs_line, alpha, beta, tc0, cmax=maxY)
                    Y[y - 3:y + 3, px:px + 16] = np.stack(res, axis=0)

                # chroma horizontal edges: 4:2:0 at ey 0/2; 4:2:2 at every
                # edge, chroma row = luma row (chroma_edge[1], loop_filter.h:55)
                if crows == 4 or ey in (0, 2):
                    cy = y // 2 if crows == 2 else y
                    cxx = px // 2
                    bs_c = np.repeat(bs_row, 2).astype(np.int32)
                    for plane, off_arr in ((U, cb_off), (V, cr_off)):
                        qpc_p = int(qpc_tab[off_arr[addr]][qp_p - _qmin])
                        qpc_q = int(qpc_tab[off_arr[addr]][qp_q - _qmin])
                        qpc_av = (qpc_p + qpc_q + 1) >> 1
                        ia_c = min(max(qpc_av + 2 * a_off[addr], 0), 51)
                        ib_c = min(max(qpc_av + 2 * b_off[addr], 0), 51)
                        al_c = int(ALPHA_TABLE[ia_c]) * sc
                        be_c = int(BETA_TABLE[ib_c]) * sc
                        tc0_c = TC0_TABLE[np.clip(bs_c, 1, 3) - 1, ia_c] * sc
                        cc = plane[cy - 2:cy + 2, cxx:cxx + 8].astype(np.int32)
                        rp0, rq0 = _filter_chroma_edge(
                            cc[0], cc[1], cc[2], cc[3],
                            bs_c, al_c, be_c, tc0_c, cmax=maxC)
                        plane[cy - 1, cxx:cxx + 8] = rp0
                        plane[cy, cxx:cxx + 8] = rq0
