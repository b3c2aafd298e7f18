"""Phase-2 decoder reconstruction: batched residual decode + MB recon.

Residual decode (inverse scan -> dequant -> inverse transform) is fully
batched numpy/jnp over all MBs of the picture. The pixel reconstruction
walks MBs serially on the host in this reference path (intra prediction and
MC); the device wavefront twin is validated against it.

Capability parity with ldecod/src/macroblock.c decode_one_macroblock:1402,
mb_prediction.c, block.c (itrans4x4/itrans_2) — new SoA design.
"""

from __future__ import annotations

import numpy as np

from ..common.predict_ctx import RASTER2CODE
from ..common.tables import FIELD_SCAN_4x4, ZIGZAG_4x4, chroma_qp
from ..ops import intra as I
from ..ops import interp as P
from ..ops.quant import (FLAT_INV_SCALE_4x4, rshift_rnd_sf)
from .mb_parse import MB_I4, MB_I16, MB_INTER, MB_IPCM, PictureData

_ZZ = np.asarray(ZIGZAG_4x4)
_FS = np.asarray(FIELD_SCAN_4x4)


def _inv_scan_4x4(coef_scan: np.ndarray, field: bool = False) -> np.ndarray:
    """(..., 16) scan order -> (..., 4, 4) raster. Field pictures use the
    field scan of spec 8.5.5 (tables FIELD_SCAN_4x4; ldecod pos_scan
    selection in read_comp_cavlc.c)."""
    out = np.zeros_like(coef_scan)
    out[..., _FS if field else _ZZ] = coef_scan
    return out.reshape(*coef_scan.shape[:-1], 4, 4)


def _np_dequant_4x4(coef, qp, tab=None):
    tab = FLAT_INV_SCALE_4x4 if tab is None else tab
    scale = tab[qp]                      # (..., 4, 4)
    per = (qp // 6)[..., None, None]
    return rshift_rnd_sf((coef.astype(np.int64) * scale) << per, 4).astype(np.int32)


def _np_fwd4(x):
    """Batched spec forward 4x4 core transform (lcommon transform.c
    forward4x4): rows then columns with factors (1,2,1,1)."""
    x = x.astype(np.int64)
    p0 = x[..., :, 0] + x[..., :, 3]
    p3 = x[..., :, 0] - x[..., :, 3]
    p1 = x[..., :, 1] + x[..., :, 2]
    p2 = x[..., :, 1] - x[..., :, 2]
    t = np.stack([p0 + p1, (p3 << 1) + p2, p0 - p1, p3 - (p2 << 1)], axis=-1)
    q0 = t[..., 0, :] + t[..., 3, :]
    q3 = t[..., 0, :] - t[..., 3, :]
    q1 = t[..., 1, :] + t[..., 2, :]
    q2 = t[..., 1, :] - t[..., 2, :]
    return np.stack([q0 + q1, (q3 << 1) + q2, q0 - q1, q3 - (q2 << 1)],
                    axis=-2)


# SP requantization constant (ldecod/inc/quant.h:151, EQ. 8-425)
_SP_A = np.array([[16, 20, 16, 20],
                  [20, 25, 20, 25],
                  [16, 20, 16, 20],
                  [20, 25, 20, 25]], np.int64)


def _np_inv4(d):
    """Batched spec inverse 4x4 (no rounding); d: (..., 4, 4) int."""
    d = d.astype(np.int64)
    e0 = d[..., :, 0] + d[..., :, 2]
    e1 = d[..., :, 0] - d[..., :, 2]
    e2 = (d[..., :, 1] >> 1) - d[..., :, 3]
    e3 = d[..., :, 1] + (d[..., :, 3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0 = f[..., 0, :] + f[..., 2, :]
    g1 = f[..., 0, :] - f[..., 2, :]
    g2 = (f[..., 1, :] >> 1) - f[..., 3, :]
    g3 = f[..., 1, :] + (f[..., 3, :] >> 1)
    return np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)


def _np_hadamard4(d):
    d = d.astype(np.int64)
    a0 = d[..., :, 0] + d[..., :, 2]
    a1 = d[..., :, 0] - d[..., :, 2]
    a2 = d[..., :, 1] - d[..., :, 3]
    a3 = d[..., :, 1] + d[..., :, 3]
    f = np.stack([a0 + a3, a1 + a2, a1 - a2, a0 - a3], axis=-1)
    b0 = f[..., 0, :] + f[..., 2, :]
    b1 = f[..., 0, :] - f[..., 2, :]
    b2 = f[..., 1, :] - f[..., 3, :]
    b3 = f[..., 1, :] + f[..., 3, :]
    return np.stack([b0 + b3, b1 + b2, b1 - b2, b0 - b3], axis=-2)


_ZZ8 = None


def _get_zz8():
    global _ZZ8
    if _ZZ8 is None:
        from ..common.tables import ZIGZAG_8x8
        _ZZ8 = np.asarray(ZIGZAG_8x8)
    return _ZZ8


def _ws_raster_4(flat_list):
    """Scaling list (zig-zag transmission order) -> raster 4x4 weights."""
    ws = np.zeros(16, np.int64)
    ws[_ZZ] = np.asarray(flat_list, np.int64)
    return ws.reshape(4, 4)


def _ws_raster_8(flat_list):
    ws = np.zeros(64, np.int64)
    ws[_get_zz8()] = np.asarray(flat_list, np.int64)
    return ws.reshape(8, 8)


def build_inv_scale(pps):
    """(tab4 (6,52,4,4), tab8 (2..6,52,8,8)) InvLevelScale = V * weightScale.

    4x4 list order: 0 intraY, 1 intraCb, 2 intraCr, 3 interY, 4 interCb,
    5 interCr; 8x8: 0 intraY, 1 interY (4:2:0).
    """
    from ..common.tables import DEQUANT_SCALE_4x4, DEQUANT_SCALE_8x8
    rows = 88           # 52 + QpBdOffset range of >8-bit profiles
    tab4 = np.zeros((6, rows, 4, 4), np.int32)
    for i in range(6):
        ws = _ws_raster_4(pps.scaling_list_4x4[i])
        for qp in range(rows):
            tab4[i, qp] = DEQUANT_SCALE_4x4[qp % 6] * ws
    n8 = min(len(pps.scaling_list_8x8), 6)
    tab8 = np.zeros((max(n8, 2), rows, 8, 8), np.int32)
    for i in range(max(n8, 2)):
        lst = (pps.scaling_list_8x8[i] if i < n8 else [16] * 64)
        ws = _ws_raster_8(lst)
        for qp in range(rows):
            tab8[i, qp] = DEQUANT_SCALE_8x8[qp % 6] * ws
    return tab4, tab8


def _np_inv8(d):
    """Batched spec inverse 8x8 (no rounding); (..., 8, 8) int."""
    d = d.astype(np.int64)

    def stage(cols):
        d0, d1, d2, d3, d4, d5, d6, d7 = cols
        a0 = d0 + d4
        a4 = d0 - d4
        a2 = (d2 >> 1) - d6
        a6 = d2 + (d6 >> 1)
        b0 = a0 + a6
        b2 = a4 + a2
        b4 = a4 - a2
        b6 = a0 - a6
        a1 = -d3 + d5 - d7 - (d7 >> 1)
        a3 = d1 + d7 - d3 - (d3 >> 1)
        a5 = -d1 + d7 + d5 + (d5 >> 1)
        a7 = d3 + d5 + d1 + (d1 >> 1)
        b1 = a1 + (a7 >> 2)
        b7 = a7 - (a1 >> 2)
        b3 = a3 + (a5 >> 2)
        b5 = (a3 >> 2) - a5
        return (b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                b6 - b1, b4 - b3, b2 - b5, b0 - b7)

    h = stage(tuple(d[..., :, i] for i in range(8)))
    t = np.stack(h, axis=-1)
    v = stage(tuple(t[..., j, :] for j in range(8)))
    return np.stack(v, axis=-2)


# 4:2:2 chroma DC coefficient scan: (column, row) per transmission position
# (ldecod/inc/macroblock.h:63 SCAN_YUV422)
SCAN_YUV422 = [(0, 0), (0, 1), (1, 0), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3)]


def decode_residuals(pic: PictureData, pps, bd=(8, 8), lossless=None):
    """Returns (res_luma (n,16,4,4), res_chroma (n,2,4,4,4)) int32 spatial
    residuals, ready to add to prediction. bd: (luma, chroma) bit depths —
    >8-bit profiles scale with QP' = QP + QpBdOffset (spec 8.5.8).

    lossless: optional (n,) bool mask of transform-bypass MBs
    (qpprime_y_zero + QP'==0, ldecod macroblock.c:196 is_lossless): their
    residual is the inverse-scanned coefficients verbatim — no dequant,
    no inverse transform, raw DC placement (ldecod block.c:53
    itrans4x4_ls, read_comp_cavlc.c:2004 lossless chroma DC). The intra
    DPCM accumulation happens at prediction time in Reconstructor."""
    n = pic.n_mbs
    qp = pic.qp.astype(np.int64) + 6 * (bd[0] - 8)
    tab4, tab8 = build_inv_scale(pps)
    intra = (pic.mb_class != 0).astype(np.int64)       # (n,)
    per = (qp // 6)
    fld = bool(getattr(pic, "field_mode", False))

    # ---- luma AC / 4x4 ----
    raster = _inv_scan_4x4(pic.luma_coef, fld)     # (n, 16, 4, 4)
    # per-MB scale table: intra -> list 0, inter -> list 3
    scale_y = tab4[np.where(intra == 1, 0, 3), qp].astype(np.int64)  # (n,4,4)
    deq = rshift_rnd_sf((raster.astype(np.int64) * scale_y[:, None]) <<
                        per[:, None, None, None], 4).astype(np.int32)
    # Intra16x16: DC path
    i16 = pic.mb_class == MB_I16
    if i16.any():
        dc_r = _inv_scan_4x4(pic.luma_dc, fld)     # (n, 4, 4)
        dc_t = _np_hadamard4(dc_r)
        scale = scale_y[:, 0, 0][:, None, None]
        dc_s = rshift_rnd_sf((dc_t * scale) << per[:, None, None], 6).astype(np.int32)
        blk = np.arange(16)
        by, bx = blk // 4, blk % 4
        deq_dc = deq.copy()
        deq_dc[:, blk, 0, 0] = dc_s[:, by, bx]
        deq = np.where(i16[:, None, None, None], deq_dc, deq)
    res_luma = ((_np_inv4(deq) + 32) >> 6).astype(np.int32)
    if lossless is not None and lossless.any():
        ll_res = raster.astype(np.int32).copy()        # raw coefficients
        if i16.any():
            dc_r = _inv_scan_4x4(pic.luma_dc, fld)
            blk = np.arange(16)
            ll_dc = ll_res.copy()
            ll_dc[:, blk, 0, 0] = dc_r[:, blk // 4, blk % 4]
            ll_res = np.where(i16[:, None, None, None], ll_dc, ll_res)
        res_luma = np.where(lossless[:, None, None, None], ll_res,
                            res_luma)

    # ---- luma 8x8 transform MBs ----
    t8 = np.asarray(pic.transform8x8)
    if t8.any():
        r8 = np.zeros((n, 4, 8, 8), np.int64)
        r8.reshape(n, 4, 64)[:, :, _get_zz8()] = pic.luma_coef8
        scale8 = tab8[np.where(intra == 1, 0, 1), qp].astype(np.int64)
        deq8 = rshift_rnd_sf((r8 * scale8[:, None]) <<
                             per[:, None, None, None], 6)
        sp8 = (_np_inv8(deq8) + 32) >> 6               # (n, 4, 8, 8)
        if lossless is not None and lossless.any():
            # transform bypass: the zig-zag-placed coefficients ARE the
            # spatial residual (ldecod block.c Inv_Residual_trans_8x8
            # identity arm; DPCM handled at prediction time)
            sp8 = np.where(lossless[:, None, None, None], r8, sp8)
        # split each 8x8 quadrant into its 4 raster 4x4 blocks
        res8 = np.zeros((n, 16, 4, 4), np.int32)
        for q in range(4):
            qy, qx = q // 2, q % 2
            for dy in range(2):
                for dx in range(2):
                    blk = (2 * qy + dy) * 4 + 2 * qx + dx
                    res8[:, blk] = sp8[:, q, 4 * dy:4 * dy + 4, 4 * dx:4 * dx + 4]
        res_luma = np.where(t8[:, None, None, None], res8, res_luma)

    # ---- chroma ----
    cbdo = 6 * (bd[1] - 8)          # QpBdOffsetC (QP'c = QPc + offset)
    qpc_cb = np.array([chroma_qp(int(q), pps.cb_qp_offset, bd[1]) + cbdo
                       for q in pic.qp], np.int64)
    qpc_cr = np.array([chroma_qp(int(q), pps.cr_qp_offset, bd[1]) + cbdo
                       for q in pic.qp], np.int64)
    qpc = np.stack([qpc_cb, qpc_cr], axis=1)       # (n, 2)
    c_raster = _inv_scan_4x4(pic.chroma_coef, fld) \
        .astype(np.int64)                          # (n,2,blks,4,4)
    # list 1/2 intra Cb/Cr, 4/5 inter
    list_u = np.where(intra == 1, 1, 4)
    list_v = np.where(intra == 1, 2, 5)
    scale_c = np.stack([tab4[list_u, qpc[:, 0]],
                        tab4[list_v, qpc[:, 1]]], axis=1).astype(np.int64)  # (n,2,4,4)
    perc = (qpc // 6)
    c_deq = rshift_rnd_sf((c_raster * scale_c[:, :, None]) <<
                          perc[:, :, None, None, None], 4).astype(np.int32)
    if pic.n_crows == 2:
        # chroma DC: 2x2 hadamard + scale (4:2:0)
        dc = pic.chroma_dc.reshape(n, 2, 2, 2).astype(np.int64)
        a, b = dc[..., 0, 0], dc[..., 0, 1]
        c, d = dc[..., 1, 0], dc[..., 1, 1]
        f = np.stack([
            np.stack([a + b + c + d, a - b + c - d], axis=-1),
            np.stack([a + b - c - d, a - b - c + d], axis=-1)], axis=-2)
        scale = scale_c[:, :, 0, 0][..., None, None]
        dc_s = (((f * scale) << perc[..., None, None]) >> 5).astype(np.int32)
        blk = np.arange(4)
        c_deq[:, :, blk, 0, 0] = dc_s[:, :, blk // 2, blk % 2]
    else:
        # 4:2:2 chroma DC: 2-pt horizontal + 4-pt vertical hadamard, scaled
        # at QPc+3 with rounded >>6 (ldecod read_comp_cavlc.c:1406-1467)
        dcs = pic.chroma_dc.astype(np.int64)        # (n, 2, 8) scan order
        m3 = np.zeros((n, 2, 2, 4), np.int64)       # [col i][row j]
        for k, (i0, j0) in enumerate(SCAN_YUV422):
            m3[:, :, i0, j0] = dcs[:, :, k]
        m4 = np.stack([m3[:, :, 0] + m3[:, :, 1],
                       m3[:, :, 0] - m3[:, :, 1]], axis=2)  # (n,2,col,4)
        m6_0 = m4[..., 0] + m4[..., 2]
        m6_1 = m4[..., 0] - m4[..., 2]
        m6_2 = m4[..., 1] - m4[..., 3]
        m6_3 = m4[..., 1] + m4[..., 3]
        f = np.stack([m6_0 + m6_3, m6_1 + m6_2,
                      m6_1 - m6_2, m6_0 - m6_3], axis=-1)   # (n,2,col,row j)
        qpdc = qpc + 3
        scale_dc = np.stack([tab4[list_u, qpdc[:, 0]],
                             tab4[list_v, qpdc[:, 1]]], axis=1)[:, :, 0, 0] \
            .astype(np.int64)[..., None, None]
        dc_s = rshift_rnd_sf((f * scale_dc) <<
                             (qpdc // 6)[..., None, None], 6).astype(np.int32)
        for j in range(4):
            for i in range(2):
                c_deq[:, :, j * 2 + i, 0, 0] = dc_s[:, :, i, j]
    res_chroma = ((_np_inv4(c_deq) + 32) >> 6).astype(np.int32)
    if lossless is not None and lossless.any():
        ll_c = c_raster.astype(np.int32).copy()
        if pic.n_crows == 2:
            dc_raw = pic.chroma_dc.reshape(n, 2, 4)
            blk = np.arange(4)
            ll_c[:, :, blk, 0, 0] = dc_raw[:, :, blk]
        else:
            # 4:2:2 lossless DC placement: m3[i][j] -> block column-major
            # (ldecod read_comp_cavlc.c:1468-1474)
            dcs = pic.chroma_dc                          # (n, 2, 8) scan
            for k, (i0, j0) in enumerate(SCAN_YUV422):
                ll_c[:, :, j0 * 2 + i0, 0, 0] = dcs[:, :, k]
        res_chroma = np.where(lossless[:, None, None, None, None], ll_c,
                              res_chroma)
    return res_luma, res_chroma


class Reconstructor:
    """Host-side reference reconstruction of one picture."""

    def __init__(self, pic: PictureData, sps, pps, ref_frames, ref_frames_l1=(),
                 wp=None, cur_parity=None):
        """ref_frames: list (ref_idx order, list0) of DPB Frame objects with
        .luma_planes (INT,B,H,J) and .chroma_pad (U, V) padded planes.
        wp: WPParams or None. cur_parity: None for frame pictures, 0/1 for
        top/bottom field pictures (chroma MV parity adjustment)."""
        self.pic = pic
        self.cur_parity = cur_parity
        self.sps = sps
        self.pps = pps
        self.refs = ref_frames
        self.refs1 = list(ref_frames_l1)
        self.wp = wp if (wp is not None and wp.mode) else None
        self.mb_w = pic.mb_w
        self.mb_h = pic.mb_h
        self.w = self.mb_w * 16
        self.h = self.mb_h * 16
        self.crows = pic.n_crows            # chroma 4x4-block rows per MB
        self.ch_mb = 4 * self.crows         # chroma MB height (8 or 16)
        # >8-bit profiles (High 10 etc.): uint16 planes, (1<<bd)-1 clip,
        # 1<<(bd-1) DC fallback (ldecod imgpel/IMGTYPE parity)
        self.bd = sps.bit_depth_luma_minus8 + 8
        self.bdc = sps.bit_depth_chroma_minus8 + 8
        self.maxY = (1 << self.bd) - 1
        self.maxC = (1 << self.bdc) - 1
        self.dcY = 1 << (self.bd - 1)
        self.dcC = 1 << (self.bdc - 1)
        # lossless transform-bypass MBs (ldecod macroblock.c:196):
        # qpprime_y_zero_transform_bypass_flag and QP' == 0
        if getattr(sps, "qpprime_y_zero_transform_bypass_flag", 0):
            self.ll = (pic.qp.astype(np.int64) + 6 * (self.bd - 8)) == 0
        else:
            self.ll = np.zeros(pic.n_mbs, bool)
        dt = np.uint8 if self.bd <= 8 and self.bdc <= 8 else np.uint16
        self.Y = np.zeros((self.h, self.w), dt)
        ch = self.mb_h * self.ch_mb
        self.U = np.zeros((ch, self.w // 2), dt)
        self.V = np.zeros((ch, self.w // 2), dt)

    # ---- availability ----------------------------------------------------

    def _mb_avail(self, naddr: int, addr: int) -> bool:
        if naddr < 0 or naddr >= self.pic.n_mbs:
            return False
        return self.pic.slice_id[naddr] == self.pic.slice_id[addr]

    def _block_avail(self, addr, gbx, gby, cur_code) -> bool:
        """Availability of 4x4 luma block at global block coords for intra
        prediction from the current block (z-order aware)."""
        if gbx < 0 or gby < 0 or gbx >= self.mb_w * 4:
            return False
        naddr = (gby // 4) * self.mb_w + (gbx // 4)
        mbx, mby = gbx // 4, gby // 4
        addr_mbx, addr_mby = addr % self.mb_w, addr // self.mb_w
        if naddr == addr:
            from .mb_parse import RASTER2CODE
            nblk = (gby % 4) * 4 + (gbx % 4)
            return RASTER2CODE[nblk] < cur_code
        if naddr > addr:
            return False
        return self._mb_avail(naddr, addr)

    # ---- reconstruction ---------------------------------------------------

    def run(self, seed=None) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """seed: optional (Y, U, V, inter_done) — planes already holding
        the batched device inter reconstruction (ops/dec_jax.py); inter
        MBs are then skipped here and only intra/IPCM wavefront MBs run
        on the host."""
        pic = self.pic
        res_l, res_c = decode_residuals(pic, self.pps,
                                        bd=(self.bd, self.bdc),
                                        lossless=self.ll)
        inter_done = False
        if seed is not None:
            self.Y[:], self.U[:], self.V[:] = seed[0], seed[1], seed[2]
            inter_done = True
        intra_done = self._intra_recon_native(res_l, res_c, inter_done)
        from .mb_parse import CODE2RASTER
        for addr in range(pic.n_mbs):
            cls = pic.mb_class[addr]
            if cls == MB_INTER:
                if not inter_done:
                    self._recon_inter(addr, res_l, res_c)
            elif cls == MB_I16:
                if not intra_done:
                    self._recon_i16(addr, res_l, res_c)
            elif cls == MB_I4:
                if intra_done:
                    pass
                elif pic.transform8x8[addr]:
                    self._recon_i8(addr, res_l, res_c)
                else:
                    self._recon_i4(addr, res_l, res_c, CODE2RASTER)
            elif cls == MB_IPCM:
                self._recon_ipcm(addr)
        return self.Y, self.U, self.V

    def _intra_recon_native(self, res_l, res_c, inter_done) -> bool:
        """Reconstruct every I4/I8/I16 MB with the native C loop
        (native/jm_dec.cpp intra_recon) when valid: intra prediction
        reads neighboring reconstructed pixels, so inter MBs must
        already be in the planes (device seed) or absent (pure-intra
        picture). IPCM pixels also feed later predictions, so any IPCM
        MB keeps the whole picture on the interleaved host loop."""
        pic = self.pic
        from ..native import available, jm_native
        if not available or not hasattr(jm_native, "intra_recon"):
            return False
        if self.bd != 8 or self.bdc != 8:
            return False          # the C loop is uint8-only
        if self.ll.any():
            return False          # lossless intra needs the DPCM path
        cls = pic.mb_class
        has_intra = bool(((cls == MB_I4) | (cls == MB_I16)).any())
        if not has_intra:
            return False
        if (cls == MB_IPCM).any():
            return False
        if not inter_done and bool((cls == MB_INTER).any()):
            return False
        jm_native.intra_recon(
            {"mb_w": self.mb_w, "mb_h": self.mb_h, "crows": self.crows},
            {"Y": self.Y, "U": self.U, "V": self.V,
             "mb_class": pic.mb_class,
             "transform8x8": pic.transform8x8,
             "i4_modes": pic.i4_modes, "i16_mode": pic.i16_mode,
             "chroma_mode": pic.chroma_mode, "slice_id": pic.slice_id,
             "res_l": np.ascontiguousarray(res_l, np.int32),
             "res_c": np.ascontiguousarray(res_c, np.int32)})
        return True

    # -- intra 4x4 ---------------------------------------------------------

    def _recon_i4(self, addr, res_l, res_c, code2raster):
        pic = self.pic
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        px, py = mbx * 16, mby * 16
        Y = self.Y
        for code in range(16):
            blk = int(code2raster[code])
            by, bx = divmod(blk, 4)
            gx, gy = mbx * 4 + bx, mby * 4 + by
            x, y = gx * 4, gy * 4
            avail_l = self._block_avail(addr, gx - 1, gy, code)
            avail_t = self._block_avail(addr, gx, gy - 1, code)
            avail_tl = self._block_avail(addr, gx - 1, gy - 1, code)
            avail_tr = self._block_avail(addr, gx + 1, gy - 1, code)
            top = np.zeros(8, np.int32)
            left = np.zeros(4, np.int32)
            corner = 0
            if avail_t:
                top[0:4] = Y[y - 1, x:x + 4]
                if avail_tr:
                    top[4:8] = Y[y - 1, x + 4:x + 8]
                else:
                    top[4:8] = Y[y - 1, x + 3]
            if avail_l:
                left[:] = Y[y:y + 4, x - 1]
            if avail_tl:
                corner = int(Y[y - 1, x - 1])
            mode = int(pic.i4_modes[addr, blk])
            pred = I.predict_i4(mode, top, left,
                                corner, avail_t, avail_l, dc=self.dcY)
            res = res_l[addr, blk]
            if self.ll[addr] and mode in (0, 1):
                # lossless intra DPCM (ldecod Inv_Residual_trans_4x4):
                # vertical/horizontal prediction accumulates residuals
                res = np.cumsum(res, axis=0 if mode == 0 else 1)
            Y[y:y + 4, x:x + 4] = np.clip(pred + res, 0, self.maxY)
        self._recon_chroma_intra(addr, res_c)

    def _recon_i8(self, addr, res_l, res_c):
        """Intra 8x8 (High profile) reconstruction: 4 quadrants, filtered
        reference samples (ops.intra.predict_i8)."""
        pic = self.pic
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        Y = self.Y
        for q in range(4):
            qy, qx = q // 2, q % 2
            bx, by = qx * 2, qy * 2            # top-left 4x4 of quadrant
            gx, gy = mbx * 4 + bx, mby * 4 + by
            x, y = gx * 4, gy * 4
            code = int(RASTER2CODE[by * 4 + bx])
            avail_l = self._block_avail(addr, gx - 1, gy, code)
            avail_t = self._block_avail(addr, gx, gy - 1, code)
            avail_tl = self._block_avail(addr, gx - 1, gy - 1, code)
            avail_tr = self._block_avail(addr, gx + 2, gy - 1, code)
            top = np.zeros(16, np.int32)
            left = np.zeros(8, np.int32)
            corner = 0
            if avail_t:
                top[0:8] = Y[y - 1, x:x + 8]
                if avail_tr:
                    top[8:16] = Y[y - 1, x + 8:x + 16]
                else:
                    top[8:16] = Y[y - 1, x + 7]
            if avail_l:
                left[:] = Y[y:y + 8, x - 1]
            if avail_tl:
                corner = int(Y[y - 1, x - 1])
            mode = int(pic.i4_modes[addr, by * 4 + bx])
            pred = I.predict_i8(mode, top, left, corner, avail_t, avail_l,
                                avail_tl, dc=self.dcY)
            res = np.zeros((8, 8), np.int64)
            for dy in range(2):
                for dx in range(2):
                    blk = (by + dy) * 4 + bx + dx
                    res[dy * 4:dy * 4 + 4, dx * 4:dx * 4 + 4] = res_l[addr, blk]
            if self.ll[addr] and mode in (0, 1):
                # lossless I8 DPCM (ldecod Inv_Residual_trans_8x8)
                res = np.cumsum(res, axis=0 if mode == 0 else 1)
            Y[y:y + 8, x:x + 8] = np.clip(pred + res, 0, self.maxY)
        self._recon_chroma_intra(addr, res_c)

    def _recon_i16(self, addr, res_l, res_c):
        pic = self.pic
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        px, py = mbx * 16, mby * 16
        Y = self.Y
        avail_l = self._mb_avail(addr - 1, addr) if mbx > 0 else False
        avail_t = self._mb_avail(addr - self.mb_w, addr)
        avail_tl = (mbx > 0) and self._mb_avail(addr - self.mb_w - 1, addr)
        top = Y[py - 1, px:px + 16].astype(np.int32) if avail_t else np.zeros(16, np.int32)
        left = Y[py:py + 16, px - 1].astype(np.int32) if avail_l else np.zeros(16, np.int32)
        corner = int(Y[py - 1, px - 1]) if avail_tl else 0
        pred = I.predict_i16(int(pic.i16_mode[addr]), top, left, corner,
                             avail_t, avail_l, dc=self.dcY, cmax=self.maxY)
        res = res_l[addr].reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
        mode16 = int(pic.i16_mode[addr])
        if self.ll[addr] and mode16 in (0, 1):
            # lossless I16 DPCM over the whole MB (ldecod
            # Inv_Residual_trans_16x16; 0=VERT_PRED_16, 1=HOR_PRED_16)
            res = np.cumsum(res, axis=0 if mode16 == 0 else 1)
        Y[py:py + 16, px:px + 16] = np.clip(pred + res, 0, self.maxY)
        self._recon_chroma_intra(addr, res_c)

    def _recon_chroma_intra(self, addr, res_c):
        pic = self.pic
        mh = self.ch_mb
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        cx, cy = mbx * 8, mby * mh
        avail_l = self._mb_avail(addr - 1, addr) if mbx > 0 else False
        avail_t = self._mb_avail(addr - self.mb_w, addr)
        avail_tl = (mbx > 0) and self._mb_avail(addr - self.mb_w - 1, addr)
        mode = int(pic.chroma_mode[addr])
        for comp, plane in ((0, self.U), (1, self.V)):
            top = plane[cy - 1, cx:cx + 8].astype(np.int32) if avail_t else np.zeros(8, np.int32)
            left = plane[cy:cy + mh, cx - 1].astype(np.int32) if avail_l else np.zeros(mh, np.int32)
            corner = int(plane[cy - 1, cx - 1]) if avail_tl else 0
            pred = I.predict_chroma(mode, top, left, corner, avail_t,
                                    avail_l, dc=self.dcC, cmax=self.maxC)
            res = res_c[addr, comp].reshape(self.crows, 2, 4, 4) \
                .transpose(0, 2, 1, 3).reshape(mh, 8)
            if self.ll[addr] and mode in (1, 2):
                # lossless chroma DPCM over the whole chroma MB (ldecod
                # block.c:302 Inv_Residual_trans_Chroma; 1=HOR, 2=VERT)
                res = np.cumsum(res, axis=0 if mode == 2 else 1)
            plane[cy:cy + mh, cx:cx + 8] = np.clip(pred + res, 0,
                                                   self.maxC)

    # -- inter -------------------------------------------------------------

    def _mc_4x4(self, ref, px, py, bx, by, mv):
        """(luma 4x4, chroma 2x2 or 2x4) int32 prediction from one ref.

        4:2:2 keeps full vertical chroma resolution: the luma quarter-pel
        vector is used directly vertically (ldecod mc_prediction.c:1092-95
        with subpel_y=3/shiftpel_y=2), which in the eighth-pel bilinear
        below is vector*2 -- identical weights after the doubled shift."""
        mvx, mvy = int(mv[0]), int(mv[1])
        x4 = (px + bx * 4) * 4 + mvx
        y4 = (py + by * 4) * 4 + mvy
        yb = P.mc_luma_block(ref.luma_planes, x4, y4, 4, 4, self.w, self.h)
        cx8 = (px // 2 + bx * 2) * 8 + mvx
        # field decoding: opposite-parity reference shifts the chroma
        # vector by -/+2 quarter-pel (spec 8.4.1.4.1; ldecod
        # mb_prediction.c:145 set_chroma_vector)
        cadj = 0
        if self.cur_parity is not None:
            rpar = getattr(ref, "parity", None)
            if rpar is not None and rpar != self.cur_parity:
                cadj = -2 if self.cur_parity == 0 else 2
        if self.crows == 2:
            cy8 = (py // 2 + by * 2) * 8 + mvy + cadj
            cbh, chh = 2, self.h // 2
        else:
            cy8 = (py + by * 4) * 8 + mvy * 2
            cbh, chh = 4, self.h
        ub = P.mc_chroma_block(ref.chroma_pad[0], cx8, cy8, 2, cbh,
                               self.w // 2, chh)
        vb = P.mc_chroma_block(ref.chroma_pad[1], cx8, cy8, 2, cbh,
                               self.w // 2, chh)
        return yb, ub, vb

    def _recon_inter(self, addr, res_l, res_c):
        pic = self.pic
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        px, py = mbx * 16, mby * 16
        mh = self.ch_mb
        cbh = mh // 4
        pred_y = np.zeros((16, 16), np.int32)
        pred_u = np.zeros((mh, 8), np.int32)
        pred_v = np.zeros((mh, 8), np.int32)
        for blk in range(16):
            by, bx = divmod(blk, 4)
            q = (by // 2) * 2 + (bx // 2)
            pd = int(pic.pdir[addr, q])
            if pd < 0:
                pd = 0  # P paths that don't set pdir
            if pd in (0, 2):
                ref = self.refs[pic.ref_idx[addr, q]]
                y0, u0, v0 = self._mc_4x4(ref, px, py, bx, by, pic.mv[addr, blk])
            if pd in (1, 2):
                ref1 = self.refs1[pic.ref_idx_l1[addr, q]]
                y1, u1, v1 = self._mc_4x4(ref1, px, py, bx, by,
                                          pic.mv_l1[addr, blk])
            wp = self.wp
            if pd == 0:
                yb, ub, vb = y0, u0, v0
                if wp is not None:
                    r = int(pic.ref_idx[addr, q])
                    yb = wp.uni(yb, 0, r, 0)
                    ub = wp.uni(ub, 0, r, 1)
                    vb = wp.uni(vb, 0, r, 2)
            elif pd == 1:
                yb, ub, vb = y1, u1, v1
                if wp is not None:
                    r = int(pic.ref_idx_l1[addr, q])
                    yb = wp.uni(yb, 1, r, 0)
                    ub = wp.uni(ub, 1, r, 1)
                    vb = wp.uni(vb, 1, r, 2)
            elif wp is not None:   # weighted bidirectional (spec 8.4.2.3.2)
                r0 = int(pic.ref_idx[addr, q])
                r1 = int(pic.ref_idx_l1[addr, q])
                yb = wp.bi(y0, y1, r0, r1, 0)
                ub = wp.bi(u0, u1, r0, r1, 1)
                vb = wp.bi(v0, v1, r0, r1, 2)
            else:  # plain bidirectional average (spec 8.4.2.3.1)
                yb = (y0 + y1 + 1) >> 1
                ub = (u0 + u1 + 1) >> 1
                vb = (v0 + v1 + 1) >> 1
            pred_y[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = yb
            pred_u[by * cbh:(by + 1) * cbh, bx * 2:bx * 2 + 2] = ub
            pred_v[by * cbh:(by + 1) * cbh, bx * 2:bx * 2 + 2] = vb
        if pic.sp_mb[addr]:
            # SP slice inter MB: transform-domain requantization of
            # pred+residual at QS (spec 8.6.1; ldecod itrans_sp
            # block.c:395 / itrans_sp_cr block.c:483)
            self.Y[py:py + 16, px:px + 16] = self._sp_luma(addr, pred_y)
            cu, cv = self._sp_chroma(addr, pred_u, pred_v)
            cx, cy = mbx * 8, mby * mh
            self.U[cy:cy + mh, cx:cx + 8] = cu
            self.V[cy:cy + mh, cx:cx + 8] = cv
            return
        res = res_l[addr].reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
        self.Y[py:py + 16, px:px + 16] = np.clip(pred_y + res, 0,
                                                 self.maxY)
        for comp, plane, pr in ((0, self.U, pred_u), (1, self.V, pred_v)):
            resc = res_c[addr, comp].reshape(self.crows, 2, 4, 4) \
                .transpose(0, 2, 1, 3).reshape(mh, 8)
            cx, cy = mbx * 8, mby * mh
            plane[cy:cy + mh, cx:cx + 8] = np.clip(pr + resc, 0, self.maxC)

    def _sp_luma(self, addr, pred_y):
        """itrans_sp for all 16 luma 4x4 blocks (block.c:395). Raw levels
        serve as the recovered coefficients icof: JM stores dequantized
        cof = level * dequant << qp_per and recovers (cof >> qp_per) /
        dequant == level exactly (flat lists; SP profiles carry none)."""
        from ..common.tables import QUANT_SCALE_4x4, DEQUANT_SCALE_4x4
        pic = self.pic
        qp = int(pic.qp[addr])
        qs = int(pic.sp_qs[addr])
        qp_per, qp_rem = qp // 6, qp % 6
        qs_per, qs_rem = qs // 6, qs % 6
        qbits = 15 + qs_per
        Q = QUANT_SCALE_4x4[qs_rem].astype(np.int64)
        D_sp = DEQUANT_SCALE_4x4[qs_rem].astype(np.int64)
        D_qp = DEQUANT_SCALE_4x4[qp_rem].astype(np.int64)
        pred_b = pred_y.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
            .astype(np.int64)                              # (by,bx,4,4)
        PB = _np_fwd4(pred_b)
        lev = _inv_scan_4x4(pic.luma_coef[addr:addr + 1])[0] \
            .reshape(4, 4, 4, 4).astype(np.int64)          # raster (by,bx)
        if pic.sp_switch[addr]:
            il = np.sign(PB) * rshift_rnd_sf(np.abs(PB) * Q, qbits) + lev
        else:
            base = PB + ((lev * D_qp * _SP_A) << qp_per >> 6)
            il = np.sign(base) * rshift_rnd_sf(np.abs(base) * Q, qbits)
        cof = (il * D_sp) << qs_per
        res = _np_inv4(cof)
        rec = np.clip(rshift_rnd_sf(res, 6), 0, 255)
        return rec.transpose(0, 2, 1, 3).reshape(16, 16)

    def _sp_chroma(self, addr, pred_u, pred_v):
        """itrans_sp_cr (block.c:483), 4:2:0: AC blocks like luma, the
        2x2 DC plane requantized through the prediction's 2x2 Hadamard;
        chroma QP is QP_SCALE_CR of the luma QP/QS (no PPS offset —
        block.c:497-500)."""
        from ..common.tables import QUANT_SCALE_4x4, DEQUANT_SCALE_4x4
        pic = self.pic
        qpc = chroma_qp(int(pic.qp[addr]), 0)
        qsc = chroma_qp(int(pic.sp_qs[addr]), 0)
        qp_per, qp_rem = qpc // 6, qpc % 6
        qs_per, qs_rem = qsc // 6, qsc % 6
        qbits = 15 + qs_per
        Q = QUANT_SCALE_4x4[qs_rem].astype(np.int64)
        D_sp = DEQUANT_SCALE_4x4[qs_rem].astype(np.int64)
        D_qp = DEQUANT_SCALE_4x4[qp_rem].astype(np.int64)
        sw = bool(pic.sp_switch[addr])
        out = []
        for comp, pred in ((0, pred_u), (1, pred_v)):
            pred_b = pred.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .astype(np.int64)                          # (by,bx,4,4)
            PB = _np_fwd4(pred_b)
            # 2x2 Hadamard of the prediction DCs (mp1)
            pdc = PB[:, :, 0, 0]                           # (2,2) [by][bx]
            mp1 = np.array([
                pdc[0, 0] + pdc[1, 0] + pdc[0, 1] + pdc[1, 1],
                pdc[0, 0] - pdc[1, 0] + pdc[0, 1] - pdc[1, 1],
                pdc[0, 0] + pdc[1, 0] - pdc[0, 1] - pdc[1, 1],
                pdc[0, 0] - pdc[1, 0] - pdc[0, 1] + pdc[1, 1]], np.int64)
            lev = _inv_scan_4x4(
                pic.chroma_coef[addr:addr + 1, comp])[0] \
                .reshape(2, 2, 4, 4).astype(np.int64)      # raster (by,bx)
            dc_lev = pic.chroma_dc[addr, comp].astype(np.int64)  # (4,) scan
            dcl = np.array([dc_lev[0], dc_lev[1], dc_lev[2], dc_lev[3]],
                           np.int64)            # [n1 + 2*n2] = [bx + 2*by]
            if sw:
                ildc = np.sign(mp1) * rshift_rnd_sf(
                    np.abs(mp1) * int(Q[0, 0]), qbits + 1) + dcl
                mp1q = (ildc * int(D_sp[0, 0])) << qs_per
                il = np.sign(PB) * rshift_rnd_sf(np.abs(PB) * Q, qbits) + lev
            else:
                bdc = mp1 + ((dcl * int(D_qp[0, 0]) * 16) << qp_per >> 5)
                ildc = np.sign(bdc) * rshift_rnd_sf(
                    np.abs(bdc) * int(Q[0, 0]), qbits + 1)
                mp1q = (ildc * int(D_sp[0, 0])) << qs_per
                base = PB + ((lev * D_qp * _SP_A) << qp_per >> 6)
                il = np.sign(base) * rshift_rnd_sf(np.abs(base) * Q, qbits)
            cof = (il * D_sp) << qs_per
            # inverse 2x2 Hadamard of the requantized DC plane
            cof[0, 0, 0, 0] = (mp1q[0] + mp1q[1] + mp1q[2] + mp1q[3]) >> 1
            cof[0, 1, 0, 0] = (mp1q[0] + mp1q[1] - mp1q[2] - mp1q[3]) >> 1
            cof[1, 0, 0, 0] = (mp1q[0] - mp1q[1] + mp1q[2] - mp1q[3]) >> 1
            cof[1, 1, 0, 0] = (mp1q[0] - mp1q[1] - mp1q[2] + mp1q[3]) >> 1
            res = _np_inv4(cof)
            rec = np.clip(rshift_rnd_sf(res, 6), 0, 255)
            out.append(rec.transpose(0, 2, 1, 3).reshape(8, 8))
        return out

    def _recon_ipcm(self, addr):
        pic = self.pic
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        self.Y[mby * 16:mby * 16 + 16, mbx * 16:mbx * 16 + 16] = pic.ipcm_luma[addr]
        ch = pic.ipcm_chroma[addr]
        if ch is not None:
            mh = self.ch_mb
            self.U[mby * mh:(mby + 1) * mh, mbx * 8:mbx * 8 + 8] = ch[0]
            self.V[mby * mh:(mby + 1) * mh, mbx * 8:mbx * 8 + 8] = ch[1]
