"""CABAC macroblock-layer serialization (spec 7.3.5 + 9.3).

The exact inverse of jm_tpu.decoder.mb_parse_cabac for the encoder's
full mode set: I (I4x4/I8x8/I16x16/IPCM), P (Skip/16x16/16x8/8x16/P8x8
sub-partitions + intra), B (Direct/list0/list1/bi partitions), 8x8
transform, multi-ref. Neighbor context derivations mirror the reader's;
correctness is enforced by decode-back tests and ldecod conformance.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitwriter import BitWriter
from ..common.predict_ctx import CODE2RASTER, PredCtx
from ..common.types import SliceType
from ..decoder.cabac import (CHROMA_AC, CHROMA_DC, LUMA_4x4, LUMA_16AC,
                             LUMA_16DC, C1ISDC, MAX_C2, MAXPOS,
                             TYPE2CTX_ABS, TYPE2CTX_BCBP, TYPE2CTX_LAST,
                             TYPE2CTX_MAP, TYPE2CTX_ONE, CabacContexts,
                             pos2ctx_last, pos2ctx_map)
from ..decoder.mb_parse import MB_I4, MB_I16, MB_INTER, MB_IPCM
from .cabac_write import CabacEncoder


def _get_bit(v, b):
    return (int(v) >> b) & 1


class MBWriterCABAC:
    def __init__(self, bw: BitWriter, pic, sps, pps, slice_type: SliceType,
                 slice_qp: int, cabac_init_idc: int = 0, num_ref: int = 1):
        self.num_ref = num_ref
        self.pic = pic
        self.sps = sps
        self.pps = pps
        self.stype = slice_type
        self.pctx = PredCtx(pic)
        self.mb_w = pic.mb_w
        self.qp = slice_qp
        self.eng = CabacEncoder(bw)
        is_intra = slice_type in (SliceType.I, SliceType.SI)
        self.ctxs = CabacContexts(is_intra, cabac_init_idc, slice_qp)
        self.last_dquant = 0

    # ---- neighbor helpers (mirror of MBParserCABAC) ----------------------

    def _left_mb(self, addr):
        naddr = addr - 1 if addr % self.mb_w else -1
        return naddr if naddr >= 0 and self.pctx.avail(naddr, addr) else -1

    def _up_mb(self, addr):
        naddr = addr - self.mb_w
        return naddr if naddr >= 0 and self.pctx.avail(naddr, addr) else -1

    def _blk_neighbor(self, addr, bx, by):
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        gx, gy = mbx * 4 + bx, mby * 4 + by
        if gx < 0 or gy < 0 or gx >= self.mb_w * 4:
            return None
        naddr = (gy // 4) * self.mb_w + (gx // 4)
        if naddr != addr and (naddr > addr or not self.pctx.avail(naddr, addr)):
            return None
        return naddr, (gy % 4) * 4 + (gx % 4)

    def _cblk_neighbor(self, addr, cx, cy):
        crows = self.pic.n_crows
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        gx, gy = mbx * 2 + cx, mby * crows + cy
        if gx < 0 or gy < 0 or gx >= self.mb_w * 2:
            return None
        naddr = (gy // crows) * self.mb_w + (gx // 2)
        if naddr != addr and (naddr > addr or not self.pctx.avail(naddr, addr)):
            return None
        return naddr, (gy % crows) * 2 + (gx % 2)

    # ---- element writers --------------------------------------------------

    def write_skip_flag_p(self, addr, skipped: bool):
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and not pic.skip[la]) else 0
        b = 1 if (ua >= 0 and not pic.skip[ua]) else 0
        self.eng.decision(self.ctxs.mb_type[1], a + b, 1 if skipped else 0)

    def write_mb_type_i(self, addr, imb: int):
        eng, ctx = self.eng, self.ctxs.mb_type[0]
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.mb_class[la] != MB_I4) else 0
        b = 1 if (ua >= 0 and pic.mb_class[ua] != MB_I4) else 0
        if imb == 0:
            eng.decision(ctx, a + b, 0)
            return
        eng.decision(ctx, a + b, 1)
        eng.terminate(0)       # not IPCM
        k = imb - 1
        eng.decision(ctx, 4, 1 if k >= 12 else 0)
        cc = (k // 4) % 3
        eng.decision(ctx, 5, 1 if cc else 0)
        if cc:
            eng.decision(ctx, 6, 1 if cc == 2 else 0)
        eng.decision(ctx, 7, (k % 4) >> 1)
        eng.decision(ctx, 8, (k % 4) & 1)

    def write_mb_type_p(self, internal: int):
        """internal: 1..4 inter, 6 = I4, 7..30 = I16."""
        eng, ctx = self.eng, self.ctxs.mb_type[1]
        if internal == 1:
            eng.decision(ctx, 4, 0)
            eng.decision(ctx, 5, 0)
            eng.decision(ctx, 6, 0)
        elif internal == 2:
            eng.decision(ctx, 4, 0)
            eng.decision(ctx, 5, 1)
            eng.decision(ctx, 7, 1)
        elif internal == 3:
            eng.decision(ctx, 4, 0)
            eng.decision(ctx, 5, 1)
            eng.decision(ctx, 7, 0)
        elif internal == 4:
            eng.decision(ctx, 4, 0)
            eng.decision(ctx, 5, 0)
            eng.decision(ctx, 6, 1)
        elif internal == 6:
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 7, 0)
        else:
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 7, 1)
            eng.terminate(0)
            j = internal - 7
            eng.decision(ctx, 8, 1 if j >= 12 else 0)
            cc = (j // 4) % 3
            eng.decision(ctx, 9, 1 if cc else 0)
            if cc:
                eng.decision(ctx, 9, 1 if cc == 2 else 0)
            eng.decision(ctx, 10, (j % 4) >> 1)
            eng.decision(ctx, 10, (j % 4) & 1)

    def write_skip_flag_b(self, addr, skipped: bool):
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and not pic.skip[la]) else 0
        b = 1 if (ua >= 0 and not pic.skip[ua]) else 0
        self.eng.decision(self.ctxs.mb_type[2], 7 + a + b,
                          1 if skipped else 0)

    def write_mb_type_b(self, addr, coded: int):
        """Mirror of MBParserCABAC.read_mb_type_b: 0=direct, 1..21
        partitions, 22=B8x8, 23=I4, 24..47=I16."""
        eng, pic = self.eng, self.pic
        ctx = self.ctxs.mb_type[2]
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and not (pic.skip[la] or pic.b_direct[la])) else 0
        b = 1 if (ua >= 0 and not (pic.skip[ua] or pic.b_direct[ua])) else 0
        if coded == 0:
            eng.decision(ctx, a + b, 0)
            return
        eng.decision(ctx, a + b, 1)
        if coded in (1, 2):
            eng.decision(ctx, 4, 0)
            eng.decision(ctx, 6, coded - 1)
        elif 3 <= coded <= 10:
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 5, 0)
            k = coded - 3
            eng.decision(ctx, 6, (k >> 2) & 1)
            eng.decision(ctx, 6, (k >> 1) & 1)
            eng.decision(ctx, 6, k & 1)
        else:
            # high branch: raw = 12 + 8b+4b+2b, then remap/extra bit
            if coded == 11:
                raw, extra = 24, None
            elif coded == 22:
                raw, extra = 26, None
            elif coded in (23, 24):
                raw, extra = 22, coded - 23
            else:          # 12..21
                raw = 12 + ((coded - 12) & ~1)
                extra = (coded - 12) & 1
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 5, 1)
            k = raw - 12
            eng.decision(ctx, 6, (k >> 3) & 1)
            eng.decision(ctx, 6, (k >> 2) & 1)
            eng.decision(ctx, 6, (k >> 1) & 1)
            if extra is not None:
                eng.decision(ctx, 6, extra)
        if coded == 24:    # Intra16x16 escape continues on mb_type[1]
            eng.terminate(0)   # not IPCM

    def write_mb_type_b_i16(self, k: int):
        """I16 continuation after the 24 escape (k = imb_type - 1 of the
        intra convention: 0..23)."""
        eng, ctx1 = self.eng, self.ctxs.mb_type[1]
        eng.decision(ctx1, 8, 1 if k >= 12 else 0)
        cc = (k // 4) % 3
        eng.decision(ctx1, 9, 1 if cc else 0)
        if cc:
            eng.decision(ctx1, 9, 1 if cc == 2 else 0)
        eng.decision(ctx1, 10, (k % 4) >> 1)
        eng.decision(ctx1, 10, (k % 4) & 1)

    def write_intra4_mode(self, mode: int, pred: int):
        eng, ctx = self.eng, self.ctxs.ipr
        if mode == pred:
            eng.decision(ctx, 0, 1)
            return
        eng.decision(ctx, 0, 0)
        rem = mode if mode < pred else mode - 1
        eng.decision(ctx, 1, rem & 1)
        eng.decision(ctx, 1, (rem >> 1) & 1)
        eng.decision(ctx, 1, (rem >> 2) & 1)

    def write_chroma_pred_mode(self, addr, mode: int):
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.chroma_mode[la] != 0
                  and pic.mb_class[la] != MB_IPCM) else 0
        b = 1 if (ua >= 0 and pic.chroma_mode[ua] != 0
                  and pic.mb_class[ua] != MB_IPCM) else 0
        if mode == 0:
            self.eng.decision(self.ctxs.cipr, a + b, 0)
            return
        self.eng.decision(self.ctxs.cipr, a + b, 1)
        self.eng.unary_max(self.ctxs.cipr, 3, 3, mode - 1, 1)

    def write_mvd(self, addr, bx, by, comp, value: int, lst=0):
        pic = self.pic
        a = 0
        na = self._blk_neighbor(addr, bx - 1, by)
        nb = self._blk_neighbor(addr, bx, by - 1)
        if na is not None:
            a += abs(int(pic.mvd[na[0], lst, na[1], comp]))
        if nb is not None:
            a += abs(int(pic.mvd[nb[0], lst, nb[1], comp]))
        if a < 3:
            cidx = 5 * comp
        elif a > 32:
            cidx = 5 * comp + 3
        else:
            cidx = 5 * comp + 2
        if value == 0:
            self.eng.decision(self.ctxs.mv_res[0], cidx, 0)
            return
        self.eng.decision(self.ctxs.mv_res[0], cidx, 1)
        self.eng.ueg3_mv(self.ctxs.mv_res[1], 5 * comp, abs(value) - 1)
        self.eng.bypass(1 if value < 0 else 0)

    def write_dquant(self, dq: int):
        cidx = 1 if self.last_dquant != 0 else 0
        if dq == 0:
            self.eng.decision(self.ctxs.delta_qp, cidx, 0)
        else:
            self.eng.decision(self.ctxs.delta_qp, cidx, 1)
            act = 2 * abs(dq) - (1 if dq > 0 else 0)
            self.eng.unary(self.ctxs.delta_qp, 2, 3, act - 1)
        self.last_dquant = dq

    def write_cbp(self, addr, cbp: int):
        eng, pic = self.eng, self.pic
        ua = self._up_mb(addr)
        la = self._left_mb(addr)
        part = 0
        for mb_y in (0, 2):
            for mb_x in (0, 2):
                if mb_y == 0:
                    b = 0
                    if ua >= 0 and pic.mb_class[ua] != MB_IPCM:
                        b = 2 if (int(pic.cbp[ua]) & (1 << (2 + (mb_x >> 1)))) == 0 else 0
                else:
                    b = 2 if (part & (1 << (mb_x >> 1))) == 0 else 0
                if mb_x == 0:
                    nb = self._blk_neighbor(addr, -1, mb_y)
                    if nb is not None:
                        naddr, nblk = nb
                        if pic.mb_class[naddr] == MB_IPCM:
                            a = 0
                        else:
                            ny = nblk // 4
                            a = 1 if (int(pic.cbp[naddr]) & (1 << (2 * (ny // 2) + 1))) == 0 else 0
                    else:
                        a = 0
                else:
                    a = 1 if (part & (1 << mb_y)) == 0 else 0
                mask = 1 << (mb_y + (mb_x >> 1))
                bit = 1 if (cbp & mask) else 0
                eng.decision(self.ctxs.cbp[0], a + b, bit)
                if bit:
                    part += mask
        b = 2 if (ua >= 0 and (pic.mb_class[ua] == MB_IPCM or pic.cbp[ua] > 15)) else 0
        a = 1 if (la >= 0 and (pic.mb_class[la] == MB_IPCM or pic.cbp[la] > 15)) else 0
        cc = cbp >> 4
        eng.decision(self.ctxs.cbp[1], a + b, 1 if cc else 0)
        if cc:
            b = 2 if (ua >= 0 and (pic.mb_class[ua] == MB_IPCM
                                   or (int(pic.cbp[ua]) >> 4) == 2)) else 0
            a = 1 if (la >= 0 and (pic.mb_class[la] == MB_IPCM
                                   or (int(pic.cbp[la]) >> 4) == 2)) else 0
            eng.decision(self.ctxs.cbp[2], a + b, 1 if cc == 2 else 0)

    # ---- residual ---------------------------------------------------------

    def _cbf(self, addr, block_type, coeff_present, bx=0, by=0, comp=0):
        """Write coded_block_flag; mirror of MBParserCABAC._cbf."""
        pic, eng = self.pic, self.eng
        ctx, bit0 = self.cbf_ctx(addr, block_type, bx, by, comp)
        bit = 1 if coeff_present else 0
        eng.decision(self.ctxs.bcbp[TYPE2CTX_BCBP[block_type]], ctx, bit)
        if bit:
            pic.cbp_bits[addr] |= np.int64(1) << bit0
        return bit

    def cbf_ctx(self, addr, block_type, bx=0, by=0, comp=0):
        """coded_block_flag context (2*upper + left) and the cbp_bits slot
        for this block — shared by the writer and the RDOQ bit estimator
        (rdoq_cabac.c est_write_and_store_CBP_block_bit neighbor logic)."""
        pic = self.pic
        is_intra = pic.mb_class[addr] != MB_INTER
        if block_type == LUMA_16DC:
            ub = lb = 1
            la, ua = self._left_mb(addr), self._up_mb(addr)
            if ua >= 0:
                ub = 1 if pic.mb_class[ua] == MB_IPCM else _get_bit(pic.cbp_bits[ua], 0)
            if la >= 0:
                lb = 1 if pic.mb_class[la] == MB_IPCM else _get_bit(pic.cbp_bits[la], 0)
            ctx = 2 * ub + lb
            bit0 = 0
        elif block_type in (LUMA_16AC, LUMA_4x4):
            default = 1 if is_intra else 0
            ub = lb = default
            nb = self._blk_neighbor(addr, bx, by - 1)
            na = self._blk_neighbor(addr, bx - 1, by)
            if nb is not None:
                naddr, nblk = nb
                ub = 1 if pic.mb_class[naddr] == MB_IPCM else \
                    _get_bit(pic.cbp_bits[naddr], 1 + nblk)
            if na is not None:
                naddr, nblk = na
                lb = 1 if pic.mb_class[naddr] == MB_IPCM else \
                    _get_bit(pic.cbp_bits[naddr], 1 + nblk)
            ctx = 2 * ub + lb
            bit0 = 1 + by * 4 + bx
        elif block_type in (CHROMA_DC, 8):      # 8 = CHROMA_DC_2x4 (4:2:2)
            default = 1 if is_intra else 0
            ub = lb = default
            bit = 17 if comp == 0 else 18
            la, ua = self._left_mb(addr), self._up_mb(addr)
            if ua >= 0:
                ub = 1 if pic.mb_class[ua] == MB_IPCM else _get_bit(pic.cbp_bits[ua], bit)
            if la >= 0:
                lb = 1 if pic.mb_class[la] == MB_IPCM else _get_bit(pic.cbp_bits[la], bit)
            ctx = 2 * ub + lb
            bit0 = bit
        elif block_type == CHROMA_AC:
            default = 1 if is_intra else 0
            ub = lb = default
            base = 19 if comp == 0 else 35
            nb = self._cblk_neighbor(addr, bx, by - 1)
            na = self._cblk_neighbor(addr, bx - 1, by)
            if nb is not None:
                naddr, nblk = nb
                ny, nx = nblk // 2, nblk % 2
                ub = 1 if pic.mb_class[naddr] == MB_IPCM else \
                    _get_bit(pic.cbp_bits[naddr], base + 4 * ny + nx)
            if na is not None:
                naddr, nblk = na
                ny, nx = nblk // 2, nblk % 2
                lb = 1 if pic.mb_class[naddr] == MB_IPCM else \
                    _get_bit(pic.cbp_bits[naddr], base + 4 * ny + nx)
            ctx = 2 * ub + lb
            bit0 = base + 4 * by + bx
        else:
            raise NotImplementedError
        return ctx, bit0

    def _write_sig_and_levels(self, block_type, coeff):
        """Inverse of read_significance_and_levels; coeff: scan-order
        effective positions, length maxpos+1, at least one nonzero."""
        eng, ctxs = self.eng, self.ctxs
        maxp = MAXPOS[block_type]
        n = maxp + 1
        p2m = pos2ctx_map(block_type)
        p2l = pos2ctx_last(block_type)
        map_ctx = ctxs.map[TYPE2CTX_MAP[block_type]]
        last_ctx = ctxs.last[TYPE2CTX_LAST[block_type]]
        off = 0 if C1ISDC[block_type] else 1
        nz = np.flatnonzero(coeff)
        last = int(nz[-1])
        for k in range(min(last + 1, n - 1)):
            i = k + off
            sig = coeff[k] != 0
            eng.decision(map_ctx, p2m[i], 1 if sig else 0)
            if sig:
                eng.decision(last_ctx, p2l[i], 1 if k == last else 0)
                if k == last:
                    break
        one_ctx = ctxs.one[TYPE2CTX_ONE[block_type]]
        abs_ctx = ctxs.abs[TYPE2CTX_ABS[block_type]]
        c1, c2 = 1, 0
        for i in range(last, -1, -1):
            v = int(coeff[i])
            if v == 0:
                continue
            av = abs(v)
            eng.decision(one_ctx, c1, 1 if av > 1 else 0)
            if av > 1:
                eng.ueg0_level(abs_ctx, c2, av - 2)
                c2 = min(c2 + 1, MAX_C2[block_type])
                c1 = 0
            elif c1:
                c1 = min(c1 + 1, 4)
            eng.bypass(1 if v < 0 else 0)

    def _write_block(self, addr, block_type, coeff, bx=0, by=0, comp=0):
        present = bool(np.any(coeff))
        if self._cbf(addr, block_type, present, bx, by, comp):
            self._write_sig_and_levels(block_type, coeff)

    def write_transform_size(self, addr, flag: bool):
        """Mirror of MBParserCABAC.read_transform_size ctx derivation."""
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.transform8x8[la]) else 0
        b = 1 if (ua >= 0 and pic.transform8x8[ua]) else 0
        self.eng.decision(self.ctxs.transform_size, a + b, 1 if flag else 0)

    def _write_luma_residual_8x8(self, addr, cbp):
        """CABAC 8x8: LUMA_8x8 category, no coded_block_flag; marks the
        0x33 cbf-bit pattern exactly like the parser for later contexts."""
        from ..decoder.cabac import LUMA_8x8
        pic = self.pic
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            coeff = pic.luma_coef8[addr, blk8]
            self._write_sig_and_levels(LUMA_8x8, coeff)
            by0, bx0 = (blk8 // 2) * 2, (blk8 % 2) * 2
            if (coeff != 0).any():
                bit = 1 + by0 * 4 + bx0
                pic.cbp_bits[addr] |= np.int64(0x33) << bit

    def _write_luma_residual(self, addr, cbp, is_i16):
        pic = self.pic
        if is_i16:
            self._write_block(addr, LUMA_16DC, pic.luma_dc[addr])
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            for sub in range(4):
                blk = int(CODE2RASTER[blk8 * 4 + sub])
                by, bx = divmod(blk, 4)
                if is_i16:
                    self._write_block(addr, LUMA_16AC,
                                      pic.luma_coef[addr, blk, 1:16], bx, by)
                else:
                    self._write_block(addr, LUMA_4x4,
                                      pic.luma_coef[addr, blk], bx, by)

    def _write_chroma_residual(self, addr, cbp):
        from ..decoder.cabac import CHROMA_DC_2x4
        pic = self.pic
        cc = cbp >> 4
        dc_type = CHROMA_DC_2x4 if pic.n_crows == 4 else CHROMA_DC
        if cc & 3:
            for comp in range(2):
                self._write_block(addr, dc_type, pic.chroma_dc[addr, comp],
                                  comp=comp)
        if cc & 2:
            for comp in range(2):
                for blk in range(2 * pic.n_crows):
                    by, bx = divmod(blk, 2)
                    self._write_block(addr, CHROMA_AC,
                                      pic.chroma_coef[addr, comp, blk, 1:16],
                                      bx, by, comp)

    # ---- MB dispatch -------------------------------------------------------

    def _dquant_for(self, addr):
        dq = int(self.pic.qp[addr]) - self.qp
        if dq > 25:
            dq -= 52
        elif dq < -26:
            dq += 52
        self.qp = int(self.pic.qp[addr])
        return dq

    def _write_ipcm(self, addr, p_slice: bool, b_slice: bool):
        """I_PCM in CABAC (lencod macroblock.c writeIPCMData:1965): encode
        the mb_type prefix, terminate(1) flushes the arithmetic coder,
        then aligned raw samples, then a fresh engine (contexts kept)."""
        pic, eng = self.pic, self.eng
        if b_slice:
            ctx = self.ctxs.mb_type[2]
            la, ua = self._left_mb(addr), self._up_mb(addr)
            a = 1 if (la >= 0 and not (pic.skip[la] or pic.b_direct[la])) \
                else 0
            b = 1 if (ua >= 0 and not (pic.skip[ua] or pic.b_direct[ua])) \
                else 0
            eng.decision(ctx, a + b, 1)
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 5, 1)
            eng.decision(ctx, 6, 1)  # raw 12+8
            eng.decision(ctx, 6, 0)
            eng.decision(ctx, 6, 1)  # +2 -> raw 22 (remapped to 23)
            eng.decision(ctx, 6, 1)  # +1 -> 24 (I16/IPCM escape)
            eng.terminate(1)
        elif p_slice:
            ctx = self.ctxs.mb_type[1]
            eng.decision(ctx, 4, 1)
            eng.decision(ctx, 7, 1)
            eng.terminate(1)
        else:
            ctx = self.ctxs.mb_type[0]
            la, ua = self._left_mb(addr), self._up_mb(addr)
            a = 1 if (la >= 0 and pic.mb_class[la] != MB_I4) else 0
            b = 1 if (ua >= 0 and pic.mb_class[ua] != MB_I4) else 0
            eng.decision(ctx, a + b, 1)
            eng.terminate(1)
        bw = self.eng.bw
        pos0 = bw.bitpos
        bw.align_zero()              # pcm_alignment_zero_bit
        for v in pic.ipcm_luma[addr].ravel():
            bw.u(int(v), 8)
        ch = pic.ipcm_chroma[addr]
        if ch is not None:
            for v in ch.ravel():
                bw.u(int(v), 8)
        ne = CabacEncoder(bw)
        # keep the exact-rate accounting continuous across the engine
        # restart (alignment + raw sample bits included)
        ne.bits_out = self.eng.bits_out + (bw.bitpos - pos0)
        self.eng = ne
        self.last_dquant = 0

    def _write_intra_mb(self, addr, p_slice: bool, b_slice: bool = False):
        pic = self.pic
        if pic.mb_class[addr] == MB_IPCM:
            self._write_ipcm(addr, p_slice, b_slice)
            return
        if pic.mb_class[addr] == MB_I4:
            imb = 0
        else:
            k = 1 + int(pic.i16_mode[addr]) + ((int(pic.cbp[addr]) >> 4) << 2) \
                + (12 if (pic.cbp[addr] & 15) else 0)
            imb = k
        if b_slice:
            if imb == 0:
                self.write_mb_type_b(addr, 23)
            else:
                self.write_mb_type_b(addr, 24)
                self.write_mb_type_b_i16(imb - 1)
        elif p_slice:
            self.write_mb_type_p(6 if imb == 0 else 6 + imb)
        else:
            self.write_mb_type_i(addr, imb)
        cbp = int(pic.cbp[addr])
        if imb == 0:
            if self.pps.transform_8x8_mode_flag:
                self.write_transform_size(addr, False)
            for code_idx in range(16):
                blk = int(CODE2RASTER[code_idx])
                pred = self.pctx.pred_intra4_mode(addr, blk)
                self.write_intra4_mode(int(pic.i4_modes[addr, blk]), pred)
            self.write_chroma_pred_mode(addr, int(pic.chroma_mode[addr]))
            self.write_cbp(addr, cbp)
            if cbp:
                self.write_dquant(self._dquant_for(addr))
            else:
                self.last_dquant = 0
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
            self._write_chroma_residual(addr, cbp)
        else:
            self.write_chroma_pred_mode(addr, int(pic.chroma_mode[addr]))
            self.write_dquant(self._dquant_for(addr))
            self._write_luma_residual(addr, cbp & 15, is_i16=True)
            self._write_chroma_residual(addr, cbp)

    PARTS = {0: [(0, 0, 4, 4)],
             1: [(0, 0, 4, 2), (0, 2, 4, 2)],
             2: [(0, 0, 2, 4), (2, 0, 2, 4)],
             3: [(0, 0, 2, 2), (2, 0, 2, 2), (0, 2, 2, 2), (2, 2, 2, 2)]}

    def write_ref_idx(self, addr, bx, by, value: int, lst: int = 0):
        pic = self.pic
        ref_arr = pic.ref_idx if lst == 0 else pic.ref_idx_l1

        def term(nb):
            if nb is None:
                return 0
            naddr, nblk = nb
            q = (nblk // 8) * 2 + ((nblk % 4) // 2)
            if pic.mb_class[naddr] == MB_IPCM:
                return 0
            if pic.skip[naddr] or pic.b_direct[naddr] or pic.b8_direct[naddr, q]:
                return 0
            return 1 if ref_arr[naddr, q] > 0 else 0

        b = 2 * term(self._blk_neighbor(addr, bx, by - 1))
        a = term(self._blk_neighbor(addr, bx - 1, by))
        if value == 0:
            self.eng.decision(self.ctxs.ref_no[0], a + b, 0)
        else:
            self.eng.decision(self.ctxs.ref_no[0], a + b, 1)
            self.eng.unary(self.ctxs.ref_no[0], 4, 5, value - 1)

    def write_sub_mb_type_p(self, sm: int):
        """Inverse of read_sub_mb_type_p: 0=8x8 1=8x4 2=4x8 3=4x4."""
        eng, ctx = self.eng, self.ctxs.b8_type[0]
        if sm == 0:
            eng.decision(ctx, 1, 1)
            return
        eng.decision(ctx, 1, 0)
        if sm == 1:
            eng.decision(ctx, 3, 0)
        else:
            eng.decision(ctx, 3, 1)
            eng.decision(ctx, 4, 1 if sm == 2 else 0)

    def _write_p_inter_mb(self, addr, num_ref=1):
        pic = self.pic
        mode = int(pic.inter_mode[addr])
        if mode < 0:
            mode = 0
        self.write_mb_type_p(mode + 1)
        parts = self.PARTS[mode]

        def emit_mvd(bx, by, bw_, bh_, ref):
            pred = self.pctx.mv_pred(addr, bx, by, bw_, bh_, ref)
            mv = pic.mv[addr, by * 4 + bx]
            mvdx, mvdy = int(mv[0] - pred[0]), int(mv[1] - pred[1])
            self.write_mvd(addr, bx, by, 0, mvdx)
            self.write_mvd(addr, bx, by, 1, mvdy)
            for yy in range(by, by + bh_):
                for xx in range(bx, bx + bw_):
                    pic.mvd[addr, 0, yy * 4 + xx] = (mvdx, mvdy)

        if mode == 3:
            from .me import SUB_PARTS
            for q in range(4):
                self.write_sub_mb_type_p(int(pic.sub_mode[addr, q]))
            if num_ref > 1:
                for q in range(4):
                    qx, qy = (q % 2) * 2, (q // 2) * 2
                    self.write_ref_idx(addr, qx, qy,
                                       int(pic.ref_idx[addr, q]))
            for q in range(4):
                qx, qy = (q % 2) * 2, (q // 2) * 2
                ref = int(pic.ref_idx[addr, q])
                for (sx, sy, sw, sh) in SUB_PARTS[int(pic.sub_mode[addr, q])]:
                    emit_mvd(qx + sx, qy + sy, sw, sh, ref)
        else:
            if num_ref > 1:
                for (bx, by, _w, _h) in parts:
                    q = (by // 2) * 2 + bx // 2
                    self.write_ref_idx(addr, bx, by,
                                       int(pic.ref_idx[addr, q]))
            for (bx, by, bw_, bh_) in parts:
                q = (by // 2) * 2 + bx // 2
                emit_mvd(bx, by, bw_, bh_, int(pic.ref_idx[addr, q]))
        cbp = int(pic.cbp[addr])
        self.write_cbp(addr, cbp)
        allow8 = mode != 3 or not pic.sub_mode[addr].any()
        if self.pps.transform_8x8_mode_flag and (cbp & 15) and allow8:
            self.write_transform_size(addr, bool(pic.transform8x8[addr]))
        if cbp:
            self.write_dquant(self._dquant_for(addr))
        else:
            self.last_dquant = 0
        if pic.transform8x8[addr]:
            self._write_luma_residual_8x8(addr, cbp & 15)
        else:
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
        self._write_chroma_residual(addr, cbp)

    def _write_b_inter_mb(self, addr, nref0=1, nref1=1):
        """Mirror of MBParserCABAC._parse_b_mb for the encoder's mode set
        (direct-with-residual + 16x16 L0/L1/BI)."""
        from ..decoder.b_slice import PD_BI, PD_L0, PD_L1
        pic = self.pic
        if pic.b_direct[addr]:
            self.write_mb_type_b(addr, 0)
        else:
            pd = int(pic.pdir[addr, 0])
            self.write_mb_type_b(addr, {PD_L0: 1, PD_L1: 2, PD_BI: 3}[pd])
            if pd in (PD_L0, PD_BI) and nref0 > 1:
                self.write_ref_idx(addr, 0, 0, int(pic.ref_idx[addr, 0]), 0)
            if pd in (PD_L1, PD_BI) and nref1 > 1:
                self.write_ref_idx(addr, 0, 0, int(pic.ref_idx_l1[addr, 0]), 1)
            for lst in (0, 1):
                if (lst == 0 and pd in (PD_L0, PD_BI)) or \
                        (lst == 1 and pd in (PD_L1, PD_BI)):
                    ref = int((pic.ref_idx if lst == 0 else
                               pic.ref_idx_l1)[addr, 0])
                    pred = self.pctx.mv_pred(addr, 0, 0, 4, 4, ref, lst)
                    mv = (pic.mv if lst == 0 else pic.mv_l1)[addr, 0]
                    mvdx = int(mv[0] - pred[0])
                    mvdy = int(mv[1] - pred[1])
                    self.write_mvd(addr, 0, 0, 0, mvdx, lst)
                    self.write_mvd(addr, 0, 0, 1, mvdy, lst)
                    for blk in range(16):
                        pic.mvd[addr, lst, blk] = (mvdx, mvdy)
        cbp = int(pic.cbp[addr])
        self.write_cbp(addr, cbp)
        if self.pps.transform_8x8_mode_flag and (cbp & 15):
            self.write_transform_size(addr, bool(pic.transform8x8[addr]))
        if cbp:
            self.write_dquant(self._dquant_for(addr))
        else:
            self.last_dquant = 0
        if pic.transform8x8[addr]:
            self._write_luma_residual_8x8(addr, cbp & 15)
        else:
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
        self._write_chroma_residual(addr, cbp)

    def write_mb(self, addr):
        pic = self.pic
        if self.stype == SliceType.P:
            skipped = bool(pic.skip[addr])
            self.write_skip_flag_p(addr, skipped)
            if skipped:
                self.last_dquant = 0
                return
            if pic.mb_class[addr] == MB_INTER:
                self._write_p_inter_mb(addr, self.num_ref)
            else:
                self._write_intra_mb(addr, p_slice=True)
        elif self.stype == SliceType.B:
            skipped = bool(pic.skip[addr])
            self.write_skip_flag_b(addr, skipped)
            if skipped:
                self.last_dquant = 0
                return
            if pic.mb_class[addr] == MB_INTER:
                self._write_b_inter_mb(addr, self.num_ref, self.num_ref_l1)
            else:
                self._write_intra_mb(addr, p_slice=False, b_slice=True)
        else:
            self._write_intra_mb(addr, p_slice=False)


def serialize_slice_cabac(pic, sps, pps, *, slice_type, frame_num, idr, qp,
                          poc_lsb=0, idr_pic_id=0, num_ref_idx_l0=1,
                          cabac_init_idc=0, num_ref_idx_l1=1,
                          is_ref=True, mb_addrs=None,
                          slice_group_change_cycle=0,
                          wp_l0=None, wp_l1=None,
                          long_term_flag=0, mmco_ops=None,
                          ref_mod_l0=None, ref_mod_l1=None,
                          qs=0, stats=None) -> bytes:
    from .syntax import write_slice_header
    if mb_addrs is None:
        mb_addrs = range(pic.n_mbs)
    mb_addrs = list(mb_addrs)
    bw = BitWriter()
    write_slice_header(bw, sps, pps, slice_type=slice_type,
                       frame_num=frame_num, idr=idr, idr_pic_id=idr_pic_id,
                       qp=qp, poc_lsb=poc_lsb, num_ref_idx_l0=num_ref_idx_l0,
                       cabac_init_idc=cabac_init_idc,
                       num_ref_idx_l1=num_ref_idx_l1, is_ref=is_ref,
                       first_mb=mb_addrs[0],
                       slice_group_change_cycle=slice_group_change_cycle,
                       wp_l0=wp_l0, wp_l1=wp_l1,
                       long_term_flag=long_term_flag, mmco_ops=mmco_ops,
                       ref_mod_l0=ref_mod_l0, ref_mod_l1=ref_mod_l1)
    # cabac_alignment_one_bit
    while not bw.byte_aligned():
        bw.u(1, 1)
    w = MBWriterCABAC(bw, pic, sps, pps, slice_type, qp, cabac_init_idc,
                      num_ref=num_ref_idx_l0)
    w.num_ref_l1 = num_ref_idx_l1
    last = mb_addrs[-1]
    for addr in mb_addrs:
        w.write_mb(addr)
        w.eng.terminate(1 if addr == last else 0)
    bw.align_zero()
    if stats is not None:
        # processed-bin count for the Clause 7.4.2.10 cabac_zero_word
        # constraint (JM set_pic_bin_count, biariencode.c:186)
        stats["bins"] = w.eng.bins
    return bw.get_bytes()
