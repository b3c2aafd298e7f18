"""CABAC macroblock-layer parsing for I/P slices (spec 7.3.5 + 9.3.3.1).

Phase-1 parse for entropy_coding_mode_flag == 1, filling the same
PictureData SoA as the CAVLC parser. Capability parity with
ldecod/src/mb_read.c read_one_macroblock_{i,p}_slice_cabac and the
context-selection logic of ldecod/src/cabac.c — new implementation over
jm_tpu's CabacEngine.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitreader import BitReader
from ..common.predict_ctx import CODE2RASTER, PredCtx
from ..common.types import SliceType
from .cabac import (CHROMA_AC, CHROMA_DC, CHROMA_DC_2x4, LUMA_4x4, LUMA_16AC, LUMA_16DC,
                    CabacContexts, CabacEngine, read_significance_and_levels)
from .mb_parse import (MB_I4, MB_I16, MB_INTER, MB_IPCM, PictureData,
                       SliceContext)


def _get_bit(v: int, b: int) -> int:
    return (int(v) >> b) & 1


class MBParserCABAC:
    def __init__(self, pic: PictureData, ctx: SliceContext, br: BitReader):
        self.pic = pic
        self.ctx = ctx
        self.mb_w = pic.mb_w
        self.qp = ctx.qp
        self.pctx = PredCtx(pic)
        self.eng = CabacEngine(br)
        is_intra = ctx.header.slice_type in (SliceType.I, SliceType.SI)
        self.ctxs = CabacContexts(is_intra, ctx.header.cabac_init_idc, ctx.qp)
        self.last_dquant = 0

    # ---- neighbor MB helpers ---------------------------------------------

    def _left_mb(self, addr):
        naddr = addr - 1 if addr % self.mb_w else -1
        return naddr if naddr >= 0 and self.pctx.avail(naddr, addr) else -1

    def _up_mb(self, addr):
        naddr = addr - self.mb_w
        return naddr if naddr >= 0 and self.pctx.avail(naddr, addr) else -1

    def _blk_neighbor(self, addr, bx, by):
        """4x4 luma block neighbor at block coords (bx, by) rel. to MB addr.
        Returns (naddr, nblk) or None. Within-MB coords always available."""
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        gx, gy = mbx * 4 + bx, mby * 4 + by
        if gx < 0 or gy < 0 or gx >= self.mb_w * 4:
            return None
        naddr = (gy // 4) * self.mb_w + (gx // 4)
        if naddr != addr and (naddr > addr or not self.pctx.avail(naddr, addr)):
            return None
        return naddr, (gy % 4) * 4 + (gx % 4)

    def _cblk_neighbor(self, addr, cx, cy):
        """Chroma 4x4-block neighbor on the 2-wide x n_crows-tall MB grid
        (2x2 for 4:2:0, 2x4 for 4:2:2; ldecod get4x4NeighbourBase over
        mb_size[IS_CHROMA])."""
        crows = self.pic.n_crows
        mbx, mby = addr % self.mb_w, addr // self.mb_w
        gx, gy = mbx * 2 + cx, mby * crows + cy
        if gx < 0 or gy < 0 or gx >= self.mb_w * 2:
            return None
        naddr = (gy // crows) * self.mb_w + (gx // 2)
        if naddr != addr and (naddr > addr or not self.pctx.avail(naddr, addr)):
            return None
        return naddr, (gy % crows) * 2 + (gx % 2)

    # ---- element readers --------------------------------------------------

    def read_skip_flag_p(self, addr) -> bool:
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and not pic.skip[la]) else 0
        b = 1 if (ua >= 0 and not pic.skip[ua]) else 0
        bit = self.eng.decision(self.ctxs.mb_type[1], a + b)
        return bit == 1

    def read_mb_type_i(self, addr) -> int:
        """Returns imb_type convention: 0=I4, 1..24=I16, 25=IPCM."""
        eng, ctx = self.eng, self.ctxs.mb_type[0]
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.mb_class[la] != MB_I4) else 0
        b = 1 if (ua >= 0 and pic.mb_class[ua] != MB_I4) else 0
        if not eng.decision(ctx, a + b):
            return 0
        if eng.terminate():
            return 25
        sym = 1
        sym += eng.decision(ctx, 4) * 12
        if eng.decision(ctx, 5):
            sym += 8 if eng.decision(ctx, 6) else 4
        sym += eng.decision(ctx, 7) * 2
        sym += eng.decision(ctx, 8)
        return sym

    def read_mb_type_p(self) -> int:
        """Returns JM-internal P mb_type: 1=16x16,2=16x8,3=8x16,4=P8x8,
        6=I4, 7..30=I16(+offsets), 31=IPCM."""
        eng, ctx = self.eng, self.ctxs.mb_type[1]
        if eng.decision(ctx, 4):
            sym = 7 if eng.decision(ctx, 7) else 6
        else:
            if eng.decision(ctx, 5):
                sym = 2 if eng.decision(ctx, 7) else 3
            else:
                sym = 4 if eng.decision(ctx, 6) else 1
        if sym <= 6:
            return sym
        if eng.terminate():
            return 31
        sym += eng.decision(ctx, 8) * 12
        if eng.decision(ctx, 9):
            sym += 4
            if eng.decision(ctx, 9):
                sym += 4
        sym += eng.decision(ctx, 10) * 2
        sym += eng.decision(ctx, 10)
        return sym

    def read_sub_mb_type_p(self) -> int:
        eng, ctx = self.eng, self.ctxs.b8_type[0]
        if eng.decision(ctx, 1):
            return 0
        if eng.decision(ctx, 3):
            return 2 if eng.decision(ctx, 4) else 3
        return 1

    def read_skip_flag_b(self, addr) -> bool:
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and not pic.skip[la]) else 0
        b = 1 if (ua >= 0 and not pic.skip[ua]) else 0
        return self.eng.decision(self.ctxs.mb_type[2], 7 + a + b) == 1

    def read_mb_type_b(self, addr) -> int:
        """Coded B mb_type: 0=direct, 1..21 partitions, 22=B8x8,
        23=I4, 24..47=I16, 48=IPCM (readMB_typeInfo_CABAC_b_slice)."""
        eng, pic = self.eng, self.pic
        ctx = self.ctxs.mb_type[2]
        la, ua = self._left_mb(addr), self._up_mb(addr)
        # "mb_type != 0": non-direct, non-skip B neighbor
        a = 1 if (la >= 0 and not (pic.skip[la] or pic.b_direct[la])) else 0
        b = 1 if (ua >= 0 and not (pic.skip[ua] or pic.b_direct[ua])) else 0
        if not eng.decision(ctx, a + b):
            return 0
        if not eng.decision(ctx, 4):
            sym = 2 if eng.decision(ctx, 6) else 1
        elif not eng.decision(ctx, 5):
            sym = 3
            sym += 4 * eng.decision(ctx, 6)
            sym += 2 * eng.decision(ctx, 6)
            sym += eng.decision(ctx, 6)
        else:
            sym = 12
            sym += 8 * eng.decision(ctx, 6)
            sym += 4 * eng.decision(ctx, 6)
            sym += 2 * eng.decision(ctx, 6)
            if sym == 24:
                sym = 11
            elif sym == 26:
                sym = 22
            else:
                if sym == 22:
                    sym = 23
                sym += eng.decision(ctx, 6)
        if sym <= 23:      # 0..22 inter, 23 = I4x4
            return sym
        # sym == 24: Intra16x16 / IPCM continuation
        if eng.terminate():
            return 48
        ctx1 = self.ctxs.mb_type[1]
        sym += eng.decision(ctx1, 8) * 12
        if eng.decision(ctx1, 9):
            sym += 4
            if eng.decision(ctx1, 9):
                sym += 4
        sym += eng.decision(ctx1, 10) * 2
        sym += eng.decision(ctx1, 10)
        return sym

    def read_sub_mb_type_b(self) -> int:
        """Coded B sub_mb_type 0..12 (readB8_typeInfo_CABAC_b_slice)."""
        eng, ctx = self.eng, self.ctxs.b8_type[1]
        if not eng.decision(ctx, 0):
            return 0
        if eng.decision(ctx, 1):
            if eng.decision(ctx, 2):
                if eng.decision(ctx, 3):
                    sym = 10
                    if eng.decision(ctx, 3):
                        sym += 1
                else:
                    sym = 6
                    if eng.decision(ctx, 3):
                        sym += 2
                    if eng.decision(ctx, 3):
                        sym += 1
            else:
                sym = 2
                if eng.decision(ctx, 3):
                    sym += 2
                if eng.decision(ctx, 3):
                    sym += 1
        else:
            sym = 1 if eng.decision(ctx, 3) else 0
        return sym + 1

    def read_transform_size(self, addr) -> int:
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.transform8x8[la]) else 0
        b = 1 if (ua >= 0 and pic.transform8x8[ua]) else 0
        return self.eng.decision(self.ctxs.transform_size, a + b)

    def read_intra4_mode(self) -> int:
        """-1 = use predicted mode, else rem (0..7, LSB-first bins)."""
        eng, ctx = self.eng, self.ctxs.ipr
        if eng.decision(ctx, 0):
            return -1
        v = eng.decision(ctx, 1)
        v |= eng.decision(ctx, 1) << 1
        v |= eng.decision(ctx, 1) << 2
        return v

    def read_chroma_pred_mode(self, addr) -> int:
        pic = self.pic
        la, ua = self._left_mb(addr), self._up_mb(addr)
        a = 1 if (la >= 0 and pic.chroma_mode[la] != 0
                  and pic.mb_class[la] != MB_IPCM) else 0
        b = 1 if (ua >= 0 and pic.chroma_mode[ua] != 0
                  and pic.mb_class[ua] != MB_IPCM) else 0
        sym = self.eng.decision(self.ctxs.cipr, a + b)
        if sym:
            sym = self.eng.unary_max(self.ctxs.cipr, 3, 3, 1) + 1
        return sym

    def read_ref_idx(self, addr, bx, by, lst=0) -> int:
        pic = self.pic
        ref_arr = pic.ref_idx if lst == 0 else pic.ref_idx_l1

        def term(nb):
            if nb is None:
                return 0
            naddr, nblk = nb
            q = (nblk // 8) * 2 + ((nblk % 4) // 2)
            if pic.mb_class[naddr] == MB_IPCM:
                return 0
            # direct neighbors (whole-MB or per-8x8) contribute 0
            if pic.skip[naddr] or pic.b_direct[naddr] or pic.b8_direct[naddr, q]:
                return 0
            return 1 if ref_arr[naddr, q] > 0 else 0

        b = 2 * term(self._blk_neighbor(addr, bx, by - 1))
        a = term(self._blk_neighbor(addr, bx - 1, by))
        sym = self.eng.decision(self.ctxs.ref_no[0], a + b)
        if sym:
            sym = self.eng.unary(self.ctxs.ref_no[0], 4, 5) + 1
        return sym

    def read_mvd(self, addr, bx, by, comp, lst=0) -> int:
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
        sym = self.eng.decision(self.ctxs.mv_res[0], cidx)
        if sym:
            sym = self.eng.ueg3_mv(self.ctxs.mv_res[1], 5 * comp) + 1
            if self.eng.bypass():
                sym = -sym
        return sym

    def read_dquant(self) -> int:
        cidx = 1 if self.last_dquant != 0 else 0
        sym = self.eng.decision(self.ctxs.delta_qp, cidx)
        if sym:
            sym = self.eng.unary(self.ctxs.delta_qp, 2, 3) + 1
            dq = (sym + 1) >> 1
            if (sym & 1) == 0:
                dq = -dq
        else:
            dq = 0
        self.last_dquant = dq
        return dq

    def read_cbp(self, addr) -> int:
        eng, pic = self.eng, self.pic
        cbp = 0
        ua = self._up_mb(addr)
        la = self._left_mb(addr)
        for mb_y in (0, 2):
            for mb_x in (0, 2):
                if mb_y == 0:
                    b = 0
                    if ua >= 0 and pic.mb_class[ua] != MB_IPCM:
                        b = 2 if (int(pic.cbp[ua]) & (1 << (2 + (mb_x >> 1)))) == 0 else 0
                    elif ua >= 0:
                        b = 0
                else:
                    b = 2 if (cbp & (1 << (mb_x >> 1))) == 0 else 0
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
                    a = 1 if (cbp & (1 << mb_y)) == 0 else 0
                mask = 1 << (mb_y + (mb_x >> 1))
                if eng.decision(self.ctxs.cbp[0], a + b):
                    cbp += mask
        # chroma
        b = 2 if (ua >= 0 and (pic.mb_class[ua] == MB_IPCM or pic.cbp[ua] > 15)) else 0
        a = 1 if (la >= 0 and (pic.mb_class[la] == MB_IPCM or pic.cbp[la] > 15)) else 0
        if eng.decision(self.ctxs.cbp[1], a + b):
            b = 2 if (ua >= 0 and (pic.mb_class[ua] == MB_IPCM
                                   or (int(pic.cbp[ua]) >> 4) == 2)) else 0
            a = 1 if (la >= 0 and (pic.mb_class[la] == MB_IPCM
                                   or (int(pic.cbp[la]) >> 4) == 2)) else 0
            cbp += 32 if eng.decision(self.ctxs.cbp[2], a + b) else 16
        return cbp

    # ---- coded_block_flag + residual blocks -------------------------------

    def _cbf(self, addr, block_type, bx=0, by=0, comp=0) -> int:
        """Decode coded_block_flag with JM's neighbor-bit context; on 1,
        set the current block's bit in pic.cbp_bits."""
        pic, eng = self.pic, self.eng
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
        elif block_type in (CHROMA_DC, CHROMA_DC_2x4):
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
            raise NotImplementedError(f"cbf for block type {block_type}")
        from .cabac import TYPE2CTX_BCBP
        bit = eng.decision(self.ctxs.bcbp[TYPE2CTX_BCBP[block_type]], ctx)
        if bit:
            pic.cbp_bits[addr] |= np.int64(1) << bit0
        return bit

    def _read_block(self, addr, block_type, bx=0, by=0, comp=0):
        """Returns scan-order coefficients (effective positions) or None."""
        if not self._cbf(addr, block_type, bx, by, comp):
            return None
        return read_significance_and_levels(self.eng, self.ctxs, block_type)

    def _read_luma_residual_8x8(self, addr, cbp):
        """CABAC 8x8 residual: LUMA_8x8 category, no coded_block_flag
        (always present when the cbp bit is set)."""
        from .cabac import LUMA_8x8
        pic = self.pic
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            c = read_significance_and_levels(self.eng, self.ctxs, LUMA_8x8)
            pic.luma_coef8[addr, blk8] = c
            cnt = int((c != 0).sum())
            by0, bx0 = (blk8 // 2) * 2, (blk8 % 2) * 2
            if cnt:
                # mark quadrant bits in the JM cbf mask (0x33 pattern) and
                # nnz for deblock strength
                bit = 1 + by0 * 4 + bx0
                pic.cbp_bits[addr] |= np.int64(0x33) << bit
                for dy in range(2):
                    for dx in range(2):
                        pic.luma_nnz[addr, (by0 + dy) * 4 + bx0 + dx] = cnt

    def _read_luma_residual(self, addr, cbp, is_i16):
        pic = self.pic
        if is_i16:
            c = self._read_block(addr, LUMA_16DC)
            if c is not None:
                pic.luma_dc[addr] = c
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            for sub in range(4):
                blk = int(CODE2RASTER[blk8 * 4 + sub])
                by, bx = divmod(blk, 4)
                if is_i16:
                    c = self._read_block(addr, LUMA_16AC, bx, by)
                    if c is not None:
                        pic.luma_coef[addr, blk, 1:16] = c
                        pic.luma_nnz[addr, blk] = int((c != 0).sum())
                else:
                    c = self._read_block(addr, LUMA_4x4, bx, by)
                    if c is not None:
                        pic.luma_coef[addr, blk] = c
                        pic.luma_nnz[addr, blk] = int((c != 0).sum())

    def _read_chroma_residual(self, addr, cbp):
        pic = self.pic
        cbp_chroma = cbp >> 4
        dc_type = CHROMA_DC_2x4 if pic.n_crows == 4 else CHROMA_DC
        if cbp_chroma & 3:
            for comp in range(2):
                c = self._read_block(addr, dc_type, comp=comp)
                if c is not None:
                    pic.chroma_dc[addr, comp] = c
        if cbp_chroma & 2:
            for comp in range(2):
                for blk in range(2 * pic.n_crows):
                    by, bx = divmod(blk, 2)
                    c = self._read_block(addr, CHROMA_AC, bx, by, comp)
                    if c is not None:
                        pic.chroma_coef[addr, comp, blk, 1:16] = c
                        pic.chroma_nnz[addr, comp, blk] = int((c != 0).sum())

    # ---- MB-level parse ---------------------------------------------------

    def _parse_intra_mb(self, addr, imb_type):
        pic, eng = self.pic, self.eng
        if imb_type == 25:
            # I_PCM in CABAC (ldecod readIPCM_CABAC cabac.c:2388 +
            # init_decoding_engine_IPCM mb_read.c:613): our engine holds
            # exactly a 9-bit window, so the reference's whole-byte
            # lookahead rewind reduces to aligning the raw reader, reading
            # the samples, and restarting the arithmetic engine (contexts
            # are NOT reinitialized)
            import numpy as np
            from .cabac import CabacEngine
            br = self.eng.br
            pic.mb_class[addr] = MB_IPCM
            br.align()
            pic.ipcm_luma[addr] = np.array(
                [br.u(8) for _ in range(256)], np.uint8).reshape(16, 16)
            cf = self.ctx.sps.chroma_format_idc
            if cf == 1:
                pic.ipcm_chroma[addr] = np.array(
                    [br.u(8) for _ in range(128)], np.uint8).reshape(2, 8, 8)
            elif cf == 0:
                pic.ipcm_chroma[addr] = None
            else:
                raise NotImplementedError("IPCM for 4:2:2/4:4:4 TODO")
            pic.qp[addr] = self.qp
            pic.luma_nnz[addr] = 16
            pic.chroma_nnz[addr] = 16
            self.last_dquant = 0
            self.eng = CabacEngine(br)
            return
        if imb_type == 0:
            pic.mb_class[addr] = MB_I4
            if self.ctx.pps.transform_8x8_mode_flag:
                pic.transform8x8[addr] = bool(self.read_transform_size(addr))
            if pic.transform8x8[addr]:
                for q in range(4):
                    blk_tl = (q // 2) * 8 + (q % 2) * 2
                    pred = self.pctx.pred_intra4_mode(addr, blk_tl)
                    rem = self.read_intra4_mode()
                    mode = pred if rem < 0 else (rem if rem < pred else rem + 1)
                    for dy in range(2):
                        for dx in range(2):
                            pic.i4_modes[addr, blk_tl + dy * 4 + dx] = mode
            else:
                for code_idx in range(16):
                    blk = int(CODE2RASTER[code_idx])
                    pred = self.pctx.pred_intra4_mode(addr, blk)
                    rem = self.read_intra4_mode()
                    if rem < 0:
                        mode = pred
                    else:
                        mode = rem if rem < pred else rem + 1
                    pic.i4_modes[addr, blk] = mode
            pic.chroma_mode[addr] = self.read_chroma_pred_mode(addr)
            cbp = self.read_cbp(addr)
            pic.cbp[addr] = cbp
            if cbp:
                self._apply_dquant(addr)
            else:
                self.last_dquant = 0
                pic.qp[addr] = self.qp
            if pic.transform8x8[addr]:
                self._read_luma_residual_8x8(addr, cbp & 15)
            else:
                self._read_luma_residual(addr, cbp & 15, is_i16=False)
            self._read_chroma_residual(addr, cbp)
        else:
            pic.mb_class[addr] = MB_I16
            k = imb_type - 1
            pic.i16_mode[addr] = k % 4
            cbp = ((k // 4) % 3) << 4 | (15 if k >= 12 else 0)
            pic.cbp[addr] = cbp
            pic.chroma_mode[addr] = self.read_chroma_pred_mode(addr)
            self._apply_dquant(addr)
            self._read_luma_residual(addr, cbp & 15, is_i16=True)
            self._read_chroma_residual(addr, cbp)

    def _apply_dquant(self, addr):
        dq = self.read_dquant()
        off = 6 * self.ctx.sps.bit_depth_luma_minus8   # QpBdOffsetY
        if not -(27 + off // 2) <= dq <= 26 + off // 2:
            raise ValueError("mb_qp_delta out of range")
        # spec 7.4.5 modular wrap over [-QpBdOffsetY, 51]
        self.qp = ((self.qp + dq + 52 + 2 * off) % (52 + off)) - off
        self.pic.qp[addr] = self.qp

    def _parse_p_mb(self, addr, internal_type):
        """internal_type: 1=16x16, 2=16x8, 3=8x16, 4=P8x8."""
        pic = self.pic
        h = self.ctx.header
        nref = h.num_ref_idx_l0_active_minus1 + 1
        pic.mb_class[addr] = MB_INTER

        sub_types = []
        if internal_type in (1, 2, 3):
            parts = {
                1: [(0, 0, 4, 4)],
                2: [(0, 0, 4, 2), (0, 2, 4, 2)],
                3: [(0, 0, 2, 4), (2, 0, 2, 4)],
            }[internal_type]
            refs = []
            for (bx, by, bw, bh) in parts:
                ref = self.read_ref_idx(addr, bx, by) if nref > 1 else 0
                refs.append(ref)
                # store immediately: later reads' contexts see earlier parts
                for yy in range(by, by + bh):
                    for xx in range(bx, bx + bw):
                        q = (yy // 2) * 2 + (xx // 2)
                        pic.ref_idx[addr, q] = ref
            for (bx, by, bw, bh), ref in zip(parts, refs):
                mvdx = self.read_mvd(addr, bx, by, 0)
                mvdy = self.read_mvd(addr, bx, by, 1)
                pred = self.pctx.mv_pred(addr, bx, by, bw, bh, ref)
                mv = pred + (mvdx, mvdy)
                for yy in range(by, by + bh):
                    for xx in range(bx, bx + bw):
                        pic.mv[addr, yy * 4 + xx] = mv
                        pic.mvd[addr, 0, yy * 4 + xx] = (mvdx, mvdy)
        else:
            sub_types = [self.read_sub_mb_type_p() for _ in range(4)]
            self.pic.sub_mode[addr] = sub_types
            refs = [0] * 4
            for q in range(4):
                qx, qy = (q % 2) * 2, (q // 2) * 2
                refs[q] = self.read_ref_idx(addr, qx, qy) if nref > 1 else 0
                pic.ref_idx[addr, q] = refs[q]  # visible to next read's ctx
            for q in range(4):
                qx, qy = (q % 2) * 2, (q // 2) * 2
                st = sub_types[q]
                subparts = {
                    0: [(0, 0, 2, 2)],
                    1: [(0, 0, 2, 1), (0, 1, 2, 1)],
                    2: [(0, 0, 1, 2), (1, 0, 1, 2)],
                    3: [(0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1), (1, 1, 1, 1)],
                }[st]
                for (sx, sy, sw, sh) in subparts:
                    bx, by = qx + sx, qy + sy
                    mvdx = self.read_mvd(addr, bx, by, 0)
                    mvdy = self.read_mvd(addr, bx, by, 1)
                    pred = self.pctx.mv_pred(addr, bx, by, sw, sh, refs[q])
                    mv = pred + (mvdx, mvdy)
                    for yy in range(by, by + sh):
                        for xx in range(bx, bx + sw):
                            pic.mv[addr, yy * 4 + xx] = mv
                            pic.mvd[addr, 0, yy * 4 + xx] = (mvdx, mvdy)

        cbp = self.read_cbp(addr)
        pic.cbp[addr] = cbp
        allow8 = internal_type in (1, 2, 3) or (
            internal_type == 4 and all(t == 0 for t in sub_types))
        if (self.ctx.pps.transform_8x8_mode_flag and (cbp & 15) and allow8):
            pic.transform8x8[addr] = bool(self.read_transform_size(addr))
        if cbp:
            self._apply_dquant(addr)
        else:
            self.last_dquant = 0
            pic.qp[addr] = self.qp
        if pic.transform8x8[addr]:
            self._read_luma_residual_8x8(addr, cbp & 15)
        else:
            self._read_luma_residual(addr, cbp & 15, is_i16=False)
        self._read_chroma_residual(addr, cbp)

    def _parse_p_skip(self, addr):
        pic = self.pic
        pic.mb_class[addr] = MB_INTER
        pic.skip[addr] = True
        pic.ref_idx[addr] = 0
        pic.qp[addr] = self.qp
        pic.mv[addr] = self.pctx.skip_mv(addr)
        self.last_dquant = 0

    # ---- B slices ---------------------------------------------------------

    def _direct_quadrant(self, addr, q, direct_params=None):
        from .b_slice import direct_quadrant
        direct_quadrant(self, addr, q, direct_params)

    def _fill_direct_mb(self, addr):
        from .b_slice import fill_direct_mb
        fill_direct_mb(self, addr)

    def _parse_b_skip(self, addr):
        pic = self.pic
        pic.mb_class[addr] = MB_INTER
        pic.skip[addr] = True
        pic.b_direct[addr] = True
        pic.qp[addr] = self.qp
        self._fill_direct_mb(addr)
        self.last_dquant = 0

    def _parse_b_mb(self, addr, coded):
        from .b_slice import (B_MBTYPE, B_SUBTYPE, PD_BI, PD_DIRECT, PD_L0,
                              PD_L1, prepare_direct_params,
                              spatial_direct_quadrant)
        pic = self.pic
        h = self.ctx.header
        nref0 = h.num_ref_idx_l0_active_minus1 + 1
        nref1 = h.num_ref_idx_l1_active_minus1 + 1
        pic.mb_class[addr] = MB_INTER

        if coded == 0:   # B_Direct_16x16
            pic.b_direct[addr] = True
            self._fill_direct_mb(addr)
            self._read_b_residual(
                addr, bool(self.ctx.sps.direct_8x8_inference_flag))
            return

        if coded != 22:
            shape, pdirs = B_MBTYPE[coded]
            parts = {
                "16x16": [(0, 0, 4, 4)],
                "16x8": [(0, 0, 4, 2), (0, 2, 4, 2)],
                "8x16": [(0, 0, 2, 4), (2, 0, 2, 4)],
            }[shape]
            refs0 = [0] * len(parts)
            refs1 = [0] * len(parts)
            # ref_idx_l0 for L0/BI partitions, stored progressively
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L0, PD_BI):
                    refs0[i] = self.read_ref_idx(addr, bx, by, 0) if nref0 > 1 else 0
                    self._store_part_refs(addr, bx, by, bw, bh, 0, refs0[i], pd)
                else:
                    self._store_part_refs(addr, bx, by, bw, bh, 0, -1, pd)
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L1, PD_BI):
                    refs1[i] = self.read_ref_idx(addr, bx, by, 1) if nref1 > 1 else 0
                    self._store_part_refs(addr, bx, by, bw, bh, 1, refs1[i], pd)
                else:
                    self._store_part_refs(addr, bx, by, bw, bh, 1, -1, pd)
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L0, PD_BI):
                    self._read_part_mvd(addr, bx, by, bw, bh, 0, refs0[i])
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L1, PD_BI):
                    self._read_part_mvd(addr, bx, by, bw, bh, 1, refs1[i])
        else:            # B_8x8
            subs = [self.read_sub_mb_type_b() for _ in range(4)]
            sub_info = [B_SUBTYPE[s] for s in subs]
            direct_params = None
            refs0 = [0] * 4
            refs1 = [0] * 4
            # derive direct quadrants FIRST? JM assigns direct motion during
            # the motion-info read loop; ref ctx of later quadrants sees it.
            # Order: ref_l0 reads (with direct quadrants filled on the fly).
            for q in range(4):
                shape, pd = sub_info[q]
                qx, qy = (q % 2) * 2, (q // 2) * 2
                if pd == PD_DIRECT:
                    if (direct_params is None
                            and self.ctx.header.direct_spatial_mv_pred_flag):
                        direct_params = prepare_direct_params(self.pctx, addr)
                    self._direct_quadrant(addr, q, direct_params)
                    continue
                if pd in (PD_L0, PD_BI):
                    refs0[q] = self.read_ref_idx(addr, qx, qy, 0) if nref0 > 1 else 0
                    pic.ref_idx[addr, q] = refs0[q]
                else:
                    pic.ref_idx[addr, q] = -1
                pic.pdir[addr, q] = pd
            for q in range(4):
                shape, pd = sub_info[q]
                qx, qy = (q % 2) * 2, (q // 2) * 2
                if pd == PD_DIRECT:
                    continue
                if pd in (PD_L1, PD_BI):
                    refs1[q] = self.read_ref_idx(addr, qx, qy, 1) if nref1 > 1 else 0
                    pic.ref_idx_l1[addr, q] = refs1[q]
                else:
                    pic.ref_idx_l1[addr, q] = -1
            for lst in (0, 1):
                for q in range(4):
                    shape, pd = sub_info[q]
                    if pd == PD_DIRECT:
                        continue
                    if (lst == 0 and pd not in (PD_L0, PD_BI)) or \
                       (lst == 1 and pd not in (PD_L1, PD_BI)):
                        continue
                    qx, qy = (q % 2) * 2, (q // 2) * 2
                    sw, sh = shape
                    ref = refs0[q] if lst == 0 else refs1[q]
                    subparts = [(qx + sx, qy + sy)
                                for sy in range(0, 2, sh)
                                for sx in range(0, 2, sw)]
                    for (bx, by) in subparts:
                        self._read_part_mvd(addr, bx, by, sw, sh, lst, ref)
        if coded != 22:
            allow8 = True
        else:
            allow8 = all(s_ <= 3 for s_ in subs) and (
                self.ctx.sps.direct_8x8_inference_flag
                or all(s_ != 0 for s_ in subs))
        self._read_b_residual(addr, allow8)

    def _store_part_refs(self, addr, bx, by, bw, bh, lst, ref, pd):
        pic = self.pic
        arr = pic.ref_idx if lst == 0 else pic.ref_idx_l1
        for yy in range(by, by + bh):
            for xx in range(bx, bx + bw):
                q = (yy // 2) * 2 + (xx // 2)
                arr[addr, q] = ref
                pic.pdir[addr, q] = pd

    def _read_part_mvd(self, addr, bx, by, bw, bh, lst, ref):
        pic = self.pic
        mvdx = self.read_mvd(addr, bx, by, 0, lst)
        mvdy = self.read_mvd(addr, bx, by, 1, lst)
        pred = self.pctx.mv_pred(addr, bx, by, bw, bh, ref, lst)
        mv = pred + (mvdx, mvdy)
        mv_arr = pic.mv if lst == 0 else pic.mv_l1
        for yy in range(by, by + bh):
            for xx in range(bx, bx + bw):
                mv_arr[addr, yy * 4 + xx] = mv
                pic.mvd[addr, lst, yy * 4 + xx] = (mvdx, mvdy)

    def _read_b_residual(self, addr, allow8=False):
        pic = self.pic
        cbp = self.read_cbp(addr)
        pic.cbp[addr] = cbp
        if (self.ctx.pps.transform_8x8_mode_flag and (cbp & 15) and allow8):
            pic.transform8x8[addr] = bool(self.read_transform_size(addr))
        if cbp:
            self._apply_dquant(addr)
        else:
            self.last_dquant = 0
            pic.qp[addr] = self.qp
        if pic.transform8x8[addr]:
            self._read_luma_residual_8x8(addr, cbp & 15)
        else:
            self._read_luma_residual(addr, cbp & 15, is_i16=False)
        self._read_chroma_residual(addr, cbp)

    # ---- slice loop -------------------------------------------------------

    def parse_slice_data(self):
        h = self.ctx.header
        pic = self.pic
        addr = h.first_mb_in_slice
        stype = h.slice_type
        n = pic.n_mbs
        while True:
            pic.slice_id[addr] = self.ctx.slice_id
            if stype == SliceType.I:
                mb_type = self.read_mb_type_i(addr)
                self._parse_intra_mb(addr, mb_type)
            elif stype == SliceType.P:
                if self.read_skip_flag_p(addr):
                    self._parse_p_skip(addr)
                else:
                    t = self.read_mb_type_p()
                    if t <= 4:
                        self._parse_p_mb(addr, t)
                    elif t == 31:
                        self._parse_intra_mb(addr, 25)
                    else:
                        self._parse_intra_mb(addr, t - 6)
            elif stype == SliceType.B:
                if self.read_skip_flag_b(addr):
                    self._parse_b_skip(addr)
                else:
                    t = self.read_mb_type_b(addr)
                    if t <= 22:
                        self._parse_b_mb(addr, t)
                    elif t == 48:
                        self._parse_intra_mb(addr, 25)
                    else:
                        self._parse_intra_mb(addr, t - 23)
            else:
                raise NotImplementedError(f"slice type {stype} CABAC")
            addr = self.ctx.next_mb(addr)
            if self.eng.terminate() or addr >= n:
                break
