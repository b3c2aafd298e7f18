"""Macroblock-layer parsing for CAVLC slices (spec 7.3.5, 7.4.5, 9.2).

Phase 1 of the two-phase decoder: the serial bitstream parse walks MBs in
slice order and fills picture-wide SoA numpy arrays (modes, MVs, coeffs,
nnz); phase 2 (recon) consumes those arrays as batched tensors.

Capability parity with ldecod/src/mb_read.c (read_one_macroblock_i_slice_cavlc
:1139, read_one_macroblock_p_slice_cavlc:1335, intra pred mode read:91-424,
skip:765), ldecod/src/read_comp_cavlc.c (read_CBP_and_coeffs_from_NAL) and
the MV prediction of lcommon/src/mv_prediction.c:192 — new SoA design.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream.bitreader import BitReader
from ..common.predict_ctx import CODE2RASTER, RASTER2CODE, PredCtx
from ..common.tables import chroma_qp
from ..common.types import PPS, SPS, SliceHeader, SliceType
from .cavlc import residual_block_cavlc

# spec Table 9-4: coded_block_pattern mapping, codeNum -> (intra, inter)
# ChromaArrayType 1/2 (48 entries)
CBP_MAP_CHROMA = np.array([
    (47, 0), (31, 16), (15, 1), (0, 2), (23, 4), (27, 8), (29, 32), (30, 3),
    (7, 5), (11, 10), (13, 12), (14, 15), (39, 47), (43, 7), (45, 11), (46, 13),
    (16, 14), (3, 6), (5, 9), (10, 31), (12, 35), (19, 37), (21, 42), (26, 44),
    (28, 33), (35, 34), (37, 36), (42, 40), (44, 39), (1, 43), (2, 45), (4, 46),
    (8, 17), (17, 18), (18, 20), (20, 24), (24, 19), (6, 21), (9, 26), (22, 28),
    (25, 23), (32, 27), (33, 29), (34, 30), (36, 22), (40, 25), (38, 38),
    (41, 41),
], dtype=np.int32)
# ChromaArrayType 0/3 (16 entries)
CBP_MAP_MONO = np.array([
    (15, 0), (0, 1), (7, 2), (11, 4), (13, 8), (14, 3), (3, 5), (5, 10),
    (10, 12), (12, 15), (1, 7), (2, 11), (4, 13), (8, 14), (6, 6), (9, 9),
], dtype=np.int32)

# MB-type classes
MB_INTER = 0
MB_I4 = 1
MB_I16 = 2
MB_IPCM = 3

UNAVAIL = -1


@dataclass
class PictureData:
    """Picture-wide SoA filled by slice parsing, consumed by recon."""
    mb_w: int
    mb_h: int
    chroma_format_idc: int = 1

    def __post_init__(self) -> None:
        n = self.mb_w * self.mb_h
        self.n_mbs = n
        self.mb_class = np.zeros(n, np.int8)            # MB_* class
        self.skip = np.zeros(n, bool)
        self.transform8x8 = np.zeros(n, bool)
        self.i4_modes = np.full((n, 16), -1, np.int8)   # raster block order
        self.i16_mode = np.full(n, -1, np.int8)
        self.chroma_mode = np.zeros(n, np.int8)
        self.cbp = np.zeros(n, np.int32)
        self.qp = np.zeros(n, np.int32)                 # absolute luma QP
        self.slice_id = np.full(n, -1, np.int32)
        # residuals, scan order (inverse-scanned on device):
        self.luma_coef = np.zeros((n, 16, 16), np.int32)   # [mb][raster blk][scan]
        self.luma_dc = np.zeros((n, 16), np.int32)         # i16 DC, zigzag scan
        crows = 4 if self.chroma_format_idc == 2 else 2
        self.n_crows = crows                       # chroma 4x4-block rows
        self.chroma_dc = np.zeros((n, 2, 2 * crows), np.int32)   # scan order
        self.chroma_coef = np.zeros((n, 2, 2 * crows, 16), np.int32)
        self.luma_coef8 = np.zeros((n, 4, 64), np.int32)   # 8x8 transform MBs
        # nnz per 4x4 block (raster in MB), for nC pred + deblock bS
        self.luma_nnz = np.zeros((n, 16), np.int32)
        self.chroma_nnz = np.zeros((n, 2, 2 * crows), np.int32)
        # inter motion: final MVs quarter-pel, per 4x4 raster block
        self.mv = np.zeros((n, 16, 2), np.int32)
        self.ref_idx = np.full((n, 4), -1, np.int8)        # per 8x8, -1 intra
        # P8x8 sub-partition per quadrant: 0=8x8 1=8x4 2=4x8 3=4x4
        self.sub_mode = np.zeros((n, 4), np.int8)
        # IPCM raw samples
        self.ipcm_luma = {}
        self.ipcm_chroma = {}
        # CABAC context state: mvd per list per 4x4 (raster), JM-layout
        # coded-block-flag bitmask (ldecod cabac.c s_cbp[0].bits)
        self.mvd = np.zeros((n, 2, 16, 2), np.int32)
        self.cbp_bits = np.zeros(n, np.int64)
        # B-slice motion: list-1 MVs/refs and per-8x8 prediction direction
        # (0=list0, 1=list1, 2=bidirectional, -1=intra)
        self.mv_l1 = np.zeros((n, 16, 2), np.int32)
        self.ref_idx_l1 = np.full((n, 4), -1, np.int8)
        self.pdir = np.full((n, 4), -1, np.int8)
        self.b_direct = np.zeros(n, bool)
        self.b8_direct = np.zeros((n, 4), bool)
        # unique ids of referenced pictures per 8x8 per list (deblock bS)
        self.ref_pic_id = np.full((n, 4), -1, np.int64)
        self.ref_pic_id_l1 = np.full((n, 4), -1, np.int64)
        # encoder-side: chosen inter partition mode (coded P mb_type 0..3)
        self.inter_mode = np.full(n, -1, np.int8)
        # SP/SI switching slices (spec 8.6; ldecod itrans_sp block.c:395):
        # per-MB flag for the transform-domain requantization path, the
        # switching QP QS, and sp_for_switch_flag
        self.sp_mb = np.zeros(n, bool)
        self.field_mode = False     # field picture (decoded at half height)
        self.sp_slice = np.zeros(n, bool)   # any MB of an SP/SI slice
        self.sp_qs = np.zeros(n, np.int32)
        self.sp_switch = np.zeros(n, bool)

    # -- neighbor helpers (same-slice availability) -------------------------

    def mb_avail(self, addr: int, cur_addr: int) -> bool:
        return 0 <= addr < self.n_mbs and self.slice_id[addr] == self.slice_id[cur_addr]


@dataclass
class SliceContext:
    header: SliceHeader
    sps: SPS
    pps: PPS
    slice_id: int
    qp: int = 0
    # FMO: succ[addr] = next MB of this slice's group (common/fmo.py);
    # None = raster order (single slice group)
    mb_succ: object = None

    def __post_init__(self) -> None:
        self.qp = self.header.qp(self.pps)
        self.qs = self.header.qs(self.pps)
        self.sp_switch = bool(self.header.sp_for_switch_flag)

    def next_mb(self, addr: int) -> int:
        return addr + 1 if self.mb_succ is None else int(self.mb_succ[addr])


class MBParser:
    """Serial CAVLC slice-data parser filling a PictureData."""

    def __init__(self, pic: PictureData, ctx: SliceContext, br: BitReader):
        self.pic = pic
        self.ctx = ctx
        self.br = br
        # data partitioning (D3): residual SEs read from partition B
        # (intra) / C (inter) when present (assignSE2partition_DP,
        # lencod header.c:37; ldecod elements.h partition map)
        self.br_b = None
        self.br_c = None
        self.dp_mode = False
        self.mb_w = pic.mb_w
        self.qp = ctx.qp
        self.pctx = PredCtx(pic)

    # ---- neighbor/prediction derivation: shared PredCtx ------------------

    def _nc_luma(self, addr: int, blk: int) -> int:
        return self.pctx.nc_luma(addr, blk)

    def _nc_chroma(self, addr: int, comp: int, blk: int) -> int:
        return self.pctx.nc_chroma(addr, comp, blk)

    def _pred_intra4_mode(self, addr: int, blk: int) -> int:
        return self.pctx.pred_intra4_mode(addr, blk)

    def _mv_neighbor(self, addr: int, bx: int, by: int, cur_blk: int = 0):
        return self.pctx.mv_neighbor(addr, bx, by, cur_blk)

    def _mv_pred(self, addr, bx, by, bw, bh, ref):
        return self.pctx.mv_pred(addr, bx, by, bw, bh, ref)

    # ---- 8x8 transform helpers (High profile) -----------------------------

    def _read_i8_modes(self, addr: int) -> None:
        pic, br = self.pic, self.br
        for q in range(4):
            blk_tl = (q // 2) * 8 + (q % 2) * 2
            pred = self._pred_intra4_mode(addr, blk_tl)
            if br.flag():
                mode = pred
            else:
                rem = br.u(3)
                mode = rem if rem < pred else rem + 1
            for dy in range(2):
                for dx in range(2):
                    pic.i4_modes[addr, blk_tl + dy * 4 + dx] = mode

    def _res_br(self, addr: int):
        """Reader carrying this MB's residual SEs: partition B for intra
        MBs, C for inter MBs, the single slice reader otherwise. A missing
        partition yields zero coefficients (ldecod ei_flag semantics)."""
        if not self.dp_mode:
            return self.br
        br = (self.br_b if self.pic.mb_class[addr] != MB_INTER
              else self.br_c)
        if br is None:
            raise ValueError("missing data partition for residual data")
        return br

    def _read_luma_residual_8x8(self, addr: int, cbp: int) -> None:
        """CAVLC 8x8: each 8x8 read as 4 interleaved 4x4 CAVLC blocks
        (ldecod read_comp_cavlc.c read_comp_coeff_8x8_CAVLC:856)."""
        pic, br = self.pic, self._res_br(addr)
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            by0, bx0 = (blk8 // 2) * 2, (blk8 % 2) * 2
            for dy in range(2):
                for dx in range(2):
                    blk = (by0 + dy) * 4 + bx0 + dx
                    sub = 2 * dy + dx
                    nc = self._nc_luma(addr, blk)
                    coeffs, tc = residual_block_cavlc(br, nc, 16)
                    pic.luma_nnz[addr, blk] = tc
                    nz = np.flatnonzero(coeffs)
                    pic.luma_coef8[addr, blk8, nz * 4 + sub] = coeffs[nz]

    def _maybe_read_inter_transform8x8(self, addr: int, cbp: int,
                                       allow: bool) -> None:
        pic, br = self.pic, self.br
        if (self.ctx.pps.transform_8x8_mode_flag and (cbp & 15) and allow):
            pic.transform8x8[addr] = bool(br.flag())

    # ---- residual reading -------------------------------------------------

    def _read_luma_residual(self, addr: int, cbp: int, is_i16: bool) -> None:
        pic, br = self.pic, self._res_br(addr)
        if is_i16:
            nc = self._nc_luma(addr, 0)
            coeffs, _tc = residual_block_cavlc(br, nc, 16)
            pic.luma_dc[addr] = coeffs
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            for sub in range(4):
                code_idx = blk8 * 4 + sub
                blk = int(CODE2RASTER[code_idx])
                nc = self._nc_luma(addr, blk)
                if is_i16:
                    out = np.zeros(16, np.int32)
                    ac, tc = residual_block_cavlc(br, nc, 15)
                    out[1:16] = ac
                else:
                    out, tc = residual_block_cavlc(br, nc, 16)
                pic.luma_coef[addr, blk] = out
                pic.luma_nnz[addr, blk] = tc

    def _read_chroma_residual(self, addr: int, cbp: int, intra: bool) -> None:
        pic, br = self.pic, self._res_br(addr)
        cbp_chroma = cbp >> 4
        is422 = self.ctx.sps.chroma_format_idc == 2
        if cbp_chroma & 3:
            for comp in range(2):
                coeffs, _tc = residual_block_cavlc(
                    br, -2 if is422 else -1, 8 if is422 else 4)
                pic.chroma_dc[addr, comp] = coeffs
        if cbp_chroma & 2:
            for comp in range(2):
                for blk in range(2 * pic.n_crows):
                    nc = self._nc_chroma(addr, comp, blk)
                    ac, tc = residual_block_cavlc(br, nc, 15)
                    out = np.zeros(16, np.int32)
                    out[1:16] = ac
                    pic.chroma_coef[addr, comp, blk] = out
                    pic.chroma_nnz[addr, comp, blk] = tc

    # ---- intra MB ---------------------------------------------------------

    def _parse_intra_mb(self, addr: int, imb_type: int) -> None:
        """imb_type: 0 = I_NxN, 1..24 = I_16x16, 25 = I_PCM."""
        pic, br = self.pic, self.br
        pps = self.ctx.pps
        if imb_type == 25:
            self._parse_ipcm(addr)
            return
        if imb_type == 0:
            pic.mb_class[addr] = MB_I4
            if pps.transform_8x8_mode_flag:
                pic.transform8x8[addr] = bool(br.flag())
            if pic.transform8x8[addr]:
                self._read_i8_modes(addr)
            else:
                for code_idx in range(16):
                    blk = int(CODE2RASTER[code_idx])
                    pred = self._pred_intra4_mode(addr, blk)
                    if br.flag():  # prev_intra4x4_pred_mode_flag
                        mode = pred
                    else:
                        rem = br.u(3)
                        mode = rem if rem < pred else rem + 1
                    pic.i4_modes[addr, blk] = mode
            if self.ctx.sps.chroma_format_idc in (1, 2):
                pic.chroma_mode[addr] = br.ue()
            cbp_code = br.ue()
            cbp_tab = (CBP_MAP_CHROMA if self.ctx.sps.chroma_format_idc in (1, 2)
                       else CBP_MAP_MONO)
            cbp = int(cbp_tab[cbp_code][0])
            pic.cbp[addr] = cbp
            if cbp:
                self._read_qp_delta(addr)
            else:
                pic.qp[addr] = self.qp
            if pic.transform8x8[addr]:
                self._read_luma_residual_8x8(addr, cbp & 15)
            else:
                self._read_luma_residual(addr, cbp, is_i16=False)
            self._read_chroma_residual(addr, cbp, intra=True)
        else:
            pic.mb_class[addr] = MB_I16
            k = imb_type - 1
            pic.i16_mode[addr] = k % 4
            cbp = ((k // 4) % 3) << 4 | (15 if k >= 12 else 0)
            pic.cbp[addr] = cbp
            if self.ctx.sps.chroma_format_idc in (1, 2):
                pic.chroma_mode[addr] = br.ue()
            self._read_qp_delta(addr)
            self._read_luma_residual(addr, cbp & 15, is_i16=True)
            self._read_chroma_residual(addr, cbp, intra=True)

    def _parse_ipcm(self, addr: int) -> None:
        pic, br = self.pic, self.br
        pic.mb_class[addr] = MB_IPCM
        br.align()
        bdl = self.ctx.sps.bit_depth_luma_minus8 + 8
        bdc = self.ctx.sps.bit_depth_chroma_minus8 + 8
        dtl = np.uint8 if bdl == 8 else np.uint16
        dtc = np.uint8 if bdc == 8 else np.uint16
        luma = np.array([br.u(bdl) for _ in range(256)],
                        dtl).reshape(16, 16)
        cf = self.ctx.sps.chroma_format_idc
        if cf == 1:
            chroma = np.array([br.u(bdc) for _ in range(128)],
                              dtc).reshape(2, 8, 8)
        elif cf == 0:
            chroma = None
        else:
            raise NotImplementedError("IPCM for 4:2:2/4:4:4 TODO")
        pic.ipcm_luma[addr] = luma
        pic.ipcm_chroma[addr] = chroma
        pic.qp[addr] = self.qp
        # PCM MBs count as 16 nnz for nC prediction and bS (both planes)
        pic.luma_nnz[addr] = 16
        pic.chroma_nnz[addr] = 16

    def _read_qp_delta(self, addr: int) -> None:
        dq = self.br.se()
        off = 6 * self.ctx.sps.bit_depth_luma_minus8   # QpBdOffsetY
        if not -(27 + off // 2) <= dq <= 26 + off // 2:
            raise ValueError(f"mb_qp_delta {dq} out of range")
        # spec 7.4.5 modular wrap over [-QpBdOffsetY, 51]
        self.qp = ((self.qp + dq + 52 + 2 * off) % (52 + off)) - off
        self.pic.qp[addr] = self.qp

    # ---- inter MB (P slices) ---------------------------------------------

    def _parse_p_mb(self, addr: int, mb_type: int) -> None:
        pic, br = self.pic, self.br
        h = self.ctx.header
        nref = h.num_ref_idx_l0_active_minus1 + 1
        pic.mb_class[addr] = MB_INTER

        sub_types = []
        if mb_type in (0, 1, 2):
            parts = {
                0: [(0, 0, 4, 4)],
                1: [(0, 0, 4, 2), (0, 2, 4, 2)],
                2: [(0, 0, 2, 4), (2, 0, 2, 4)],
            }[mb_type]
            refs = []
            for _ in parts:
                refs.append(br.te(nref - 1) if nref > 1 else 0)
            for (bx, by, bw, bh), ref in zip(parts, refs):
                for yy in range(by, by + bh):
                    for xx in range(bx, bx + bw):
                        q = (yy // 2) * 2 + (xx // 2)
                        pic.ref_idx[addr, q] = ref
            for (bx, by, bw, bh), ref in zip(parts, refs):
                mvd = np.array([br.se(), br.se()], np.int32)
                pred = self._mv_pred(addr, bx, by, bw, bh, ref)
                mv = pred + mvd
                for yy in range(by, by + bh):
                    for xx in range(bx, bx + bw):
                        pic.mv[addr, yy * 4 + xx] = mv
        elif mb_type in (3, 4):
            sub_types = [br.ue() for _ in range(4)]
            if any(t > 3 for t in sub_types):
                raise ValueError("invalid sub_mb_type")
            pic.sub_mode[addr] = sub_types
            refs = [0, 0, 0, 0]
            if mb_type == 3 and nref > 1:
                refs = [br.te(nref - 1) for _ in range(4)]
            for q, r in enumerate(refs):
                pic.ref_idx[addr, q] = r
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
                    mvd = np.array([br.se(), br.se()], np.int32)
                    pred = self._mv_pred(addr, bx, by, sw, sh, refs[q])
                    mv = pred + mvd
                    for yy in range(by, by + sh):
                        for xx in range(bx, bx + sw):
                            pic.mv[addr, yy * 4 + xx] = mv
        else:
            self._parse_intra_mb(addr, mb_type - 5)
            return

        cbp_code = br.ue()
        cbp_tab = (CBP_MAP_CHROMA if self.ctx.sps.chroma_format_idc in (1, 2)
                   else CBP_MAP_MONO)
        cbp = int(cbp_tab[cbp_code][1])
        pic.cbp[addr] = cbp
        allow8 = mb_type in (0, 1, 2) or (mb_type in (3, 4)
                                          and all(t == 0 for t in sub_types))
        self._maybe_read_inter_transform8x8(addr, cbp, allow8)
        if cbp:
            self._read_qp_delta(addr)
        else:
            pic.qp[addr] = self.qp
        if pic.transform8x8[addr]:
            self._read_luma_residual_8x8(addr, cbp & 15)
        else:
            self._read_luma_residual(addr, cbp & 15, is_i16=False)
        self._read_chroma_residual(addr, cbp, intra=False)

    def _parse_p_skip(self, addr: int) -> None:
        """P_Skip MV derivation (spec 8.4.1.1)."""
        pic = self.pic
        pic.mb_class[addr] = MB_INTER
        pic.skip[addr] = True
        pic.ref_idx[addr] = 0
        pic.qp[addr] = self.qp
        pic.mv[addr] = self.pctx.skip_mv(addr)

    # ---- B slices (CAVLC) -------------------------------------------------

    def _parse_b_skip(self, addr: int) -> None:
        from .b_slice import fill_direct_mb
        pic = self.pic
        pic.mb_class[addr] = MB_INTER
        pic.skip[addr] = True
        pic.b_direct[addr] = True
        pic.qp[addr] = self.qp
        fill_direct_mb(self, addr)

    def _parse_b_mb(self, addr: int, coded: int) -> None:
        from .b_slice import (B_MBTYPE, B_SUBTYPE, PD_BI, PD_DIRECT, PD_L0,
                              PD_L1, direct_quadrant, fill_direct_mb,
                              prepare_direct_params)
        pic, br = self.pic, self.br
        h = self.ctx.header
        nref0 = h.num_ref_idx_l0_active_minus1 + 1
        nref1 = h.num_ref_idx_l1_active_minus1 + 1
        pic.mb_class[addr] = MB_INTER

        def store_refs(bx, by, bw, bh, lst, ref, pd):
            arr = pic.ref_idx if lst == 0 else pic.ref_idx_l1
            for yy in range(by, by + bh):
                for xx in range(bx, bx + bw):
                    q = (yy // 2) * 2 + (xx // 2)
                    arr[addr, q] = ref
                    pic.pdir[addr, q] = pd

        def read_part_mvd(bx, by, bw, bh, lst, ref):
            mvdx, mvdy = br.se(), br.se()
            pred = self.pctx.mv_pred(addr, bx, by, bw, bh, ref, lst)
            mv = pred + (mvdx, mvdy)
            mv_arr = pic.mv if lst == 0 else pic.mv_l1
            for yy in range(by, by + bh):
                for xx in range(bx, bx + bw):
                    mv_arr[addr, yy * 4 + xx] = mv
                    pic.mvd[addr, lst, yy * 4 + xx] = (mvdx, mvdy)

        subs = []
        if coded == 0:
            pic.b_direct[addr] = True
            fill_direct_mb(self, addr)
        elif coded != 22:
            shape, pdirs = B_MBTYPE[coded]
            parts = {"16x16": [(0, 0, 4, 4)],
                     "16x8": [(0, 0, 4, 2), (0, 2, 4, 2)],
                     "8x16": [(0, 0, 2, 4), (2, 0, 2, 4)]}[shape]
            refs0 = [0] * len(parts)
            refs1 = [0] * len(parts)
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L0, PD_BI):
                    refs0[i] = br.te(nref0 - 1) if nref0 > 1 else 0
                    store_refs(bx, by, bw, bh, 0, refs0[i], pd)
                else:
                    store_refs(bx, by, bw, bh, 0, -1, pd)
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L1, PD_BI):
                    refs1[i] = br.te(nref1 - 1) if nref1 > 1 else 0
                    store_refs(bx, by, bw, bh, 1, refs1[i], pd)
                else:
                    store_refs(bx, by, bw, bh, 1, -1, pd)
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L0, PD_BI):
                    read_part_mvd(bx, by, bw, bh, 0, refs0[i])
            for i, ((bx, by, bw, bh), pd) in enumerate(zip(parts, pdirs)):
                if pd in (PD_L1, PD_BI):
                    read_part_mvd(bx, by, bw, bh, 1, refs1[i])
        else:
            subs = [br.ue() for _ in range(4)]
            if any(s > 12 for s in subs):
                raise ValueError("invalid B sub_mb_type")
            sub_info = [B_SUBTYPE[s] for s in subs]
            dp = None
            refs0 = [0] * 4
            refs1 = [0] * 4
            for q in range(4):
                shp, pd = sub_info[q]
                qx, qy = (q % 2) * 2, (q // 2) * 2
                if pd == PD_DIRECT:
                    if dp is None and h.direct_spatial_mv_pred_flag:
                        dp = prepare_direct_params(self.pctx, addr)
                    direct_quadrant(self, addr, q, dp)
                    continue
                if pd in (PD_L0, PD_BI):
                    refs0[q] = br.te(nref0 - 1) if nref0 > 1 else 0
                    pic.ref_idx[addr, q] = refs0[q]
                else:
                    pic.ref_idx[addr, q] = -1
                pic.pdir[addr, q] = pd
            for q in range(4):
                shp, pd = sub_info[q]
                if pd == PD_DIRECT:
                    continue
                if pd in (PD_L1, PD_BI):
                    refs1[q] = br.te(nref1 - 1) if nref1 > 1 else 0
                    pic.ref_idx_l1[addr, q] = refs1[q]
                else:
                    pic.ref_idx_l1[addr, q] = -1
            for lst in (0, 1):
                for q in range(4):
                    shp, pd = sub_info[q]
                    if pd == PD_DIRECT:
                        continue
                    if (lst == 0 and pd not in (PD_L0, PD_BI)) or \
                       (lst == 1 and pd not in (PD_L1, PD_BI)):
                        continue
                    qx, qy = (q % 2) * 2, (q // 2) * 2
                    sw, sh = shp
                    ref = refs0[q] if lst == 0 else refs1[q]
                    for sy in range(0, 2, sh):
                        for sx in range(0, 2, sw):
                            read_part_mvd(qx + sx, qy + sy, sw, sh, lst, ref)

        cbp_code = br.ue()
        cbp = int(CBP_MAP_CHROMA[cbp_code][1]
                  if self.ctx.sps.chroma_format_idc in (1, 2)
                  else CBP_MAP_MONO[cbp_code][1])
        pic.cbp[addr] = cbp
        if coded == 0:
            allow8 = bool(self.ctx.sps.direct_8x8_inference_flag)
        elif coded != 22:
            allow8 = True
        else:
            allow8 = all(s_ <= 3 for s_ in subs) and (
                self.ctx.sps.direct_8x8_inference_flag or all(s_ != 0 for s_ in subs))
        self._maybe_read_inter_transform8x8(addr, cbp, allow8)
        if cbp:
            self._read_qp_delta(addr)
        else:
            pic.qp[addr] = self.qp
        if pic.transform8x8[addr]:
            self._read_luma_residual_8x8(addr, cbp & 15)
        else:
            self._read_luma_residual(addr, cbp & 15, is_i16=False)
        self._read_chroma_residual(addr, cbp, intra=False)

    # ---- native fast path -------------------------------------------------

    def _parse_native(self) -> bool:
        """Parse this slice with the native C parser (native/jm_dec.cpp)
        when its coverage applies: I/P CAVLC 4:2:0, no data partitioning.
        Returns True when the slice was fully parsed. On an unsupported
        construct mid-slice (IPCM) the C parser stops without consuming
        bits beyond its deterministic prefix and we rerun the Python
        parser from the slice start — both sides write identical values
        in identical order, so the partial fill is simply overwritten."""
        from ..native import available, parse_slice_cavlc
        if not available or parse_slice_cavlc is None or self.dp_mode:
            return False
        h = self.ctx.header
        if h.slice_type not in (SliceType.I, SliceType.P):
            return False
        if self.ctx.sps.chroma_format_idc != 1:
            return False
        if self.ctx.sps.bit_depth_luma_minus8:
            return False      # >8-bit: the C parser's qp wrap is 8-bit
        pic = self.pic
        br = self.br
        buf = getattr(br, "buffer", None)
        if buf is None:
            buf = br.data.tobytes()     # python BitReader fallback
        succ = None
        if self.ctx.mb_succ is not None:
            succ = np.ascontiguousarray(self.ctx.mb_succ, np.int32)
        params = {
            "first_mb": int(h.first_mb_in_slice),
            "n_mbs": pic.n_mbs,
            "mb_w": pic.mb_w,
            "stype": 0 if h.slice_type == SliceType.I else 1,
            "slice_id": self.ctx.slice_id,
            "qp": self.ctx.qp,
            "nref": h.num_ref_idx_l0_active_minus1 + 1,
            "t8": int(self.ctx.pps.transform_8x8_mode_flag),
        }
        arrays = {
            "mb_class": pic.mb_class, "skip": pic.skip,
            "transform8x8": pic.transform8x8, "i4_modes": pic.i4_modes,
            "i16_mode": pic.i16_mode, "chroma_mode": pic.chroma_mode,
            "cbp": pic.cbp, "qp": pic.qp, "slice_id": pic.slice_id,
            "luma_coef": pic.luma_coef, "luma_dc": pic.luma_dc,
            "chroma_dc": pic.chroma_dc, "chroma_coef": pic.chroma_coef,
            "luma_coef8": pic.luma_coef8, "luma_nnz": pic.luma_nnz,
            "chroma_nnz": pic.chroma_nnz, "mv": pic.mv,
            "ref_idx": pic.ref_idx, "sub_mode": pic.sub_mode,
            "succ": succ,
        }
        status, new_pos = parse_slice_cavlc(buf, br.pos, params, arrays)
        if status != 0:
            return False
        br.pos = new_pos
        return True

    # ---- slice loop -------------------------------------------------------

    def parse_slice_data(self) -> None:
        h = self.ctx.header
        pic, br = self.pic, self.br
        addr = h.first_mb_in_slice
        stype = h.slice_type
        n = pic.n_mbs

        if self._parse_native():
            return

        nxt = self.ctx.next_mb
        if stype == SliceType.I:
            while True:
                pic.slice_id[addr] = self.ctx.slice_id
                mb_type = br.ue()
                self._parse_intra_mb(addr, mb_type)
                addr = nxt(addr)
                if addr >= n or not br.more_rbsp_data():
                    break
        elif stype in (SliceType.P, SliceType.B, SliceType.SP):
            is_b = stype == SliceType.B
            is_sp = stype == SliceType.SP

            def mark_sp(a):
                # smb: inter MBs of SP slices take the requantizing
                # reconstruction (mb_prediction.c:266 smb)
                pic.sp_mb[a] = pic.mb_class[a] == MB_INTER
                pic.sp_slice[a] = True
                pic.sp_qs[a] = self.ctx.qs
                pic.sp_switch[a] = self.ctx.sp_switch
            while addr < n:
                skip_run = br.ue()
                for _ in range(skip_run):
                    if addr >= n:
                        raise ValueError("mb_skip_run past end of picture")
                    pic.slice_id[addr] = self.ctx.slice_id
                    if is_b:
                        self._parse_b_skip(addr)
                    else:
                        self._parse_p_skip(addr)
                        if is_sp:
                            mark_sp(addr)
                    addr = nxt(addr)
                if addr >= n or not br.more_rbsp_data():
                    break
                pic.slice_id[addr] = self.ctx.slice_id
                mb_type = br.ue()
                if is_b:
                    if mb_type >= 23:
                        pic.mb_class[addr] = MB_INTER  # placeholder; intra path sets
                        self._parse_intra_mb(addr, mb_type - 23)
                    else:
                        self._parse_b_mb(addr, mb_type)
                else:
                    self._parse_p_mb(addr, mb_type)
                    if is_sp:
                        mark_sp(addr)
                addr = nxt(addr)
                if not br.more_rbsp_data():
                    break
        else:
            raise NotImplementedError(f"slice type {stype} parse TODO")
