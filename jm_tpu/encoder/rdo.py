"""True rate-distortion mode decision support (E8, the md_high tier).

Capability parity with lencod/src/rdopt.c (RDCost_for_macroblocks:1810,
store/set_stored_macroblock_parameters:2053/2460) and
rdopt_coding_state.c — new design: because serialization here is a pure
function of the PictureData SoA, the coding-state snapshot reduces to
saving/restoring one MB's rows plus its recon pixels, and the rate term
is measured by serializing just that MB with the production CAVLC writer
(for CABAC slices the CAVLC length serves as the rate proxy; exact CABAC
counting needs the arithmetic-coder state and lands with the RDOQ phase).
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitwriter import BitWriter

# PictureData per-MB rows that a candidate trial may touch
_PIC_ROWS = ("mb_class", "skip", "transform8x8", "i4_modes", "i16_mode",
             "chroma_mode", "cbp", "qp", "luma_coef", "luma_dc",
             "chroma_dc", "chroma_coef", "luma_coef8", "luma_nnz",
             "chroma_nnz", "mv", "ref_idx", "sub_mode", "mvd", "cbp_bits",
             "mv_l1", "ref_idx_l1", "pdir", "ref_pic_id", "ref_pic_id_l1",
             "b_direct", "inter_mode")


def lambda_mode(qp: int) -> float:
    """SSD-domain Lagrange multiplier (lencod/src/lambda.c
    get_implicit_lambda_p_slice:83, md_low/high share the base)."""
    return 0.85 * 2.0 ** ((qp - 12) / 3.0)


class MBState:
    """Snapshot of one MB's full coding state (pic rows + recon)."""

    def __init__(self, fe, addr: int):
        self.fe = fe
        self.addr = addr
        mbx, mby = addr % fe.mb_w, addr // fe.mb_w
        self.px, self.py = mbx * 16, mby * 16
        pic = fe.pic
        self.rows = {k: getattr(pic, k)[addr].copy() for k in _PIC_ROWS
                     if hasattr(pic, k)}
        self.recY = fe.recY[self.py:self.py + 16,
                            self.px:self.px + 16].copy()
        ch = fe.ch_mb
        cy, cx = mby * ch, self.px // 2
        self._csl = (slice(cy, cy + ch), slice(cx, cx + 8))
        self.recU = fe.recU[self._csl].copy()
        self.recV = fe.recV[self._csl].copy()

    def restore(self):
        fe, addr = self.fe, self.addr
        pic = fe.pic
        for k, v in self.rows.items():
            getattr(pic, k)[addr] = v
        fe.recY[self.py:self.py + 16, self.px:self.px + 16] = self.recY
        fe.recU[self._csl] = self.recU
        fe.recV[self._csl] = self.recV


def count_mb_bits(fe, addr: int, slice_type) -> int:
    """Marginal CAVLC bits of one decided MB against the current picture
    state (skip MBs cost their run increment via the flushed skip_run)."""
    from .syntax import MBWriter
    bw = BitWriter()
    w = MBWriter(bw, fe.pic, fe.enc.sps, fe.enc.pps, fe.qp)
    nref = getattr(fe.enc, "num_ref_active", 1)
    w.write_mb(addr, slice_type, nref, 1)
    w.finish(slice_type)
    return bw.bitpos


def mb_ssd(fe, addr: int) -> int:
    """Reconstruction SSD over Y + U + V for one MB."""
    mbx, mby = addr % fe.mb_w, addr // fe.mb_w
    px, py = mbx * 16, mby * 16
    oY, oU, oV = fe._mb_orig(addr)
    ch = fe.ch_mb
    cy, cx = mby * ch, px // 2
    dy = oY.astype(np.int64) - fe.recY[py:py + 16, px:px + 16]
    du = oU.astype(np.int64) - fe.recU[cy:cy + ch, cx:cx + 8]
    dv = oV.astype(np.int64) - fe.recV[cy:cy + ch, cx:cx + 8]
    return int((dy * dy).sum() + (du * du).sum() + (dv * dv).sum())
