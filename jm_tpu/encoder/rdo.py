"""True rate-distortion mode decision support (E8, the md_high tier).

Capability parity with lencod/src/rdopt.c (RDCost_for_macroblocks:1810,
store/set_stored_macroblock_parameters:2053/2460) and
rdopt_coding_state.c — new design: because serialization here is a pure
function of the PictureData SoA, the coding-state snapshot reduces to
saving/restoring one MB's rows plus its recon pixels, and the rate term
is measured by serializing just that MB with the production entropy
writers. For CABAC slices a running arithmetic coder (CabacRate) tracks
the slice's exact engine + context state MB by MB, so candidate rates
are the true marginal arithmetic-coded bits (rdopt_coding_state.c
store/reset_coding_state twin over a far smaller state vector)."""

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


def lambda_mode(qp: int, intra_rdoq: bool = False) -> float:
    """SSD-domain Lagrange multiplier (lencod/src/lambda.c
    get_implicit_lambda_p_slice:83, md_low/high share the base).
    With RDOQ enabled JM switches I slices to a smaller 0.57 factor
    (lambda.c:199,247) — the trellis over-zeroes intra blocks at the
    regular lambda."""
    f = 0.57 if intra_rdoq else 0.85
    return f * 2.0 ** ((qp - 12) / 3.0)


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
    """Marginal entropy bits of one decided MB against the current picture
    state. CAVLC: serialize the MB with the production writer (skip MBs
    cost their run increment via the flushed skip_run). CABAC: exact
    marginal arithmetic-coded bits from the slice's running engine
    (fe.cabac_rate, installed by the frame encoder when RDO is on)."""
    cr = getattr(fe, "cabac_rate", None)
    if cr is not None:
        return cr.mb_bits(addr)
    from .syntax import MBWriter
    bw = BitWriter()
    w = MBWriter(bw, fe.pic, fe.enc.sps, fe.enc.pps, fe.qp)
    nref = getattr(fe.enc, "num_ref_active", 1)
    w.write_mb(addr, slice_type, nref, 1)
    w.finish(slice_type)
    return bw.bitpos


class CabacRate:
    """Running CABAC engine + contexts for exact RDO rate measurement.

    JM measures CABAC candidate rates by snapshotting the arithmetic
    coder and every context model before each trial encode
    (lencod/src/rdopt_coding_state.c store/reset_coding_state, used from
    rdopt.c RDCost_for_macroblocks:1810). Here the same idea costs far
    less state: one engine (low/range/outstanding/bit count), the
    context arrays, and the trailing-dquant flag. MBs are committed into
    the running engine in slice order as decisions are finalized, so the
    measured marginal bits equal the final serialized bits exactly."""

    def __init__(self, fe, slice_type, cabac_init_idc: int = 0):
        from .syntax_cabac import MBWriterCABAC
        self.bw = BitWriter()
        nref = getattr(fe.enc, "num_ref_active", 1)
        self.w = MBWriterCABAC(self.bw, fe.pic, fe.enc.sps, fe.enc.pps,
                               slice_type, fe.qp, cabac_init_idc,
                               num_ref=nref)
        self.w.num_ref_l1 = getattr(fe, "num_ref_l1", 1)
        self._ctx_keys = [k for k, v in vars(self.w.ctxs).items()
                          if isinstance(v, np.ndarray)]

    def snapshot(self):
        w, eng, bw = self.w, self.w.eng, self.bw
        return (eng, eng.low, eng.rng, eng.outstanding, eng.first_bit,
                eng.bits_out, len(bw.buf), bw.acc, bw.nacc,
                w.last_dquant,
                {k: getattr(w.ctxs, k).copy() for k in self._ctx_keys})

    def restore(self, s):
        (eng, low, rng, outstanding, first_bit, bits_out,
         nbuf, acc, nacc, last_dquant, ctxs) = s
        self.w.eng = eng
        eng.low, eng.rng = low, rng
        eng.outstanding, eng.first_bit = outstanding, first_bit
        eng.bits_out = bits_out
        del self.bw.buf[nbuf:]
        self.bw.acc, self.bw.nacc = acc, nacc
        for k, v in ctxs.items():
            getattr(self.w.ctxs, k)[...] = v
        self.w.last_dquant = last_dquant

    def mb_bits(self, addr: int) -> int:
        """Exact marginal CABAC bits of the candidate MB currently staged
        in the picture SoA (engine/contexts rolled back afterwards)."""
        s = self.snapshot()
        b0 = self.w.eng.bits_out
        self.w.write_mb(addr)
        bits = self.w.eng.bits_out - b0
        self.restore(s)
        return bits

    def commit(self, addr: int) -> None:
        """Advance the running engine past the finalized MB."""
        self.w.write_mb(addr)
        self.w.eng.terminate(0)


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
