"""Custom quantization matrices, explicit quant offsets, adaptive rounding.

Encoder-side parity with:
- lencod/src/q_matrix.c (QmatrixFile parsing q_matrix.c:252-489,
  CalculateQuant4x4Param:591 / CalculateQuant8x8Param: forward ScaleComp =
  (quant_coef << 4) / ScalingList, inverse InvScaleComp = dequant_coef *
  ScalingList);
- lencod/src/q_offsets.c (QOffsetMatrixFile parsing, OffsetComp = list
  value << (Q_BITS + qp/6 - OffsetBits), OffsetBits = 11, q_offsets.h:18);
- lencod/src/q_around.c (JVT-N011 adaptive rounding: per-coefficient
  fadjust = rshift_rnd_sf(W * (scaled - (level << qbits)), qbits + 1)
  accumulated into the offset lists, clipped to [0, 1 << (OffsetBits-1)],
  with OffsetComp recomputed every AdaptRndPeriod MBs, slice.c:488).

Matrices in `q_matrix.cfg` / `q_offset.cfg` are RASTER-ordered (q_matrix.c
indexes ScalingList4x4[(j<<2)+i]); SPS/PPS transmission is zig-zag, so
`to_zigzag*` convert at the syntax boundary. The decoder half (parse +
inverse scaling) already exists in decoder/parset.py + decoder/recon.py;
this module adds the forward side and the cfg-file front end.

Simplification vs the reference: only the 15 named 4x4 and 5 luma 8x8
offset categories are kept (the remaining OffsetList rows exist solely for
4:4:4 separate-plane coding); adaptive rounding captures fadjust from the
committed encode of each MB (the reference reaches the same state via its
ARCofAdj store/update dance across mode trials, q_around.c:44-120).

Deliberately not ported: quant4x4_2step.c / quantChroma_2step.c. Those
"two-step" quantizers are dead code in JM 19.0 — no call site, no header
declaration, and init_quant_4x4/init_quant_Chroma (quant4x4.c,
quantChroma.c) only ever select the normal/trellis/around variants, all
three of which exist here (quant dispatch, rdoq.py, adaptive rounding).
"""

from __future__ import annotations

import numpy as np

from ..common.tables import (QUANT_SCALE_4x4, QUANT_SCALE_8x8, ZIGZAG_4x4,
                             ZIGZAG_8x8)
from ..decoder.parset import (DEFAULT_4x4_INTER, DEFAULT_4x4_INTRA,
                              DEFAULT_8x8_INTER, DEFAULT_8x8_INTRA)

_ZZ4 = np.asarray(ZIGZAG_4x4)
_ZZ8 = np.asarray(ZIGZAG_8x8)

OFFSET_BITS = 11                     # q_offsets.h:18
OFFSET_RANGE = 1 << (OFFSET_BITS - 1)

MATRIX4_NAMES = ("INTRA4X4_LUMA", "INTRA4X4_CHROMAU", "INTRA4X4_CHROMAV",
                 "INTER4X4_LUMA", "INTER4X4_CHROMAU", "INTER4X4_CHROMAV")
MATRIX8_NAMES = ("INTRA8X8_LUMA", "INTER8X8_LUMA")

# q_offsets.c:24 OffsetType4x4 (first 15; rest are 4:4:4-only)
OFFSET4_NAMES = (
    "INTRA4X4_LUMA_INTRA", "INTRA4X4_CHROMAU_INTRA", "INTRA4X4_CHROMAV_INTRA",
    "INTRA4X4_LUMA_INTERP", "INTRA4X4_CHROMAU_INTERP",
    "INTRA4X4_CHROMAV_INTERP",
    "INTRA4X4_LUMA_INTERB", "INTRA4X4_CHROMAU_INTERB",
    "INTRA4X4_CHROMAV_INTERB",
    "INTER4X4_LUMA_INTERP", "INTER4X4_CHROMAU_INTERP",
    "INTER4X4_CHROMAV_INTERP",
    "INTER4X4_LUMA_INTERB", "INTER4X4_CHROMAU_INTERB",
    "INTER4X4_CHROMAV_INTERB")
# q_offsets.c:42 OffsetType8x8 (luma rows only)
OFFSET8_NAMES = ("INTRA8X8_LUMA_INTRA", "INTRA8X8_LUMA_INTERP",
                 "INTRA8X8_LUMA_INTERB", "INTER8X8_LUMA_INTERP",
                 "INTER8X8_LUMA_INTERB")

# default offset lists (q_offsets.c:135-208): intra 682 (~1/3), inter 342
# (~1/6), scaled by 2048
_OFF_INTRA = 682
_OFF_INTER = 342


def default_offsets():
    """(off4 (15,16), off8 (5,64)) int16 defaults (InitOffsetParam else
    branch, q_offsets.c:546-568)."""
    off4 = np.empty((15, 16), np.int32)
    for k in range(15):
        intra_blk = k < 9                       # INTRA4X4_* rows
        off4[k] = _OFF_INTRA if intra_blk else _OFF_INTER
    off8 = np.empty((5, 64), np.int32)
    for k in range(5):
        off8[k] = _OFF_INTRA if k < 3 else _OFF_INTER
    return off4, off8


def _parse_sections(text: str, names, size: int):
    """JM matrix-file tokenizer (q_matrix.c:300-380): NAME = v,v,v...
    Values separated by commas/whitespace; '#' comments."""
    # strip comments
    body = "\n".join(ln.split("#", 1)[0] for ln in text.splitlines())
    out = {}
    import re
    for m in re.finditer(r"([A-Z0-9_]+)\s*=", body):
        name = m.group(1)
        if name not in names:
            continue
        tail = body[m.end():]
        nxt = re.search(r"[A-Z0-9_]{4,}\s*=", tail)
        seg = tail[:nxt.start()] if nxt else tail
        vals = [int(v) for v in re.findall(r"-?\d+", seg)][:size]
        if name in out:                          # JM keeps the FIRST match
            continue
        if len(vals) == size:
            out[name] = vals
    return out


def parse_matrix_cfg(text: str):
    """QmatrixFile -> (lists4 [6] raster-or-None, lists8 [2]).

    First value 0 => use default matrix for that list (q_matrix.c:433).
    """
    sec = _parse_sections(text, set(MATRIX4_NAMES), 16)
    sec8 = _parse_sections(text, set(MATRIX8_NAMES), 64)
    l4 = []
    for i, nm in enumerate(MATRIX4_NAMES):
        v = sec.get(nm)
        if v is None or v[0] == 0:
            dflt = DEFAULT_4x4_INTRA if i < 3 else DEFAULT_4x4_INTER
            l4.append(from_zigzag4(dflt))
        else:
            l4.append([min(255, max(1, x)) for x in v])
    l8 = []
    for i, nm in enumerate(MATRIX8_NAMES):
        v = sec8.get(nm)
        if v is None or v[0] == 0:
            dflt = DEFAULT_8x8_INTRA if i == 0 else DEFAULT_8x8_INTER
            l8.append(from_zigzag8(dflt))
        else:
            l8.append([min(255, max(1, x)) for x in v])
    return l4, l8


def parse_offset_cfg(text: str):
    """QOffsetMatrixFile -> (off4 (15,16), off8 (5,64)) raster int32."""
    off4, off8 = default_offsets()
    sec = _parse_sections(text, set(OFFSET4_NAMES), 16)
    for k, nm in enumerate(OFFSET4_NAMES):
        if nm in sec:
            off4[k] = sec[nm]
    sec8 = _parse_sections(text, set(OFFSET8_NAMES), 64)
    for k, nm in enumerate(OFFSET8_NAMES):
        if nm in sec8:
            off8[k] = sec8[nm]
    return off4, off8


def to_zigzag4(raster16) -> list:
    return [raster16[i] for i in _ZZ4]


def to_zigzag8(raster64) -> list:
    return [raster64[i] for i in _ZZ8]


def from_zigzag4(zz16) -> list:
    out = [0] * 16
    for k, pos in enumerate(_ZZ4):
        out[pos] = zz16[k]
    return out


def from_zigzag8(zz64) -> list:
    out = [0] * 64
    for k, pos in enumerate(_ZZ8):
        out[pos] = zz64[k]
    return out


def write_scaling_list(bw, lst_zz, size: int) -> None:
    """scaling_list() syntax (spec 7.3.2.1.1.1), delta-coded from the
    zig-zag-ordered list (lencod parset.c Scaling_List)."""
    last = 8
    for j in range(size):
        nxt = int(lst_zz[j])
        delta = (nxt - last) % 256
        if delta > 127:
            delta -= 256
        bw.se(delta)
        last = nxt
        # once a 0 is written every later value repeats `last`; JM never
        # emits mid-list zeros from cfg matrices (values clamped to 1..255)


# 4x4 offset-list row per (slice_type, block_intra, plane): q_offsets.c
# CalculateOffset4x4Param slice-type dispatch (I/P/B)
def _off4_row(slice_type: str, intra: bool, plane: int) -> int:
    if intra:
        base = {"I": 0, "P": 3, "B": 6}[slice_type]
        return base + plane
    return (9 if slice_type != "B" else 12) + plane


def _off8_row(slice_type: str, intra: bool) -> int:
    if intra:
        return {"I": 0, "P": 1, "B": 2}[slice_type]
    return 3 if slice_type != "B" else 4


class QuantCtx:
    """Per-frame forward/inverse quant parameters + adaptive rounding.

    Built once per coded picture; quant methods mirror
    quant4x4_normal/quant_dc4x4_normal/quant8x8_normal with ScaleComp /
    OffsetComp / InvScaleComp semantics. `lists4/lists8` are raster-order
    scaling matrices (flat 16s when no q-matrix); `off_state` is shared
    across frames when adaptive rounding is on (it carries the learned
    offsets forward like p_Quant->OffsetList4x4).
    """

    def __init__(self, lists4, lists8, slice_type: str, off_state=None,
                 ar_weight: int = 0):
        self.slice_type = slice_type
        self.ar_weight = ar_weight                  # AdaptRndWeight (0 = off)
        ws4 = [np.asarray(l, np.int64).reshape(4, 4) for l in lists4]
        ws8 = [np.asarray(l, np.int64).reshape(8, 8) for l in lists8]
        # forward: (cat, 6, 4, 4) ScaleComp; inverse: (cat, 52, 4, 4)
        self.scale4 = np.stack([
            (QUANT_SCALE_4x4.astype(np.int64) << 4) // w for w in ws4])
        self.scale8 = np.stack([
            (QUANT_SCALE_8x8.astype(np.int64) << 4) // w for w in ws8])
        from ..common.tables import DEQUANT_SCALE_4x4, DEQUANT_SCALE_8x8
        self.inv4 = np.stack([np.stack([
            DEQUANT_SCALE_4x4[qp % 6] * w for qp in range(52)])
            for w in ws4]).astype(np.int32)
        self.inv8 = np.stack([np.stack([
            DEQUANT_SCALE_8x8[qp % 6] * w for qp in range(52)])
            for w in ws8]).astype(np.int32)
        if off_state is None:
            off_state = default_offsets()
        self.off4, self.off8 = off_state
        # quant reads the *active* copy; the learned lists fold in only at
        # AdaptRndPeriod boundaries (CalculateOffset4x4Param cadence,
        # slice.c:488)
        self.off4_active = self.off4.copy()
        self.off8_active = self.off8.copy()
        self._pending4 = np.zeros((15, 16), np.int64)
        self._pending8 = np.zeros((5, 64), np.int64)

    def maybe_refresh(self, mb_idx: int, period: int) -> None:
        if self.ar_weight and period and mb_idx % period == 0:
            self.off4_active[:] = self.off4
            self.off8_active[:] = self.off8

    # -- category helpers ---------------------------------------------------
    def cat4(self, plane: int, intra: bool) -> int:
        """Scaling-list index: 0..2 intra Y/Cb/Cr, 3..5 inter."""
        return plane + (0 if intra else 3)

    # -- forward quant ------------------------------------------------------
    def _offset4(self, plane: int, intra: bool, qp: int) -> np.ndarray:
        row = _off4_row(self.slice_type, intra, plane)
        sh = 15 + qp // 6 - OFFSET_BITS
        return (self.off4_active[row].astype(np.int64) << sh) \
            .reshape(4, 4), row, sh

    def quant_4x4(self, w: np.ndarray, qp: int, plane: int,
                  intra: bool) -> np.ndarray:
        """(..., 4, 4) residual coefficients -> levels (quant4x4_normal /
        quant4x4_around)."""
        qbits = 15 + qp // 6
        sc = self.scale4[self.cat4(plane, intra), qp % 6]
        off, row, _sh = self._offset4(plane, intra, qp)
        aw = np.abs(w.astype(np.int64))
        scaled = aw * sc
        lev = (scaled + off) >> qbits
        if self.ar_weight:
            # quant4x4_around.c: fadjust = rshift((W*(scaled - lev<<qb)),
            # qb+1), accumulated over the MB's committed blocks
            err = np.where(aw > 0, scaled - (lev << qbits), 0)
            adj = (self.ar_weight * err + (1 << qbits)) >> (qbits + 1)
            upd = np.where(lev > 0, adj, 0)
            self._pending4[row] += upd.reshape(-1, 16).sum(axis=0)
        return (np.sign(w) * lev).astype(np.int32)

    def quant_dc(self, dc: np.ndarray, qp: int, plane: int,
                 intra: bool) -> np.ndarray:
        """Hadamard-domain DC quant: scale/offset from the [0,0] entry
        (quant_dc4x4_normal: OffsetComp << 1, >> (q_bits + 1))."""
        qbits = 15 + qp // 6
        sc = int(self.scale4[self.cat4(plane, intra), qp % 6, 0, 0])
        off, _row, _sh = self._offset4(plane, intra, qp)
        f = int(off[0, 0])
        lev = (np.abs(dc.astype(np.int64)) * sc + 2 * f) >> (qbits + 1)
        return (np.sign(dc) * lev).astype(np.int32)

    def quant_8x8(self, w: np.ndarray, qp: int, intra: bool) -> np.ndarray:
        qbits = 16 + qp // 6
        sc = self.scale8[0 if intra else 1, qp % 6]
        row = _off8_row(self.slice_type, intra)
        sh = 16 + qp // 6 - OFFSET_BITS
        off = (self.off8_active[row].astype(np.int64) << sh).reshape(8, 8)
        aw = np.abs(w.astype(np.int64))
        scaled = aw * sc
        lev = (scaled + off) >> qbits
        if self.ar_weight:
            err = np.where(aw > 0, scaled - (lev << qbits), 0)
            adj = (self.ar_weight * err + (1 << qbits)) >> (qbits + 1)
            upd = np.where(lev > 0, adj, 0)
            self._pending8[row] += upd.reshape(-1, 64).sum(axis=0)
        return (np.sign(w) * lev).astype(np.int32)

    # -- inverse tables for the recon mirror --------------------------------
    def inv_tab4(self, plane: int, intra: bool) -> np.ndarray:
        return self.inv4[self.cat4(plane, intra)]

    def inv_tab8(self, intra: bool) -> np.ndarray:
        return self.inv8[0 if intra else 1]

    # -- adaptive rounding state machine ------------------------------------
    def ar_snapshot(self):
        return (self._pending4.copy(), self._pending8.copy())

    def ar_restore(self, snap) -> None:
        self._pending4, self._pending8 = snap[0].copy(), snap[1].copy()

    def ar_commit_mb(self) -> None:
        """Fold the MB's fadjust into the offset lists (q_around.c
        update_offset_params, clip to [0, OFFSET_RANGE])."""
        if not self.ar_weight:
            return
        np.clip(self.off4 + self._pending4, 0, OFFSET_RANGE, out=self.off4)
        np.clip(self.off8 + self._pending8, 0, OFFSET_RANGE, out=self.off8)
        self._pending4[:] = 0
        self._pending8[:] = 0

    def state(self):
        return (self.off4, self.off8)
