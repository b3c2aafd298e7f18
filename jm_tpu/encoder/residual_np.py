"""Numpy residual-coding helpers shared by the encoder's serial reference
path: forward transforms, quant, and the decode-mirror recon chain.

The inverse/dequant halves import the decoder's implementations so the
encoder's closed-loop reconstruction is bit-identical to what any
conforming decoder produces (the property JM maintains by linking both
binaries against lcommon).
"""

from __future__ import annotations

import numpy as np

from ..common.tables import QUANT_SCALE_4x4, QUANT_SCALE_8x8, ZIGZAG_4x4, \
    ZIGZAG_8x8
from ..decoder.recon import (_np_dequant_4x4, _np_hadamard4, _np_inv4,
                             _np_inv8, rshift_rnd_sf)
from ..ops.quant import FLAT_INV_SCALE_4x4, FLAT_INV_SCALE_8x8

_ZZ = np.asarray(ZIGZAG_4x4)
_ZZ8 = np.asarray(ZIGZAG_8x8)


def np_forward4x4(x: np.ndarray) -> np.ndarray:
    """Batched forward core transform, (..., 4, 4) int."""
    d = x.astype(np.int64)
    # vertical
    p0 = d[..., 0, :] + d[..., 3, :]
    p1 = d[..., 1, :] + d[..., 2, :]
    m0 = d[..., 0, :] - d[..., 3, :]
    m1 = d[..., 1, :] - d[..., 2, :]
    t = np.stack([p0 + p1, 2 * m0 + m1, p0 - p1, m0 - 2 * m1], axis=-2)
    # horizontal
    p0 = t[..., :, 0] + t[..., :, 3]
    p1 = t[..., :, 1] + t[..., :, 2]
    m0 = t[..., :, 0] - t[..., :, 3]
    m1 = t[..., :, 1] - t[..., :, 2]
    return np.stack([p0 + p1, 2 * m0 + m1, p0 - p1, m0 - 2 * m1], axis=-1)


def np_hadamard2x2(x: np.ndarray) -> np.ndarray:
    a, b = x[..., 0, 0], x[..., 0, 1]
    c, d = x[..., 1, 0], x[..., 1, 1]
    r0 = np.stack([a + b + c + d, a - b + c - d], axis=-1)
    r1 = np.stack([a + b - c - d, a - b - c + d], axis=-1)
    return np.stack([r0, r1], axis=-2)


def np_quant_4x4(w: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    mf = QUANT_SCALE_4x4[qp % 6].astype(np.int64)
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    lev = (np.abs(w.astype(np.int64)) * mf + f) >> qbits
    return (np.sign(w) * lev).astype(np.int32)


def np_quant_dc(dc: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """DC quant after forward Hadamard (luma 4x4 or chroma 2x2)."""
    mf = int(QUANT_SCALE_4x4[qp % 6, 0, 0])
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    lev = (np.abs(dc.astype(np.int64)) * mf + 2 * f) >> (qbits + 1)
    return (np.sign(dc) * lev).astype(np.int32)


def to_scan(raster_blocks: np.ndarray) -> np.ndarray:
    """(..., 4, 4) raster -> (..., 16) zig-zag scan order."""
    flat = raster_blocks.reshape(*raster_blocks.shape[:-2], 16)
    return flat[..., _ZZ]


def from_scan(scan: np.ndarray) -> np.ndarray:
    out = np.zeros_like(scan)
    out[..., _ZZ] = scan
    return out.reshape(*scan.shape[:-1], 4, 4)


def recon_luma_4x4(pred_blocks: np.ndarray, lev_scan: np.ndarray,
                   qp: int, tab=None) -> np.ndarray:
    """Decode-mirror recon of 16 luma 4x4 blocks (non-i16).

    pred_blocks (16,4,4); lev_scan (16,16) scan order. tab: optional
    (52,4,4) InvLevelScale for custom scaling matrices (E12).
    Returns recon (16,4,4)."""
    d = _np_dequant_4x4(from_scan(lev_scan), np.full((16,), qp, np.int64),
                        tab)
    r = (_np_inv4(d) + 32) >> 6
    return np.clip(pred_blocks + r, 0, 255).astype(np.uint8)


def recon_luma_i16(pred_blocks, ac_scan, dc_scan, qp, tab=None):
    """Decode-mirror recon for Intra16x16: ac_scan (16,16) with [*,0]==0,
    dc_scan (16,) zig-zag DC levels."""
    t = FLAT_INV_SCALE_4x4 if tab is None else tab
    d = _np_dequant_4x4(from_scan(ac_scan), np.full((16,), qp, np.int64),
                        tab)
    dc_r = from_scan(dc_scan)
    dc_t = _np_hadamard4(dc_r)
    scale = int(t[qp, 0, 0])
    dc_s = rshift_rnd_sf((dc_t.astype(np.int64) * scale) << (qp // 6), 6)
    blk = np.arange(16)
    d[blk, 0, 0] = dc_s[blk // 4, blk % 4]
    r = (_np_inv4(d) + 32) >> 6
    return np.clip(pred_blocks + r, 0, 255).astype(np.uint8)


def recon_chroma(pred_blocks, ac_scan, dc_lev, qp_c, tab=None):
    """Decode-mirror chroma recon for one component: pred_blocks (4,4,4),
    ac_scan (4,16) with [*,0]==0, dc_lev (4,) raster DC levels."""
    t = FLAT_INV_SCALE_4x4 if tab is None else tab
    d = _np_dequant_4x4(from_scan(ac_scan), np.full((4,), qp_c, np.int64),
                        tab)
    f = np_hadamard2x2(dc_lev.reshape(2, 2).astype(np.int64))
    scale = int(t[qp_c, 0, 0])
    dc_s = ((f * scale) << (qp_c // 6)) >> 5
    blk = np.arange(4)
    d[blk, 0, 0] = dc_s[blk // 2, blk % 2]
    r = (_np_inv4(d) + 32) >> 6
    return np.clip(pred_blocks + r, 0, 255).astype(np.uint8)


def np_hadamard4x2(dc_cols: np.ndarray) -> np.ndarray:
    """Forward 4:2:2 chroma DC hadamard (lcommon/src/transform.c
    hadamard4x2:220). Input/output (2, 4) in the reference's transposed
    [column i][row j] layout."""
    d = dc_cols.astype(np.int64)
    tmp = np.stack([d[0] + d[1], d[0] - d[1]])          # (2, 4)
    p0, p1, p2, p3 = tmp[:, 0], tmp[:, 1], tmp[:, 2], tmp[:, 3]
    t0, t1 = p0 + p3, p1 + p2
    t2, t3 = p1 - p2, p0 - p3
    return np.stack([t0 + t1, t3 + t2, t0 - t1, t3 - t2], axis=-1)


# 4:2:2 chroma DC transmission scan (ldecod/inc/macroblock.h SCAN_YUV422)
SCAN_YUV422 = [(0, 0), (0, 1), (1, 0), (0, 2), (0, 3), (1, 1), (1, 2),
               (1, 3)]


def quant_dc422(dc_raster: np.ndarray, qp_c: int, intra: bool,
                qfn=None) -> np.ndarray:
    """8 chroma DC levels in transmission scan order from the per-block
    raster DCs (8,) of one 8x16 component (lencod block.c:1056-1076:
    hadamard4x2 then DC quant at QPc+3). qfn: optional custom DC
    quantizer (QuantCtx.quant_dc partial) replacing np_quant_dc."""
    cols = np.stack([dc_raster[0::2], dc_raster[1::2]])   # [col i][row j]
    f = np_hadamard4x2(cols)
    lev = (qfn or np_quant_dc)(f, qp_c + 3, intra)        # (2, 4)
    return np.array([lev[i, j] for (i, j) in SCAN_YUV422], np.int32)


def recon_chroma422(pred_blocks, ac_scan, dc_scan, qp_c, tab=None):
    """Decode-mirror 4:2:2 chroma recon for one component: pred_blocks
    (8,4,4) raster blocks (2 wide x 4 tall), ac_scan (8,16) with [*,0]==0,
    dc_scan (8,) transmission-scan DC levels (recon.py:225-247 twin)."""
    t = FLAT_INV_SCALE_4x4 if tab is None else tab
    d = _np_dequant_4x4(from_scan(ac_scan), np.full((8,), qp_c, np.int64),
                        tab)
    m3 = np.zeros((2, 4), np.int64)
    for k, (i0, j0) in enumerate(SCAN_YUV422):
        m3[i0, j0] = int(dc_scan[k])
    m4 = np.stack([m3[0] + m3[1], m3[0] - m3[1]])         # (2 cols, 4)
    m6 = np.stack([m4[:, 0] + m4[:, 2], m4[:, 0] - m4[:, 2],
                   m4[:, 1] - m4[:, 3], m4[:, 1] + m4[:, 3]], axis=-1)
    f = np.stack([m6[:, 0] + m6[:, 3], m6[:, 1] + m6[:, 2],
                  m6[:, 1] - m6[:, 2], m6[:, 0] - m6[:, 3]], axis=-1)
    qpdc = qp_c + 3
    scale = int(t[qpdc, 0, 0])
    dc_s = rshift_rnd_sf((f * scale) << (qpdc // 6), 6)   # (2 cols, 4 rows)
    for j in range(4):
        for i in range(2):
            d[j * 2 + i, 0, 0] = dc_s[i, j]
    r = (_np_inv4(d) + 32) >> 6
    return np.clip(pred_blocks + r, 0, 255).astype(np.uint8)


def np_forward8x8(x: np.ndarray) -> np.ndarray:
    """Batched forward 8x8 transform (lencod/src/transform8x8.c
    forward_8x8), numpy twin of ops.transform.forward8x8."""
    from ..ops.transform import _fwd8_1d
    d = x.astype(np.int64)
    v = _fwd8_1d(tuple(d[..., j, :] for j in range(8)))
    t = np.stack(v, axis=-2)
    h = _fwd8_1d(tuple(t[..., :, i] for i in range(8)))
    return np.stack(h, axis=-1)


def np_quant_8x8(w: np.ndarray, qp: int, intra: bool) -> np.ndarray:
    """8x8 quant (lencod quant8x8_normal.c: Q_BITS_8 = 16 + qp/6)."""
    mf = QUANT_SCALE_8x8[qp % 6].astype(np.int64)
    qbits = 16 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    lev = (np.abs(w.astype(np.int64)) * mf + f) >> qbits
    return (np.sign(w) * lev).astype(np.int32)


def to_scan8(raster: np.ndarray) -> np.ndarray:
    """(..., 8, 8) raster -> (..., 64) 8x8 zig-zag order."""
    flat = raster.reshape(*raster.shape[:-2], 64)
    return flat[..., _ZZ8]


def recon_luma_8x8(pred_q: np.ndarray, lev_scan: np.ndarray,
                   qp: int, tab=None) -> np.ndarray:
    """Decode-mirror 8x8 recon: (..., 8, 8) pred + (..., 64) scan levels
    (matches decoder recon.py 8x8 path: weighted dequant, rounded >>6)."""
    r = np.zeros((*lev_scan.shape[:-1], 64), np.int64)
    r[..., _ZZ8] = lev_scan
    r = r.reshape(*lev_scan.shape[:-1], 8, 8)
    t8 = FLAT_INV_SCALE_8x8 if tab is None else tab
    scale = t8[qp].astype(np.int64)
    deq = rshift_rnd_sf((r * scale) << (qp // 6), 6)
    sp = (_np_inv8(deq) + 32) >> 6
    return np.clip(pred_q + sp, 0, 255).astype(np.uint8)


# -- JM coefficient thresholding (lencod block.c COEFF_COST4x4:72,
#    transform8x8.c COEFF_COST8x8:83; applied per inter 8x8 / MB in
#    macroblock.c:901,1248 and per chroma component in block.c:1141) ----

COEFF_COST4 = np.array([3, 2, 2, 1, 1, 1] + [0] * 10, np.int64)
COEFF_COST8 = np.array([3] * 4 + [2] * 8 + [1] * 12 + [0] * 40, np.int64)
COST_BIG = 1 << 20       # stands in for JM's MAX_VALUE (any |level| > 1)
LUMA_COEFF_COST = 4      # per inter 8x8 quadrant
LUMA_MB_COEFF_COST = 5   # per inter MB
CHROMA_COEFF_COST = 4    # per chroma component (strict <)


def coeff_cost_scan(scan, tab=COEFF_COST4, start: int = 0) -> int:
    """Run-weighted coefficient cost of one scan array (JM quant
    *_normal/_trellis c_cost accumulation)."""
    cost, run = 0, 0
    for k in range(start, len(scan)):
        v = int(scan[k])
        if v == 0:
            run += 1
        else:
            cost += COST_BIG if abs(v) > 1 else int(tab[run])
            run = 0
    return cost
