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


# active 4x4 coefficient scan: frame pictures use the zig-zag, field
# pictures the field scan of spec 8.5.5 (ldecod pos_scan selection).
# Encoding is single-threaded; the field driver flips this around each
# field picture (encoder._encode_field).
_SCAN = {"tab": _ZZ}


def set_field_scan(on: bool) -> None:
    from ..common.tables import FIELD_SCAN_4x4
    _SCAN["tab"] = np.asarray(FIELD_SCAN_4x4) if on else _ZZ


def to_scan(raster_blocks: np.ndarray) -> np.ndarray:
    """(..., 4, 4) raster -> (..., 16) active scan order."""
    flat = raster_blocks.reshape(*raster_blocks.shape[:-2], 16)
    return flat[..., _SCAN["tab"]]


def from_scan(scan: np.ndarray) -> np.ndarray:
    out = np.zeros_like(scan)
    out[..., _SCAN["tab"]] = scan
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


# ---------------------------------------------------------------------------
# SP switching slices (E35): encoder-side transform-domain requantization,
# twin of lencod/src/block.c residual_transform_quant_luma_4x4_sp:1518 and
# residual_transform_quant_chroma_4x4_sp:1700. Levels quantize the
# difference between the transformed source and a quantize-dequantize
# estimate of the transformed prediction; reconstruction requantizes
# pred+dequant(level) at the switching QP QS (decoder twin:
# decoder/recon.py _sp_luma/_sp_chroma).
# ---------------------------------------------------------------------------

SP_A = np.array([[16, 20, 16, 20], [20, 25, 20, 25],
                 [16, 20, 16, 20], [20, 25, 20, 25]], np.int64)

_LEVRUN_INTER = (4, 2, 2, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0)
_NTAB_INTER = ((1, 3, 5, 9, 11, 13, 21, 23, 25, 27),
               (7, 17, 19, 0, 0, 0, 0, 0, 0, 0),
               (15, 0, 0, 0, 0, 0, 0, 0, 0, 0),
               (29, 0, 0, 0, 0, 0, 0, 0, 0, 0))
_LEVRUN_C2 = (2, 1, 0, 0)
_NTAB_C2 = ((1, 5), (3, 0))


def _uvlc_len(n: int) -> int:
    nn, i = n >> 1, 0
    while nn:
        nn >>= 1
        i += 1
    return 2 * i + 1


def levrun_len_inter(level: int, run: int) -> int:
    """UVLC length of a (level, run) pair (lencod vlc.c
    levrun_linfo_inter:399) — the rate term of the SP RD pick."""
    la = abs(level)
    if la <= _LEVRUN_INTER[run]:
        n = _NTAB_INTER[la - 1][run] + 1
    else:
        n = (la - _LEVRUN_INTER[run]) * 32 + run * 2
    return _uvlc_len(n)


def levrun_len_c2x2(level: int, run: int) -> int:
    la = abs(level)
    if la <= _LEVRUN_C2[run]:
        n = _NTAB_C2[la - 1][run] + 1
    else:
        n = (la - _LEVRUN_C2[run]) * 8 + run * 2
    return _uvlc_len(n)


def _isignab(a: int, b: int) -> int:
    return -abs(a) if b < 0 else abs(a)


def sp_quant_coeffs(Xs, Ps, qp: int, qs: int, lam: float, shift: int,
                    A_s, rate_fn, run0: int = -1):
    """Scan-ordered SP level decision for one block. Xs/Ps: int sequences
    in scan order; shift: 6 for 4x4 (>>6), 5 for chroma DC (>>5); A_s:
    per-scan-position A factors. Returns (levels scan order, ilev scan
    order = P + dequantA(level))."""
    from ..common.tables import QUANT_SCALE_4x4, DEQUANT_SCALE_4x4
    qp_per, qp_rem = qp // 6, qp % 6
    qs_per, qs_rem = qs // 6, qs % 6
    extra = 1 if shift == 5 else 0           # chroma DC uses q_bits+1
    q_bits = 15 + qp_per + extra
    q_bits_sp = 15 + qs_per + extra
    qp_const = ((1 << q_bits) // 6) if not extra else 2 * ((1 << (q_bits - 1)) // 6)
    qp_const2 = (1 << q_bits_sp) >> 1
    if extra:
        qp_const2 = 2 * ((1 << (q_bits_sp - 1)) >> 1)
    Qqp = QUANT_SCALE_4x4[qp_rem]
    Qqs = QUANT_SCALE_4x4[qs_rem]
    Dqp = DEQUANT_SCALE_4x4[qp_rem]
    n = len(Xs)
    levels = [0] * n
    ilevs = [0] * n
    run = run0
    for k in range(n):
        run += 1
        X, P = int(Xs[k]), int(Ps[k])
        Qs_k, Qp_k, Dp_k, A_k = (int(Qqs.flat[A_s[k][1]]),
                                 int(Qqp.flat[A_s[k][1]]),
                                 int(Dqp.flat[A_s[k][1]]), int(A_s[k][0]))
        l1p = (abs(P) * Qs_k + qp_const2) >> q_bits_sp
        l1d = (l1p << q_bits_sp) // Qs_k
        c_err1 = X - _isignab(l1d, P)
        l1 = (abs(c_err1) * Qp_k + qp_const) >> q_bits
        c_err2 = X - P
        l2 = (abs(c_err2) * Qp_k + qp_const) >> q_bits

        def deq(lv, ce):
            return (_isignab(lv, ce) * Dp_k * A_k << qp_per) >> shift

        if l1 != l2 and l1 != 0 and l2 != 0:
            d1 = X - deq(l1, c_err1) - P
            d2 = X - deq(l2, c_err2) - P
            r1 = rate_fn(l1, run)
            r2 = rate_fn(l2, run)
            D1 = d1 * d1 + lam * r1
            D2 = d2 * d2 + lam * r2
            if D1 == D2:
                level, c_err = ((l1, c_err1) if abs(l1) < abs(l2)
                                else (l2, c_err2))
            elif D1 < D2:
                level, c_err = l1, c_err1
            else:
                level, c_err = l2, c_err2
        elif l1 == l2:
            level, c_err = l1, c_err1
        else:
            level, c_err = (l1, c_err1) if l1 == 0 else (l2, c_err2)

        ilev = 0
        if level != 0:
            level = _isignab(level, c_err)
            levels[k] = level
            run = -1
            ilev = (level * Dp_k * A_k << qp_per) >> shift
        ilevs[k] = ilev + P
    return levels, ilevs


_ZZ4 = ((0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3))


def sp_requant_4x4(ilev_raster, qs: int):
    """Decoder-matching requantization of the transform-domain mix at QS:
    cof = sign(rshift_rnd_sf(|ilev| * MF_qs)) * V_qs << qs_per."""
    from ..common.tables import QUANT_SCALE_4x4, DEQUANT_SCALE_4x4
    qs_per, qs_rem = qs // 6, qs % 6
    q_bits_sp = 15 + qs_per
    half = 1 << (q_bits_sp - 1)
    Q = QUANT_SCALE_4x4[qs_rem].astype(np.int64)
    D = DEQUANT_SCALE_4x4[qs_rem].astype(np.int64)
    il = np.asarray(ilev_raster, np.int64)
    lv = np.sign(il) * ((np.abs(il) * Q + half) >> q_bits_sp)
    return (lv * D) << qs_per


_A_SCAN = None


def _a_scan():
    global _A_SCAN
    if _A_SCAN is None:
        _A_SCAN = [(int(SP_A[j][i]), j * 4 + i) for (j, i) in _ZZ4]
    return _A_SCAN


def sp_luma_levels(orig_blk, pred_blk, qp: int, qs: int, lam: float):
    """One luma 4x4: (scan levels (16,), P transform raster (4,4))."""
    X = np_forward4x4(orig_blk[None].astype(np.int64))[0]
    P = np_forward4x4(pred_blk[None].astype(np.int64))[0]
    A_s = _a_scan()
    Xs = [int(X[j, i]) for (j, i) in _ZZ4]
    Ps = [int(P[j, i]) for (j, i) in _ZZ4]
    levels, _ = sp_quant_coeffs(Xs, Ps, qp, qs, lam, 6, A_s,
                                levrun_len_inter)
    return np.array(levels, np.int64), P


def sp_luma_recon(P_raster, scan_levels, qp: int, qs: int):
    """Decoder-twin recon of one (or batched) SP luma 4x4 from its FINAL
    levels: base = P + dequantA(level); requant at QS; inverse; clip
    (== decoder/recon.py _sp_luma math)."""
    from ..common.tables import DEQUANT_SCALE_4x4
    qp_per, qp_rem = qp // 6, qp % 6
    Dqp = DEQUANT_SCALE_4x4[qp_rem].astype(np.int64)
    lev = from_scan(np.asarray(scan_levels, np.int64))
    base = P_raster + ((lev * Dqp * SP_A) << qp_per >> 6)
    cof = sp_requant_4x4(base, qs)
    res = _np_inv4_local(cof)
    return np.clip((res + (1 << 5)) >> 6, 0, 255)


def _np_inv4_local(d):
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


def _h2(M):
    """JM hadamard2x2 of the four DCs of a (2,2,4,4) [by][bx] transform
    stack — index order matches ldecod itrans_sp_cr (block.c:530):
    m[1] flips the ROW dimension (PB[4][0] term)."""
    a, b = M[0, 0, 0, 0], M[1, 0, 0, 0]
    c, d = M[0, 1, 0, 0], M[1, 1, 0, 0]
    return [int(a + b + c + d), int(a - b + c - d),
            int(a + b - c - d), int(a - b - c + d)]


def sp_chroma_levels(orig8, pred8, qp_c: int, qs_c: int, lam: float):
    """One chroma component (8x8, 4:2:0): (dc levels scan (4,), ac scan
    levels (4,16) with [0]=0, P transforms (2,2,4,4), mp1 (4,))."""
    ob = orig8.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).astype(np.int64)
    pb = pred8.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3).astype(np.int64)
    X = np_forward4x4(ob.reshape(4, 4, 4)).reshape(2, 2, 4, 4)
    P = np_forward4x4(pb.reshape(4, 4, 4)).reshape(2, 2, 4, 4)
    m1, mp1 = _h2(X), _h2(P)
    dc_levels, _ = sp_quant_coeffs(m1, mp1, qp_c, qs_c, lam, 5,
                                   [(16, 0)] * 4, levrun_len_c2x2)
    ac_levels = np.zeros((4, 16), np.int64)
    A_s = [(int(SP_A[j][i]), j * 4 + i) for (j, i) in _ZZ4[1:]]
    for by in range(2):
        for bx in range(2):
            Xs = [int(X[by, bx][j, i]) for (j, i) in _ZZ4[1:]]
            Ps = [int(P[by, bx][j, i]) for (j, i) in _ZZ4[1:]]
            lv, _ = sp_quant_coeffs(Xs, Ps, qp_c, qs_c, lam, 6, A_s,
                                    levrun_len_inter)
            ac_levels[by * 2 + bx, 1:] = lv
    return np.array(dc_levels, np.int64), ac_levels, P, np.array(mp1)


def sp_chroma_recon(P, mp1, dc_levels, ac_scan, qp_c: int, qs_c: int):
    """Decoder-twin recon of one SP chroma component from FINAL levels
    (== decoder/recon.py _sp_chroma math). Returns 8x8."""
    from ..common.tables import QUANT_SCALE_4x4, DEQUANT_SCALE_4x4
    qp_per, qp_rem = qp_c // 6, qp_c % 6
    qs_per, qs_rem = qs_c // 6, qs_c % 6
    qb = 15 + qs_per
    Dqp = DEQUANT_SCALE_4x4[qp_rem].astype(np.int64)
    Q00 = int(QUANT_SCALE_4x4[qs_rem][0, 0])
    D00 = int(DEQUANT_SCALE_4x4[qs_rem][0, 0])
    half2 = 1 << qb
    bdc = np.asarray(mp1, np.int64) + \
        ((np.asarray(dc_levels, np.int64) * int(Dqp[0, 0]) * 16)
         << qp_per >> 5)
    ildc = np.sign(bdc) * ((np.abs(bdc) * Q00 + half2) >> (qb + 1))
    m1q = (ildc * D00) << qs_per
    lev = from_scan(np.asarray(ac_scan, np.int64)).reshape(2, 2, 4, 4)
    base = P + ((lev * Dqp * SP_A) << qp_per >> 6)
    cof = sp_requant_4x4(base, qs_c)
    cof[0, 0, 0, 0] = (m1q[0] + m1q[1] + m1q[2] + m1q[3]) >> 1
    cof[0, 1, 0, 0] = (m1q[0] + m1q[1] - m1q[2] - m1q[3]) >> 1
    cof[1, 0, 0, 0] = (m1q[0] - m1q[1] + m1q[2] - m1q[3]) >> 1
    cof[1, 1, 0, 0] = (m1q[0] - m1q[1] - m1q[2] + m1q[3]) >> 1
    res = _np_inv4_local(cof)
    rec = np.clip((res + (1 << 5)) >> 6, 0, 255)
    return rec.transpose(0, 2, 1, 3).reshape(8, 8)
