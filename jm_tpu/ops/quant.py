"""Bit-exact quantization / dequantization, batched.

Decoder-side scaling follows spec 8.5.10-8.5.12 and matches the reference
ldecod exactly (ldecod/src/block.c itrans_2/itrans4x4 semantics,
ldecod/src/quant.c InvLevelScale setup). Encoder-side forward quant matches
the reference's "normal" strategy (lencod/src/quant4x4_normal.c:quant_4x4
semantics: level = (|W|*MF + f) >> qbits with JM's deadzone f).

All tensors int32; qp handling supports per-MB QP vectors (batched gather
into the (52,4,4) expanded scale tables).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..common import tables as T


_QP_ROWS = 88        # 52 + 6*(14-8): >8-bit profiles index qp + QpBdOffset


def _expand_dequant_4x4(weight_scale: np.ndarray) -> np.ndarray:
    """(88, 4, 4) int32: InvLevelScale = V[qp%6] * WS, per absolute QP
    (rows beyond 51 serve the QpBdOffset range of >8-bit decoding)."""
    ws = np.asarray(weight_scale, dtype=np.int64).reshape(4, 4)
    out = np.zeros((_QP_ROWS, 4, 4), dtype=np.int64)
    for qp in range(_QP_ROWS):
        out[qp] = T.DEQUANT_SCALE_4x4[qp % 6] * ws
    return out.astype(np.int32)


def _expand_dequant_8x8(weight_scale: np.ndarray) -> np.ndarray:
    ws = np.asarray(weight_scale, dtype=np.int64).reshape(8, 8)
    out = np.zeros((_QP_ROWS, 8, 8), dtype=np.int64)
    for qp in range(_QP_ROWS):
        out[qp] = T.DEQUANT_SCALE_8x8[qp % 6] * ws
    return out.astype(np.int32)


# flat-list tables, used when no scaling matrices are present
FLAT_INV_SCALE_4x4 = _expand_dequant_4x4(np.full((4, 4), 16))
FLAT_INV_SCALE_8x8 = _expand_dequant_8x8(np.full((8, 8), 16))

QP_PER = np.arange(52, dtype=np.int32) // 6
QP_REM = np.arange(52, dtype=np.int32) % 6


def rshift_rnd_sf(x: jnp.ndarray, a) -> jnp.ndarray:
    """Rounded right shift: (x + (1 << (a-1))) >> a, for a >= 1.

    Matches the reference's rshift_rnd_sf (lcommon/inc/typedefs-era macros).
    """
    return (x + (1 << (a - 1))) >> a


def dequant_4x4(coef: jnp.ndarray, qp: jnp.ndarray,
                inv_scale_tab=None) -> jnp.ndarray:
    """Dequantize 4x4 blocks.

    coef: (..., 4, 4) int32 quantized levels; qp: (...,) per-block QP.
    inv_scale_tab: (52, 4, 4) InvLevelScale (V * weightScale); flat default.

    d = rshift_rnd_sf((c * InvScale[qp]) << (qp/6), 4)
    (with flat lists this reduces to d = c * V << (qp/6), the classic form).
    """
    tab = jnp.asarray(inv_scale_tab if inv_scale_tab is not None
                      else FLAT_INV_SCALE_4x4)
    qp = jnp.asarray(qp, dtype=jnp.int32)
    scale = tab[qp]                                   # qp (...,) -> (..., 4, 4)
    per = (qp // 6)[..., None, None]
    x = (coef.astype(jnp.int32) * scale) << per
    return rshift_rnd_sf(x, 4)


def dequant_luma_dc(dc: jnp.ndarray, qp: jnp.ndarray,
                    inv_scale_tab=None) -> jnp.ndarray:
    """Intra16x16 luma DC scaling AFTER the inverse Hadamard (spec 8.5.10).

    dc: (..., 4, 4) inverse-hadamard-transformed DC values.
    qp: (...,) per-MB QP.
    dcY = rshift_rnd_sf((f * InvScale[qp][0,0]) << (qp/6), 6)
    """
    tab = jnp.asarray(inv_scale_tab if inv_scale_tab is not None
                      else FLAT_INV_SCALE_4x4)
    qp = jnp.asarray(qp, dtype=jnp.int32)
    scale = tab[qp, 0, 0][..., None, None]
    per = (qp // 6)[..., None, None]
    return rshift_rnd_sf((dc.astype(jnp.int32) * scale) << per, 6)


def dequant_chroma_dc(dc: jnp.ndarray, qp: jnp.ndarray,
                      inv_scale_tab=None) -> jnp.ndarray:
    """Chroma DC scaling AFTER the 2x2/2x4 Hadamard (spec 8.5.11).

    dcC = ((f * InvScale[qp][0,0]) << (qp/6)) >> 5   (floor, no rounding)
    """
    tab = jnp.asarray(inv_scale_tab if inv_scale_tab is not None
                      else FLAT_INV_SCALE_4x4)
    qp = jnp.asarray(qp, dtype=jnp.int32)
    scale = tab[qp, 0, 0]
    per = qp // 6
    while scale.ndim < dc.ndim:
        scale = scale[..., None]
        per = per[..., None]
    return ((dc.astype(jnp.int32) * scale) << per) >> 5


def dequant_8x8(coef: jnp.ndarray, qp: jnp.ndarray,
                inv_scale_tab=None) -> jnp.ndarray:
    """8x8 dequant: d = rshift_rnd_sf((c * InvScale8[qp]) << (qp/6), 6).

    InvScale8 = V8 * weightScale8 (weight 16 flat) so the flat case reduces
    to d = c * V8 << (qp/6) >> 2 with rounding — matching ldecod block.c.
    """
    tab = jnp.asarray(inv_scale_tab if inv_scale_tab is not None
                      else FLAT_INV_SCALE_8x8)
    qp = jnp.asarray(qp, dtype=jnp.int32)
    scale = tab[qp]
    per = (qp // 6)[..., None, None]
    return rshift_rnd_sf((coef.astype(jnp.int32) * scale) << per, 6)


# ---------------------------------------------------------------------------
# Encoder-side forward quantization (JM "normal" strategy)
# ---------------------------------------------------------------------------

def quant_4x4(w: jnp.ndarray, qp: jnp.ndarray, intra: bool,
              mf_tab: np.ndarray | None = None) -> jnp.ndarray:
    """level = sign(w) * ((|w| * MF[qp%6] + f) >> qbits).

    qbits = 15 + qp/6; f = (1<<qbits)/3 intra, /6 inter (JM deadzone).
    qp broadcastable to (...,) batch of blocks.
    """
    qp = jnp.asarray(qp, dtype=jnp.int32)
    mf = jnp.asarray(mf_tab if mf_tab is not None else T.QUANT_SCALE_4x4)
    scale = mf[qp % 6]
    qbits = (15 + qp // 6)[..., None, None]
    f = ((1 << (15 + qp // 6)) // (3 if intra else 6))[..., None, None]
    aw = jnp.abs(w.astype(jnp.int32))
    lev = (aw * scale + f) >> qbits
    return jnp.sign(w) * lev


def quant_luma_dc(dc: jnp.ndarray, qp: jnp.ndarray,
                  mf_tab: np.ndarray | None = None) -> jnp.ndarray:
    """Intra16x16 DC after forward Hadamard: (|c|*MF00 + 2f) >> (qbits+1)."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    mf = jnp.asarray(mf_tab if mf_tab is not None else T.QUANT_SCALE_4x4)
    scale = mf[qp % 6, 0, 0][..., None, None]
    qbits = (15 + qp // 6)[..., None, None]
    f = ((1 << (15 + qp // 6)) // 3)[..., None, None]
    aw = jnp.abs(dc.astype(jnp.int32))
    lev = (aw * scale + 2 * f) >> (qbits + 1)
    return jnp.sign(dc) * lev


def quant_chroma_dc(dc: jnp.ndarray, qp: jnp.ndarray, intra: bool,
                    mf_tab: np.ndarray | None = None) -> jnp.ndarray:
    """Chroma DC after Hadamard: (|c|*MF00 + 2f) >> (qbits+1)."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    mf = jnp.asarray(mf_tab if mf_tab is not None else T.QUANT_SCALE_4x4)
    scale = mf[qp % 6, 0, 0]
    qbits = 15 + qp // 6
    f = (1 << qbits) // (3 if intra else 6)
    while scale.ndim < dc.ndim:
        scale = scale[..., None]
        qbits = qbits[..., None]
        f = f[..., None]
    aw = jnp.abs(dc.astype(jnp.int32))
    lev = (aw * scale + 2 * f) >> (qbits + 1)
    return jnp.sign(dc) * lev
