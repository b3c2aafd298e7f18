"""CAVLC residual decoding (spec clause 9.2).

Capability parity with ldecod/src/vlc.c (readSyntaxElement_NumCoeffTrailingOnes
:695, _TotalZeros:997, _Run:1152) and ldecod/src/read_comp_cavlc.c
(readCoeff4x4_CAVLC) — new implementation: every VLC table is compiled into a
flat peek-LUT (prefix-expanded) so each codeword decode is a single table
lookup instead of a linear scan.

The code/length values are the normative spec tables 9-5 (coeff_token),
9-7/9-8 (total_zeros), 9-9 (chroma-DC total_zeros), 9-10 (run_before).
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitreader import BitReader

# --------------------------------------------------------------------------
# Normative VLC tables: (length, code) per symbol.
# coeff_token, indexed [trailing_ones][total_coeff] (0 length = invalid)
# --------------------------------------------------------------------------

# nC classes 0: 0<=nC<2, 1: 2<=nC<4, 2: 4<=nC<8  (nC>=8 is a 6-bit FLC)
_CT_LEN = [
    [  # 0 <= nC < 2
        [1, 6, 8, 9, 10, 11, 13, 13, 13, 14, 14, 15, 15, 16, 16, 16, 16],
        [0, 2, 6, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 15, 16, 16, 16],
        [0, 0, 3, 7, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 16, 16, 16],
        [0, 0, 0, 5, 6, 7, 8, 9, 10, 11, 13, 14, 14, 15, 15, 16, 16],
    ],
    [  # 2 <= nC < 4
        [2, 6, 6, 7, 8, 8, 9, 11, 11, 12, 12, 12, 13, 13, 13, 14, 14],
        [0, 2, 5, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 14, 14, 14],
        [0, 0, 3, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 13, 14, 14],
        [0, 0, 0, 4, 4, 5, 6, 6, 7, 9, 11, 11, 12, 13, 13, 13, 14],
    ],
    [  # 4 <= nC < 8
        [4, 6, 6, 6, 7, 7, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10],
        [0, 4, 5, 5, 5, 5, 6, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10],
        [0, 0, 4, 5, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 10],
        [0, 0, 0, 4, 4, 4, 4, 4, 5, 6, 7, 8, 8, 9, 10, 10, 10],
    ],
]
_CT_COD = [
    [
        [1, 5, 7, 7, 7, 7, 15, 11, 8, 15, 11, 15, 11, 15, 11, 7, 4],
        [0, 1, 4, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 1, 14, 10, 6],
        [0, 0, 1, 5, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 13, 9, 5],
        [0, 0, 0, 3, 3, 4, 4, 4, 4, 4, 12, 12, 8, 12, 8, 12, 8],
    ],
    [
        [3, 11, 7, 7, 7, 4, 7, 15, 11, 15, 11, 8, 15, 11, 7, 9, 7],
        [0, 2, 7, 10, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 11, 8, 6],
        [0, 0, 3, 9, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 6, 10, 5],
        [0, 0, 0, 5, 4, 6, 8, 4, 4, 4, 12, 8, 12, 12, 8, 1, 4],
    ],
    [
        [15, 15, 11, 8, 15, 11, 9, 8, 15, 11, 15, 11, 8, 13, 9, 5, 1],
        [0, 14, 15, 12, 10, 8, 14, 10, 14, 14, 10, 14, 10, 7, 12, 8, 4],
        [0, 0, 13, 14, 11, 9, 13, 9, 13, 10, 13, 9, 13, 9, 11, 7, 3],
        [0, 0, 0, 12, 11, 10, 9, 8, 13, 12, 12, 12, 8, 12, 10, 6, 2],
    ],
]

# chroma DC coeff_token: [yuv420, yuv422] (yuv444 uses the luma table)
_CT_DC_LEN = [
    [
        [2, 6, 6, 6, 6, 0, 0, 0, 0],
        [0, 1, 6, 7, 8, 0, 0, 0, 0],
        [0, 0, 3, 7, 8, 0, 0, 0, 0],
        [0, 0, 0, 6, 7, 0, 0, 0, 0],
    ],
    [
        [1, 7, 7, 9, 9, 10, 11, 12, 13],
        [0, 2, 7, 7, 9, 10, 11, 12, 12],
        [0, 0, 3, 7, 7, 9, 10, 11, 12],
        [0, 0, 0, 5, 6, 7, 7, 10, 11],
    ],
]
_CT_DC_COD = [
    [
        [1, 7, 4, 3, 2, 0, 0, 0, 0],
        [0, 1, 6, 3, 3, 0, 0, 0, 0],
        [0, 0, 1, 2, 2, 0, 0, 0, 0],
        [0, 0, 0, 5, 0, 0, 0, 0, 0],
    ],
    [
        [1, 15, 14, 7, 6, 7, 7, 7, 7],
        [0, 1, 13, 12, 5, 6, 6, 6, 5],
        [0, 0, 1, 11, 10, 4, 5, 5, 4],
        [0, 0, 0, 1, 1, 9, 8, 4, 4],
    ],
]

# total_zeros for 4x4 blocks: [total_coeff-1][total_zeros]
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_COD = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# total_zeros for chroma DC: [yuv420, yuv422]
_TZ_DC_LEN = [
    [[1, 2, 3, 3], [1, 2, 2], [1, 1]],
    [
        [1, 3, 3, 4, 4, 4, 5, 5],
        [3, 2, 3, 3, 3, 3, 3],
        [3, 3, 2, 2, 3, 3],
        [3, 2, 2, 2, 3],
        [2, 2, 2, 2],
        [2, 2, 1],
        [1, 1],
    ],
]
_TZ_DC_COD = [
    [[1, 1, 1, 0], [1, 1, 0], [1, 0]],
    [
        [1, 2, 3, 2, 3, 1, 1, 0],
        [0, 1, 1, 4, 5, 6, 7],
        [0, 1, 1, 2, 6, 7],
        [6, 0, 1, 2, 7],
        [0, 1, 2, 3],
        [0, 1, 1],
        [0, 1],
    ],
]

# run_before: [min(zeros_left,7)-1][run]
_RUN_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RUN_COD = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]


# --------------------------------------------------------------------------
# LUT compilation: peek W bits -> (symbol..., length)
# --------------------------------------------------------------------------

def _compile_lut(entries, width):
    """entries: iterable of (length, code, payload:int). Returns int32 array
    of size 2^width holding (payload << 8) | length, 0 where invalid."""
    lut = np.zeros(1 << width, dtype=np.int32)
    for length, code, payload in entries:
        if length == 0:
            continue
        lo = code << (width - length)
        hi = lo + (1 << (width - length))
        lut[lo:hi] = (payload << 8) | length
    return lut


def _ct_entries(lentab, codtab):
    for t1 in range(4):
        for tc in range(len(lentab[t1])):
            ln = lentab[t1][tc]
            if ln:
                yield ln, codtab[t1][tc], (tc << 2) | t1


_CT_W = 16
CT_LUT = [_compile_lut(_ct_entries(_CT_LEN[i], _CT_COD[i]), _CT_W)
          for i in range(3)]
CT_DC_LUT = [_compile_lut(_ct_entries(_CT_DC_LEN[i], _CT_DC_COD[i]), _CT_W)
             for i in range(2)]

_TZ_W = 9
TZ_LUT = [_compile_lut(
    ((_TZ_LEN[i][z], _TZ_COD[i][z], z) for z in range(len(_TZ_LEN[i]))), _TZ_W)
    for i in range(15)]
TZ_DC_LUT = [
    [_compile_lut(
        ((tab_len[z], tab_cod[z], z) for z in range(len(tab_len))), _TZ_W)
     for tab_len, tab_cod in zip(_TZ_DC_LEN[yuv], _TZ_DC_COD[yuv])]
    for yuv in range(2)
]

_RUN_W = 11
RUN_LUT = [_compile_lut(
    ((_RUN_LEN[i][r], _RUN_COD[i][r], r) for r in range(len(_RUN_LEN[i]))), _RUN_W)
    for i in range(7)]


def _read_lut(br: BitReader, lut: np.ndarray, width: int) -> int:
    """Decode one codeword via LUT; returns payload. Raises on invalid code."""
    v = int(lut[br.peek_pad(width)])
    if v == 0:
        raise ValueError(f"invalid VLC codeword at bit {br.pos}")
    br.pos += v & 0xFF
    return v >> 8


# --------------------------------------------------------------------------
# Residual block decode (spec 9.2.2 / 9.2.3)
# --------------------------------------------------------------------------

def read_coeff_token(br: BitReader, nc: int) -> tuple[int, int]:
    """Returns (total_coeff, trailing_ones). nc=-1: 4:2:0 DC, nc=-2: 4:2:2 DC."""
    if nc >= 8:
        code = br.u(6)
        t1 = code & 3
        tc = code >> 2
        if tc == 0 and t1 == 3:
            return 0, 0
        return tc + 1, t1
    if nc >= 0:
        lut = CT_LUT[0 if nc < 2 else (1 if nc < 4 else 2)]
    else:
        lut = CT_DC_LUT[0 if nc == -1 else 1]
    payload = _read_lut(br, lut, _CT_W)
    return payload >> 2, payload & 3


def residual_block_cavlc(br: BitReader, nc: int, max_coeff: int,
                         out: np.ndarray | None = None) -> tuple[np.ndarray, int]:
    """Decode one CAVLC residual block.

    Returns (coeffs in scan order, total_coeff). coeffs has max_coeff entries.
    """
    if out is None:
        out = np.zeros(max_coeff, dtype=np.int32)
    total_coeff, trailing_ones = read_coeff_token(br, nc)
    if total_coeff == 0:
        return out, 0

    suffix_len = 1 if (total_coeff > 10 and trailing_ones < 3) else 0
    levels = [0] * total_coeff
    for i in range(total_coeff):
        if i < trailing_ones:
            levels[i] = 1 - 2 * br.flag()
            continue
        prefix = br.zeros_until_one(limit=32)
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        level_code = min(15, prefix) << suffix_len
        if size > 0:
            level_code += br.u(size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == trailing_ones and trailing_ones < 3:
            level_code += 2
        if level_code % 2 == 0:
            level = (level_code + 2) >> 1
        else:
            level = (-level_code - 1) >> 1
        levels[i] = level
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    if total_coeff < max_coeff:
        if max_coeff == 4:        # 4:2:0 chroma DC
            total_zeros = _read_lut(br, TZ_DC_LUT[0][total_coeff - 1], _TZ_W)
        elif max_coeff == 8:      # 4:2:2 chroma DC
            total_zeros = _read_lut(br, TZ_DC_LUT[1][total_coeff - 1], _TZ_W)
        else:
            total_zeros = _read_lut(br, TZ_LUT[total_coeff - 1], _TZ_W)
    else:
        total_zeros = 0

    pos = total_coeff - 1 + total_zeros
    zeros_left = total_zeros
    for i in range(total_coeff):
        out[pos] = levels[i]
        if i == total_coeff - 1:
            break
        if zeros_left > 0:
            run = _read_lut(br, RUN_LUT[min(zeros_left, 7) - 1], _RUN_W)
        else:
            run = 0
        zeros_left -= run
        pos -= run + 1
    return out, total_coeff
