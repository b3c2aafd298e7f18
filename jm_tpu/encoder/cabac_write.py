"""CABAC encoding (spec 9.3.4): arithmetic encoder engine and the
syntax-element writers mirroring the decoder's binarizations.

Capability parity with lencod/src/biariencode.c (biari_encode_symbol:261,
_eq_prob:438, _final:481, arienco_start/done) and lencod/src/cabac.c —
new implementation using the spec's bit-serial renormalization with
outstanding-bit tracking; every writer is the exact inverse of the
corresponding reader in jm_tpu.decoder.cabac / mb_parse_cabac, and the
round trip is property-tested against them.
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitwriter import BitWriter
from ..decoder import cabac_tables as CT
from ..decoder.cabac import (C1ISDC, MAX_C2, MAXPOS, TYPE2CTX_ABS,
                             TYPE2CTX_BCBP, TYPE2CTX_LAST, TYPE2CTX_MAP,
                             TYPE2CTX_ONE, CabacContexts, pos2ctx_last,
                             pos2ctx_map)


class CabacEncoder:
    """Arithmetic encoder (spec 9.3.4.1) writing into a BitWriter."""

    def __init__(self, bw: BitWriter):
        self.bw = bw
        self.low = 0
        self.rng = 510
        self.outstanding = 0
        self.first_bit = True
        # exact emitted-bit accounting for RDO rate measurement (JM's
        # arienco_bits_written twin): every renormalization shift and every
        # bypass bin determines exactly one output bit (possibly deferred
        # as an outstanding bit), so counting at determination time gives
        # the exact arithmetic-coded length.
        self.bits_out = 0
        # processed-bin count (JM eep->C / set_pic_bin_count,
        # biariencode.c:186) feeding the Clause 7.4.2.10 cabac_zero_word
        # constraint at picture emission (lencod/src/nal.c:116).
        self.bins = 0

    def _put(self, b: int) -> None:
        if self.first_bit:
            self.first_bit = False
        else:
            self.bw.u(b, 1)
        while self.outstanding > 0:
            self.bw.u(1 - b, 1)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.rng < 256:
            self.bits_out += 1
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.rng <<= 1
            self.low <<= 1

    def decision(self, ctx: np.ndarray, idx: int, binval: int) -> None:
        self.bins += 1
        state = int(ctx[idx, 0])
        mps = int(ctx[idx, 1])
        r_lps = int(CT.RANGE_LPS[state, (self.rng >> 6) & 3])
        self.rng -= r_lps
        if binval != mps:
            self.low += self.rng
            self.rng = r_lps
            if state == 0:
                ctx[idx, 1] = 1 - mps
            ctx[idx, 0] = CT.NEXT_STATE_LPS[state]
        else:
            ctx[idx, 0] = CT.NEXT_STATE_MPS[state]
        self._renorm()

    def bypass(self, binval: int) -> None:
        self.bins += 1
        self.bits_out += 1
        self.low <<= 1
        if binval:
            self.low += self.rng
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def terminate(self, binval: int) -> None:
        self.bins += 1
        self.rng -= 2
        if binval:
            self.low += self.rng
            self._flush()
        else:
            self._renorm()

    def _flush(self) -> None:
        self.rng = 2
        self._renorm()
        self._put((self.low >> 9) & 1)
        self.bw.u(((self.low >> 7) & 3) | 1, 2)
        self.bits_out += 3

    # ---- composite binarizations -------------------------------------

    def unary(self, ctx, first_idx, rest_idx, value: int) -> None:
        if value == 0:
            self.decision(ctx, first_idx, 0)
            return
        self.decision(ctx, first_idx, 1)
        for _ in range(value - 1):
            self.decision(ctx, rest_idx, 1)
        self.decision(ctx, rest_idx, 0)

    def unary_max(self, ctx, first_idx, rest_idx, value, max_symbol) -> None:
        if value == 0:
            self.decision(ctx, first_idx, 0)
            return
        self.decision(ctx, first_idx, 1)
        if max_symbol == 0:
            return
        for _ in range(value - 1):
            self.decision(ctx, rest_idx, 1)
        if value < max_symbol + 1:
            self.decision(ctx, rest_idx, 0)

    def exp_golomb_eq_prob(self, value: int, k: int) -> None:
        while value >= (1 << k):
            self.bypass(1)
            value -= 1 << k
            k += 1
        self.bypass(0)
        while k:
            k -= 1
            self.bypass((value >> k) & 1)

    def ueg0_level(self, ctx, idx, value: int) -> None:
        """Inverse of CabacEngine.ueg0_level (coeff_abs_level_minus1 tail)."""
        if value == 0:
            self.decision(ctx, idx, 0)
            return
        self.decision(ctx, idx, 1)
        if value < 13:
            for _ in range(value - 1):
                self.decision(ctx, idx, 1)
            self.decision(ctx, idx, 0)
        else:
            for _ in range(12):
                self.decision(ctx, idx, 1)
            self.exp_golomb_eq_prob(value - 13, 0)

    def ueg3_mv(self, ctx, base_idx, value: int, max_bin=3) -> None:
        """Inverse of CabacEngine.ueg3_mv (|mvd| - 1 suffix): truncated
        unary (7 prefix bins max) + EG3 bypass escape."""
        if value == 0:
            self.decision(ctx, base_idx, 0)
            return
        self.decision(ctx, base_idx, 1)
        idx = base_idx + 1
        binno = 1
        escape = value >= 8
        for i in range(1, min(value, 7) + 1):
            self.decision(ctx, idx, 1 if (i < value or escape) else 0)
            binno += 1
            if binno == 2:
                idx += 1
            if binno == max_bin:
                idx += 1
        if escape:
            self.exp_golomb_eq_prob(value - 8, 3)
