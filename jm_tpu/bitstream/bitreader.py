"""MSB-first bit reader over an RBSP byte buffer.

Host-side entropy parsing front end: fixed-length u(n), Exp-Golomb ue(v)/se(v),
and byte-alignment queries used by slice-data parsing and rbsp_trailing_bits.

Capability parity with the reference's VLC readers (ldecod/src/vlc.c: ue_v,
se_v, u_v, u_1; ldecod/src/nalu.c RBSPtoSODB) — new implementation, numpy
word-buffered for speed on long residual scans.
"""

from __future__ import annotations

import numpy as np


class BitReader:
    """Reads bits MSB-first from a bytes-like RBSP buffer."""

    __slots__ = ("data", "nbits", "pos")

    def __init__(self, data) -> None:
        self.data = np.frombuffer(bytes(data), dtype=np.uint8)
        self.nbits = len(self.data) * 8
        self.pos = 0  # absolute bit position

    # -- fixed length ------------------------------------------------------

    def u(self, n: int) -> int:
        """Read n bits as an unsigned integer (n may be 0..57)."""
        if n == 0:
            return 0
        pos = self.pos
        if pos + n > self.nbits:
            raise EOFError(f"bitreader overrun: need {n} bits at {pos}/{self.nbits}")
        byte0 = pos >> 3
        nbytes = ((pos & 7) + n + 7) >> 3
        acc = 0
        for b in self.data[byte0 : byte0 + nbytes]:
            acc = (acc << 8) | int(b)
        shift = nbytes * 8 - (pos & 7) - n
        self.pos = pos + n
        return (acc >> shift) & ((1 << n) - 1)

    def flag(self) -> int:
        pos = self.pos
        if pos >= self.nbits:
            raise EOFError("bitreader overrun")
        self.pos = pos + 1
        return (int(self.data[pos >> 3]) >> (7 - (pos & 7))) & 1

    # -- Exp-Golomb --------------------------------------------------------

    def ue(self) -> int:
        """ue(v): unsigned Exp-Golomb."""
        zeros = 0
        while self.flag() == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("invalid Exp-Golomb code (>32 leading zeros)")
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:
        """se(v): signed Exp-Golomb. code_num k -> (-1)^(k+1) * ceil(k/2)."""
        k = self.ue()
        return (k + 1) >> 1 if (k & 1) else -(k >> 1)

    # -- te(v): truncated Exp-Golomb (range 0..1 uses 1 bit inverted) ------

    def te(self, rng: int) -> int:
        if rng == 1:
            return 1 - self.flag()
        return self.ue()

    # -- position / alignment ---------------------------------------------

    def byte_aligned(self) -> bool:
        return (self.pos & 7) == 0

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def bits_left(self) -> int:
        return self.nbits - self.pos

    def more_rbsp_data(self) -> bool:
        """True if there is RBSP payload before rbsp_stop_one_bit.

        The stop bit is the last 1-bit in the buffer (followed only by
        zero alignment bits).
        """
        if self.pos >= self.nbits:
            return False
        # find last set bit in the stream
        nz = np.flatnonzero(self.data)
        if len(nz) == 0:
            return False
        last_byte = int(nz[-1])
        b = int(self.data[last_byte])
        # index (from MSB) of the lowest set bit in that byte
        low = (b & -b).bit_length() - 1  # position from LSB
        stop_bit_pos = last_byte * 8 + (7 - low)
        return self.pos < stop_bit_pos

    def peek(self, n: int) -> int:
        save = self.pos
        try:
            return self.u(n)
        finally:
            self.pos = save

    def peek_pad(self, n: int) -> int:
        """Peek n bits, zero-padding past the end of the buffer."""
        pos = self.pos
        avail = self.nbits - pos
        if avail >= n:
            return self.peek(n)
        if avail <= 0:
            return 0
        save = self.pos
        v = self.u(avail)
        self.pos = save
        return v << (n - avail)

    def zeros_until_one(self, limit: int = 32) -> int:
        """Count and consume leading zero bits up to and including the 1."""
        n = 0
        while self.flag() == 0:
            n += 1
            if n > limit:
                raise ValueError("runaway zero run in bitstream")
        return n


# Python reference implementation retained under this name; the module-level
# `BitReader` resolves to the native C implementation when jm_native is
# importable (identical API, fuzz-tested equivalent in tests/test_native.py).
PyBitReader = BitReader
try:
    from ..native import BitReader as _native_br
    from ..native import available as _native_ok
    if _native_ok and _native_br is not None:
        BitReader = _native_br
except Exception:  # pragma: no cover - native build missing
    pass
