"""Property test: CAVLC residual write -> read round trip over random
blocks covering all nC classes, coefficient densities, and level ranges.
"""

import numpy as np

from jm_tpu.bitstream.bitreader import BitReader
from jm_tpu.bitstream.bitwriter import BitWriter
from jm_tpu.decoder.cavlc import residual_block_cavlc
from jm_tpu.encoder.cavlc_write import write_residual_block


def _random_block(rng, max_coeff, density, mag):
    c = np.zeros(max_coeff, np.int32)
    n = rng.integers(0, max(1, int(max_coeff * density)) + 1)
    pos = rng.choice(max_coeff, size=min(n, max_coeff), replace=False)
    vals = rng.integers(1, mag + 1, size=len(pos)) * rng.choice([-1, 1], len(pos))
    c[pos] = vals
    return c


def test_roundtrip_luma():
    rng = np.random.default_rng(42)
    for nc in (0, 1, 2, 3, 4, 7, 8, 16, 30):
        for density in (0.1, 0.4, 0.8, 1.0):
            for mag in (1, 3, 7, 30, 200, 2000):
                for _ in range(8):
                    c = _random_block(rng, 16, density, mag)
                    bw = BitWriter()
                    write_residual_block(bw, c, nc, 16)
                    bw.u(1, 1)
                    bw.align_zero()
                    br = BitReader(bw.get_bytes())
                    out, tc = residual_block_cavlc(br, nc, 16)
                    np.testing.assert_array_equal(out, c, err_msg=f"nc={nc} c={c}")
                    assert tc == np.count_nonzero(c)


def test_roundtrip_ac15():
    rng = np.random.default_rng(43)
    for nc in (0, 2, 5, 9):
        for _ in range(200):
            c = _random_block(rng, 15, rng.uniform(0, 1), 40)
            bw = BitWriter()
            write_residual_block(bw, c, nc, 15)
            bw.u(1, 1)
            bw.align_zero()
            br = BitReader(bw.get_bytes())
            out, _tc = residual_block_cavlc(br, nc, 15)
            np.testing.assert_array_equal(out, c)


def test_roundtrip_chroma_dc():
    rng = np.random.default_rng(44)
    for _ in range(400):
        c = _random_block(rng, 4, rng.uniform(0, 1.01), 60)
        bw = BitWriter()
        write_residual_block(bw, c, -1, 4)
        bw.u(1, 1)
        bw.align_zero()
        br = BitReader(bw.get_bytes())
        out, _tc = residual_block_cavlc(br, -1, 4)
        np.testing.assert_array_equal(out, c)
