"""RDOQ trellis quantization (E11, rdoq.py): derived tables, round-trip
correctness for every entropy/block-type combination, and the RD
improvement the trellis exists for. JM ldecod interop for RDOQ streams
(CAVLC and CABAC with all sub-flags) verified with /verify."""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.metrics import psnr


def test_entropy_bits_table():
    """The derived expected-bits table must satisfy the arithmetic-coder
    identities: 1 bit at the p=0.5 state, monotonically increasing LPS
    cost, decreasing MPS cost, and ~5.7 bits for the rarest LPS."""
    from jm_tpu.encoder.rdoq import ENTROPY_BITS as T
    assert T[63] == 32768 and T[64] == 32768
    assert all(T[64 + s + 1] > T[64 + s] for s in range(63))
    assert all(T[63 - s - 1] < T[63 - s] for s in range(63))
    assert 185000 < T[127] < 190000 and T[0] < 1000


def test_esterr_tables_match_reference():
    """estErr derivation (dequant^2 x inverse-basis norms) must equal the
    tables in lencod/inc/rdoq.h when the reference tree is present."""
    import pathlib
    import re
    hdr = pathlib.Path("/root/reference/lencod/inc/rdoq.h")
    if not hdr.exists():
        pytest.skip("reference tree unavailable")
    from jm_tpu.encoder.rdoq import ESTERR_4x4, ESTERR_8x8
    txt = hdr.read_text()
    m4 = re.search(r"estErr4x4\[6\]\[4\]\[4\]\s*=\s*\{(.*?)\};", txt, re.S)
    ref4 = np.array([int(x) for x in re.findall(r"-?\d+", m4.group(1))])
    assert np.array_equal(ESTERR_4x4.reshape(-1).astype(np.int64), ref4)
    m8 = re.search(r"estErr8x8\[6\]\[8\]\[8\]\s*=\s*\{(.*?)\};", txt, re.S)
    ref8 = np.array([int(x) for x in re.findall(r"-?\d+", m8.group(1))])
    assert np.array_equal(
        np.round(ESTERR_8x8.reshape(-1)).astype(np.int64), ref8)


def _foreman(n=3):
    import pathlib
    p = pathlib.Path("/root/reference/bin/foreman_part_qcif.yuv")
    if not p.exists():
        pytest.skip("foreman clip unavailable")
    raw = p.read_bytes()
    w, h = 176, 144
    fs = w * h * 3 // 2
    out = []
    for i in range(n):
        o = i * fs
        out.append((
            np.frombuffer(raw, np.uint8, w * h, o).reshape(h, w),
            np.frombuffer(raw, np.uint8, w * h // 4, o + w * h)
            .reshape(h // 2, w // 2),
            np.frombuffer(raw, np.uint8, w * h // 4, o + w * h * 5 // 4)
            .reshape(h // 2, w // 2)))
    return out


def _roundtrip(frames, **kw):
    enc = Encoder(EncoderConfig(width=176, height=144, **kw))
    bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    dec = sorted(H264Decoder().decode_annexb(bs), key=lambda f: f.poc)
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    ps = np.mean([psnr(f[0], r.Y) for f, r in zip(frames, dec)])
    return 8 * len(bs), float(ps)


@pytest.mark.parametrize("kw", [
    dict(entropy="cavlc", rdoq=1),
    dict(entropy="cavlc", rdoq=1, rdoq_dc=1, rdoq_cr=1, rdoq_dc_cr=1,
         rdo=1, sub8x8=True, num_ref=2),
    dict(entropy="cabac", rdoq=1),
    dict(entropy="cabac", rdoq=1, rdoq_dc=1, rdoq_cr=1, rdoq_dc_cr=1,
         rdo=1, transform8x8=True, num_b=1),
])
def test_rdoq_roundtrips(kw):
    _roundtrip(_foreman(), qp=28, **kw)


def test_rdoq_improves_rd_cabac():
    """The trellis must improve the rate-distortion point of the plain
    CABAC encode on real video (JM direction: more retained levels at
    better PSNR per bit)."""
    frames = _foreman()
    b0, p0 = _roundtrip(frames, qp=28, entropy="cabac")
    b1, p1 = _roundtrip(frames, qp=28, entropy="cabac", rdoq=1)
    # lambda-weighted J must strictly improve (0.85 * 2^((28-12)/3) / 8
    # bits-to-bytes scale folded in)
    from jm_tpu.encoder.rdo import lambda_mode
    lam = lambda_mode(28)
    mse0 = 255.0 ** 2 / 10 ** (p0 / 10)
    mse1 = 255.0 ** 2 / 10 ** (p1 / 10)
    npix = 176 * 144 * 3
    j0 = mse0 * npix + lam * b0
    j1 = mse1 * npix + lam * b1
    assert j1 < j0
