"""4:2:2 encode (E41 partial / C5): High 4:2:2 profile, 2x4 chroma DC
hadamard at QPc+3, full-height chroma MC, CAVLC (-2 table) + CABAC
(CHROMA_DC_2x4) chroma serialization. JM ldecod interop (I/IPP/CABAC/B/
RDO all bit-exact) verified out-of-band with /verify."""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _seq422(n=3, w=96, h=64):
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    base = (120 + 70 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    out = []
    for i in range(n):
        Y = base[2 * i:2 * i + h, 3 * i:3 * i + w].copy()
        U = base[2 * i:2 * i + h, 3 * i:3 * i + w // 2].copy()
        V = base[2 * i + 8:2 * i + 8 + h, 3 * i:3 * i + w // 2].copy()
        out.append((Y, U, V))
    return out


@pytest.mark.parametrize("kw", [
    dict(intra_period=1),
    dict(),
    dict(entropy="cabac"),
    dict(entropy="cabac", num_b=1),
    dict(rdo=1),
    dict(slice_mode=1, slice_argument=10),
])
def test_y422_encode_roundtrip(kw):
    frames = _seq422()
    enc = Encoder(EncoderConfig(width=96, height=64, qp=29,
                                chroma_format=2, **kw))
    assert enc.sps.profile_idc == 122
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(frames)
    assert dec[0].U.shape == (64, 48)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y)
        assert np.array_equal(a.U, b.U)
        assert np.array_equal(a.V, b.V)
