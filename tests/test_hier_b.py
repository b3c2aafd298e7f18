"""Hierarchical B pyramids (E3): reference Bs, dyadic coding order,
POC-nearest reference selection. Oracle interop (JM ldecod bit-exact on
CAVLC/CABAC pyramids of 2/3/7 Bs, with open-GOP I anchors) verified
out-of-band with /verify."""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _seq(n=9, w=96, h=64):
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    base = (120 + 70 * np.sin(xx / 10.0) * np.cos(yy / 6.0)).astype(np.uint8)
    return [(base[i:i + h, 2 * i:2 * i + w].copy(),
             base[i:i + h:2, 2 * i:2 * i + w:2].copy(),
             base[i + 8:i + 8 + h:2, 2 * i:2 * i + w:2].copy())
            for i in range(n)]


def _roundtrip(**kw):
    frames = _seq()
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(frames)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    return enc


@pytest.mark.parametrize("nb,entropy", [(2, "cavlc"), (3, "cavlc"),
                                        (3, "cabac"), (7, "cabac")])
def test_hierarchical_pyramid_roundtrip(nb, entropy):
    enc = _roundtrip(num_b=nb, hierarchical=1, entropy=entropy)
    types = [r["type"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    assert types.count("B") >= nb          # pyramid actually emitted Bs


def test_hierarchical_uses_reference_bs():
    enc = _roundtrip(num_b=3, hierarchical=1)
    # the mid-level B of each full mini-GOP entered the DPB as a reference
    ref_pocs = {f.poc for f in enc.refs}
    assert any(p % 8 == 4 for p in ref_pocs)   # a B poc among references


def test_hierarchical_with_open_gop_intra():
    _roundtrip(num_b=3, hierarchical=1, intra_period=2, entropy="cabac")
