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


def test_explicit_gop_string():
    """E3: ExplicitHierarchyFormat coding order with per-entry QP offsets
    and reference-ness (JM interop verified with /verify)."""
    from jm_tpu.encoder.gop import parse_explicit_hierarchy
    es = parse_explicit_hierarchy("b1r1b0e3b2e3")
    assert [(e.display_no, e.as_ref, e.qp_offset) for e in es] == \
        [(1, True, 1), (0, False, 3), (2, False, 3)]
    enc = _roundtrip(num_b=3, explicit_gop="b1r1b0e3b2e3")
    qps = [r["qp"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    assert qps[1] == 33 and qps[2] == 31     # base 30 + offsets
    _roundtrip(num_b=2, explicit_gop="b0r1b1e2")   # low-delay shape
    import pytest
    with pytest.raises(ValueError):
        parse_explicit_hierarchy("p1r0")     # P enhancement unsupported
    with pytest.raises(ValueError):
        parse_explicit_hierarchy("b1r0b1e0")  # duplicate display_no
