"""ExplicitSeqCoding (E3; lencod/src/explicit_seq.c): script-file-driven
coding order — the reference's `Sequence { Frame { SeqNumber/SliceType/
IDRPicture/Reference } }` dialect, applied cyclically over the clip."""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.encoder.gop import encode_explicit_seq, parse_explicit_seq_file

SCRIPT = """
Sequence {
FrameCount : 5
Frame { SeqNumber : 0
SliceType : I
IDRPicture : 1
Reference : 1 }
Frame { SeqNumber : 2
SliceType : P
Reference : 1 }
Frame { SeqNumber : 1
SliceType : B
Reference : 0 }
Frame { SeqNumber : 4
SliceType : P
Reference : 1 }
Frame { SeqNumber : 3
SliceType : B
Reference : 1 }
}
"""


def _frames(n):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (96 + 32, 112 + 32)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.clip(base * 1.5, 0, 255).astype(np.uint8)
    return [(base[2 * i:2 * i + 96, 3 * i:3 * i + 112].copy(),
             base[2 * i:2 * i + 96, 3 * i:3 * i + 112][::2, ::2].copy(),
             base[2 * i:2 * i + 96, 3 * i:3 * i + 112][1::2, ::2].copy())
            for i in range(n)]


def test_parse_explicit_seq():
    entries = parse_explicit_seq_file(SCRIPT)
    assert [e.slice_type for e in entries] == list("IPBPB")
    assert [e.seq_number for e in entries] == [0, 2, 1, 4, 3]
    assert entries[0].idr and entries[2].reference == 0
    with pytest.raises(ValueError):
        parse_explicit_seq_file(
            "Sequence { Frame { SeqNumber : 0\nSliceType : P\n} }")


def test_explicit_seq_roundtrip():
    """The scripted schedule (incl. a reference B and a per-cycle IDR)
    encodes and self-decodes bit-exactly."""
    entries = parse_explicit_seq_file(SCRIPT)
    frames = _frames(10)
    enc = Encoder(EncoderConfig(width=112, height=96, qp=30, num_b=1,
                                num_ref=2))
    out = b"".join(encode_explicit_seq(enc, frames, entries))
    types = [r["type"] for r in sorted(enc.results,
                                       key=lambda r: r["disp"])]
    assert types == list("IBPBP") * 2       # cycle applied twice
    # decoder output: group per IDR segment, order by poc inside
    raw = H264Decoder().decode_annexb(out)
    segs, cur = [], []
    for f in raw:
        if f.poc == 0 and cur:
            segs.append(cur)
            cur = []
        cur.append(f)
    segs.append(cur)
    dec = [f for s in segs for f in sorted(s, key=lambda f: f.poc)]
    recs = sorted(enc.results, key=lambda r: r["disp"])
    assert len(dec) == 10
    for a, r in zip(dec, recs):
        b = r["frame"]
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
