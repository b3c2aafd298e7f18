"""Long-term references + MMCO encode (E24) and ref-list modification
commands. JM interop (P/B/hierarchical with long-term anchors bit-exact
through ldecod) verified out-of-band with /verify."""

import numpy as np

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _seq(n=9, w=96, h=64):
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    base = (120 + 70 * np.sin(xx / 10.0) * np.cos(yy / 6.0)).astype(np.uint8)
    return [(base[i:i + h, 2 * i:2 * i + w].copy(),
             base[i:i + h:2, 2 * i:2 * i + w:2].copy(),
             base[i + 8:i + 8 + h:2, 2 * i:2 * i + w:2].copy())
            for i in range(n)]


def _run(**kw):
    frames = _seq()
    enc = Encoder(EncoderConfig(width=96, height=64, qp=30, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(rec)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U)
    return enc


def test_long_term_p():
    enc = _run(long_term_period=3, num_ref=2)
    lts = [f for f in enc.refs if f.is_long_term]
    assert len(lts) == 1           # one LT slot, newest marking wins


def test_long_term_with_b_and_reorder():
    _run(long_term_period=4, num_ref=2, num_b=1)
    _run(long_term_period=4, num_ref=2, num_b=3, hierarchical=1)
    _run(long_term_period=4, num_ref=2, num_b=1, entropy="cabac")


def test_ref_mod_ops():
    from jm_tpu.decoder.dpb import Frame
    enc = Encoder(EncoderConfig(width=96, height=64, num_ref=2))
    enc.frame_num = 5
    st = Frame(poc=8, frame_num=4, Y=None, U=None, V=None)
    lt = Frame(poc=0, frame_num=0, Y=None, U=None, V=None,
               is_long_term=True, long_term_frame_idx=0)
    assert enc._ref_mod_ops([st, lt], st) is None
    assert enc._ref_mod_ops([st, lt], lt) == [(2, 0)]
    assert enc._ref_mod_ops([lt, st], st) == [(0, 0)]   # pic_num 4, cur 5
