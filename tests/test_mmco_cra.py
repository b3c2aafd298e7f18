"""CRA MMCO policy (E24; lencod/src/mmco.c:151
cra_ref_management_frame_pic): after an open-GOP I, the next anchor
emits MMCO 1 operations unmarking every short-term reference older than
that I, making the I a clean random access point. The encoder mirrors
the decoder's marking (victims leave the encoder ref list before the
current picture is stored), so streams stay decode-exact."""

import numpy as np

from jm_tpu.bitstream.nal import split_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.decoder.header import parse_slice_header
from jm_tpu.decoder.parset import parse_pps, parse_sps
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _frames(n):
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (96 + 48, 112 + 48)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.clip(base * 1.5, 0, 255).astype(np.uint8)
    return [(base[2 * i:2 * i + 96, 3 * i:3 * i + 112].copy(),
             base[2 * i:2 * i + 96, 3 * i:3 * i + 112][::2, ::2].copy(),
             base[2 * i:2 * i + 96, 3 * i:3 * i + 112][1::2, ::2].copy())
            for i in range(n)]


def test_cra_policy_roundtrip_and_marking():
    frames = _frames(12)
    enc = Encoder(EncoderConfig(width=112, height=96, qp=30, num_b=1,
                                num_ref=3, intra_period=3,
                                mmco_policy="cra"))
    out = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    raw = H264Decoder().decode_annexb(out)
    assert len(raw) == 12
    dec = sorted(raw, key=lambda f: f.poc)      # single IDR stream
    recs = sorted(enc.results, key=lambda r: r["disp"])
    for a, r in zip(dec, recs):
        b = r["frame"]
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    # the stream carries adaptive marking with MMCO 1 ops
    sps_map, pps_map, mmco_pics = {}, {}, []
    for nal in split_annexb(out):
        if nal.nal_unit_type == 7:
            s = parse_sps(nal.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif nal.nal_unit_type == 8:
            p = parse_pps(nal.rbsp, sps_map)
            pps_map[p.pic_parameter_set_id] = p
        elif nal.nal_unit_type in (1, 5):
            h, _ = parse_slice_header(nal, sps_map, pps_map)
            if h.adaptive_ref_pic_marking_mode_flag and h.mmco_ops:
                mmco_pics.append(h.mmco_ops)
    assert mmco_pics, "no CRA MMCO emitted"
    assert all(o.op == 1 for ops in mmco_pics for o in ops)
