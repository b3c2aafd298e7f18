"""Redundant coded pictures (E34; lencod.c:2225-2352 RedundantPicture):
the encoder emits an independent coarser-QP P coding of each Nth frame
with redundant_pic_cnt=1; decoders discard it when the primary arrived
and decode it as the picture when the primary was lost."""

import numpy as np

from jm_tpu.bitstream.nal import annexb_bytes, split_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.decoder.header import parse_slice_header
from jm_tpu.decoder.parset import parse_pps, parse_sps
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 144


def _frames(n):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (H + 48, W + 48)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = np.clip(base * 1.7, 0, 255).astype(np.uint8)
    return [(base[2 * i:2 * i + H, 3 * i:3 * i + W].copy(),
             base[2 * i:2 * i + H, 3 * i:3 * i + W][::2, ::2].copy(),
             base[2 * i:2 * i + H, 3 * i:3 * i + W][1::2, ::2].copy())
            for i in range(n)]


def _encode(frames):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30,
                                redundant_period=2, redundant_qp_off=4))
    out = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    return enc, out


def _classify_nals(stream):
    """[(nal, redundant_pic_cnt or None, frame_num or None)]"""
    sps_map, pps_map = {}, {}
    out = []
    for nal in split_annexb(stream):
        rpc = fn = None
        if nal.nal_unit_type == 7:
            s = parse_sps(nal.rbsp)
            sps_map[s.seq_parameter_set_id] = s
        elif nal.nal_unit_type == 8:
            p = parse_pps(nal.rbsp, sps_map)
            pps_map[p.pic_parameter_set_id] = p
        elif nal.nal_unit_type in (1, 5):
            h, _ = parse_slice_header(nal, sps_map, pps_map)
            rpc = int(getattr(h, "redundant_pic_cnt", 0) or 0)
            fn = h.frame_num
        out.append((nal, rpc, fn))
    return out


def test_redundant_discarded_when_primary_present():
    frames = _frames(6)
    enc, out = _encode(frames)
    nals = _classify_nals(out)
    assert any(r == 1 for _, r, _f in nals), "no redundant slices emitted"
    dec = H264Decoder().decode_annexb(out)
    assert len(dec) == 6
    recs = sorted(enc.results, key=lambda r: r["disp"])
    for f, r in zip(dec, recs):
        assert np.array_equal(f.Y, r["frame"].Y)
        assert np.array_equal(f.U, r["frame"].U)
        assert np.array_equal(f.V, r["frame"].V)


def test_redundant_used_when_primary_lost():
    frames = _frames(6)
    enc, out = _encode(frames)
    nals = _classify_nals(out)
    # drop the PRIMARY slice of the first frame that also has a
    # redundant coding (same frame_num, rpc 0 vs 1)
    red_fns = {f for _n, r, f in nals if r == 1}
    victim_fn = sorted(red_fns)[0]
    rebuilt = b""
    dropped = 0
    for nal, rpc, fn in nals:
        if rpc == 0 and fn == victim_fn and dropped == 0:
            dropped += 1
            continue                      # lose the primary coding
        rebuilt += annexb_bytes(nal.nal_ref_idc, nal.nal_unit_type,
                                nal.rbsp)
    assert dropped == 1
    dec = H264Decoder().decode_annexb(rebuilt)
    assert len(dec) == 6                  # redundant filled the gap
    # the substituted frame approximates the source (coarser QP)
    k = victim_fn                         # IPPP: frame_num == display idx
    err = np.abs(dec[k].Y.astype(np.int32)
                 - frames[k][0].astype(np.int32)).mean()
    assert err < 12.0, f"redundant reconstruction too far off ({err})"
