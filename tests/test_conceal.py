"""Error concealment (D17): lost-frame and corrupt-slice recovery.

Mirrors the reference's ConcealMode decoder behaviors (ldecod
conceal_lost_frames / ei_flag paths) driven through RTP loss injection,
the same fault model as the reference's rtp_loss tool (SURVEY.md §4.6).
"""

import numpy as np
import pytest

from jm_tpu.bitstream.rtp import annexb_to_rtp, read_rtp_dump, rtp_to_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.metrics import psnr


def _moving_sequence(n=6, w=64, h=48):
    """Smooth translating content (pan over a sinusoidal texture)."""
    yy, xx = np.mgrid[0:h + 32, 0:w + 32]
    base = (128 + 60 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 30 * np.sin((xx + yy) / 13.0)).astype(np.uint8)
    frames = []
    for i in range(n):
        Y = base[i * 2:i * 2 + h, i * 3:i * 3 + w].copy()
        U = np.full((h // 2, w // 2), 100 + i, np.uint8)
        V = np.full((h // 2, w // 2), 140 - i, np.uint8)
        frames.append((Y, U, V))
    return frames


def _encode(frames, **kw):
    w = frames[0][0].shape[1]
    h = frames[0][0].shape[0]
    enc = Encoder(EncoderConfig(width=w, height=h, qp=26, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    return out, enc


def _drop_nalu(annexb: bytes, drop_idx: int) -> bytes:
    """Remove one NALU (by RTP packet index) via the RTP container."""
    import struct
    from jm_tpu.bitstream.rtp import compose_packet
    kept = bytearray()
    for i, p in enumerate(read_rtp_dump(annexb_to_rtp(annexb))):
        if i == drop_idx:
            continue
        pkt = compose_packet(p)
        kept += struct.pack("<Ii", len(pkt), p.timestamp) + pkt
    return rtp_to_annexb(bytes(kept))


@pytest.mark.parametrize("mode", [1, 2])
def test_lost_p_frame_concealed(mode):
    frames = _moving_sequence()
    stream, enc = _encode(frames)
    # packets: SPS, PPS, IDR, P1, P2, P3, P4, P5 -> drop P2 (index 4)
    lossy = _drop_nalu(stream, 4)
    dec = H264Decoder(conceal_mode=mode)
    out = dec.decode_annexb(lossy)
    assert len(out) == len(frames)
    assert dec.concealed_count == 1
    out.sort(key=lambda f: f.poc)
    # the concealed frame must resemble its neighborhood, and the tail of
    # the sequence must keep decoding (drift allowed, catastrophe not)
    for i, f in enumerate(out):
        assert psnr(frames[i][0], f.Y) > 18.0
    # without concealment the output is a frame short (gap undetected)
    strict = H264Decoder().decode_annexb(lossy)
    assert len(strict) == len(frames) - 1


def test_lost_frame_poc_interpolation():
    frames = _moving_sequence(8)
    stream, _ = _encode(frames)
    lossy = _drop_nalu(stream, 5)  # drop P3
    dec = H264Decoder(conceal_mode=1)
    out = dec.decode_annexb(lossy)
    pocs = sorted(f.poc for f in out)
    assert pocs == [2 * i for i in range(len(frames))]


def test_corrupt_slice_concealed():
    frames = _moving_sequence()
    stream, _ = _encode(frames)
    # truncate the 5th packet's payload (a P slice body) mid-MB-data
    import struct
    from jm_tpu.bitstream.rtp import compose_packet
    pkts = read_rtp_dump(annexb_to_rtp(stream))
    pkts[4].payload = pkts[4].payload[:12]
    buf = bytearray()
    for p in pkts:
        pk = compose_packet(p)
        buf += struct.pack("<Ii", len(pk), p.timestamp) + pk
    dec = H264Decoder(conceal_mode=1)
    out = dec.decode_annexb(rtp_to_annexb(bytes(buf)))
    assert len(out) == len(frames)
    assert dec.concealed_count >= 1


def test_motion_copy_tracks_motion_better_than_copy():
    """On translating content, motion-copy conceal should not be (much)
    worse than frame copy; both must produce in-range planes."""
    frames = _moving_sequence(6)
    stream, _ = _encode(frames)
    lossy = _drop_nalu(stream, 4)
    res = {}
    for mode in (1, 2):
        dec = H264Decoder(conceal_mode=mode)
        out = sorted(dec.decode_annexb(lossy), key=lambda f: f.poc)
        res[mode] = psnr(frames[2][0], out[2].Y)
        assert out[2].Y.dtype == np.uint8
    assert res[2] >= res[1] - 0.5
