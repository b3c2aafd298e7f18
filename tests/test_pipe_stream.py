"""The pipelined device IPPP driver (Encoder.encode_stream +
ops/enc_jax.p_frame_pipe) must produce byte-identical bitstreams to the
per-frame classic device path, including the speculative-intra fallback,
and the streams must decode bit-exactly."""

import numpy as np
import pytest

from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def make_frames(w, h, n, seed=0, noise_at=None):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = np.clip(base * 1.6, 0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        Y = base[2 * i:2 * i + h, i:i + w].copy()
        if noise_at is not None and i == noise_at:
            Y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        U = Y[::2, ::2].copy()
        V = Y[1::2, ::2].copy()
        frames.append((Y, U, V))
    return frames


@pytest.mark.parametrize("nframes,noise_at,intra_period,rd", [
    (5, None, 0, False),
    (4, 2, 0, False),    # scene cut -> intra speculation fails -> fallback
    (6, None, 3, False),  # periodic IDR inside the stream
    (5, None, 0, True),   # device md_high RD decisions (enc_rd.py)
    (6, None, 3, True),
])
def test_stream_matches_classic(nframes, noise_at, intra_period, rd):
    w, h = 96, 80
    frames = make_frames(w, h, nframes, noise_at=noise_at)
    cfg = EncoderConfig(width=w, height=h, qp=30, pipeline="device",
                        intra_period=intra_period, device_rd=rd)
    classic = Encoder(cfg)
    want = [classic.encode_frame(*f) for f in frames]
    piped = Encoder(cfg)
    got = piped.encode_stream(frames)
    assert len(got) == len(want)
    for i, (g, x) in enumerate(zip(got, want)):
        assert g == x, f"frame {i} payload differs"


def test_stream_rd_decodes_bitexact():
    """device_rd streams must decode bit-exactly and beat md_low RD-wise
    (fewer bits at no PSNR loss on this clip)."""
    w, h = 96, 80
    frames = make_frames(w, h, 5, seed=9)
    from jm_tpu.decoder.decoder import H264Decoder
    sizes = {}
    for rd in (False, True):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=30,
                                    pipeline="device", device_rd=rd))
        payloads = enc.encode_stream(frames)
        out = H264Decoder().decode_annexb(b"".join(payloads))
        for got, want in zip(out, sorted(enc.results,
                                         key=lambda r: r["disp"])):
            assert np.array_equal(got.Y, want["frame"].Y)
            assert np.array_equal(got.U, want["frame"].U)
            assert np.array_equal(got.V, want["frame"].V)
        sizes[rd] = sum(len(p) for p in payloads)
    assert sizes[True] < sizes[False]


def test_stream_decodes_bitexact():
    w, h = 96, 80
    frames = make_frames(w, h, 5, seed=7)
    cfg = EncoderConfig(width=w, height=h, qp=27, pipeline="device")
    enc = Encoder(cfg)
    payloads = enc.encode_stream(frames)

    from jm_tpu.decoder.decoder import H264Decoder
    dec = H264Decoder()
    out = dec.decode_annexb(b"".join(payloads))
    assert len(out) == 5
    for got, want in zip(out, sorted(enc.results, key=lambda r: r["disp"])):
        f = want["frame"]
        assert np.array_equal(got.Y, f.Y)
        assert np.array_equal(got.U, f.U)
        assert np.array_equal(got.V, f.V)


def test_stream_nonfast_config_falls_back():
    w, h = 96, 80
    frames = make_frames(w, h, 3, seed=3)
    cfg = EncoderConfig(width=w, height=h, qp=30, pipeline="device",
                        entropy="cabac")
    a = Encoder(cfg)
    want = [a.encode_frame(*f) for f in frames]
    b = Encoder(cfg)
    got = b.encode_stream(frames)
    assert got == want
