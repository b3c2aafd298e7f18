"""PAFF field ENCODE (E42 encode side; lencod image.c:751
perform_encode_field twin): PicInterlace=1-style field coding — every
frame coded as top+bottom field pictures, parity-alternating reference
lists (spec 8.2.4.2.5), frame-unit sliding window, field coefficient
scan, field deblock bS rules, opposite-parity chroma MV adjustment.

The produced streams were verified byte-identical in the reference
ldecod (/verify drive: .refbuild ldecod.exe on field_ours.264 == our
decode weave); these tests assert the self-decode equality on every run.
"""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 128


def _frames(n, seed=5):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H + 48, W + 48)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = np.clip(base * 1.7, 0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        Y = base[2 * i:2 * i + H, 3 * i:3 * i + W].copy()
        out.append((Y, Y[::2, ::2].copy(), Y[1::2, ::2].copy()))
    return out


def _roundtrip(cfg, frames):
    enc = Encoder(cfg)
    out = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    # IPPP fields: decoder output order == display order (poc keys would
    # collide across mid-stream IDR resets)
    dec = H264Decoder().decode_annexb(out)
    assert len(dec) == len(frames)
    recs = sorted(enc.results, key=lambda r: (r["disp"], r["parity"]))
    for k, fr in enumerate(dec):
        top, bot = recs[2 * k]["frame"], recs[2 * k + 1]["frame"]
        for plane in ("Y", "U", "V"):
            t, b = getattr(top, plane), getattr(bot, plane)
            woven = np.empty((t.shape[0] * 2, t.shape[1]), np.uint8)
            woven[::2], woven[1::2] = t, b
            np.testing.assert_array_equal(getattr(fr, plane), woven,
                                          err_msg=f"frame {k} {plane}")
    return out, enc


@pytest.mark.parametrize("num_ref", [1, 2])
def test_field_encode_roundtrip(num_ref):
    frames = _frames(5)
    out, enc = _roundtrip(EncoderConfig(width=W, height=H, qp=30,
                                        pic_interlace=1, num_ref=num_ref),
                          frames)
    # every frame produced two field pictures
    assert len(enc.results) == 2 * len(frames)
    assert {r["parity"] for r in enc.results} == {0, 1}


def test_field_encode_idr_period():
    """Mid-stream IDR on a top field resets frame_num/refs like the
    frame path; the bottom field of each IDR frame predicts from the
    opposite-parity top field (chroma MV parity adjustment)."""
    frames = _frames(7, seed=9)
    out, enc = _roundtrip(EncoderConfig(width=W, height=H, qp=31,
                                        pic_interlace=1, num_ref=1,
                                        intra_period=3), frames)
    types = [r["type"] for r in sorted(enc.results,
                                       key=lambda r: (r["disp"],
                                                      r["parity"]))]
    assert types[0] == "I" and types[6] == "I"       # IDR every 3 frames
    assert types[1] == "P"                           # bottom of IDR frame


def test_field_sps_geometry():
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30, pic_interlace=1))
    assert enc.sps.frame_mbs_only_flag == 0
    assert enc.sps.mb_adaptive_frame_field_flag == 0
    # map units are field MB rows: (2 - frame_mbs_only) * units == H/16
    assert 2 * (enc.sps.pic_height_in_map_units_minus1 + 1) == H // 16
    with pytest.raises(NotImplementedError):
        Encoder(EncoderConfig(width=W, height=144, qp=30, pic_interlace=1))
