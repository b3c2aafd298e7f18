"""Custom quant matrices (E12), explicit offsets + adaptive rounding (E10).

Model: lencod/src/q_matrix.c, q_offsets.c, q_around.c (JVT-N011).
Streams with SPS/PPS scaling lists and offset/AR quantization are
ldecod-bit-exact (checked in the verify flow); here: parser fidelity,
self round-trip, and state evolution.
"""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.encoder.qmatrix import (QuantCtx, default_offsets,
                                    parse_matrix_cfg, parse_offset_cfg)

W, H = 176, 144
FRAME = W * H * 3 // 2

QMATRIX = "/root/reference/bin/q_matrix.cfg"
QOFFSET = "/root/reference/bin/q_offset.cfg"


@pytest.fixture(scope="module")
def clip(foreman_qcif):
    data = np.fromfile(foreman_qcif, np.uint8)
    out = []
    for i in range(3):
        r = data[i * FRAME:(i + 1) * FRAME]
        out.append((r[:W * H].reshape(H, W),
                    r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2),
                    r[W * H + W * H // 4:].reshape(H // 2, W // 2)))
    return out


@pytest.fixture(scope="module")
def ref_lists():
    import pathlib
    if not pathlib.Path(QMATRIX).exists():
        pytest.skip("reference q_matrix.cfg unavailable")
    l4, l8 = parse_matrix_cfg(open(QMATRIX, encoding="latin-1").read())
    o4, o8 = parse_offset_cfg(open(QOFFSET, encoding="latin-1").read())
    return l4, l8, o4, o8


def test_parse_matrix_cfg(ref_lists):
    l4, l8, _, _ = ref_lists
    # first rows of the shipped reference file
    assert l4[0][:4] == [17, 17, 16, 16]          # INTRA4X4_LUMA
    assert l4[1][:4] == [6, 12, 19, 26]           # INTRA4X4_CHROMAU
    # second INTER4X4_CHROMAU section starts with 0 => default matrix;
    # JM keeps the FIRST definition
    assert l4[4][:4] == [9, 13, 18, 21]
    assert all(len(x) == 16 for x in l4) and all(len(x) == 64 for x in l8)


def test_parse_offset_cfg(ref_lists):
    _, _, o4, o8 = ref_lists
    assert o4[0][0] == 1024 and o4[0][1] == 742   # INTRA4X4_LUMA_INTRA
    assert o4.shape == (15, 16) and o8.shape == (5, 64)


def _roundtrip(clip, **kw):
    enc = Encoder(EncoderConfig(qp=28, **kw))
    s = b""
    for (Y, U, V) in clip:
        s += enc.encode_frame(Y, U, V)
    s += enc.flush()
    out = sorted(H264Decoder().decode_annexb(s), key=lambda f: f.poc)
    assert len(out) == len(clip)
    mse = np.mean((clip[0][0].astype(float) - out[0].Y.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 33
    return s, out


def test_scaling_matrix_sps(clip, ref_lists):
    l4, l8, _, _ = ref_lists
    s, _ = _roundtrip(clip, scaling_matrix=1,
                      scaling_lists4=tuple(map(tuple, l4)),
                      scaling_lists8=tuple(map(tuple, l8)),
                      transform8x8=True)
    # the SPS must carry the lists: decoder sees non-flat scaling
    from jm_tpu.bitstream.nal import ebsp_to_rbsp, split_annexb
    from jm_tpu.decoder.parset import parse_sps
    sps_nal = [n for n in split_annexb(s) if n.nal_unit_type == 7][0]
    sps = parse_sps(ebsp_to_rbsp(sps_nal.rbsp))
    assert sps.seq_scaling_matrix_present_flag
    assert sps.scaling_list_4x4[0] != [16] * 16


def test_scaling_matrix_pps_cabac(clip, ref_lists):
    l4, l8, _, _ = ref_lists
    _roundtrip(clip, scaling_matrix=2,
               scaling_lists4=tuple(map(tuple, l4)),
               scaling_lists8=tuple(map(tuple, l8)), entropy="cabac")


def test_offsets_and_adaptive_rounding(clip, ref_lists):
    _, _, o4, o8 = ref_lists
    enc = Encoder(EncoderConfig(qp=28, offset_matrix=(o4.copy(), o8.copy()),
                                adaptive_rounding=True))
    s = b""
    for (Y, U, V) in clip:
        s += enc.encode_frame(Y, U, V)
    # adaptive rounding must have moved the learned offsets
    assert (enc._ar_state[0] != o4).any()
    out = H264Decoder().decode_annexb(s)
    assert len(out) == len(clip)


def test_quantctx_flat_reduces_to_normal():
    """With flat lists + default offsets the QuantCtx forward quant must
    match the legacy scalar deadzone quantizer within one level step (JM's
    682/2048 vs 1/3 differ by < 2^-10)."""
    from jm_tpu.encoder import residual_np as RN
    rng = np.random.default_rng(3)
    w = rng.integers(-2000, 2000, (32, 4, 4))
    q = QuantCtx([[16] * 16] * 6, [[16] * 64] * 2, "P")
    a = q.quant_4x4(w, 28, 0, False)
    b = RN.np_quant_4x4(w, 28, False)
    assert np.abs(a - b).max() <= 1
    assert (a != b).mean() < 0.01


def test_adaptive_rounding_update_direction():
    """JVT-N011 property (q_around.c): coefficients that land just below
    the next level (high positive remainder) push the offset UP; those
    just above a level boundary (small remainder) pull it DOWN, clipped
    to [0, 1 << (OffsetBits - 1)]."""
    from jm_tpu.common.tables import QUANT_SCALE_4x4
    from jm_tpu.encoder.qmatrix import OFFSET_RANGE
    qp = 28
    qbits = 15 + qp // 6
    mf = QUANT_SCALE_4x4[qp % 6].astype(np.int64)      # per-position MF
    # fadjust = W * (scaled - level<<qbits) / 2^(qbits+1): with the default
    # inter offset (342/2048 ~ 0.167), frac 0.7 stays at the lower level
    # => positive error => offsets move UP
    w_hi = np.broadcast_to((int(1.7 * (1 << qbits)) // mf),
                           (8, 4, 4)).copy()
    q = QuantCtx([[16] * 16] * 6, [[16] * 64] * 2, "P",
                 off_state=default_offsets(), ar_weight=32)
    base = q.off4_active[9].copy()
    q.quant_4x4(w_hi, qp, 0, False)
    q.ar_commit_mb()
    q.maybe_refresh(0, 1)
    assert (q.off4_active[9] > base).all()
    # frac 0.95: the offset rounds it UP a level => negative error =>
    # offsets decrease
    q2 = QuantCtx([[16] * 16] * 6, [[16] * 64] * 2, "P",
                  off_state=default_offsets(), ar_weight=32)
    w_lo = np.broadcast_to((int(1.95 * (1 << qbits)) // mf) + 1,
                           (8, 4, 4)).copy()
    base2 = q2.off4_active[9].copy()
    q2.quant_4x4(w_lo, qp, 0, False)
    q2.ar_commit_mb()
    q2.maybe_refresh(0, 1)
    assert (q2.off4_active[9] < base2).all()
    assert (q2.off4_active >= 0).all() and \
        (q.off4_active <= OFFSET_RANGE).all()


def test_yuv422_cfg_plumbing(tmp_path):
    """encoder_yuv422.cfg's quant section maps into EncoderConfig."""
    import pathlib
    src = pathlib.Path("/root/reference/bin/encoder_yuv422.cfg")
    if not src.exists():
        pytest.skip("reference cfg unavailable")
    from jm_tpu.config import EncoderParams, parse_cfg_text
    p = EncoderParams()
    p.apply(parse_cfg_text(src.read_text(encoding="latin-1")))
    import os
    os.chdir("/root/reference/bin")   # cfg references local q_offset.cfg
    try:
        ec = p.to_encoder_config()
    finally:
        os.chdir(str(tmp_path))
    assert ec.adaptive_rounding and ec.offset_matrix
    assert ec.chroma_format == 2
