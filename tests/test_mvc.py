"""MVC / stereo two-view coding (E40, Annex H).

Encoder: base view AVC NALUs + prefix NAL 14, subset SPS (NAL 15, Stereo
High) and NAL-20 dependent-view slices with inter-view prediction
(anchor AUs: inter-view only; non-anchor: inter-view first via a
modification_of_pic_nums_idc-5 command + temporal refs). Streams are
verified bit-exact in the reference ldecod (verify flow); here:
self-roundtrip, structure, and decode of a REAL JM lencod stereo stream
(tests/golden/stereo_jm.264) byte-exact against JM's own recon.

Model: lencod.c:894-952 view loop, parset.c subset SPS, mbuffer_mvc.c.
"""

import hashlib

import numpy as np
import pytest

from jm_tpu.bitstream.nal import split_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 144
FRAME = W * H * 3 // 2

# sha256 of the reference lencod's own recon (test_rec.yuv / test_rec2.yuv)
# for the golden stereo stream, produced with the shipped
# encoder_stereo.cfg + encoder_view1.cfg (Transform8x8Mode=0)
GOLDEN_V0 = "926b27db8b24cef65eb908831cdbaa65897d7f7642b0f000d12a0bfd6b524780"
GOLDEN_V1 = "93415fed2650ed80a41030a74f54b67c0a3d15cf2cad7f5cf4061d9d3c3759f7"


@pytest.fixture(scope="module")
def stereo_clip(foreman_qcif):
    data = np.fromfile(foreman_qcif, np.uint8)
    L, R = [], []
    for i in range(3):
        r = data[i * FRAME:(i + 1) * FRAME]
        Y = r[:W * H].reshape(H, W)
        U = r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2)
        V = r[W * H + W * H // 4:].reshape(H // 2, W // 2)
        L.append((Y, U, V))
        R.append((np.roll(Y, -4, axis=1), np.roll(U, -2, axis=1),
                  np.roll(V, -2, axis=1)))
    order = (0, 1, 2, 1, 0, 1)
    return [L[i] for i in order], [R[i] for i in order]


def _encode(L, R, **kw):
    enc = Encoder(EncoderConfig(qp=28, num_views=2, **kw))
    s = b""
    for i in range(len(L)):
        s += enc.encode_frame(*L[i], view1=R[i])
    return s + enc.flush()


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


def test_stereo_roundtrip_ippp(stereo_clip):
    L, R = stereo_clip
    s = _encode(L, R)
    out = H264Decoder().decode_annexb(s)
    v0 = sorted((f for f in out if f.view_id == 0), key=lambda f: f.poc)
    v1 = sorted((f for f in out if f.view_id == 1), key=lambda f: f.poc)
    assert len(v0) == len(v1) == len(L)
    assert np.mean([_psnr(L[i][0], v0[i].Y) for i in range(len(L))]) > 34
    assert np.mean([_psnr(R[i][0], v1[i].Y) for i in range(len(R))]) > 34


def test_stereo_nal_structure(stereo_clip):
    L, R = stereo_clip
    s = _encode(L, R)
    types = [n.nal_unit_type for n in split_annexb(s)]
    assert 15 in types            # subset SPS
    assert 14 in types            # prefix NAL per base picture
    assert 20 in types            # dependent-view slices
    n20 = [n for n in split_annexb(s) if n.nal_unit_type == 20]
    assert all(n.mvc_ext["view_id"] == 1 for n in n20)
    # first AU is an anchor
    assert n20[0].mvc_ext["anchor_pic_flag"] == 1
    assert n20[0].mvc_ext["non_idr_flag"] == 0
    assert all(n.mvc_ext["anchor_pic_flag"] == 0 for n in n20[1:])


def test_stereo_interview_saves_bits(stereo_clip):
    """The dependent view predicts from view 0: coding the pair as MVC
    must beat coding the right view independently (identical settings)."""
    L, R = stereo_clip
    s = _encode(L, R)
    enc = Encoder(EncoderConfig(qp=28))
    solo = b"".join(enc.encode_frame(*f) for f in R)
    n20_bits = sum(len(n.rbsp) for n in split_annexb(s)
                   if n.nal_unit_type == 20)
    assert n20_bits < len(solo)


def test_stereo_b_cabac_multiref(stereo_clip):
    L, R = stereo_clip
    s = _encode(L, R, num_b=2, entropy="cabac", num_ref=2)
    out = H264Decoder().decode_annexb(s)
    assert len([f for f in out if f.view_id == 1]) == len(L)


def test_stereo_multi_idr(stereo_clip):
    """Anchor AUs mid-stream: the view-1 ref list must flush (H.8.2)."""
    L, R = stereo_clip
    s = _encode(L, R, intra_period=3)
    n20 = [n for n in split_annexb(s) if n.nal_unit_type == 20]
    assert sum(n.mvc_ext["anchor_pic_flag"] for n in n20) == 2
    out = H264Decoder().decode_annexb(s)
    assert len(out) == 2 * len(L)


def test_decode_jm_golden_stereo(golden_dir):
    """A REAL JM lencod stereo stream (320x240, IDR+P+B, 2 views, incl.
    the JM 19.0 subset-SPS layout bug our parser detects) must decode
    byte-exactly to JM's own reconstruction."""
    p = golden_dir / "stereo_jm.264"
    out = H264Decoder().decode_annexb(p.read_bytes())
    assert len(out) == 6
    for view, want in ((0, GOLDEN_V0), (1, GOLDEN_V1)):
        fr = sorted((f for f in out if f.view_id == view),
                    key=lambda f: f.poc)
        blob = b"".join(f.Y.tobytes() + f.U.tobytes() + f.V.tobytes()
                        for f in fr)
        assert hashlib.sha256(blob).hexdigest() == want, f"view {view}"


def test_subset_sps_roundtrip():
    from jm_tpu.common.types import SPS
    from jm_tpu.decoder.parset import parse_subset_sps
    from jm_tpu.encoder.syntax import write_subset_sps
    sps = SPS(profile_idc=100, level_idc=30, pic_width_in_mbs_minus1=10,
              pic_height_in_map_units_minus1=8, max_num_ref_frames=2)
    rbsp = write_subset_sps(sps)
    sub = parse_subset_sps(rbsp)
    assert sub.profile_idc == 128
    assert sub.mvc["view_id"] == [0, 1]
    assert sub.mvc["anchor_l0"][1] == [0]
    assert sub.mvc["non_anchor_l0"][1] == [0]
    assert sub.pic_width_in_mbs == 11
