"""Bitstream layer tests: bit reader/writer round trips, NAL demux, and
SPS/PPS parsing validated against values from the JM golden stream
(tests/golden/i1.264, produced by the reference lencod with
encoder_baseline.cfg — field values cross-checked against its trace_enc.txt).
"""

import numpy as np
import pytest

from jm_tpu.bitstream import BitReader, BitWriter, NalUnitType, split_annexb
from jm_tpu.bitstream.nal import ebsp_to_rbsp, rbsp_to_ebsp
from jm_tpu.decoder.parset import parse_pps, parse_sps


def test_bitreader_basic():
    br = BitReader(bytes([0b10110011, 0b01000000]))
    assert br.flag() == 1
    assert br.u(3) == 0b011
    assert br.u(4) == 0b0011
    assert br.u(2) == 0b01
    assert br.byte_aligned() is False


def test_expgolomb_roundtrip():
    rng = np.random.default_rng(0)
    values = list(range(0, 40)) + [int(x) for x in rng.integers(0, 100000, 50)]
    bw = BitWriter()
    for v in values:
        bw.ue(v)
    svalues = list(range(-20, 21)) + [int(x) for x in rng.integers(-50000, 50000, 50)]
    for v in svalues:
        bw.se(v)
    bw.rbsp_trailing_bits()
    br = BitReader(bw.get_bytes())
    for v in values:
        assert br.ue() == v
    for v in svalues:
        assert br.se() == v


def test_ebsp_rbsp_roundtrip():
    cases = [
        b"",
        b"\x00\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x03\x00\x00\x03",
        b"abc\x00\x00\x02\x00\x00\x00\x00\x01",
        bytes(range(256)) * 3,
    ]
    for rbsp in cases:
        assert ebsp_to_rbsp(rbsp_to_ebsp(rbsp)) == rbsp
    # EP byte removal
    assert ebsp_to_rbsp(b"\x00\x00\x03\x01") == b"\x00\x00\x01"


def test_golden_nal_demux(golden_dir):
    data = (golden_dir / "i1.264").read_bytes()
    units = split_annexb(data)
    types = [u.nal_unit_type for u in units]
    assert types[0] == NalUnitType.SPS
    assert types[1] == NalUnitType.PPS
    assert NalUnitType.IDR in types
    data3 = (golden_dir / "ipp3.264").read_bytes()
    units3 = split_annexb(data3)
    slice_units = [u for u in units3 if u.is_slice]
    assert len(slice_units) == 3  # one slice per frame, IPP


def test_golden_sps_fields(golden_dir):
    """Field values confirmed against JM's trace_enc.txt for this stream."""
    units = split_annexb((golden_dir / "i1.264").read_bytes())
    sps = parse_sps(units[0].rbsp)
    assert sps.profile_idc == 66
    assert sps.level_idc == 40
    assert sps.log2_max_frame_num_minus4 == 0
    assert sps.pic_order_cnt_type == 0
    assert sps.log2_max_pic_order_cnt_lsb_minus4 == 0
    assert sps.max_num_ref_frames == 5
    assert sps.pic_width_in_mbs == 11
    assert sps.frame_height_in_mbs == 9
    assert sps.width == 176 and sps.height == 144
    assert sps.frame_mbs_only_flag == 1
    assert sps.direct_8x8_inference_flag == 1
    assert sps.frame_cropping_flag == 0
    assert sps.chroma_format_idc == 1


def test_golden_pps_fields(golden_dir):
    units = split_annexb((golden_dir / "i1.264").read_bytes())
    sps = parse_sps(units[0].rbsp)
    pps = parse_pps(units[1].rbsp, {sps.seq_parameter_set_id: sps})
    assert pps.entropy_coding_mode_flag == 0  # baseline => CAVLC
    assert pps.num_slice_groups_minus1 == 0
    assert pps.weighted_pred_flag == 0
    assert pps.transform_8x8_mode_flag == 0
