"""SEI parsing (jm_tpu/decoder/sei.py vs ldecod/src/sei.c)."""

import numpy as np

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.decoder.sei import (RECOVERY_POINT, USER_DATA_UNREGISTERED,
                                parse_sei_rbsp)


def test_user_data_sei_from_jm_stream(golden_dir):
    d = H264Decoder()
    frames = d.decode_annexb((golden_dir / "sei.264").read_bytes())
    assert len(frames) == 3
    msgs = [m for m in d.sei_messages
            if m.payload_type == USER_DATA_UNREGISTERED]
    assert msgs and b"tpu codec sei test" in msgs[0].fields["data"]


def test_recovery_point_and_multi_message():
    # hand-built RBSP: recovery_point (type 6) then user data (type 5)
    from jm_tpu.bitstream.bitwriter import BitWriter
    bw = BitWriter()
    bw.ue(4)          # recovery_frame_cnt
    bw.flag(1)        # exact_match
    bw.flag(0)        # broken_link
    bw.u(0, 2)        # changing_slice_group_idc
    bw.rbsp_trailing_bits()
    rp = bw.get_bytes()
    ud = bytes(16) + b"hello"
    rbsp = bytes([RECOVERY_POINT, len(rp)]) + rp + \
        bytes([USER_DATA_UNREGISTERED, len(ud)]) + ud + b"\x80"
    msgs = parse_sei_rbsp(rbsp)
    assert len(msgs) == 2
    assert msgs[0].fields == {"recovery_frame_cnt": 4, "exact_match_flag": 1,
                              "broken_link_flag": 0,
                              "changing_slice_group_idc": 0}
    assert msgs[1].fields["data"] == b"hello"


def test_ff_escaped_size():
    # payload of 300 bytes => size bytes ff, 45
    payload = bytes(300)
    rbsp = bytes([3]) + b"\xff" + bytes([45]) + payload + b"\x80"
    msgs = parse_sei_rbsp(rbsp)
    assert len(msgs) == 1 and msgs[0].payload_type == 3
    assert len(msgs[0].payload) == 300


def test_garbage_sei_does_not_crash():
    msgs = parse_sei_rbsp(b"\x06\x20\x01")   # truncated payload
    assert isinstance(msgs, list)
