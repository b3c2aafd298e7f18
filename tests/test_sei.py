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


# ---- writer round-trips (jm_tpu/encoder/sei_write.py vs lencod/src/sei.c)


def test_sei_writer_roundtrip_all_types():
    from jm_tpu.encoder import sei_write as W
    msgs = [
        W.recovery_point(3, exact_match=False, broken_link=True),
        W.user_data_unregistered(b"payload-data", uuid=bytes(range(16))),
        W.user_data_registered_itu_t_t35(0xB5, b"t35!"),
        W.scene_info(7, transition_type=2),
        W.pan_scan_rect(1, [(-8, 8, -4, 4), (0, 16, 0, 9)],
                        repetition_period=2),
        W.frame_packing_arrangement(0, 3),
    ]
    rbsp = W.build_sei_rbsp(msgs)
    parsed = parse_sei_rbsp(rbsp)
    assert [m.payload_type for m in parsed] == [6, 5, 4, 9, 2, 45]
    rp = parsed[0].fields
    assert rp == {"recovery_frame_cnt": 3, "exact_match_flag": False,
                  "broken_link_flag": True, "changing_slice_group_idc": 0}
    assert parsed[1].fields["uuid"] == bytes(range(16)).hex()
    assert parsed[1].fields["data"] == b"payload-data"
    assert parsed[2].fields == {"country_code": 0xB5, "data": b"t35!"}
    assert parsed[3].fields["scene_id"] == 7
    assert parsed[4].fields["rects"] == [(-8, 8, -4, 4), (0, 16, 0, 9)]
    fp = parsed[5].fields
    assert fp["type"] == 3 and fp["current_frame_is_frame0"]


def test_encoder_emits_sei(golden_dir):
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(5)
    w, h = 64, 48
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, num_b=1,
                                intra_period=2, sei_user_data=b"marker#1",
                                sei_recovery_point=True))
    out = b""
    for i in range(6):
        Y = rng.integers(0, 255, (h, w), np.uint8)
        U = rng.integers(0, 255, (h // 2, w // 2), np.uint8)
        V = rng.integers(0, 255, (h // 2, w // 2), np.uint8)
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    d = H264Decoder()
    frames = d.decode_annexb(out)
    assert len(frames) == 6
    uds = [m for m in d.sei_messages
           if m.payload_type == USER_DATA_UNREGISTERED]
    rps = [m for m in d.sei_messages if m.payload_type == RECOVERY_POINT]
    assert uds and uds[0].fields["data"] == b"marker#1"
    assert rps and rps[0].fields["recovery_frame_cnt"] == 0
    # encoder recon must match our decode exactly (SEI must not perturb)
    rec = sorted(enc.results, key=lambda r: r["disp"])
    frames.sort(key=lambda f: f.poc)
    for r, f in zip(rec, frames):
        assert np.array_equal(r["frame"].Y, f.Y)


def test_tone_mapping_roundtrip_and_lut():
    """Tone-mapping SEI (E27 write + D18 LUT application): all 4 models
    round-trip through the parser and the generated LUTs match the
    reference formulas (ldecod sei.c:2091-2133)."""
    import numpy as np

    from jm_tpu.decoder import sei as DS
    from jm_tpu.encoder import sei_write as SW

    cases = [
        dict(model_id=0, min_value=16, max_value=235),
        dict(model_id=1, sigmoid_midpoint=128, sigmoid_width=64),
        dict(model_id=2,
             start_of_coded_interval=[min(i * 2, 255) for i in range(256)]),
        dict(model_id=3, coded_pivot_value=[64, 128, 255],
             sei_pivot_value=[32, 200, 255]),
    ]
    for kw in cases:
        t, payload = SW.tone_mapping(**kw)
        rbsp = SW.build_sei_rbsp([(t, payload)])
        msgs = DS.parse_sei_rbsp(rbsp)
        assert msgs[0].payload_type == DS.TONE_MAPPING
        f = msgs[0].fields
        assert f["model_id"] == kw["model_id"]
        lut = DS.build_tone_map_lut(f)
        assert lut.shape == (256,)
        if kw["model_id"] == 0:
            assert lut[16] == 0 and lut[235] == 255 and lut[126] == \
                (126 - 16) * 255 // (235 - 16)
        if kw["model_id"] == 1:
            assert lut[128] == 128  # sigmoid midpoint -> half scale
        if kw["model_id"] == 3:
            assert lut[64] == 32 and lut[128] == 200

    # application helper
    class _F:
        Y = np.arange(256, dtype=np.uint8).reshape(16, 16)
        U = np.full((8, 16), 64, np.uint8)
        V = np.full((8, 16), 200, np.uint8)
    t, payload = SW.tone_mapping(model_id=0, min_value=0, max_value=128)
    f = DS.parse_sei_rbsp(SW.build_sei_rbsp([(t, payload)]))[0].fields
    lut = DS.build_tone_map_lut(f)
    Y2, U2, V2 = DS.tone_map_frame(_F, lut)
    assert int(Y2.max()) == 255 and int(V2[0, 0]) == 255


def test_spare_pic_subseq_drpm_roundtrip():
    """E27 remainder: spare picture / sub-sequence info / DRPM
    repetition writers parse back field-exactly (sei.c:89 set)."""
    import numpy as np

    from jm_tpu.decoder import sei as DS
    from jm_tpu.encoder import sei_write as SW

    class _SPS:
        pic_width_in_mbs = 4
        frame_height_in_mbs = 3
        frame_mbs_only_flag = 1

    mbs = 12
    unit_map = [1, 0] * 6
    t, p = SW.spare_pic(7, [(0, None), (1, unit_map)], mbs)
    msgs = DS.parse_sei_rbsp(SW.build_sei_rbsp([(t, p)]), sps=_SPS)
    f = msgs[0].fields
    assert msgs[0].payload_type == DS.SPARE_PIC
    assert f["target_frame_num"] == 7
    assert f["spare_pics"][0]["spare_area_idc"] == 0
    assert f["spare_pics"][1]["unit_map"] == unit_map

    t, p = SW.sub_seq_info(1, 3, first_ref_pic=True, sub_seq_frame_num=9)
    f = DS.parse_sei_rbsp(SW.build_sei_rbsp([(t, p)]), sps=_SPS)[0].fields
    assert f["sub_seq_layer_num"] == 1 and f["sub_seq_id"] == 3
    assert f["first_ref_pic_flag"] == 1 and f["sub_seq_frame_num"] == 9

    t, p = SW.dec_ref_pic_marking_repetition(False, 5,
                                             mmco_ops=[(1, 2), (4, 3)])
    f = DS.parse_sei_rbsp(SW.build_sei_rbsp([(t, p)]), sps=_SPS)[0].fields
    assert f["original_frame_num"] == 5
    assert f["mmco_ops"] == [(1, 2), (4, 3)]
    t, p = SW.dec_ref_pic_marking_repetition(True, 0,
                                             long_term_reference_flag=1)
    f = DS.parse_sei_rbsp(SW.build_sei_rbsp([(t, p)]), sps=_SPS)[0].fields
    assert f["original_idr_flag"] == 1 and f["long_term_reference_flag"] == 1
