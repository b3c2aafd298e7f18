"""RTP packetization (lencod/ldecod rtp.c, rtpdump, rtp_loss twins).

Interop with the reference was verified out-of-band: JM lencod
OutFileMode=1 dump files parse and decode bit-exactly, and JM ldecod
FileFormat=1 decodes our RtpDumpWriter output bit-exactly. These tests
lock the container format and the loss-injection path.
"""

import pathlib

import numpy as np
import pytest

from jm_tpu.bitstream.rtp import (H264_PAYLOAD_TYPE, H264_SSRC,
                                  annexb_to_rtp, compose_packet,
                                  parse_packet, read_rtp_dump, rtp_to_annexb,
                                  split_rtp, RtpPacket)

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _golden_stream():
    for name in ("cabac_pp.264", "cavlc_b.264"):
        p = GOLDEN / name
        if p.exists():
            return p.read_bytes()
    pytest.skip("no golden stream")


def test_packet_compose_parse_roundtrip():
    p = RtpPacket(seq=4242, timestamp=123456789, marker=1,
                  payload=b"\x65" + bytes(range(100)))
    q = parse_packet(compose_packet(p))
    assert (q.seq, q.timestamp, q.marker, q.payload) == \
        (4242, 123456789, 1, p.payload)
    assert q.pt == H264_PAYLOAD_TYPE and q.ssrc == H264_SSRC


def test_annexb_rtp_container_roundtrip():
    ann = _golden_stream()
    dump = annexb_to_rtp(ann)
    pkts = read_rtp_dump(dump)
    assert [p.seq for p in pkts] == list(range(len(pkts)))
    assert all(p.pt == H264_PAYLOAD_TYPE for p in pkts)
    # payload = NAL header byte + EBSP: first unit of a JM-style stream is
    # the SPS (0x67) or an SEI
    assert pkts[0].payload[0] & 0x1F in (6, 7)
    # timestamps advance 1000 per picture (RTP_TR_TIMESTAMP_MULT)
    slices = [p for p in pkts if p.payload[0] & 0x1F in (1, 5)]
    assert len({p.timestamp for p in slices}) == len(slices)
    # decode through the RTP path == decode the original stream
    from jm_tpu.decoder.decoder import H264Decoder
    f_direct = H264Decoder().decode_annexb(ann)
    f_rtp = H264Decoder().decode_annexb(rtp_to_annexb(dump))
    assert len(f_direct) == len(f_rtp)
    for a, b in zip(f_direct, f_rtp):
        assert a.poc == b.poc
        assert np.array_equal(a.Y, b.Y)
        assert np.array_equal(a.U, b.U)
        assert np.array_equal(a.V, b.V)


def test_split_rtp_lost_packet_detection(tmp_path):
    ann = _golden_stream()
    dump = annexb_to_rtp(ann)
    src = tmp_path / "in.rtp"
    dst = tmp_path / "out.rtp"
    src.write_bytes(dump)

    # drop exactly the 4th packet (a mid-stream slice) by rebuilding the
    # dump without it: the next kept unit must report the gap
    import struct
    kept = bytearray()
    for i, p in enumerate(read_rtp_dump(dump)):
        if i == 3:
            continue
        pkt = compose_packet(p)
        kept += struct.pack("<Ii", len(pkt), p.timestamp) + pkt
    units = split_rtp(bytes(kept))
    assert [u.lost_before for u in units] == [0, 0, 0, 1]

    from jm_tpu.tools.rtp_loss import main as rtp_loss_main
    # keep the 3 leading packets (SPS/PPS/IDR), drop ~50% after
    rc = rtp_loss_main([str(src), str(dst), "50", "3", "--seed", "7"])
    assert rc == 0
    n_in = len(read_rtp_dump(dump))
    out_pkts = read_rtp_dump(dst.read_bytes())
    assert len(out_pkts) < n_in
    assert [p.seq for p in out_pkts][:3] == [0, 1, 2]  # leading kept verbatim
    # 0% loss keeps everything
    rc = rtp_loss_main([str(src), str(dst), "0", "0"])
    assert rc == 0
    assert dst.read_bytes() == dump


def test_rtpdump_cli(tmp_path, capsys):
    dump = annexb_to_rtp(_golden_stream())
    f = tmp_path / "s.rtp"
    f.write_bytes(dump)
    from jm_tpu.tools.rtpdump import main as rtpdump_main
    assert rtpdump_main([str(f)]) == 0
    out = capsys.readouterr().out
    assert out.count("packet #") == len(read_rtp_dump(dump))
    assert "Payload Type (PT): 105" in out
