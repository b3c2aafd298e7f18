"""Syntax-element trace tool (SURVEY §4.3; JM TRACE facility twin)."""

import numpy as np
import pytest

from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.tools.trace import diff_traces, parse_trace, trace_stream

W, H = 176, 144
FRAME = W * H * 3 // 2


@pytest.fixture(scope="module")
def stream(foreman_qcif):
    data = np.fromfile(foreman_qcif, np.uint8)
    enc = Encoder(EncoderConfig(qp=30))
    s = b""
    for i in range(2):
        r = data[i * FRAME:(i + 1) * FRAME]
        s += enc.encode_frame(
            r[:W * H].reshape(H, W),
            r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2),
            r[W * H + W * H // 4:].reshape(H // 2, W // 2))
    return s


def test_trace_covers_headers_and_mb_elements(stream):
    t = trace_stream(stream)
    assert "parse_sps" in t and "parse_pps" in t
    assert "parse_slice_header" in t
    # MB-level CAVLC elements are traced through the shared reader
    assert "_parse_intra_mb" in t or "parse_slice_data" in t
    elems = parse_trace(t)
    assert len(elems) > 500


def test_trace_diff_self_identical(stream):
    t = trace_stream(stream, max_nalus=3)
    assert diff_traces(t, t).startswith("IDENTICAL")


def test_trace_diff_finds_divergence(stream):
    t = trace_stream(stream, max_nalus=3)
    lines = t.splitlines()
    # flip one value
    for i, ln in enumerate(lines):
        if ln.startswith("@") and "(     30)" in ln:
            lines[i] = ln.replace("(     30)", "(     31)")
            break
    d = diff_traces(t, "\n".join(lines))
    assert d.startswith("DIVERGE")


def test_trace_parses_jm_dialect():
    jm = ("@0     SPS: profile_idc                    01000010 ( 66) \n"
          "@8     SPS: constrained_set0_flag                 0 (  0) \n")
    elems = parse_trace(jm)
    assert elems == [(0, "SPS: profile_idc", 66),
                     (8, "SPS: constrained_set0_flag", 0)]


def test_decoder_unaffected_after_trace(stream):
    """The BitReader monkeypatch must be fully restored."""
    trace_stream(stream, max_nalus=2)
    from jm_tpu.decoder.decoder import H264Decoder
    out = H264Decoder().decode_annexb(stream)
    assert len(out) == 2
