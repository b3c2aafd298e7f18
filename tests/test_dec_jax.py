"""Device decoder reconstruction (ops/dec_jax.py): the batched inter
recon must reproduce the host Reconstructor BYTE-EXACTLY on JM golden
streams (multi-ref, full qpel/eighth-pel range, dispersed FMO, CIF
sizes), with intra/IPCM MBs merged by the host wavefront — the
CPU==device decode-equality bar the r2/r3 verdicts asked for."""

import os

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# goldens whose non-IDR pictures qualify for the device inter path
STREAMS = ["ipp3.264", "qp20.264", "qp36.264", "fmo_t1.264",
           "cif_fmo.264", "cif_main.264"]


@pytest.mark.parametrize("name", STREAMS)
def test_device_recon_matches_host(name):
    data = open(os.path.join(GOLDEN, name), "rb").read()
    host = H264Decoder().decode_annexb(data)
    dev = H264Decoder(device_recon=True).decode_annexb(data)
    assert len(host) == len(dev)
    used = False
    for a, b in zip(host, dev):
        assert np.array_equal(a.Y, b.Y)
        assert np.array_equal(a.U, b.U)
        assert np.array_equal(a.V, b.V)
        used = True
    assert used


def test_device_recon_gate_falls_back():
    """Streams outside the gate (B pictures / WP / 8x8 inter / SP / DP)
    must silently keep the host path and stay bit-exact."""
    for name in ("cavlc_b.264", "high8x8.264", "sp1.264"):
        data = open(os.path.join(GOLDEN, name), "rb").read()
        host = H264Decoder().decode_annexb(data)
        dev = H264Decoder(device_recon=True).decode_annexb(data)
        for a, b in zip(host, dev):
            assert np.array_equal(a.Y, b.Y)
            assert np.array_equal(a.U, b.U)
            assert np.array_equal(a.V, b.V)
