"""Lossless (transform bypass) decoding — E9/E41 lossless gap.

Goldens produced by JM lencod 19.0 with LosslessCoding=1, ProfileIDC=244
(High 4:4:4 — the only profiles whose SPS carries
qpprime_y_zero_transform_bypass_flag, lencod/src/parset.c:311), QP 0,
foreman QCIF 3 frames, CAVLC and CABAC. JM's own recon equals the
source byte for byte, so the pass bar is exact source recovery:
residual bypass (ldecod block.c:53 itrans4x4_ls), intra DPCM
(Inv_Residual_trans_4x4/_8x8/_16x16/_Chroma, block.c:84-345) and raw
DC placement (read_comp_cavlc.c:2004) all have to be right."""

import hashlib
import os

import numpy as np
import pytest

from jm_tpu.decoder.decoder import decode_file

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
SRC_SHA = "b721aed52a9ba57916b9d22a1e84faca4d706ae69513e98a033e1f3e5a288479"


@pytest.mark.parametrize("name", ["lossless", "lossless_cabac"])
def test_lossless_roundtrip_exact(name, foreman_qcif):
    src = open(foreman_qcif, "rb").read()
    assert hashlib.sha256(src).hexdigest() == SRC_SHA
    frames = decode_file(os.path.join(GOLDEN, name + ".264"))
    assert len(frames) == 3
    out = b"".join(
        np.asarray(f.Y, np.uint8).tobytes()
        + np.asarray(f.U, np.uint8).tobytes()
        + np.asarray(f.V, np.uint8).tobytes() for f in frames)
    assert out == src, "lossless decode must reproduce the source exactly"
