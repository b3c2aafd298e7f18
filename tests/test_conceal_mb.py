"""Per-MB error concealment (D17): spatial intra conceal + inter
conceal-by-trial (ldecod erc_do_i.c:544, erc_do_p.c:74/329)."""

import numpy as np
import pytest

from jm_tpu.bitstream.nal import annexb_bytes, split_annexb
from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 144
FRAME = W * H * 3 // 2


@pytest.fixture(scope="module")
def clip(foreman_qcif):
    data = np.fromfile(foreman_qcif, np.uint8)
    out = []
    for i in range(3):
        r = data[i * FRAME:(i + 1) * FRAME]
        out.append((r[:W * H].reshape(H, W),
                    r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2),
                    r[W * H + W * H // 4:].reshape(H // 2, W // 2)))
    return [out[i] for i in (0, 1, 2, 1)]


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse else 99.0


@pytest.fixture(scope="module")
def multislice_stream(clip):
    enc = Encoder(EncoderConfig(qp=28, slice_mode=1, slice_argument=33))
    s = b""
    for f in clip:
        s += enc.encode_frame(*f)
    return s


def _drop_slice(stream, k):
    """Remove the k-th VCL NALU."""
    out, i = b"", 0
    for n in split_annexb(stream):
        if n.nal_unit_type in (1, 5):
            i += 1
            if i == k:
                continue
        out += annexb_bytes(n.nal_ref_idc, n.nal_unit_type, n.rbsp)
    return out


def test_inter_slice_loss_concealed(clip, multislice_stream):
    """Dropping one slice of a P picture: the picture still decodes, the
    lost rows are motion-concealed, quality beats a gray hole."""
    dmg = _drop_slice(multislice_stream, 5)   # middle slice of picture 1
    dec = H264Decoder(conceal_mode=2)
    fr = sorted(dec.decode_annexb(dmg), key=lambda f: f.poc)
    assert len(fr) == len(clip)
    assert dec.concealed_count >= 33
    p = _psnr(clip[1][0], fr[1].Y)
    assert p > 20
    # undamaged region decodes exactly: top slice rows match clean decode
    clean = sorted(H264Decoder().decode_annexb(multislice_stream),
                   key=lambda f: f.poc)
    assert np.array_equal(fr[1].Y[:16], clean[1].Y[:16])


def test_intra_slice_loss_spatial_conceal(clip, multislice_stream):
    """Dropping a slice of the IDR picture: spatial weighted-average
    conceal (no reference exists)."""
    dmg = _drop_slice(multislice_stream, 2)   # middle slice of the IDR
    dec = H264Decoder(conceal_mode=1)
    fr = sorted(dec.decode_annexb(dmg), key=lambda f: f.poc)
    assert len(fr) == len(clip)
    assert dec.concealed_count >= 33
    # concealed area is smooth interpolation, not mid-gray blocks
    band = fr[0].Y[88:104]
    assert band.std() > 1.0
    assert _psnr(clip[0][0], fr[0].Y) > 15


def test_corrupt_slice_payload_concealed(clip, multislice_stream):
    out, i = b"", 0
    for n in split_annexb(multislice_stream):
        raw = annexb_bytes(n.nal_ref_idc, n.nal_unit_type, n.rbsp)
        if n.nal_unit_type in (1, 5):
            i += 1
            if i == 8:
                raw = raw[:len(raw) // 2] + bytes([255] * 8)
        out += raw
    dec = H264Decoder(conceal_mode=2)
    fr = dec.decode_annexb(out)
    assert len(fr) == len(clip)
    assert dec.concealed_count > 0


def test_strict_mode_unchanged(multislice_stream):
    fr = H264Decoder().decode_annexb(multislice_stream)
    assert len(fr) == 4
