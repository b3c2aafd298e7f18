"""Image I/O + preprocessing (C6 TIFF, C7 resize, E43 RGB conversion)."""

import numpy as np

from jm_tpu.tools.imgio import (read_tiff, resize_plane, resize_yuv420,
                                rgb_to_yuv420, write_tiff, yuv420_to_rgb,
                                read_tiff_sequence)


def test_tiff_roundtrip_rgb_and_gray(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
    p = tmp_path / "a.tif"
    write_tiff(str(p), rgb)
    assert np.array_equal(read_tiff(str(p)), rgb)
    gray = rng.integers(0, 256, (32, 40), np.uint8)
    write_tiff(str(p), gray)
    assert np.array_equal(read_tiff(str(p)), gray)


def test_rgb_yuv_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.integers(20, 236, (64, 64, 3), np.uint8)
    Y, U, V = rgb_to_yuv420(rgb)
    assert Y.shape == (64, 64) and U.shape == (32, 32)
    back = yuv420_to_rgb(Y, U, V)
    # chroma subsampling loses detail; flat regions must round-trip tight
    flat = np.full((16, 16, 3), (90, 160, 40), np.uint8)
    Yf, Uf, Vf = rgb_to_yuv420(flat)
    bf = yuv420_to_rgb(Yf, Uf, Vf)
    assert np.abs(bf.astype(int) - flat.astype(int)).max() <= 3
    assert back.shape == rgb.shape


def test_resize():
    yy, xx = np.mgrid[0:64, 0:64]
    p = ((xx * 255) // 63).astype(np.uint8)
    up = resize_plane(p, 128, 128)
    dn = resize_plane(p, 32, 32)
    assert up.shape == (128, 128) and dn.shape == (32, 32)
    # a horizontal ramp stays a ramp
    assert (np.diff(up[0].astype(int)) >= 0).all()
    assert abs(int(dn[0, 0]) - 2) <= 4 and abs(int(dn[0, -1]) - 251) <= 6
    Y, U, V = resize_yuv420(p, p[::2, ::2], p[::2, ::2], 32, 32)
    assert Y.shape == (32, 32) and U.shape == (16, 16)


def test_tiff_sequence_encode(tmp_path):
    """TIFF sequence -> encoder end to end."""
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(2)
    for i in range(3):
        base = np.zeros((48, 64, 3), np.uint8)
        base[:, :, 0] = (np.mgrid[0:48, 0:64][1] * 3 + i * 10) % 256
        base[:, :, 1] = 128
        base[:, :, 2] = 64
        write_tiff(str(tmp_path / f"f{i:03d}.tif"), base)
    frames = read_tiff_sequence(str(tmp_path / "f%03d.tif"), 3)
    enc = Encoder(EncoderConfig(width=64, height=48, qp=30))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    dec = H264Decoder().decode_annexb(out)
    assert len(dec) == 3
