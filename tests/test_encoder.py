"""Encoder tests: self round-trip (our decoder must reproduce the
encoder's reconstruction bit-exactly) and quality sanity (PSNR bounds).
The external ldecod conformance check runs via the verify flow / bench.
"""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 176, 144
FRAME = W * H * 3 // 2


def _read_frames(path, n):
    data = np.fromfile(path, np.uint8)
    out = []
    for i in range(n):
        r = data[i * FRAME:(i + 1) * FRAME]
        out.append((r[:W * H].reshape(H, W),
                    r[W * H:W * H + W * H // 4].reshape(H // 2, W // 2),
                    r[W * H + W * H // 4:].reshape(H // 2, W // 2)))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 ** 2 / mse) if mse > 0 else 99.0


@pytest.fixture(scope="module")
def foreman3(foreman_qcif_mod):
    return foreman_qcif_mod


@pytest.fixture(scope="module")
def foreman_qcif_mod():
    import pathlib
    p = pathlib.Path("/root/reference/bin/foreman_part_qcif.yuv")
    if not p.exists():
        pytest.skip("clip unavailable")
    return _read_frames(p, 3)


def test_encode_decode_selfconsistent(foreman3):
    enc = Encoder(EncoderConfig(qp=28))
    stream = b""
    for (Y, U, V) in foreman3:
        stream += enc.encode_frame(Y, U, V)
    dec = H264Decoder()
    frames = dec.decode_annexb(stream)
    assert len(frames) == 3
    # decoder output must equal the encoder's own DPB recon (closed loop)
    recons = list(reversed(enc.recon_frames))  # refs is most-recent-first
    # only the last num_ref recons are retained; re-encode capturing all:
    enc2 = Encoder(EncoderConfig(qp=28))
    all_recons = []
    for (Y, U, V) in foreman3:
        enc2.encode_frame(Y, U, V)
        all_recons.append(enc2.refs[0])
    for i, (df, rf) in enumerate(zip(frames, all_recons)):
        np.testing.assert_array_equal(df.Y, rf.Y, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(df.U, rf.U, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(df.V, rf.V, err_msg=f"frame {i} V")


def test_encode_quality(foreman3):
    enc = Encoder(EncoderConfig(qp=28))
    outs = []
    bits = 0
    for (Y, U, V) in foreman3:
        b = enc.encode_frame(Y, U, V)
        bits += len(b) * 8
        outs.append(enc.refs[0])
    psnrs = [_psnr(o.Y, f[0]) for o, f in zip(outs, foreman3)]
    # JM at QP28 reaches ~37 dB on this clip; require sane quality
    assert min(psnrs) > 33.0, psnrs
    assert bits < 80000, bits  # JM spends ~34k bits; stay in the ballpark


def test_encode_decode_cabac(foreman3):
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(qp=28, entropy="cabac"))
    stream = b""
    recs = []
    for (Y, U, V) in foreman3:
        stream += enc.encode_frame(Y, U, V)
        recs.append(enc.refs[0])
    dec = H264Decoder()
    frames = dec.decode_annexb(stream)
    assert len(frames) == 3
    for i, (df, rf) in enumerate(zip(frames, recs)):
        np.testing.assert_array_equal(df.Y, rf.Y, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(df.U, rf.U, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(df.V, rf.V, err_msg=f"frame {i} V")
    # CABAC should not be larger than CAVLC on the same decisions
    enc2 = Encoder(EncoderConfig(qp=28))
    cavlc_bits = sum(len(enc2.encode_frame(Y, U, V)) for (Y, U, V) in foreman3)
    assert len(stream) < cavlc_bits * 1.02


@pytest.mark.parametrize("entropy,num_b", [("cavlc", 1), ("cabac", 2)])
def test_b_frame_roundtrip(golden_dir, entropy, num_b):
    """IB..P encoding: our decoder reproduces the encoder recon exactly
    (spatial direct + L0/L1/BI 16x16 + B-skip through both entropy coders)."""
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    W, H = 176, 144
    fsz = W * H * 3 // 2
    raw = np.fromfile(golden_dir / "main9_rec.yuv", np.uint8)
    frames = []
    for i in range(5):
        a = raw[i * fsz:(i + 1) * fsz]
        frames.append((a[:W * H].reshape(H, W),
                       a[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                       a[W * H * 5 // 4:].reshape(H // 2, W // 2)))
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30, num_b=num_b,
                                entropy=entropy))
    bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    types = [r["type"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    assert "B" in types
    out = H264Decoder().decode_annexb(bs)
    out.sort(key=lambda f: f.poc)
    recs = sorted(enc.results, key=lambda r: r["disp"])
    assert len(out) == len(recs)
    for d, r in zip(out, recs):
        np.testing.assert_array_equal(d.Y, r["frame"].Y)
        np.testing.assert_array_equal(d.U, r["frame"].U)
        np.testing.assert_array_equal(d.V, r["frame"].V)


def test_cabac_zero_words_roundtrip():
    """Clause 7.4.2.10 bin-to-byte constraint (lencod/src/nal.c:116
    addCabacZeroWords): high-entropy QP0 CABAC coding exceeds 96/1024
    bins/byte, so the encoder must append cabac_zero_word stuffing
    (EBSP 00 00 03) after the picture — and the decoder must still
    reproduce the recon bit-exactly."""
    rng = np.random.default_rng(7)
    Wn = Hn = 48
    Y = rng.integers(0, 256, (Hn, Wn), np.uint8)
    U = rng.integers(0, 256, (Hn // 2, Wn // 2), np.uint8)
    V = rng.integers(0, 256, (Hn // 2, Wn // 2), np.uint8)
    enc = Encoder(EncoderConfig(width=Wn, height=Hn, qp=0, entropy="cabac"))
    bs = enc.encode_frame(Y, U, V) + enc.flush()
    assert bs.endswith(b"\x00\x00\x03"), "expected cabac_zero_word stuffing"
    out = H264Decoder().decode_annexb(bs)
    np.testing.assert_array_equal(out[0].Y, enc.results[0]["frame"].Y)
    np.testing.assert_array_equal(out[0].U, enc.results[0]["frame"].U)
    np.testing.assert_array_equal(out[0].V, enc.results[0]["frame"].V)


@pytest.mark.parametrize("entropy", ["cavlc", "cabac"])
def test_transform8x8_roundtrip(golden_dir, entropy):
    """High-profile adaptive 8x8 transform: stream decodes to encoder
    recon; at least some MBs pick the 8x8 transform."""
    import jm_tpu.encoder.encoder as E
    W, H = 176, 144
    fsz = W * H * 3 // 2
    raw = np.fromfile(golden_dir / "main9_rec.yuv", np.uint8)
    frames = []
    for i in range(3):
        a = raw[i * fsz:(i + 1) * fsz]
        frames.append((a[:W * H].reshape(H, W),
                       a[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                       a[W * H * 5 // 4:].reshape(H // 2, W // 2)))
    enc = Encoder(EncoderConfig(width=W, height=H, qp=30, entropy=entropy,
                                transform8x8=True))
    t8_used = []
    orig = E._FrameEncoder.encode

    def spy(self):
        pic = orig(self)
        t8_used.append(int(pic.transform8x8.sum()))
        return pic

    E._FrameEncoder.encode = spy
    try:
        bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    finally:
        E._FrameEncoder.encode = orig
    assert sum(t8_used) > 0, "no MB chose the 8x8 transform"
    out = H264Decoder().decode_annexb(bs)
    out.sort(key=lambda f: f.poc)
    for d, r in zip(out, sorted(enc.results, key=lambda x: x["disp"])):
        np.testing.assert_array_equal(d.Y, r["frame"].Y)
        np.testing.assert_array_equal(d.U, r["frame"].U)
        np.testing.assert_array_equal(d.V, r["frame"].V)


def test_poc_type_1_and_2_encode():
    """E28 remainder: PicOrderCntType 1 (expected cycle,
    delta_always_zero) and 2 (decode order) SPS write + zero-bit slice
    headers; self-decode bit-exact with correct POCs (JM-ldecod-verified
    in the round-4 oracle drive)."""
    import numpy as np

    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(4)
    frames = []
    base = rng.integers(0, 256, (100, 120)).astype(np.uint8)
    for i in range(3):
        Y = base[i:i + 80, i:i + 96].copy()
        frames.append((Y, Y[::2, ::2].copy(), Y[1::2, ::2].copy()))
    for pt in (1, 2):
        enc = Encoder(EncoderConfig(width=96, height=80, qp=30,
                                    poc_type=pt))
        bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
        out = H264Decoder().decode_annexb(bs)
        assert [f.poc for f in out] == [0, 2, 4]
        for o, r in zip(out, sorted(enc.results, key=lambda r: r["disp"])):
            assert np.array_equal(o.Y, r["frame"].Y)
    import pytest
    with pytest.raises(ValueError):
        Encoder(EncoderConfig(width=96, height=80, qp=30, poc_type=2,
                              num_b=2))
