"""Decoder conformance: bit-exact YUV vs the JM reference recon for golden
streams produced by the reference lencod (SURVEY.md §4.1 round-trip oracle).
"""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import decode_file

W, H = 176, 144


def _load_yuv(path, n_frames, chroma=420):
    ch = H // 2 if chroma == 420 else H        # 4:2:2: full-height chroma
    fsz = W * H + 2 * (W // 2) * ch
    data = np.fromfile(path, np.uint8)
    out = []
    for i in range(n_frames):
        r = data[i * fsz:(i + 1) * fsz]
        Y = r[:W * H].reshape(H, W)
        U = r[W * H:W * H + (W // 2) * ch].reshape(ch, W // 2)
        V = r[W * H + (W // 2) * ch:].reshape(ch, W // 2)
        out.append((Y, U, V))
    return out


@pytest.mark.parametrize("stream,recon,n", [
    ("i1.264", "i1_rec.yuv", 1),
    ("ipp3.264", "ipp3_rec.yuv", 3),
    ("qp20.264", "qp20_rec.yuv", 3),
    ("qp36.264", "qp36_rec.yuv", 3),
    ("cabac_pp.264", "cabac_pp_rec.yuv", 3),
    ("main3.264", "main3_rec.yuv", 3),
    ("main9.264", "main9_rec.yuv", 9),
    ("main9t.264", "main9t_rec.yuv", 9),
    ("wp_p.264", "wp_p_rec.yuv", 9),
    ("wp_bi.264", "wp_bi_rec.yuv", 9),
    ("wp_both.264", "wp_both_rec.yuv", 9),
    ("cavlc_b.264", "cavlc_b_rec.yuv", 9),
    ("high8x8.264", "high8x8_rec.yuv", 9),
    ("high8x8sm.264", "high8x8sm_rec.yuv", 9),
    ("high8x8c.264", "high8x8c_rec.yuv", 9),
    ("y422.264", "y422_rec.yuv", 3),      # High 4:2:2 CABAC + B + 8x8 T
    ("y422c.264", "y422c_rec.yuv", 3),    # 4:2:2 CAVLC IPP
    ("fmo_t1.264", "fmo_t1_rec.yuv", 3),     # FMO dispersed, 2 groups
    ("fmo_t3.264", "fmo_t3_rec.yuv", 3),     # FMO box-out
    ("fmo_t5d1.264", "fmo_t5d1_rec.yuv", 3),  # FMO wipe, reverse direction
    ("fmo_t6.264", "fmo_t6_rec.yuv", 3),     # FMO explicit (sg6conf)
    ("poc1b.264", "poc1b_rec.yuv", 9),       # POC type 1, B pyramid
    ("sp1.264", "sp1_rec.yuv", 9),           # SP switching slices (E35):
                                             # I-P-P-SP-P, QS 30 requant
    ("field1.264", "field1_rec.yuv", 6),     # PAFF field pictures (D21):
                                             # IPPP fields, field scan,
                                             # SPS cropping 160->144
    ("field2.264", "field2_rec.yuv", 12),    # fields, 4 ref frames (8-field
                                             # parity-alternating lists)
    ("fieldcab.264", "fieldcab_rec.yuv", 6),  # interlace-capable SPS
                                             # (frame_mbs_only=0), CABAC
                                             # frame pictures + cropping
    ("dp1.264", "dp1_rec.yuv", 6),           # data partitioning (D3):
                                             # NAL 2/3/4 slices, residual
                                             # SEs split intra->B inter->C
])
def test_bit_exact_vs_jm(golden_dir, stream, recon, n):
    frames = sorted(decode_file(str(golden_dir / stream)), key=lambda f: f.poc)
    assert len(frames) == n
    chroma = 422 if stream.startswith("y422") else 420
    refs = _load_yuv(golden_dir / recon, n, chroma)
    for i, (f, (Yr, Ur, Vr)) in enumerate(zip(frames, refs)):
        np.testing.assert_array_equal(f.Y, Yr, err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(f.U, Ur, err_msg=f"frame {i} U")
        np.testing.assert_array_equal(f.V, Vr, err_msg=f"frame {i} V")


def test_mbaff_rejected_loudly(golden_dir):
    """MBAFF (E42 remainder) must reject, never silently corrupt."""
    import pytest
    from jm_tpu.decoder.decoder import decode_file
    with pytest.raises(NotImplementedError, match="MBAFF"):
        decode_file(str(golden_dir / "mbaff1.264"))


@pytest.mark.parametrize("stream,recon,n", [
    ("hi10c.264", "hi10c_rec.yuv", 6),   # High 10, CAVLC IPP
    ("hi10.264", "hi10_rec.yuv", 6),     # High 10, CABAC + 2 B + 2 refs
])
def test_high10_bit_exact(golden_dir, stream, recon, n):
    """>8-bit decoding (High 10 profile, uint16 planes): bit-exact vs
    the JM recon — QP'=QP+QpBdOffset dequant, 1<<(bd-1) intra DC,
    scaled deblock thresholds, (1<<bd)-1 clips throughout."""
    frames = sorted(decode_file(str(golden_dir / stream)),
                    key=lambda f: f.poc)
    assert len(frames) == n
    assert frames[0].Y.dtype == np.uint16
    ref = np.fromfile(golden_dir / recon, "<u2")
    fsz = W * H * 3 // 2
    for k, f in enumerate(frames):
        got = np.concatenate([f.Y.ravel(), f.U.ravel(), f.V.ravel()])
        np.testing.assert_array_equal(got.astype(np.uint16),
                                      ref[k * fsz:(k + 1) * fsz],
                                      err_msg=f"frame {k}")


def test_dp_encode_roundtrip():
    """Encoder-side data partitioning (PartitionMode=1): NAL 2/3/4 output
    decodes bit-exactly in our decoder; JM ldecod interop verified with
    /verify (oracle bit-exact)."""
    import numpy as np
    from jm_tpu.bitstream.nal import split_annexb
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(3)
    w, h = 96, 80
    base = rng.integers(0, 256, (h + 16, w + 16)).astype(np.uint8)
    frames = [(base[i:i + h, i:i + w].copy(),
               base[i:i + h, i:i + w][::2, ::2].copy(),
               base[i:i + h, i:i + w][1::2, ::2].copy()) for i in range(5)]
    enc = Encoder(EncoderConfig(width=w, height=h, qp=28, data_partition=1))
    out = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    kinds = [n.nal_unit_type for n in split_annexb(out)]
    assert 2 in kinds and 4 in kinds          # DPA + DPC emitted
    assert enc.sps.profile_idc == 88
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(frames)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
