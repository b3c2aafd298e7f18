"""JVT-G012 rate control: model convergence + encoder integration."""

import numpy as np
import pytest

from jm_tpu.ratectl import RateControl, qp2qstep, qstep2qp


def test_qstep_maps_roundtrip():
    for qp in range(52):
        assert qstep2qp(qp2qstep(qp)) == qp
    assert qp2qstep(28) == pytest.approx(16.0)


def test_rc_converges_on_synthetic_channel():
    """Simulated encoder with R = K*MAD/Qstep: the controller's per-frame
    targets should converge to bitrate/framerate."""
    rc = RateControl(bit_rate=120000, frame_rate=30, width=176, height=144)
    rc.init_gop(29, 0)
    K, mad = 9000.0, 4.0
    qp = rc.pict_qp("I")
    bits = int(K * mad / qp2qstep(qp)) + 2000   # I overhead
    rc.update("I", qp, bits, mad)
    history = []
    for _i in range(29):
        qp = rc.pict_qp("P")
        bits = int(K * mad / qp2qstep(qp))
        rc.update("P", qp, bits, mad)
        history.append(bits)
    target_pf = 120000 / 30
    tail = np.mean(history[-10:])
    assert abs(tail - target_pf) / target_pf < 0.25
    assert len(set(h for h in history)) > 1     # QP actually moved


def test_rc_qp_bounded_steps():
    rc = RateControl(bit_rate=50000, frame_rate=30, width=176, height=144)
    rc.init_gop(10, 0)
    qp = rc.pict_qp("I")
    rc.update("I", qp, 50000, 6.0)   # massive overshoot
    prev = qp
    for _ in range(5):
        q = rc.pict_qp("P")
        assert abs(q - prev) <= rc.max_qp_change
        rc.update("P", q, 1500, 6.0)
        prev = q


def test_rc_encoder_integration(golden_dir):
    """RC-driven encode round-trips through our decoder; QP varies."""
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    W, H = 176, 144
    fsz = W * H * 3 // 2
    raw = np.fromfile(golden_dir / "main9_rec.yuv", np.uint8)
    frames = []
    for i in range(4):
        a = raw[i * fsz:(i + 1) * fsz]
        frames.append((a[:W * H].reshape(H, W),
                       a[W * H:W * H * 5 // 4].reshape(H // 2, W // 2),
                       a[W * H * 5 // 4:].reshape(H // 2, W // 2)))
    enc = Encoder(EncoderConfig(width=W, height=H, rc_enable=True,
                                rc_bitrate=150000))
    bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
    qps = [r["qp"] for r in enc.results]
    assert len(qps) == 4
    out = H264Decoder().decode_annexb(bs)
    out.sort(key=lambda f: f.poc)
    for d, r in zip(out, sorted(enc.results, key=lambda x: x["disp"])):
        np.testing.assert_array_equal(d.Y, r["frame"].Y)
        np.testing.assert_array_equal(d.U, r["frame"].U)
        np.testing.assert_array_equal(d.V, r["frame"].V)
