"""Encoder weighted prediction (E31/E28): estimation, header syntax,
decode-exact application. Oracle interop (JM ldecod bit-exact on explicit
P, explicit/implicit B, combined) verified out-of-band with /verify."""

import numpy as np

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _fade(n=4, w=96, h=80):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (110 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.float64)
    out = []
    for i in range(n):
        g = 1.0 - 0.15 * i
        Y = np.clip(base * g, 0, 255).astype(np.uint8)
        U = np.clip((100 + 20 * np.sin(yy[::2, ::2] / 5.0)) * g, 0,
                    255).astype(np.uint8)
        out.append((Y, U, (U[::-1] // 2 + 64).astype(np.uint8)))
    return out


def _run(**kw):
    frames = _fade()
    enc = Encoder(EncoderConfig(width=96, height=80, qp=28, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    return sum(r["bits"] for r in enc.results)


def test_wp_p_explicit_saves_bits_and_roundtrips():
    plain = _run()
    wp = _run(weighted_pred=1)
    assert wp < plain * 0.85   # fades are the WP use case


def test_wp_b_implicit_and_explicit_roundtrip():
    _run(num_b=1, weighted_bipred=2, entropy="cabac")
    _run(num_b=1, weighted_bipred=1)
    _run(num_b=1, weighted_pred=1, weighted_bipred=1)


def test_wp_iter_mc_roundtrips_and_tracks_fade():
    """WPIterMC (wp_mciter.c twin): iterative MC-based estimation still
    roundtrips decode-exactly and stays within the fade's bit budget."""
    plain = _run()
    it = _run(weighted_pred=1, wp_iter_mc=2)
    assert it < plain * 0.85


def test_wp_mcprec_picks_min_j():
    """WPMCPrecision: the per-picture {WP, offset-only, no-WP} trial
    never loses to plain explicit WP (it contains it as a candidate)."""
    wp = _run(weighted_pred=1)
    prec = _run(weighted_pred=1, wp_mcprec=1)
    assert prec <= wp * 1.02


def test_wp_mc_iter_estimation_on_shift():
    """A pure global shift must NOT corrupt the weight (alg0's failure
    mode): after MC alignment the weight stays ~default."""
    from jm_tpu.decoder.dpb import Frame
    from jm_tpu.encoder.wp_est import estimate_explicit, estimate_mc_iter
    rng = np.random.default_rng(3)
    base = rng.integers(0, 250, (96, 128)).astype(np.uint8)
    Y = base[4:68, 4:100].copy()                  # shifted crop, same dc-ish
    refY = base[0:64, 0:96].copy()
    U = V = np.full((32, 48), 80, np.uint8)
    ref = Frame(poc=0, frame_num=0, Y=refY, U=U, V=V)
    tab = estimate_mc_iter(Y, U, V, [ref], iters=2, rng=4)
    assert abs(tab[0]["luma"][0] - 32) <= 1


def test_wp_estimation_values():
    from jm_tpu.encoder.wp_est import estimate_explicit, is_nontrivial
    from jm_tpu.decoder.dpb import Frame
    Y = np.full((32, 32), 100, np.uint8)
    U = V = np.full((16, 16), 60, np.uint8)
    ref = Frame(poc=0, frame_num=0, Y=(Y * 2).astype(np.uint8),
                U=(U * 2).astype(np.uint8), V=(V * 2).astype(np.uint8))
    tab = estimate_explicit(Y, U, V, [ref])
    assert tab[0]["luma"] == (16, 0)          # 32 * 100/200
    assert tab[0]["chroma"][0] == (16, 0)
    assert is_nontrivial(tab)
    same = Frame(poc=0, frame_num=0, Y=Y, U=U, V=V)
    assert not is_nontrivial(estimate_explicit(Y, U, V, [same]))


def test_wp_lms_beats_alg0_on_fade():
    """WPMethod=1 (LMS estimator, wp_lms.c twin): on a linear fade the
    LMS luma offset captures the brightness ramp better than the
    DC-ratio alg0 (RD improvement), and the stream stays self-decode
    bit-exact (WP application is shared with the decoder)."""
    import numpy as np

    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    rng = np.random.default_rng(8)
    base = rng.integers(40, 200, (96, 112)).astype(np.float64)
    frames = []
    for i in range(4):
        # additive fade: exactly what a weight-1/offset-d model fits
        Y = np.clip(base[:80, :96] + 18 * i, 0, 255).astype(np.uint8)
        frames.append((Y, Y[::2, ::2].copy(), Y[1::2, ::2].copy()))

    sizes = {}
    for m in (0, 1):
        enc = Encoder(EncoderConfig(width=96, height=80, qp=30,
                                    weighted_pred=1, wp_method=m))
        bs = b"".join(enc.encode_frame(*f) for f in frames) + enc.flush()
        out = H264Decoder().decode_annexb(bs)
        for o, r in zip(out, sorted(enc.results,
                                    key=lambda r: r["disp"])):
            assert np.array_equal(o.Y, r["frame"].Y)
        sizes[m] = len(bs)
    assert sizes[1] <= sizes[0]
