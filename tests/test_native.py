"""Native (C++) runtime layer: equivalence with the Python reference
implementations (jm_native BitReader / CabacEngine / EBSP escaping)."""

import numpy as np
import pytest

import jm_tpu.native as N
from jm_tpu.bitstream.bitreader import PyBitReader
from jm_tpu.bitstream.nal import ebsp_to_rbsp as py_unescape
from jm_tpu.bitstream.nal import rbsp_to_ebsp as py_escape

pytestmark = pytest.mark.skipif(not N.available,
                                reason="native extension not built")


def test_bitreader_fuzz_equivalence():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
    a, b = PyBitReader(data), N.BitReader(data)
    for step in range(6000):
        op = rng.choice(["u", "flag", "ue", "se", "te1", "te9", "peek_pad",
                         "align", "more"])
        n = int(rng.integers(0, 25))

        def run(r):
            if op == "u":
                return r.u(n)
            if op == "flag":
                return r.flag()
            if op == "ue":
                return r.ue()
            if op == "se":
                return r.se()
            if op == "te1":
                return r.te(1)
            if op == "te9":
                return r.te(9)
            if op == "peek_pad":
                return r.peek_pad(16)
            if op == "align":
                r.align()
                return r.pos
            return bool(r.more_rbsp_data())

        ea = eb = va = vb = None
        try:
            va = run(a)
        except Exception as e:
            ea = type(e).__name__
        try:
            vb = run(b)
        except Exception as e:
            eb = type(e).__name__
        assert ea == eb
        if ea is not None:
            return
        assert va == vb and a.pos == b.pos


def test_ebsp_escape_equivalence():
    rng = np.random.default_rng(1)
    for _ in range(300):
        raw = rng.integers(0, 4, int(rng.integers(0, 64)),
                           dtype=np.uint8).tobytes()
        assert N.rbsp_to_ebsp(raw) == py_escape(raw)
        assert N.ebsp_to_rbsp(py_escape(raw)) == raw == \
            py_unescape(py_escape(raw))


def test_cabac_engine_equivalence():
    """Run identical random op sequences through both engines on the same
    bit buffer with independently-evolving context copies."""
    from jm_tpu.decoder.cabac import CabacContexts, PyCabacEngine
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 800, dtype=np.uint8).tobytes()
    ea = PyCabacEngine(PyBitReader(data))
    eb = N.CabacEngine(N.BitReader(data))
    ctx_a = CabacContexts(False, 0, 30)
    ctx_b = CabacContexts(False, 0, 30)
    ga = [ctx_a.mb_type[1], ctx_a.map[2], ctx_a.one[5], ctx_a.mv_res[0]]
    gb = [ctx_b.mb_type[1], ctx_b.map[2], ctx_b.one[5], ctx_b.mv_res[0]]
    for step in range(3000):
        op = rng.choice(["dec", "byp", "term", "unary_max", "eg", "ueg0",
                         "ueg3"])
        g = int(rng.integers(0, 4))
        idx = int(rng.integers(0, min(ga[g].shape[0], 5)))
        try:
            if op == "dec":
                va = ea.decision(ga[g], idx)
                vb = eb.decision(gb[g], idx)
            elif op == "byp":
                va, vb = ea.bypass(), eb.bypass()
            elif op == "term":
                va, vb = ea.terminate(), eb.terminate()
            elif op == "unary_max":
                va = ea.unary_max(ga[g], 0, 1, 4)
                vb = eb.unary_max(gb[g], 0, 1, 4)
            elif op == "eg":
                va = ea.exp_golomb_eq_prob(2)
                vb = eb.exp_golomb_eq_prob(2)
            elif op == "ueg0":
                va, vb = ea.ueg0_level(ga[g], idx), eb.ueg0_level(gb[g], idx)
            else:
                va = ea.ueg3_mv(ga[g], 0)
                vb = eb.ueg3_mv(gb[g], 0)
        except EOFError:
            with pytest.raises(EOFError):
                raise
            return
        assert va == vb, (step, op)
        assert ea.rng == eb.rng and ea.offset == eb.offset, (step, op)
        for x, y in zip(ga, gb):
            np.testing.assert_array_equal(x, y)


def test_native_decode_bit_exact(golden_dir):
    """The wired-in native path decodes a golden CABAC+B stream to the
    same YUV the conformance suite verified against JM."""
    from jm_tpu.decoder.decoder import decode_file
    frames = sorted(decode_file(str(golden_dir / "main3.264")),
                    key=lambda f: f.poc)
    ref = np.fromfile(golden_dir / "main3_rec.yuv", np.uint8)
    W, H = 176, 144
    fsz = W * H * 3 // 2
    for i, f in enumerate(frames):
        exp = ref[i * fsz:(i + 1) * fsz]
        np.testing.assert_array_equal(f.Y, exp[:W * H].reshape(H, W))


def test_native_cavlc_serializer_matches_python(foreman_qcif):
    """native/jm_enc.cpp cavlc_slice_data is the byte-exact twin of the
    Python MBWriter across P/I slices, multi-ref, sub-partitions and the
    8x8 transform."""
    from jm_tpu import native as N
    if not N.available:
        import pytest
        pytest.skip("native runtime unavailable")
    from jm_tpu.encoder import syntax as S
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig

    raw = open(foreman_qcif, "rb").read()
    W, H = 176, 144
    fs = W * H * 3 // 2
    frames = []
    for i in range(3):
        b = raw[i * fs:(i + 1) * fs]
        frames.append((
            np.frombuffer(b[:W * H], np.uint8).reshape(H, W),
            np.frombuffer(b[W * H:W * H + W * H // 4],
                          np.uint8).reshape(H // 2, W // 2),
            np.frombuffer(b[W * H + W * H // 4:],
                          np.uint8).reshape(H // 2, W // 2)))

    for cfg in (EncoderConfig(width=W, height=H, qp=28, pipeline="device"),
                EncoderConfig(width=W, height=H, qp=34, num_ref=2,
                              sub8x8=True),
                EncoderConfig(width=W, height=H, qp=24, transform8x8=True)):
        enc = Encoder(cfg)
        bs_native = b"".join(enc.encode_frame(*f) for f in frames)
        orig_fn = S._native_slice_data
        S._native_slice_data = lambda *a, **k: None
        try:
            enc2 = Encoder(cfg)
            bs_py = b"".join(enc2.encode_frame(*f) for f in frames)
        finally:
            S._native_slice_data = orig_fn
        assert bs_native == bs_py


def test_native_deblock_matches_numpy(golden_dir):
    """native deblock_frame == numpy edge loops on real decoded pictures
    (I/P/B, CABAC/CAVLC, FMO)."""
    from jm_tpu import native as N
    if not N.available:
        import pytest
        pytest.skip("native runtime unavailable")
    from jm_tpu.decoder.decoder import decode_file
    from jm_tpu.ops import deblock as DB
    for name in ("cabac_pp.264", "cavlc_b.264", "fmo_t3.264"):
        fr_native = decode_file(str(golden_dir / name))
        orig = DB._deblock_native
        DB._deblock_native = lambda *a: False
        try:
            fr_np = decode_file(str(golden_dir / name))
        finally:
            DB._deblock_native = orig
        for a, b in zip(fr_native, fr_np):
            np.testing.assert_array_equal(a.Y, b.Y)
            np.testing.assert_array_equal(a.U, b.U)
            np.testing.assert_array_equal(a.V, b.V)
