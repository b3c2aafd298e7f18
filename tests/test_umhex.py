"""UMHexagonS / simplified UMHexagonS ME engines (SearchMode 1/2,
encoder/me_umhex.py — reference lencod/src/me_umhex.c,
me_umhexsmp.c): streams must decode bit-exactly (self + JM semantics via
the shared serializer), terminate, cut SAD evaluations vs full search,
and stay within a small RD distance of EPZS."""

import numpy as np
import pytest

from jm_tpu.decoder.decoder import H264Decoder
from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 112, 96


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (H + 48, W + 48)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = np.clip(base * 1.7, 0, 255).astype(np.uint8)
    out = []
    for i in range(5):
        Y = base[3 * i:3 * i + H, 2 * i:2 * i + W].copy()
        out.append((Y, Y[::2, ::2].copy(), Y[1::2, ::2].copy()))
    return out


def _encode(clip, **kw):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=28, **kw))
    stream = b""
    for (Y, U, V) in clip:
        stream += enc.encode_frame(Y, U, V)
    return stream + enc.flush(), enc


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@pytest.mark.parametrize("mode", [1, 2])
def test_umhex_decodes_and_rd_sanity(clip, mode):
    s, enc = _encode(clip, search_mode=mode)
    out = H264Decoder().decode_annexb(s)
    assert len(out) == len(clip)
    # recon must round-trip bit-exactly through our decoder
    for got, want in zip(out, sorted(enc.results, key=lambda r: r["disp"])):
        assert np.array_equal(got.Y, want["frame"].Y)
    # RD sanity vs EPZS (the reference's strongest fast engine):
    # hexagon search may lose a little, but not fall off a cliff
    s_ep, _ = _encode(clip, search_mode=3)
    dec_um = H264Decoder().decode_annexb(s)
    dec_ep = H264Decoder().decode_annexb(s_ep)
    p_um = np.mean([_psnr(clip[i][0], dec_um[i].Y)
                    for i in range(len(clip))])
    p_ep = np.mean([_psnr(clip[i][0], dec_ep[i].Y)
                    for i in range(len(clip))])
    assert p_um >= p_ep - 0.25
    assert len(s) <= len(s_ep) * 1.15


@pytest.mark.parametrize("mode", [1, 2])
def test_umhex_fewer_evals_than_full(clip, mode):
    """Both hexagon engines must evaluate far fewer SAD positions than
    the (2*sr+1)^2 full-search window (termination + pruning work)."""
    from jm_tpu.encoder import me_epzs as MEP
    enc = Encoder(EncoderConfig(width=W, height=H, qp=28,
                                search_mode=mode, search_range=16))
    evals = []
    orig = MEP.EPZSearcher.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        evals.append(self)
    MEP.EPZSearcher.__init__ = patched
    try:
        for (Y, U, V) in clip[:3]:
            enc.encode_frame(Y, U, V)
    finally:
        MEP.EPZSearcher.__init__ = orig
    n_mb = (W // 16) * (H // 16)
    full = (2 * 16 + 1) ** 2 * n_mb
    assert evals
    assert all(s.n_evals < full / 8 for s in evals if s.n_evals)


def test_umhex_multiref_and_bframes(clip):
    """SearchMode 1 composes with multi-ref and B pictures."""
    s, _ = _encode(clip, search_mode=1, num_ref=3, num_b=1)
    out = sorted(H264Decoder().decode_annexb(s), key=lambda f: f.poc)
    assert len(out) == len(clip)
    p = np.mean([_psnr(clip[i][0], out[i].Y) for i in range(len(clip))])
    assert p > 32.0
