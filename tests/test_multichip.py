"""Multi-chip (MB-row-sharded) production encode: the sharded bitstream
must be BYTE-IDENTICAL to the 1-device bitstream (SURVEY §4.7 distributed
testing: sharded-vs-unsharded equality on the virtual 8-device CPU mesh).

The reference has no distributed mode (SURVEY §2.5); the sharding axis is
derived from the MB dependency cone, and integer-exact kernels make
bit-equality achievable (SURVEY §7 hard part 5)."""

import numpy as np
import pytest

from jm_tpu.encoder.encoder import Encoder, EncoderConfig

W, H = 96, 128  # mb_h = 8: divisible by 2/4/8 shards


def _frames(n=4, seed=11):
    """Synthetic sequence with global motion + noise."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H + 64, W + 64)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = np.clip(base * 1.7, 0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        Y = base[2 * i:2 * i + H, 3 * i:3 * i + W].copy()
        U = Y[::2, ::2].copy()
        V = Y[1::2, ::2].copy()
        out.append((Y, U, V))
    return out


def _encode(frames, shards):
    enc = Encoder(EncoderConfig(width=W, height=H, qp=28,
                                pipeline="device", sp_shards=shards))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    rec = b"".join(r["frame"].Y.tobytes() + r["frame"].U.tobytes()
                   + r["frame"].V.tobytes()
                   for r in sorted(enc.results, key=lambda x: x["disp"]))
    return bs, rec


@pytest.fixture(scope="module")
def unsharded():
    return _encode(_frames(), 1)


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_sharded_bitstream_byte_identical(unsharded, shards):
    import jax
    if len(jax.devices()) < shards:
        pytest.skip("needs the 8-device virtual CPU mesh")
    bs1, rec1 = unsharded
    bsn, recn = _encode(_frames(), shards)
    assert bsn == bs1
    assert recn == rec1


def test_sharded_stream_decodes(unsharded):
    """The (shared) stream itself is valid: our decoder reproduces the
    encoder recon byte-exactly."""
    import tempfile

    from jm_tpu.decoder.decoder import decode_file
    bs, rec = unsharded
    with tempfile.NamedTemporaryFile(suffix=".264") as f:
        f.write(bs)
        f.flush()
        dec = decode_file(f.name)
    out = b"".join(fr.Y.tobytes() + fr.U.tobytes() + fr.V.tobytes()
                   for fr in dec)
    assert out == rec
