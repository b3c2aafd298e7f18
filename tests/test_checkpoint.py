"""GOP-granular job checkpoint/resume (SURVEY §5 new-scope subsystem):
snapshot at a closed-GOP boundary, resume elsewhere, byte-identical
remainder — incl. rate-control and intra-refresh state."""

import numpy as np
import pytest

from jm_tpu.encoder import checkpoint as CK
from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _seq(n=9, w=96, h=80):
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (h + 16, w + 16)).astype(np.uint8)
    return [(base[i:i + h, i:i + w].copy(),
             base[i:i + h, i:i + w][::2, ::2].copy(),
             base[i:i + h, i:i + w][1::2, ::2].copy()) for i in range(n)]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(rc_enable=True, rc_bitrate=200000, frame_rate=30.0),
    dict(intra_mb_refresh=2),
    dict(entropy="cabac"),
])
def test_resume_is_byte_identical(tmp_path, kw):
    frames = _seq()
    cfg = EncoderConfig(width=96, height=80, qp=30, intra_period=3, **kw)
    e1 = Encoder(cfg)
    full = b"".join(e1.encode_frame(*f) for f in frames)
    e2 = Encoder(cfg)
    part = b"".join(e2.encode_frame(*f) for f in frames[:6])
    assert CK.checkpointable(e2)
    ck = tmp_path / "job.ckpt"
    CK.save(e2, str(ck), len(part))
    e3, done, nbytes = CK.load(str(ck))
    assert done == 6 and nbytes == len(part)
    rest = b"".join(e3.encode_frame(*f) for f in frames[6:])
    assert part + rest == full


def test_checkpoint_rejected_mid_gop(tmp_path):
    frames = _seq(4)
    enc = Encoder(EncoderConfig(width=96, height=80, qp=30, intra_period=3))
    for f in frames:
        enc.encode_frame(*f)
    assert not CK.checkpointable(enc)        # frame_idx == 4, mid-GOP
    with pytest.raises(ValueError):
        CK.save(enc, str(tmp_path / "x"), 0)


def test_checkpoint_file_format(tmp_path):
    p = tmp_path / "bad.ckpt"
    p.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        CK.load(str(p))


def test_cli_kill_resume(tmp_path):
    """CLI-level kill/resume (ADVICE r3 high): run lencod with -ckpt, kill
    it mid-sequence (simulated by an input-reading exception), then resume
    with -resume; the final stream must equal the uninterrupted run's."""
    import io
    from contextlib import redirect_stdout

    from jm_tpu.tools import lencod as CLI

    frames = _seq(9)
    w, h = 96, 80
    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as fh:
        for Y, U, V in frames:
            fh.write(Y.tobytes() + U.tobytes() + V.tobytes())
    out = tmp_path / "out.264"
    ck = tmp_path / "job.ckpt"
    args = ["-p", f"InputFile={yuv}", "-p", f"SourceWidth={w}",
            "-p", f"SourceHeight={h}", "-p", "FramesToBeEncoded=9",
            "-p", "IntraPeriod=3", "-p", "QPISlice=30", "-p", "QPPSlice=30",
            "-p", f"OutputFile={out}", "-ckpt", str(ck)]

    # uninterrupted run for the golden stream
    with redirect_stdout(io.StringIO()):
        CLI.main(args)
    golden = out.read_bytes()
    out.unlink()

    # interrupted run: abort inside frame 7 (after the frame-6 checkpoint
    # was written) — a kill leaves only the .part file + checkpoint behind
    real = Encoder.encode_frame
    calls = {"n": 0}

    def killer(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] > 7:
            raise KeyboardInterrupt
        return real(self, *a, **kw)

    Encoder.encode_frame = killer
    try:
        with redirect_stdout(io.StringIO()), pytest.raises(KeyboardInterrupt):
            CLI.main(args)
    finally:
        Encoder.encode_frame = real
    assert ck.exists()
    assert not out.exists()            # the kill never wrote OutputFile
    assert (tmp_path / "out.264.part").exists()

    with redirect_stdout(io.StringIO()):
        CLI.main(args + ["-resume"])
    assert out.read_bytes() == golden
    assert not (tmp_path / "out.264.part").exists()
