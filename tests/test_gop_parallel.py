"""GOP-parallel (dp) driver: closed GOPs encoded on separate devices of
a ('dp', 'sp') mesh must concatenate to the byte-identical serial
bitstream (parallel/gop_pipeline.py; closed-GOP independence per
lencod/src/mbuffer.c:1727 idr_memory_management), including combined
dp x sp (MB-row sharding inside each GOP row)."""

import numpy as np
import pytest

from jm_tpu.encoder.encoder import Encoder, EncoderConfig
from jm_tpu.parallel.gop_pipeline import encode_gops_parallel, split_gops


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.clip(base * 1.5, 0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        Y = base[2 * i:2 * i + h, i:i + w].copy()
        out.append((Y, Y[::2, ::2].copy(), Y[1::2, ::2].copy()))
    return out


def test_split_gops():
    assert split_gops(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert split_gops(8, 4) == [(0, 4), (4, 8)]
    assert split_gops(5, 0) == [(0, 5)]


@pytest.mark.parametrize("n_dp,n_sp,sp_shards,device_rd", [
    (2, 1, 1, False),   # pure GOP parallelism
    (4, 1, 1, False),
    (2, 4, 4, False),   # dp x sp: MB-row sharding inside each GOP row
    (2, 1, 1, True),    # dp over the md_high device-RD quality tier
    (4, 1, 1, True),
])
def test_gop_parallel_bitstream_identical(n_dp, n_sp, sp_shards, device_rd):
    import jax
    if len(jax.devices()) < n_dp * n_sp:
        pytest.skip("needs more devices")
    w, h = 96, 64
    frames = _frames(w, h, 9)
    cfg = EncoderConfig(width=w, height=h, qp=30, intra_period=3,
                        pipeline="device", sp_shards=sp_shards,
                        search_range=8, device_rd=device_rd)
    serial = Encoder(cfg)
    want = b"".join(serial.encode_frame(*f) for f in frames)
    want += serial.flush()

    got, results = encode_gops_parallel(frames, cfg, n_dp=n_dp,
                                        n_sp=n_sp)
    assert got == want
    assert [r["disp"] for r in results] == list(range(len(frames)))
    # recon continuity: every frame present with recon planes
    assert all(r.get("frame") is not None for r in results)


def test_gop_parallel_rejects_open_gop():
    frames = _frames(96, 64, 4)
    with pytest.raises(ValueError):
        encode_gops_parallel(frames, EncoderConfig(width=96, height=64,
                                                   qp=30), n_dp=2)
