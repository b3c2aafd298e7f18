"""Source input layer (C5): packed 4:2:2 and >8-bit planar readers
(lcommon/src/input.c deinterleave_* twins) — pack/unpack round trips."""

import numpy as np

from jm_tpu.tools.input import (PF_UYVY, PF_V210, PF_YUY2, PF_YVYU,
                                read_frames)

W, H = 48, 32


def _planes422(rng, bits=8):
    hi = (1 << bits) - 1
    dt = np.uint8 if bits <= 8 else np.uint16
    Y = rng.integers(0, hi + 1, (H, W)).astype(dt)
    U = rng.integers(0, hi + 1, (H, W // 2)).astype(dt)
    V = rng.integers(0, hi + 1, (H, W // 2)).astype(dt)
    return Y, U, V


def _pack_packed(Y, U, V, pf):
    q = np.empty((H, W // 2, 4), Y.dtype)
    if pf == PF_UYVY:
        q[..., 0], q[..., 1], q[..., 2], q[..., 3] = \
            U, Y[:, 0::2], V, Y[:, 1::2]
    elif pf == PF_YUY2:
        q[..., 0], q[..., 1], q[..., 2], q[..., 3] = \
            Y[:, 0::2], U, Y[:, 1::2], V
    else:
        q[..., 0], q[..., 1], q[..., 2], q[..., 3] = \
            Y[:, 0::2], V, Y[:, 1::2], U
    return q.tobytes()


def _pack_v210(Y, U, V):
    # inverse of input.c deinterleave_v210's word layout
    ys = Y.reshape(-1, 6).astype(np.uint32)
    us = U.reshape(-1, 3).astype(np.uint32)
    vs = V.reshape(-1, 3).astype(np.uint32)
    w = np.empty((ys.shape[0], 4), np.uint32)
    w[:, 0] = us[:, 0] | (ys[:, 0] << 10) | (vs[:, 0] << 20)
    w[:, 1] = ys[:, 1] | (us[:, 1] << 10) | (ys[:, 2] << 20)
    w[:, 2] = vs[:, 1] | (ys[:, 3] << 10) | (us[:, 2] << 20)
    w[:, 3] = ys[:, 4] | (vs[:, 2] << 10) | (ys[:, 5] << 20)
    return w.astype("<u4").tobytes()


def test_packed_422_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for pf in (PF_UYVY, PF_YUY2, PF_YVYU):
        Y, U, V = _planes422(rng)
        p = tmp_path / f"p{pf}.raw"
        p.write_bytes(_pack_packed(Y, U, V, pf) * 2)     # two frames
        frames = read_frames(str(p), W, H, 2, chroma_format=2,
                             pixel_format=pf)
        assert len(frames) == 2
        for gy, gu, gv in frames:
            np.testing.assert_array_equal(gy, Y)
            np.testing.assert_array_equal(gu, U)
            np.testing.assert_array_equal(gv, V)


def test_v210_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    Y, U, V = _planes422(rng, bits=10)
    p = tmp_path / "v.raw"
    p.write_bytes(_pack_v210(Y, U, V))
    (gy, gu, gv), = read_frames(str(p), W, H, 1, pixel_format=PF_V210)
    np.testing.assert_array_equal(gy, Y)
    np.testing.assert_array_equal(gu, U)
    np.testing.assert_array_equal(gv, V)
    assert gy.dtype == np.uint16


def test_highbit_planar(tmp_path):
    rng = np.random.default_rng(4)
    Y = rng.integers(0, 1 << 10, (H, W)).astype("<u2")
    U = rng.integers(0, 1 << 10, (H // 2, W // 2)).astype("<u2")
    V = rng.integers(0, 1 << 10, (H // 2, W // 2)).astype("<u2")
    p = tmp_path / "p10.yuv"
    p.write_bytes(Y.tobytes() + U.tobytes() + V.tobytes())
    (gy, gu, gv), = read_frames(str(p), W, H, 1, bit_depth=10)
    np.testing.assert_array_equal(gy, Y)
    np.testing.assert_array_equal(gu, U)
    np.testing.assert_array_equal(gv, V)
