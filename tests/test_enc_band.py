"""The band-window machinery (gather-free subpel/MC/skip) must be
bit-identical to the legacy per-window gather implementations in
ops/enc_jax.py (which remain the reference and the sharded pipeline's
building blocks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jm_tpu.ops import enc_jax as EJ


@pytest.fixture(scope="module")
def setup():
    mb_w, mb_h, sr = 6, 5, 16
    W, H = mb_w * 16, mb_h * 16
    rng = np.random.default_rng(3)
    Y = rng.integers(0, 256, (H, W), np.uint8)
    U = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    V = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    refY = rng.integers(0, 256, (H, W), np.uint8)
    refU = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    refV = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    planes, padU, padV = jax.device_get(EJ.prep_ref(refY, refU, refV))
    n = mb_w * mb_h
    mb_xy = jnp.stack([(jnp.arange(n) % mb_w) * 16,
                       (jnp.arange(n) // mb_w) * 16], 1).astype(jnp.int32)
    int_mv = rng.integers(-sr, sr + 1, (n, 9, 2)).astype(np.int32)
    pred = rng.integers(-2 * sr, 2 * sr, (n, 2)).astype(np.int32)
    orig_mbs = Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3) \
        .reshape(n, 16, 16)
    orig_q = orig_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 4, 8, 8).astype(np.int16)
    return dict(mb_w=mb_w, mb_h=mb_h, sr=sr, W=W, H=H,
                planes=jnp.asarray(planes), padU=jnp.asarray(padU),
                padV=jnp.asarray(padV), mb_xy=mb_xy,
                int_mv=jnp.asarray(int_mv), pred=jnp.asarray(pred),
                orig_q=jnp.asarray(orig_q), Y=Y, U=U, V=V, rng=rng)


def test_refine_dense_matches_sequential(setup):
    s = setup
    band = EJ.build_band(s["planes"], s["mb_w"], s["sr"])
    mv_a, cost_a = EJ.subpel_refine_jobs(
        s["planes"], s["orig_q"], s["int_mv"], s["pred"], 92, s["mb_xy"],
        s["W"], s["H"])
    mv_b, cost_b, _win = EJ.qpel_refine_dense(
        band, s["orig_q"], s["int_mv"], s["pred"], 92, s["mb_xy"], s["sr"])
    assert np.array_equal(np.asarray(cost_a), np.asarray(cost_b))
    assert np.array_equal(np.asarray(mv_a), np.asarray(mv_b))


def test_mc_luma_band_matches(setup):
    s = setup
    band = EJ.build_band(s["planes"], s["mb_w"], s["sr"])
    n = s["mb_w"] * s["mb_h"]
    rng = np.random.default_rng(9)
    mv_quad = jnp.asarray(
        rng.integers(-4 * s["sr"] - 3, 4 * s["sr"] + 4, (n, 4, 2))
        .astype(np.int32))
    a = EJ.mc_luma_quads(s["planes"], mv_quad, s["mb_xy"], s["W"], s["H"])
    b = EJ.mc_luma_quads_band(band, mv_quad, s["mb_xy"], s["sr"])
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_mc_chroma_band_matches(setup):
    s = setup
    cband = EJ.build_cband(s["padU"], s["padV"], s["mb_w"], s["sr"])
    n = s["mb_w"] * s["mb_h"]
    rng = np.random.default_rng(11)
    mv_quad = jnp.asarray(
        rng.integers(-4 * s["sr"] - 3, 4 * s["sr"] + 4, (n, 4, 2))
        .astype(np.int32))
    au, av = EJ.mc_chroma_quads(s["padU"], s["padV"], mv_quad, s["mb_xy"],
                                s["W"], s["H"])
    bu, bv = EJ.mc_chroma_quads_band(cband, mv_quad, s["mb_xy"], s["sr"])
    assert np.array_equal(np.asarray(au), np.asarray(bu))
    assert np.array_equal(np.asarray(av), np.asarray(bv))


def test_skip_cost_band_matches(setup):
    s = setup
    band = EJ.build_band(s["planes"], s["mb_w"], s["sr"])
    got = EJ.skip_cost_band(band, s["pred"], s["mb_xy"], s["orig_q"],
                            s["sr"])
    g16 = jax.vmap(jax.vmap(
        lambda a, b: EJ._gather_qpel(s["planes"], a, b, 8, s["W"], s["H"])))
    qx = jnp.asarray([(0, 0), (8, 0), (0, 8), (8, 8)], jnp.int32)
    sx = (s["mb_xy"][:, 0:1] + qx[None, :, 0]) * 4 + s["pred"][:, 0:1]
    sy = (s["mb_xy"][:, 1:2] + qx[None, :, 1]) * 4 + s["pred"][:, 1:2]
    skip_pred = g16(sx, sy)
    want = jnp.abs(s["orig_q"].astype(jnp.int32) - skip_pred) \
        .sum(axis=(1, 2, 3))
    assert np.array_equal(np.asarray(got), np.asarray(want))
