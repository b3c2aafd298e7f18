"""Device deblocking filter (ops/deblock_jax.py) must be bit-exact
against the host reference filter (ops/deblock.py numpy path) across
random pictures exercising every strength class, per-MB QP, multi-slice
disable modes, and 8x8-transform edge masking."""

import numpy as np
import pytest

from jm_tpu.decoder.mb_parse import PictureData
from jm_tpu.ops.deblock import compute_bs, deblock_picture
from jm_tpu.ops.deblock_jax import compute_bs_jax, deblock_picture_jax


def random_pic(rng, mb_w, mb_h, intra_frac=0.3, multi_ref=False,
               t8_frac=0.0):
    pic = PictureData(mb_w, mb_h)
    n = pic.n_mbs
    intra = rng.random(n) < intra_frac
    pic.mb_class[:] = np.where(intra, 1, 0)
    pic.qp[:] = rng.integers(18, 44, n)
    pic.slice_id[:] = 0
    pic.luma_nnz[:] = rng.integers(0, 3, (n, 16)) * (rng.random((n, 16)) < 0.4)
    pic.mv[:] = rng.integers(-32, 33, (n, 16, 2))
    pic.mv[intra] = 0
    pic.luma_nnz[intra] = rng.integers(0, 5, (intra.sum(), 16))
    if multi_ref:
        pic.ref_pic_id[:] = rng.integers(0, 3, (n, 4))
    else:
        pic.ref_pic_id[:] = 7
    pic.ref_pic_id[intra] = -1
    pic.ref_idx[intra] = -1
    if t8_frac:
        pic.transform8x8[:] = rng.random(n) < t8_frac
    return pic


def slice_params(pic, disable=0, a_off=0, b_off=0):
    n = pic.n_mbs
    return {
        "disable_idc": np.full(n, disable, np.int32),
        "alpha_off": np.full(n, a_off, np.int32),
        "beta_off": np.full(n, b_off, np.int32),
        "cb_qp_off": np.zeros(n, np.int32),
        "cr_qp_off": np.zeros(n, np.int32),
        "slice_id": pic.slice_id.astype(np.int32),
    }


@pytest.mark.parametrize("mb_w,mb_h,seed,kw", [
    (6, 4, 0, {}),
    (8, 5, 1, {"multi_ref": True}),
    (4, 7, 2, {"intra_frac": 1.0}),
    (5, 3, 3, {"intra_frac": 0.0}),
    (7, 6, 4, {"t8_frac": 0.5}),
    (1, 4, 5, {}),
    (6, 1, 6, {}),
])
def test_deblock_jax_bitexact(mb_w, mb_h, seed, kw):
    rng = np.random.default_rng(seed)
    pic = random_pic(rng, mb_w, mb_h, **kw)
    H, W = 16 * mb_h, 16 * mb_w
    Y = rng.integers(0, 256, (H, W), np.uint8)
    U = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    V = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    sp = slice_params(pic)

    Yh, Uh, Vh = Y.copy(), U.copy(), V.copy()
    deblock_picture(Yh, Uh, Vh, pic, mb_w, mb_h, pic.qp, sp,
                    force_numpy=True)
    Yd, Ud, Vd = deblock_picture_jax(Y.copy(), U.copy(), V.copy(), pic,
                                     mb_w, mb_h, pic.qp, sp)
    assert np.array_equal(Yh, Yd)
    assert np.array_equal(Uh, Ud)
    assert np.array_equal(Vh, Vd)


def test_deblock_jax_offsets_and_disable2():
    """Alpha/beta offsets and disable_idc=2 (skip cross-slice edges)."""
    rng = np.random.default_rng(7)
    pic = random_pic(rng, 6, 5)
    pic.slice_id[:15] = 0
    pic.slice_id[15:] = 1
    H, W = 80, 96
    Y = rng.integers(0, 256, (H, W), np.uint8)
    U = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    V = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    sp = slice_params(pic, disable=2, a_off=2, b_off=-2)

    Yh, Uh, Vh = Y.copy(), U.copy(), V.copy()
    deblock_picture(Yh, Uh, Vh, pic, 6, 5, pic.qp, sp, force_numpy=True)
    Yd, Ud, Vd = deblock_picture_jax(Y.copy(), U.copy(), V.copy(), pic,
                                     6, 5, pic.qp, sp)
    assert np.array_equal(Yh, Yd)
    assert np.array_equal(Uh, Ud)
    assert np.array_equal(Vh, Vd)


def test_compute_bs_jax_matches_host():
    rng = np.random.default_rng(9)
    pic = random_pic(rng, 7, 4, multi_ref=True, t8_frac=0.3)
    bs_v, bs_h = compute_bs(pic, 7, 4)
    dv, dh = compute_bs_jax(
        pic.mb_class, pic.luma_nnz, pic.transform8x8.astype(np.int32),
        pic.mv, pic.mv_l1, pic.ref_pic_id, pic.ref_pic_id_l1, 7, 4)
    assert np.array_equal(bs_v, np.asarray(dv))
    assert np.array_equal(bs_h, np.asarray(dh))
