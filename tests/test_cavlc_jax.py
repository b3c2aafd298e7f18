"""Device CAVLC slice packing (ops/cavlc_jax.py) must produce the exact
slice RBSP of the host serializer (encoder/syntax.py MBWriter) for the
fast-path feature set: P slices, all-inter modes 0-3 (8x8 subs), ref 0,
single slice, fixed QP, 4:2:0."""

import numpy as np
import pytest

import jax.numpy as jnp

from jm_tpu.bitstream.bitwriter import BitWriter
from jm_tpu.common.types import PPS, SPS, SliceType
from jm_tpu.decoder.mb_parse import MB_INTER, PictureData
from jm_tpu.encoder.syntax import serialize_slice, write_slice_header
from jm_tpu.ops import cavlc_jax as CJ


def _sps_pps(mb_w, mb_h):
    sps = SPS()
    sps.pic_width_in_mbs_minus1 = mb_w - 1
    sps.pic_height_in_map_units_minus1 = mb_h - 1
    sps.log2_max_frame_num_minus4 = 0
    sps.log2_max_pic_order_cnt_lsb_minus4 = 4
    sps.frame_mbs_only_flag = 1
    pps = PPS()
    return sps, pps


def random_fast_pic(rng, mb_w, mb_h, qp=28, skip_frac=0.3, max_lvl=6,
                    dense=False):
    n = mb_w * mb_h
    pic = PictureData(mb_w, mb_h)
    pic.mb_class[:] = MB_INTER
    pic.qp[:] = qp
    pic.slice_id[:] = 0
    pic.ref_idx[:] = 0
    pic.ref_pic_id[:] = 7
    pic.inter_mode[:] = rng.integers(0, 4, n)
    pic.sub_mode[:] = 0
    # per-partition-consistent motion
    mv_quad = rng.integers(-40, 41, (n, 4, 2)).astype(np.int32)
    for i in range(n):
        m = pic.inter_mode[i]
        if m == 0:
            mv_quad[i, 1:] = mv_quad[i, 0]
        elif m == 1:
            mv_quad[i, 1] = mv_quad[i, 0]
            mv_quad[i, 3] = mv_quad[i, 2]
        elif m == 2:
            mv_quad[i, 2] = mv_quad[i, 0]
            mv_quad[i, 3] = mv_quad[i, 1]
    blk_quad = np.array([(b // 8) * 2 + ((b % 4) // 2) for b in range(16)])
    pic.mv[:] = mv_quad[:, blk_quad]

    density = 0.7 if dense else 0.25
    coef = rng.integers(-max_lvl, max_lvl + 1, (n, 16, 16)).astype(np.int32)
    coef *= rng.random((n, 16, 16)) < density
    cdc = rng.integers(-max_lvl, max_lvl + 1, (n, 2, 4)).astype(np.int32)
    cdc *= rng.random((n, 2, 4)) < density
    cac = rng.integers(-max_lvl, max_lvl + 1, (n, 2, 4, 16)).astype(np.int32)
    cac *= rng.random((n, 2, 4, 16)) < density
    cac[..., 0] = 0                      # AC blocks: coeffs 1..15 only

    # make some MBs skip (mode 0, no residual, mv arbitrary-but-consistent)
    skip = rng.random(n) < skip_frac
    coef[skip] = 0
    cdc[skip] = 0
    cac[skip] = 0
    pic.inter_mode[skip] = 0
    pic.mv[skip] = pic.mv[skip][:, :1]

    pic.luma_coef[:] = coef
    pic.luma_nnz[:] = (coef != 0).sum(axis=2)
    pic.chroma_dc[:] = cdc
    pic.chroma_coef[:] = cac
    pic.chroma_nnz[:] = (cac != 0).sum(axis=3)
    cbp_l = 0
    quad_nnz = pic.luma_nnz.reshape(n, 2, 2, 2, 2).sum(axis=(2, 4))
    cbp_l = ((quad_nnz.reshape(n, 4) > 0)
             * (1 << np.arange(4))).sum(axis=1)
    has_ac = pic.chroma_nnz.sum(axis=(1, 2)) > 0
    has_dc = (cdc != 0).any(axis=(1, 2))
    cbp_c = np.where(has_ac, 2, np.where(has_dc, 1, 0))
    pic.cbp[:] = cbp_l | (cbp_c << 4)
    pic.skip[:] = skip & (pic.cbp == 0)
    # skip requires cbp 0; ensure flagged MBs really are
    pic.skip[:] &= pic.inter_mode == 0
    return pic


def _device_payload(pic, sps, pps, qp, mb_w, mb_h):
    n = mb_w * mb_h
    out = CJ.pack_p_slice(
        jnp.asarray(pic.skip.astype(bool)),
        jnp.asarray(pic.inter_mode.astype(np.int32)),
        jnp.asarray(pic.mv.astype(np.int32)),
        jnp.asarray(pic.cbp.astype(np.int32)),
        jnp.asarray(pic.luma_coef.astype(np.int32)),
        jnp.asarray(pic.luma_nnz.astype(np.int32)),
        jnp.asarray(pic.chroma_dc.astype(np.int32)),
        jnp.asarray(pic.chroma_coef.astype(np.int32)),
        jnp.asarray(pic.chroma_nnz.astype(np.int32)),
        mb_w=mb_w, mb_h=mb_h, max_words=n * 220 + 64)
    assert not bool(out["ovf"])
    nbits = int(out["nbits"])
    words = np.asarray(out["words"][:(nbits + 31) // 32])
    bw = BitWriter()
    write_slice_header(bw, sps, pps, slice_type=SliceType.P, frame_num=1,
                       idr=False, qp=qp, first_mb=0, poc_lsb=2,
                       num_ref_idx_l0=1)
    bw.append_bitstream(words.astype(">u4").tobytes(), nbits)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


@pytest.mark.parametrize("mb_w,mb_h,seed,kw", [
    (6, 4, 0, {}),
    (8, 5, 1, {"skip_frac": 0.0, "dense": True}),
    (5, 3, 2, {"skip_frac": 0.8}),
    (4, 4, 3, {"max_lvl": 2}),
    (1, 3, 4, {}),
    (7, 1, 5, {}),
    (6, 6, 6, {"max_lvl": 30, "dense": True}),
])
def test_pack_p_slice_bitexact(mb_w, mb_h, seed, kw):
    rng = np.random.default_rng(seed)
    pic = random_fast_pic(rng, mb_w, mb_h, **kw)
    sps, pps = _sps_pps(mb_w, mb_h)
    qp = 28
    host = serialize_slice(pic, sps, pps, slice_type=SliceType.P,
                           frame_num=1, idr=False, qp=qp, poc_lsb=2,
                           num_ref_idx_l0=1)
    dev = _device_payload(pic, sps, pps, qp, mb_w, mb_h)
    assert host == dev


@pytest.mark.parametrize("mb_w,mb_h,seed", [(6, 4, 0), (1, 5, 1),
                                            (7, 1, 2), (9, 7, 3)])
def test_skip_field_matches_host(mb_w, mb_h, seed):
    """Device P_Skip derivation == encoder._derive_skip_fast."""
    rng = np.random.default_rng(seed)
    pic = random_fast_pic(rng, mb_w, mb_h, skip_frac=0.0)
    # sprinkle zero-mv zero-cbp MBs so real skips appear
    z = rng.random(pic.n_mbs) < 0.4
    pic.mv[z] = 0
    pic.luma_coef[z] = 0
    pic.luma_nnz[z] = 0
    pic.chroma_dc[z] = 0
    pic.chroma_coef[z] = 0
    pic.chroma_nnz[z] = 0
    pic.cbp[z] = 0
    pic.inter_mode[z] = 0

    class _Shim:
        pass
    shim = _Shim()
    shim.mb_w, shim.mb_h = mb_w, mb_h
    from jm_tpu.encoder.encoder import Encoder
    Encoder._derive_skip_fast(shim, pic)
    dev = np.asarray(CJ.skip_field(
        jnp.asarray(pic.inter_mode.astype(np.int32)),
        jnp.asarray(pic.cbp.astype(np.int32)),
        jnp.asarray(pic.mv.astype(np.int32)), mb_w, mb_h))
    assert np.array_equal(pic.skip.astype(bool), dev)


def test_pack_overflow_flag():
    """Giant levels must raise the ovf flag (host fallback trigger)."""
    rng = np.random.default_rng(9)
    pic = random_fast_pic(rng, 4, 3, skip_frac=0.0)
    pic.luma_coef[0, 0, :4] = [9000, 5, 4, 3]
    pic.luma_nnz[0, 0] = 4
    pic.cbp[0] |= 1
    n = 12
    out = CJ.pack_p_slice(
        jnp.asarray(pic.skip.astype(bool)),
        jnp.asarray(pic.inter_mode.astype(np.int32)),
        jnp.asarray(pic.mv.astype(np.int32)),
        jnp.asarray(pic.cbp.astype(np.int32)),
        jnp.asarray(pic.luma_coef.astype(np.int32)),
        jnp.asarray(pic.luma_nnz.astype(np.int32)),
        jnp.asarray(pic.chroma_dc.astype(np.int32)),
        jnp.asarray(pic.chroma_coef.astype(np.int32)),
        jnp.asarray(pic.chroma_nnz.astype(np.int32)),
        mb_w=4, mb_h=3, max_words=n * 40 + 64)
    assert bool(out["ovf"])
