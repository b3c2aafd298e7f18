"""Pallas wavefront deblock kernels (ops/deblock_pallas.py) must be
bit-exact against the XLA scan twin (ops/deblock_jax.py) — itself tested
against the host reference filter. Runs in interpreter mode on the CPU
test mesh; the TPU device pipeline exercises the compiled kernels."""

import numpy as np
import pytest

from jm_tpu.common.tables import chroma_qp
from jm_tpu.ops.deblock_jax import compute_bs_jax, deblock_jax
from jm_tpu.ops.deblock_pallas import deblock_pallas

from test_deblock_jax import random_pic, slice_params


def _run_both(pic, mb_w, mb_h, sp, seed):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed + 100)
    H, W = 16 * mb_h, 16 * mb_w
    Y = rng.integers(0, 256, (H, W), np.uint8)
    U = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    V = rng.integers(0, 256, (H // 2, W // 2), np.uint8)
    bs_v, bs_h = compute_bs_jax(
        jnp.asarray(pic.mb_class), jnp.asarray(pic.luma_nnz),
        jnp.asarray(pic.transform8x8.astype(np.int32)),
        jnp.asarray(pic.mv), jnp.asarray(pic.mv_l1),
        jnp.asarray(pic.ref_pic_id), jnp.asarray(pic.ref_pic_id_l1),
        mb_w, mb_h)
    qpc_cb = jnp.asarray([chroma_qp(q, 0) for q in range(52)], jnp.int32)
    args = (jnp.asarray(Y), jnp.asarray(U), jnp.asarray(V), bs_v, bs_h,
            jnp.asarray(pic.qp.astype(np.int32)),
            jnp.asarray(sp["disable_idc"]), jnp.asarray(sp["alpha_off"]),
            jnp.asarray(sp["beta_off"]), jnp.asarray(sp["slice_id"]),
            jnp.asarray(pic.transform8x8.astype(np.int32)),
            qpc_cb, qpc_cb)
    ref = deblock_jax(*args, mb_w=mb_w, mb_h=mb_h)
    got = deblock_pallas(*args, mb_w=mb_w, mb_h=mb_h, interpret=True)
    for r, g, name in zip(ref, got, "YUV"):
        assert np.array_equal(np.asarray(r), np.asarray(g)), name


@pytest.mark.parametrize("mb_w,mb_h,seed,kw", [
    (6, 4, 0, {}),
    (8, 5, 1, {"multi_ref": True}),
    (4, 7, 2, {"intra_frac": 1.0}),
    (5, 3, 3, {"intra_frac": 0.0}),
    (7, 6, 4, {"t8_frac": 0.5}),
    (1, 4, 5, {}),
    (6, 1, 6, {}),
])
def test_deblock_pallas_bitexact(mb_w, mb_h, seed, kw):
    rng = np.random.default_rng(seed)
    pic = random_pic(rng, mb_w, mb_h, **kw)
    _run_both(pic, mb_w, mb_h, slice_params(pic), seed)


def test_deblock_pallas_offsets_disable2():
    rng = np.random.default_rng(7)
    pic = random_pic(rng, 6, 5)
    pic.slice_id[:15] = 0
    pic.slice_id[15:] = 1
    _run_both(pic, 6, 5, slice_params(pic, disable=2, a_off=2, b_off=-2), 7)
