"""Substage profile of the device CAVLC slice pack at 1080p: times
block_slots (luma/dc/ac), fold_slots, header path, skip/nc fields and
assemble as separate jitted programs. Scalar-fetch sync; ~rtt_ms per
stage is transport round trip.

Usage: python tools/profile_pack.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from jm_tpu.common.tables import chroma_qp
    from jm_tpu.encoder.encoder import (Encoder, EncoderConfig, lambda_me,
                                        lambda_mode4)
    from jm_tpu.ops import cavlc_jax as CJ
    from jm_tpu.ops import enc_jax as EJ

    W, H = bench.W, bench.H
    QP = bench.QP
    frames = bench.make_sequence()
    cfg = EncoderConfig(width=W, height=H, qp=QP, pipeline="device",
                        device_rd=True)
    enc = Encoder(cfg)
    mb_w, mb_h = enc.mb_w, enc.mb_h
    n = mb_w * mb_h
    qpc = chroma_qp(QP, enc.pps.chroma_qp_index_offset)

    def sync(x):
        leaf = [l for l in jax.tree_util.tree_leaves(x)
                if hasattr(l, "ravel")][0]
        return np.asarray(leaf.ravel()[0])

    tiny = jax.device_put(np.zeros(8, np.int32))
    sync(tiny)
    t0 = time.time()
    for _ in range(5):
        sync(tiny)
    rtt = (time.time() - t0) / 5

    Y0, U0, V0 = (np.asarray(p, np.uint8) for p in frames[0])
    state = EJ.prep_ref(jax.device_put(Y0), jax.device_put(U0),
                        jax.device_put(V0))
    Y1, U1, V1 = (jax.device_put(np.asarray(p, np.uint8))
                  for p in frames[1])
    core = EJ.p_frame_step(Y1, U1, V1, *state, QP, qpc, lambda_me(QP),
                           lambda_mode4(QP), mb_w=mb_w, mb_h=mb_h,
                           sr=cfg.search_range, rd=True)
    sync(core)

    out = {"rtt_ms": round(rtt * 1000, 1)}

    def t(name, fn, *args):
        r = fn(*args)
        sync(r)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = fn(*args)
            sync(r)
            best = min(best, time.time() - t0)
        out[name + "_ms"] = round(1000 * best, 1)
        return r

    luma = core["luma_scan"].astype(jnp.int32)
    nnz = core["luma_nnz"]
    cdc = core["chroma_dc"].astype(jnp.int32)
    cac = core["chroma_scan"].astype(jnp.int32)
    cnnz = core["chroma_nnz"]
    mv4 = core["mv4"]
    im = core["inter_mode"]
    cbp = core["cbp"]

    t("skip_field", jax.jit(
        lambda im, cbp, mv4: CJ.skip_field(im, cbp, mv4, mb_w, mb_h)),
      im, cbp, mv4)
    t("mv_pred_parts", jax.jit(
        lambda mv4, im: CJ.mv_pred_parts(mv4, im, mb_w, mb_h)), mv4, im)
    ncl = t("nc_luma", jax.jit(
        lambda nnz: CJ.nc_luma_field(nnz, mb_w, mb_h)), nnz)

    bs_l = t("block_slots_luma", jax.jit(
        lambda luma, ncl: CJ.block_slots(
            luma.reshape(n * 16, 16), ncl.reshape(n * 16), 16)),
        luma, ncl)
    t("fold_luma", jax.jit(
        lambda v, l: CJ.fold_slots(v, l, CJ.BLOCK_WORDS)),
      bs_l[0], bs_l[1])
    bs_a = t("block_slots_ac", jax.jit(
        lambda cac, cnnz: CJ.block_slots(
            cac.reshape(n * 8, 16)[:, 1:],
            CJ.nc_chroma_field(cnnz, mb_w, mb_h).reshape(n * 8), 15)),
        cac, cnnz)
    t("fold_ac", jax.jit(
        lambda v, l: CJ.fold_slots(v, l, CJ.BLOCK_WORDS)),
      bs_a[0], bs_a[1])
    bs_d = t("block_slots_dc", jax.jit(
        lambda cdc: CJ.block_slots(
            cdc.reshape(n * 2, 4), jnp.full(n * 2, -1, jnp.int32), 4)),
        cdc)

    max_words = max(4096, n * 2) + 64
    skip = CJ.skip_field(im, cbp, mv4, mb_w, mb_h)

    @jax.jit
    def full(skip, im, mv4, cbp, luma, nnz, cdc, cac, cnnz):
        return CJ.pack_p_slice(skip, im, mv4, cbp, luma, nnz, cdc,
                               cac, cnnz, mb_w=mb_w, mb_h=mb_h,
                               max_words=max_words)

    t("pack_whole", full, skip, im, mv4, cbp, luma, nnz, cdc, cac, cnnz)
    print(json.dumps(out))



def assemble_only():
    """python tools/profile_pack.py assemble — time assemble() alone."""
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jm_tpu.ops import cavlc_jax as CJ
    n = 8160
    P = n * 27 + 1
    rng = np.random.default_rng(0)
    lens = rng.integers(0, 40, P).astype(np.int32)
    lens[rng.random(P) < 0.5] = 0
    words = rng.integers(0, 2**31, (P, CJ.BLOCK_WORDS)).astype(np.uint32)
    dW = jax.device_put(words)
    dL = jax.device_put(lens)
    max_words = max(4096, n * 2) + 64

    f = jax.jit(lambda w, l: CJ.assemble(w, l, max_words, k_overlap=16))
    r = f(dW, dL)
    np.asarray(r[1])
    import time as T
    best = 1e9
    for _ in range(3):
        t0 = T.time()
        r = f(dW, dL)
        np.asarray(r[1])
        best = min(best, T.time() - t0)
    print(json.dumps({"assemble_ms": round(1000 * best, 1)}))


if len(sys.argv) > 1 and sys.argv[1] == "assemble":
    main = assemble_only


if __name__ == "__main__":
    main()
