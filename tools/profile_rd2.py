"""Finer split of the device-RD tail (`rd_full` minus the luma/chroma
trials of tools/profile_rd.py): times skip trials, exact predictors
(mv_pred_parts), the CAVLC length parts, and luma_quad_tq in isolation.

Usage: python tools/profile_rd2.py
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
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig, lambda_me
    from jm_tpu.ops import enc_jax as EJ
    from jm_tpu.ops import enc_rd as RD
    from jm_tpu.ops.cavlc_jax import mv_pred_parts, skip_mv_field

    W, H = bench.W, bench.H
    QP = bench.QP
    frames = bench.make_sequence()
    cfg = EncoderConfig(width=W, height=H, qp=QP, pipeline="device",
                        device_rd=True)
    enc = Encoder(cfg)
    mb_w, mb_h = enc.mb_w, enc.mb_h
    n = mb_w * mb_h
    sr = cfg.search_range
    qpc = chroma_qp(QP, enc.pps.chroma_qp_index_offset)
    lam = lambda_me(QP)

    def sync(x):
        leaf = [l for l in jax.tree_util.tree_leaves(x)
                if hasattr(l, "ravel")][0]
        return np.asarray(leaf.ravel()[0])

    Y0, U0, V0 = (np.asarray(p, np.uint8) for p in frames[0])
    state = EJ.prep_ref(jax.device_put(Y0), jax.device_put(U0),
                        jax.device_put(V0))
    sync(state)
    Y1, U1, V1 = (jax.device_put(np.asarray(p, np.uint8))
                  for p in frames[1])
    sync((Y1, U1, V1))
    mb_xy = jax.device_put(np.stack(
        [(np.arange(n) % mb_w) * 16, (np.arange(n) // mb_w) * 16],
        axis=1).astype(np.int32))

    @jax.jit
    def stage0(Y, U, V, planes, padU, padV):
        orig_mbs = Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3) \
            .reshape(n, 16, 16)
        orig_q = orig_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
            .reshape(n, 4, 8, 8).astype(jnp.int16)
        band = EJ.build_band(planes, mb_w, sr)
        cband = EJ.build_cband(padU, padV, mb_w, sr)
        int_mv, _ = EJ.me_int_sweep(Y, planes[0], mb_w, mb_h, sr, lam)
        pred = EJ.approx_pred_field(int_mv[:, 0], mb_w, mb_h)
        mv_q, cost_q, win = EJ.qpel_refine_dense(band, orig_q, int_mv,
                                                 pred, lam, mb_xy, sr)
        orig_u = U.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3) \
            .reshape(n, 8, 8)
        orig_v = V.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3) \
            .reshape(n, 8, 8)
        return (orig_mbs, orig_q, orig_u, orig_v, band, cband, int_mv,
                pred, mv_q, cost_q, win)

    (orig_mbs, orig_q, orig_u, orig_v, band, cband, int_mv, pred, mv_q,
     cost_q, win) = stage0(Y1, U1, V1, *state)
    sync(mv_q)

    timings = {}

    def t(name, fn, *args):
        r = fn(*args)
        sync(r)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = fn(*args)
            sync(r)
            best = min(best, time.time() - t0)
        timings[name + "_ms"] = round(1000 * best, 1)
        return r

    # luma trial pieces
    @jax.jit
    def f_pred_blocks(win, mv_q, int_mv):
        return EJ.qjob_pred_blocks(win, mv_q, int_mv)

    blk_pred = t("qjob_pred_blocks", f_pred_blocks, win, mv_q, int_mv)

    @jax.jit
    def f_tq(orig_q, blk_pred):
        oq = orig_q[:, jnp.asarray(EJ.QJ_QUAD)].astype(jnp.int32)
        return RD.luma_quad_tq(oq.reshape(n * 16, 8, 8),
                               blk_pred.reshape(n * 16, 8, 8), QP)

    tq = t("luma_quad_tq", f_tq, orig_q, blk_pred)
    scan4 = tq[0].reshape(n, 16, 4, 16)

    @jax.jit
    def f_len(scan4):
        return RD.block_len_parts(scan4.reshape(n * 16 * 4, 16), 16)

    t("block_len_parts", f_len, scan4)

    # skip trial (one hypothesis)
    @jax.jit
    def f_skip(band, cband, pred, orig_q, orig_u, orig_v):
        s4 = jnp.broadcast_to(pred[:, None, :], (n, 4, 2))
        p16 = EJ.mc_luma_quads_band(band, s4, mb_xy, sr)
        o16 = orig_q.astype(jnp.int32).reshape(n, 2, 2, 8, 8) \
            .transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)
        ssd_l = ((o16 - p16) ** 2).sum(axis=(1, 2))
        pu, pv = EJ.mc_chroma_quads_band(cband, s4, mb_xy, sr)
        ssd_c = (((orig_u.astype(jnp.int32) - pu) ** 2).sum(axis=(1, 2))
                 + ((orig_v.astype(jnp.int32) - pv) ** 2).sum(axis=(1, 2)))
        return ssd_l + ssd_c

    t("skip_trial_one", f_skip, band, cband, pred, orig_q, orig_u, orig_v)

    # exact predictors
    blk_quad = jnp.asarray([(b // 8) * 2 + ((b % 4) // 2)
                            for b in range(16)])

    @jax.jit
    def f_pred_parts(mv_q):
        mv4 = mv_q[:, jnp.asarray([0, 0, 0, 0])][:, :, :][:, 0][:, None, :]
        mv4 = jnp.broadcast_to(mv4, (n, 16, 2))
        mode = jnp.zeros(n, jnp.int32)
        return mv_pred_parts(mv4, mode, mb_w, mb_h, all_modes=True)

    t("mv_pred_parts", f_pred_parts, mv_q)

    @jax.jit
    def f_skip_field(mv_q):
        mv4 = jnp.broadcast_to(mv_q[:, 0][:, None, :], (n, 16, 2))
        return skip_mv_field(mv4, mb_w, mb_h)

    t("skip_mv_field", f_skip_field, mv_q)

    # chroma trial single mode
    @jax.jit
    def f_chroma_one(cband, mv_q, orig_u, orig_v):
        mvq_m = mv_q[:, jnp.asarray([int(EJ.QJ_PARENT[int(k)])
                                     for k in RD.QJOB_OF[0]])]
        return RD._chroma_trial(cband, mvq_m, mb_xy, orig_u, orig_v,
                                qpc, sr)

    t("chroma_trial_one", f_chroma_one, cband, mv_q, orig_u, orig_v)

    print(json.dumps(timings))


if __name__ == "__main__":
    main()
