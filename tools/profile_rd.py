"""Substage profile of the device RD P-frame core (the 1080p ~300 ms
`core_rd` stage of tools/profile_pipe.py): times each internal stage of
enc_jax._p_frame_core(rd=True) as its own jitted program with
scalar-fetch completion barriers (the only reliable sync on the axon
tunnel; each stage includes one ~27 ms round trip, reported as rtt_ms).

Stage boundaries mirror _p_frame_core + enc_rd.p_mode_rd_device:
  band build -> integer sweep -> qpel dense refine -> md_low tail
  (mode/skip/i16) -> RD luma trials -> RD chroma trials -> RD decide
  + gather.

Usage: python tools/profile_rd.py
"""

from __future__ import annotations

import functools
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
    from jm_tpu.ops import enc_jax as EJ
    from jm_tpu.ops import enc_rd as RD

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
    lam4 = lambda_mode4(QP)

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
    sync(state)
    Y1, U1, V1 = (jax.device_put(np.asarray(p, np.uint8))
                  for p in frames[1])
    sync((Y1, U1, V1))

    mb_xy = np.stack([(np.arange(n) % mb_w) * 16,
                      (np.arange(n) // mb_w) * 16], axis=1).astype(np.int32)
    mb_xy = jax.device_put(mb_xy)

    # --- stage programs ----------------------------------------------------
    @jax.jit
    def st_prep(Y, U, V, planes, padU, padV):
        orig_mbs = Y.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3) \
            .reshape(n, 16, 16)
        orig_q = orig_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
            .reshape(n, 4, 8, 8).astype(jnp.int16)
        band = EJ.build_band(planes, mb_w, sr)
        cband = EJ.build_cband(padU, padV, mb_w, sr)
        orig_u = U.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3) \
            .reshape(n, 8, 8)
        orig_v = V.reshape(mb_h, 8, mb_w, 8).transpose(0, 2, 1, 3) \
            .reshape(n, 8, 8)
        return orig_mbs, orig_q, orig_u, orig_v, band, cband

    @jax.jit
    def st_int_sweep(Y, planes):
        return EJ.me_int_sweep(Y, planes[0], mb_w, mb_h, sr, lam)

    @jax.jit
    def st_qpel(band, orig_q, int_mv):
        pred = EJ.approx_pred_field(int_mv[:, 0], mb_w, mb_h)
        mv_q, cost_q, win = EJ.qpel_refine_dense(band, orig_q, int_mv,
                                                 pred, lam, mb_xy, sr)
        return pred, mv_q, cost_q, win

    @jax.jit
    def st_mdlow_tail(Y, band, orig_q, cost_q, pred):
        mode_costs = jnp.stack(
            [cost_q[:, list(jobs)].sum(axis=1) + lam * int(EJ.MODE_BITS[m])
             for m, jobs in enumerate(EJ.MODE_JOBS)], axis=1)
        cost_inter = jnp.min(mode_costs, axis=1)
        cost_skip = EJ.skip_cost_band(band, pred, mb_xy, orig_q, sr)
        cost_inter = jnp.minimum(cost_inter, cost_skip)
        cost_i16 = EJ.i16_source_cost(Y, mb_w, mb_h)
        return cost_i16 + 2 * lam4 < cost_inter

    # RD substages (split p_mode_rd_device at its section comments)
    @jax.jit
    def st_rd_luma(win, mv_q, int_mv, orig_q):
        blk_pred = EJ.qjob_pred_blocks(win, mv_q, int_mv)
        oq = orig_q[:, jnp.asarray(EJ.QJ_QUAD)].astype(jnp.int32)
        scan4, costq, nnz4, ssd_c, ssd_z, rec8 = RD.luma_quad_tq(
            oq.reshape(n * 16, 8, 8), blk_pred.reshape(n * 16, 8, 8), QP)
        tc_b, t1_b, rest_b = RD.block_len_parts(
            scan4.reshape(n * 16 * 4, 16), 16)
        return scan4, costq, nnz4, ssd_c, ssd_z, rec8, tc_b, t1_b, rest_b

    @jax.jit
    def st_rd_chroma(cband, mv_q, orig_u, orig_v):
        outs = []
        for m in range(4):
            mvq_m = mv_q[:, jnp.asarray([int(EJ.QJ_PARENT[int(k)])
                                         for k in RD.QJOB_OF[m]])]
            outs.append(RD._chroma_trial(cband, mvq_m, mb_xy, orig_u,
                                         orig_v, qpc, sr))
        return outs

    @jax.jit
    def st_rd_full(band, cband, win, mv_q, int_mv, pred, orig_q,
                   orig_u, orig_v):
        return RD.p_mode_rd_device(band, cband, win, mv_q, int_mv, pred,
                                   orig_q, orig_u, orig_v, mb_xy, QP, qpc,
                                   mb_w=mb_w, mb_h=mb_h, sr=sr)

    timings: dict = {}

    def run(timings):
        def t(name, fn):
            t0 = time.time()
            r = fn()
            sync(r)
            timings.setdefault(name, []).append(time.time() - t0)
            return r

        prep = t("prep_bands", lambda: st_prep(Y1, U1, V1, *state))
        orig_mbs, orig_q, orig_u, orig_v, band, cband = prep
        int_mv, _ = t("int_sweep", lambda: st_int_sweep(Y1, state[0]))
        pred, mv_q, cost_q, win = t("qpel_dense",
                                    lambda: st_qpel(band, orig_q, int_mv))
        t("mdlow_tail", lambda: st_mdlow_tail(Y1, band, orig_q, cost_q,
                                              pred))
        t("rd_luma_trials", lambda: st_rd_luma(win, mv_q, int_mv, orig_q))
        t("rd_chroma_trials", lambda: st_rd_chroma(cband, mv_q, orig_u,
                                                   orig_v))
        t("rd_full", lambda: st_rd_full(band, cband, win, mv_q, int_mv,
                                        pred, orig_q, orig_u, orig_v))

    run({})   # compile pass
    for _ in range(3):
        run(timings)

    out = {"rtt_ms": round(rtt * 1000, 1)}
    for k, v in timings.items():
        out[k + "_ms"] = round(1000 * min(v), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
