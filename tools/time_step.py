"""Time ONE device program on the live TPU: p_frame_step(rd=True) at
1080p (the core_rd stage), plus optional pack/deblock. Fast iteration
harness for kernel work — scalar-fetch sync, min of 3.

Usage: python tools/time_step.py [core|pack|deblock|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from jm_tpu.common.tables import chroma_qp
    from jm_tpu.encoder.encoder import (Encoder, EncoderConfig, lambda_me,
                                        lambda_mode4)
    from jm_tpu.ops import cavlc_jax as CJX
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
    sync(state)
    Y1, U1, V1 = (jax.device_put(np.asarray(p, np.uint8))
                  for p in frames[1])
    sync((Y1, U1, V1))

    out = {"rtt_ms": round(rtt * 1000, 1)}

    def t(name, fn):
        r = fn()
        sync(r)
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = fn()
            sync(r)
            best = min(best, time.time() - t0)
        out[name + "_ms"] = round(1000 * best, 1)
        return r

    core = None
    if which in ("core", "all", "pack"):
        core = t("core_rd", lambda: EJ.p_frame_step(
            Y1, U1, V1, state[0], state[1], state[2], QP, qpc,
            lambda_me(QP), lambda_mode4(QP),
            mb_w=mb_w, mb_h=mb_h, sr=cfg.search_range, rd=True))
    if which in ("pack", "all"):
        max_words = max(4096, n * 2) + 64
        t("pack", lambda: CJX.pack_p_slice_full(
            core["inter_mode"], core["mv4"], core["cbp"],
            core["luma_scan"], core["luma_nnz"], core["chroma_dc"],
            core["chroma_scan"], core["chroma_nnz"],
            mb_w=mb_w, mb_h=mb_h, max_words=max_words))
    if which in ("deblock", "all"):
        from jm_tpu.ops.deblock_pallas import deblock_auto
        qpc_cb = np.array([chroma_qp(q, enc.pps.cb_qp_offset)
                           for q in range(52)], np.int32)
        qpc_cr = np.array([chroma_qp(q, enc.pps.cr_qp_offset)
                           for q in range(52)], np.int32)
        qp_arr = jax.device_put(np.full(n, QP, np.int32))
        zeros = jax.device_put(np.zeros(n, np.int32))
        bs = EJ.p_frame_bs(core["luma_nnz"], core["mv4"],
                           mb_w=mb_w, mb_h=mb_h)
        t("deblock", lambda: deblock_auto(
            core["recY"], core["recU"], core["recV"], bs[0], bs[1],
            qp_arr, zeros, zeros, zeros, zeros, zeros,
            jax.device_put(qpc_cb), jax.device_put(qpc_cr),
            mb_w=mb_w, mb_h=mb_h))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
