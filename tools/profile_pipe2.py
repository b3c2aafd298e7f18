"""Interleaved-timeline profile of the pipelined 1080p encode.

Mimics Encoder.encode_stream's dispatch/finalize interleaving exactly and
wall-times each host-visible phase, to answer: in steady state, what does
the finalize device_get wait on, and do H2D uploads overlap device
compute on the axon tunnel?

Phases per frame:
  t_put      device_put of the next frame (should be ~0 if async)
  t_dispatch host time to enqueue the 6 device programs (async?)
  t_small    device_get of the small flags dict of the PREVIOUS frame
  t_words    device_get of the full words buffer
Extra probes:
  t_get_idle  fetch of an already-complete tiny buffer with an EMPTY queue
  t_get_busy  fetch of an already-complete tiny buffer while the queue
              holds a full frame program (does the fetch jump the queue?)
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
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from jm_tpu.common.tables import chroma_qp
    from jm_tpu.encoder.encoder import (Encoder, EncoderConfig, lambda_me,
                                        lambda_mode4)
    from jm_tpu.ops import cavlc_jax as CJX
    from jm_tpu.ops import enc_jax as EJ
    from jm_tpu.ops.deblock_pallas import deblock_auto

    W, H = bench.W, bench.H
    QP = bench.QP
    frames = bench.make_sequence()
    cfg = EncoderConfig(width=W, height=H, qp=QP, pipeline="device",
                        device_rd=True)
    enc = Encoder(cfg)
    mb_w, mb_h = enc.mb_w, enc.mb_h
    n = mb_w * mb_h
    qpc = chroma_qp(QP, enc.pps.chroma_qp_index_offset)
    qpc_cb = np.array([chroma_qp(q, enc.pps.cb_qp_offset)
                       for q in range(52)], np.int32)
    qpc_cr = np.array([chroma_qp(q, enc.pps.cr_qp_offset)
                       for q in range(52)], np.int32)
    qp_arr = jax.device_put(np.full(n, QP, np.int32))
    zeros = jax.device_put(np.zeros(n, np.int32))
    d_cb = jax.device_put(qpc_cb)
    d_cr = jax.device_put(qpc_cr)
    max_words = max(4096, n * 3) + 64

    def sync(x):
        leaf = [l for l in jax.tree_util.tree_leaves(x)
                if hasattr(l, "ravel")][0]
        return np.asarray(leaf.ravel()[0])

    def dispatch(dY, dU, dV, state):
        core = EJ.p_frame_step(dY, dU, dV, state[0], state[1], state[2],
                               QP, qpc, lambda_me(QP), lambda_mode4(QP),
                               mb_w=mb_w, mb_h=mb_h, sr=cfg.search_range,
                               rd=True)
        bs = EJ.p_frame_bs(core["luma_nnz"], core["mv4"],
                           mb_w=mb_w, mb_h=mb_h)
        deb = deblock_auto(core["recY"], core["recU"], core["recV"],
                           bs[0], bs[1], qp_arr, zeros, zeros, zeros,
                           zeros, zeros, d_cb, d_cr,
                           mb_w=mb_w, mb_h=mb_h)
        nstate = EJ.prep_ref(*deb)
        skip = CJX.skip_field(core["inter_mode"], core["cbp"],
                              core["mv4"], mb_w, mb_h)
        packed = CJX.pack_p_slice(
            skip, core["inter_mode"], core["mv4"], core["cbp"],
            core["luma_scan"], core["luma_nnz"], core["chroma_dc"],
            core["chroma_scan"], core["chroma_nnz"],
            mb_w=mb_w, mb_h=mb_h, max_words=max_words)
        small = {"intra_any": core["intra_mask"].any(),
                 "ovf": packed["ovf"], "nbits": packed["nbits"]}
        return {"small": small, "words": packed["words"]}, nstate

    # warm-up (compile everything incl. the new pack shape)
    Y0, U0, V0 = (np.asarray(p, np.uint8) for p in frames[0])
    d0 = (jax.device_put(Y0), jax.device_put(U0), jax.device_put(V0))
    state = EJ.prep_ref(*d0)
    out, nstate = dispatch(*d0, state)
    sync(out["words"]); sync(nstate)

    tiny = jax.device_put(np.zeros(8, np.int32))
    sync(tiny)
    t0 = time.time(); sync(tiny); t_get_idle = time.time() - t0

    # steady-state interleaved loop
    T: dict = {}
    state = nstate
    pending = None
    for i in range(1, 6):
        Y, U, V = (np.asarray(p, np.uint8) for p in frames[i])
        t0 = time.time()
        dY = (jax.device_put(Y), jax.device_put(U), jax.device_put(V))
        T.setdefault("put", []).append(time.time() - t0)

        t0 = time.time()
        out, nstate = dispatch(*dY, state)
        T.setdefault("dispatch", []).append(time.time() - t0)

        if i == 2:
            # probe: fetch an old complete tiny buffer while the queue
            # holds the just-dispatched frame
            t0 = time.time(); sync(tiny)
            T["get_busy"] = [time.time() - t0]

        if pending is not None:
            t0 = time.time()
            small = jax.device_get(pending["small"])
            T.setdefault("small", []).append(time.time() - t0)
            t0 = time.time()
            words = np.asarray(pending["words"])
            T.setdefault("words", []).append(time.time() - t0)
        pending = out
        state = nstate
    t0 = time.time()
    jax.device_get(pending["small"])
    np.asarray(pending["words"])
    t_last = time.time() - t0

    res = {"t_get_idle_ms": round(1000 * t_get_idle, 1),
           "t_last_fin_ms": round(1000 * t_last, 1)}
    for k, v in T.items():
        res[k + "_ms"] = [round(1000 * x, 1) for x in v]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
