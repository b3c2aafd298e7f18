"""Honest per-stage profile of the pipelined 1080p P-frame encode path.

On the axon TPU tunnel `block_until_ready` does not block (dispatch-only),
so every stage is timed by fetching a scalar derived from its result —
the only reliable completion barrier on this transport. Each fetch costs
one ~20 ms round trip; that constant is reported separately (`rtt_ms`)
so stage times can be read net of it.

Stages mirror Encoder.encode_stream's `dispatch` exactly (encoder.py):
upload -> p_frame_step(rd) -> p_frame_bs -> deblock -> prep_ref ->
skip_field+pack -> download(words) -> host serialize.

Usage:  python tools/profile_pipe.py            (full profile)
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
    max_words = max(4096, n * 2) + 64    # production budget (encoder.py)

    def sync(x):
        """Completion barrier: fetch one scalar derived from x."""
        leaf = [l for l in jax.tree_util.tree_leaves(x)
                if hasattr(l, "ravel")][0]
        return np.asarray(leaf.ravel()[0])

    # measure the raw sync round trip on a tiny resident array
    tiny = jax.device_put(np.zeros(8, np.int32))
    sync(tiny)
    t0 = time.time()
    for _ in range(5):
        sync(tiny)
    rtt = (time.time() - t0) / 5

    # -- warm-up: run the composed path once end to end (all programs
    # compile or hit the persistent cache)
    Y0, U0, V0 = (np.asarray(p, np.uint8) for p in frames[0])
    state = EJ.prep_ref(jax.device_put(Y0), jax.device_put(U0),
                        jax.device_put(V0))
    sync(state)

    def run_stages(Y, U, V, state, timings):
        def t(name, fn):
            t0 = time.time()
            r = fn()
            sync(r)
            timings.setdefault(name, []).append(time.time() - t0)
            return r

        def _pack_host(Y, U, V):
            buf = np.empty((Y.shape[0] + U.shape[0], Y.shape[1]), np.uint8)
            buf[:Y.shape[0]] = Y
            buf[Y.shape[0]:, :U.shape[1]] = U
            buf[Y.shape[0]:, U.shape[1]:] = V
            return buf

        packed_in = t("upload",
                      lambda: jax.device_put(_pack_host(Y, U, V)))
        dY = (packed_in[:H], packed_in[H:, :W // 2], packed_in[H:, W // 2:])
        core = t("core_rd", lambda: EJ.p_frame_step(
            dY[0], dY[1], dY[2], state[0], state[1], state[2], QP, qpc,
            lambda_me(QP), lambda_mode4(QP),
            mb_w=mb_w, mb_h=mb_h, sr=cfg.search_range, rd=True))
        bs = t("bs", lambda: EJ.p_frame_bs(core["luma_nnz"], core["mv4"],
                                           mb_w=mb_w, mb_h=mb_h))
        deb = t("deblock", lambda: deblock_auto(
            core["recY"], core["recU"], core["recV"], bs[0], bs[1],
            qp_arr, zeros, zeros, zeros, zeros, zeros, d_cb, d_cr,
            mb_w=mb_w, mb_h=mb_h))
        nstate = t("prep_ref", lambda: EJ.prep_ref(*deb))
        packed = t("pack", lambda: CJX.pack_p_slice_full(
            core["inter_mode"], core["mv4"], core["cbp"],
            core["luma_scan"], core["luma_nnz"], core["chroma_dc"],
            core["chroma_scan"], core["chroma_nnz"],
            mb_w=mb_w, mb_h=mb_h, max_words=max_words))

        # production fetch: ONE fixed-shape leaf (flags prepended)
        import jax.numpy as jnp
        ext_dev = jnp.concatenate(
            [jnp.stack([packed["nbits"].astype(jnp.int32),
                        packed["ovf"].astype(jnp.int32),
                        jnp.int32(0)]).astype(jnp.uint32),
             packed["words"]])
        t0 = time.time()
        ext = jax.device_get(ext_dev)
        nbits = int(ext[0])
        k = (nbits + 31) // 32
        words = np.asarray(ext[3:3 + k])
        timings.setdefault("download", []).append(time.time() - t0)

        t0 = time.time()
        from jm_tpu.bitstream.bitwriter import BitWriter
        bw = BitWriter()
        bw.append_bitstream(words.astype(">u4").tobytes(), nbits)
        bw.rbsp_trailing_bits()
        timings.setdefault("host_ser", []).append(time.time() - t0)
        return nstate

    timings: dict = {}
    # first pass includes compile-cache loading; throw it away
    state = run_stages(Y0, U0, V0, state, {})
    for i in (1, 2, 3):
        Y, U, V = (np.asarray(p, np.uint8) for p in frames[i])
        state = run_stages(Y, U, V, state, timings)

    out = {"rtt_ms": round(rtt * 1000, 1)}
    total = 0.0
    for k, v in timings.items():
        ms = 1000 * min(v)       # min over frames = least noise
        out[k + "_ms"] = round(ms, 1)
        total += ms
    out["stage_sum_ms"] = round(total, 1)

    # end-to-end unsynced reference: one dispatch+finalize round, timed
    # only by its final scalar (what the pipeline actually overlaps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
