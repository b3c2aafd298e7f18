"""Micro-benchmarks of ME/SATD kernel variants on the live TPU.

Compares integer-exact formulation candidates for the two hottest
device-RD substages (tools/profile_rd.py):
  - SATD: int32 einsum (current) vs f32 einsum (MXU 3-pass) vs i16
    butterfly adds;
  - integer-sweep inner step: f32 abs-diff (current) vs i16.
Prints one JSON line of per-variant ms (min of 3, scalar-fetch sync).
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
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jm_tpu.ops import enc_jax as EJ

    def sync(x):
        leaf = [l for l in jax.tree_util.tree_leaves(x)
                if hasattr(l, "ravel")][0]
        return np.asarray(leaf.ravel()[0])

    def timeit(name, fn, *args):
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

    out = {}
    rng = np.random.default_rng(0)

    # ---- SATD grid: 49 positions x 130560 qjob blocks -------------------
    NQ = 130560
    win = jax.device_put(
        rng.integers(0, 255, (NQ, 4, 10, 10)).astype(np.int16))
    oq = jax.device_put(rng.integers(0, 255, (NQ, 8, 8)).astype(np.int32))
    H4 = jnp.asarray(EJ._H4)

    def satd_grid_int(win, oq):
        acc = []
        for ty in range(1, 8):
            for tx in range(1, 8):
                blk = EJ._qpel_block_at(win, tx, ty)
                acc.append(EJ._satd8_raw(oq - blk))
        return jnp.stack(acc, -1)

    def _satd8_f32(diff):
        d = diff.reshape(*diff.shape[:-2], 2, 4, 2, 4).swapaxes(-3, -2) \
            .astype(jnp.float32)
        Hf = H4.astype(jnp.float32)
        t = jnp.einsum("ij,...jk,lk->...il", Hf, d, Hf,
                       preferred_element_type=jnp.float32)
        return jnp.abs(t).sum(axis=(-4, -3, -2, -1)).astype(jnp.int32)

    def satd_grid_f32(win, oq):
        acc = []
        for ty in range(1, 8):
            for tx in range(1, 8):
                blk = EJ._qpel_block_at(win, tx, ty)
                acc.append(_satd8_f32(oq - blk))
        return jnp.stack(acc, -1)

    def _satd8_bfly(diff):
        # butterflies on the 4x4 tiles: 2 passes of adds, i32
        d = diff.reshape(*diff.shape[:-2], 2, 4, 2, 4).swapaxes(-3, -2)
        d0, d1, d2, d3 = d[..., 0, :], d[..., 1, :], d[..., 2, :], d[..., 3, :]
        p0, p1, m0, m1 = d0 + d3, d1 + d2, d0 - d3, d1 - d2
        a = jnp.stack([p0 + p1, m0 + m1, p0 - p1, m0 - m1], axis=-2)
        e0, e1, e2, e3 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        q0, q1, n0, n1 = e0 + e3, e1 + e2, e0 - e3, e1 - e2
        b = jnp.stack([q0 + q1, n0 + n1, q0 - q1, n0 - n1], axis=-1)
        return jnp.abs(b).sum(axis=(-4, -3, -2, -1))

    def satd_grid_bfly(win, oq):
        acc = []
        for ty in range(1, 8):
            for tx in range(1, 8):
                blk = EJ._qpel_block_at(win, tx, ty)
                acc.append(_satd8_bfly(oq - blk))
        return jnp.stack(acc, -1)

    g_int = timeit("satd49_int32", jax.jit(satd_grid_int), win, oq)
    g_f32 = timeit("satd49_f32", jax.jit(satd_grid_f32), win, oq)
    g_bf = timeit("satd49_bfly", jax.jit(satd_grid_bfly), win, oq)
    out["satd_f32_exact"] = bool(np.array_equal(np.asarray(g_int),
                                                np.asarray(g_f32)))
    out["satd_bfly_exact"] = bool(np.array_equal(np.asarray(g_int),
                                                 np.asarray(g_bf)))

    # ---- integer sweep step: 33 dy x 33 dx over 1080p -------------------
    H, W = 1088, 1920
    sr = 16
    side = 2 * sr + 1
    o8 = jax.device_put(rng.integers(0, 255, (H, W)).astype(np.uint8))
    reg8 = jax.device_put(
        rng.integers(0, 255, (H + 2 * sr, W + 2 * sr)).astype(np.uint8))
    mb_w, mb_h = W // 16, H // 16
    n = mb_w * mb_h
    qmask = jnp.asarray(EJ.QMASK, jnp.float32)

    def sweep_f32(o8, reg8):
        o = o8.astype(jnp.float32)
        region = reg8.astype(jnp.float32)

        def step(carry, dy):
            best = carry
            row = lax.dynamic_slice(region, (dy, 0), (H, W + 2 * sr))
            for dx in range(side):
                d = jnp.abs(o - row[:, dx:dx + W])
                d2 = d.reshape(H, W // 8, 8).sum(-1)
                q8 = (d2[0::8] + d2[1::8] + d2[2::8] + d2[3::8]
                      + d2[4::8] + d2[5::8] + d2[6::8] + d2[7::8])
                sad_q = q8.reshape(mb_h, 2, mb_w, 2).transpose(0, 2, 1, 3) \
                    .reshape(n, 4)
                cost = (sad_q @ qmask).astype(jnp.int32) + dx
                best = jnp.minimum(best, cost)
            return best, None

        init = jnp.full((n, 9), 2**30, jnp.int32)
        best, _ = lax.scan(step, init, jnp.arange(side, dtype=jnp.int32))
        return best

    def sweep_i16(o8, reg8):
        o = o8.astype(jnp.int16)

        def step(carry, dy):
            best = carry
            row = lax.dynamic_slice(reg8, (dy, 0), (H, W + 2 * sr)) \
                .astype(jnp.int16)
            for dx in range(side):
                d = jnp.abs(o - row[:, dx:dx + W])
                d2 = d.reshape(H, W // 8, 8).sum(-1)          # <= 2040 i16
                q4 = (d2[0::8] + d2[1::8] + d2[2::8] + d2[3::8]) \
                    .astype(jnp.int32)
                q5 = (d2[4::8] + d2[5::8] + d2[6::8] + d2[7::8]) \
                    .astype(jnp.int32)
                q8 = q4 + q5
                sad_q = q8.reshape(mb_h, 2, mb_w, 2).transpose(0, 2, 1, 3) \
                    .reshape(n, 4).astype(jnp.float32)
                cost = (sad_q @ qmask).astype(jnp.int32) + dx
                best = jnp.minimum(best, cost)
            return best, None

        init = jnp.full((n, 9), 2**30, jnp.int32)
        best, _ = lax.scan(step, init, jnp.arange(side, dtype=jnp.int32))
        return best

    s_f = timeit("sweep_f32", jax.jit(sweep_f32), o8, reg8)
    s_i = timeit("sweep_i16", jax.jit(sweep_i16), o8, reg8)
    out["sweep_exact"] = bool(np.array_equal(np.asarray(s_f),
                                             np.asarray(s_i)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
