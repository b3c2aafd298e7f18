"""Benchmark: device encode-core throughput at 1080p vs JM lencod.

Workload: full-search ME (±16, 1 ref) + MC + 4x4 transform/quant/dequant/
inverse/recon over all 8160 MBs of a 1080p frame — the compute core that
dominates JM encode time (SURVEY.md §3.3: ME ≈60-80%). Entropy coding and
mode decision run elsewhere this round (host), so the metric is the
device encode-core rate, compared against the measured total frames/s of
the reference lencod on the same content/settings on this machine's CPU.

Methodology: the TPU is reached through a high-latency tunnel (~100 ms
RTT per dispatch+readback), so the frame loop runs ON DEVICE via
lax.scan — one dispatch executes N_REP frames and returns one checksum;
per-frame time is (total - RTT) / N_REP. Every output (mv/sad/recon)
feeds the checksum so nothing is dead-code-eliminated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

# Measured on this host: JM lencod 19.0, encoder_baseline.cfg adjusted to
# 1920x1088, SearchRange=16, NumberReferenceFrames=1, RDOptimization=0:
# 3 frames in 51.9 s => 0.058 fps (.refbuild/run/bench1080.log).
JM_LENCOD_1080P_FPS = 0.058
TUNNEL_RTT_S = 0.107   # measured: trivial dispatch+readback round trip

PAD = 32
SR = 16
QP = 28
W, H = 1920, 1088
MB_W, MB_H = W // 16, H // 16
N_MBS = MB_W * MB_H
CHUNK = 1020  # 8160 / 8
N_REP = 32
N_VARIANTS = 4


def make_content():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H + 32, W + 32), dtype=np.uint8)
    ref = base[8:8 + H, 8:8 + W]
    cur = base[13:13 + H, 5:5 + W]
    return cur, np.pad(ref, PAD, mode="edge")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from jm_tpu.ops.me_jax import encode_step

    cur, ref_pad = make_content()
    mbs = cur.reshape(MB_H, 16, MB_W, 16).transpose(0, 2, 1, 3).reshape(N_MBS, 16, 16)
    xy = np.stack([(np.arange(N_MBS) % MB_W) * 16 + PAD,
                   (np.arange(N_MBS) // MB_W) * 16 + PAD], axis=1).astype(np.int32)
    variants = np.stack([(mbs.astype(np.int32) + k) % 256
                         for k in range(N_VARIANTS)]).astype(np.uint8)

    @functools.partial(jax.jit, static_argnames=("n_rep",))
    def many_frames(vars_, ref_p, xy_, n_rep):
        def body(carry, i):
            v = vars_[i % N_VARIANTS]
            acc = jnp.int32(0)
            for c in range(0, N_MBS, CHUNK):
                out = encode_step(v[c:c + CHUNK], ref_p, xy_[c:c + CHUNK],
                                  sr=SR, qp=QP)
                acc = (acc + out["sad"].sum() + out["mv"].sum()
                       + out["recon"].astype(jnp.int32).sum())
            return carry + acc + i, None
        tot, _ = lax.scan(body, jnp.int32(0), jnp.arange(n_rep))
        return tot

    d_v = jax.device_put(jnp.asarray(variants))
    d_r = jax.device_put(jnp.asarray(ref_pad))
    d_x = jax.device_put(jnp.asarray(xy))

    int(many_frames(d_v, d_r, d_x, n_rep=N_REP))   # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(many_frames(d_v, d_r, d_x, n_rep=N_REP))
        times.append(time.perf_counter() - t0)
    per_frame = (min(times) - TUNNEL_RTT_S) / N_REP
    fps = 1.0 / per_frame
    print(json.dumps({
        "metric": "1080p enc-core frames/s (full-search ME±16 + 4x4 T/Q/recon, device)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / JM_LENCOD_1080P_FPS, 1),
    }))


if __name__ == "__main__":
    main()
