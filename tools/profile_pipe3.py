"""Timeline trace of the REAL Encoder.encode_stream on 1080p: wraps
jax.device_put / jax.device_get / Encoder._pipe_finalize with wall-clock
log lines to find where the frame time goes (the hand-rolled loop in
profile_pipe2.py runs ~2x faster than encode_stream — why?)."""

from __future__ import annotations

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
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig

    frames = bench.make_sequence()[:8]
    cfg = EncoderConfig(width=bench.W, height=bench.H, qp=bench.QP,
                        pipeline="device", device_rd=True)
    warm = Encoder(cfg)
    warm.encode_stream(frames[:3])

    T0 = time.time()

    def log(tag, dt):
        print(f"{time.time() - T0:8.3f}  {tag:18s} {1000 * dt:8.1f} ms",
              flush=True)

    real_put = jax.device_put
    real_get = jax.device_get

    def put(x, *a, **k):
        t0 = time.time()
        r = real_put(x, *a, **k)
        dt = time.time() - t0
        if dt > 0.002:
            log("device_put", dt)
        return r

    import traceback

    def get(x, *a, **k):
        t0 = time.time()
        r = real_get(x, *a, **k)
        dt = time.time() - t0
        if dt > 0.002:
            st = [f"{os.path.basename(f.filename)}:{f.lineno}"
                  for f in traceback.extract_stack(limit=6)[:-1]
                  if "jm_tpu" in f.filename or "profile" in f.filename
                  or "bench" in f.filename]
            log("device_get<" + ">".join(st[-2:]) + ">", dt)
        return r

    jax.device_put = put
    jax.device_get = get
    # encoder.py does `import jax` locally inside methods: patch the module
    # attr is enough (same module object)

    fin = Encoder._pipe_finalize

    def timed_fin(self, *a, **k):
        t0 = time.time()
        r = fin(self, *a, **k)
        log("finalize_total", time.time() - t0)
        return r

    Encoder._pipe_finalize = timed_fin

    try:
        enc = Encoder(cfg)
        t0 = time.time()
        enc.encode_stream(frames)
        dt = time.time() - t0
        print(f"total {dt:.2f}s for {len(frames)} frames = "
              f"{len(frames) / dt:.2f} fps", flush=True)
    finally:
        jax.device_put = real_put
        jax.device_get = real_get
        Encoder._pipe_finalize = fin


if __name__ == "__main__":
    main()
