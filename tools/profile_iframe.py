"""Split the bench wall time: wavefront I-frame vs steady-state P frames
(axon-safe scalar-fetch timing)."""

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

    frames = bench.make_sequence()
    cfg = EncoderConfig(width=bench.W, height=bench.H, qp=bench.QP,
                        pipeline="device", device_rd=True)
    warm = Encoder(cfg)
    warm.encode_stream(frames[:3])

    enc = Encoder(cfg)
    t0 = time.time()
    enc.encode_frame(*frames[0])          # I frame, classic path
    t_i = time.time() - t0
    t0 = time.time()
    enc.encode_stream(frames[1:])         # 16 P frames, pipelined
    t_p = time.time() - t0
    print(f"I-frame: {1000 * t_i:.0f} ms; 16 P frames: {t_p:.2f} s = "
          f"{1000 * t_p / 16:.0f} ms/frame; "
          f"17-frame fps = {17 / (t_i + t_p):.3f}", flush=True)


if __name__ == "__main__":
    main()
