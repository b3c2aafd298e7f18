"""Deterministic synthetic test clips for the BD ladders and goldens.

Regenerates the gitignored scratch clips under .refbuild/run (the
originals were produced the same way; the JM anchors in bd_cif.json are
always re-run LIVE against whatever clip is on disk, so the evidence
stays matched as long as both sides read the same file):

  cif30.yuv   352x288 4:2:0, 30 frames — video-like: low-pass noise
              background with global pan, a moving textured square
              (occlusion -> real inter/intra mix), mild temporal noise.
  qcif10.yuv  176x144 4:2:0, 10 frames — same recipe, faster motion.

Usage: python tools/gen_clips.py
"""

from __future__ import annotations

import os

import numpy as np

RUN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "run")


def _smooth(a, k=9):
    ker = np.ones(k) / k
    a = np.apply_along_axis(lambda r: np.convolve(r, ker, "same"), 1, a)
    a = np.apply_along_axis(lambda c: np.convolve(c, ker, "same"), 0, a)
    return a


def make_clip(w, h, n, seed, pan=(2, 1), obj_speed=(5, 3)):
    rng = np.random.default_rng(seed)
    mx = max(abs(pan[0]), abs(obj_speed[0])) * n + 32
    my = max(abs(pan[1]), abs(obj_speed[1])) * n + 32
    base = rng.integers(0, 256, (h + my, w + mx)).astype(np.float32)
    base = np.clip(_smooth(base) * 1.8, 0, 255)
    tex = rng.integers(0, 256, (64, 64)).astype(np.float32)
    tex = np.clip(_smooth(tex, 5) * 1.8, 0, 255)
    frames = []
    for i in range(n):
        y = base[pan[1] * i:pan[1] * i + h,
                 pan[0] * i:pan[0] * i + w].copy()
        ox = (20 + obj_speed[0] * i) % (w - 64)
        oy = (30 + obj_speed[1] * i) % (h - 64)
        y[oy:oy + 64, ox:ox + 64] = tex
        y = np.clip(y + rng.normal(0, 1.2, y.shape), 0, 255)
        Y = y.astype(np.uint8)
        U = Y[::2, ::2].copy()
        V = Y[1::2, ::2].copy()
        frames.append((Y, U, V))
    return frames


def write_yuv(path, frames):
    with open(path, "wb") as f:
        for Y, U, V in frames:
            f.write(Y.tobytes())
            f.write(U.tobytes())
            f.write(V.tobytes())
    print(f"wrote {path}: {len(frames)} frames")


def main():
    os.makedirs(RUN, exist_ok=True)
    write_yuv(os.path.join(RUN, "cif30.yuv"),
              make_clip(352, 288, 30, seed=11))
    write_yuv(os.path.join(RUN, "qcif10.yuv"),
              make_clip(176, 144, 10, seed=12, pan=(3, 2),
                        obj_speed=(7, 4)))


if __name__ == "__main__":
    main()
