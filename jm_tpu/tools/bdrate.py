"""Bjontegaard-delta quality harness: jm_tpu encoder vs JM lencod.

Implements the standard BD-rate / BD-PSNR measures (cubic fit of
PSNR -> log10(rate), integrated over the overlapping PSNR interval) and
a runner that encodes the same clip at a QP ladder with both encoders
under matched settings (JM's encoder_baseline.cfg parameters), making
encoder quality a single tested number (SURVEY §6 target "PSNR >= JM at
equal bitrate").

Usage:
    python -m jm_tpu.tools.bdrate [--qps 24,28,32,36] [--frames 3]
        [--jm-bin .refbuild/bin/lencod.exe] [--jm-run .refbuild/run]
        [--preset best|fast] [--json out.json]

Without a JM binary it evaluates our encoder against anchors recorded in
tools-data (tests use this path).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import tempfile

import numpy as np


def psnr_y(a: np.ndarray, b: np.ndarray) -> float:
    d = (a.astype(np.int64) - b.astype(np.int64)) ** 2
    mse = d.mean()
    return 10.0 * np.log10(255.0 * 255.0 / mse) if mse else 99.0


def bd_rate(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-rate in percent (negative = test saves rate vs anchor)."""
    la, lt = np.log10(rate_anchor), np.log10(rate_test)
    pa = np.polyfit(psnr_anchor, la, 3)
    pt = np.polyfit(psnr_test, lt, 3)
    lo = max(min(psnr_anchor), min(psnr_test))
    hi = min(max(psnr_anchor), max(psnr_test))
    ia = np.polyint(pa)
    it = np.polyint(pt)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float((10 ** (avg_t - avg_a) - 1) * 100)


def bd_psnr(rate_anchor, psnr_anchor, rate_test, psnr_test) -> float:
    """BD-PSNR in dB (positive = test better at equal rate)."""
    la, lt = np.log10(rate_anchor), np.log10(rate_test)
    pa = np.polyfit(la, psnr_anchor, 3)
    pt = np.polyfit(lt, psnr_test, 3)
    lo = max(min(la), min(lt))
    hi = min(max(la), max(lt))
    ia = np.polyint(pa)
    it = np.polyint(pt)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_t = (np.polyval(it, hi) - np.polyval(it, lo)) / (hi - lo)
    return float(avg_t - avg_a)


def read_yuv(path, w, h, n):
    raw = open(path, "rb").read()
    fs = w * h * 3 // 2
    out = []
    for i in range(min(n, len(raw) // fs)):
        b = raw[i * fs:(i + 1) * fs]
        out.append((np.frombuffer(b[:w * h], np.uint8).reshape(h, w),
                    np.frombuffer(b[w * h:w * h + w * h // 4],
                                  np.uint8).reshape(h // 2, w // 2),
                    np.frombuffer(b[w * h + w * h // 4:],
                                  np.uint8).reshape(h // 2, w // 2)))
    return out


PRESETS = {
    # our best settings: encoder_baseline.cfg search params + RDOQ
    "best": dict(num_ref=5, search_range=32, rdo=1, sub8x8=True, rdoq=1),
    # md_low single-ref (the device-pipeline configuration)
    "fast": dict(num_ref=1, search_range=16, rdo=0, pipeline="device"),
    # the shipping device config: md_high trial-encode RD on device
    # (enc_rd.py) — the one benchmarked in bench.py
    "fast_rd": dict(num_ref=1, search_range=16, rdo=0,
                    pipeline="device", device_rd=True),
}


def run_ours(frames, w, h, qp, preset: str):
    from ..encoder.encoder import Encoder, EncoderConfig
    cfg = EncoderConfig(width=w, height=h, qp=qp, **PRESETS[preset])
    enc = Encoder(cfg)
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    bs += enc.flush()
    recs = sorted(enc.results, key=lambda r: r["disp"])
    p = np.mean([psnr_y(f[0], r["frame"].Y)
                 for f, r in zip(frames, recs)])
    return len(bs) * 8, float(p)


def run_jm(yuv_path, frames, w, h, qp, jm_bin, jm_run):
    with tempfile.TemporaryDirectory() as td:
        out264 = os.path.join(td, "jm.264")
        rec = os.path.join(td, "jm_rec.yuv")
        cmd = [os.path.abspath(jm_bin), "-d", "encoder_baseline.cfg",
               "-p", f"InputFile={os.path.abspath(yuv_path)}",
               "-p", f"SourceWidth={w}", "-p", f"SourceHeight={h}",
               "-p", f"FramesToBeEncoded={len(frames)}",
               "-p", f"QPISlice={qp}", "-p", f"QPPSlice={qp}",
               "-p", f"OutputFile={out264}", "-p", f"ReconFile={rec}"]
        subprocess.run(cmd, cwd=jm_run, check=True,
                       stdout=subprocess.DEVNULL)
        bits = os.path.getsize(out264) * 8
        recf = read_yuv(rec, w, h, len(frames))
        p = np.mean([psnr_y(f[0], r[0]) for f, r in zip(frames, recf)])
    return bits, float(p)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/bin/foreman_part_qcif.yuv")
    ap.add_argument("--size", default="176x144")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--qps", default="24,28,32,36")
    ap.add_argument("--jm-bin", default=".refbuild/bin/lencod.exe")
    ap.add_argument("--jm-run", default=".refbuild/run")
    ap.add_argument("--preset", default="best", choices=sorted(PRESETS))
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    qps = [int(q) for q in args.qps.split(",")]
    frames = read_yuv(args.input, w, h, args.frames)

    ours, jm = [], []
    for qp in qps:
        ob, op = run_ours(frames, w, h, qp, args.preset)
        jb, jp = run_jm(args.input, frames, w, h, qp, args.jm_bin,
                        args.jm_run)
        ours.append((ob, op))
        jm.append((jb, jp))
        print(f"QP{qp}: ours {ob:7d} bits {op:6.3f} dB | "
              f"JM {jb:7d} bits {jp:6.3f} dB")
    bdr = bd_rate([b for b, _ in jm], [p for _, p in jm],
                  [b for b, _ in ours], [p for _, p in ours])
    bdp = bd_psnr([b for b, _ in jm], [p for _, p in jm],
                  [b for b, _ in ours], [p for _, p in ours])
    print(f"BD-rate vs JM (preset={args.preset}): {bdr:+.2f}%  "
          f"BD-PSNR: {bdp:+.3f} dB")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"qps": qps, "ours": ours, "jm": jm,
                       "bd_rate_pct": bdr, "bd_psnr_db": bdp,
                       "preset": args.preset}, f, indent=1)


if __name__ == "__main__":
    main()
