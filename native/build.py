"""Build jm_native in-place into jm_tpu/native/.

Usage: python native/build.py   (or imported by jm_tpu.native on demand)
"""

from __future__ import annotations

import subprocess
import sysconfig
from pathlib import Path

HERE = Path(__file__).resolve().parent
OUT_DIR = HERE.parent / "jm_tpu" / "native"


def build() -> Path:
    OUT_DIR.mkdir(exist_ok=True)
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    out = OUT_DIR / f"jm_native{suffix}"
    srcs = [HERE / "jm_native.cpp", HERE / "jm_enc.cpp", HERE / "jm_dec.cpp"]
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime
                            for s in srcs):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", *map(str, srcs), "-o", str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build())
