"""Native (C++) runtime layer: loads jm_native, building it on first use.

Exposes `available`, and when available: `BitReader`, `CabacEngine`,
`ebsp_to_rbsp`, `rbsp_to_ebsp`. The CABAC state tables are installed
from the machine-extracted Python tables so both implementations share
one source of truth. Falls back silently (available=False) when no
compiler is present.
"""

from __future__ import annotations

available = False
BitReader = None
CabacEngine = None
ebsp_to_rbsp = None
rbsp_to_ebsp = None


def _load():
    global available, BitReader, CabacEngine, ebsp_to_rbsp, rbsp_to_ebsp
    try:
        try:
            from . import jm_native  # type: ignore
        except ImportError:
            import importlib
            import pathlib
            import sys
            sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                                   .parents[2] / "native"))
            try:
                import build as _b  # native/build.py
                _b.build()
            finally:
                sys.path.pop(0)
            importlib.invalidate_caches()
            from . import jm_native  # type: ignore
        import numpy as np

        from ..decoder import cabac_tables as CT
        jm_native.set_cabac_tables(
            np.ascontiguousarray(CT.RANGE_LPS, np.uint8),
            np.ascontiguousarray(CT.NEXT_STATE_MPS, np.uint8),
            np.ascontiguousarray(CT.NEXT_STATE_LPS, np.uint8))
        BitReader = jm_native.BitReader
        CabacEngine = jm_native.CabacEngine
        ebsp_to_rbsp = jm_native.ebsp_to_rbsp
        rbsp_to_ebsp = jm_native.rbsp_to_ebsp
        available = True
    except Exception:
        available = False


_load()
