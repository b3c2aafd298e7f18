"""Encoder weighted-prediction estimation (E31).

Capability parity with lencod/src/weighted_prediction.c (InitWP:27,
EstimateWPPSliceAlg0:229, EstimateWPBSliceAlg0, TestWPPSliceAlg0) — the
default DC-ratio estimator: denom 5, weight = round(32 * dc_org/dc_ref)
clipped to [-128,127], offset 0 (select_offset=0), per component.
Implicit-B weights are POC-derived at decode; the encoder reuses the
decoder's WPParams (jm_tpu/decoder/wp.py) so applied prediction is
decode-exact by construction.
"""

from __future__ import annotations

import numpy as np

LUMA_DENOM = 5
CHROMA_DENOM = 5


def estimate_explicit(origY, origU, origV, refs) -> list[dict]:
    """Per-reference {luma: (w,o), chroma: ((w,o),(w,o))} tables, the
    layout the decoder's slice-header parser produces (header.py wp_l0)."""
    default = 1 << LUMA_DENOM
    dco = (float(np.asarray(origY, np.float64).sum()),
           float(np.asarray(origU, np.float64).sum()),
           float(np.asarray(origV, np.float64).sum()))
    out = []
    for f in refs:
        ws = []
        for comp, plane in enumerate((f.Y, f.U, f.V)):
            dcr = float(np.asarray(plane, np.float64).sum())
            w = default if dcr == 0.0 else int(default * dco[comp] / dcr + 0.5)
            ws.append(max(-128, min(127, w)))
        out.append({"luma": (ws[0], 0),
                    "chroma": ((ws[1], 0), (ws[2], 0))})
    return out


def estimate_lms(origY, origU, origV, refs,
                 select_offset: int = 0) -> list[dict]:
    """LMS weighted-prediction estimator (WPMethod=1; reference
    lencod/src/wp_lms.c ComputeExplicitWPParamsLMS:69): luma weight =
    round(default * sum|org-mean_org| / sum|ref-mean_ref|) with offset
    round(mean_org - w*mean_ref/default); chroma keeps the DC-ratio
    weights. select_offset=1 is the offset-only variant (default weight,
    offset = mean difference), the mode wp_mcprec.c's RD passes use."""
    default = 1 << LUMA_DENOM
    oY = np.asarray(origY, np.float64)
    mean_org = float(oY.mean())
    numer = float(np.abs(oY - mean_org).sum())
    dco = (float(oY.sum()),
           float(np.asarray(origU, np.float64).sum()),
           float(np.asarray(origV, np.float64).sum()))
    out = []
    for f in refs:
        rY = np.asarray(f.Y, np.float64)
        mean_ref = float(rY.mean())
        if select_offset:
            w = default
            o = int((dco[0] - rY.sum()) / rY.size + 0.5)
            o = max(-128, min(127, o))
        else:
            den = float(np.abs(rY - mean_ref).sum())
            w = default if den == 0.0 else int(default * numer / den + 0.5)
            w = max(-128, min(127, w))
            o = int(mean_org - w * mean_ref / default + 0.5)
            o = max(-128, min(127, o))
        cws = []
        for comp, plane in enumerate((f.U, f.V), start=1):
            dcr = float(np.asarray(plane, np.float64).sum())
            cw = default if dcr == 0.0 else \
                int(default * dco[comp] / dcr + 0.5)
            cws.append((max(-128, min(127, cw)), 0))
        out.append({"luma": (w, o), "chroma": (cws[0], cws[1])})
    return out


def estimate_mc_iter(origY, origU, origV, refs, iters: int = 2,
                     rng: int = 4) -> list[dict]:
    """Iterative motion-compensated WP estimation (WPIterMC; reference
    lencod/src/wp_mciter.c:1-874 EstimateWPPSliceAlg1/compute_offset):
    the DC ratio is re-estimated against a MOTION-COMPENSATED reference
    instead of the co-located one, iterating weight estimation and a
    16x16 integer alignment search so global motion does not corrupt
    the brightness model (the failure mode of alg0 on panning fades).
    Chroma keeps the DC-ratio weights (as the reference does)."""
    default = 1 << LUMA_DENOM
    org = np.asarray(origY, np.int32)
    H, W = org.shape
    mbh, mbw = H // 16, W // 16
    Hc, Wc = mbh * 16, mbw * 16
    orgc = org[:Hc, :Wc]
    dco = (float(org.sum()),
           float(np.asarray(origU, np.float64).sum()),
           float(np.asarray(origV, np.float64).sum()))
    out = []
    for f in refs:
        ref = np.asarray(f.Y, np.int32)
        pad = np.pad(ref[:Hc, :Wc], rng, mode="edge")
        # seed with the co-located DC ratio (EstimateWPPSliceAlg1 starts
        # from the alg0 weights before iterating)
        dcr0 = float(ref.sum())
        w = default if dcr0 == 0.0 else \
            max(-128, min(127, int(default * dco[0] / dcr0 + 0.5)))
        o = 0
        mc = ref[:Hc, :Wc]
        for _ in range(max(1, iters)):
            # 16x16 integer alignment of org against the weighted ref
            wref = np.clip((pad * w + (1 << (LUMA_DENOM - 1)))
                           >> LUMA_DENOM, 0, 1 << 14) + o
            best = np.full((mbh, mbw), 1 << 30, np.int64)
            bdy = np.zeros((mbh, mbw), np.int32)
            bdx = np.zeros((mbh, mbw), np.int32)
            for dy in range(-rng, rng + 1):
                for dx in range(-rng, rng + 1):
                    sh = wref[rng + dy:rng + dy + Hc, rng + dx:rng + dx + Wc]
                    sad = np.abs(orgc - sh).reshape(mbh, 16, mbw, 16) \
                        .sum(axis=(1, 3))
                    m = sad < best
                    best = np.where(m, sad, best)
                    bdy = np.where(m, dy, bdy)
                    bdx = np.where(m, dx, bdx)
            # motion-compensated UNWEIGHTED reference at the chosen MVs
            mc = np.empty_like(orgc)
            for by in range(mbh):
                for bx in range(mbw):
                    dy, dx = int(bdy[by, bx]), int(bdx[by, bx])
                    mc[by * 16:by * 16 + 16, bx * 16:bx * 16 + 16] = \
                        pad[rng + by * 16 + dy:rng + by * 16 + dy + 16,
                            rng + bx * 16 + dx:rng + bx * 16 + dx + 16]
            # re-estimate against the compensated reference
            dcr = float(mc.sum())
            w = default if dcr == 0.0 else \
                int(default * float(orgc.sum()) / dcr + 0.5)
            w = max(-128, min(127, w))
            o = 0
        cws = []
        for comp, plane in enumerate((f.U, f.V), start=1):
            dcr = float(np.asarray(plane, np.float64).sum())
            cw = default if dcr == 0.0 else \
                int(default * dco[comp] / dcr + 0.5)
            cws.append((max(-128, min(127, cw)), 0))
        out.append({"luma": (w, o), "chroma": (cws[0], cws[1])})
    return out


def is_nontrivial(tables: list[dict]) -> bool:
    """True when any weight departs from the default (JM's wp test gate)."""
    default = 1 << LUMA_DENOM
    for e in tables:
        if e["luma"] != (default, 0):
            return True
        if any(c != (default, 0) for c in e["chroma"]):
            return True
    return False


class _WPHeader:
    """Minimal header stand-in feeding the decoder's WPParams."""

    def __init__(self, slice_type, wp_l0, wp_l1):
        from ..common.types import SliceType
        self.slice_type = slice_type
        self.luma_log2_weight_denom = LUMA_DENOM
        self.chroma_log2_weight_denom = CHROMA_DENOM
        self.wp_l0 = wp_l0 or []
        self.wp_l1 = wp_l1 or []
        _ = SliceType  # keep import local semantics explicit


def build_wp_params(slice_type, pps, lst0, lst1, cur_poc,
                    wp_l0=None, wp_l1=None):
    """Decoder-exact WPParams for the encoder's prediction path."""
    from ..decoder.wp import WPParams
    hdr = _WPHeader(slice_type, wp_l0, wp_l1)
    wp = WPParams(hdr, pps, lst0, lst1, cur_poc)
    return wp if wp.mode else None
