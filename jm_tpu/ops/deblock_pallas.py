"""Pallas TPU in-loop deblocking filter — bit-exact twin of
ops/deblock_jax.deblock_jax (spec 8.7; reference ldecod/src/
loop_filter_normal.c, lencod/src/loopFilter.c).

Why a kernel: the XLA lax.scan wavefront costs ~0.65 ms per wave in
per-op dispatch overhead (254 waves at 1080p = ~167 ms). Here the whole
sheared frame lives in VMEM and the wavefront runs as an in-kernel
fori_loop of pure vector instructions — same 2:1 MB diagonal dependency
structure (the one the reference itself proves with its OpenMP build,
lencod/src/loopFilter.c:112), no per-wave dispatch cost.

Decomposition: two pallas_call's — luma and chroma — because the chroma
filter depends only on the (luma-derived) boundary strengths and its own
pixels, never on filtered luma. Each kernel walks waves w = 0..n_w-1; a
wave slab holds one sheared column S[w] = tiles {(b, w-2b)}. All
alpha/beta/tc0 table lookups are precomputed OUTSIDE the kernel (per MB,
three QP-pair cases: internal / left-MB-edge / top-MB-edge) so the kernel
body is pure elementwise math + static slices (no gathers; the only
Mosaic-special construct is a where-select line expansion).

Pixels are stored int16 (filter intermediates fit) and upcast to int32
per wave; the edge formulas are deblock_jax._luma_edge/_chroma_edge
verbatim — bit-exact by construction, asserted by
tests/test_deblock_pallas.py against the scan twin (itself tested
against the host reference filter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common.tables import ALPHA_TABLE, BETA_TABLE, TC0_TABLE
from .deblock_jax import _chroma_edge, _luma_edge, _shear, _tiles, _unshear, _untile

_ALPHA = np.asarray(ALPHA_TABLE, np.int32)
_BETA = np.asarray(BETA_TABLE, np.int32)
_TC0 = np.asarray(TC0_TABLE, np.int32)          # (3, 52)

# mask-slab channel indices (see _prep)
M_VALID, M_LCOM, M_TCOM, M_EN0V, M_ENV13, M_EN0H, M_ENH13, M_MBON = range(8)
# param-slab channels per case: alpha, beta, tc0[bs=1], tc0[2], tc0[3]
# cases: 0 = internal edge, 1 = left MB edge, 2 = top MB edge


def _edge_params(qp_p, qp_q, ao, bo, table_a, table_b, table_tc):
    """alpha/beta/tc0x3 for a QP pair (vectors), spec 8.7.2.1."""
    qav = (qp_p + qp_q + 1) >> 1
    ia = jnp.clip(qav + 2 * ao, 0, 51)
    ib = jnp.clip(qav + 2 * bo, 0, 51)
    return jnp.stack([table_a[ia], table_b[ib],
                      table_tc[0][ia], table_tc[1][ia], table_tc[2][ia]],
                     axis=-1)


def _neighbor(v2d, axis):
    """left (axis=1) / top (axis=0) neighbor with self-fill at border."""
    if axis == 1:
        return jnp.concatenate([v2d[:, :1], v2d[:, :-1]], axis=1)
    return jnp.concatenate([v2d[:1], v2d[:-1]], axis=0)


def _prep(qp, disable, a_off, b_off, slice_id, transform8x8,
          qpc_cb, qpc_cr, mb_w: int, mb_h: int, n_w: int):
    """Per-MB masks + per-case filter params, sheared to (n_w, mb_h, ...).

    Returns (masks (n_w, mb_h, 8) i16,
             luma params (n_w, mb_h, 3, 5) i16,
             chroma params (n_w, mb_h, 2, 3, 5) i16)."""
    qp2 = qp.astype(jnp.int32).reshape(mb_h, mb_w)
    dis = disable.astype(jnp.int32).reshape(mb_h, mb_w)
    ao = a_off.astype(jnp.int32).reshape(mb_h, mb_w)
    bo = b_off.astype(jnp.int32).reshape(mb_h, mb_w)
    sid = slice_id.astype(jnp.int32).reshape(mb_h, mb_w)
    t8 = transform8x8.astype(jnp.int32).reshape(mb_h, mb_w)

    has_left = np.zeros((mb_h, mb_w), bool)
    has_left[:, 1:] = True
    has_top = np.zeros((mb_h, mb_w), bool)
    has_top[1:] = True
    qp_l = _neighbor(qp2, 1)
    qp_t = _neighbor(qp2, 0)
    sid_l = _neighbor(sid, 1)
    sid_t = _neighbor(sid, 0)

    mbon = dis != 1
    leftok = jnp.asarray(has_left) & ~((dis == 2) & (sid_l != sid))
    topok = jnp.asarray(has_top) & ~((dis == 2) & (sid_t != sid))
    masks = jnp.stack([
        jnp.ones((mb_h, mb_w), jnp.int32),       # VALID
        jnp.asarray(has_left, jnp.int32),        # LCOM
        jnp.asarray(has_top, jnp.int32),         # TCOM
        (mbon & leftok).astype(jnp.int32),       # EN0V
        (mbon & (t8 == 0)).astype(jnp.int32),    # ENV13
        (mbon & topok).astype(jnp.int32),        # EN0H
        (mbon & (t8 == 0)).astype(jnp.int32),    # ENH13
        mbon.astype(jnp.int32),                  # MBON
    ], axis=-1)

    ta = jnp.asarray(_ALPHA)
    tb = jnp.asarray(_BETA)
    ttc = jnp.asarray(_TC0)
    pl_int = _edge_params(qp2, qp2, ao, bo, ta, tb, ttc)
    pl_left = _edge_params(qp_l, qp2, ao, bo, ta, tb, ttc)
    pl_top = _edge_params(qp_t, qp2, ao, bo, ta, tb, ttc)
    pluma = jnp.stack([pl_int, pl_left, pl_top], axis=-2)   # (mh, mw, 3, 5)

    pc = []
    for ctab in (qpc_cb, qpc_cr):
        cq = ctab[jnp.clip(qp2, 0, 51)]
        cq_l = ctab[jnp.clip(qp_l, 0, 51)]
        cq_t = ctab[jnp.clip(qp_t, 0, 51)]
        pc.append(jnp.stack([
            _edge_params(cq, cq, ao, bo, ta, tb, ttc),
            _edge_params(cq_l, cq, ao, bo, ta, tb, ttc),
            _edge_params(cq_t, cq, ao, bo, ta, tb, ttc)], axis=-2))
    pchroma = jnp.stack(pc, axis=-3)                # (mh, mw, 2, 3, 5)

    def sh(x):
        return _shear(x, mb_w, mb_h, n_w).swapaxes(0, 1)

    return (sh(masks).astype(jnp.int16),
            sh(pluma).astype(jnp.int16),
            sh(pchroma).astype(jnp.int16))


def _luma_edge_core(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0,
                    enable):
    """deblock_jax._luma_edge on separate component vectors (tuple
    in/out — no stack/concat on packed axes). Returns
    (rp2, rp1, rp0, rq0, rq1, rq2)."""
    fflag = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
             & (jnp.abs(q1 - q0) < beta) & (bs > 0) & enable)
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1,
                        -tc0, tc0)
    nq1 = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1,
                        -tc0, tc0)
    np1 = jnp.where(ap, np1, p1)
    nq1 = jnp.where(aq, nq1, q1)
    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp0 = jnp.where(strong & ap,
                    (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(strong & ap, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(strong & ap,
                    (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(strong & aq,
                    (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(strong & aq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(strong & aq,
                    (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    is4 = bs == 4
    rp0 = jnp.where(is4, sp0, np0)
    rp1 = jnp.where(is4, sp1, np1)
    rp2 = jnp.where(is4, sp2, p2)
    rq0 = jnp.where(is4, sq0, nq0)
    rq1 = jnp.where(is4, sq1, nq1)
    rq2 = jnp.where(is4, sq2, q2)
    return (jnp.where(fflag, rp2, p2), jnp.where(fflag, rp1, p1),
            jnp.where(fflag, rp0, p0), jnp.where(fflag, rq0, q0),
            jnp.where(fflag, rq1, q1), jnp.where(fflag, rq2, q2))


def _chroma_edge_core(p1, p0, q0, q1, bs, alpha, beta, tc0, enable):
    fflag = ((jnp.abs(p0 - q0) < alpha) & (jnp.abs(p1 - p0) < beta)
             & (jnp.abs(q1 - q0) < beta) & (bs > 0) & enable)
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    rp0 = jnp.where(fflag, jnp.where(is4, sp0, np0), p0)
    rq0 = jnp.where(fflag, jnp.where(is4, sq0, nq0), q0)
    return rp0, rq0


def _rep_lines(bs4, k: int):
    """(mh, E) -> (mh, E*k) repeating each column k times via a
    where-select against a line-group iota (Mosaic-safe: no lane-axis
    reshape/concat)."""
    mh, E = bs4.shape
    g = jax.lax.broadcasted_iota(jnp.int32, (mh, E * k), 1) // k
    r = jnp.zeros((mh, E * k), bs4.dtype)
    for i in range(E):
        r = jnp.where(g == i, bs4[:, i:i + 1], r)
    return r


def _tc0_of(par, bs_line):
    """Select tc0 per filter line from a case param row.
    par: (mb_h, 5); bs_line: (mb_h, L). Returns tc0 (mb_h, L)."""
    t1 = par[:, 2:3]
    t2 = par[:, 3:4]
    t3 = par[:, 4:5]
    return jnp.where(bs_line >= 3, t3, jnp.where(bs_line == 2, t2, t1))


def _luma_kernel(sbsv_ref, sbsh_ref, m_ref, p_ref, sy_in, sy_ref, *,
                 n_w: int):
    """In-place wavefront luma deblock over the sheared frame.
    sy_ref: (n_w, mb_h, 16, 16) i16 output aliased onto the sy_in input
    buffer (all reads/writes go through sy_ref);
    sbsv/sbsh: (n_w, mb_h, 4, 4) i16; m_ref: (n_w, mb_h, 8) i16;
    p_ref: (n_w, mb_h, 3, 5) i16."""
    del sy_in                     # same buffer as sy_ref (aliased)

    def wave(w, _):
        wm1 = jnp.maximum(w - 1, 0)
        wm2 = jnp.maximum(w - 2, 0)
        cur = sy_ref[w].astype(jnp.int32)                 # (mh, 16, 16)
        left4 = sy_ref[wm1, :, :, 12:16].astype(jnp.int32)
        masks = m_ref[w].astype(jnp.int32)                # (mh, 8)
        par = p_ref[w].astype(jnp.int32)                  # (mh, 3, 5)
        bsv = sbsv_ref[w].astype(jnp.int32)               # (mh, 4r, 4e)
        bsh = sbsh_ref[w].astype(jnp.int32)               # (mh, 4e, 4c)

        valid = masks[:, M_VALID] > 0
        en0v = masks[:, M_EN0V] > 0
        env13 = masks[:, M_ENV13] > 0
        en0h = masks[:, M_EN0H] > 0
        enh13 = masks[:, M_ENH13] > 0
        mbon = masks[:, M_MBON] > 0
        lcom = (masks[:, M_LCOM] > 0) & valid
        tcom = (masks[:, M_TCOM] > 0) & valid

        # ---- vertical edges (lane-axis slab ops) ----------------------
        wk = jnp.concatenate([left4, cur], axis=2)        # (mh, 16, 20)
        for ex in range(4):
            en = en0v if ex == 0 else (env13 if ex in (1, 3) else mbon)
            case = par[:, 1] if ex == 0 else par[:, 0]     # (mh, 5)
            bs_line = _rep_lines(bsv[:, :, ex], 4)         # (mh, 16)
            al = case[:, 0:1]
            be = case[:, 1:2]
            tc0 = _tc0_of(case, bs_line)
            x = 4 * ex + 4
            cols = wk[:, :, x - 4:x + 4]
            out = _luma_edge(cols, bs_line, al, be, tc0, en[:, None])
            parts = ([wk[:, :, :x - 4]] if x > 4 else []) + [out] + \
                ([wk[:, :, x + 4:]] if x + 4 < 20 else [])
            wk = jnp.concatenate(parts, axis=2) if len(parts) > 1 else out
        # left fringe commit (full-slab RMW: minor-axis stack, then one
        # scalar-index store — Mosaic rejects mid-axis scalar stores)
        lm = lcom[:, None, None]
        lslab = sy_ref[wm1].astype(jnp.int32)
        lnew = jnp.where(lm, wk[:, :, 1:4], lslab[:, :, 13:16])
        lcols = [lslab[:, :, c] for c in range(13)] + \
            [lnew[:, :, i] for i in range(3)]
        sy_ref[wm1] = jnp.stack(lcols, axis=-1).astype(jnp.int16)
        cur = wk[:, :, 4:20]

        # ---- horizontal edges (per-row vectors; no sublane concats) ---
        t4 = sy_ref[wm2, :, 12:16, :].astype(jnp.int32)   # (mh, 4, 16)
        rows = {}
        for i in range(4):
            v = t4[:, i, :]
            rows[i - 4] = jnp.concatenate([v[:1], v[:-1]], axis=0)
        for ri in range(16):
            rows[ri] = cur[:, ri, :]
        for ey in range(4):
            en = en0h if ey == 0 else (enh13 if ey in (1, 3) else mbon)
            case = par[:, 2] if ey == 0 else par[:, 0]
            bs_line = _rep_lines(bsh[:, ey, :], 4)
            al = case[:, 0:1]
            be = case[:, 1:2]
            tc0 = _tc0_of(case, bs_line)
            y = 4 * ey
            r = _luma_edge_core(
                rows[y - 4], rows[y - 3], rows[y - 2], rows[y - 1],
                rows[y], rows[y + 1], rows[y + 2], rows[y + 3],
                bs_line, al, be, tc0, en[:, None])
            (rows[y - 3], rows[y - 2], rows[y - 1],
             rows[y], rows[y + 1], rows[y + 2]) = r

        # ---- commits --------------------------------------------------
        vm = valid[:, None, None]
        cur = jnp.stack([rows[ri] for ri in range(16)], axis=1)
        sy_ref[w] = jnp.where(vm, cur, sy_ref[w].astype(jnp.int32)) \
            .astype(jnp.int16)
        # top fringe: rows 13:16 of tile (b-1, w-2) -> shift lanes up;
        # committed as one full-slab RMW store
        tm = tcom[:, None]
        tm_sh = jnp.concatenate([tm[1:], jnp.zeros_like(tm[:1])], axis=0)
        tslab = sy_ref[wm2].astype(jnp.int32)
        trows = [tslab[:, r, :] for r in range(13)]
        for i in range(3):
            v = rows[i - 3]
            v_sh = jnp.concatenate([v[1:], v[-1:]], axis=0)
            trows.append(jnp.where(tm_sh, v_sh, tslab[:, 13 + i, :]))
        sy_ref[wm2] = jnp.stack(trows, axis=1).astype(jnp.int16)
        return 0

    lax.fori_loop(0, n_w, wave, 0)


def _chroma_kernel(sbsv_ref, sbsh_ref, m_ref, p_ref, su_in, sv_in,
                   su_ref, sv_ref, *, n_w: int):
    """In-place wavefront chroma (4:2:0) deblock. su/sv outputs aliased
    onto the inputs; p_ref: (n_w, mb_h, 2, 3, 5) i16."""
    del su_in, sv_in              # same buffers as su_ref/sv_ref

    def wave(w, _):
        wm1 = jnp.maximum(w - 1, 0)
        wm2 = jnp.maximum(w - 2, 0)
        masks = m_ref[w].astype(jnp.int32)
        par = p_ref[w].astype(jnp.int32)                  # (mh, 2, 3, 5)
        bsv = sbsv_ref[w].astype(jnp.int32)
        bsh = sbsh_ref[w].astype(jnp.int32)
        valid = masks[:, M_VALID] > 0
        en0v = masks[:, M_EN0V] > 0
        en0h = masks[:, M_EN0H] > 0
        mbon = masks[:, M_MBON] > 0
        lcom = (masks[:, M_LCOM] > 0) & valid
        tcom = (masks[:, M_TCOM] > 0) & valid
        vm = valid[:, None, None]
        lm = lcom[:, None, None]
        tm = tcom[:, None]
        tm_sh = jnp.concatenate([tm[1:], jnp.zeros_like(tm[:1])], axis=0)

        for comp, ref in ((0, su_ref), (1, sv_ref)):
            cur = ref[w].astype(jnp.int32)                # (mh, 8, 8)
            left2 = ref[wm1, :, :, 4:8].astype(jnp.int32)

            wk = jnp.concatenate([left2, cur], axis=2)    # (mh, 8, 12)
            for ex in (0, 2):
                en = en0v if ex == 0 else mbon
                case = par[:, comp, 1] if ex == 0 else par[:, comp, 0]
                bs_line = _rep_lines(bsv[:, :, ex], 2)             # (mh, 8)
                tc0 = _tc0_of(case, bs_line)
                cx = 2 * ex + 4
                cols = wk[:, :, cx - 2:cx + 2]
                out = _chroma_edge(cols, bs_line, case[:, 0:1],
                                   case[:, 1:2], tc0, en[:, None])
                parts = ([wk[:, :, :cx - 2]] if cx > 2 else []) + [out] + \
                    ([wk[:, :, cx + 2:]] if cx + 2 < 12 else [])
                wk = jnp.concatenate(parts, axis=2)
            lslab = ref[wm1].astype(jnp.int32)
            lnew = jnp.where(lm, wk[:, :, 1:4], lslab[:, :, 5:8])
            lcols = [lslab[:, :, c] for c in range(5)] + \
                [lnew[:, :, i] for i in range(3)]
            ref[wm1] = jnp.stack(lcols, axis=-1).astype(jnp.int16)
            cur = wk[:, :, 4:12]

            # horizontal edges: per-row vectors
            t2 = ref[wm2, :, 4:8, :].astype(jnp.int32)    # (mh, 4, 8)
            rows = {}
            for i in range(4):
                v = t2[:, i, :]
                rows[i - 4] = jnp.concatenate([v[:1], v[:-1]], axis=0)
            for ri in range(8):
                rows[ri] = cur[:, ri, :]
            for ey in (0, 2):
                en = en0h if ey == 0 else mbon
                case = par[:, comp, 2] if ey == 0 else par[:, comp, 0]
                bs_line = _rep_lines(bsh[:, ey, :], 2)
                tc0 = _tc0_of(case, bs_line)
                cy = 2 * ey
                rp0, rq0 = _chroma_edge_core(
                    rows[cy - 2], rows[cy - 1], rows[cy], rows[cy + 1],
                    bs_line, case[:, 0:1], case[:, 1:2], tc0,
                    en[:, None])
                rows[cy - 1], rows[cy] = rp0, rq0

            cur = jnp.stack([rows[ri] for ri in range(8)], axis=1)
            ref[w] = jnp.where(vm, cur, ref[w].astype(jnp.int32)) \
                .astype(jnp.int16)
            v = rows[-1]
            v_sh = jnp.concatenate([v[1:], v[-1:]], axis=0)
            tslab = ref[wm2].astype(jnp.int32)
            trows = [tslab[:, r, :] for r in range(7)]
            trows.append(jnp.where(tm_sh, v_sh, tslab[:, 7, :]))
            ref[wm2] = jnp.stack(trows, axis=1).astype(jnp.int16)
        return 0

    lax.fori_loop(0, n_w, wave, 0)


@functools.partial(jax.jit,
                   static_argnames=("mb_w", "mb_h", "interpret"))
def deblock_pallas(Y, U, V, bs_v, bs_h, qp, disable, a_off, b_off,
                   slice_id, transform8x8, qpc_cb, qpc_cr, *,
                   mb_w: int, mb_h: int, interpret: bool = False):
    """Drop-in replacement for deblock_jax.deblock_jax (same signature,
    same bit-exact output) running the wavefront as two Pallas kernels."""
    n_w = mb_w + 2 * (mb_h - 1) if mb_h > 1 else mb_w

    SY = _shear(_tiles(Y.astype(jnp.int16), mb_h, mb_w, 16),
                mb_w, mb_h, n_w).swapaxes(0, 1)       # (n_w, mh, 16, 16)
    SU = _shear(_tiles(U.astype(jnp.int16), mb_h, mb_w, 8),
                mb_w, mb_h, n_w).swapaxes(0, 1)
    SV = _shear(_tiles(V.astype(jnp.int16), mb_h, mb_w, 8),
                mb_w, mb_h, n_w).swapaxes(0, 1)
    bsv_t = bs_v.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
    bsh_t = bs_h.reshape(mb_h, 4, mb_w, 4).transpose(0, 2, 1, 3)
    SBSV = _shear(bsv_t.astype(jnp.int16), mb_w, mb_h, n_w).swapaxes(0, 1)
    SBSH = _shear(bsh_t.astype(jnp.int16), mb_w, mb_h, n_w).swapaxes(0, 1)
    masks, pluma, pchroma = _prep(qp, disable, a_off, b_off, slice_id,
                                  transform8x8, qpc_cb, qpc_cr,
                                  mb_w, mb_h, n_w)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    SY = pl.pallas_call(
        functools.partial(_luma_kernel, n_w=n_w),
        out_shape=jax.ShapeDtypeStruct(SY.shape, SY.dtype),
        in_specs=[vspec, vspec, vspec, vspec, vspec],
        out_specs=vspec,
        input_output_aliases={4: 0},
        interpret=interpret,
    )(SBSV, SBSH, masks, pluma, SY)
    SU, SV = pl.pallas_call(
        functools.partial(_chroma_kernel, n_w=n_w),
        out_shape=(jax.ShapeDtypeStruct(SU.shape, SU.dtype),
                   jax.ShapeDtypeStruct(SV.shape, SV.dtype)),
        in_specs=[vspec, vspec, vspec, vspec, vspec, vspec],
        out_specs=(vspec, vspec),
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(SBSV, SBSH, masks, pchroma, SU, SV)

    Yf = _untile(_unshear(SY.swapaxes(0, 1), mb_w, mb_h), mb_h, mb_w, 16)
    Uf = _untile(_unshear(SU.swapaxes(0, 1), mb_w, mb_h), mb_h, mb_w, 8)
    Vf = _untile(_unshear(SV.swapaxes(0, 1), mb_w, mb_h), mb_h, mb_w, 8)
    return (Yf.astype(jnp.uint8), Uf.astype(jnp.uint8),
            Vf.astype(jnp.uint8))


# VMEM budget gate: sheared luma int16 + chroma + slabs must fit.
def _fits_vmem(mb_w: int, mb_h: int) -> bool:
    n_w = mb_w + 2 * (mb_h - 1) if mb_h > 1 else mb_w
    luma = n_w * mb_h * 256 * 2
    slabs = n_w * mb_h * (16 + 16 + 8 + 15 + 30) * 2
    chroma = 2 * n_w * mb_h * 64 * 2
    return luma + slabs < 11 * 2 ** 20 and chroma + slabs < 11 * 2 ** 20


def deblock_auto(Y, U, V, bs_v, bs_h, qp, disable, a_off, b_off,
                 slice_id, transform8x8, qpc_cb, qpc_cr, *,
                 mb_w: int, mb_h: int):
    """deblock_jax-compatible dispatcher. The Pallas kernels are
    bit-exact in interpreter mode (tests/test_deblock_pallas.py) but the
    current Mosaic compiler rejects the wave body's mixed-offset sublane
    stacks on real TPUs, so the compiled path stays opt-in
    (JM_TPU_PALLAS_DEBLOCK=1) until the relayout gap closes; the
    8x-unrolled XLA scan (75 ms @1080p, down from 167) is the production
    TPU path meanwhile."""
    import os

    from .deblock_jax import deblock_jax
    if (os.environ.get("JM_TPU_PALLAS_DEBLOCK") == "1"
            and jax.default_backend() == "tpu"
            and _fits_vmem(mb_w, mb_h)):
        return deblock_pallas(Y, U, V, bs_v, bs_h, qp, disable, a_off,
                              b_off, slice_id, transform8x8, qpc_cb,
                              qpc_cr, mb_w=mb_w, mb_h=mb_h)
    return deblock_jax(Y, U, V, bs_v, bs_h, qp, disable, a_off, b_off,
                       slice_id, transform8x8, qpc_cb, qpc_cr,
                       mb_w=mb_w, mb_h=mb_h)
