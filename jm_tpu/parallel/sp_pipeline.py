"""MB-row-sharded device P-frame pipeline (shard_map over an 'sp' mesh).

The production P-frame encode step (ops/enc_jax.p_frame_step) distributed
over MB rows of one picture — SURVEY.md §2.5 "spatial/sequence parallel"
axis. Each device owns a horizontal band of mb_h/n MB rows; everything a
band's macroblocks can reference outside the band is brought in by
explicit halo exchange over the mesh ('sp' ppermute collectives):

  - reconstructed reference rows (PAD+3 = 35 rows each way) so every
    shard builds its local quarter-pel plane set bit-identically to the
    full-frame ops/enc_jax.prep_ref (6-tap conv needs 3 extra rows);
  - reconstructed chroma rows (PAD/2 = 16 rows each way);
  - the 16x16 integer-MV row above the band (the approximate MV
    predictor field reads the up/up-right neighbors, mirroring
    lcommon/src/mv_prediction.c:192's A/B/C pattern);
  - the source pixel row above the band (intra-16 decision neighbors).

Halo collection is multi-hop: when a band is shorter than the halo
(e.g. 8 shards x 1 MB row = 16 px bands vs a 35-row halo), rows are
pulled from successive neighbors with repeated ppermutes. Rows beyond
the picture edge are replaced by the picture's edge row (the same
replicated padding interp.pad_plane applies), so shard-local planes are
bit-identical to the corresponding rows of the full-frame plane set and
the sharded encode produces a byte-identical bitstream
(tests/test_multichip.py).

The reference codebase has no distributed mode at all (SURVEY §2.5: its
only concurrency is an OpenMP deblock loop, lencod/src/loopFilter.c:105);
this axis is derived from the MB dependency cone (lencod/src/mb_access.c
neighbors) rather than ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import enc_jax as EJ
from ..ops.interp import PAD

HALO = PAD          # luma rows each way a band's ME/MC may reach (>= sr+16)


def _shift_from_up(x, n: int):
    """ppermute: each shard receives x from the shard above (axis 'sp');
    shard 0 receives zeros."""
    return lax.ppermute(x, "sp", [(i, i + 1) for i in range(n - 1)])


def _shift_from_down(x, n: int):
    return lax.ppermute(x, "sp", [(i + 1, i) for i in range(n - 1)])


def _collect_top_halo(local, E: int, n: int, edge_fix: bool):
    """Rows [band_y0-E, band_y0) of the global plane, from up-neighbors.

    local: (band_h, W). Multi-hop when band_h < E. If edge_fix, rows
    above the picture are the picture's row 0 (edge replication);
    otherwise they stay zero (ppermute's missing-source fill).
    """
    band_h = local.shape[0]
    idx = lax.axis_index("sp")
    chunks = []
    cur = local
    row0 = local[0]                     # frame row 0 (valid on shard 0)
    remaining, k = E, 0
    while remaining > 0:
        cur = _shift_from_up(cur, n)
        k += 1
        row0 = jnp.where(idx == k, cur[0], row0)
        take = min(band_h, remaining)
        chunks.append(cur[band_h - take:])
        remaining -= take
    halo = jnp.concatenate(list(reversed(chunks)), axis=0)   # (E, W)
    if edge_fix:
        y = idx * band_h - E + jnp.arange(E)
        halo = jnp.where((y < 0)[:, None], row0[None], halo)
    return halo


def _collect_bottom_halo(local, E: int, n: int, H: int, edge_fix: bool):
    """Rows [band_y1, band_y1+E) of the global plane, from down-neighbors."""
    band_h = local.shape[0]
    idx = lax.axis_index("sp")
    chunks = []
    cur = local
    rowl = local[-1]                    # frame last row (valid on shard n-1)
    remaining, k = E, 0
    while remaining > 0:
        cur = _shift_from_down(cur, n)
        k += 1
        rowl = jnp.where(idx == n - 1 - k, cur[-1], rowl)
        take = min(band_h, remaining)
        chunks.append(cur[:take])
        remaining -= take
    halo = jnp.concatenate(chunks, axis=0)
    if edge_fix:
        y = (idx + 1) * band_h + jnp.arange(E)
        halo = jnp.where((y >= H)[:, None], rowl[None], halo)
    return halo


def _extend_band(local, E: int, n: int, H: int, edge_fix: bool = True):
    """(band_h, W) -> (band_h + 2E, W) with halo rows from neighbors."""
    top = _collect_top_halo(local, E, n, edge_fix)
    bot = _collect_bottom_halo(local, E, n, H, edge_fix)
    return jnp.concatenate([top, local, bot], axis=0)


def _make_luma_planes_band(ext, rows_out: int, w: int):
    """Band twin of enc_jax.make_luma_planes_dev: ext is (rows_out+6, W)
    int-plane rows (halo included, 3 conv rows each side); returns
    (4, rows_out, W+2*PAD) uint8 stacked [INT, B, H, J] planes,
    bit-identical to the same rows of the full-frame plane set."""
    ext = jnp.pad(ext, ((0, 0), (PAD + 3, PAD + 3)), mode="edge") \
        .astype(jnp.int32)
    b1 = EJ._conv6_h(ext)
    h1 = EJ._conv6_v(ext)
    B = jnp.clip((b1 + 16) >> 5, 0, 255)
    Hp = jnp.clip((h1 + 16) >> 5, 0, 255)
    j1 = EJ._conv6_v(b1)
    J = jnp.clip((j1 + 512) >> 10, 0, 255)
    wp = w + 2 * PAD
    INT = ext[3:3 + rows_out, 3:3 + wp]
    Bc = B[3:3 + rows_out, 1:1 + wp]
    Hc = Hp[1:1 + rows_out, 3:3 + wp]
    Jc = J[1:1 + rows_out, 1:1 + wp]
    return jnp.stack([INT, Bc, Hc, Jc]).astype(jnp.uint8)


def _p_band(origY, origU, origV, refY, refU, refV, qp, qpc, lam, lam4,
            *, mb_w: int, mb_h: int, sr: int, n: int):
    """shard_map body: encode this shard's MB-row band of a P picture.

    All array arguments arrive as this shard's band (in_specs P('sp')).
    Mirrors ops/enc_jax.p_frame_step stage for stage; every deviation is
    a halo exchange replacing what the full-frame step reads directly.
    """
    mb_h_l = mb_h // n
    h, w = mb_h * 16, mb_w * 16
    band_h = mb_h_l * 16
    n_l = mb_h_l * mb_w
    idx = lax.axis_index("sp")
    band_y0 = idx * band_h
    is_first = idx == 0

    # --- local reference plane set (prep_ref twin over band + halo) ----
    extY = _extend_band(refY, HALO + 3, n, h)
    planes = _make_luma_planes_band(extY, band_h + 2 * HALO, w)
    hc = HALO // 2
    extU = _extend_band(refU, hc, n, h // 2)
    extV = _extend_band(refV, hc, n, h // 2)
    padU = jnp.pad(extU, ((0, 0), (PAD, PAD)), mode="edge")
    padV = jnp.pad(extV, ((0, 0), (PAD, PAD)), mode="edge")
    y0 = band_y0 - HALO           # picture row of planes row 0
    y0c = band_y0 // 2 - hc

    mb_xy = jnp.stack(
        [(jnp.arange(n_l) % mb_w) * 16,
         band_y0 + (jnp.arange(n_l) // mb_w) * 16], axis=1).astype(jnp.int32)
    orig_mbs = origY.reshape(mb_h_l, 16, mb_w, 16).transpose(0, 2, 1, 3) \
        .reshape(n_l, 16, 16)
    orig_q = orig_mbs.reshape(n_l, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n_l, 4, 8, 8).astype(jnp.int16)

    # 1. integer sweep over the band (y0/band_y0-parameterized)
    int_mv, _ = EJ.me_int_sweep(origY, planes[0], mb_w, mb_h_l, sr, lam,
                                y0=y0, band_y0=band_y0)

    # 2. approximate predictor: needs the MB row above the band
    mv_up = _shift_from_up(int_mv[:, 0].reshape(mb_h_l, mb_w, 2)[-1], n)
    pred = EJ.approx_pred_field(int_mv[:, 0], mb_w, mb_h_l,
                                up_halo=mv_up, is_first=is_first)

    # 3. subpel refinement
    mv_q, cost_q = EJ.subpel_refine_jobs(planes, orig_q, int_mv, pred, lam,
                                         mb_xy, w, h, y0=y0)

    # 4. partition mode decision
    mode_costs = jnp.stack(
        [cost_q[:, list(jobs)].sum(axis=1) + lam * int(EJ.MODE_BITS[m])
         for m, jobs in enumerate(EJ.MODE_JOBS)], axis=1)
    best_mode = jnp.argmin(mode_costs, axis=1).astype(jnp.int32)
    cost_inter = jnp.min(mode_costs, axis=1)

    # 5. skip candidate
    skip_mv = pred
    g16 = jax.vmap(jax.vmap(
        lambda a, b: EJ._gather_qpel(planes, a, b, 8, w, h, y0)))
    qx = jnp.asarray([(0, 0), (8, 0), (0, 8), (8, 8)], jnp.int32)
    sx = (mb_xy[:, 0:1] + qx[None, :, 0]) * 4 + skip_mv[:, 0:1]
    sy = (mb_xy[:, 1:2] + qx[None, :, 1]) * 4 + skip_mv[:, 1:1 + 1]
    skip_pred = g16(sx, sy)
    cost_skip = jnp.abs(orig_q.astype(jnp.int32) - skip_pred) \
        .sum(axis=(1, 2, 3))
    take_skip = cost_skip <= cost_inter
    cost_inter = jnp.minimum(cost_inter, cost_skip)

    # 6. intra-16 decision: needs the source row above the band
    src_up = _shift_from_up(origY[-1], n)
    cost_i16 = EJ.i16_source_cost(origY, mb_w, mb_h_l,
                                  top_halo=src_up, is_first=is_first)
    intra_mask = cost_i16 + 2 * lam4 < cost_inter

    # 7. final motion field
    quad_job = jnp.asarray(EJ._BLK_JOB[:, [0, 2, 8, 10]])[best_mode]
    mv_quad = jnp.take_along_axis(mv_q, quad_job[..., None], axis=1)
    mv_quad = jnp.where(take_skip[:, None, None],
                        jnp.broadcast_to(skip_mv[:, None, :], mv_quad.shape),
                        mv_quad)
    best_mode = jnp.where(take_skip, 0, best_mode)
    blk_quad = jnp.asarray(
        [(b // 8) * 2 + ((b % 4) // 2) for b in range(16)])
    mv4 = mv_quad[:, blk_quad]

    # 8. prediction + residual + recon (pure per-MB, band-local)
    pred_y16 = EJ.mc_luma_quads(planes, mv_quad, mb_xy, w, h, y0=y0)
    scan, nnz, cbp_l, recY_mbs = EJ.luma_residual_inter(
        orig_mbs, pred_y16, qp)

    pred_u, pred_v = EJ.mc_chroma_quads(padU, padV, mv_quad, mb_xy, w, h,
                                        y0c=y0c)
    orig_u = origU.reshape(mb_h_l, 8, mb_w, 8).transpose(0, 2, 1, 3) \
        .reshape(n_l, 8, 8)
    orig_v = origV.reshape(mb_h_l, 8, mb_w, 8).transpose(0, 2, 1, 3) \
        .reshape(n_l, 8, 8)
    cdc, cac, cnnz, cbp_c, recU_mbs, recV_mbs = EJ.chroma_residual_inter(
        orig_u, orig_v, pred_u, pred_v, qpc)

    recY = recY_mbs.reshape(mb_h_l, mb_w, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(band_h, w)
    recU = recU_mbs.reshape(mb_h_l, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(band_h // 2, w // 2)
    recV = recV_mbs.reshape(mb_h_l, mb_w, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(band_h // 2, w // 2)

    return {
        "inter_mode": best_mode,
        "mv4": mv4,
        "luma_scan": scan.astype(jnp.int16),
        "luma_nnz": nnz,
        "cbp": (cbp_c << 4) | cbp_l,
        "chroma_dc": cdc.astype(jnp.int16),
        "chroma_scan": cac.astype(jnp.int16),
        "chroma_nnz": cnnz,
        "intra_mask": intra_mask,
        "recY": recY, "recU": recU, "recV": recV,
    }


@functools.lru_cache(maxsize=8)
def _compiled(mesh_key, mb_w: int, mb_h: int, sr: int, n: int):
    mesh = _MESHES[mesh_key]
    body = functools.partial(_p_band, mb_w=mb_w, mb_h=mb_h, sr=sr, n=n)
    band = P("sp", None)
    rep = P()
    out_specs = {
        "inter_mode": P("sp"), "mv4": P("sp"), "luma_scan": P("sp"),
        "luma_nnz": P("sp"), "cbp": P("sp"), "chroma_dc": P("sp"),
        "chroma_scan": P("sp"), "chroma_nnz": P("sp"), "intra_mask": P("sp"),
        "recY": band, "recU": band, "recV": band,
    }
    sm = jax.shard_map(
        body, mesh=mesh,
        in_specs=(band, band, band, band, band, band, rep, rep, rep, rep),
        out_specs=out_specs, check_vma=False)
    return jax.jit(sm)


_MESHES: dict = {}


def make_sp_mesh(n: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    mesh = Mesh(np.asarray(devices[:n]), axis_names=("sp",))
    _MESHES[id(mesh)] = mesh
    return mesh


def p_frame_step_sharded(mesh: Mesh, origY, origU, origV, refY, refU, refV,
                         qp, qpc, lam, lam4, *, mb_w: int, mb_h: int,
                         sr: int):
    """Sharded production P-frame step: same contract as
    enc_jax.p_frame_step but takes the reference picture's deblocked
    recon planes (plane prep happens per shard, on-device) and runs over
    the mesh's 'sp' axis. Requires mb_h % n == 0 and sr <= 16 (the halo
    budget: a band's gathers reach at most sr+16 rows outside it)."""
    n = mesh.devices.size
    if mb_h % n:
        raise ValueError(f"mb_h={mb_h} not divisible by {n} shards")
    if sr > 16:
        raise ValueError("sharded path supports SearchRange <= 16")
    if id(mesh) not in _MESHES:
        _MESHES[id(mesh)] = mesh
    fn = _compiled(id(mesh), mb_w, mb_h, sr, n)
    return fn(jnp.asarray(origY), jnp.asarray(origU), jnp.asarray(origV),
              jnp.asarray(refY), jnp.asarray(refU), jnp.asarray(refV),
              jnp.int32(qp), jnp.int32(qpc), jnp.int32(lam), jnp.int32(lam4))
