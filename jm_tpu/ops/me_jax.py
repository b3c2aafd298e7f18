"""Device-side (jnp/XLA) motion estimation and encode compute step.

The TPU twin of encoder/me.py: full-search SAD over all MBs evaluated as
one batched tensor program (reference loops candidates serially:
lencod/src/me_fullsearch.c). Patch extraction maps the (2*SR+1)^2 candidate
sweep onto dense tensor ops; the residual path reuses the bit-exact integer
transform/quant kernels (ops/transform.py, ops/quant.py).

This is the "flagship forward step" exposed via __graft_entry__:
ME -> MC(int-pel) -> residual -> forward4x4 -> quant -> dequant ->
inverse4x4 -> recon, all int32, jit-compiled once for static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from . import quant as Q
from . import transform as T


def gather_regions(plane_pad: jnp.ndarray, xy: jnp.ndarray, size: int) -> jnp.ndarray:
    """Gather (size, size) windows at per-MB coords (N, 2) [x, y]."""
    def one(p):
        return lax.dynamic_slice(plane_pad, (p[1], p[0]), (size, size))
    return jax.vmap(one)(xy)


def sad_full_search(orig_mbs: jnp.ndarray, regions: jnp.ndarray,
                    sr: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched 16x16 full-search SAD.

    orig_mbs: (N, 16, 16) uint8/int; regions: (N, 16+2sr, 16+2sr).
    Returns (mvs (N, 2) int32 [dx, dy] integer-pel, best_sad (N,)).
    Argmin tie-break = first flat index in (dy, dx) row-major order,
    matching the numpy reference (encoder/me.py full_search_int).
    """
    side = 2 * sr + 1
    n = orig_mbs.shape[0]
    # patches: (N, 256, side, side) — channel dim = flattened 16x16 patch
    patches = lax.conv_general_dilated_patches(
        regions[:, None].astype(jnp.int16),
        filter_shape=(16, 16), window_strides=(1, 1), padding="VALID")
    o = orig_mbs.reshape(n, 256, 1, 1).astype(jnp.int16)
    sads = jnp.abs(patches - o).astype(jnp.int32).sum(axis=1)   # (N, side, side)
    flat = sads.reshape(n, side * side)
    idx = jnp.argmin(flat, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    mv = jnp.stack([idx % side - sr, idx // side - sr], axis=1)
    return mv, best


def mc_intpel(regions: jnp.ndarray, mvs: jnp.ndarray, sr: int) -> jnp.ndarray:
    """Fetch the 16x16 predictor at the chosen integer MV from each region."""
    def one(region, mv):
        return lax.dynamic_slice(region, (mv[1] + sr, mv[0] + sr), (16, 16))
    return jax.vmap(one)(regions, mvs)


def residual_code(orig_mbs: jnp.ndarray, pred: jnp.ndarray, qp: int,
                  intra: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform->quant->dequant->inverse->recon for 16x16 luma residual.

    Returns (levels (N, 16, 4, 4) int32, recon (N, 16, 16) uint8).
    """
    n = orig_mbs.shape[0]
    res = orig_mbs.astype(jnp.int32) - pred.astype(jnp.int32)
    blocks = res.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 4, 4)
    w = T.forward4x4(blocks)
    qp_v = jnp.full((n, 16), qp, jnp.int32)
    lev = Q.quant_4x4(w, qp_v, intra)
    d = Q.dequant_4x4(lev, qp_v)
    r = T.inverse4x4_round(d)
    pred_b = pred.astype(jnp.int32).reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 4, 4)
    rec = jnp.clip(pred_b + r, 0, 255)
    rec = rec.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)
    return lev, rec.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("sr", "qp"))
def encode_step(orig_mbs: jnp.ndarray, ref_pad: jnp.ndarray,
                mb_xy: jnp.ndarray, *, sr: int = 16, qp: int = 28):
    """One device encode step over a batch of macroblocks.

    orig_mbs: (N, 16, 16) uint8 — current-frame MBs.
    ref_pad: (H + 2*pad, W + 2*pad) uint8 padded reference plane.
    mb_xy: (N, 2) int32 MB top-left coords in PADDED plane coordinates.
    Returns dict(mv, sad, levels, recon).
    """
    regions = gather_regions(ref_pad, mb_xy - sr, 16 + 2 * sr)
    mv, sad = sad_full_search(orig_mbs, regions, sr)
    pred = mc_intpel(regions, mv, sr)
    lev, rec = residual_code(orig_mbs, pred, qp, intra=False)
    return {"mv": mv, "sad": sad, "levels": lev, "recon": rec}
