"""Error concealment for lost / corrupted pictures.

Capability parity with the reference concealment stack
(ldecod/src/mbuffer.c conceal_lost_frames:1837 + conceal_non_ref_pics,
ldecod/src/erc_do_p.c concealByCopy:239 / motion-copy path, ConcealMode
decoder param ldecod/inc/configfile.h:44) — new implementation over the
SoA frame store:

- mode 1 (frame copy): the lost picture becomes a pixel copy of the
  closest reference by POC.
- mode 2 (motion copy): the closest reference's stored motion field is
  replayed — each 4x4 block is motion-compensated from that reference's
  own list-0 reference when it is still resident in the DPB, falling back
  to copy for intra/unavailable blocks.

Whole-frame granularity first (our encoder emits one slice per picture);
per-MB spatial/temporal conceal of partial pictures extends this module.
"""

from __future__ import annotations

import numpy as np

from ..ops import interp as ip
from .dpb import Frame


def _closest_ref(frames: list[Frame], poc: int) -> Frame:
    refs = [f for f in frames if f.is_ref] or list(frames)
    return min(refs, key=lambda f: abs(f.poc - poc))


def conceal_lost_frame(dpb_frames: list[Frame], frame_num: int, poc: int,
                       mode: int) -> Frame:
    """Synthesize a Frame for a picture that never arrived."""
    src = _closest_ref(dpb_frames, poc)
    if mode >= 2 and src.motion is not None:
        Y, U, V = _motion_copy(dpb_frames, src)
    else:
        Y, U, V = src.Y.copy(), src.U.copy(), src.V.copy()
    f = Frame(poc=poc, frame_num=frame_num, Y=Y, U=U, V=V, is_ref=True)
    f.concealed = True
    # a concealed frame has no trustworthy motion; store a neutral field
    # (mv=0, ref_idx=-1, ref_pic_id=-1) so dependent direct-mode B
    # pictures see a consistent "no motion available" state per block
    if src.motion is not None:
        mv, ref_idx, mv_l1, ref_idx_l1, rp0, rp1 = src.motion
        f.motion = (np.zeros_like(mv), np.full_like(ref_idx, -1),
                    np.zeros_like(mv_l1), np.full_like(ref_idx_l1, -1),
                    np.full_like(rp0, -1), np.full_like(rp1, -1))
    return f


def _motion_copy(dpb_frames: list[Frame], src: Frame):
    """erc 'motion copy': replay src's list-0 motion field against its own
    references (erc_do_p.c concealByTrial uses neighbour MVs similarly)."""
    mv, ref_idx, _mv1, _r1, ref_pic_id, _rp1 = src.motion
    by_uid = {f.uid: f for f in dpb_frames}
    h, w = src.Y.shape
    mb_w = w // 16
    Y = src.Y.copy()
    U = src.U.copy()
    V = src.V.copy()
    n_mbs = mv.shape[0]
    for addr in range(n_mbs):
        mbx, mby = addr % mb_w, addr // mb_w
        px, py = mbx * 16, mby * 16
        for blk in range(16):
            q = ((blk // 4) // 2) * 2 + ((blk % 4) // 2)
            uid = int(ref_pic_id[addr, q])
            if int(ref_idx[addr, q]) < 0 or uid not in by_uid:
                continue                      # intra / missing ref: copy
            rf = by_uid[uid]
            byy, bxx = divmod(blk, 4)
            mvx, mvy = int(mv[addr, blk, 0]), int(mv[addr, blk, 1])
            x4 = (px + bxx * 4) * 4 + mvx
            y4 = (py + byy * 4) * 4 + mvy
            Y[py + byy * 4: py + byy * 4 + 4,
              px + bxx * 4: px + bxx * 4 + 4] = np.clip(
                ip.mc_luma_block(rf.luma_planes, x4, y4, 4, 4, w, h),
                0, 255)
            cx8 = (px // 2 + bxx * 2) * 8 + mvx
            cy8 = (py // 2 + byy * 2) * 8 + mvy
            for plane, pad in ((U, rf.chroma_pad[0]), (V, rf.chroma_pad[1])):
                plane[py // 2 + byy * 2: py // 2 + byy * 2 + 2,
                      px // 2 + bxx * 2: px // 2 + bxx * 2 + 2] = np.clip(
                    ip.mc_chroma_block(pad, cx8, cy8, 2, 2, w // 2, h // 2),
                    0, 255)
    return Y.astype(np.uint8), U.astype(np.uint8), V.astype(np.uint8)


# ---------------------------------------------------------------------------
# Per-MB error concealment (D17): spatial intra + inter motion-trial
# ---------------------------------------------------------------------------

def conceal_mbs(Y, U, V, pic, lost, ref, mb_w: int, mb_h: int) -> int:
    """Conceal the MBs flagged in `lost` (n,) bool, in place.

    ref is the closest DPB Frame or None. With a reference the inter
    conceal-by-trial of erc_do_p.c:329 runs (candidate MVs from available
    neighbors + zero, scored by boundary side-match, winner motion
    compensated and written into pic.mv for later colocated use); without
    one (I pictures) the spatial weighted-pixel-average of erc_do_i.c:544.
    Processing is onion-order: MBs with the most available neighbors
    first, concealed MBs become available (ercConcealIntraFrame ordering).
    Returns the number of concealed MBs.
    """
    import numpy as np
    avail = ~lost.reshape(mb_h, mb_w).copy()
    todo = [tuple(p) for p in np.argwhere(~avail)]
    count = 0
    while todo:
        # rank by number of available 4-neighbors; conceal best first
        def n_avail(p):
            y, x = p
            return sum(1 for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1))
                       if 0 <= y + dy < mb_h and 0 <= x + dx < mb_w
                       and avail[y + dy, x + dx])
        todo.sort(key=n_avail, reverse=True)
        y, x = todo.pop(0)
        if ref is not None:
            _conceal_inter_mb(Y, U, V, pic, ref, x, y, mb_w, mb_h, avail)
        else:
            _conceal_spatial_mb(Y, x, y, 16, avail, mb_w, mb_h)
            _conceal_spatial_mb(U, x, y, 8, avail, mb_w, mb_h)
            _conceal_spatial_mb(V, x, y, 8, avail, mb_w, mb_h)
        avail[y, x] = True
        count += 1
    return count


def _conceal_spatial_mb(plane, mbx, mby, bs, avail, mb_w, mb_h):
    """erc_do_i.c pixelConceal: every pixel is the inverse-distance
    weighted average of the adjacent boundary pixels of the available
    up/down/left/right neighbor MBs."""
    import numpy as np
    px, py = mbx * bs, mby * bs
    ys, xs = np.mgrid[0:bs, 0:bs]
    num = np.zeros((bs, bs), np.float64)
    den = np.zeros((bs, bs), np.float64)
    sides = []
    if mby > 0 and avail[mby - 1, mbx]:
        sides.append((plane[py - 1, px:px + bs][None, :].astype(np.float64)
                      .repeat(bs, 0), ys + 1))
    if mby + 1 < mb_h and avail[mby + 1, mbx]:
        sides.append((plane[py + bs, px:px + bs][None, :].astype(np.float64)
                      .repeat(bs, 0), bs - ys))
    if mbx > 0 and avail[mby, mbx - 1]:
        sides.append((plane[py:py + bs, px - 1][:, None].astype(np.float64)
                      .repeat(bs, 1), xs + 1))
    if mbx + 1 < mb_w and avail[mby, mbx + 1]:
        sides.append((plane[py:py + bs, px + bs][:, None].astype(np.float64)
                      .repeat(bs, 1), bs - xs))
    if not sides:
        plane[py:py + bs, px:px + bs] = 128
        return
    for edge, dist in sides:
        w = 1.0 / dist
        num += w * edge
        den += w
    plane[py:py + bs, px:px + bs] = np.clip(
        num / den + 0.5, 0, 255).astype(np.uint8)


def _conceal_inter_mb(Y, U, V, pic, ref, mbx, mby, mb_w, mb_h, avail):
    """erc_do_p.c concealByTrial: candidate MVs = zero + the quadrant MVs
    of available neighbor MBs; each candidate's motion-compensated block
    is scored by the boundary side-match against available neighbor
    pixels; the winner fills luma+chroma and is recorded in pic.mv."""
    import numpy as np

    from ..ops import interp as ip
    h_img, w_img = Y.shape
    px, py = mbx * 16, mby * 16
    addr = mby * mb_w + mbx
    cands = [(0, 0)]
    for (dy, dx, quads) in ((-1, 0, (2, 3)), (1, 0, (0, 1)),
                            (0, -1, (1, 3)), (0, 1, (0, 2))):
        ny, nx = mby + dy, mbx + dx
        if 0 <= ny < mb_h and 0 <= nx < mb_w and avail[ny, nx]:
            naddr = ny * mb_w + nx
            if pic.ref_idx[naddr, 0] >= 0:
                for q in quads:
                    cands.append(tuple(int(v) for v in pic.mv[naddr, q]))
    seen, uniq = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            uniq.append(c)

    def side_match(blk):
        e = 0.0
        n = 0
        if mby > 0 and avail[mby - 1, mbx]:
            e += np.abs(blk[0].astype(np.int32)
                        - Y[py - 1, px:px + 16].astype(np.int32)).sum()
            n += 16
        if mby + 1 < mb_h and avail[mby + 1, mbx]:
            e += np.abs(blk[-1].astype(np.int32)
                        - Y[py + 16, px:px + 16].astype(np.int32)).sum()
            n += 16
        if mbx > 0 and avail[mby, mbx - 1]:
            e += np.abs(blk[:, 0].astype(np.int32)
                        - Y[py:py + 16, px - 1].astype(np.int32)).sum()
            n += 16
        if mbx + 1 < mb_w and avail[mby, mbx + 1]:
            e += np.abs(blk[:, -1].astype(np.int32)
                        - Y[py:py + 16, px + 16].astype(np.int32)).sum()
            n += 16
        return e / max(n, 1)

    best = None
    for (mvx, mvy) in uniq:
        blk = ip.mc_luma_block(ref.luma_planes, px * 4 + mvx, py * 4 + mvy,
                               16, 16, w_img, h_img).astype(np.uint8)
        cost = side_match(blk)
        if best is None or cost < best[0]:
            best = (cost, (mvx, mvy), blk)
    _cost, (mvx, mvy), blk = best
    Y[py:py + 16, px:px + 16] = blk
    pu, pv = ref.chroma_pad
    ch, cw = U.shape[0] // mb_h, 8
    cy, cx = mby * ch, mbx * 8
    yscale = 2 if ch == 16 else 1        # 4:2:2 keeps full chroma height
    for plane, pad in ((U, pu), (V, pv)):
        plane[cy:cy + ch, cx:cx + 8] = ip.mc_chroma_block(
            pad, cx * 8 + mvx, cy * 8 + mvy * yscale,
            8, ch, U.shape[1], U.shape[0]).astype(np.uint8)
    pic.mv[addr] = (mvx, mvy)
    pic.ref_idx[addr] = 0
    pic.mb_class[addr] = 0          # inter
