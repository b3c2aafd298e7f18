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
