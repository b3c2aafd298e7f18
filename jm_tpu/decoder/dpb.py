"""Decoded picture buffer (spec 8.2.4/8.2.5): reference marking, P-slice
list-0 initialization, sliding window, IDR handling, output ordering.

Capability parity with ldecod/src/mbuffer.c (store_picture_in_dpb,
init_lists_p_slice, sliding_window_memory_management) — new implementation;
MMCO adaptive marking is parsed (header.py) and applied here for the ops
needed by JM streams (others staged for the B/field phase).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops import interp as P


@dataclass
class Frame:
    poc: int
    frame_num: int
    Y: np.ndarray
    U: np.ndarray
    V: np.ndarray
    is_ref: bool = True
    is_long_term: bool = False
    concealed: bool = False  # synthesized by error concealment (D17)
    long_term_frame_idx: int = -1
    uid: int = -1            # unique decode-order id (deblock ref comparison)
    # (mv_l0, ref_idx_l0, mv_l1, ref_idx_l1) SoA for temporal/spatial direct
    motion: tuple | None = None
    bit_depth: int = 8       # luma bit depth (>8: High 10 etc., uint16 Y)
    _luma_planes: tuple | None = None
    _chroma_pad: tuple | None = None

    @property
    def luma_planes(self):
        if self._luma_planes is None:
            self._luma_planes = P.make_luma_planes(
                self.Y, cmax=(1 << self.bit_depth) - 1)
        return self._luma_planes

    @property
    def chroma_pad(self):
        if self._chroma_pad is None:
            self._chroma_pad = (P.pad_plane(self.U), P.pad_plane(self.V))
        return self._chroma_pad


class DPB:
    def __init__(self, sps):
        self.sps = sps
        self.frames: list[Frame] = []      # reference frames, decode order
        self.max_refs = max(1, sps.max_num_ref_frames)
        self._uid = 0

    def idr_flush(self) -> None:
        self.frames.clear()

    def store(self, frame: Frame, mmco_ops=None, idr=False,
              long_term_flag=0) -> None:
        frame.uid = self._uid
        self._uid += 1
        if idr:
            self.idr_flush()
            if long_term_flag:
                frame.is_long_term = True
                frame.long_term_frame_idx = 0
        if not frame.is_ref:
            return
        if mmco_ops:
            self._apply_mmco(frame, mmco_ops)
        else:
            # sliding window (spec 8.2.5.3)
            short = [f for f in self.frames if not f.is_long_term]
            num_long = len(self.frames) - len(short)
            while len(short) + num_long >= self.max_refs and short:
                oldest = min(short, key=lambda f: f.uid)
                self.frames.remove(oldest)
                short.remove(oldest)
        self.frames.append(frame)

    def _apply_mmco(self, frame: Frame, ops) -> None:
        max_fn = self.sps.max_frame_num
        for op in ops:
            if op.op == 1:   # unmark short-term
                pic_num = frame.frame_num - (op.value1 + 1)
                target = pic_num if pic_num >= 0 else pic_num + max_fn
                for f in list(self.frames):
                    if not f.is_long_term and f.frame_num == target:
                        self.frames.remove(f)
            elif op.op == 2:  # unmark long-term
                for f in list(self.frames):
                    if f.is_long_term and f.long_term_frame_idx == op.value1:
                        self.frames.remove(f)
            elif op.op == 3:  # short-term -> long-term
                pic_num = frame.frame_num - (op.value1 + 1)
                target = pic_num if pic_num >= 0 else pic_num + max_fn
                self._unmark_lt_idx(op.value2)
                for f in self.frames:
                    if not f.is_long_term and f.frame_num == target:
                        f.is_long_term = True
                        f.long_term_frame_idx = op.value2
            elif op.op == 4:  # set max long-term idx
                for f in list(self.frames):
                    if f.is_long_term and f.long_term_frame_idx >= op.value1 - 1 >= -1:
                        if f.long_term_frame_idx > op.value1 - 1:
                            self.frames.remove(f)
            elif op.op == 5:  # reset
                self.frames.clear()
            elif op.op == 6:  # current -> long-term
                self._unmark_lt_idx(op.value1)
                frame.is_long_term = True
                frame.long_term_frame_idx = op.value1

    def _unmark_lt_idx(self, idx: int) -> None:
        """spec 8.2.5.4.3/.6: a frame already holding this long-term index
        is marked unused for reference."""
        for f in list(self.frames):
            if f.is_long_term and f.long_term_frame_idx == idx:
                self.frames.remove(f)

    # ---- reference list construction (spec 8.2.4.2) -----------------------

    def ref_list_p(self, cur_frame_num: int) -> list[Frame]:
        """List0 for P slices: short-term by PicNum desc, then long-term by
        LongTermPicNum asc."""
        max_fn = self.sps.max_frame_num

        def pic_num(f: Frame) -> int:
            return (f.frame_num if f.frame_num <= cur_frame_num
                    else f.frame_num - max_fn)

        short = sorted((f for f in self.frames if not f.is_long_term),
                       key=pic_num, reverse=True)
        long = sorted((f for f in self.frames if f.is_long_term),
                      key=lambda f: f.long_term_frame_idx)
        return short + long

    def reorder_list(self, lst: list[Frame], mods, cur_frame_num: int,
                     num_active: int, inter_view=None) -> list[Frame]:
        """Apply ref_pic_list_modification commands (spec 8.2.4.3 +
        H.8.2.2.3 inter-view ops 4/5 for the MVC dependent view)."""
        if not mods:
            return lst[:num_active]
        max_fn = self.sps.max_frame_num
        lst = list(lst)
        pred = cur_frame_num
        idx = 0
        for m in mods:
            if m.op in (0, 1):
                diff = m.value + 1
                pred = (pred - diff) % max_fn if m.op == 0 else (pred + diff) % max_fn
                pic_num = pred
                target = None
                for f in lst:
                    if not f.is_long_term:
                        fpn = (f.frame_num if f.frame_num <= cur_frame_num
                               else f.frame_num - max_fn)
                        wanted = pic_num if pic_num <= cur_frame_num else pic_num - max_fn
                        if fpn == wanted:
                            target = f
                            break
                if target is None:
                    raise ValueError("ref reorder: pic_num not found")
            elif m.op in (4, 5):
                # MVC inter-view modification (H.8.2.2.3): with one
                # dependent view the only inter-view candidate is the
                # appended view-0 picture of the current access unit
                if inter_view is None:
                    raise ValueError("inter-view reorder without MVC ref")
                target = inter_view
            else:  # long-term
                target = next(f for f in lst if f.is_long_term
                              and f.long_term_frame_idx == m.value)
            lst.remove(target)
            lst.insert(idx, target)
            idx += 1
        return lst[:num_active]
