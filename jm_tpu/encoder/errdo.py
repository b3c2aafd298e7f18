"""Loss-aware RDO: the decoder-in-encoder ensemble (E32).

Capability parity with lencod/src/errdo.c (allocate_errdo_mem:38,
UpdateDecoders called from image.c:1320, RDOptimization mode 3 with
LossRateA / NumberOfDecoders) — new design: instead of running K full
decoders, K *error planes* are maintained (err_k = lossy_recon_k - clean
recon, luma). Propagation is linear through motion compensation: an
inter MB inherits the error sampled at its integer MV; an intra MB
resets it; a picture lost for decoder k (Bernoulli at LossRateA) adds
the frame-difference error of frame-copy concealment. The RD loop adds
the mean propagated-error energy of each inter candidate to its
distortion, steering mode decision toward intra where drift would hurt
— the errdo objective at MB granularity.
"""

from __future__ import annotations

import numpy as np

from ..decoder.mb_parse import MB_INTER


class ErrdoState:
    def __init__(self, num_decoders: int, loss_rate: int, h: int, w: int,
                 seed: int = 13):
        self.k = num_decoders
        self.loss = loss_rate
        self.err = np.zeros((num_decoders, h, w), np.int32)
        self.rng = np.random.default_rng(seed)
        self.h, self.w = h, w
        self._prev_recon = None

    # ---- RD hook -------------------------------------------------------

    def mb_error_energy(self, pic, addr: int, mb_w: int) -> float:
        """Mean propagated-error SSD a committed inter MB would inherit
        (sampled per 4x4 block at the integer-rounded MV, all decoders)."""
        if self.k == 0 or pic.mb_class[addr] != MB_INTER:
            return 0.0
        mbx, mby = addr % mb_w, addr // mb_w
        px, py = mbx * 16, mby * 16
        total = 0.0
        for blk in range(16):
            by, bx = divmod(blk, 4)
            mvx = int(pic.mv[addr, blk, 0]) >> 2
            mvy = int(pic.mv[addr, blk, 1]) >> 2
            x = min(max(px + bx * 4 + mvx, 0), self.w - 4)
            y = min(max(py + by * 4 + mvy, 0), self.h - 4)
            e = self.err[:, y:y + 4, x:x + 4].astype(np.int64)
            total += float((e * e).sum())
        return total / max(self.k, 1)

    # ---- per-picture propagation ----------------------------------------

    def update(self, pic, recY: np.ndarray, mb_w: int, is_ref: bool) -> None:
        """Advance all simulated decoders past this coded picture."""
        if self.k == 0:
            return
        new_err = np.zeros_like(self.err)
        n = pic.n_mbs
        for addr in range(n):
            mbx, mby = addr % mb_w, addr // mb_w
            px, py = mbx * 16, mby * 16
            if pic.mb_class[addr] != MB_INTER:
                continue                       # intra resets the drift
            for blk in range(16):
                by, bx = divmod(blk, 4)
                mvx = int(pic.mv[addr, blk, 0]) >> 2
                mvy = int(pic.mv[addr, blk, 1]) >> 2
                x = min(max(px + bx * 4 + mvx, 0), self.w - 4)
                y = min(max(py + by * 4 + mvy, 0), self.h - 4)
                new_err[:, py + by * 4: py + by * 4 + 4,
                        px + bx * 4: px + bx * 4 + 4] = \
                    self.err[:, y:y + 4, x:x + 4]
        # per-decoder channel: a lost picture is concealed by frame copy
        lost = self.rng.random(self.k) * 100.0 < self.loss
        if self._prev_recon is not None:
            diff = self._prev_recon.astype(np.int32) - recY.astype(np.int32)
            for k in np.flatnonzero(lost):
                new_err[k] = self.err[k] + diff
        if is_ref:
            self.err = new_err
        self._prev_recon = recY.astype(np.int32)
