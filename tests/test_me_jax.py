"""Device (jnp) encode step vs numpy reference equivalence."""

import numpy as np

from jm_tpu.encoder import me as ME_np
from jm_tpu.ops import interp as ip


def test_sad_search_matches_numpy():
    import jax.numpy as jnp

    from jm_tpu.ops.me_jax import encode_step

    rng = np.random.default_rng(7)
    w, h, sr, pad = 64, 64, 8, 16
    mb_w, mb_h = w // 16, h // 16
    orig = rng.integers(0, 256, (h, w), dtype=np.uint8)
    ref = rng.integers(0, 256, (h, w), dtype=np.uint8)
    # correlated content so the search has structure
    ref[8:, :] = orig[:-8, :]
    ref_pad = np.pad(ref, pad, mode="edge")

    np_mvs = ME_np.full_search_int(orig, ref_pad, mb_w, mb_h, sr, pad)

    n = mb_w * mb_h
    mbs = orig.reshape(mb_h, 16, mb_w, 16).transpose(0, 2, 1, 3).reshape(n, 16, 16)
    xy = np.stack([(np.arange(n) % mb_w) * 16 + pad,
                   (np.arange(n) // mb_w) * 16 + pad], axis=1).astype(np.int32)
    out = encode_step(jnp.asarray(mbs), jnp.asarray(ref_pad),
                      jnp.asarray(xy), sr=sr, qp=28)
    np.testing.assert_array_equal(np.asarray(out["mv"]), np_mvs)

    # recon equals the numpy closed-loop path at the same MVs
    from jm_tpu.encoder import residual_np as RN
    for i in range(n):
        mv = np_mvs[i]
        px, py = (i % mb_w) * 16, (i // mb_w) * 16
        pred = ref_pad[pad + py + mv[1]: pad + py + mv[1] + 16,
                       pad + px + mv[0]: pad + px + mv[0] + 16].astype(np.int64)
        res = mbs[i].astype(np.int64) - pred
        blocks = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
        wv = RN.np_forward4x4(blocks)
        lev = RN.np_quant_4x4(wv, 28, False)
        scan = RN.to_scan(lev)
        pred_b = pred.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
        rec = RN.recon_luma_4x4(pred_b, scan, 28)
        rec16 = rec.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
        np.testing.assert_array_equal(np.asarray(out["recon"][i]), rec16,
                                      err_msg=f"mb {i}")


def test_ssd_full_search_matches_exhaustive():
    """MXU-formulated SSD sweep (conv cross-term + hi/lo energy split)
    equals the exhaustive integer SSD argmin."""
    import jax.numpy as jnp
    from numpy.lib.stride_tricks import sliding_window_view

    from jm_tpu.ops.me_jax import ssd_full_search
    rng = np.random.default_rng(11)
    sr = 8
    side = 2 * sr + 1
    n = 24
    regions = rng.integers(0, 256, (n, 16 + 2 * sr, 16 + 2 * sr), np.uint8)
    mbs = rng.integers(0, 256, (n, 16, 16), np.uint8)
    mv, best = ssd_full_search(jnp.asarray(mbs), jnp.asarray(regions), sr)
    mv, best = np.asarray(mv), np.asarray(best)
    for i in range(n):
        wins = sliding_window_view(regions[i].astype(np.int64), (16, 16))
        ssds = ((wins - mbs[i].astype(np.int64)) ** 2).sum((2, 3))
        k = int(ssds.argmin())
        dy, dx = divmod(k, side)
        assert (mv[i][0], mv[i][1]) == (dx - sr, dy - sr)
        assert best[i] == ssds.min()


def test_regions_grid_matches_gather():
    import jax.numpy as jnp

    from jm_tpu.ops.me_jax import regions_grid
    rng = np.random.default_rng(5)
    pad, sr = 32, 16
    w, h = 128, 96
    ref = np.pad(rng.integers(0, 256, (h, w), np.uint8), pad, mode="edge")
    g = np.asarray(regions_grid(jnp.asarray(ref), w // 16, h // 16, sr, pad))
    i = 0
    for my in range(h // 16):
        for mx in range(w // 16):
            x, y = mx * 16 + pad - sr, my * 16 + pad - sr
            np.testing.assert_array_equal(g[i], ref[y:y + 48, x:x + 48])
            i += 1
