"""FMO slice-group map generators (common/fmo.py vs lencod/src/fmo.c).

Decode-side conformance (all 7 map types bit-exact vs JM recon) lives in
test_decoder_conformance.py; these are structural unit tests.
"""

import numpy as np

from jm_tpu.common.fmo import mb_to_slice_group_map, next_mb_arrays
from jm_tpu.common.types import PPS, SPS


def _env(w=11, h=9, groups=2, map_type=0, **kw):
    sps = SPS(pic_width_in_mbs_minus1=w - 1,
              pic_height_in_map_units_minus1=h - 1)
    pps = PPS(num_slice_groups_minus1=groups - 1,
              slice_group_map_type=map_type)
    for k, v in kw.items():
        setattr(pps, k, v)
    return pps, sps


def test_interleave_runs():
    pps, sps = _env(map_type=0, groups=3, run_length_minus1=[2, 1, 0])
    m = mb_to_slice_group_map(pps, sps)
    assert list(m[:6]) == [0, 0, 0, 1, 1, 2]
    assert list(m[6:12]) == [0, 0, 0, 1, 1, 2]


def test_dispersed_checker():
    pps, sps = _env(map_type=1, groups=2)
    m = mb_to_slice_group_map(pps, sps).reshape(9, 11)
    # dispersed with 2 groups = checkerboard
    assert m[0, 0] != m[0, 1]
    assert m[0, 0] != m[1, 0]
    assert m[0, 0] == m[1, 1]


def test_foreground_rect():
    w = 11
    pps, sps = _env(map_type=2, groups=2,
                    top_left=[1 * w + 2], bottom_right=[3 * w + 5])
    m = mb_to_slice_group_map(pps, sps).reshape(9, 11)
    assert (m[1:4, 2:6] == 0).all()
    m2 = m.copy()
    m2[1:4, 2:6] = 1
    assert (m2 == 1).all()


def test_changing_groups_partition_and_counts():
    # box-out / raster / wipe: group 0 holds exactly
    # min(cycle*(rate+1), n) map units, both directions
    for t in (3, 4, 5):
        for d in (0, 1):
            pps, sps = _env(map_type=t, groups=2,
                            slice_group_change_direction_flag=d,
                            slice_group_change_rate_minus1=6)
            m = mb_to_slice_group_map(pps, sps, slice_group_change_cycle=4)
            assert (m == 0).sum() == 4 * 7, (t, d)
            assert set(np.unique(m)) <= {0, 1}


def test_next_mb_arrays():
    pps, sps = _env(map_type=1, groups=2)
    m = mb_to_slice_group_map(pps, sps)
    succ = next_mb_arrays(m)
    n = m.size
    for g in range(2):
        addrs = np.flatnonzero(m == g)
        walk = [int(addrs[0])]
        while succ[walk[-1]] < n:
            walk.append(int(succ[walk[-1]]))
        assert walk == list(addrs)


# ---- encoder: multi-slice + FMO round trips (E5/E33) ------------------


def _foreman_like(n=3, w=176, h=144):
    yy, xx = np.mgrid[0:h + 16, 0:w + 16]
    base = (120 + 70 * np.sin(xx / 11.0) * np.cos(yy / 8.0)).astype(np.uint8)
    out = []
    for i in range(n):
        Y = base[i * 3:i * 3 + h, i * 2:i * 2 + w].copy()
        out.append((Y, Y[::2, ::2] // 2 + 60, Y[1::2, 1::2] // 3 + 90))
    return out


def _roundtrip(**kw):
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    frames = _foreman_like()
    enc = Encoder(EncoderConfig(width=176, height=144, qp=30, **kw))
    out = b""
    for Y, U, V in frames:
        out += enc.encode_frame(Y, U, V)
    out += enc.flush()
    rec = [r["frame"] for r in sorted(enc.results, key=lambda r: r["disp"])]
    dec = sorted(H264Decoder().decode_annexb(out), key=lambda f: f.poc)
    assert len(dec) == len(rec)
    for a, b in zip(rec, dec):
        assert np.array_equal(a.Y, b.Y) and np.array_equal(a.U, b.U) \
            and np.array_equal(a.V, b.V)
    return enc


def test_encode_multi_slice_cavlc():
    enc = _roundtrip(slice_mode=1, slice_argument=30)
    assert len(enc.slice_plan) == 4          # 99 MBs -> 30+30+30+9


def test_encode_multi_slice_cabac():
    _roundtrip(slice_mode=1, slice_argument=40, entropy="cabac")


def test_encode_fmo_types():
    _roundtrip(num_slice_groups=3, slice_group_map_type=0,
               sg_run_length=(25, 21, 11))
    _roundtrip(num_slice_groups=2, slice_group_map_type=1)
    _roundtrip(num_slice_groups=2, slice_group_map_type=2,
               sg_top_left=(24,), sg_bottom_right=(60,))
    _roundtrip(num_slice_groups=2, slice_group_map_type=3,
               sg_change_rate_minus1=20, sg_change_cycle=2)
    _roundtrip(num_slice_groups=2, slice_group_map_type=5,
               sg_change_rate_minus1=20, sg_change_cycle=3,
               sg_change_direction=1)


def test_encode_fmo_plus_multi_slice():
    enc = _roundtrip(num_slice_groups=2, slice_group_map_type=1,
                     slice_mode=1, slice_argument=25)
    assert len(enc.slice_plan) == 4


def test_fmo_rejected_outside_baseline():
    import pytest
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    with pytest.raises(ValueError):
        Encoder(EncoderConfig(width=64, height=48, entropy="cabac",
                              num_slice_groups=2, slice_group_map_type=1))


def test_intra_refresh(monkeypatch=None):
    """E34: RandomIntraMBRefresh forces >= K intra MBs per P picture."""
    from jm_tpu.decoder.mb_parse import MB_INTER
    enc = _roundtrip(intra_mb_refresh=12)
    # inspect the stored motion SoA of the last P frame: forced-intra MBs
    # have ref_idx -1 on every quadrant
    got = 0
    for r in enc.results:
        if r["type"] != "P":
            continue
        _mv, ref_idx = r["frame"].motion[0], r["frame"].motion[1]
        got = max(got, int((ref_idx[:, 0] < 0).sum()))
    assert got >= 12


def test_sub8x8_partitions_roundtrip():
    """E7: 8x4/4x8/4x4 sub-partitions survive encode->decode; oracle
    interop (JM ldecod bit-exact, CAVLC/CABAC/multi-ref/8x8T) verified
    out-of-band with /verify."""
    enc = _roundtrip(sub8x8=True)
    assert (enc.results[1]["frame"].motion[1] >= 0).any()
    enc = _roundtrip(sub8x8=True, entropy="cabac")
