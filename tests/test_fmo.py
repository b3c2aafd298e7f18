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
