"""Auxiliary parity: conformance levels (E39), leaky bucket (E38),
VUI write (E26)."""

import numpy as np
import pytest

from jm_tpu.common.conformance import (level_check, level_limits,
                                       max_dpb_frames, minimum_level)
from jm_tpu.encoder.leaky_bucket import calc_buffer, read_buffer, write_buffer


def test_level_tables():
    l30 = level_limits(30)
    assert (l30.max_fs, l30.max_mbps, l30.max_br) == (1620, 40500, 10000)
    assert level_limits(51).max_fs == 36864
    assert level_limits(10).vmv == (-63, 63)
    with pytest.raises(ValueError):
        level_limits(33)


def test_level_check_and_minimum():
    level_check(11, 9, 30.0, 30)             # QCIF easily fits level 3
    with pytest.raises(ValueError):           # 1080p does not fit level 3
        level_check(120, 68, 30.0, 30)
    assert minimum_level(120, 68, 30.0) == 40          # 1080p30 -> 4.0
    assert minimum_level(120, 68, 60.0) == 42          # 1080p60 -> 4.2
    assert max_dpb_frames(40, 120 * 68) == 4
    with pytest.raises(ValueError):           # DPB too small for 16 refs
        level_check(120, 68, 30.0, 40, num_ref_frames=16)


def test_encoder_auto_level_upgrade():
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(width=1920, height=1088, level_idc=30))
    assert enc.sps.level_idc >= 40


def test_leaky_bucket(tmp_path):
    rng = np.random.default_rng(0)
    bits = [int(b) for b in rng.integers(2000, 30000, 60)]
    buckets = calc_buffer(bits, 30.0, n_buckets=6)
    assert len(buckets) == 6
    rates = [r for r, _, _ in buckets]
    sizes = [b for _, b, _ in buckets]
    assert rates == sorted(rates)
    # a faster channel never needs a larger buffer
    assert all(s1 >= s2 for s1, s2 in zip(sizes, sizes[1:]))
    assert all(0 <= f <= b for _, b, f in buckets)
    p = tmp_path / "leakybucketparam.cfg"
    write_buffer(str(p), buckets)
    assert read_buffer(str(p)) == buckets


def test_vui_write_parse_roundtrip():
    from jm_tpu.decoder.decoder import H264Decoder
    from jm_tpu.encoder.encoder import Encoder, EncoderConfig
    enc = Encoder(EncoderConfig(width=64, height=48, enable_vui=True,
                                frame_rate=25.0))
    Y = np.full((48, 64), 90, np.uint8)
    C = np.full((24, 32), 128, np.uint8)
    out = enc.encode_frame(Y, C, C)
    d = H264Decoder()
    frames = d.decode_annexb(out)
    assert len(frames) == 1
    sps = next(iter(d.sps_map.values()))
    assert sps.vui is not None
    ts, nu = sps.vui["time_scale"], sps.vui["num_units_in_tick"]
    assert ts / (2 * nu) == 25.0
    assert sps.vui["fixed_frame_rate"]


def test_decoder_statistics(golden_dir=None):
    import pathlib
    from jm_tpu.decoder.decoder import H264Decoder
    g = pathlib.Path(__file__).parent / "golden"
    d = H264Decoder()
    frames = d.decode_annexb((g / "cabac_pp.264").read_bytes())
    st = d.stats
    assert st["pictures"] == len(frames) == 3
    assert st["slices"] >= 3
    total_mbs = st["mb_intra4"] + st["mb_intra8"] + st["mb_intra16"] + \
        st["mb_inter"] + st["mb_ipcm"]
    assert total_mbs == 3 * 99
    assert st["nal_count"][7] == 1 and st["nal_count"][8] == 1
    assert sum(st["nal_bits"].values()) >= 8 * len(
        (g / "cabac_pp.264").read_bytes()) - 200 * 8
