"""Bitstream syntax writers: SPS/PPS (spec 7.3.2), slice header (7.3.3),
and the CAVLC macroblock layer (7.3.5) serialized from PictureData.

Capability parity with lencod/src/parset.c (GenerateSeq_parameter_set_rbsp
:649, GeneratePic_parameter_set_rbsp:877), header.c (SliceHeader:56) and
macroblock.c (write_macroblock:2810, write_{i,p}_slice_MB_layer) — new
design: serialization is a pure function of the decided PictureData, fully
decoupled from mode decision (the reference interleaves them).
"""

from __future__ import annotations

import numpy as np

from ..bitstream.bitwriter import BitWriter
from ..bitstream.nal import NalUnitType, annexb_bytes
from ..common.predict_ctx import CODE2RASTER, PredCtx
from ..common.types import SliceType
from .cavlc_write import write_residual_block

# inverse of spec Table 9-4 (decoder's CBP_MAP_CHROMA): cbp -> codeNum
from ..decoder.mb_parse import CBP_MAP_CHROMA, CBP_MAP_MONO

CBP_INV_CHROMA_INTRA = {int(cbp): i for i, (cbp, _) in enumerate(CBP_MAP_CHROMA)}
CBP_INV_CHROMA_INTER = {int(cbp): i for i, (_, cbp) in enumerate(CBP_MAP_CHROMA)}
CBP_INV_MONO_INTRA = {int(cbp): i for i, (cbp, _) in enumerate(CBP_MAP_MONO)}
CBP_INV_MONO_INTER = {int(cbp): i for i, (_, cbp) in enumerate(CBP_MAP_MONO)}


def write_sps(sps) -> bytes:
    bw = BitWriter()
    _write_sps_data(bw, sps)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def write_subset_sps(sps, view_ids=(0, 1)) -> bytes:
    """Subset SPS for Stereo High (NAL 15, spec 7.3.2.1.3 +
    H.7.3.2.1.4 sps_mvc_extension). Unlike the reference's writer (which
    omits the FRExt block for profiles 118/128 — the JM 19.0 bug noted in
    decoder/parset.parse_subset_sps), this emits the spec-correct layout,
    which the reference ldecod parses fine. Stereo ref structure: the
    dependent view predicts from view 0 in both anchor and non-anchor
    access units (list 0 only)."""
    import copy
    sub = copy.copy(sps)
    sub.profile_idc = 128                     # Stereo High
    bw = BitWriter()
    _write_sps_data(bw, sub)
    bw.flag(1)                                # bit_equal_to_one
    bw.ue(len(view_ids) - 1)                  # num_views_minus1
    for v in view_ids:
        bw.ue(v)
    for _ in view_ids[1:]:                    # anchor refs
        bw.ue(1)                              # num_anchor_refs_l0
        bw.ue(0)                              # anchor_ref_l0 -> view 0
        bw.ue(0)                              # num_anchor_refs_l1
    for _ in view_ids[1:]:                    # non-anchor refs
        bw.ue(1)
        bw.ue(0)
        bw.ue(0)
    bw.ue(0)                                  # num_level_values_signalled-1
    bw.u(sps.level_idc, 8)
    bw.ue(0)                                  # num_applicable_ops_minus1
    bw.u(0, 3)                                # op temporal_id
    bw.ue(0)                                  # num_target_views_minus1
    bw.ue(view_ids[-1])                       # target view id
    bw.ue(len(view_ids) - 1)                  # op num_views_minus1
    bw.flag(0)                                # mvc_vui_parameters_present
    bw.flag(0)                                # additional_extension2_flag
                                              # (7.3.2.1.3 — a 1 here sends
                                              # decoders into the
                                              # additional-data loop)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def _write_sps_data(bw: BitWriter, sps) -> None:
    bw.u(sps.profile_idc, 8)
    bw.u(sps.constraint_set_flags, 8)
    bw.u(sps.level_idc, 8)
    bw.ue(sps.seq_parameter_set_id)
    if sps.profile_idc in (100, 110, 122, 244, 44, 118, 128):
        bw.ue(sps.chroma_format_idc)
        if sps.chroma_format_idc == 3:
            bw.flag(sps.separate_colour_plane_flag)
        bw.ue(sps.bit_depth_luma_minus8)
        bw.ue(sps.bit_depth_chroma_minus8)
        bw.flag(sps.qpprime_y_zero_transform_bypass_flag)
        tx = getattr(sps, "tx_scaling", None)
        if sps.seq_scaling_matrix_present_flag and tx:
            bw.flag(1)
            _write_scaling_lists(bw, tx,
                                 8 if sps.chroma_format_idc != 3 else 12)
        else:
            bw.flag(0)  # seq_scaling_matrix_present
    bw.ue(sps.log2_max_frame_num_minus4)
    bw.ue(sps.pic_order_cnt_type)
    if sps.pic_order_cnt_type == 0:
        bw.ue(sps.log2_max_pic_order_cnt_lsb_minus4)
    elif sps.pic_order_cnt_type == 1:
        # spec 7.3.2.1.1 expected-POC-cycle syntax (lencod parset.c
        # GenerateSeq_parameter_set_rbsp POC mode 1 fields)
        bw.flag(sps.delta_pic_order_always_zero_flag)
        bw.se(sps.offset_for_non_ref_pic)
        bw.se(sps.offset_for_top_to_bottom_field)
        bw.ue(len(sps.offset_for_ref_frame))
        for off in sps.offset_for_ref_frame:
            bw.se(off)
    bw.ue(sps.max_num_ref_frames)
    bw.flag(sps.gaps_in_frame_num_value_allowed_flag)
    bw.ue(sps.pic_width_in_mbs_minus1)
    bw.ue(sps.pic_height_in_map_units_minus1)
    bw.flag(sps.frame_mbs_only_flag)
    if not sps.frame_mbs_only_flag:
        bw.flag(sps.mb_adaptive_frame_field_flag)
    bw.flag(sps.direct_8x8_inference_flag)
    bw.flag(sps.frame_cropping_flag)
    if sps.frame_cropping_flag:
        bw.ue(sps.frame_crop_left_offset)
        bw.ue(sps.frame_crop_right_offset)
        bw.ue(sps.frame_crop_top_offset)
        bw.ue(sps.frame_crop_bottom_offset)
    vui = getattr(sps, "vui", None)
    if vui:
        bw.flag(1)
        _write_vui(bw, vui)
    else:
        bw.flag(0)  # vui_parameters_present


def _write_vui(bw: BitWriter, v: dict) -> None:
    """Inverse of the decoder's _parse_vui (parset.py:161); mirrors
    lencod/src/parset.c GenerateVUI_parameters_rbsp:1048 field order."""
    if "aspect_ratio_idc" in v:
        bw.flag(1)
        bw.u(v["aspect_ratio_idc"], 8)
        if v["aspect_ratio_idc"] == 255:
            bw.u(v["sar_width"], 16)
            bw.u(v["sar_height"], 16)
    else:
        bw.flag(0)
    if "overscan_appropriate" in v:
        bw.flag(1)
        bw.flag(v["overscan_appropriate"])
    else:
        bw.flag(0)
    if "video_format" in v:
        bw.flag(1)
        bw.u(v["video_format"], 3)
        bw.flag(v.get("video_full_range", 0))
        if "colour_primaries" in v:
            bw.flag(1)
            bw.u(v["colour_primaries"], 8)
            bw.u(v["transfer_characteristics"], 8)
            bw.u(v["matrix_coefficients"], 8)
        else:
            bw.flag(0)
    else:
        bw.flag(0)
    if "chroma_sample_loc_type_top" in v:
        bw.flag(1)
        bw.ue(v["chroma_sample_loc_type_top"])
        bw.ue(v["chroma_sample_loc_type_bottom"])
    else:
        bw.flag(0)
    if "num_units_in_tick" in v:
        bw.flag(1)
        bw.u(v["num_units_in_tick"], 32)
        bw.u(v["time_scale"], 32)
        bw.flag(v.get("fixed_frame_rate", 1))
    else:
        bw.flag(0)

    def hrd(h):
        bw.ue(h["cpb_cnt"] - 1)
        bw.u(h["bit_rate_scale"], 4)
        bw.u(h["cpb_size_scale"], 4)
        for br_v, cpb_v, cbr_v in h["cpb"]:
            bw.ue(br_v)
            bw.ue(cpb_v)
            bw.flag(cbr_v)
        bw.u(h["initial_cpb_removal_delay_length"] - 1, 5)
        bw.u(h["cpb_removal_delay_length"] - 1, 5)
        bw.u(h["dpb_output_delay_length"] - 1, 5)
        bw.u(h["time_offset_length"], 5)

    for key in ("nal_hrd", "vcl_hrd"):
        if key in v:
            bw.flag(1)
            hrd(v[key])
        else:
            bw.flag(0)
    if "nal_hrd" in v or "vcl_hrd" in v:
        bw.flag(v.get("low_delay_hrd", 0))
    bw.flag(v.get("pic_struct_present", 0))
    if "max_dec_frame_buffering" in v:
        bw.flag(1)
        bw.flag(v.get("motion_vectors_over_pic_boundaries", 1))
        bw.ue(v.get("max_bytes_per_pic_denom", 0))
        bw.ue(v.get("max_bits_per_mb_denom", 0))
        bw.ue(v.get("log2_max_mv_length_horizontal", 16))
        bw.ue(v.get("log2_max_mv_length_vertical", 16))
        bw.ue(v.get("max_num_reorder_frames", 0))
        bw.ue(v["max_dec_frame_buffering"])
    else:
        bw.flag(0)


def _write_scaling_lists(bw: BitWriter, tx, n_lists: int) -> None:
    """SPS/PPS scaling-list loop (spec 7.3.2.1.1 / 7.3.2.2; lencod
    parset.c Scaling_List). tx = (present[n], zigzag lists)."""
    from .qmatrix import write_scaling_list
    present, lists = tx
    for i in range(n_lists):
        p = present[i] if i < len(present) else 0
        bw.flag(1 if p else 0)
        if p:
            write_scaling_list(bw, lists[i], 16 if i < 6 else 64)


def write_pps(pps) -> bytes:
    bw = BitWriter()
    bw.ue(pps.pic_parameter_set_id)
    bw.ue(pps.seq_parameter_set_id)
    bw.flag(pps.entropy_coding_mode_flag)
    bw.flag(pps.bottom_field_pic_order_in_frame_present_flag)
    bw.ue(pps.num_slice_groups_minus1)
    if pps.num_slice_groups_minus1 > 0:
        # FMO slice-group syntax (spec 7.3.2.2; lencod/src/parset.c:877)
        t = pps.slice_group_map_type
        bw.ue(t)
        if t == 0:
            for r in pps.run_length_minus1:
                bw.ue(r)
        elif t == 2:
            for tl, br_ in zip(pps.top_left, pps.bottom_right):
                bw.ue(tl)
                bw.ue(br_)
        elif t in (3, 4, 5):
            bw.flag(pps.slice_group_change_direction_flag)
            bw.ue(pps.slice_group_change_rate_minus1)
        elif t == 6:
            ids = pps.slice_group_id
            bw.ue(len(ids) - 1)
            nbits = max(1, pps.num_slice_groups_minus1.bit_length())
            for g in ids:
                bw.u(g, nbits)
    bw.ue(pps.num_ref_idx_l0_default_active_minus1)
    bw.ue(pps.num_ref_idx_l1_default_active_minus1)
    bw.flag(pps.weighted_pred_flag)
    bw.u(pps.weighted_bipred_idc, 2)
    bw.se(pps.pic_init_qp_minus26)
    bw.se(pps.pic_init_qs_minus26)
    bw.se(pps.chroma_qp_index_offset)
    bw.flag(pps.deblocking_filter_control_present_flag)
    bw.flag(pps.constrained_intra_pred_flag)
    bw.flag(pps.redundant_pic_cnt_present_flag)
    ptx = getattr(pps, "tx_scaling", None)
    if pps.transform_8x8_mode_flag or \
            (pps.pic_scaling_matrix_present_flag and ptx):
        # PPS FRExt extension (spec 7.3.2.2 more_rbsp_data section)
        bw.flag(pps.transform_8x8_mode_flag)
        if pps.pic_scaling_matrix_present_flag and ptx:
            bw.flag(1)
            _write_scaling_lists(
                bw, ptx, 6 + (2 if pps.transform_8x8_mode_flag else 0))
        else:
            bw.flag(0)                     # pic_scaling_matrix_present_flag
        bw.se(pps.cr_qp_offset)            # second_chroma_qp_index_offset
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def _write_pred_weight_table(bw: BitWriter, slice_type, wp_l0, wp_l1,
                             num_l0: int, num_l1: int) -> None:
    """Inverse of the decoder's _read_pred_weight_table (header.py:137);
    table entries are {luma: (w, o), chroma: ((w, o), (w, o))}. 4:2:0."""
    from .wp_est import CHROMA_DENOM, LUMA_DENOM
    bw.ue(LUMA_DENOM)
    bw.ue(CHROMA_DENOM)
    dl, dc = 1 << LUMA_DENOM, 1 << CHROMA_DENOM
    for table, nref, is_l1 in ((wp_l0, num_l0, False), (wp_l1, num_l1, True)):
        if is_l1 and slice_type != SliceType.B:
            break
        for r in range(nref):
            e = table[r] if r < len(table) else {
                "luma": (dl, 0), "chroma": ((dc, 0), (dc, 0))}
            lw, lo = e["luma"]
            if (lw, lo) != (dl, 0):
                bw.flag(1)
                bw.se(lw)
                bw.se(lo)
            else:
                bw.flag(0)
            cws = [tuple(c) for c in e["chroma"]]
            if any(c != (dc, 0) for c in cws):
                bw.flag(1)
                for cw, co in cws:
                    bw.se(cw)
                    bw.se(co)
            else:
                bw.flag(0)


def write_slice_header(bw: BitWriter, sps, pps, *, slice_type: SliceType,
                       frame_num: int, idr: bool, idr_pic_id: int = 0,
                       qp: int, first_mb: int = 0, poc_lsb: int = 0,
                       num_ref_idx_l0: int = 1, cabac_init_idc: int = 0,
                       num_ref_idx_l1: int = 1, is_ref: bool = True,
                       direct_spatial: bool = True,
                       slice_group_change_cycle: int = 0,
                       wp_l0=None, wp_l1=None,
                       long_term_flag: int = 0, mmco_ops=None,
                       ref_mod_l0=None, ref_mod_l1=None,
                       qs: int = 0, field_pic: int = 0,
                       bottom_field: int = 0,
                       redundant_pic_cnt: int = 0) -> None:
    """Spec 7.3.3 slice header (frame or field pictures; B adds
    direct_spatial_mv_pred_flag + list1 actives; non-reference slices omit
    dec_ref_pic_marking — lencod/src/header.c:116 SliceHeader)."""
    bw.ue(first_mb)
    bw.ue(int(slice_type) + 5)      # all slices in picture share the type
    bw.ue(pps.pic_parameter_set_id)
    bw.u(frame_num, sps.log2_max_frame_num_minus4 + 4)
    if not sps.frame_mbs_only_flag:
        bw.flag(field_pic)
        if field_pic:
            bw.flag(bottom_field)
    if idr:
        bw.ue(idr_pic_id)
    if sps.pic_order_cnt_type == 0:
        bw.u(poc_lsb, sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
    if pps.redundant_pic_cnt_present_flag:
        bw.ue(redundant_pic_cnt)
    if slice_type == SliceType.B:
        bw.flag(1 if direct_spatial else 0)
    if slice_type in (SliceType.P, SliceType.SP, SliceType.B):
        override = ((num_ref_idx_l0 - 1) !=
                    pps.num_ref_idx_l0_default_active_minus1)
        if slice_type == SliceType.B:
            override = override or ((num_ref_idx_l1 - 1) !=
                                    pps.num_ref_idx_l1_default_active_minus1)
        bw.flag(1 if override else 0)
        if override:
            bw.ue(num_ref_idx_l0 - 1)
            if slice_type == SliceType.B:
                bw.ue(num_ref_idx_l1 - 1)
        # ref_pic_list_modification (spec 7.3.3.1): (idc, value) commands
        for mods, applies in ((ref_mod_l0, True),
                              (ref_mod_l1, slice_type == SliceType.B)):
            if not applies:
                continue
            if mods:
                bw.flag(1)
                for idc, val in mods:
                    bw.ue(idc)
                    bw.ue(val)
                bw.ue(3)
            else:
                bw.flag(0)
    if (pps.weighted_pred_flag
            and slice_type in (SliceType.P, SliceType.SP)) or \
            (pps.weighted_bipred_idc == 1 and slice_type == SliceType.B):
        # pred_weight_table (spec 7.3.3.2; lencod/src/header.c:438)
        _write_pred_weight_table(bw, slice_type, wp_l0 or [], wp_l1 or [],
                                 num_ref_idx_l0, num_ref_idx_l1)
    if is_ref:
        if idr:
            bw.flag(0)  # no_output_of_prior_pics
            bw.flag(long_term_flag)
        elif mmco_ops:
            # dec_ref_pic_marking, adaptive mode (spec 7.3.3.3;
            # lencod/src/header.c dec_ref_pic_marking:373)
            bw.flag(1)
            for op in mmco_ops:
                code, v1 = op[0], op[1]
                bw.ue(code)
                if code in (1, 2, 3, 4, 6):
                    bw.ue(v1)
                if code == 3:
                    bw.ue(op[2])
            bw.ue(0)    # end of ops
        else:
            bw.flag(0)  # adaptive_ref_pic_marking_mode_flag (sliding window)
    if pps.entropy_coding_mode_flag and slice_type not in (SliceType.I, SliceType.SI):
        bw.ue(cabac_init_idc)
    bw.se(qp - 26 - pps.pic_init_qp_minus26)
    if slice_type in (SliceType.SP, SliceType.SI):
        if slice_type == SliceType.SP:
            bw.flag(0)                   # sp_for_switch_flag
        bw.se(qs - 26 - getattr(pps, "pic_init_qs_minus26", 0))
    if pps.deblocking_filter_control_present_flag:
        # the encoder only raises the control flag to switch the loop
        # filter OFF (LoopFilterDisable; lencod header.c DeblockFilter)
        bw.ue(1)
    if pps.num_slice_groups_minus1 > 0 and \
            pps.slice_group_map_type in (3, 4, 5):
        units = sps.pic_width_in_mbs * sps.frame_height_in_mbs
        rate = pps.slice_group_change_rate_minus1 + 1
        # JM: len = Ceil(units / rate), CeilLog2(len + 1) bits (lencod
        # header.c:243, ldecod header.c:326-332)
        max_cycle = -(-units // rate)
        nbits = max(1, max_cycle.bit_length())
        bw.u(slice_group_change_cycle, nbits)


class MBWriter:
    """Serializes decided macroblocks of one slice in raster order."""

    def __init__(self, bw: BitWriter, pic, sps, pps, slice_qp: int):
        self.bw = bw
        # data partitioning (D3): residual SEs route to partition B
        # (intra MBs) / C (inter MBs) when set (assignSE2partition_DP,
        # lencod header.c:37)
        self.bw_b = None
        self.bw_c = None
        self.pic = pic
        self.sps = sps
        self.pps = pps
        self.pctx = PredCtx(pic)
        self.qp = slice_qp          # running QP for delta coding
        self.skip_run = 0

    # ---- residual ---------------------------------------------------------

    def _res_bw(self, addr: int):
        if self.bw_b is None:
            return self.bw
        from ..decoder.mb_parse import MB_INTER
        return (self.bw_b if self.pic.mb_class[addr] != MB_INTER
                else self.bw_c)

    def _write_luma_residual(self, addr: int, cbp: int, is_i16: bool) -> None:
        pic, bw = self.pic, self._res_bw(addr)
        if is_i16:
            nc = self.pctx.nc_luma(addr, 0)
            write_residual_block(bw, pic.luma_dc[addr], nc, 16)
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            for sub in range(4):
                blk = int(CODE2RASTER[blk8 * 4 + sub])
                nc = self.pctx.nc_luma(addr, blk)
                if is_i16:
                    write_residual_block(bw, pic.luma_coef[addr, blk, 1:], nc, 15)
                else:
                    write_residual_block(bw, pic.luma_coef[addr, blk], nc, 16)

    def _write_chroma_residual(self, addr: int, cbp: int) -> None:
        pic, bw = self.pic, self._res_bw(addr)
        cbp_chroma = cbp >> 4
        nb = 2 * pic.n_crows
        dc_nc = -1 if pic.n_crows == 2 else -2   # ChromaDC 4:2:0 / 4:2:2
        if cbp_chroma & 3:
            for comp in range(2):
                write_residual_block(bw, pic.chroma_dc[addr, comp],
                                     dc_nc, nb)
        if cbp_chroma & 2:
            for comp in range(2):
                for blk in range(nb):
                    nc = self.pctx.nc_chroma(addr, comp, blk)
                    write_residual_block(
                        bw, pic.chroma_coef[addr, comp, blk, 1:], nc, 15)

    def _write_qp_delta(self, addr: int) -> None:
        dq = int(self.pic.qp[addr]) - self.qp
        if dq > 25:
            dq -= 52
        elif dq < -26:
            dq += 52
        self.bw.se(dq)
        self.qp = int(self.pic.qp[addr])

    # ---- intra ------------------------------------------------------------

    def _write_intra_mb(self, addr: int, p_slice: bool,
                        intra_base: int | None = None) -> None:
        pic, bw = self.pic, self.bw
        base = (intra_base if intra_base is not None
                else (5 if p_slice else 0))
        if pic.mb_class[addr] == 3:          # I_PCM (mb_read.c:649 twin)
            bw.ue(base + 25)
            bw.align_zero()                  # pcm_alignment_zero_bit
            for v in pic.ipcm_luma[addr].ravel():
                bw.u(int(v), 8)
            ch = pic.ipcm_chroma[addr]
            if ch is not None:
                for v in ch.ravel():
                    bw.u(int(v), 8)
            return
        if pic.mb_class[addr] == 1:          # I_NxN (4x4)
            bw.ue(base + 0)
            if self.pps.transform_8x8_mode_flag:
                bw.flag(0)   # transform_size_8x8_flag (I8x8 encode: later)
            for code_idx in range(16):
                blk = int(CODE2RASTER[code_idx])
                mode = int(pic.i4_modes[addr, blk])
                pred = self.pctx.pred_intra4_mode(addr, blk)
                if mode == pred:
                    bw.flag(1)
                else:
                    bw.flag(0)
                    rem = mode if mode < pred else mode - 1
                    bw.u(rem, 3)
            bw.ue(int(pic.chroma_mode[addr]))
            cbp = int(pic.cbp[addr])
            bw.ue(CBP_INV_CHROMA_INTRA[cbp])
            if cbp:
                self._write_qp_delta(addr)
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
            self._write_chroma_residual(addr, cbp)
        else:                                 # I_16x16
            cbp = int(pic.cbp[addr])
            cbp_luma_flag = 1 if (cbp & 15) else 0
            k = 1 + int(pic.i16_mode[addr]) + ((cbp >> 4) << 2) + cbp_luma_flag * 12
            bw.ue(base + k)
            bw.ue(int(pic.chroma_mode[addr]))
            self._write_qp_delta(addr)
            self._write_luma_residual(addr, cbp & 15, is_i16=True)
            self._write_chroma_residual(addr, cbp)

    # ---- inter (P: 16x16/16x8/8x16/8x8-with-8x8-subs) ----------------------

    PARTS = {0: [(0, 0, 4, 4)],
             1: [(0, 0, 4, 2), (0, 2, 4, 2)],
             2: [(0, 0, 2, 4), (2, 0, 2, 4)],
             3: [(0, 0, 2, 2), (2, 0, 2, 2), (0, 2, 2, 2), (2, 2, 2, 2)]}

    def _write_luma_residual_8x8(self, addr: int, cbp: int) -> None:
        """CAVLC 8x8: each coded 8x8 written as 4 interleaved 4x4 blocks
        (mirror of MBParser._read_luma_residual_8x8)."""
        pic, bw = self.pic, self.bw
        for blk8 in range(4):
            if not (cbp & (1 << blk8)):
                continue
            by0, bx0 = (blk8 // 2) * 2, (blk8 % 2) * 2
            for dy in range(2):
                for dx in range(2):
                    blk = (by0 + dy) * 4 + bx0 + dx
                    sub = 2 * dy + dx
                    nc = self.pctx.nc_luma(addr, blk)
                    coeffs = pic.luma_coef8[addr, blk8, sub::4]
                    write_residual_block(bw, coeffs, nc, 16)

    def _maybe_write_inter_transform8x8(self, addr: int, cbp: int) -> None:
        pic = self.pic
        # transform flag is absent when any sub-partition is below 8x8
        # (decoder twin: mb_parse allow8 gate)
        allow8 = (int(pic.inter_mode[addr]) != 3
                  or not pic.sub_mode[addr].any())
        if self.pps.transform_8x8_mode_flag and (cbp & 15) and allow8:
            self.bw.flag(1 if pic.transform8x8[addr] else 0)

    def _write_p_inter_mb(self, addr: int, num_ref: int) -> None:
        pic, bw = self.pic, self.bw
        mode = int(pic.inter_mode[addr])
        if mode < 0:
            mode = 0
        bw.ue(mode)
        parts = self.PARTS[mode]
        if mode == 3:
            # sub_mb_pred (spec 7.3.5.2): sub_mb_type[4], ref_idx[4], mvds
            from .me import SUB_PARTS
            for q in range(4):
                bw.ue(int(pic.sub_mode[addr, q]))
            if num_ref > 1:
                for q in range(4):
                    bw.te(int(pic.ref_idx[addr, q]), num_ref - 1)
            for q in range(4):
                qx, qy = (q % 2) * 2, (q // 2) * 2
                ref = int(pic.ref_idx[addr, q])
                for (sx, sy, sw, sh) in SUB_PARTS[int(pic.sub_mode[addr, q])]:
                    bx, by = qx + sx, qy + sy
                    pred = self.pctx.mv_pred(addr, bx, by, sw, sh, ref)
                    mv = pic.mv[addr, by * 4 + bx]
                    bw.se(int(mv[0] - pred[0]))
                    bw.se(int(mv[1] - pred[1]))
        else:
            if num_ref > 1:
                for (bx, by, _bw, _bh) in parts:
                    q = (by // 2) * 2 + bx // 2
                    bw.te(int(pic.ref_idx[addr, q]), num_ref - 1)
            for (bx, by, bw_, bh_) in parts:
                q = (by // 2) * 2 + bx // 2
                ref = int(pic.ref_idx[addr, q])
                pred = self.pctx.mv_pred(addr, bx, by, bw_, bh_, ref)
                mv = pic.mv[addr, by * 4 + bx]
                bw.se(int(mv[0] - pred[0]))
                bw.se(int(mv[1] - pred[1]))
        cbp = int(pic.cbp[addr])
        bw.ue(CBP_INV_CHROMA_INTER[cbp])
        self._maybe_write_inter_transform8x8(addr, cbp)
        if cbp:
            self._write_qp_delta(addr)
        if pic.transform8x8[addr]:
            self._write_luma_residual_8x8(addr, cbp & 15)
        else:
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
        self._write_chroma_residual(addr, cbp)

    # ---- MB dispatch -------------------------------------------------------

    def write_mb(self, addr: int, slice_type: SliceType, num_ref: int,
                 num_ref_l1: int = 1) -> None:
        pic, bw = self.pic, self.bw
        if slice_type in (SliceType.P, SliceType.SP, SliceType.B):
            if pic.skip[addr]:
                self.skip_run += 1
                return
            bw.ue(self.skip_run)
            self.skip_run = 0
            if pic.mb_class[addr] == 0:
                if slice_type == SliceType.B:
                    self._write_b_inter_mb(addr, num_ref, num_ref_l1)
                else:
                    self._write_p_inter_mb(addr, num_ref)
            else:
                self._write_intra_mb(addr, p_slice=True,
                                     intra_base=23 if slice_type == SliceType.B
                                     else 5)
        else:
            self._write_intra_mb(addr, p_slice=False)

    def _write_b_inter_mb(self, addr: int, nref0: int, nref1: int) -> None:
        """B MB serialization mirroring MBParser._parse_b_mb (16x16 modes
        and direct-with-residual; coded mb_type per B_MBTYPE)."""
        from ..decoder.b_slice import PD_BI, PD_L0, PD_L1
        pic, bw = self.pic, self.bw
        if pic.b_direct[addr]:
            bw.ue(0)
        else:
            pd = int(pic.pdir[addr, 0])
            coded = {PD_L0: 1, PD_L1: 2, PD_BI: 3}[pd]
            bw.ue(coded)
            if pd in (PD_L0, PD_BI) and nref0 > 1:
                bw.te(int(pic.ref_idx[addr, 0]), nref0 - 1)
            if pd in (PD_L1, PD_BI) and nref1 > 1:
                bw.te(int(pic.ref_idx_l1[addr, 0]), nref1 - 1)
            for lst in (0, 1):
                if (lst == 0 and pd in (PD_L0, PD_BI)) or \
                        (lst == 1 and pd in (PD_L1, PD_BI)):
                    ref = int((pic.ref_idx if lst == 0 else
                               pic.ref_idx_l1)[addr, 0])
                    pred = self.pctx.mv_pred(addr, 0, 0, 4, 4, ref, lst)
                    mv = (pic.mv if lst == 0 else pic.mv_l1)[addr, 0]
                    bw.se(int(mv[0] - pred[0]))
                    bw.se(int(mv[1] - pred[1]))
        cbp = int(pic.cbp[addr])
        bw.ue(CBP_INV_CHROMA_INTER[cbp])
        self._maybe_write_inter_transform8x8(addr, cbp)
        if cbp:
            self._write_qp_delta(addr)
        if pic.transform8x8[addr]:
            self._write_luma_residual_8x8(addr, cbp & 15)
        else:
            self._write_luma_residual(addr, cbp & 15, is_i16=False)
        self._write_chroma_residual(addr, cbp)

    def finish(self, slice_type: SliceType) -> None:
        if slice_type in (SliceType.P, SliceType.SP, SliceType.B) \
                and self.skip_run > 0:
            self.bw.ue(self.skip_run)
            self.skip_run = 0


def serialize_slice_dp(pic, sps, pps, *, slice_id: int = 0,
                       mb_addrs=None, **kw) -> list[bytes]:
    """Serialize one slice as three data partitions (D3): partition A =
    slice header + slice_id + MB headers/mvd/cbp, B = intra residual SEs,
    C = inter residual SEs behind a slice_id partition header
    (lencod header.c Partition_BC_Header:596, assignSE2partition map).
    Returns [rbsp_a, rbsp_b, rbsp_c]; empty partitions return b""."""
    if mb_addrs is None:
        mb_addrs = range(pic.n_mbs)
    mb_addrs = list(mb_addrs)
    slice_type = kw["slice_type"]
    bw = BitWriter()
    write_slice_header(bw, sps, pps,
                       first_mb=mb_addrs[0],
                       **{k: v for k, v in kw.items()
                          if k not in ("mb_addrs",)})
    bw.ue(slice_id)                     # DP_A slice_id (image.c:1628)
    bwb, bwc = BitWriter(), BitWriter()
    bwb.ue(slice_id)
    bwc.ue(slice_id)
    w = MBWriter(bw, pic, sps, pps, kw["qp"])
    w.bw_b, w.bw_c = bwb, bwc
    for addr in mb_addrs:
        w.write_mb(addr, slice_type, kw.get("num_ref_idx_l0", 1), 1)
    w.finish(slice_type)
    out = []
    for b in (bw, bwb, bwc):
        if b is not bw and b.bitpos <= _ue_bits(slice_id):
            out.append(b"")             # no residual SEs landed here
        else:
            b.rbsp_trailing_bits()
            out.append(b.get_bytes())
    return out


def _ue_bits(v: int) -> int:
    return 2 * ((v + 1).bit_length() - 1) + 1


def serialize_slice(pic, sps, pps, *, slice_type: SliceType, frame_num: int,
                    idr: bool, qp: int, poc_lsb: int = 0, idr_pic_id: int = 0,
                    num_ref_idx_l0: int = 1, num_ref_idx_l1: int = 1,
                    is_ref: bool = True, mb_addrs=None,
                    slice_group_change_cycle: int = 0,
                    wp_l0=None, wp_l1=None,
                    long_term_flag: int = 0, mmco_ops=None,
                    ref_mod_l0=None, ref_mod_l1=None, qs: int = 0,
                    field_pic: int = 0, bottom_field: int = 0,
                    redundant_pic_cnt: int = 0) -> bytes:
    """Serialize one slice; mb_addrs = MB addresses in decode order
    (default: the whole picture in raster order); returns RBSP."""
    if mb_addrs is None:
        mb_addrs = range(pic.n_mbs)
    mb_addrs = list(mb_addrs)
    bw = BitWriter()
    write_slice_header(bw, sps, pps, slice_type=slice_type,
                       frame_num=frame_num, idr=idr, idr_pic_id=idr_pic_id,
                       qp=qp, poc_lsb=poc_lsb, num_ref_idx_l0=num_ref_idx_l0,
                       num_ref_idx_l1=num_ref_idx_l1, is_ref=is_ref,
                       first_mb=mb_addrs[0],
                       slice_group_change_cycle=slice_group_change_cycle,
                       wp_l0=wp_l0, wp_l1=wp_l1,
                       long_term_flag=long_term_flag, mmco_ops=mmco_ops,
                       ref_mod_l0=ref_mod_l0, ref_mod_l1=ref_mod_l1, qs=qs,
                       field_pic=field_pic, bottom_field=bottom_field,
                       redundant_pic_cnt=redundant_pic_cnt)
    native = _native_slice_data(bw, pic, pps, slice_type, qp,
                                num_ref_idx_l0, mb_addrs)
    if native is not None:
        return native
    w = MBWriter(bw, pic, sps, pps, qp)
    for addr in mb_addrs:
        w.write_mb(addr, slice_type, num_ref_idx_l0, num_ref_idx_l1)
    w.finish(slice_type)
    bw.rbsp_trailing_bits()
    return bw.get_bytes()


def _native_slice_data(bw, pic, pps, slice_type, qp, num_ref,
                       mb_addrs) -> bytes | None:
    """Serialize the MB layer via the C++ runtime (native/jm_enc.cpp
    cavlc_slice_data) when it covers this slice; None -> Python path.
    The native writer is the byte-exact twin of MBWriter (tested in
    tests/test_native.py); B slices and IPCM stay in Python for now."""
    from .. import native as N
    if not N.available or slice_type not in (SliceType.P, SliceType.SP,
                                             SliceType.I):
        return None
    addrs = np.ascontiguousarray(mb_addrs, np.int32)
    if (pic.mb_class[addrs] == 3).any():         # IPCM
        return None
    c = np.ascontiguousarray
    pic_dict = {
        "mb_class": c(pic.mb_class, np.int8),
        "skip": c(pic.skip, np.uint8),
        "inter_mode": c(pic.inter_mode, np.int8),
        "sub_mode": c(pic.sub_mode, np.int8),
        "ref_idx": c(pic.ref_idx, np.int8),
        "mv": c(pic.mv, np.int32),
        "cbp": c(pic.cbp, np.int32),
        "qp": c(pic.qp, np.int32),
        "slice_id": c(pic.slice_id, np.int32),
        "i4_modes": c(pic.i4_modes, np.int8),
        "i16_mode": c(pic.i16_mode, np.int8),
        "chroma_mode": c(pic.chroma_mode, np.int8),
        "luma_coef": c(pic.luma_coef, np.int32),
        "luma_dc": c(pic.luma_dc, np.int32),
        "luma_coef8": c(pic.luma_coef8, np.int32),
        "transform8x8": c(pic.transform8x8, np.uint8),
        "luma_nnz": c(pic.luma_nnz, np.int32),
        "chroma_dc": c(pic.chroma_dc, np.int32),
        "chroma_coef": c(pic.chroma_coef, np.int32),
        "chroma_nnz": c(pic.chroma_nnz, np.int32),
        "mb_w": pic.mb_w,
        "crows": pic.n_crows,
    }
    try:
        return N.cavlc_slice_data(
            bytes(bw.buf), bw.acc, bw.nacc, pic_dict, addrs,
            0 if slice_type in (SliceType.P, SliceType.SP) else 2,
            int(num_ref),
            int(pps.transform_8x8_mode_flag), int(qp))
    except ValueError:
        return None
