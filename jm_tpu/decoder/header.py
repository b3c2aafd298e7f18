"""Slice header parsing (spec 7.3.3) + POC derivation (spec 8.2.1).

Capability parity with ldecod/src/header.c (FirstPartOfSliceHeader:76,
RestOfSliceHeader:113, ref_pic_list_reordering:350, pred_weight_table:530,
dec_ref_pic_marking:635, decode_poc:720) — new implementation.
"""

from __future__ import annotations

from ..bitstream.bitreader import BitReader
from ..bitstream.nal import NalUnit, NalUnitType
from ..common.types import MMCOOp, PPS, RefPicListMod, SliceHeader, SliceType, SPS


def parse_slice_header(nal: NalUnit, sps_map: dict[int, SPS],
                       pps_map: dict[int, PPS]) -> tuple[SliceHeader, BitReader]:
    """Parse a slice header; returns (header, reader positioned at slice data)."""
    br = BitReader(nal.rbsp)
    h = SliceHeader()
    h.nal_ref_idc = nal.nal_ref_idc
    # MVC slice extensions with non_idr_flag == 0 carry the full IDR-form
    # header (idr_pic_id + IDR dec_ref_pic_marking, ldecod header.c:651)
    h.is_idr = (nal.nal_unit_type == NalUnitType.IDR
                or (nal.nal_unit_type == NalUnitType.SLICE_EXT
                    and nal.mvc_ext is not None
                    and nal.mvc_ext.get("non_idr_flag") == 0))

    h.first_mb_in_slice = br.ue()
    st = br.ue()
    h.slice_type_all = st >= 5
    h.slice_type = SliceType(st % 5)
    h.pic_parameter_set_id = br.ue()
    pps = pps_map[h.pic_parameter_set_id]
    sps = sps_map[pps.seq_parameter_set_id]

    if sps.separate_colour_plane_flag:
        h.colour_plane_id = br.u(2)
    h.frame_num = br.u(sps.log2_max_frame_num_minus4 + 4)
    if not sps.frame_mbs_only_flag:
        h.field_pic_flag = br.flag()
        if h.field_pic_flag:
            h.bottom_field_flag = br.flag()
    if h.is_idr:
        h.idr_pic_id = br.ue()
    if sps.pic_order_cnt_type == 0:
        h.pic_order_cnt_lsb = br.u(sps.log2_max_pic_order_cnt_lsb_minus4 + 4)
        if pps.bottom_field_pic_order_in_frame_present_flag and not h.field_pic_flag:
            h.delta_pic_order_cnt_bottom = br.se()
    elif sps.pic_order_cnt_type == 1 and not sps.delta_pic_order_always_zero_flag:
        d0 = br.se()
        d1 = 0
        if pps.bottom_field_pic_order_in_frame_present_flag and not h.field_pic_flag:
            d1 = br.se()
        h.delta_pic_order_cnt = (d0, d1)
    if pps.redundant_pic_cnt_present_flag:
        h.redundant_pic_cnt = br.ue()

    st = h.slice_type
    if st == SliceType.B:
        h.direct_spatial_mv_pred_flag = br.flag()
    h.num_ref_idx_l0_active_minus1 = pps.num_ref_idx_l0_default_active_minus1
    h.num_ref_idx_l1_active_minus1 = pps.num_ref_idx_l1_default_active_minus1
    if st in (SliceType.P, SliceType.SP, SliceType.B):
        h.num_ref_idx_active_override_flag = br.flag()
        if h.num_ref_idx_active_override_flag:
            h.num_ref_idx_l0_active_minus1 = br.ue()
            if st == SliceType.B:
                h.num_ref_idx_l1_active_minus1 = br.ue()

    # ref_pic_list_modification (7.3.3.1)
    if st not in (SliceType.I, SliceType.SI):
        if br.flag():  # ref_pic_list_modification_flag_l0
            h.ref_pic_list_mod_l0 = _read_rplm(br)
    if st == SliceType.B:
        if br.flag():
            h.ref_pic_list_mod_l1 = _read_rplm(br)

    # pred_weight_table (7.3.3.2)
    if (pps.weighted_pred_flag and st in (SliceType.P, SliceType.SP)) or (
            pps.weighted_bipred_idc == 1 and st == SliceType.B):
        _read_pred_weight_table(br, h, sps)

    # dec_ref_pic_marking (7.3.3.3)
    if nal.nal_ref_idc != 0:
        if h.is_idr:
            h.no_output_of_prior_pics_flag = br.flag()
            h.long_term_reference_flag = br.flag()
        else:
            h.adaptive_ref_pic_marking_mode_flag = br.flag()
            if h.adaptive_ref_pic_marking_mode_flag:
                while True:
                    op = br.ue()
                    if op == 0:
                        break
                    m = MMCOOp(op)
                    if op in (1, 3):
                        m.value1 = br.ue()  # difference_of_pic_nums_minus1
                    elif op == 2:
                        m.value1 = br.ue()  # long_term_pic_num
                    elif op == 4:
                        m.value1 = br.ue()  # max_long_term_frame_idx_plus1
                    elif op == 6:
                        m.value1 = br.ue()  # long_term_frame_idx
                    if op == 3:
                        m.value2 = br.ue()  # long_term_frame_idx
                    h.mmco_ops.append(m)

    if pps.entropy_coding_mode_flag and st not in (SliceType.I, SliceType.SI):
        h.cabac_init_idc = br.ue()
    h.slice_qp_delta = br.se()
    if st in (SliceType.SP, SliceType.SI):
        if st == SliceType.SP:
            h.sp_for_switch_flag = br.flag()
        h.slice_qs_delta = br.se()
    if pps.deblocking_filter_control_present_flag:
        h.disable_deblocking_filter_idc = br.ue()
        if h.disable_deblocking_filter_idc != 1:
            h.slice_alpha_c0_offset_div2 = br.se()
            h.slice_beta_offset_div2 = br.se()
    if pps.num_slice_groups_minus1 > 0 and pps.slice_group_map_type in (3, 4, 5):
        pic_size_units = (sps.pic_width_in_mbs * sps.frame_height_in_mbs)
        rate = pps.slice_group_change_rate_minus1 + 1
        # JM ldecod header.c:326-332: len = Ceil(units / rate), then
        # CeilLog2(len + 1) bits
        max_cycle = -(-pic_size_units // rate)
        nbits = max(1, max_cycle.bit_length())
        h.slice_group_change_cycle = br.u(nbits)

    return h, br


def _read_rplm(br: BitReader) -> list[RefPicListMod]:
    out = []
    while True:
        idc = br.ue()
        if idc == 3:
            break
        out.append(RefPicListMod(idc, br.ue()))
        if len(out) > 64:
            raise ValueError("runaway ref_pic_list_modification")
    return out


def _read_pred_weight_table(br: BitReader, h: SliceHeader, sps: SPS) -> None:
    has_chroma = sps.chroma_format_idc != 0 and not sps.separate_colour_plane_flag
    h.luma_log2_weight_denom = br.ue()
    if has_chroma:
        h.chroma_log2_weight_denom = br.ue()
    for lst, nref in ((0, h.num_ref_idx_l0_active_minus1 + 1),
                      (1, h.num_ref_idx_l1_active_minus1 + 1)):
        if lst == 1 and h.slice_type != SliceType.B:
            break
        table = []
        for _ in range(nref):
            lw, lo = 1 << h.luma_log2_weight_denom, 0
            if br.flag():  # luma_weight_flag
                lw, lo = br.se(), br.se()
            entry = {"luma": (lw, lo)}
            if has_chroma:
                cw = [[1 << h.chroma_log2_weight_denom, 0] for _ in range(2)]
                if br.flag():  # chroma_weight_flag
                    for j in range(2):
                        cw[j] = [br.se(), br.se()]
                entry["chroma"] = cw
            table.append(entry)
        if lst == 0:
            h.wp_l0 = table
        else:
            h.wp_l1 = table


class PocContext:
    """POC derivation state machine (spec 8.2.1), host-side per decoder."""

    def __init__(self) -> None:
        self.msb = 0
        self.prev_lsb = 0
        self.prev_frame_num = 0
        self.prev_frame_num_offset = 0

    def compute(self, h: SliceHeader, sps: SPS) -> int:
        """Returns the frame POC (TopFieldOrderCnt for frame pictures)."""
        if sps.pic_order_cnt_type == 0:
            max_lsb = sps.max_poc_lsb
            if h.is_idr:
                self.msb, self.prev_lsb = 0, 0
            lsb = h.pic_order_cnt_lsb
            if lsb < self.prev_lsb and (self.prev_lsb - lsb) >= max_lsb // 2:
                msb = self.msb + max_lsb
            elif lsb > self.prev_lsb and (lsb - self.prev_lsb) > max_lsb // 2:
                msb = self.msb - max_lsb
            else:
                msb = self.msb
            poc = msb + lsb
            if h.nal_ref_idc:  # only reference pictures update prev
                self.msb, self.prev_lsb = msb, lsb
            return poc
        elif sps.pic_order_cnt_type == 2:
            if h.is_idr:
                fno = 0
            elif self.prev_frame_num > h.frame_num:
                fno = self.prev_frame_num_offset + sps.max_frame_num
            else:
                fno = self.prev_frame_num_offset
            tmp = fno + h.frame_num
            poc = 2 * tmp - (0 if h.nal_ref_idc else 1)
            self.prev_frame_num = h.frame_num
            self.prev_frame_num_offset = fno
            return poc
        else:  # pic_order_cnt_type 1 (spec 8.2.1.2; ldecod decode_poc:720)
            ncyc = len(sps.offset_for_ref_frame)
            if h.is_idr:
                fno = 0
            elif self.prev_frame_num > h.frame_num:
                fno = self.prev_frame_num_offset + sps.max_frame_num
            else:
                fno = self.prev_frame_num_offset
            abs_fn = (fno + h.frame_num) if ncyc else 0
            if h.nal_ref_idc == 0 and abs_fn > 0:
                abs_fn -= 1
            if abs_fn > 0:
                cyc, in_cyc = divmod(abs_fn - 1, ncyc)
                expected = cyc * sum(sps.offset_for_ref_frame) + \
                    sum(sps.offset_for_ref_frame[:in_cyc + 1])
            else:
                expected = 0
            if h.nal_ref_idc == 0:
                expected += sps.offset_for_non_ref_pic
            top = expected + h.delta_pic_order_cnt[0]
            bottom = (top + sps.offset_for_top_to_bottom_field
                      + h.delta_pic_order_cnt[1])
            self.prev_frame_num = h.frame_num
            self.prev_frame_num_offset = fno
            return min(top, bottom)
