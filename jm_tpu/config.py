"""JM-compatible configuration: encoder/decoder `.cfg` files + `-p` overrides.

Parity with lcommon/src/config_common.c (ParseContent tokenizer: whitespace
tokens, `name = value` triples, `#` comments to end of line, double-quoted
strings; unrecognized parameter names warn and are skipped — JM 19 prints
and continues, config_common.c:214-219) and the declarative Mapping tables
of lencod/inc/configfile.h:26 (516 params) / ldecod/inc/configfile.h:30.

Precedence mirrors the reference CLI (Readme.txt:100): defaults, then
`-d file`, then `-f file`s in order, then `-p Name=Value` overrides.

Only the parameters the TPU encoder implements so far are *applied*; all
other legal JM parameter names are accepted and reported in `.ignored` so
reference config files work as-is. A known name set at an unsupported value
raises (better loud than silently-different bits).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def tokenize_cfg(text: str) -> list[str]:
    """ParseContent stage one: comments stripped, quoted strings kept whole."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0]
        for tok in re.findall(r'"[^"]*"|\S+', line):
            # '=' may be glued to names/values in JM files
            if tok != "=" and "=" in tok and not tok.startswith('"'):
                for part in re.split(r"(=)", tok):
                    if part:
                        out.append(part)
            else:
                out.append(tok)
    return out


def parse_cfg_text(text: str) -> dict[str, str]:
    toks = tokenize_cfg(text)
    kv: dict[str, str] = {}
    i = 0
    while i + 2 < len(toks) or (i + 2 == len(toks) and len(toks) >= 3):
        if i + 2 >= len(toks):
            break
        name, eq, val = toks[i], toks[i + 1], toks[i + 2]
        if eq != "=":
            raise ValueError(f"config parse error near '{name}': expected '='")
        kv[name] = val.strip('"')
        i += 3
    return kv


@dataclass
class EncoderParams:
    """Typed view of the JM encoder parameters the framework implements,
    plus IO. Field names follow the reference cfg names (configfile.h)."""
    InputFile: str = ""
    OutputFile: str = "test.264"
    ReconFile: str = ""
    StatsFile: str = "stats.dat"
    SourceWidth: int = 176
    SourceHeight: int = 144
    FrameRate: float = 30.0
    FramesToBeEncoded: int = 1
    StartFrame: int = 0
    QPISlice: int = 28
    QPPSlice: int = 28
    QPBSlice: int = 30
    IntraPeriod: int = 0
    NumberReferenceFrames: int = 1
    SearchRange: int = 16
    SearchMode: int = 0          # -1 FS, 0 fast-full, 1/2 UMHex, 3 EPZS
    HMEEnable: int = 0           # hierarchical pyramid ME (me_hme.c)
    InterSearch8x4: int = 0
    InterSearch4x8: int = 0
    InterSearch4x4: int = 0
    SymbolMode: int = 0          # 0 CAVLC, 1 CABAC
    ContextInitMethod: int = 0   # 0 fixed model 0, 1 adaptive (3 models)
    UseRDOQuant: int = 0         # trellis quantization (rdoq.c)
    RDOQ_DC: int = 0
    RDOQ_CR: int = 0
    RDOQ_DC_CR: int = 0
    RDOQ_QP_Num: int = 1
    ProfileIDC: int = 66
    LevelIDC: int = 30
    NumberBFrames: int = 0
    HierarchicalCoding: int = 0
    NumberOfViews: int = 1
    View1ConfigFile: str = ""
    SepViewInterSearch: int = 0
    ExplicitHierarchyFormat: str = ""
    LongTermPeriod: int = 0
    Transform8x8Mode: int = 0
    YUVFormat: int = 1
    # custom quantization (q_matrix.c / q_offsets.c / q_around.c)
    QmatrixFile: str = ""
    ScalingMatrixPresentFlag: int = 0
    ScalingListPresentFlag0: int = 0
    ScalingListPresentFlag1: int = 0
    ScalingListPresentFlag2: int = 0
    ScalingListPresentFlag3: int = 0
    ScalingListPresentFlag4: int = 0
    ScalingListPresentFlag5: int = 0
    ScalingListPresentFlag6: int = 0
    ScalingListPresentFlag7: int = 0
    OffsetMatrixPresentFlag: int = 0
    QOffsetMatrixFile: str = ""
    AdaptiveRounding: int = 0
    AdaptRndPeriod: int = 16
    AdaptRndWFactorIRef: int = 4
    AdaptRndWFactorPRef: int = 4
    AdaptRndWFactorBRef: int = 4
    RDOptimization: int = 0
    EnableIPCM: int = 0
    NumberOfDecoders: int = 0
    LossRateA: int = 0
    RDPictureDecision: int = 0
    DisableLoopFilter: int = 0   # via LoopFilterDisable
    RateControlEnable: int = 0
    Bitrate: int = 45020
    InitialQP: int = 0
    BasicUnit: int = 0           # MBs per within-frame RC unit (E29)
    DistortionSSIM: int = 0
    DistortionMSSSIM: int = 0
    SSIMOverlapSize: int = 8
    OutFileMode: int = 0         # 0 Annex-B, 1 RTP dump (lencod rtp.c)
    RandomIntraMBRefresh: int = 0
    WeightedPrediction: int = 0
    WeightedBiprediction: int = 0
    EnableVUISupport: int = 0
    NumberLeakyBuckets: int = 0
    LeakyBucketParamFile: str = "leakybucketparam.cfg"
    SliceMode: int = 0
    SliceArgument: int = 0
    num_slice_groups_minus1: int = 0
    slice_group_map_type: int = 0
    slice_group_change_direction_flag: int = 0
    slice_group_change_rate_minus1: int = 0
    SliceGroupConfigFileName: str = ""
    ignored: dict = field(default_factory=dict)

    _INT_FIELDS = {
        "SourceWidth", "SourceHeight", "FramesToBeEncoded", "StartFrame",
        "QPISlice", "QPPSlice", "QPBSlice", "IntraPeriod",
        "NumberReferenceFrames",
        "SearchRange", "SearchMode", "HMEEnable",
        "SymbolMode", "ContextInitMethod", "UseRDOQuant",
        "RDOQ_DC", "RDOQ_CR", "RDOQ_DC_CR",
        "RDOQ_QP_Num", "ProfileIDC", "LevelIDC",
        "InterSearch8x4", "InterSearch4x8", "InterSearch4x4",
        "NumberBFrames", "HierarchicalCoding", "LongTermPeriod", "Transform8x8Mode",
        "NumberOfViews", "SepViewInterSearch",
        "RDOptimization", "EnableIPCM", "RDPictureDecision", "YUVFormat",
        "ScalingMatrixPresentFlag", "ScalingListPresentFlag0",
        "ScalingListPresentFlag1", "ScalingListPresentFlag2",
        "ScalingListPresentFlag3", "ScalingListPresentFlag4",
        "ScalingListPresentFlag5", "ScalingListPresentFlag6",
        "ScalingListPresentFlag7", "OffsetMatrixPresentFlag",
        "AdaptiveRounding", "AdaptRndPeriod", "AdaptRndWFactorIRef",
        "AdaptRndWFactorPRef", "AdaptRndWFactorBRef",
        "NumberOfDecoders", "LossRateA", "RateControlEnable",
        "Bitrate", "InitialQP", "BasicUnit", "DistortionSSIM",
        "DistortionMSSSIM", "SSIMOverlapSize", "OutFileMode",
        "SliceMode", "SliceArgument", "num_slice_groups_minus1",
        "RandomIntraMBRefresh", "WeightedPrediction", "WeightedBiprediction",
        "EnableVUISupport", "NumberLeakyBuckets",
        "slice_group_map_type", "slice_group_change_direction_flag",
        "slice_group_change_rate_minus1",
    }
    _STR_FIELDS = {"InputFile", "OutputFile", "ReconFile", "StatsFile",
                   "SliceGroupConfigFileName", "LeakyBucketParamFile",
                   "ExplicitHierarchyFormat", "QmatrixFile",
                   "QOffsetMatrixFile", "View1ConfigFile"}
    _ALIASES = {
        "DistortionMS_SSIM": "DistortionMSSSIM",   # reference cfg name
        "LoopFilterDisable": "DisableLoopFilter",
        "OutputWidth": "SourceWidth",       # no resize support: must match
        "OutputHeight": "SourceHeight",
    }

    def apply(self, kv: dict[str, str]) -> None:
        for name, val in kv.items():
            tgt = self._ALIASES.get(name, name)
            if tgt in self._INT_FIELDS or tgt == "DisableLoopFilter":
                setattr(self, tgt, int(float(val)))
            elif tgt in self._STR_FIELDS:
                setattr(self, tgt, val)
            elif tgt == "FrameRate":
                self.FrameRate = float(val)
            else:
                self.ignored[name] = val

    def validate(self) -> None:
        unsupported = []
        if self.Transform8x8Mode not in (0, 1):
            unsupported.append(f"Transform8x8Mode {self.Transform8x8Mode}")
        if self.ProfileIDC not in (66, 77, 100, 122, 118, 128):
            unsupported.append(f"ProfileIDC {self.ProfileIDC}")
        if self.SymbolMode not in (0, 1):
            unsupported.append(f"SymbolMode {self.SymbolMode}")
        if unsupported:
            raise NotImplementedError("; ".join(unsupported))

    def _read_sg_config(self):
        """SliceGroupConfigFileName contents for map types 0/2/6 (the
        reference's read_slice_group_info, lencod/src/configfile.c:2049):
        bare integers, one per line, comments after values allowed."""
        vals = []
        with open(self.SliceGroupConfigFileName, encoding="latin-1") as fh:
            for line in fh:
                tok = line.split("#")[0].strip().split()
                if tok and tok[0].lstrip("-").isdigit():
                    vals.append(int(tok[0]))
        return vals

    def to_encoder_config(self):
        from .encoder.encoder import EncoderConfig
        sg = {}
        if self.num_slice_groups_minus1 > 0:
            t = self.slice_group_map_type
            sg = dict(num_slice_groups=self.num_slice_groups_minus1 + 1,
                      slice_group_map_type=t,
                      sg_change_direction=self.slice_group_change_direction_flag,
                      sg_change_rate_minus1=self.slice_group_change_rate_minus1)
            if t in (0, 2, 6) and self.SliceGroupConfigFileName:
                v = self._read_sg_config()
                if t == 0:
                    sg["sg_run_length"] = tuple(
                        x + 1 for x in v[:self.num_slice_groups_minus1 + 1])
                elif t == 2:
                    sg["sg_top_left"] = tuple(v[0::2])
                    sg["sg_bottom_right"] = tuple(v[1::2])
                else:
                    sg["sg_ids"] = tuple(v)
        qm = {}
        if self.ScalingMatrixPresentFlag and self.QmatrixFile:
            from .encoder.qmatrix import parse_matrix_cfg
            with open(self.QmatrixFile, encoding="latin-1") as fh:
                l4, l8 = parse_matrix_cfg(fh.read())
            qm["scaling_matrix"] = self.ScalingMatrixPresentFlag
            qm["scaling_lists4"] = tuple(tuple(x) for x in l4)
            qm["scaling_lists8"] = tuple(tuple(x) for x in l8)
            qm["scaling_present"] = tuple(
                getattr(self, f"ScalingListPresentFlag{i}") for i in range(8))
        if self.OffsetMatrixPresentFlag and self.QOffsetMatrixFile:
            from .encoder.qmatrix import parse_offset_cfg
            with open(self.QOffsetMatrixFile, encoding="latin-1") as fh:
                o4, o8 = parse_offset_cfg(fh.read())
            qm["offset_matrix"] = (o4, o8)
        if self.AdaptiveRounding:
            qm["adaptive_rounding"] = True
            qm["adapt_rnd_period"] = self.AdaptRndPeriod
            qm["adapt_rnd_w"] = self.AdaptRndWFactorPRef
        return EncoderConfig(
            slice_mode=self.SliceMode, slice_argument=self.SliceArgument,
            **qm,
            intra_mb_refresh=self.RandomIntraMBRefresh,
            weighted_pred=self.WeightedPrediction,
            weighted_bipred=self.WeightedBiprediction,
            enable_vui=bool(self.EnableVUISupport),
            sub8x8=bool(self.InterSearch8x4 or self.InterSearch4x8
                        or self.InterSearch4x4),
            **sg,
            width=self.SourceWidth, height=self.SourceHeight,
            qp=self.QPISlice, intra_period=self.IntraPeriod,
            search_range=self.SearchRange,
            search_mode=self.SearchMode, hme=bool(self.HMEEnable),
            num_ref=self.NumberReferenceFrames,
            level_idc=self.LevelIDC,
            deblock=not self.DisableLoopFilter,
            entropy="cabac" if self.SymbolMode else "cavlc",
            cabac_adapt_init=bool(self.ContextInitMethod),
            rdoq=1 if self.UseRDOQuant else 0,
            rdoq_dc=self.RDOQ_DC, rdoq_cr=self.RDOQ_CR,
            rdoq_dc_cr=self.RDOQ_DC_CR,
            num_b=self.NumberBFrames, qp_b=self.QPBSlice,
            hierarchical=1 if self.HierarchicalCoding else 0,
            long_term_period=self.LongTermPeriod,
            explicit_gop=self.ExplicitHierarchyFormat
            if self.HierarchicalCoding == 3 else "",
            transform8x8=bool(self.Transform8x8Mode),
            chroma_format=self.YUVFormat if self.YUVFormat in (1, 2) else 1,
            rdo=1 if self.RDOptimization else 0,
            num_decoders=self.NumberOfDecoders if self.RDOptimization == 3 else 0,
            loss_rate_a=self.LossRateA if self.RDOptimization == 3 else 0,
            enable_ipcm=self.EnableIPCM,
            rd_picture_decision=bool(self.RDPictureDecision),
            rc_enable=bool(self.RateControlEnable),
            rc_bitrate=self.Bitrate, frame_rate=self.FrameRate,
            rc_initial_qp=self.InitialQP,
            rc_basic_unit=self.BasicUnit if self.RateControlEnable else 0,
            num_views=2 if self.NumberOfViews == 2 else 1)


@dataclass
class DecoderParams:
    """ldecod/inc/configfile.h parameter set (the implemented subset)."""
    InputFile: str = "test.264"
    OutputFile: str = "test_dec.yuv"
    RefFile: str = ""
    WriteUV: int = 1
    FileFormat: int = 0          # 0 Annex-B, 1 RTP dump (ldecod rtp.c)
    ConcealMode: int = 0         # 0 off, 1 frame copy, 2 motion copy
    ignored: dict = field(default_factory=dict)

    def apply(self, kv: dict[str, str]) -> None:
        for name, val in kv.items():
            if name in ("InputFile", "OutputFile", "RefFile"):
                setattr(self, name, val.strip('"'))
            elif name in ("WriteUV", "FileFormat", "ConcealMode"):
                setattr(self, name, int(val))
            else:
                self.ignored[name] = val


def load_params(cls, d_file: str | None = None, f_files: tuple = (),
                p_overrides: tuple = ()):
    """JM CLI precedence: defaults < -d < -f... < -p Name=Value..."""
    params = cls()
    files = ([d_file] if d_file else []) + list(f_files)
    for path in files:
        with open(path, encoding="latin-1") as fh:
            params.apply(parse_cfg_text(fh.read()))
    for ov in p_overrides:
        if "=" not in ov:
            raise ValueError(f"-p expects Name=Value, got '{ov}'")
        k, v = ov.split("=", 1)
        params.apply({k.strip(): v.strip().strip('"')})
    return params
