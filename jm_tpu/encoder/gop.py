"""Explicit GOP structure strings (E3, lencod/src/explicit_gop.c
interpret_gop_structure:61).

Format per coded entry: ``<B|P|I><display_no><r|e><qp_offset>[T<layer>]``
— e.g. ``b2r0b0e1b1e1b3e1`` codes the middle B first as a reference
('r'), then the leaves as expendable ('e') with +1 QP. display_no indexes
the B positions between two anchors (0..NumberBFrames-1); the optional
T<layer> tag is parsed and retained for stats but ordering is explicit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_ENTRY = re.compile(r"([bBpPiI])(\d+)([reRE])(-?\d+)(?:[tT](\d+))?")


@dataclass
class GopEntry:
    slice_type: str      # 'B' (P/I enhancement entries are rejected here)
    display_no: int
    as_ref: bool
    qp_offset: int
    layer: int = 0


def parse_explicit_hierarchy(s: str) -> list[GopEntry]:
    out = []
    pos = 0
    s = s.strip().strip('"')
    while pos < len(s):
        m = _ENTRY.match(s, pos)
        if not m:
            raise ValueError(
                f"ExplicitHierarchyFormat parse error at '{s[pos:]}'")
        st, dno, ref, dqp, tl = m.groups()
        if st.upper() != "B":
            raise ValueError(
                "only B entries are supported in the enhancement GOP")
        out.append(GopEntry("B", int(dno), ref.lower() == "r", int(dqp),
                            int(tl) if tl else 0))
        pos = m.end()
    seen = [e.display_no for e in out]
    if len(set(seen)) != len(seen):
        raise ValueError("duplicate display_no in ExplicitHierarchyFormat")
    return out


# ---------------------------------------------------------------------------
# ExplicitSeqCoding (E3): script-file-driven coding order
# (lencod/src/explicit_seq.c ReadExplicitSeqFile:259 / ReadFrameData:191)
# ---------------------------------------------------------------------------

@dataclass
class SeqEntry:
    seq_number: int          # display index within one cycle
    slice_type: str          # "I" | "P" | "B"
    idr: bool
    reference: int           # nal_ref_idc (0 = disposable)


def parse_explicit_seq_file(text: str) -> list[SeqEntry]:
    """Parse the reference's explicit sequence information file (the
    `Sequence { FrameCount : N } Frame { SeqNumber/SliceType/IDRPicture/
    Reference }` dialect of explicit_seq.c; field order inside a Frame
    block is free, same as the reference parser)."""
    toks = text.replace("{", " { ").replace("}", " } ").split()
    entries: list[SeqEntry] = []
    i = 0
    frame_count = None
    cur = None

    def flush():
        nonlocal cur
        if cur is not None:
            if "SeqNumber" not in cur or "SliceType" not in cur:
                raise ValueError(
                    "explicit seq file: Frame needs SeqNumber + SliceType")
            entries.append(SeqEntry(int(cur["SeqNumber"]),
                                    str(cur["SliceType"]).upper(),
                                    bool(int(cur.get("IDRPicture", 0))),
                                    int(cur.get("Reference", 3))))
            cur = None

    while i < len(toks):
        t = toks[i]
        if t == "Frame":
            flush()
            cur = {}
            i += 1
        elif t in ("Sequence", "{", "}"):
            i += 1
        elif i + 2 < len(toks) and toks[i + 1] == ":":
            key, val = t, toks[i + 2]
            if key == "FrameCount":
                frame_count = int(val)
            elif cur is not None:
                cur[key] = val
            i += 3
        else:
            i += 1
    flush()
    if not entries:
        raise ValueError("explicit seq file: no Frame entries")
    if frame_count is not None and frame_count != len(entries):
        # the reference tolerates cycling; keep the declared count only
        # as a sanity bound
        pass
    if entries[0].slice_type != "I":
        raise ValueError("first coded picture must be Intra "
                         "(explicit_seq.c ParseSliceType)")
    if entries[0].reference == 0:
        raise ValueError("first coded picture must be a reference")
    return entries


def encode_explicit_seq(enc, frames, entries: list[SeqEntry]) -> list[bytes]:
    """Drive the encoder through an explicit coding schedule: entries
    cycle over the clip (coding_index % len(entries), display =
    seq_number + cycle * cycle_span, as the reference applies its
    ExpSeqInfo cyclically). I/P entries code anchors (IDRPicture forces
    an IDR), B entries code B pictures between the nearest
    already-coded reference pictures in display order; Reference: 0
    makes a picture disposable. Returns payloads in coding order."""
    frames = list(frames)
    n = len(frames)
    span = max(e.seq_number for e in entries) + 1
    coded: dict[int, object] = {}       # display -> reference Frame
    payloads = []
    ci = 0
    while True:
        e = entries[ci % len(entries)]
        disp = e.seq_number + (ci // len(entries)) * span
        if disp >= n:
            break
        Y, U, V = frames[disp]
        if e.slice_type in ("I", "P"):
            enc.display_idx = max(enc.display_idx, disp + 1)
            payloads.append(enc._emit_anchor(
                Y, U, V, disp,
                force={"intra": e.slice_type == "I", "idr": e.idr}))
            coded[disp] = enc.results[-1]["frame"]
        elif e.slice_type == "B":
            below = [d for d in coded if d < disp]
            above = [d for d in coded if d > disp]
            if not below or not above:
                raise ValueError(
                    f"explicit seq: B at display {disp} lacks coded "
                    "references on both sides")
            payloads.append(enc._emit_b(
                Y, U, V, disp, coded[max(below)], coded[min(above)],
                as_ref=e.reference > 0))
            if e.reference > 0:
                coded[disp] = enc.results[-1]["frame"]
        else:
            raise ValueError(f"explicit seq: slice type {e.slice_type}")
        ci += 1
    return payloads
