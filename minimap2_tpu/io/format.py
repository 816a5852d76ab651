"""Output formatting: PAF / SAM writers with cs/ds/MD tags.

Reference: format.c (mm_write_paf4 :425-458, write_tags :397-423,
mm_write_sam3 :522-679, write_cs_ds_or_MD :171-362, sam header :118-140).
Byte parity with the reference on its test data is a stated goal
(BASELINE.md).
"""
from __future__ import annotations

import numpy as np

from ..config import (MM_CIGAR_STR, MM_F_COPY_COMMENT, MM_F_FRAG_MODE,
                      MM_F_OUT_CG, MM_F_OUT_CS, MM_F_OUT_CS_LONG, MM_F_OUT_DS,
                      MM_F_OUT_MD, MM_F_QSTRAND, MM_F_SECONDARY_SEQ,
                      MM_F_SOFTCLIP)
from ..map.hit import Reg


def _fmt_div(div: float) -> str:
    if div == 0.0:
        return "0"
    return f"{div:.4f}"


def event_identity(r: Reg) -> float:
    """mm_event_identity (format.c / mmpriv): 1 - (#events / blen)."""
    if r.p is None:
        return -1.0
    return float(r.mlen) / r.blen if r.blen > 0 else 0.0


def _event_identity_ref(r: Reg) -> float:
    """format.c mm_event_identity: blen-normalized gap-compressed identity."""
    if r.p is None:
        return -1.0
    n_gap = 0
    n_gapo = 0
    n_diff = 0
    mlen = r.mlen
    # identity from cigar + dp stats computed during alignment (set there)
    return r.p._event_identity if hasattr(r.p, "_event_identity") else \
        (float(mlen) / r.blen if r.blen else 0.0)


def write_tags(out: list[str], r: Reg) -> None:
    if r.id == r.parent:
        typ = "I" if r.inv else "P"
    else:
        typ = "i" if r.inv else "S"
    if r.p is not None:
        out.append(f"\tNM:i:{r.blen - r.mlen + r.p.n_ambi}\tms:i:{r.p.dp_max0}"
                   f"\tAS:i:{r.p.dp_score}\tnn:i:{r.p.n_ambi}")
        if r.p.trans_strand in (1, 2):
            out.append(f"\tts:A:{'?+-?'[r.p.trans_strand]}")
    out.append(f"\ttp:A:{typ}\tcm:i:{r.cnt}\ts1:i:{r.score}")
    if r.parent == r.id:
        out.append(f"\ts2:i:{r.subsc}")
    if r.p is not None:
        div = 1.0 - _event_identity_ref(r)
        out.append(f"\tde:f:{_fmt_div(div)}")
    elif 0.0 <= r.div <= 1.0:
        out.append(f"\tdv:f:{_fmt_div(r.div)}")
    if r.split:
        out.append(f"\tzd:i:{r.split}")


def write_paf(mi, qname: str, qlen: int, r: Reg | None, opt_flag: int,
              rep_len: int, n_seg: int = 0, seg_idx: int = 0,
              qseq: bytes | None = None, comment: str | None = None) -> str:
    """mm_write_paf4 (format.c:425-458)."""
    out = [qname]
    if (opt_flag & MM_F_FRAG_MODE) and n_seg >= 2 and seg_idx >= 0:
        out.append(f"/{seg_idx + 1}")
    if r is None:
        out.append(f"\t{qlen}\t0\t0\t*\t*\t0\t0\t0\t0\t0\t0")
        if rep_len >= 0:
            out.append(f"\trl:i:{rep_len}")
        return "".join(out)
    out.append(f"\t{qlen}\t{r.qs}\t{r.qe}\t{'+-'[r.rev]}\t")
    out.append(mi.seq[r.rid].name)
    tlen = mi.seq[r.rid].length
    out.append(f"\t{tlen}")
    if (opt_flag & MM_F_QSTRAND) and r.rev:
        out.append(f"\t{tlen - r.re}\t{tlen - r.rs}")
    else:
        out.append(f"\t{r.rs}\t{r.re}")
    out.append(f"\t{r.mlen}\t{r.blen}\t{r.mapq}")
    write_tags(out, r)
    if rep_len >= 0:
        out.append(f"\trl:i:{rep_len}")
    if r.p is not None and (opt_flag & MM_F_OUT_CG):
        out.append("\tcg:Z:")
        for c in r.p.cigar:
            out.append(f"{c >> 4}{MM_CIGAR_STR[c & 0xF]}")
    if r.p is not None and (opt_flag & (MM_F_OUT_CS | MM_F_OUT_DS | MM_F_OUT_MD)):
        from .tags import write_cs_ds_md
        out.append(write_cs_ds_md(mi, qname, qseq, r,
                                  no_iden=not (opt_flag & MM_F_OUT_CS_LONG),
                                  is_MD=bool(opt_flag & MM_F_OUT_MD),
                                  is_ds=bool(opt_flag & MM_F_OUT_DS),
                                  write_tag=True,
                                  is_qstrand=bool(opt_flag & MM_F_QSTRAND)))
    if (opt_flag & MM_F_COPY_COMMENT) and comment:
        out.append(f"\t{comment}")
    return "".join(out)
