"""Base-level alignment driver (reference align.c). Stage 1: pass-through
when CIGAR is not requested; the full extension engine lands on top of the
ksw2-equivalent kernels in ops/."""
from __future__ import annotations

from ..config import MM_F_CIGAR


def align_regs(opt, mi, qlen, seq, regs, ax, ay):
    if not (opt.flag & MM_F_CIGAR):
        return regs
    from .align_engine import align_skeleton
    return align_skeleton(opt, mi, qlen, seq, regs, ax, ay)
