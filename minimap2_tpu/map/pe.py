"""Paired-end pairing and multi-segment helpers (reference pe.c, hit.c seg_gen).

Stage 1 stubs for single-end paths; full port with the sr preset work.
"""
from __future__ import annotations

import numpy as np

from ..config import MM_SEED_SEG_MASK, MM_SEED_SEG_SHIFT
from . import hit as hitmod


def seg_gen(hash_: int, qlens, regs0, ax, ay):
    """mm_seg_gen (hit.c:342-396): split fragment chains into per-segment chains."""
    n_segs = len(qlens)
    acc = [0]
    for s in range(1, n_segs):
        acc.append(acc[s - 1] + qlens[s - 1])
    qlen_sum = acc[-1] + qlens[-1]
    seg_u = [[] for _ in range(n_segs)]
    seg_ax = [[] for _ in range(n_segs)]
    seg_ay = [[] for _ in range(n_segs)]
    for r in regs0:
        per_seg_cnt = [0] * n_segs
        per_seg_x = [[] for _ in range(n_segs)]
        per_seg_y = [[] for _ in range(n_segs)]
        for j in range(r.cnt):
            a_x = int(ax[r.as_ + j])
            a_y = int(ay[r.as_ + j])
            sid = (a_y & MM_SEED_SEG_MASK) >> MM_SEED_SEG_SHIFT
            rev = a_x >> 63
            adj = (qlen_sum - (qlens[sid] + acc[sid])) if rev else acc[sid]
            a_y = (a_y - adj) & 0xFFFFFFFFFFFFFFFF
            per_seg_cnt[sid] += 1
            per_seg_x[sid].append(a_x)
            per_seg_y[sid].append(a_y)
        for s in range(n_segs):
            if per_seg_cnt[s]:
                seg_u[s].append((r.score << 32) | per_seg_cnt[s])
                seg_ax[s].extend(per_seg_x[s])
                seg_ay[s].extend(per_seg_y[s])
    out = []
    for s in range(n_segs):
        u = np.array(seg_u[s], dtype=np.uint64)
        sax = np.array(seg_ax[s], dtype=np.uint64)
        say = np.array(seg_ay[s], dtype=np.uint64)
        regs = hitmod.gen_regs(hash_, qlens[s], u, sax, say, False)
        for r in regs:
            r.seg_split = True
            r.seg_id = s
        out.append((regs, sax, say))
    return out


def select_sub_multi(regs, pri_ratio, pri1, pri2, max_gap_ref, min_diff,
                     best_n, n_segs, qlens):
    """mm_select_sub_multi (pe.c:6-48)."""
    if pri_ratio <= 0.0 or not regs:
        return regs
    n = len(regs)
    keep = [False] * n
    n_2nd = 0
    for i, r in enumerate(regs):
        p = r.parent
        if p == i:
            keep[i] = True
        elif n_2nd < best_n:
            rp = regs[p]
            thres = pri_ratio
            # pe.c: lower the threshold for hits joining both ends
            if r.qs < qlens[0] and r.qe > qlens[0]:  # crosses segment boundary
                thres = pri1 if rp.qs < qlens[0] and rp.qe > qlens[0] else pri2
            if r.score >= rp.score * thres or r.score + min_diff >= rp.score:
                keep[i] = True
                n_2nd += 1
    out = [r for i, r in enumerate(regs) if keep[i]]
    if len(out) != n:
        hitmod.sync_regs(out)
    return out


def pair(max_gap_ref, pe_bonus, sub_diff, match_sc, qlens, regs_pair):
    """mm_pair (pe.c:81-182) -- full port with the sr preset milestone."""
    return regs_pair
