"""Index side data: BED junctions, splice scores, ALT contigs, jump junctions.
Reference: index.c:648-1074. Stage 1: BED junction intervals for --junc-bed."""
from __future__ import annotations

import gzip

import numpy as np


class BedIntervals:
    """Per-contig sorted (st, en, score, strand) intervals (mm_idx_intv_t)."""

    def __init__(self, n_seq):
        self.per_ctg = [[] for _ in range(n_seq)]

    def junc(self, ctg, st, en):
        """mm_idx_bed_junc (index.c:803-826): per-position donor/acceptor flags."""
        out = np.zeros(en - st, dtype=np.uint8)
        for (s, e, sc, strand) in self.per_ctg[ctg]:
            if e <= st or s >= en:
                continue
            # donor/acceptor flag encoding (index.c:810-824)
            if strand > 0:
                if st <= s - 1 < en:
                    out[s - 1 - st] |= 2
                if st <= e < en:
                    out[e - st] |= 8
            elif strand < 0:
                if st <= s - 1 < en:
                    out[s - 1 - st] |= 4
                if st <= e < en:
                    out[e - st] |= 1
        return out


def read_bed_junc(path, mi):
    iv = BedIntervals(mi.n_seq)
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        for line in f:
            if not line.strip() or line.startswith(("#", "track", "browser")):
                continue
            fl = line.rstrip("\n").split("\t")
            cid = mi.name2id(fl[0])
            if cid < 0:
                continue
            st, en = int(fl[1]), int(fl[2])
            score = int(fl[4]) if len(fl) > 4 and fl[4].isdigit() else 0
            strand = 0
            if len(fl) > 5:
                strand = 1 if fl[5] == "+" else -1 if fl[5] == "-" else 0
            if len(fl) >= 12:  # BED12: emit introns between blocks
                n_blk = int(fl[9])
                sizes = [int(x) for x in fl[10].rstrip(",").split(",")]
                starts = [int(x) for x in fl[11].rstrip(",").split(",")]
                for b in range(n_blk - 1):
                    ist = st + starts[b] + sizes[b]
                    ien = st + starts[b + 1]
                    iv.per_ctg[cid].append((ist, ien, score, strand))
            else:
                iv.per_ctg[cid].append((st, en, score, strand))
    for lst in iv.per_ctg:
        lst.sort()
    return iv


def read_alt(path, mi) -> int:
    """mm_idx_alt_read (index.c:648-670): flag ALT contigs by name."""
    op = gzip.open if path.endswith(".gz") else open
    n_alt = 0
    with op(path, "rt") as f:
        for line in f:
            name = line.split()[0] if line.split() else ""
            cid = mi.name2id(name)
            if cid >= 0:
                mi.seq[cid].is_alt = True
                n_alt += 1
    mi.n_alt = n_alt
    return n_alt
