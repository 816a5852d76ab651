"""Minimizer index: build, query, serialization.

Reference semantics: index.c (mm_idx_gen index.c:389-408, worker_post
index.c:226-278, mm_idx_get index.c:93-110, mm_idx_cal_max_occ index.c:198-220).

TPU-first layout: instead of 2^b hash buckets with open-addressing tables, the
index is three flat arrays resident in HBM —
    keys  : sorted distinct minimizer hashes (uint64)
    starts: offset of each key's occurrence run in `pos` (int64, len = n_keys+1)
    pos   : occurrence records y = rid<<32 | last_pos<<1 | strand (uint64),
            sorted by (key, y)
Query is a vectorized binary search (searchsorted) + gather, which maps onto
TPU as log(n) HBM gathers per probe, batched over all query minimizers.
Occurrence lists are position-sorted exactly like the reference (index.c:265),
so anchors are generated in the same order.
"""
from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from ..utils.intfloat import SEQ_NT4
from .sketch import sketch


@dataclass
class SeqMeta:
    name: str
    offset: int
    length: int
    is_alt: bool = False


class MiniIndex:
    """The minimizer index over a set of target sequences."""

    def __init__(self, w: int, k: int, b: int, flag: int):
        if k * 2 < b:
            b = k * 2
        if w < 1:
            w = 1
        self.w, self.k, self.b, self.flag = w, k, b, flag
        self.seq: list[SeqMeta] = []
        self.S: np.ndarray | None = None      # nt4 codes of concatenated refs (uint8)
        self.keys = np.empty(0, dtype=np.uint64)
        self.starts = np.zeros(1, dtype=np.int64)
        self.pos = np.empty(0, dtype=np.uint64)
        self.index = 0                         # part index for multi-part
        self.n_alt = 0
        # side data (BED junctions, splice scores, jumps) attached later
        self.intervals = None
        self.spsc = None
        self.jumps = None
        self._name2id: dict[str, int] | None = None

    # ---- construction ----
    @classmethod
    def build(cls, names, seqs, w: int, k: int, b: int = 14, flag: int = 0) -> "MiniIndex":
        """Build from in-memory sequences (str/bytes). rid = list order."""
        codes_list = []
        for s in seqs:
            if isinstance(s, str):
                s = s.encode()
            codes_list.append(SEQ_NT4[np.frombuffer(s, dtype=np.uint8)])
        return cls.build_codes(names, codes_list, w, k, b, flag)

    @classmethod
    def build_codes(cls, names, codes_list, w: int, k: int, b: int = 14,
                    flag: int = 0) -> "MiniIndex":
        """Build from nt4 code arrays (uint8, 0-3 + 4=ambiguous).

        The scale path: for genome-sized inputs the sketch runs in native
        C++ (mm_sketch_many) and the (key, pos) stream is sorted with a
        native stable LSD radix sort keyed on the minimizer hash -- the
        flat-tensor analogue of the reference's per-bucket
        radix_sort_128x + khash build (index.c:226-278)."""
        mi = cls(w, k, b, flag)
        total = sum(len(c) for c in codes_list)
        mi.S = np.empty(total, dtype=np.uint8)
        offs, lens = [], []
        off = 0
        for name, codes in zip(names, codes_list):
            mi.S[off:off + len(codes)] = codes
            mi.seq.append(SeqMeta(name=name, offset=off, length=len(codes)))
            offs.append(off)
            lens.append(len(codes))
            off += len(codes)
        from .. import native
        if native.available():
            x, y = native.sketch_many(mi.S, np.array(offs, np.int64),
                                      np.array(lens, np.int64), mi.w, mi.k,
                                      bool(flag & 0x1))
        else:
            xs, ys = [], []
            for rid in range(len(mi.seq)):
                if lens[rid] >= k:
                    xr, yr = sketch(mi.S[offs[rid]:offs[rid] + lens[rid]],
                                    mi.w, mi.k, rid, bool(flag & 0x1))
                    xs.append(xr)
                    ys.append(yr)
            x = np.concatenate(xs) if xs else np.empty(0, np.uint64)
            y = np.concatenate(ys) if ys else np.empty(0, np.uint64)
        if len(x):
            h = np.ascontiguousarray(x >> np.uint64(8))   # key = hash (span dropped)
            y = np.ascontiguousarray(y)
            if native.available():
                # stable by key => emission order within a key is kept,
                # matching the reference's stable radix_sort_128x
                native.radix_sort_pair(h, y, 2 * k)
            else:
                order = np.lexsort((y, h))
                h, y = h[order], y[order]
            bnd = np.flatnonzero(h[1:] != h[:-1]) + 1
            mi.keys = h[np.concatenate(([0], bnd))] if len(h) else h
            mi.starts = np.concatenate(
                ([0], bnd, [len(h)])).astype(np.int64)
            mi.pos = y
        return mi

    @property
    def n_seq(self) -> int:
        return len(self.seq)

    # ---- query ----
    def get(self, minier: np.ndarray | int):
        """Vectorized mm_idx_get: hash values -> (start, count) into self.pos."""
        q = np.atleast_1d(np.asarray(minier, dtype=np.uint64))
        idx = np.searchsorted(self.keys, q)
        idx_c = np.minimum(idx, len(self.keys) - 1) if len(self.keys) else idx
        found = (len(self.keys) > 0) & (idx < len(self.keys))
        if len(self.keys):
            found = found & (self.keys[idx_c] == q)
        start = np.where(found, self.starts[np.minimum(idx_c, len(self.starts) - 2)], 0)
        cnt = np.where(found,
                       self.starts[np.minimum(idx_c, len(self.starts) - 2) + 1]
                       - self.starts[np.minimum(idx_c, len(self.starts) - 2)], 0)
        return start.astype(np.int64), cnt.astype(np.int64)

    def cal_max_occ(self, f: float) -> int:
        """index.c:198-220: occurrence threshold such that <= f of distinct
        minimizers occur more often."""
        if f <= 0.0 or len(self.keys) == 0:
            return 2147483647
        counts = (self.starts[1:] - self.starts[:-1]).astype(np.uint32)
        kk = int((1.0 - f) * len(counts))
        kk = min(kk, len(counts) - 1)
        thres = int(np.partition(counts, kk)[kk]) + 1
        return thres

    def getseq(self, rid: int, st: int, en: int, rev: bool = False) -> np.ndarray:
        """Fetch nt4-coded reference subsequence (index.c:164-196)."""
        s = self.seq[rid]
        if st >= s.length:
            return np.empty(0, dtype=np.uint8)
        en = min(en, s.length)
        sub = self.S[s.offset + st:s.offset + en]
        if rev:
            sub = sub[::-1]
            sub = np.where(sub < 4, 3 - sub, sub).astype(np.uint8)
        return sub

    def name2id(self, name: str) -> int:
        if self._name2id is None:
            self._name2id = {s.name: i for i, s in enumerate(self.seq)}
        return self._name2id.get(name, -1)

    # ---- telemetry (index.c:112-134) ----
    def stat(self, realtime0: float = 0.0) -> str:
        import time
        n = len(self.keys)
        counts = self.starts[1:] - self.starts[:-1]
        n1 = int(np.sum(counts == 1)) if n else 0
        total_len = sum(s.length for s in self.seq)
        sum_occ = int(counts.sum()) if n else 0
        lines = [
            f"[M::mm_idx_stat] kmer size: {self.k}; skip: {self.w}; "
            f"is_hpc: {self.flag & 0x1}; #seq: {self.n_seq}",
        ]
        if n:
            el = time.time() - realtime0 if realtime0 else 0.0
            lines.append(
                f"[M::mm_idx_stat::{el:.3f}*{1.0:.2f}] distinct minimizers: {n} "
                f"({100.0 * n1 / n:.2f}% are singletons); average occurrences: "
                f"{sum_occ / n:.3f}; average spacing: {total_len / sum_occ:.3f}; "
                f"total length: {total_len}")
        return "\n".join(lines)

    # ---- native serialization ----
    def save(self, path: str, compressed: bool = True) -> None:
        # genome-scale indices (GBs of arrays) save uncompressed: zlib at
        # this size costs minutes for little gain on already-dense arrays
        saver = np.savez_compressed if compressed else np.savez
        saver(
            path,
            meta=np.array([self.w, self.k, self.b, self.flag, self.n_seq], dtype=np.int64),
            names=np.array([s.name for s in self.seq]),
            lens=np.array([s.length for s in self.seq], dtype=np.uint32),
            offsets=np.array([s.offset for s in self.seq], dtype=np.uint64),
            is_alt=np.array([s.is_alt for s in self.seq], dtype=np.uint8),
            S=self.S if self.S is not None else np.empty(0, np.uint8),
            keys=self.keys, starts=self.starts, pos=self.pos)

    @classmethod
    def load(cls, path: str) -> "MiniIndex":
        z = np.load(path, allow_pickle=False)
        w, k, b, flag, n_seq = (int(v) for v in z["meta"])
        mi = cls(w, k, b, flag)
        names, lens, offs, alts = z["names"], z["lens"], z["offsets"], z["is_alt"]
        for i in range(n_seq):
            mi.seq.append(SeqMeta(str(names[i]), int(offs[i]), int(lens[i]), bool(alts[i])))
        mi.S = z["S"]
        mi.keys, mi.starts, mi.pos = z["keys"], z["starts"], z["pos"]
        mi.n_alt = int(alts.sum())
        return mi
