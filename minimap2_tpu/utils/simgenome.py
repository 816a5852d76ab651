"""Deterministic repeat-bearing genome + long-read simulator.

The north-star workload is "ONT ~10kb reads vs GRCh38" (BASELINE.md).
GRCh38 itself cannot ship with the repo, so this module synthesizes a
genome with the repeat structure that makes human-scale mapping hard:

  * interspersed LINE-like elements (~6 kb master, 5'-truncated copies,
    80-95% identity) covering ~18% of the genome;
  * SINE/Alu-like elements (~300 bp, 85-95% identity) covering ~10%;
  * centromeric satellite arrays (171 bp monomer tandem repeats);
  * segmental duplications (20-100 kb blocks re-pasted at ~95% id);
  * the rest is random backbone.

Everything is vectorized NumPy and keyed on one seed, so the same
(total_len, seed) pair regenerates byte-identical sequence anywhere.
Sequences are nt4 codes (0-3) ready for MiniIndex.build_codes.
"""
from __future__ import annotations

import numpy as np

_ACGT = np.frombuffer(b"ACGT", np.uint8)


def _mutate_matrix(rng, copies: np.ndarray, div: np.ndarray) -> np.ndarray:
    """Substitute a per-copy fraction `div` of positions with random bases."""
    n, L = copies.shape
    m = rng.random((n, L)) < div[:, None]
    repl = rng.integers(0, 4, (n, L), dtype=np.uint8)
    return np.where(m, repl, copies)


def _paste_matrix(genome: np.ndarray, starts: np.ndarray,
                  copies: np.ndarray) -> None:
    """genome[starts[i]:starts[i]+L] = copies[i] for all i (overlaps ok)."""
    L = copies.shape[1]
    idx = starts[:, None] + np.arange(L, dtype=np.int64)[None, :]
    genome[idx.reshape(-1)] = copies.reshape(-1)


def _sim_chrom(args):
    """One chromosome, deterministically keyed on (seed, c) — the unit of
    the process-parallel build (the genome is the bench's biggest
    cold-start artifact; 8 chromosomes build in ~wall/8)."""
    per, seed, c, line_master, alu_master, sat_master = args
    rng = np.random.default_rng(np.random.SeedSequence([seed, c + 1]))
    g = rng.integers(0, 4, per, dtype=np.uint8)
    _sim_chrom_body(g, per, rng, line_master, alu_master, sat_master)
    return c, g


def simulate_genome(total_len: int = 1_000_000_000, n_chrom: int = 8,
                    seed: int = 7, processes: int | None = None):
    """Returns (names, [nt4 code arrays]) of n_chrom chromosomes.

    Chromosomes are generated from independent child seeds so they can
    build in parallel processes (deterministic either way)."""
    rng = np.random.default_rng(seed)
    line_master = rng.integers(0, 4, 6000, dtype=np.uint8)
    alu_master = rng.integers(0, 4, 300, dtype=np.uint8)
    sat_master = rng.integers(0, 4, 171, dtype=np.uint8)
    per = total_len // n_chrom
    jobs = [(per, seed, c, line_master, alu_master, sat_master)
            for c in range(n_chrom)]
    if processes is None:
        import os
        processes = min(n_chrom, os.cpu_count() or 1)
    if processes > 1 and n_chrom > 1:
        import multiprocessing as mp
        with mp.get_context("spawn").Pool(processes) as pool:
            parts = dict(pool.map(_sim_chrom, jobs))
    else:
        parts = dict(map(_sim_chrom, jobs))
    names = [f"chr{c + 1}" for c in range(n_chrom)]
    return names, [parts[c] for c in range(n_chrom)]


def _sim_chrom_body(g, per, rng, line_master, alu_master, sat_master):
        # --- LINE-like: ~18% of the chromosome, 5'-truncated copies ---
        n_line = int(per * 0.18 / 3200)
        lens = rng.integers(500, 6001, n_line)
        order = np.argsort(lens)
        # bucket copies by length decile so each bucket pastes as a matrix
        for lo in range(0, n_line, max(1, n_line // 10)):
            sel = order[lo:lo + max(1, n_line // 10)]
            if len(sel) == 0:
                continue
            Lb = int(lens[sel].max())
            cp = np.broadcast_to(line_master[6000 - Lb:],
                                 (len(sel), Lb)).copy()
            # truncate by masking the 5' side with backbone-random bases
            keep = lens[sel]
            mcol = np.arange(Lb)[None, :] >= (Lb - keep)[:, None]
            rnd = rng.integers(0, 4, (len(sel), Lb), dtype=np.uint8)
            cp = np.where(mcol, cp, rnd)
            cp = _mutate_matrix(rng, cp, rng.uniform(0.05, 0.20, len(sel)))
            st = rng.integers(0, per - Lb, len(sel))
            _paste_matrix(g, st, cp)
        # --- Alu-like: ~10% ---
        n_alu = int(per * 0.10 / 300)
        cp = np.broadcast_to(alu_master, (n_alu, 300)).copy()
        cp = _mutate_matrix(rng, cp, rng.uniform(0.05, 0.15, n_alu))
        st = rng.integers(0, per - 300, n_alu)
        _paste_matrix(g, st, cp)
        # --- centromeric satellite: one big array region ---
        cen = per // 2 + int(rng.integers(-per // 20, per // 20))
        n_arr = 25
        for _ in range(n_arr):
            reps = int(rng.integers(60, 600))
            arr = np.tile(sat_master, reps)
            m = rng.random(arr.shape[0]) < 0.03
            arr = np.where(m, rng.integers(0, 4, arr.shape[0],
                                           dtype=np.uint8), arr)
            pos = cen + int(rng.integers(-2_000_000, 2_000_000))
            pos = max(0, min(per - len(arr), pos))
            g[pos:pos + len(arr)] = arr
        # --- segmental duplications: 10 blocks of 20-100 kb at ~95% id ---
        for _ in range(10):
            Lb = int(rng.integers(20_000, 100_000))
            src = int(rng.integers(0, per - Lb))
            dst = int(rng.integers(0, per - Lb))
            blk = g[src:src + Lb].copy()
            m = rng.random(Lb) < 0.05
            blk[m] = rng.integers(0, 4, int(m.sum()), dtype=np.uint8)
            g[dst:dst + Lb] = blk


def simulate_reads(seqs, n_reads: int, rng, min_len: int = 8000,
                   max_len: int = 11000, sub: float = 0.05,
                   dele: float = 0.025, ins: float = 0.025,
                   name_seqs: list[str] | None = None):
    """ONT-like reads with pbsim2fq-style truth names (paftools mapeval
    format: readname = '<id>!<chr>!<st>!<en>!<strand>').

    Returns (names, list of nt4 code arrays).  Vectorized per read.
    """
    tot = np.array([len(s) for s in seqs], np.float64)
    pchr = tot / tot.sum()
    names, out = [], []
    for i in range(n_reads):
        ci = int(rng.choice(len(seqs), p=pchr))
        src_seq = seqs[ci]
        ln = int(rng.integers(min_len, max_len))
        st = int(rng.integers(0, len(src_seq) - ln))
        src = src_seq[st:st + ln].astype(np.uint8)
        r = rng.random(ln)
        # substitutions
        s = src.copy()
        msub = r < sub
        s[msub] = (s[msub] + rng.integers(1, 4, int(msub.sum()),
                                          dtype=np.uint8)) % 4
        # deletions: drop bases
        mdel = (r >= sub) & (r < sub + dele)
        s = s[~mdel]
        # insertions: duplicate positions with random base
        r2 = rng.random(len(s))
        mins = r2 < ins
        extra = rng.integers(0, 4, int(mins.sum())).astype(np.uint8)
        pos = np.flatnonzero(mins)
        s = np.insert(s, pos, extra)
        strand = "+"
        if i % 2:
            s = (3 - s)[::-1].astype(np.uint8)
            strand = "-"
        cname = name_seqs[ci] if name_seqs else f"chr{ci + 1}"
        names.append(f"S1_{i}!{cname}!{st}!{st + ln}!{strand}")
        out.append(s)
    return names, out


def codes_to_bytes(codes: np.ndarray) -> bytes:
    return _ACGT[codes].tobytes()


def write_fasta(path: str, names, seqs_codes, width: int = 60) -> None:
    """Write nt4 code arrays as a FASTA file (for the reference binary)."""
    with open(path, "wb") as f:
        for nm, cd in zip(names, seqs_codes):
            f.write(b">" + nm.encode() + b"\n")
            b = _ACGT[cd]
            n = len(b)
            for i in range(0, n, width):
                f.write(b[i:i + width].tobytes())
                f.write(b"\n")
