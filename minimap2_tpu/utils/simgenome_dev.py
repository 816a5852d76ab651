"""Device-side (TPU) synthetic-genome + read-slice generation.

The bench workload (utils/simgenome.py) is a 1 Gb repeat-bearing genome.
Generating it on the host and uploading it costs 30-40 s of single-core
NumPy plus a 1 GB host->device transfer over a link whose bandwidth has
been observed anywhere between 2 and 350 MB/s -- the dominant and least
predictable part of the benchmark's cold start.  This module builds the
same *class* of genome (LINE/Alu/satellite/segdup repeat structure, see
simgenome.py's docstring) entirely in HBM with jax.random, so the only
genome bytes that ever cross the link are the ~5 MB of sampled reads.

Determinism: everything is keyed on a single PRNGKey(seed) with fold_in
per chromosome/phase, so the same seed regenerates the same genome on
any run.  Overlapping repeat pastes are resolved by copy priority (later
copy index wins) via a max-combining scatter -- the device analogue of
the host generator's sequential pastes.

This is bench tooling, not part of the aligner itself.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _paste_max(g, starts, copies, valid):
    """Paste copies[i] at starts[i] with later-i-wins priority.

    g: (P,) u8 backbone.  starts: (n,) i32.  copies: (n, L) u8 (code 0-3).
    valid: (n, L) bool -- which columns of each copy are real.
    """
    n, L = copies.shape
    idx = starts[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    pri = ((jnp.arange(n, dtype=jnp.int32)[:, None] + 1) << 2) \
        | copies.astype(jnp.int32)
    pri = jnp.where(valid, pri, 0)
    buf = jnp.zeros(g.shape, jnp.int32)
    buf = buf.at[idx.reshape(-1)].max(pri.reshape(-1),
                                      mode="drop", unique_indices=False)
    return jnp.where(buf > 0, (buf & 3).astype(jnp.uint8), g)


def _mutate(key, copies, div):
    """Substitute a per-copy fraction div of positions with random bases."""
    k1, k2 = jax.random.split(key)
    m = jax.random.uniform(k1, copies.shape) < div[:, None]
    repl = jax.random.randint(k2, copies.shape, 0, 4, jnp.uint8)
    return jnp.where(m, repl, copies)


@functools.partial(jax.jit, static_argnames=("P",))
def _sim_chrom_dev(key, line_master, alu_master, sat_master, *, P):
    ks = jax.random.split(key, 12)
    g = jax.random.randint(ks[0], (P,), 0, 4, jnp.uint8)
    # --- LINE-like: ~18%, 5'-truncated copies at 80-95% identity ---
    n_line = int(P * 0.18 / 3200)
    LB = 6000
    lens = jax.random.randint(ks[1], (n_line,), 500, LB + 1, jnp.int32)
    col = jnp.arange(LB, dtype=jnp.int32)[None, :]
    keepm = col >= (LB - lens)[:, None]
    cp = jnp.broadcast_to(line_master, (n_line, LB))
    cp = _mutate(ks[2], cp, jax.random.uniform(ks[3], (n_line,),
                                               minval=0.05, maxval=0.20))
    st = jax.random.randint(ks[4], (n_line,), 0, P - LB, jnp.int32)
    g = _paste_max(g, st, cp, keepm)
    # --- Alu-like: ~10% at 85-95% identity ---
    n_alu = int(P * 0.10 / 300)
    cp = jnp.broadcast_to(alu_master, (n_alu, 300))
    cp = _mutate(ks[5], cp, jax.random.uniform(ks[6], (n_alu,),
                                               minval=0.05, maxval=0.15))
    st = jax.random.randint(ks[7], (n_alu,), 0, P - 300, jnp.int32)
    g = _paste_max(g, st, cp, jnp.ones((n_alu, 300), bool))
    # --- centromeric satellite arrays (171 bp monomer tandems) ---
    n_arr, max_rep = 25, 600
    SL = max_rep * 171
    reps = jax.random.randint(ks[8], (n_arr,), 60, max_rep + 1, jnp.int32)
    arr = jnp.tile(sat_master, (n_arr, max_rep))
    arr = _mutate(ks[9], arr, jnp.full((n_arr,), 0.03))
    cen = P // 2 + jax.random.randint(ks[10], (n_arr,),
                                      -P // 20, P // 20, jnp.int32)
    cen = jnp.clip(cen, 0, P - SL)
    vm = jnp.arange(SL, dtype=jnp.int32)[None, :] < (reps * 171)[:, None]
    g = _paste_max(g, cen, arr, vm)
    # --- segmental duplications: 10 blocks of 20-100 kb at ~95% id ---
    DL = 100_000
    kk = jax.random.split(ks[11], 10)

    def seg(i, g):
        k1, k2, k3, k4, k5 = jax.random.split(kk[i], 5)
        Lb = jax.random.randint(k1, (), 20_000, DL, jnp.int32)
        src = jax.random.randint(k2, (), 0, P - DL, jnp.int32)
        dst = jax.random.randint(k3, (), 0, P - DL, jnp.int32)
        blk = lax.dynamic_slice(g, (src,), (DL,))
        m = jax.random.uniform(k4, (DL,)) < 0.05
        blk = jnp.where(m, jax.random.randint(k5, (DL,), 0, 4, jnp.uint8),
                        blk)
        keep = jnp.arange(DL, dtype=jnp.int32) < Lb
        cur = lax.dynamic_slice(g, (dst,), (DL,))
        return lax.dynamic_update_slice(g, jnp.where(keep, blk, cur), (dst,))

    g = lax.fori_loop(0, 10, seg, g, unroll=False)
    return g


def simulate_genome_device(total_len: int = 1_000_000_000, n_chrom: int = 8,
                           seed: int = 7):
    """Returns (names, [device u8 nt4 arrays]) -- nothing leaves HBM."""
    root = jax.random.PRNGKey(seed)
    km = jax.random.split(jax.random.fold_in(root, 0xA11), 3)
    line_master = jax.random.randint(km[0], (6000,), 0, 4, jnp.uint8)
    alu_master = jax.random.randint(km[1], (300,), 0, 4, jnp.uint8)
    sat_master = jax.random.randint(km[2], (171,), 0, 4, jnp.uint8)
    per = total_len // n_chrom
    names, parts = [], []
    for c in range(n_chrom):
        kc = jax.random.fold_in(root, c + 1)
        parts.append(_sim_chrom_dev(kc, line_master, alu_master, sat_master,
                                    P=per))
        names.append(f"chr{c + 1}")
    return names, parts


def grch38_envelope_parts(total: int = 3_100_000_000, ncon: int = 195):
    """The GRCh38-shaped bench envelope: 24 big chromosomes carrying 97%
    of `total` (seed 7) plus ncon-24 small alt/unplaced contigs sharing
    3% (seed 8).  Shared by the scale smoke, the driver bench and the
    reference-rate recorder so all three see the identical genome.
    Returns (names, parts); parts are device (or cpu-backend) arrays."""
    big = simulate_genome_device(int(total * 0.97), 24, seed=7)
    small = simulate_genome_device(max(int(total * 0.03),
                                       (ncon - 24) * 4096),
                                   ncon - 24, seed=8)
    names = big[0] + [f"alt{i}" for i in range(len(small[1]))]
    parts = big[1] + small[1]
    big[1].clear()      # devbuild consume=True frees contigs as copied;
    small[1].clear()    # no other list may keep references alive
    return names, parts


@functools.partial(jax.jit, static_argnames=("RL",))
def _slice_reads(flat, starts, RL):
    idx = starts[:, None] + jnp.arange(RL, dtype=jnp.int32)[None, :]
    return flat[idx]


def write_genome_fasta_host(path, total_len: int, n_chrom: int, seed: int):
    """Regenerate the device genome on the CPU backend and write FASTA.

    jax.random (threefry) is backend-deterministic, so running the same
    generator under JAX_PLATFORMS=cpu reproduces the HBM genome byte for
    byte -- this replaces a ~1 GB device->host download over a link that
    has been observed as slow as 1-2 MB/s.  Must run in a fresh process
    with JAX_PLATFORMS=cpu (see bench.py bench_ref)."""
    from .simgenome import write_fasta
    names, parts = simulate_genome_device(total_len, n_chrom, seed)
    write_fasta(path, names, [np.asarray(p) for p in parts])
    return names


def satellite_regions(P: int, n_chrom: int, seed: int = 7):
    """The realized (center, length) of each chromosome's 25 centromeric
    satellite arrays -- recomputed from the same PRNG stream as
    _sim_chrom_dev (cheap: no genome materialization).  Feeds the
    deliberately-AMBIGUOUS read slice of the accuracy gate (reads fully
    inside 171-bp tandem arrays are multi-mappers by construction, so
    the mapq model must produce a sub-Q60 tail on them)."""
    root = jax.random.PRNGKey(seed)
    n_arr, max_rep = 25, 600
    out = []
    for c in range(n_chrom):
        kc = jax.random.fold_in(root, c + 1)
        ks = jax.random.split(kc, 12)
        reps = jax.random.randint(ks[8], (n_arr,), 60, max_rep + 1,
                                  jnp.int32)
        cen = P // 2 + jax.random.randint(ks[10], (n_arr,),
                                          -P // 20, P // 20, jnp.int32)
        cen = jnp.clip(cen, 0, P - max_rep * 171)
        out.append((np.asarray(cen).astype(np.int64),
                    np.asarray(reps).astype(np.int64) * 171))
    return out


def simulate_reads_device(parts, n_reads: int, seed: int = 1,
                          min_len: int = 8000, max_len: int = 11000,
                          sub: float = 0.05, dele: float = 0.025,
                          ins: float = 0.025, names=None,
                          region: str | None = None,
                          genome_seed: int = 7):
    """Slice reads from the device genome; only ~n_reads*max_len bytes are
    downloaded.  The error model (sub/del/ins, alternating strand) and the
    mapeval truth-name format match utils/simgenome.simulate_reads.

    region='satellite' samples read starts inside the centromeric
    tandem arrays (see satellite_regions) instead of uniformly."""
    n_chrom = len(parts)
    per = int(parts[0].shape[0])
    rng = np.random.default_rng(seed)
    ci = rng.integers(0, n_chrom, n_reads)
    ln = rng.integers(min_len, max_len, n_reads)
    if region == "satellite":
        regs = satellite_regions(per, n_chrom, genome_seed)
        ai = rng.integers(0, len(regs[0][0]), n_reads)
        cen = np.array([regs[c][0][a] for c, a in zip(ci, ai)])
        al = np.array([regs[c][1][a] for c, a in zip(ci, ai)])
        span = np.maximum(al - ln, 1)
        st = (cen + rng.random(n_reads) * span).astype(np.int64)
        st = np.minimum(st, per - ln - 1)
    else:
        st = (rng.random(n_reads) * (per - ln)).astype(np.int64)
    # slice per contig (a flat concat overflows int32 gather indices for
    # > 2 Gb genomes); reassemble rows in the original read order
    raw = np.zeros((n_reads, max_len), np.uint8)
    for c in range(n_chrom):
        sel = np.flatnonzero(ci == c)
        if len(sel):
            pad_n = 1 << max(0, int(len(sel) - 1).bit_length())
            stp = np.zeros(pad_n, np.int32)
            stp[:len(sel)] = st[sel]
            rows = np.asarray(_slice_reads(parts[c], jnp.asarray(stp),
                                           max_len))
            raw[sel] = rows[:len(sel)]
    names_out, out = [], []
    for i in range(n_reads):
        src = raw[i, :ln[i]].astype(np.uint8)
        r = rng.random(int(ln[i]))
        s = src.copy()
        msub = r < sub
        s[msub] = (s[msub] + rng.integers(1, 4, int(msub.sum()),
                                          dtype=np.uint8)) % 4
        mdel = (r >= sub) & (r < sub + dele)
        s = s[~mdel]
        r2 = rng.random(len(s))
        mins = r2 < ins
        extra = rng.integers(0, 4, int(mins.sum())).astype(np.uint8)
        pos = np.flatnonzero(mins)
        s = np.insert(s, pos, extra)
        strand = "+"
        if i % 2:
            s = (3 - s)[::-1].astype(np.uint8)
            strand = "-"
        cname = names[ci[i]] if names else f"chr{ci[i] + 1}"
        names_out.append(f"S1_{i}!{cname}!{st[i]}!{st[i] + ln[i]}!{strand}")
        out.append(s)
    return names_out, out


def simulate_reads_device_clr(parts, n_reads: int, seed: int = 97,
                              mean_len: int = 20000, sd_len: int = 4000,
                              min_len: int = 12000, max_len: int = 30000,
                              err: float = 0.05, sv_frac: float = 0.1,
                              names=None):
    """OFF-DISTRIBUTION read set: pbsim-CLR-shaped reads for gating the
    device engine's accuracy shortcuts against reads its caps were NOT
    tuned on (tex/hs38-simu.sh recipe shape: ~2x20 kb, 95% accuracy).

    Independent of simulate_reads_device in every axis: normal (not
    uniform) lengths around 20 kb, pbsim's CLR error mix (sub:ins:del =
    10:60:30 -- insertion-dominated, vs the ONT model's sub-dominated
    50:25:25), random (not alternating) strand, and sv_frac of reads
    carry one 1-10 kb internal deletion (a long-join/SV stressor).
    Truth names use the same mapeval format; the truth interval is the
    full source span including the deleted part."""
    n_chrom = len(parts)
    per = int(parts[0].shape[0])
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xC1B]))
    ln = np.clip(rng.normal(mean_len, sd_len, n_reads), min_len,
                 max_len).astype(np.int64)
    sv_del = np.where(rng.random(n_reads) < sv_frac,
                      rng.integers(1000, 10000, n_reads), 0)
    span = ln + sv_del
    ci = rng.integers(0, n_chrom, n_reads)
    st = (rng.random(n_reads) * (per - span)).astype(np.int64)
    # slice per contig (a flat concat overflows int32 gather indices for
    # > 2 Gb genomes -- same fix as simulate_reads_device); rows
    # reassemble in the original read order
    span_max = int(span.max())
    raw = np.zeros((n_reads, span_max), np.uint8)
    for c in range(n_chrom):
        sel = np.flatnonzero(ci == c)
        if len(sel):
            pad_n = 1 << max(0, int(len(sel) - 1).bit_length())
            stp = np.zeros(pad_n, np.int32)
            stp[:len(sel)] = st[sel]
            rows = np.asarray(_slice_reads(parts[c], jnp.asarray(stp),
                                           span_max))
            raw[sel] = rows[:len(sel)]
    sub, ins, dele = err * 0.1, err * 0.6, err * 0.3
    names_out, out = [], []
    for i in range(n_reads):
        src = raw[i, :span[i]].astype(np.uint8)
        if sv_del[i]:
            mid = int(span[i]) // 2
            src = np.concatenate([src[:mid], src[mid + int(sv_del[i]):]])
        r = rng.random(len(src))
        s = src.copy()
        msub = r < sub
        s[msub] = (s[msub] + rng.integers(1, 4, int(msub.sum()),
                                          dtype=np.uint8)) % 4
        mdel = (r >= sub) & (r < sub + dele)
        s = s[~mdel]
        r2 = rng.random(len(s))
        mins = r2 < ins
        extra = rng.integers(0, 4, int(mins.sum())).astype(np.uint8)
        s = np.insert(s, np.flatnonzero(mins), extra)
        strand = "+"
        if rng.random() < 0.5:
            s = (3 - s)[::-1].astype(np.uint8)
            strand = "-"
        cname = names[ci[i]] if names else f"chr{ci[i] + 1}"
        names_out.append(
            f"C1_{i}!{cname}!{st[i]}!{st[i] + span[i]}!{strand}")
        out.append(s)
    return names_out, out


if __name__ == "__main__":      # CPU-side FASTA regeneration entry
    import sys as _sys
    _tl, _nc, _sd, _out = (int(_sys.argv[1]), int(_sys.argv[2]),
                           int(_sys.argv[3]), _sys.argv[4])
    # backend determinism is the point: force cpu (the axon sitecustomize
    # imports jax early, so the JAX_PLATFORMS env var may be consumed)
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    write_genome_fasta_host(_out, _tl, _nc, _sd)
