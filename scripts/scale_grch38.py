#!/usr/bin/env python
"""GRCh38-envelope smoke on the real chip: build a 3.1 Gb / 195-contig
synthetic genome IN HBM, run the device index build (pos_fmt 2: u32
positions + strand bitmap + 4-bit reference plane), then map a small
read batch and check the hits land on the right contigs/positions.

Usage:  python scripts/scale_grch38.py [total_bp] [n_contigs]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    total = int(float(sys.argv[1])) if len(sys.argv) > 1 else 3_100_000_000
    ncon = int(sys.argv[2]) if len(sys.argv) > 2 else 195
    cache_dir = os.path.expanduser("~/.cache/mm2tpu_jit")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    from minimap2_tpu.parallel import engine
    from minimap2_tpu.parallel.batch import BatchParams
    from minimap2_tpu.parallel.devbuild import build_device_index
    from minimap2_tpu.utils.simgenome_dev import (simulate_genome_device,
                                                  simulate_reads_device)

    # GRCh38 shape: 24 big chromosomes carry ~97% of the genome; the
    # remaining contigs are small (alts/unplaced).  Model that: 24
    # contigs of total*0.97/24 plus (ncon-24) contigs sharing 3%.
    big = simulate_genome_device(int(total * 0.97), 24, seed=7)
    small = simulate_genome_device(max(int(total * 0.03), (ncon - 24) * 4096),
                                   ncon - 24, seed=8)
    names = big[0] + [f"alt{i}" for i in range(len(small[1]))]
    parts = big[1] + small[1]
    big[1].clear()      # consume=True frees contigs as they are copied;
    small[1].clear()    # no other list may keep references alive
    del big, small
    jax.block_until_ready(parts[-1])
    print(f"[scale] genome: {sum(int(p.shape[0]) for p in parts):,} bp "
          f"across {len(parts)} contigs", flush=True)
    t0 = time.time()
    di, meta = build_device_index(names, parts, w=10, k=15, verbose=True,
                                  cap_frac=0.21, consume=True)
    parts = None
    print(f"[scale] index built in {time.time()-t0:.0f}s "
          f"pos_fmt={di.pos_fmt} s_fmt={di.s_fmt} "
          f"n_mini={meta.n_mini:,} distinct={meta.n_distinct:,} "
          f"mid_occ={meta.mid_occ}", flush=True)
    assert di.pos_fmt == 2 and di.pstrand is not None and di.s_fmt == 1

    B = 256
    big2 = simulate_genome_device(int(total * 0.97), 24, seed=7)
    rnames, rcodes = simulate_reads_device(big2[1], B, seed=3,
                                           names=names[:24])
    del big2
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    seqs = [ACGT[c].tobytes() for c in rcodes]
    p = BatchParams(L=12288, M=2048, A=4096,
                    occ_cap=min(max(meta.mid_occ, 10), 64), chain_window=64)
    step = engine.make_paf_step(di, p, K=5, min_sc=40)
    t0 = time.time()
    fut = engine.dispatch_batch(step, seqs, p)
    rec = np.asarray(fut)
    dt = time.time() - t0
    sc, sub, qs, qe, rs, re_, rev, rid, cnt, rep = rec
    ok = 0
    n_conf = 0
    n_strict = 0
    fails = []
    for i, nm in enumerate(rnames):
        _tag, cname, st, en, strand = nm.split("!")
        want_rid = names.index(cname)
        # repeat-family multi-mappers (runner-up chain nearly as good)
        # are ambiguous by construction -- mapeval would see them at low
        # mapq; gate only the confident reads
        conf = sub[0, i] < 0.8 * sc[0, i]
        if not conf:
            continue
        n_conf += 1
        # mapeval criterion: right contig + mapped interval overlaps the
        # truth interval (paftools mapeval's correctness rule); strict =
        # also recovers the read head (within 500 bp -- occ_cap-skipped
        # repeat heads fail this, the documented mid_occ shortcut)
        ov = min(int(re_[0, i]), int(en)) - max(int(rs[0, i]), int(st))
        good = (sc[0, i] > 100 and rid[0, i] == want_rid
                and ov > 0.1 * (int(re_[0, i]) - int(rs[0, i])))
        strict = good and abs(int(rs[0, i]) - int(st)) < 500
        ok += int(good)
        n_strict += int(strict)
        if not good and len(fails) < 12:
            fails.append((i, strand, int(st), int(en), int(sc[0, i]),
                          int(rs[0, i]), int(re_[0, i]), int(qs[0, i]),
                          int(qe[0, i]), int(rev[0, i])))
    print(f"[scale] mapped {B} reads in {dt:.1f}s (first batch incl. "
          f"compile); confident: {n_conf}/{B}, mapeval-correct: "
          f"{ok}/{n_conf}, strict head-coverage: {n_strict}/{n_conf}",
          flush=True)
    if fails:
        print("[scale] sample failures (i, strand, want_st, want_en, "
              "score, rs, re, qs, qe, rev):", flush=True)
        for f in fails:
            print(f"[scale]   {f}", flush=True)
    assert n_conf >= B // 2, f"only {n_conf} confident reads"
    assert ok >= int(n_conf * 0.95), f"only {ok}/{n_conf} correct"
    print("[scale] GRCh38-envelope smoke: OK")


if __name__ == "__main__":
    main()
