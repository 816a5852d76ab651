#!/usr/bin/env python
"""Batch -c parity gate: fraction of --batch device alignment records
byte-identical to the host (bit-exact) path on simulated long reads.

VERDICT round-2 criterion: >=99% identical records with the remainder
explained by documented fallbacks/approximations.  Prints a JSON line.

Usage: python scripts/batch_parity.py [n_reads] (default 128; uses the
bench cache's 1 Gb genome when present, else a 5 Mb random genome).
"""
from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def main():
    import jax
    cache_dir = os.path.expanduser("~/.cache/mm2tpu_jit")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from minimap2_tpu.config import (MM_F_CIGAR, MM_F_OUT_CG, MapOptions,
                                     mapopt_update)
    from minimap2_tpu.index.index import MiniIndex
    from minimap2_tpu.utils.simgenome import simulate_reads
    from minimap2_tpu.parallel.engine import run_batched_align_cli
    from minimap2_tpu.map.driver import (iter_fragments, map_fragment,
                                         write_fragment)

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ipath = os.path.join(CACHE, "index_1g_s7.npz")
    gpath = os.path.join(CACHE, "genome_1g_s7.npz")
    if os.path.exists(ipath) and os.path.exists(gpath):
        mi = MiniIndex.load(ipath)
        gz = np.load(gpath)
        gseqs = [gz[n] for n in gz.keys()]
        tag = "1Gb"
    else:
        rng0 = np.random.default_rng(0)
        gseqs = [rng0.integers(0, 4, 5_000_000, dtype=np.uint8)]
        mi = MiniIndex.build_codes(["chr1"], gseqs, w=10, k=15)
        tag = "5Mb"
    rng = np.random.default_rng(11)
    names, rcodes = simulate_reads(gseqs, n_reads, rng)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    mo = MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG
    mapopt_update(mo, mi)

    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for nm, c in zip(names, rcodes):
        fa.write(f">{nm}\n{ACGT[c].tobytes().decode()}\n")
    fa.close()

    t0 = time.time()
    bout = io.StringIO()
    run_batched_align_cli(mi, mo, [fa.name], bout, batch_reads=128, L=12288)
    t_batch = time.time() - t0
    t0 = time.time()
    hout = io.StringIO()
    for frag in iter_fragments([fa.name], False):
        res = map_fragment(mi, mo, frag)
        write_fragment(hout, mi, mo, frag, [r.regs for r in res],
                       [r.rep_len for r in res])
    t_host = time.time() - t0
    os.unlink(fa.name)

    bl = {}
    for line in bout.getvalue().splitlines():
        bl.setdefault(line.split("\t")[0], []).append(line)
    hl = {}
    for line in hout.getvalue().splitlines():
        hl.setdefault(line.split("\t")[0], []).append(line)
    n_ident = n_coord = n_tot = 0
    for nm in hl:
        for a, b in zip(bl.get(nm, []), hl[nm]):
            n_tot += 1
            if a == b:
                n_ident += 1
            ta, tb = a.split("\t"), b.split("\t")
            cg_a = [f for f in ta if f.startswith("cg:")]
            cg_b = [f for f in tb if f.startswith("cg:")]
            if ta[:9] == tb[:9] and cg_a == cg_b:   # coords + cigar
                n_coord += 1
    print(json.dumps({
        "workload": tag, "n_reads": n_reads, "records": n_tot,
        "identical": n_ident, "identical_frac": round(n_ident / n_tot, 4),
        "coord_cigar_identical": n_coord,
        "coord_cigar_frac": round(n_coord / n_tot, 4),
        "t_batch_s": round(t_batch, 1), "t_host_s": round(t_host, 1),
    }))


if __name__ == "__main__":
    main()
