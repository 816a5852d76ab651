#!/usr/bin/env python
"""Record the reference binary's single-core reads/s on the EXACT bench
workload (device-generated 1 Gb genome, seed 7, 512 ONT-like reads),
entirely on the CPU backend -- jax.random is backend-deterministic, so
this reproduces the HBM genome byte for byte without any device
download.  Writes .bench_cache/ref_1g_s7dev2.fa{,.mmi,.refrate.json}.

Run with: JAX_PLATFORMS=cpu python scripts/record_refrate.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REF_BIN = os.environ.get("MM2_REF_BIN", "/tmp/mm2build/minimap2")
CACHE = os.path.join(ROOT, ".bench_cache")
GENOME_LEN = 1_000_000_000
GENOME_SEED = 7
N_READS = 512


def main():
    import jax
    # the axon sitecustomize imports jax at interpreter start, so the
    # JAX_PLATFORMS env var is already consumed -- use config.update
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert os.path.exists(REF_BIN), f"missing reference binary {REF_BIN}"
    from minimap2_tpu.utils.simgenome_dev import (grch38_envelope_parts,
                                                  simulate_genome_device,
                                                  simulate_reads_device)
    from minimap2_tpu.utils.simgenome import write_fasta
    os.makedirs(CACHE, exist_ok=True)
    grch38 = "--grch38" in sys.argv
    t0 = time.time()
    if grch38:
        # the 3.1 Gb / 195-contig envelope (BASELINE north-star row 1)
        fa = os.path.join(CACHE, "ref_grch38_env.fa")
        names, parts = grch38_envelope_parts()
        parts = [np.asarray(p) for p in parts]
        read_parts, read_names = parts[:24], names[:24]
        read_seed, tag = 3, "grch38_env"
    else:
        fa = os.path.join(CACHE, f"ref_1g_s{GENOME_SEED}dev2.fa")
        names, parts = simulate_genome_device(GENOME_LEN, 8, GENOME_SEED)
        parts = [np.asarray(p) for p in parts]
        read_parts, read_names = parts, names
        read_seed, tag = 1, f"1g_s{GENOME_SEED}dev2"
    print(f"[refrate] genome regenerated on cpu in {time.time()-t0:.0f}s",
          file=sys.stderr)
    if not os.path.exists(fa):
        write_fasta(fa, names, parts)
    rnames, rcodes = simulate_reads_device(
        read_parts, N_READS, seed=read_seed, names=read_names)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    fq = os.path.join(CACHE, f"reads_{tag}.fa")
    with open(fq, "w") as f:
        for nm, c in zip(rnames, rcodes):
            f.write(f">{nm}\n{ACGT[c].tobytes().decode()}\n")
    mmi = fa + ".mmi"
    if not os.path.exists(mmi):
        t0 = time.time()
        subprocess.run([REF_BIN, "-d", mmi, fa], check=True,
                       capture_output=True)
        print(f"[refrate] reference index built in {time.time()-t0:.0f}s",
              file=sys.stderr)
    # warm the page cache, then time single-thread mapping
    subprocess.run([REF_BIN, "-t1", mmi, fq], check=True,
                   capture_output=True)
    t0 = time.perf_counter()
    subprocess.run([REF_BIN, "-t1", mmi, fq], check=True,
                   capture_output=True)
    dt = time.perf_counter() - t0
    rate = N_READS / dt
    stamp = fa + ".refrate.json"
    with open(stamp, "w") as f:
        json.dump({"reads_per_s": rate, "n_reads": N_READS,
                   "host": os.uname().nodename,
                   "genome": f"dev2 seed={GENOME_SEED} len={GENOME_LEN}",
                   "ref_version": "2.30-r1299"}, f)
    print(f"[refrate] {rate:.1f} reads/s single-core -> {stamp}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
