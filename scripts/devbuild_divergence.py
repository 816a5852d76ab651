#!/usr/bin/env python
"""Quantify the device index build's documented sketch divergences at
scale (r04 verdict weak #9): count minimizers that differ between the
DEVICE build (TPU, devbuild.py with its _edge_fix emission rule) and the
HOST reference build (MiniIndex, golden-tested against mm_sketch) on one
125 Mb contig of the bench genome.

The host codes come from the cached bench FASTA (written by
scripts/record_refrate.py / bench_ref from the SAME jax.random stream
that generates the device genome), so no genome-scale device->host
download happens; the host minimizer set is UPLOADED (fast direction)
and the multiset difference is computed ON DEVICE.

Prints one line:  [devbuild] divergence: N of M minimizers (x.xxe-x)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
FA = os.path.join(ROOT, ".bench_cache", "ref_1g_s7dev2.fa")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/mm2tpu_jit"))
    assert os.path.exists(FA), f"run bench.py/record_refrate.py first: {FA}"
    from minimap2_tpu.index.index import MiniIndex
    from minimap2_tpu.io.fastx import FastxReader
    from minimap2_tpu.parallel.devbuild import build_device_index
    from minimap2_tpu.utils.intfloat import SEQ_NT4
    from minimap2_tpu.utils.simgenome_dev import simulate_genome_device

    # host side: chr1 (125 Mb) from the cached FASTA + the host build
    t0 = time.time()
    rd = FastxReader(FA)
    rec = rd.read1()
    rd.close()
    codes = SEQ_NT4[np.frombuffer(rec.seq, np.uint8)]
    print(f"[div] host chr1: {len(codes):,} bp ({time.time()-t0:.0f}s)",
          flush=True)
    t0 = time.time()
    mi = MiniIndex.build_codes([rec.name], [codes], w=10, k=15)
    print(f"[div] host build: {len(mi.pos):,} minimizers "
          f"({time.time()-t0:.0f}s)", flush=True)

    # device side: regenerate chr1 in HBM, device-build with the legacy
    # layout (keeps sc2/krows so per-position keys are reconstructable)
    os.environ["MM2TPU_DEVBUILD_H2R"] = "0"
    t0 = time.time()
    names_g, parts = simulate_genome_device(1_000_000_000, 8, 7)
    di, meta = build_device_index([names_g[0]], [parts[0]], w=10, k=15)
    del parts
    print(f"[div] device build: {meta.n_mini:,} minimizers "
          f"({time.time()-t0:.0f}s)", flush=True)

    # host (key, pos) pairs in the device's separated coordinate space
    off0 = int(meta.seq_off[0])
    h_klo = mi.keys.astype(np.uint32)                     # 30-bit keys
    h_cnt = (mi.starts[1:] - mi.starts[:-1]).astype(np.int64)
    h_key_per_pos = np.repeat(h_klo, h_cnt)
    rpos = ((mi.pos & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    strand = (mi.pos & np.uint64(1)).astype(np.uint32)
    h_pv = (((rpos + off0).astype(np.uint32) << np.uint32(1)) | strand)

    @jax.jit
    def diff_count(d_starts, d_klo, d_pos, h_key, h_pos, n_d, n_h):
        # device per-position keys: run index via searchsorted
        P = d_pos.shape[0]
        i = jnp.arange(P, dtype=jnp.int32)
        run = jnp.searchsorted(d_starts, i, side="right") - 1
        d_key = d_klo[jnp.clip(run, 0, d_klo.shape[0] - 1)]
        side_d = jnp.zeros((P,), jnp.uint32)
        side_h = jnp.ones((h_key.shape[0],), jnp.uint32)
        k_all = jnp.concatenate([d_key, h_key])
        p_all = jnp.concatenate([d_pos, h_pos])
        s_all = jnp.concatenate([side_d, side_h])
        valid = jnp.concatenate([i < n_d,
                                 jnp.arange(h_key.shape[0]) < n_h])
        k_all = jnp.where(valid, k_all, jnp.uint32(0xFFFFFFFF))
        k_s, p_s, s_s, v_s = jax.lax.sort((k_all, p_all, s_all,
                                           valid.astype(jnp.uint32)),
                                          num_keys=3)
        # matched = adjacent (key,pos)-equal pairs on opposite sides
        eq = ((k_s[1:] == k_s[:-1]) & (p_s[1:] == p_s[:-1])
              & (s_s[1:] != s_s[:-1]) & (v_s[1:] == 1) & (v_s[:-1] == 1))
        # greedy non-overlapping adjacent matches (multisets contain no
        # duplicate (key,pos) pairs within one side, so adjacency is
        # exact: any cross-side equal pair is adjacent after the sort)
        return jnp.sum(eq, dtype=jnp.int32)

    K = meta.n_distinct
    starts = di.sc2[:, 1].cumsum() - di.sc2[:, 1]   # rebuild starts plane
    starts = jnp.where(jnp.arange(di.sc2.shape[0]) < K, di.sc2[:, 0],
                       np.int32(2**31 - 1))
    klo = di.krows.reshape(-1, 2)[:, 1] if di.krows is not None \
        else di.keys2[:, 1]
    matched = int(diff_count(starts, klo, di.pos2,
                             jnp.asarray(h_key_per_pos),
                             jnp.asarray(h_pv),
                             jnp.int32(meta.n_mini),
                             jnp.int32(len(h_pv))))
    n_d, n_h = meta.n_mini, len(h_pv)
    div = (n_d - matched) + (n_h - matched)
    tot = max(n_d, n_h)
    print(f"[devbuild] edgefix divergence: {div} of {tot} minimizers "
          f"({div / tot:.2e}) [device-only={n_d - matched} "
          f"host-only={n_h - matched}]", flush=True)


if __name__ == "__main__":
    main()
