#!/usr/bin/env python
"""Benchmark: banded extension DP (extd2 Pallas kernel) cell-updates/s on one
chip, vs the reference's ksw_extd2_sse (single core, x64 as a 64-core-node
proxy) measured on this machine when the oracle .so is available, else vs a
recorded single-core rate.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_LIB = os.environ.get("MM2_REF_LIB", "/tmp/mm2build/libminimap2.so")
# Fallback single-core baseline (measured on this machine's CPU with
# ksw_extd2_sse, 2kb x 2kb, w=500, score-only) if the .so is absent.
FALLBACK_REF_CELLS_PER_S = 2.0e9
XEON_CORES = 64


def true_cells(qlen, tlen, w):
    """Banded DP cells the reference computes (pre block-rounding)."""
    r = np.arange(qlen + tlen - 1)
    st = np.maximum(np.maximum(0, r - qlen + 1), (r - w + 1) >> 1)
    en = np.minimum(np.minimum(tlen - 1, r), (r + w) >> 1)
    return int(np.maximum(en - st + 1, 0).sum())


def gen_pairs(rng, N, QP, TP, div=0.1):
    lens = np.zeros((N, 2), np.int32)
    qr = np.zeros((N, QP), np.uint8)
    sf = np.zeros((N, TP), np.uint8)
    cases = []
    for n in range(N):
        ql = QP
        tl = TP
        qs = rng.integers(0, 4, ql).astype(np.uint8)
        ts = qs[:tl].copy()
        mut = rng.random(tl) < div
        ts[mut] = rng.integers(0, 4, int(mut.sum())).astype(np.uint8)
        lens[n] = (ql, tl)
        qr[n, :ql] = qs[::-1]
        sf[n, :tl] = ts
        cases.append((qs, ts))
    return qr, sf, lens, cases


def bench_tpu(qr, sf, lens, QP, TP, W, w, iters=3, with_cigar=True):
    import jax
    import jax.numpy as jnp

    from minimap2_tpu.ops.extend_pallas2 import EZ_SCORE, extd2_batch2

    interp = jax.default_backend() != "tpu"
    R = QP + TP - 1
    args = dict(G=32, W=W, RB=64 if with_cigar else 128, R=R, QP=QP, TP=TP,
                q=4, e=2, q2=24, e2=1, w=w, zdrop=400, right_mode=False,
                approx_max=True, approx_drop=False, sc_mch=2, sc_mis=-4,
                sc_N=-1, with_cigar=with_cigar, interpret=interp)
    jq, js, jl = jnp.asarray(qr), jnp.asarray(sf), jnp.asarray(lens)
    _, ez = extd2_batch2(jq, js, jl, **args)
    np.asarray(ez[:, EZ_SCORE])                  # compile + warm (real sync:
    t0 = time.perf_counter()                     # axon block_until_ready
    for _ in range(iters):                       # does not block)
        _, ez = extd2_batch2(jq, js, jl, **args)
        np.asarray(ez[:, EZ_SCORE])
    dt = (time.perf_counter() - t0) / iters
    return dt, np.asarray(ez)


def bench_ref(cases, w, budget_pairs=4):
    """Reference ksw_extd2_sse single-core rate via the oracle .so."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests"))
    import refbind
    if not refbind.available():
        return None
    from minimap2_tpu.map.align_engine import gen_simple_mat
    mat = gen_simple_mat(5, 2, -4, 1)
    KSW_EZ_APPROX_MAX = 0x08
    cells = 0
    t0 = time.perf_counter()
    for qs, ts in cases[:budget_pairs]:
        refbind.ref_extd2(qs, ts, mat, 4, 2, 24, 1, w, 400, 0,
                          KSW_EZ_APPROX_MAX)   # same mode as the TPU run
        cells += true_cells(len(qs), len(ts), w)
    dt = time.perf_counter() - t0
    return cells / dt


def main():
    import jax
    N, QP, TP, W, w = 256, 2048, 2048, 640, 500
    rng = np.random.default_rng(0)
    qr, sf, lens, cases = gen_pairs(rng, N, QP, TP)
    dt, ez = bench_tpu(qr, sf, lens, QP, TP, W, w)
    cells = sum(true_cells(int(l[0]), int(l[1]), w) for l in lens)
    tpu_rate = cells / dt
    ref_rate = None
    try:
        ref_rate = bench_ref(cases, w)
    except Exception as e:
        print(f"[bench] ref oracle failed: {e}", file=sys.stderr)
    if ref_rate is None:
        ref_rate = FALLBACK_REF_CELLS_PER_S
    baseline = ref_rate * XEON_CORES
    print(f"[bench] backend={jax.default_backend()} N={N} {QP}x{TP} w={w} "
          f"dt={dt * 1e3:.1f}ms tpu={tpu_rate / 1e9:.2f} Gcells/s "
          f"ref_1core={ref_rate / 1e9:.2f} Gcells/s", file=sys.stderr)
    print(json.dumps({
        "metric": "extd2 banded DP cell-updates/s (one chip)",
        "value": round(tpu_rate / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(tpu_rate / baseline, 4),
    }))


if __name__ == "__main__":
    main()
