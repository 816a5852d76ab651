#!/usr/bin/env python
"""Microbenchmark sweep for the extd2 Pallas kernel (north-star #2).

Measures banded DP cell-updates/s across (G, RB, with_cigar, approx)
configurations on the real chip.  Usage:
    python scripts/bench_extend.py [NP] [QP] [w]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(NP_, QP, TP, w, W, G, RB, with_cigar, approx, reps=4):
    import jax
    from minimap2_tpu.ops.extend_pallas2 import extd2_batch2
    rng = np.random.default_rng(0)
    qr = rng.integers(0, 4, (NP_, QP)).astype(np.uint8)
    sf = rng.integers(0, 4, (NP_, TP)).astype(np.uint8)
    lens = np.full((NP_, 2), QP, np.int32)
    R = (QP + TP + 127) // 128 * 128
    kw = dict(G=G, W=W, RB=RB, R=R, QP=QP, TP=TP, q=4, e=2, q2=24, e2=1,
              w=w, zdrop=-1, right_mode=False, approx_max=approx,
              approx_drop=False, sc_mch=2, sc_mis=-4, sc_N=0,
              with_cigar=with_cigar)
    args = (np.asarray(qr), np.asarray(sf), np.asarray(lens))
    t_c0 = time.perf_counter()
    p, ez = extd2_batch2(*args, **kw)
    np.asarray(ez[:1])
    t_compile = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(reps):
        p, ez = extd2_batch2(*args, **kw)
        np.asarray(ez[:1])
    dt = (time.perf_counter() - t0) / reps
    rr = np.arange(QP + TP - 1)
    band = np.minimum.reduce([np.full_like(rr, w), rr + 1,
                              QP + TP - 1 - rr])
    cells = int(band.sum()) * NP_
    return cells / dt, dt, t_compile


def main():
    NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    QP = int(sys.argv[2]) if len(sys.argv) > 2 else 10240
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    TP = QP
    W = (w + 48 + 127) // 128 * 128
    print(f"NP={NP_} QP={QP} w={w} W={W}")
    cfgs = []
    for G in (16, 32, 64):
        for RB in (32, 64, 128, 256):
            # VMEM budget: 2 row inputs (RB,G,W) u8 x2 buffers + p out
            vm = (2 * RB * G * W * 2 + (RB * G * W) * 2
                  + 8 * G * W * 4 + G * 512)
            if vm > 12 * 2 ** 20:
                continue
            cfgs.append((G, RB))
    # (with_cigar, approx): (1, True) is the production gap-fill config
    # (align_batch + the dp_cells metric); (1, False) = exact extension;
    # (0, True) = score-only
    for cig, approx in ((True, True), (True, False), (False, True)):
        for G, RB in cfgs:
            try:
                cps, dt, tc = run_one(NP_, QP, TP, w, W, G, RB, cig, approx)
                print(f"G={G:3d} RB={RB:3d} cigar={int(cig)} "
                      f"approx={int(approx)} "
                      f"-> {cps/1e9:6.2f} Gcells/s  ({dt*1e3:.1f} ms, "
                      f"compile {tc:.0f}s)", flush=True)
            except Exception as e:
                print(f"G={G:3d} RB={RB:3d} cigar={int(cig)} "
                      f"approx={int(approx)} -> FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
