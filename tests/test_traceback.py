"""Device traceback kernel vs the ksw2 oracle backtrack (global mode)."""
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from minimap2_tpu.map.align_engine import gen_simple_mat  # noqa: E402
from minimap2_tpu.ops import ksw2_np  # noqa: E402
from minimap2_tpu.ops.extend_pallas2 import extd2_batch2  # noqa: E402
from minimap2_tpu.ops.traceback_pallas import (decode_ops,  # noqa: E402
                                               traceback_batch)


def test_traceback_matches_oracle():
    os.environ["MM2TPU_NO_NATIVE"] = "1"
    try:
        rng = np.random.default_rng(1)
        G, W, RB = 16, 256, 128
        QP = TP = 256
        RC = (QP + TP + RB - 1) // RB
        N, w = 16, 100
        mat = gen_simple_mat(5, 2, -4, 1)
        qs_l, ts_l, lens = [], [], []
        for n in range(N):
            ql = int(rng.integers(2, 250))
            tl = int(np.clip(ql + rng.integers(-w, w), 1, 250))
            q_ = rng.integers(0, 4, ql).astype(np.uint8)
            t_ = q_[:min(ql, tl)].copy()
            t_ = np.concatenate(
                [t_, rng.integers(0, 4, max(0, tl - len(t_)))
                 .astype(np.uint8)])[:tl]
            mut = rng.random(tl) < rng.choice([0.05, 0.2])
            t_[mut] = rng.integers(0, 4, int(mut.sum())).astype(np.uint8)
            qs_l.append(q_)
            ts_l.append(t_)
            lens.append((ql, tl))
        qr = np.zeros((N, QP), np.uint8)
        sf = np.zeros((N, TP), np.uint8)
        for n, (q_, t_) in enumerate(zip(qs_l, ts_l)):
            qr[n, :len(q_)] = q_[::-1]
            sf[n, :len(t_)] = t_
        lens = np.array(lens, np.int32)
        p, _ = extd2_batch2(
            jnp.asarray(qr), jnp.asarray(sf), jnp.asarray(lens), G=G, W=W,
            RB=RB, R=RC * RB, QP=QP, TP=TP, q=4, e=2, q2=24, e2=1, w=w,
            zdrop=-1, right_mode=False, approx_max=True, approx_drop=False,
            sc_mch=2, sc_mis=-4, sc_N=0, with_cigar=True, interpret=True)
        ops, fin = traceback_batch(p, jnp.asarray(lens), G=G, W=W, RB=RB,
                                   R=RC * RB, w=w, interpret=True)
        ops, fin = np.asarray(ops), np.asarray(fin)
        for n in range(N):
            ql, tl = lens[n]
            ref = ksw2_np.ksw_extd2(int(ql), qs_l[n], int(tl), ts_l[n], 5,
                                    mat, 4, 2, 24, 1, w, -1, 0, 0x08)
            cig = decode_ops(ops[n], int(fin[n, 0]), int(fin[n, 1]))
            assert list(ref.cigar) == cig, n
    finally:
        del os.environ["MM2TPU_NO_NATIVE"]
