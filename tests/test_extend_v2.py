"""extd2 Pallas kernel v2 vs the bit-exact NumPy oracle (interpret mode)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from minimap2_tpu.map.align_engine import gen_simple_mat  # noqa: E402
from minimap2_tpu.ops import ksw2_np  # noqa: E402
from minimap2_tpu.ops.extend_pallas2 import (EZ_MAX, EZ_MAXQ, EZ_MAXT,  # noqa: E402
                                             EZ_MQE, EZ_MQET, EZ_MTE,
                                             EZ_MTEQ, EZ_SCORE, EZ_ZDROP,
                                             extd2_batch2, wstart_chunk_np)

Q, E, Q2, E2 = 4, 2, 24, 1
KSW_APPROX_MAX, KSW_SCORE_ONLY = 0x08, 0x01


def _cases(seed, N, QP, TP, div_hi=0.4):
    rng = np.random.default_rng(seed)
    lens = np.zeros((N, 2), np.int32)
    qr = np.zeros((N, QP), np.uint8)
    sf = np.zeros((N, TP), np.uint8)
    cases = []
    for n in range(N):
        ql = int(rng.integers(30, QP))
        tl = int(rng.integers(30, TP))
        qs = rng.integers(0, 4, ql).astype(np.uint8)
        ts = qs[:min(ql, tl)].copy()
        ts = np.concatenate([ts, rng.integers(0, 4, max(0, tl - len(ts)))
                             .astype(np.uint8)])[:tl]
        mut = rng.random(tl) < (0.08 if n % 3 else div_hi)
        ts[mut] = rng.integers(0, 4, int(mut.sum())).astype(np.uint8)
        lens[n] = (ql, tl)
        qr[n, :ql] = qs[::-1]
        sf[n, :tl] = ts
        cases.append((qs, ts))
    return qr, sf, lens, cases


@pytest.mark.parametrize("approx,zd,wc", [
    (True, 400, True), (True, -1, True), (False, 400, True),
    (False, 400, False), (True, 400, False)])
def test_v2_ez_bitexact(approx, zd, wc):
    N, QP, TP, W, w = 12, 192, 192, 256, 100
    qr, sf, lens, cases = _cases(0, N, QP, TP)
    mat = gen_simple_mat(5, 2, -4, 1)
    p, ez = extd2_batch2(
        jnp.asarray(qr), jnp.asarray(sf), jnp.asarray(lens),
        G=16, W=W, RB=64, R=QP + TP - 1, QP=QP, TP=TP, q=Q, e=E, q2=Q2,
        e2=E2, w=w, zdrop=zd, right_mode=False, approx_max=approx,
        approx_drop=False, sc_mch=2, sc_mis=-4, sc_N=-1, with_cigar=wc,
        interpret=True)
    ez = np.asarray(ez)
    for n, (qs, ts) in enumerate(cases):
        flag = (KSW_APPROX_MAX if approx else 0) | \
            (0 if wc else KSW_SCORE_ONLY)
        ref = ksw2_np.ksw_extd2(len(qs), qs, len(ts), ts, 5, mat, Q, E, Q2,
                                E2, w, zd, 0, flag)
        assert ref.score == ez[n, EZ_SCORE], n
        assert int(ref.zdropped) == ez[n, EZ_ZDROP], n
        assert ref.max == ez[n, EZ_MAX] and ref.max_q == ez[n, EZ_MAXQ] \
            and ref.max_t == ez[n, EZ_MAXT], n
        assert ref.mqe == ez[n, EZ_MQE] and ref.mqe_t == ez[n, EZ_MQET], n
        assert ref.mte == ez[n, EZ_MTE] and ref.mte_q == ez[n, EZ_MTEQ], n


def test_v2_cigar_bitexact():
    N, QP, TP, W, w, G, RB = 8, 192, 192, 256, 100, 16, 64
    qr, sf, lens, cases = _cases(1, N, QP, TP, div_hi=0.06)
    mat = gen_simple_mat(5, 2, -4, 1)
    p, ez = extd2_batch2(
        jnp.asarray(qr), jnp.asarray(sf), jnp.asarray(lens),
        G=G, W=W, RB=RB, R=QP + TP - 1, QP=QP, TP=TP, q=Q, e=E, q2=Q2,
        e2=E2, w=w, zdrop=400, right_mode=False, approx_max=True,
        approx_drop=False, sc_mch=2, sc_mis=-4, sc_N=-1, with_cigar=True,
        interpret=True)
    p, ez = np.asarray(p), np.asarray(ez)
    for n, (qs, ts) in enumerate(cases):
        ref = ksw2_np.ksw_extd2(len(qs), qs, len(ts), ts, 5, mat, Q, E, Q2,
                                E2, w, 400, 0, KSW_APPROX_MAX)
        qlen, tlen = len(qs), len(ts)
        p_rows, off, off_end = {}, np.zeros(qlen + tlen - 1, np.int64), \
            np.zeros(qlen + tlen - 1, np.int64)
        ng, g = n // G, n % G
        for r in range(qlen + tlen - 1):
            st0 = max(0, r - qlen + 1, (r - w + 1) >> 1)
            en0 = min(tlen - 1, r, (r + w) >> 1)
            if st0 > en0:
                break
            st = st0 // 16 * 16
            en = (en0 + 16) // 16 * 16 - 1
            ws = int(wstart_chunk_np(np.int64(r), w, RB))
            row = p[ng, r // RB, r % RB, g, :]
            p_rows[r] = row[st - ws:en - ws + 1].astype(np.uint8)
            off[r], off_end[r] = st, en
        if ref.zdropped:
            if ez[n, EZ_MAXT] < 0:
                continue
            cig = ksw2_np.backtrack(p_rows, off, off_end,
                                    int(ez[n, EZ_MAXT]), int(ez[n, EZ_MAXQ]))
        else:
            cig = ksw2_np.backtrack(p_rows, off, off_end, tlen - 1, qlen - 1)
        assert list(ref.cigar) == list(cig), n
