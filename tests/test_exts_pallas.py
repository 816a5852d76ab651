"""exts2_batch splice Pallas kernel vs the native/NumPy oracle, CPU
interpret mode on tiny shapes (bit-exact scores + CIGARs incl. N ops)."""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from minimap2_tpu.ops.exts_pallas import (exts2_batch,  # noqa: E402
                                          splice_site_arrays)
from minimap2_tpu.ops.ksw2_exts import _splice_site_arrays  # noqa: E402
from minimap2_tpu.ops.ksw2_np import (KSW_EZ_SPLICE_CMPLX,  # noqa: E402
                                      KSW_EZ_SPLICE_FOR, KSW_EZ_SPLICE_REV)
from minimap2_tpu.ops.traceback_pallas import (decode_ops,  # noqa: E402
                                               traceback_batch)

Q, E, Q2, NONCAN = 2, 1, 32, 9
MAT = np.array([1, -2, -2, -2, 0,
                -2, 1, -2, -2, 0,
                -2, -2, 1, -2, 0,
                -2, -2, -2, 1, 0,
                0, 0, 0, 0, 0], np.int8)


def _long_thres():
    lt = (Q2 - Q) // E - 1
    if Q2 > Q + E + lt * E:
        lt += 1
    return lt


@pytest.mark.parametrize("flag_for,cmplx", [(True, True), (True, False),
                                            (False, True)])
def test_splice_site_arrays_match_oracle(flag_for, cmplx):
    rng = np.random.default_rng(5)
    N, TP = 4, 200
    ts = rng.integers(0, 4, (N, TP)).astype(np.uint8)
    tlens = np.array([200, 150, 64, 199], np.int32)
    flag = (KSW_EZ_SPLICE_FOR if flag_for else KSW_EZ_SPLICE_REV) \
        | (KSW_EZ_SPLICE_CMPLX if cmplx else 0)
    dn, ac = splice_site_arrays(ts, tlens, flag_for, NONCAN, cmplx, False)
    for i in range(N):
        tl = int(tlens[i])
        d64, a64 = _splice_site_arrays(tl, ts[i, :tl], flag, NONCAN, TP)
        # oracle arrays are defined over [0, tl); compare that range
        np.testing.assert_array_equal(dn[i, :tl], d64[:tl].astype(np.int8),
                                      err_msg=f"donor pair {i}")
        np.testing.assert_array_equal(ac[i, :tl], a64[:tl].astype(np.int8),
                                      err_msg=f"acceptor pair {i}")


def _mk_pairs(rng, n, QP, TP):
    """Random pairs with a planted intron (GT..AG) in the target."""
    qr = np.zeros((n, QP), np.uint8)
    sf = np.zeros((n, TP), np.uint8)
    lens = np.ones((n, 2), np.int32)
    for i in range(n):
        ql = int(rng.integers(60, QP - 8))
        intron = int(rng.integers(40, 120))
        tl = ql + intron
        assert tl <= TP
        exon1 = int(rng.integers(20, ql - 20))
        qseq = rng.integers(0, 4, ql).astype(np.uint8)
        t = np.empty(tl, np.uint8)
        t[:exon1] = qseq[:exon1]
        # canonical GT...AG intron
        iv = rng.integers(0, 4, intron).astype(np.uint8)
        iv[0], iv[1] = 2, 3
        iv[-2], iv[-1] = 0, 2
        t[exon1:exon1 + intron] = iv
        t[exon1 + intron:] = qseq[exon1:]
        # sprinkle mismatches in the query
        mm = rng.random(ql) < 0.03
        qs = qseq.copy()
        qs[mm] = (qs[mm] + 1) % 4
        qr[i, :ql] = qs[::-1]
        sf[i, :tl] = t
        lens[i] = (ql, tl)
    return qr, sf, lens


def test_exts2_batch_matches_oracle_global():
    from minimap2_tpu.ops.ksw2_exts import ksw_exts2
    os.environ.pop("MM2TPU_NO_NATIVE", None)
    rng = np.random.default_rng(11)
    n, QP, TP = 4, 96, 256
    W = 128
    RB = 32
    R = (QP + TP + RB - 1) // RB * RB
    qr, sf, lens = _mk_pairs(rng, n, QP, TP)
    dn, ac = splice_site_arrays(sf, lens[:, 1], True, NONCAN, True, False)
    p, ez = exts2_batch(qr, sf, dn, ac, lens, G=8, W=W, RB=RB, R=R, QP=QP,
                        TP=TP, q=Q, e=E, q2=Q2, zdrop=-1, right_mode=False,
                        approx_max=True, approx_drop=False, sc_mch=1,
                        sc_mis=-2, sc_N=-E, with_cigar=True, interpret=True)
    ops, fin = traceback_batch(p, lens, G=8, W=W, RB=RB, R=R, w=0,
                               splice=True, QP=QP, interpret=True)
    ez = np.asarray(ez)
    ops = np.asarray(ops)
    fin = np.asarray(fin)
    lt = _long_thres()
    flag = KSW_EZ_SPLICE_FOR | KSW_EZ_SPLICE_CMPLX
    from minimap2_tpu.ops.exts_pallas import EZ_SCORE
    for i in range(n):
        ql, tl = int(lens[i, 0]), int(lens[i, 1])
        query = qr[i, :ql][::-1].copy()
        target = sf[i, :tl].copy()
        oz = ksw_exts2(ql, query, tl, target, 5, MAT, Q, E, Q2, NONCAN,
                       -1, 0, 0, 0, flag, None)
        assert int(ez[i, EZ_SCORE]) == oz.score, \
            f"pair {i}: score {ez[i, EZ_SCORE]} vs {oz.score}"
        cig = decode_ops(ops[i], int(fin[i, 0]), int(fin[i, 1]),
                         splice=True, long_thres=lt)
        assert cig == oz.cigar, f"pair {i}: {cig} vs {oz.cigar}"
        assert any((c & 0xF) == 3 for c in oz.cigar), "no intron planted?"
