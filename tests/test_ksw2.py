"""ksw2-equivalent kernel parity tests vs the reference SSE kernels (ctypes)."""
import numpy as np
import pytest

import refbind
from minimap2_tpu.ops.ksw2_np import ksw_extd2, ksw_extz2, ksw_ll


def gen_mat(a, b, sc_ambi=1):
    mat = np.zeros(25, dtype=np.int8)
    for i in range(4):
        for j in range(4):
            mat[i * 5 + j] = a if i == j else -b
        mat[i * 5 + 4] = -sc_ambi
    for j in range(5):
        mat[4 * 5 + j] = -sc_ambi
    return mat


def mutseq(rng, t, div):
    q = t.copy()
    for _ in range(int(len(t) * div)):
        p = int(rng.integers(0, len(q)))
        r = rng.random()
        if r < 0.6:
            q[p] = rng.integers(0, 4)
        elif r < 0.8:
            ins = rng.integers(0, 4, size=int(rng.integers(1, 6))).astype(np.uint8)
            q = np.concatenate([q[:p], ins, q[p:]])
        else:
            e = min(len(q), p + int(rng.integers(1, 6)))
            q = np.concatenate([q[:p], q[e:]])
    return q


CONFIGS = [
    (-1, -1, 0, 0),
    (751, 400, 0x40 | 0x02 | 0x80, 10),  # left extension flags
    (751, 400, 0x40, 10),                # right extension
    (751, 400, 0x08, -1),                # approx-max gap fill
    (30, 80, 0, -1),                     # tight band
]


def _cmp(r, mine):
    assert r["max"] == mine.max and r["zdropped"] == mine.zdropped
    assert r["max_q"] == mine.max_q and r["max_t"] == mine.max_t
    assert r["mqe"] == mine.mqe and r["mqe_t"] == mine.mqe_t
    assert r["mte"] == mine.mte and r["score"] == mine.score
    assert r["reach_end"] == mine.reach_end
    assert r["cigar"] == mine.cigar


@pytest.mark.skipif(not refbind.available(), reason="reference .so not built")
def test_extd2_bit_exact():
    rng = np.random.default_rng(11)
    mat = gen_mat(2, 4)
    for _ in range(10):
        t = rng.integers(0, 4, size=int(rng.integers(30, 300))).astype(np.uint8)
        q = mutseq(rng, t, 0.15)
        if not len(q):
            continue
        for (w, zd, fl, eb) in CONFIGS:
            r = refbind.ref_extd2(q, t, mat, 4, 2, 24, 1, w, zd, eb, fl)
            mine = ksw_extd2(len(q), q, len(t), t, 5, mat, 4, 2, 24, 1, w, zd, eb, fl)
            _cmp(r, mine)


@pytest.mark.skipif(not refbind.available(), reason="reference .so not built")
def test_extz2_bit_exact():
    rng = np.random.default_rng(13)
    mat = gen_mat(2, 4)
    for _ in range(10):
        t = rng.integers(0, 4, size=int(rng.integers(30, 300))).astype(np.uint8)
        q = mutseq(rng, t, 0.15)
        if not len(q):
            continue
        for (w, zd, fl, eb) in CONFIGS:
            r = refbind.ref_extz2(q, t, mat, 4, 2, w, zd, eb, fl)
            mine = ksw_extz2(len(q), q, len(t), t, 5, mat, 4, 2, w, zd, eb, fl)
            _cmp(r, mine)


@pytest.mark.skipif(not refbind.available(), reason="reference .so not built")
def test_ksw_ll_bit_exact():
    rng = np.random.default_rng(17)
    mat = gen_mat(2, 4)
    for _ in range(20):
        t = rng.integers(0, 4, size=int(rng.integers(20, 200))).astype(np.uint8)
        q = mutseq(rng, t, 0.2)
        if not len(q):
            continue
        assert ksw_ll(len(q), q, len(t), t, 5, mat, 4, 2) == refbind.ref_ksw_ll(q, t, mat, 4, 2)
