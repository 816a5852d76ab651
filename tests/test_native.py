"""Native host kernels (native/mmtpu.cpp) vs the NumPy references."""
import numpy as np
import pytest

from minimap2_tpu import native
from minimap2_tpu.config import MapOptions, mapopt_update
from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.index.sketch import sketch_ref
from minimap2_tpu.map.seed import Seeds, collect_matches
from minimap2_tpu.utils.intfloat import SEQ_NT4

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build failed")


def test_sketch_bitexact_random():
    rng = np.random.default_rng(0)
    for trial in range(15):
        L = int(rng.integers(40, 2500))
        seq = "".join(rng.choice(list("ACGTN"), L,
                                 p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        codes = SEQ_NT4[np.frombuffer(seq.encode(), np.uint8)]
        for (w, k, hpc) in [(10, 15, False), (5, 19, True), (19, 19, False),
                            (1, 14, False), (255, 28, True)]:
            x0, y0 = sketch_ref(codes, w, k, 7, hpc)
            x1, y1 = native.sketch(codes, w, k, 7, hpc)
            np.testing.assert_array_equal(x0, x1)
            np.testing.assert_array_equal(y0, y1)


def test_collect_anchors_bitexact():
    rng = np.random.default_rng(1)
    unit = "".join(rng.choice(list("ACGT"), 400))
    ref = unit * 25 + "".join(rng.choice(list("ACGT"), 40000))
    mi = MiniIndex.build(["c"], [ref], w=10, k=15)
    mo = MapOptions()
    mapopt_update(mo, mi)
    for t in range(8):
        ln = int(rng.integers(200, 2500))
        st = int(rng.integers(0, len(ref) - ln))
        qc = SEQ_NT4[np.frombuffer(ref[st:st + ln].encode(), np.uint8)]
        mx, my = native.sketch(qc, 10, 15, 0, False)
        s, n_a, rep0, minipos0 = collect_matches(
            mi, mx, my, ln, mo.mid_occ, mo.max_max_occ, mo.occ_dist)
        ax1, ay1, rep1, minipos1 = native.collect_anchors(
            mx, my, mi.keys, mi.starts, mi.pos, ln, mo.mid_occ,
            mo.max_max_occ, mo.occ_dist)
        assert rep0 == rep1
        np.testing.assert_array_equal(minipos0, minipos1)
        assert len(ax1) == n_a


def test_index_build_native_equals_numpy():
    rng = np.random.default_rng(2)
    ref = "".join(rng.choice(list("ACGTN"), 30000,
                             p=[0.245, 0.245, 0.245, 0.245, 0.02]))
    mi = MiniIndex.build(["c"], [ref], w=10, k=15)
    import minimap2_tpu.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        mi2 = MiniIndex.build(["c"], [ref], w=10, k=15)
    finally:
        nat.available = orig
    np.testing.assert_array_equal(mi.keys, mi2.keys)
    np.testing.assert_array_equal(mi.starts, mi2.starts)
    np.testing.assert_array_equal(mi.pos, mi2.pos)


def test_native_extd2_bitexact():
    """C++ ksw_extd2 vs the NumPy oracle across modes/flags."""
    import os

    from minimap2_tpu.map.align_engine import gen_simple_mat
    from minimap2_tpu.ops import ksw2_np
    rng = np.random.default_rng(7)
    mat = gen_simple_mat(5, 2, -4, 1)
    os.environ["MM2TPU_NO_NATIVE"] = "1"   # oracle side stays NumPy
    try:
        for t in range(25):
            ql = int(rng.integers(1, 300))
            tl = int(rng.integers(1, 300))
            qs = rng.integers(0, 5, ql, dtype=np.int64).astype(np.uint8)
            ts = qs[:min(ql, tl)].copy()
            ts = np.concatenate(
                [ts, rng.integers(0, 4, max(0, tl - len(ts)))
                 .astype(np.uint8)])[:tl]
            mut = rng.random(tl) < rng.choice([0.05, 0.3])
            ts[mut] = rng.integers(0, 5, int(mut.sum())).astype(np.uint8)
            w = int(rng.choice([-1, 50, 300]))
            zd = int(rng.choice([-1, 400]))
            fl = int(rng.choice([0, 0x01, 0x02, 0x08, 0x40, 0x42, 0xC0]))
            ref = ksw2_np.ksw_extd2(ql, qs, tl, ts, 5, mat, 4, 2, 24, 1,
                                    w, zd, 17, fl)
            d, cig = native.ksw_extd2(ql, qs, tl, ts, 5, mat, 4, 2, 24, 1,
                                      w, zd, 17, fl)
            assert ref.score == d["score"] and \
                int(ref.zdropped) == d["zdropped"] and \
                ref.max == d["max"] and ref.mqe == d["mqe"] and \
                ref.mte == d["mte"] and list(ref.cigar) == cig, (t, fl)
    finally:
        del os.environ["MM2TPU_NO_NATIVE"]


def test_native_extz2_exts2_bitexact():
    """C++ extz2/exts2 vs the NumPy oracles (spliced targets, junc arrays)."""
    import os

    from minimap2_tpu.map.align_engine import gen_simple_mat
    from minimap2_tpu.ops import ksw2_exts, ksw2_np
    rng = np.random.default_rng(11)
    mat = gen_simple_mat(5, 2, -4, 1)
    mat1 = gen_simple_mat(5, 1, -2, 1)
    os.environ["MM2TPU_NO_NATIVE"] = "1"
    try:
        for t in range(12):
            ql = int(rng.integers(10, 200))
            tl = int(rng.integers(10, 200))
            qs = rng.integers(0, 5, ql, dtype=np.int64).astype(np.uint8)
            ts = rng.integers(0, 5, tl, dtype=np.int64).astype(np.uint8)
            fl = int(rng.choice([0, 0x01, 0x02, 0x40, 0x42]))
            ref = ksw2_np.ksw_extz2(ql, qs, tl, ts, 5, mat, 4, 2, 200, 400,
                                    17, fl)
            d, cig = native.ksw_extz2(ql, qs, tl, ts, 5, mat, 4, 2, 200,
                                      400, 17, fl)
            assert ref.score == d["score"] and list(ref.cigar) == cig, t
        for t in range(12):
            ql = int(rng.integers(20, 180))
            e1 = int(rng.integers(5, ql))
            intron = int(rng.integers(40, 200))
            qs = rng.integers(0, 4, ql).astype(np.uint8)
            ts = np.concatenate([qs[:e1], np.array([2, 3], np.uint8),
                                 rng.integers(0, 4, intron - 4)
                                 .astype(np.uint8),
                                 np.array([0, 2], np.uint8), qs[e1:]])
            tl = len(ts)
            fl = int(rng.choice([0x100, 0x200, 0x900, 0x108]))
            junc = rng.choice(np.array([0, 1, 2, 4, 8], np.uint8), tl) \
                if t % 2 else None
            ref = ksw2_exts.ksw_exts2(ql, qs, tl, ts, 5, mat1, 4, 2, 24, 9,
                                      200, 17, 9, 12, fl, junc)
            d, cig = native.ksw_exts2(ql, qs, tl, ts, 5, mat1, 4, 2, 24, 9,
                                      200, 17, 9, 12, fl, junc)
            assert ref.score == d["score"] and list(ref.cigar) == cig, t
    finally:
        del os.environ["MM2TPU_NO_NATIVE"]


def test_native_chain_dp_bitexact():
    import os

    from minimap2_tpu.map.chain import chain_dp
    rng = np.random.default_rng(5)
    os.environ["MM2TPU_NO_NATIVE"] = "1"
    try:
        for t in range(10):
            n = int(rng.integers(5, 800))
            rpos = np.sort(rng.integers(0, 100000, n)).astype(np.uint64)
            qpos = (rpos - rpos[0]
                    + rng.integers(0, 60, n).astype(np.uint64)) \
                & np.uint64(0xFFFFFFFF)
            rev = (rng.random(n) < 0.3).astype(np.uint64)
            ax = (rev << np.uint64(63)) | rpos
            ay = (np.uint64(15) << np.uint64(32)) | qpos
            order = np.argsort(ax, kind="stable")
            ax, ay = ax[order], ay[order]
            args = (5000, 5000, 500, 25, 5000, 3, 40, np.float32(0.12),
                    np.float32(0.0), False, 1)
            u0, ax0, ay0 = chain_dp(*args, ax, ay)
            u1, ax1, ay1 = native.lchain_dp(*args, ax, ay)
            np.testing.assert_array_equal(u0, u1)
            np.testing.assert_array_equal(ax0, ax1)
            np.testing.assert_array_equal(ay0, ay1)
    finally:
        del os.environ["MM2TPU_NO_NATIVE"]


def test_native_chain_rmq_bitexact():
    import os

    from minimap2_tpu.map.chain import chain_rmq
    rng = np.random.default_rng(13)
    os.environ["MM2TPU_NO_NATIVE"] = "1"
    try:
        for t in range(8):
            n = int(rng.integers(5, 1200))
            rpos = np.sort(rng.integers(0, 300000, n)).astype(np.uint64)
            qpos = (rpos - rpos[0]
                    + rng.integers(0, 1500, n).astype(np.uint64)) \
                & np.uint64(0xFFFFFFFF)
            rev = (rng.random(n) < 0.3).astype(np.uint64)
            ax = (rev << np.uint64(63)) | rpos
            ay = (np.uint64(15) << np.uint64(32)) | qpos
            order = np.argsort(ax, kind="stable")
            ax, ay = ax[order], ay[order]
            args = (int(rng.choice([5000, 20000])),
                    int(rng.choice([0, 1000])), int(rng.choice([500, 2000])),
                    25, int(rng.choice([1 << 29, 100])), 3, 40,
                    np.float32(0.12), np.float32(0.0))
            u0, ax0, ay0 = chain_rmq(*args, ax, ay)
            del os.environ["MM2TPU_NO_NATIVE"]
            try:
                u1, ax1, ay1 = chain_rmq(*args, ax, ay)
            finally:
                os.environ["MM2TPU_NO_NATIVE"] = "1"
            np.testing.assert_array_equal(u0, u1)
            np.testing.assert_array_equal(ax0, ax1)
            np.testing.assert_array_equal(ay0, ay1)
    finally:
        del os.environ["MM2TPU_NO_NATIVE"]


def test_native_engaged_in_cli_path(monkeypatch):
    # the golden CLI runs must exercise the native kernels, not the NumPy
    # oracles (VERDICT: no test asserted the fast path is actually used)
    import io as _io
    from contextlib import redirect_stdout

    from minimap2_tpu import native
    from minimap2_tpu.cli import main as cli_main

    assert native.available(), "native library must build on this host"
    calls = {"anchors": 0, "chain": 0, "extd2": 0}
    real_collect = native.collect_anchors
    real_chain = native.lchain_dp
    real_extd2 = native.ksw_extd2

    def wrap(name, fn):
        def inner(*a, **k):
            calls[name] += 1
            return fn(*a, **k)
        return inner

    monkeypatch.setattr(native, "collect_anchors",
                        wrap("anchors", real_collect))
    monkeypatch.setattr(native, "lchain_dp", wrap("chain", real_chain))
    monkeypatch.setattr(native, "ksw_extd2", wrap("extd2", real_extd2))
    buf = _io.StringIO()
    with redirect_stdout(buf):
        # -t1: worker processes would not see the monkeypatches
        rc = cli_main(["-t1", "-a", "tests/data/MT-human.fa",
                       "tests/data/MT-orang.fa"])
    assert rc == 0
    assert calls["anchors"] > 0, "native seed collection not engaged"
    assert calls["chain"] > 0, "native chain DP not engaged"
    assert calls["extd2"] > 0, "native extd2 not engaged"
