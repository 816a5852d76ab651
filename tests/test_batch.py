"""Device-batched mapping path (parallel/batch.py): unit + integration tests
on the virtual CPU mesh (conftest forces JAX_PLATFORMS=cpu w/ 8 devices)."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from minimap2_tpu.index.index import MiniIndex  # noqa: E402
from minimap2_tpu.index.sketch import sketch_ref  # noqa: E402
from minimap2_tpu.parallel.batch import (BatchParams, DeviceIndex,  # noqa: E402
                                         device_sketch, hash64_pair,
                                         map_batch, make_sharded_step,
                                         searchsorted_u64pair, stack_shards)
from minimap2_tpu.utils.intfloat import SEQ_NT4, hash64  # noqa: E402


def test_hash64_pair_matches_host():
    rng = np.random.default_rng(0)
    for k in (15, 19, 28):
        mask = (1 << (2 * k)) - 1
        keys = rng.integers(0, mask + 1, 256, dtype=np.uint64)
        ref = hash64(keys, np.uint64(mask))
        hi, lo = hash64_pair(jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
                             jnp.asarray(keys.astype(np.uint32)),
                             mask >> 32, mask & 0xFFFFFFFF)
        got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
            np.asarray(lo).astype(np.uint64)
        np.testing.assert_array_equal(got, ref)


def test_searchsorted_u64pair():
    rng = np.random.default_rng(1)
    keys = np.sort(rng.integers(0, 1 << 62, 1000, dtype=np.uint64))
    q = np.concatenate([keys[rng.integers(0, 1000, 50)],
                        rng.integers(0, 1 << 62, 50, dtype=np.uint64)])
    ref = np.searchsorted(keys, q)
    got = searchsorted_u64pair(
        jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(keys.astype(np.uint32)),
        jnp.asarray((q >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray(q.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_device_sketch_matches_reference_set():
    """The device minimizer SET equals the reference scan's set (non-HPC)."""
    rng = np.random.default_rng(2)
    k, w = 15, 10
    seq = "".join(rng.choice(list("ACGT"), 3000))
    codes = SEQ_NT4[np.frombuffer(seq.encode(), dtype=np.uint8)]
    x_ref, y_ref = sketch_ref(codes, w, k, 0, False)
    ref_set = {(int(y) >> 1 & 0x7FFFFFFF, int(x) >> 8, int(y) & 1)
               for x, y in zip(x_ref, y_ref)}
    L = 3072
    cb = np.full((1, L), 4, np.uint8)
    cb[0, :len(codes)] = codes
    hhi, hlo, z, is_mini = device_sketch(
        jnp.asarray(cb), jnp.asarray([len(codes)], np.int32), k, w)
    hhi, hlo = np.asarray(hhi)[0], np.asarray(hlo)[0]
    z, is_mini = np.asarray(z)[0], np.asarray(is_mini)[0]
    got = set()
    for i in np.nonzero(is_mini)[0]:
        h = (int(hhi[i]) << 32) | int(hlo[i])
        got.add((int(i), h, int(z[i])))
    assert got == ref_set


def _sim(rng, mi_ref, p, B, L):
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    truth = []
    for i in range(B):
        st = int(rng.integers(0, len(mi_ref) - 600))
        ln = int(rng.integers(300, L))
        seq = SEQ_NT4[np.frombuffer(mi_ref[st:st + ln].encode(), np.uint8)].copy()
        mut = rng.random(ln) < 0.05
        seq[mut] = rng.integers(0, 4, int(mut.sum()))
        if i % 2:
            seq = (3 - seq)[::-1].copy()
        codes[i, :ln] = seq
        lens[i] = ln
        truth.append((st, st + ln, bool(i % 2)))
    return codes, lens, truth


@pytest.fixture(scope="module")
def tiny_world():
    rng = np.random.default_rng(3)
    ref = "".join(rng.choice(list("ACGT"), 20000))
    mi = MiniIndex.build(["chr1"], [ref], w=10, k=15)
    p = BatchParams(L=512, M=128, A=256, QP=512, TP=512, W=256, ext_w=200,
                    chain_window=32)
    codes, lens, truth = _sim(rng, ref, p, 8, p.L)
    return mi, p, codes, lens, truth


def test_map_batch_single_device(tiny_world):
    mi, p, codes, lens, truth = tiny_world
    di = DeviceIndex.from_host(mi, 1)[0]
    out = map_batch(di, jnp.asarray(codes), jnp.asarray(lens), p,
                    interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for i, (st, en, rv) in enumerate(truth):
        assert out["chain_score"][i] > 50
        assert out["ext_score"][i] > 0
        assert out["rev"][i] == int(rv)
        assert st - 150 <= out["rs"][i] and out["re"][i] <= en + 150


def test_sharded_step_matches_single(tiny_world):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh
    mi, p, codes, lens, truth = tiny_world
    di1 = DeviceIndex.from_host(mi, 1)[0]
    ref = map_batch(di1, jnp.asarray(codes), jnp.asarray(lens), p,
                    interpret=True)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "idx"))
    di = stack_shards(DeviceIndex.from_host(mi, 2))
    step = make_sharded_step(mesh, p, interpret=True,
                             **di.aux_dict())
    with mesh:
        out, n_mapped, n_anc = step(di, jnp.asarray(codes),
                                    jnp.asarray(lens))
    assert np.asarray(n_anc).shape == (4, 2)
    assert int(np.asarray(n_anc).sum()) > 0
    assert int(n_mapped) == len(truth)
    np.testing.assert_array_equal(np.asarray(out["rs"]), np.asarray(ref["rs"]))
    np.testing.assert_array_equal(np.asarray(out["rev"]),
                                  np.asarray(ref["rev"]))


def test_hpc_device_sketch_matches_host():
    """hpc_compact + device sketch == native mm_sketch(hpc=True) as a set
    of (span-stripped key, original end pos, strand)."""
    import numpy as np

    from minimap2_tpu import native
    from minimap2_tpu.parallel.batch import device_sketch, hpc_compact
    from minimap2_tpu.utils.intfloat import SEQ_NT4
    if not native.available():
        import pytest
        pytest.skip("native build unavailable")
    rng = np.random.default_rng(3)
    L, w, k = 1024, 10, 15
    for _ in range(4):
        parts, n = [], 0
        while n < 900:
            c = rng.choice(list("ACGT"))
            r = int(rng.integers(1, 6))
            parts.append(c * r)
            n += r
        seq = "".join(parts)[:900]
        codes = SEQ_NT4[np.frombuffer(seq.encode(), np.uint8)]
        hx, hy = native.sketch(codes, w, k, 0, True)
        host = {(int(x) >> 8, (int(y) >> 1) & 0x7FFFFFFF, int(y) & 1)
                for x, y in zip(hx, hy)}
        cb = np.full((8, L), 4, np.uint8)
        cb[0, :len(codes)] = codes
        lens = np.zeros(8, np.int32)
        lens[0] = len(codes)
        hc, hp, lc = hpc_compact(jnp.asarray(cb), jnp.asarray(lens))
        hhi, hlo, z, im = device_sketch(hc, lc, k, w)
        hhi, hlo, z, im, hp = map(np.asarray, (hhi, hlo, z, im, hp))
        dev = {((int(hhi[0, j]) << 32) | int(hlo[0, j]), int(hp[0, j]),
                int(z[0, j])) for j in np.nonzero(im[0])[0]}
        assert host == dev


def test_compact_minimizers_pallas_matches_fallback():
    # the 3-plane bitonic compaction (hash planes carried through the
    # sort) must agree with the rank-scatter fallback
    import jax.numpy as jnp
    from minimap2_tpu.ops import sort_pallas
    from minimap2_tpu.parallel.batch import _compact_minimizers
    rng = np.random.default_rng(4)
    B, L, M = 8, 512, 128
    hhi = jnp.asarray(rng.integers(0, 2**31, (B, L)).astype(np.uint32))
    hlo = jnp.asarray(rng.integers(0, 2**31, (B, L)).astype(np.uint32))
    z = jnp.asarray(rng.integers(0, 2, (B, L)).astype(np.int32))
    is_mini = jnp.asarray(rng.random((B, L)) < 0.15)
    # force the pallas branch through the interpreter
    orig = sort_pallas.sort3_rows
    sort_pallas.sort3_rows = lambda a, b, c, G=8: orig(a, b, c, G=G,
                                                      interpret=True)
    try:
        out_p = _compact_minimizers(hhi, hlo, z, is_mini, M,
                                    use_pallas=True)
    finally:
        sort_pallas.sort3_rows = orig
    out_f = _compact_minimizers(hhi, hlo, z, is_mini, M, use_pallas=False)
    names = ("mh_hi", "mh_lo", "mz", "mpos", "mvalid")
    for nm, a, b in zip(names, out_p, out_f):
        a, b = np.asarray(a), np.asarray(b)
        valid = np.asarray(out_f[4])
        # compare on valid slots (invalid slots carry don't-care hashes)
        np.testing.assert_array_equal(a[valid], b[valid], err_msg=nm)
    np.testing.assert_array_equal(np.asarray(out_p[4]),
                                  np.asarray(out_f[4]))


def test_compact_minimizers_chunked_matches_fallback():
    # the VMEM-bounded two-level chunked sort path (L > 4096)
    import jax.numpy as jnp
    from minimap2_tpu.ops import sort_pallas
    from minimap2_tpu.parallel.batch import _compact_minimizers
    rng = np.random.default_rng(7)
    B, L, M = 8, 8192, 1024
    hhi = jnp.asarray(rng.integers(0, 2**31, (B, L)).astype(np.uint32))
    hlo = jnp.asarray(rng.integers(0, 2**31, (B, L)).astype(np.uint32))
    z = jnp.asarray(rng.integers(0, 2, (B, L)).astype(np.int32))
    is_mini = jnp.asarray(rng.random((B, L)) < 0.18)
    orig = sort_pallas.sort3_rows
    sort_pallas.sort3_rows = lambda a, b, c, G=8, interpret=False: \
        orig(a, b, c, G=G, interpret=True)
    try:
        out_p = _compact_minimizers(hhi, hlo, z, is_mini, M,
                                    use_pallas=True)
    finally:
        sort_pallas.sort3_rows = orig
    out_f = _compact_minimizers(hhi, hlo, z, is_mini, M, use_pallas=False)
    valid = np.asarray(out_f[4])
    for nm, a, b in zip(("mh_hi", "mh_lo", "mz", "mpos", "mvalid"),
                        out_p, out_f):
        np.testing.assert_array_equal(np.asarray(a)[valid],
                                      np.asarray(b)[valid], err_msg=nm)


def test_hpc_paf_step_interpret():
    # full HPC device step (hpc_compact -> sketch -> span plane -> chain)
    # in interpret mode: a homopolymer-rich read must map to its source
    from minimap2_tpu.config import MM_I_HPC
    from minimap2_tpu.index.index import MiniIndex
    from minimap2_tpu.parallel.batch import BatchParams, DeviceIndex
    from minimap2_tpu.parallel import engine
    rng = np.random.default_rng(6)
    # genome with stretched homopolymers (HPC-friendly)
    base = rng.integers(0, 4, 12000, dtype=np.uint8)
    runs = rng.integers(1, 4, 12000)
    ref = np.repeat(base, runs)[:30000]
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    mi = MiniIndex.build_codes(["chrH"], [ref], w=5, k=19, flag=MM_I_HPC)
    p = BatchParams(L=1024, M=256, A=512, occ_cap=16, chain_window=32,
                    k=19, w=5, hpc=True)
    di = DeviceIndex.from_host(mi, 1)[0]
    step = engine.make_paf_step(di, p, K=1, min_sc=20, interpret=True)
    reads, starts = [], []
    for i in range(8):
        st = int(rng.integers(0, len(ref) - 900))
        seq = ref[st:st + 800].copy()
        mut = rng.random(800) < 0.03
        seq[mut] = rng.integers(0, 4, int(mut.sum()))
        reads.append(ACGT[seq].tobytes())
        starts.append(st)
    fut = engine.dispatch_batch(step, reads, p)
    rec = np.asarray(fut)
    sc, sub, qs, qe, rs, re_, rev, rid, cnt, rep = rec
    for i in range(8):
        assert sc[0, i] > 50, (i, sc[0, i])
        assert rev[0, i] == 0
        assert abs(int(rs[0, i]) - starts[i]) < 250, (i, rs[0, i], starts[i])


def test_pos_fmt2_packed_s_matches_fmt1(tiny_world):
    """pos_fmt 2 (u32 global pos + strand bitmap, the GRCh38->4Gb regime)
    and s_fmt 1 (4-bit packed reference) must reproduce the pos_fmt 1 /
    u8 results exactly, as must the pos_fmt 0 two-plane layout."""
    mi, p, codes, lens, truth = tiny_world
    outs = {}
    for fmt, sf in [(1, 0), (2, 1), (0, 0)]:
        di = DeviceIndex.from_host(mi, 1, force_pos_fmt=fmt,
                                   force_s_fmt=sf)[0]
        if fmt == 2:
            assert di.pstrand is not None
        o = map_batch(di, jnp.asarray(codes), jnp.asarray(lens), p,
                      interpret=True)
        outs[(fmt, sf)] = {k: np.asarray(v) for k, v in o.items()}
    base = outs[(1, 0)]
    for key, o in outs.items():
        for k in base:
            assert np.array_equal(o[k], base[k]), (key, k)


def test_h2r_probe_matches_fallback(tiny_world):
    """The payload-fused 2-choice probe (h2r) returns the same anchors as
    the sorted-key binary-search probe on identical inputs."""
    import os

    from minimap2_tpu.parallel.batch import (_compact_minimizers,
                                             _lookup_anchors)
    mi, p, codes, lens, truth = tiny_world
    di_r = DeviceIndex.from_host(mi, 1)[0]
    assert di_r.h2r is not None and di_r.h2r_nb > 0
    os.environ["MM2TPU_H2R"] = "0"
    try:
        di_b = DeviceIndex.from_host(mi, 1)[0]
    finally:
        del os.environ["MM2TPU_H2R"]
    assert di_b.h2r is None
    hhi, hlo, z, is_mini = device_sketch(jnp.asarray(codes),
                                         jnp.asarray(lens), p.k, p.w)
    front = _compact_minimizers(hhi, hlo, z, is_mini, p.M)
    out_r = _lookup_anchors(di_r, *front, jnp.asarray(lens), p, True)
    out_b = _lookup_anchors(di_b, *front, jnp.asarray(lens), p, True)
    for a, b in zip(out_r, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_h2r_probe_wide_keys():
    """Same parity with k=19 (38-bit keys: the [hi, lo] wide row layout)."""
    import os

    from minimap2_tpu.parallel.batch import (_compact_minimizers,
                                             _lookup_anchors)
    rng = np.random.default_rng(11)
    ref = "".join(rng.choice(list("ACGT"), 30000))
    mi = MiniIndex.build(["c1"], [ref], w=10, k=19)
    p = BatchParams(k=19, L=512, M=128, A=256, chain_window=32)
    codes, lens, _ = _sim(rng, ref, p, 8, p.L)
    di_r = DeviceIndex.from_host(mi, 1)[0]
    assert di_r.h2r is not None and di_r.key_bits == 38
    os.environ["MM2TPU_H2R"] = "0"
    try:
        di_b = DeviceIndex.from_host(mi, 1)[0]
    finally:
        del os.environ["MM2TPU_H2R"]
    hhi, hlo, z, is_mini = device_sketch(jnp.asarray(codes),
                                         jnp.asarray(lens), p.k, p.w)
    front = _compact_minimizers(hhi, hlo, z, is_mini, p.M)
    out_r = _lookup_anchors(di_r, *front, jnp.asarray(lens), p, True)
    out_b = _lookup_anchors(di_b, *front, jnp.asarray(lens), p, True)
    for a, b in zip(out_r, out_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rmq_tier_long_lookback():
    """Device RMQ tier (lchain.c:219-368's long-gap regime): a chain
    predecessor sitting > chain_window anchors back -- junk anchors
    interleave in rpos order -- is unreachable for the windowed scan but
    joins through the strided long window under the wide band."""
    import dataclasses

    from minimap2_tpu.parallel.batch import _chain_scan
    A = 512
    anchors = []            # (rpos, qpos, span)
    for j in range(100):    # left chain on the main diagonal
        anchors.append((100 + 30 * j, 100 + 30 * j))
    for j in range(150):    # junk between the chains (shared low qpos)
        anchors.append((3100 + 33 * j, 40 + (j % 3)))
    for j in range(100):    # right chain after a 5 kb deletion
        anchors.append((8100 + 30 * j, 3100 + 30 * j))
    anchors.sort()
    n = len(anchors)
    rpos = np.zeros((1, A), np.int32)
    qpos = np.zeros((1, A), np.int32)
    rpos[0, :n] = [a[0] for a in anchors]
    qpos[0, :n] = [a[1] for a in anchors]
    rev = np.zeros((1, A), np.int32)
    rid = np.zeros((1, A), np.int32)
    span = np.full((1, A), 15, np.int32)
    av = np.zeros((1, A), bool)
    av[0, :n] = True
    args = tuple(jnp.asarray(x) for x in (rev, rid, rpos, qpos, span, av))
    p = BatchParams(chain_window=64, bw=500, bw_long=50000,
                    max_dist_x=100000, max_dist_y=100000)
    best_no, _ = _chain_scan(*args, p)
    p2 = dataclasses.replace(p, rmq_tier=True)
    best_yes, _ = _chain_scan(*args, p2)
    sc_no, sc_yes = int(best_no[0][0]), int(best_yes[0][0])
    # windowed-only: the two chains stay separate (~100 anchors each)
    assert sc_no < 1700, sc_no
    # RMQ tier: joined across the gap (gap penalty ~600 paid once)
    assert sc_yes > 2000, sc_yes
    # and the joined chain spans both sides
    assert int(best_yes[1][0]) <= 110 and int(best_yes[2][0]) > 6000
