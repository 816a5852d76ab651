"""Device-side index build (parallel/devbuild.py) vs the host MiniIndex
build (the parity oracle, itself golden-tested against mm_sketch /
index.c semantics)."""
import numpy as np
import pytest

from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.parallel.devbuild import build_device_index


def _rand_genome(rng, lens, n_frac=0.0):
    names, seqs = [], []
    for i, ln in enumerate(lens):
        c = rng.integers(0, 4, ln).astype(np.uint8)
        if n_frac:
            m = rng.random(ln) < n_frac
            c[m] = 4
        names.append(f"c{i + 1}")
        seqs.append(c)
    return names, seqs


def _host_ref(names, seqs, w, k):
    mi = MiniIndex.build_codes(names, seqs, w=w, k=k)
    return mi


def _h2r_as_tables(di, K):
    """Decode the payload-fused 2-choice rows back into sorted
    (keys2, sc2) tables (the h2r layout's parity check).  Handles both
    strides; note stride-2 clamps counts at 63, so parity genomes must
    stay below that occurrence depth."""
    h2r = np.asarray(di.h2r)
    if h2r.shape[1] == 128:             # stride 2
        r = h2r.reshape(-1, 64, 2)
        w0, w1 = r[..., 0], r[..., 1]
        valid = w0 != np.uint32(0xFFFFFFFF)
        keys = (w0[valid] & np.uint32(0x3FFFFFFF)).astype(np.uint64)
        st = (w1[valid] & np.uint32(0x0FFFFFFF)).astype(np.int64)
        cn = (((w0[valid] >> np.uint32(30)) << np.uint32(4))
              | (w1[valid] >> np.uint32(28))).astype(np.int64)
        assert int(valid.sum()) == K, (int(valid.sum()), K)
        order = np.argsort(keys, kind="stable")
        keys2 = np.stack([np.zeros(K, np.uint32),
                          keys[order].astype(np.uint32)], axis=1)
        sc2 = np.stack([st[order], cn[order]], axis=1)
        return keys2, sc2
    r = h2r.reshape(-1, 64, 4)
    ks, aux, st, cn = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    valid = ks != np.uint32(0xFFFFFFFF)
    assert int(valid.sum()) == K, (int(valid.sum()), K)
    if di.key_bits > 31:
        keys = (ks[valid].astype(np.uint64) << np.uint64(32)) \
            | aux[valid].astype(np.uint64)
        hi, lo = ks[valid], aux[valid]
    else:
        keys = ks[valid].astype(np.uint64)
        hi, lo = np.zeros_like(ks[valid]), ks[valid]
    order = np.argsort(keys, kind="stable")
    keys2 = np.stack([hi[order], lo[order]], axis=1)
    sc2 = np.stack([st[valid][order].astype(np.int64),
                    cn[valid][order].astype(np.int64)], axis=1)
    return keys2, sc2


def _dev_as_host(di, meta):
    """Download the (small, test-sized) device tables and re-express them
    in host MiniIndex coordinates."""
    if di.h2r is not None:
        keys2, sc2 = _h2r_as_tables(di, meta.n_distinct)
    elif di.krows is not None:
        # windowed-probe layout: 64 interleaved (hi, lo) pairs per row
        keys2 = np.asarray(di.krows).reshape(-1, 2)
        sc2 = np.asarray(di.sc2)
    else:
        keys2 = np.asarray(di.keys2)
        sc2 = np.asarray(di.sc2)
    pos2 = np.asarray(di.pos2)
    K = meta.n_distinct
    keys = (keys2[:K, 0].astype(np.uint64) << np.uint64(32)) \
        | keys2[:K, 1].astype(np.uint64)
    starts = np.concatenate([sc2[:K, 0], [sc2[K - 1, 0] + sc2[K - 1, 1]]])
    # sep-space -> (rid, rpos, strand)
    gp = pos2[:meta.n_mini]
    gpos = (gp >> np.uint32(1)).astype(np.int64)
    strand = (gp & np.uint32(1)).astype(np.uint64)
    rid = np.searchsorted(meta.seq_off, gpos, side="right") - 1
    rpos = gpos - meta.seq_off[rid]
    y = (rid.astype(np.uint64) << np.uint64(32)) \
        | (rpos.astype(np.uint64) << np.uint64(1)) | strand
    return keys, starts.astype(np.int64), y


@pytest.mark.parametrize("w,k,n_frac", [(10, 15, 0.0), (10, 15, 0.002),
                                        (5, 19, 0.0), (11, 21, 0.001),
                                        (1, 7, 0.0)])
def test_devbuild_matches_host(w, k, n_frac):
    rng = np.random.default_rng(hash((w, k)) % 2**32)
    # 9 bp < k (skipped), 20 bp exercises the short-sequence final
    # flush (reference emits one minimizer with no complete window)
    names, seqs = _rand_genome(rng, [50_000, 3_000, 120_000, 9, 20],
                               n_frac)
    mi = _host_ref(names, seqs, w, k)
    di, meta = build_device_index(names, seqs, w, k, interpret=True)
    keys, starts, y = _dev_as_host(di, meta)
    assert meta.n_mini == len(mi.pos)
    assert meta.n_distinct == len(mi.keys)
    np.testing.assert_array_equal(keys, mi.keys)
    np.testing.assert_array_equal(starts, mi.starts)
    np.testing.assert_array_equal(y, mi.pos)


def test_devbuild_bucket_table():
    import os
    rng = np.random.default_rng(3)
    names, seqs = _rand_genome(rng, [80_000])
    os.environ["MM2TPU_DEVBUILD_H2R"] = "0"    # legacy windowed layout
    try:
        di, meta = build_device_index(names, seqs, 10, 15, interpret=True)
    finally:
        del os.environ["MM2TPU_DEVBUILD_H2R"]
    keys2 = np.asarray(di.krows).reshape(-1, 2)
    bs = np.asarray(di.bucket_start)
    K = meta.n_distinct
    keys = keys2[:K, 1]
    ref = np.searchsorted(keys, np.arange(len(bs), dtype=np.uint32)
                          << np.uint32(di.key_shift)).astype(np.int32)
    np.testing.assert_array_equal(bs, ref)
    # n_probe covers the max bucket
    bmax = int(np.max(np.diff(bs)))
    assert (1 << di.n_probe) >= bmax + 1


def test_devbuild_mid_occ_matches_host():
    rng = np.random.default_rng(4)
    names, seqs = _rand_genome(rng, [60_000, 40_000])
    # force repeats so occurrences vary
    seqs[0][30_000:32_000] = seqs[0][:2_000]
    mi = _host_ref(names, seqs, 10, 15)
    di, meta = build_device_index(names, seqs, 10, 15, interpret=True)
    assert meta.mid_occ == mi.cal_max_occ(2e-4)


def _dev_as_host_fmt2(di, meta):
    """fmt2 layout -> host coordinates (u32 positions + strand bitmap +
    4-bit packed S)."""
    if di.h2r is not None:
        keys2, sc2 = _h2r_as_tables(di, meta.n_distinct)
    else:
        keys2 = np.asarray(di.krows).reshape(-1, 2)
        sc2 = np.asarray(di.sc2)
    pos2 = np.asarray(di.pos2)
    ps = np.asarray(di.pstrand)
    K = meta.n_distinct
    keys = (keys2[:K, 0].astype(np.uint64) << np.uint64(32)) \
        | keys2[:K, 1].astype(np.uint64)
    starts = np.concatenate([sc2[:K, 0], [sc2[K - 1, 0] + sc2[K - 1, 1]]])
    n = meta.n_mini
    gpos = pos2[:n].astype(np.int64)
    idx = np.arange(n)
    strand = ((ps[idx >> 3] >> (idx & 7)) & 1).astype(np.uint64)
    rid = np.searchsorted(meta.seq_off, gpos, side="right") - 1
    rpos = gpos - meta.seq_off[rid]
    y = (rid.astype(np.uint64) << np.uint64(32)) \
        | (rpos.astype(np.uint64) << np.uint64(1)) | strand
    return keys, starts.astype(np.int64), y


def test_devbuild_fmt2_matches_host():
    """pos_fmt 2 (u32 positions + strand bitmap + 4-bit S): exact parity
    with the host build on a small genome (the >= 2^31 bp layout,
    exercised via force_pos_fmt)."""
    rng = np.random.default_rng(11)
    names, seqs = _rand_genome(rng, [70_000, 2_000, 50_000], 0.001)
    mi = _host_ref(names, seqs, 10, 15)
    di, meta = build_device_index(names, seqs, 10, 15, interpret=True,
                                  force_pos_fmt=2)
    assert di.pos_fmt == 2 and di.s_fmt == 1 and di.pstrand is not None
    keys, starts, y = _dev_as_host_fmt2(di, meta)
    assert meta.n_mini == len(mi.pos)
    assert meta.n_distinct == len(mi.keys)
    np.testing.assert_array_equal(keys, mi.keys)
    np.testing.assert_array_equal(starts, mi.starts)
    np.testing.assert_array_equal(y, mi.pos)
    # 4-bit packed S decodes back to the host codes
    S4 = np.asarray(di.S)
    dec = np.stack([S4 & 0xF, S4 >> 4], axis=1).reshape(-1)
    flat = np.concatenate(
        [np.concatenate([np.full(32, 4, np.uint8), s]) for s in seqs]
        + [np.full(32, 4, np.uint8)])
    np.testing.assert_array_equal(dec[:len(flat)], np.minimum(flat, 4))


def test_devbuild_many_contigs():
    """> 64 contigs (GRCh38 has 195): build + rid recovery parity."""
    rng = np.random.default_rng(12)
    names, seqs = _rand_genome(rng, [3_000] * 80)
    mi = _host_ref(names, seqs, 10, 15)
    di, meta = build_device_index(names, seqs, 10, 15, interpret=True)
    keys, starts, y = _dev_as_host(di, meta)
    np.testing.assert_array_equal(keys, mi.keys)
    np.testing.assert_array_equal(starts, mi.starts)
    np.testing.assert_array_equal(y, mi.pos)


def test_many_contigs_map_batch():
    """Binary-search rid recovery (> 16 contigs) on the mapping path."""
    import jax.numpy as jnp

    from minimap2_tpu.parallel.batch import (BatchParams, DeviceIndex,
                                             map_batch)
    rng = np.random.default_rng(13)
    names, seqs = _rand_genome(rng, [4_000] * 24)
    mi = _host_ref(names, seqs, 10, 15)
    di = DeviceIndex.from_host(mi, 1)[0]
    assert di.seq_off.shape[0] > 16
    p = BatchParams(L=512, M=128, A=256, QP=512, TP=512, W=256, ext_w=200,
                    chain_window=32)
    B, RL = 8, 400
    codes = np.zeros((B, p.L), np.uint8) + 4
    lens = np.full(B, RL, np.int32)
    truth = []
    for i in range(B):
        rid = int(rng.integers(0, len(seqs)))
        st = int(rng.integers(0, len(seqs[rid]) - RL))
        codes[i, :RL] = seqs[rid][st:st + RL]
        truth.append((rid, st))
    out = map_batch(di, jnp.asarray(codes), jnp.asarray(lens), p,
                    interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for i, (rid, st) in enumerate(truth):
        assert out["chain_score"][i] > 50
        assert out["rid"][i] == rid, (i, out["rid"][i], rid)
        assert abs(int(out["rs"][i]) - st) < 150


@pytest.mark.slow
def test_devbuild_parity_2mb_with_ns():
    """Larger-scale parity stress: 2 Mb across 5 contigs with 0.3% N
    runs (multi-chunk path, ambiguity resets near chunk boundaries)."""
    rng = np.random.default_rng(17)
    names, seqs = _rand_genome(rng, [900_000, 500_000, 400_000, 150_000,
                                     50_000], 0.0)
    # clustered N runs (not iid): the edge-fix reset path's hard case
    for s in seqs:
        for _ in range(max(1, len(s) // 100_000)):
            st = int(rng.integers(0, len(s) - 30))
            s[st:st + int(rng.integers(1, 30))] = 4
    mi = _host_ref(names, seqs, 10, 15)
    di, meta = build_device_index(names, seqs, 10, 15, interpret=True,
                                  chunk_pos=1 << 19)   # force many chunks
    keys, starts, y = _dev_as_host(di, meta)
    assert meta.n_mini == len(mi.pos)
    assert meta.n_distinct == len(mi.keys)
    np.testing.assert_array_equal(keys, mi.keys)
    np.testing.assert_array_equal(starts, mi.starts)
    np.testing.assert_array_equal(y, mi.pos)


def test_rtab_rid_recovery_map_batch():
    """4 KiB-block rid table (> 16 contigs, all >= 4 KiB): rid recovery
    parity with the binary-search fallback on the mapping path."""
    import os

    import jax.numpy as jnp

    from minimap2_tpu.parallel.batch import (BatchParams, DeviceIndex,
                                             map_batch)
    rng = np.random.default_rng(31)
    names, seqs = _rand_genome(rng, [6_000] * 24)
    mi = _host_ref(names, seqs, 10, 15)
    di = DeviceIndex.from_host(mi, 1)[0]
    assert di.rtab is not None and di.rtab_on == 1
    p = BatchParams(L=512, M=128, A=256, QP=512, TP=512, W=256, ext_w=200,
                    chain_window=32)
    B, RL = 8, 400
    codes = np.zeros((B, p.L), np.uint8) + 4
    lens = np.full(B, RL, np.int32)
    truth = []
    for i in range(B):
        rid = int(rng.integers(0, len(seqs)))
        st = int(rng.integers(0, len(seqs[rid]) - RL))
        codes[i, :RL] = seqs[rid][st:st + RL]
        truth.append((rid, st))
    out = map_batch(di, jnp.asarray(codes), jnp.asarray(lens), p,
                    interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    for i, (rid, st) in enumerate(truth):
        assert out["chain_score"][i] > 50
        assert out["rid"][i] == rid, (i, out["rid"][i], rid)
        assert abs(int(out["rs"][i]) - st) < 150
    # devbuild side: rtab built and consistent with seq_off
    di2, meta2 = build_device_index(names, seqs, 10, 15, interpret=True)
    assert di2.rtab is not None
    rt = np.asarray(di2.rtab)
    off = meta2.seq_off.astype(np.int64)
    want = np.maximum(np.searchsorted(
        off, np.arange(len(rt), dtype=np.int64) * 4096, side="right") - 1,
        0)
    np.testing.assert_array_equal(rt[:, 2], want.astype(np.uint32))
    np.testing.assert_array_equal(rt[:, 0], off[want].astype(np.uint32))
    nxt = np.append(off[1:], np.int64(0xFFFFFFFF))
    np.testing.assert_array_equal(rt[:, 1], nxt[want].astype(np.uint32))


def test_devbuild_h2r_chunked_parity():
    """The chunked h2r build (GRCh38-scale path, O(CK) peak) produces a
    table that decodes identically to the host build."""
    import os
    rng = np.random.default_rng(41)
    names, seqs = _rand_genome(rng, [150_000, 60_000], 0.001)
    mi = _host_ref(names, seqs, 10, 15)
    os.environ["MM2TPU_DEVBUILD_H2R"] = "chunk"
    try:
        di, meta = build_device_index(names, seqs, 10, 15, interpret=True)
    finally:
        del os.environ["MM2TPU_DEVBUILD_H2R"]
    assert di.h2r is not None and di.h2r_nb > 0
    keys, starts, y = _dev_as_host(di, meta)
    np.testing.assert_array_equal(keys, mi.keys)
    np.testing.assert_array_equal(starts, mi.starts)
    np.testing.assert_array_equal(y, mi.pos)
