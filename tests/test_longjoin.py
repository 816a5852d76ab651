"""Device long-join rescue (map.c:283-292 as a second wide-band chain
pass): a read spanning an SV-scale deletion must come back as ONE chain
covering the whole query when bw_long is set, and as a split chain
without it."""
import io

import jax.numpy as jnp
import numpy as np
import pytest

from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.parallel import engine
from minimap2_tpu.parallel.batch import BatchParams, DeviceIndex


@pytest.fixture(scope="module")
def sv_world():
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 100_000, dtype=np.uint8)
    mi = MiniIndex.build_codes(["c1"], [ref], w=10, k=15)
    di = DeviceIndex.from_host(mi, 1)[0]
    # read = 2 kb + 2 kb around a 3 kb deletion (plus light noise)
    st = 40_000
    left = ref[st:st + 2000]
    right = ref[st + 5000:st + 7000]
    read = np.concatenate([left, right]).copy()
    m = rng.random(len(read)) < 0.02
    read[m] = (read[m] + rng.integers(1, 4, int(m.sum()),
                                      dtype=np.uint8)) % 4
    reads = np.full((8, 4096), 4, np.uint8)
    lens = np.zeros(8, np.int32)
    for i in range(8):      # a batch of identical SV reads
        reads[i, :len(read)] = read
        lens[i] = len(read)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    seqs = [ACGT[reads[i, :lens[i]]].tobytes() for i in range(8)]
    return mi, di, seqs, st


def _best_rec(mi, di, seqs, bw_long):
    p = BatchParams(L=4096, M=1024, A=2048, occ_cap=16, chain_window=64,
                    bw_long=bw_long)
    step = engine.make_paf_step(di, p, K=5, min_sc=40, interpret=True)
    fut = engine.dispatch_batch(step, seqs, p)
    rec = np.asarray(fut)
    # planes: score, sub, qs, qe, rs, re, rev, rid, cnt, rep
    return {k: rec[j, 0, 0] for j, k in enumerate(
        ("score", "sub", "qs", "qe", "rs", "re", "rev", "rid", "cnt"))}


def test_longjoin_spans_sv_deletion(sv_world):
    mi, di, seqs, st = sv_world
    narrow = _best_rec(mi, di, seqs, bw_long=0)
    wide = _best_rec(mi, di, seqs, bw_long=20000)
    # without the rescue the best chain covers only one side (~2 kb)
    assert narrow["qe"] - narrow["qs"] < 2500, narrow
    # with bw_long the join spans the whole 4 kb query...
    assert wide["qe"] - wide["qs"] > 3500, wide
    # ...and the reference span includes the 3 kb deletion
    assert wide["re"] - wide["rs"] > 6500, wide
    assert abs(int(wide["rs"]) - st) < 100
    assert wide["score"] >= narrow["score"]


def test_longjoin_no_trigger_on_clean_reads(sv_world):
    """Reads without an uncovered tail must be untouched by the rescue
    pass (trigger requires a > rmq_rescue_size uncovered span)."""
    mi, di, _seqs, _st = sv_world
    rng = np.random.default_rng(3)
    ref_seq = None
    # clean read straight from the reference
    from minimap2_tpu.index.index import MiniIndex  # noqa: F401
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    # rebuild source sequence deterministically
    rng2 = np.random.default_rng(21)
    ref = rng2.integers(0, 4, 100_000, dtype=np.uint8)
    reads = [ACGT[ref[10_000 + 500 * i:10_000 + 500 * i + 2000]].tobytes()
             for i in range(8)]
    a = _best_rec(mi, di, reads, bw_long=0)
    b = _best_rec(mi, di, reads, bw_long=20000)
    assert a == b, (a, b)


def test_sv_deletion_device_cigar(sv_world, tmp_path):
    """Anchored decomposition (r04 missing #3): an SV-deletion read on
    the --batch -c path must align ON DEVICE (no host fallback) with the
    ~3 kb deletion as a D run in the cigar."""
    import re
    import sys

    from minimap2_tpu.config import IndexOptions, MapOptions, MM_F_CIGAR, \
        MM_F_OUT_CG, mapopt_update, set_opt
    mi, di, seqs, st = sv_world
    io_, mo = IndexOptions(), MapOptions()
    set_opt(None, io_, mo)
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG
    mo.bw_long = 20000          # long-join rescue: chain spans the SV
    mapopt_update(mo, mi)
    fq = tmp_path / "sv.fa"
    with open(fq, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s.decode()}\n")
    out = io.StringIO()
    import contextlib
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        engine.run_batched_align_cli(mi, mo, [str(fq)], out,
                                     batch_reads=8, L=4096)
    m = re.search(r"host fallbacks: (\d+)", err.getvalue())
    assert m and int(m.group(1)) == 0, err.getvalue()
    lines = [l for l in out.getvalue().splitlines() if "\tcg:Z:" in l]
    assert lines, out.getvalue()
    cg = lines[0].split("cg:Z:")[1].split("\t")[0]
    dels = [int(n) for n, op in re.findall(r"(\d+)([MIDNSHP=XB])", cg)
            if op == "D"]
    # the 3 kb deletion survives as one D run (placement may shift by
    # up to a waypoint spacing; size within 10%)
    assert dels and max(dels) > 2700, cg
    # query coverage: both flanks aligned
    qlen, qs, qe = (int(lines[0].split("\t")[i]) for i in (1, 2, 3))
    assert qe - qs > 3500, lines[0]
