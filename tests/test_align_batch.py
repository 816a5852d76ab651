"""The --batch -c/-a device alignment path (parallel/align_batch.py +
engine.run_batched_align_cli) in CPU interpret mode on tiny shapes.

The device path is statistically gated (not byte-exact vs align.c): one
global banded extd2 pass over the best-chain extent + on-device traceback.
These tests check the CIGAR reconstructs the planted variants and that the
host fallback engages for oversize reads.
"""
import io
import os
import re
import tempfile

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from minimap2_tpu.config import (MM_F_CIGAR, MM_F_OUT_CG,  # noqa: E402
                                 MapOptions, mapopt_update)
from minimap2_tpu.index.index import MiniIndex  # noqa: E402
from minimap2_tpu.parallel.engine import run_batched_align_cli  # noqa: E402

KW = {"QP": 256, "TP": 768, "W": 256, "sub": 4}


def _run(mi, mo, read_seqs, L=256):
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    for i, s in enumerate(read_seqs):
        fa.write(f">rd{i}\n{s}\n")
    fa.close()
    out = io.StringIO()
    try:
        run_batched_align_cli(mi, mo, [fa.name], out, batch_reads=4, L=L,
                              align_kw=KW)
    finally:
        os.unlink(fa.name)
    return out.getvalue()


@pytest.fixture(scope="module")
def small_ref():
    rng = np.random.default_rng(3)
    ref = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).tobytes()
    mi = MiniIndex.build(["chrT"], [ref], w=10, k=15)
    mo = MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG
    mapopt_update(mo, mi)
    return ref, mi, mo


def test_batch_align_snp_del(small_ref):
    ref, mi, mo = small_ref
    read = bytearray(ref[1000:1220])
    read[40] = ord("A") if read[40] != ord("A") else ord("C")
    del read[120]
    v = _run(mi, mo, [bytes(read).decode()])
    t = v.strip().split("\n")[0].split("\t")
    assert t[5] == "chrT" and t[4] == "+"
    assert 990 <= int(t[7]) <= 1010 and 1205 <= int(t[8]) <= 1220
    assert "NM:i:2" in v
    cg = [x for x in t if x.startswith("cg:Z:")][0][5:]
    ops = re.findall(r"(\d+)([MIDN])", cg)
    assert sum(int(n) for n, op in ops if op in "MD") == int(t[8]) - int(t[7])
    assert sum(int(n) for n, op in ops if op in "MI") == int(t[3]) - int(t[2])
    assert any(op == "D" and n == "1" for n, op in ops)


def test_batch_align_revcomp(small_ref):
    ref, mi, mo = small_ref
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    read = ref[2000:2200].translate(comp)[::-1]
    v = _run(mi, mo, [read.decode()])
    t = v.strip().split("\n")[0].split("\t")
    assert t[4] == "-" and t[5] == "chrT"
    assert 1995 <= int(t[7]) <= 2005 and 2195 <= int(t[8]) <= 2205
    assert "NM:i:0" in v


def test_batch_align_oversize_falls_back(small_ref):
    ref, mi, mo = small_ref
    # longer than QP=256: must route through the bit-exact host path
    read = ref[500:1500]
    v = _run(mi, mo, [read.decode()])
    t = v.strip().split("\n")[0].split("\t")
    assert (int(t[7]), int(t[8])) == (500, 1500)
    assert "NM:i:0" in v


def test_batch_align_secondary():
    rng = np.random.default_rng(11)
    ref = bytearray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                               4000).tobytes())
    ref[3000:3220] = ref[1000:1220]          # duplicated segment
    mi = MiniIndex.build(["chrT"], [bytes(ref)], w=10, k=15)
    mo = MapOptions()
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG
    mapopt_update(mo, mi)
    v = _run(mi, mo, [ref[1000:1220].decode()])
    lines = [ln.split("\t") for ln in v.strip().split("\n")]
    pri = [t for t in lines if any(x == "tp:A:P" for x in t)]
    sec = [t for t in lines if any(x == "tp:A:S" for x in t)]
    assert len(pri) == 1 and len(sec) >= 1
    ivs = sorted((int(t[7]), int(t[8])) for t in pri + sec)
    assert 990 <= ivs[0][0] <= 1010 and 2990 <= ivs[1][0] <= 3010
    assert all(any(x.startswith("cg:Z:") for x in t) for t in pri + sec)
    assert sec[0][11] == "0"                 # secondary mapq
    assert int(pri[0][11]) < 60              # ambiguous -> capped mapq


def test_batch_align_junk_end_trim(small_ref):
    # a read whose tail is 80bp of junk: the global band force-aligns it,
    # but the Kadane max-subpath trim (the reference's extension-stop
    # semantics, align.c:779-890) must clip the junk so the alignment
    # matches the host path's coordinates and CIGAR exactly
    ref, mi, mo = small_ref
    rng = np.random.default_rng(9)
    junk = rng.choice(np.frombuffer(b"ACGT", np.uint8), 80).tobytes()
    read = ref[1000:1150] + junk
    v = _run(mi, mo, [read.decode()])
    # host-path oracle
    from minimap2_tpu.io.fastx import SeqRecord
    from minimap2_tpu.map.driver import map_fragment, write_fragment
    rec = SeqRecord(name="rd0", seq=read, qual=None, comment=None)
    results = map_fragment(mi, mo, [rec])
    buf = io.StringIO()
    write_fragment(buf, mi, mo, [rec], [r.regs for r in results],
                   [r.rep_len for r in results])
    bt = v.strip().split("\n")[0].split("\t")
    ht = buf.getvalue().strip().split("\n")[0].split("\t")
    # coordinates, strand, extents and NM/cigar must agree (cm/s1 are
    # device-chain approximations and may differ)
    assert bt[1:9] == ht[1:9], (bt, ht)
    assert [f for f in bt if f.startswith(("NM:", "cg:"))] == \
        [f for f in ht if f.startswith(("NM:", "cg:"))]


def test_batch_align_junk_middle_fallback(small_ref):
    # junk in the MIDDLE of a read: the trimmed path still carries the
    # internal score drop, so the mm_test_zdrop audit (align.c:61-103)
    # must route the read to the exact host path (chain split semantics)
    ref, mi, mo = small_ref
    rng = np.random.default_rng(11)
    junk = rng.choice(np.frombuffer(b"ACGT", np.uint8), 600).tobytes()
    read = ref[800:1100] + junk + ref[1700:2000]
    v = _run(mi, mo, [read.decode()], L=1536)
    from minimap2_tpu.io.fastx import SeqRecord
    from minimap2_tpu.map.driver import map_fragment, write_fragment
    rec = SeqRecord(name="rd0", seq=read, qual=None, comment=None)
    results = map_fragment(mi, mo, [rec])
    buf = io.StringIO()
    write_fragment(buf, mi, mo, [rec], [r.regs for r in results],
                   [r.rep_len for r in results])
    assert v == buf.getvalue()


def _splice_opts(ref_names, ref_seqs):
    from minimap2_tpu.config import IndexOptions, set_opt, mapopt_update
    from minimap2_tpu.config import MapOptions as MO
    io_opt = IndexOptions()
    mo = MO()
    set_opt("splice", io_opt, mo)
    mo.flag |= MM_F_CIGAR | MM_F_OUT_CG
    mi = MiniIndex.build(ref_names, ref_seqs, w=io_opt.w, k=io_opt.k)
    mapopt_update(mo, mi)
    return mi, mo


def test_batch_splice_x3s():
    # --batch -x splice on the reference's splice test case: coordinates,
    # intron placement (N op), AS and ts must match the host parity path
    from minimap2_tpu.io.fastx import read_fasta
    names, seqs = read_fasta("tests/data/x3s-ref.fa")
    mi, mo = _splice_opts(names, seqs)
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    qn, qs = read_fasta("tests/data/x3s-qry.fa")
    for n, s in zip(qn, qs):
        fa.write(f">{n}\n{s.decode() if isinstance(s, bytes) else s}\n")
    fa.close()
    out = io.StringIO()
    run_batched_align_cli(mi, mo, [fa.name], out, batch_reads=4, L=512,
                          align_kw={"QP": 512, "TP": 1024, "sub": 4,
                                    "RB": 32})
    os.unlink(fa.name)
    from minimap2_tpu.io.fastx import SeqRecord
    from minimap2_tpu.map.driver import map_fragment, write_fragment
    recs = [SeqRecord(name=n, seq=s if isinstance(s, bytes) else s.encode(),
                      qual=None, comment=None) for n, s in zip(qn, qs)]
    buf = io.StringIO()
    for rec in recs:
        results = map_fragment(mi, mo, [rec])
        write_fragment(buf, mi, mo, [rec], [r.regs for r in results],
                       [r.rep_len for r in results])
    bt = out.getvalue().strip().split("\n")[0].split("\t")
    ht = buf.getvalue().strip().split("\n")[0].split("\t")
    assert bt[1:9] == ht[1:9], (bt, ht)
    for tag in ("cg:", "AS:", "ts:", "NM:"):
        assert [f for f in bt if f.startswith(tag)] == \
            [f for f in ht if f.startswith(tag)], (tag, bt, ht)


def test_batch_splice_sim_cdna():
    # simulated 3-exon cDNA reads on both strands: every batch alignment
    # must place both introns exactly (junceval-style exact-intron check)
    rng = np.random.default_rng(21)
    ref = rng.integers(0, 4, 6000, dtype=np.uint8)
    # force canonical GT..AG introns at known positions
    ex = [(1000, 1150), (1450, 1600), (2100, 2260)]
    introns = [(1150, 1450), (1600, 2100)]
    for st, en in introns:
        ref[st], ref[st + 1] = 2, 3          # GT
        ref[en - 2], ref[en - 1] = 0, 2      # AG
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    mi, mo = _splice_opts(["chrS"], [ACGT[ref].tobytes()])
    cdna = np.concatenate([ref[st:en] for st, en in ex])
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    fwd = ACGT[cdna].tobytes()
    rev = fwd.translate(comp)[::-1]
    fa = tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False)
    fa.write(f">cdna_f\n{fwd.decode()}\n>cdna_r\n{rev.decode()}\n")
    fa.close()
    out = io.StringIO()
    run_batched_align_cli(mi, mo, [fa.name], out, batch_reads=4, L=512,
                          align_kw={"QP": 512, "TP": 2048, "sub": 4,
                                    "RB": 32})
    os.unlink(fa.name)
    lines = [l.split("\t") for l in out.getvalue().strip().split("\n")]
    assert len(lines) == 2
    for t in lines:
        assert t[5] == "chrS" and int(t[7]) == 1000 and int(t[8]) == 2260
        cg = [x for x in t if x.startswith("cg:Z:")][0][5:]
        nops = re.findall(r"(\d+)N", cg)
        assert sorted(int(n) for n in nops) == [300, 500], cg
        assert [x for x in t if x.startswith("ts:A:")], t


def test_batch_paired_end_sr():
    # --batch -ax sr r1 r2: device mapping of both ends + mm_pair rescue
    # (pe.c:81-182).  Gate: proper-pair flags identical to the host path,
    # >=90% of records byte-identical in the first 9 SAM columns.
    import collections
    from minimap2_tpu.config import IndexOptions, set_opt
    from minimap2_tpu.config import MapOptions as MO
    from minimap2_tpu.config import MM_F_OUT_SAM
    from minimap2_tpu.io.fastx import read_fasta
    from minimap2_tpu.parallel.engine import run_batched_pe_cli
    io_opt = IndexOptions()
    mo = MO()
    set_opt("sr", io_opt, mo)
    mo.flag |= MM_F_CIGAR | MM_F_OUT_SAM
    names, seqs = read_fasta("tests/data/MT-human.fa")
    mi = MiniIndex.build(names, seqs, w=io_opt.w, k=io_opt.k)
    mapopt_update(mo, mi)
    out = io.StringIO()
    run_batched_pe_cli(mi, mo, ["tests/data/sr-r1.fq",
                                "tests/data/sr-r2.fq"], out,
                       batch_frags=8, L=256,
                       align_kw={"QP": 256, "TP": 768, "W": 256, "sub": 8})
    lines = out.getvalue().splitlines()
    from minimap2_tpu.map.driver import (iter_fragments, map_fragment,
                                         write_fragment)
    buf = io.StringIO()
    for frag in iter_fragments(["tests/data/sr-r1.fq",
                                "tests/data/sr-r2.fq"], True):
        res = map_fragment(mi, mo, frag)
        write_fragment(buf, mi, mo, frag, [r.regs for r in res],
                       [r.rep_len for r in res])
    hlines = buf.getvalue().splitlines()
    assert len(lines) == len(hlines) == 80
    flags = collections.Counter(l.split("\t")[1] for l in lines)
    hflags = collections.Counter(l.split("\t")[1] for l in hlines)
    assert flags == hflags, (flags, hflags)     # all pairs proper
    # coordinates/cigar/mate fields must match; mapq may differ (the
    # host pairs on the JOINT fragment chain, the batch path on per-end
    # chains -- the reference's own weak-pairing mode behaves the same)
    same = sum(1 for a, b in zip(lines, hlines)
               if a.split("\t")[:4] + a.split("\t")[5:9]
               == b.split("\t")[:4] + b.split("\t")[5:9])
    assert same >= 0.9 * len(hlines), f"{same}/{len(hlines)}"
    dq = [abs(int(a.split("\t")[4]) - int(b.split("\t")[4]))
          for a, b in zip(lines, hlines)]
    assert max(dq) <= 20 and float(np.mean(dq)) <= 3.0, dq
