"""mappy-compatible API (minimap2_tpu.mappy vs reference python/mappy.pyx)."""
import minimap2_tpu.mappy as mp


def test_basics():
    a = mp.Aligner("tests/data/MT-human.fa", preset="map-ont")
    assert bool(a)
    assert a.n_seq == 1 and a.seq_names == ["MT_human"]
    assert a.k == 15 and a.w == 10
    s = a.seq("MT_human", 0, 10)
    assert len(s) == 10 and set(s) <= set("ACGTN")
    assert a.seq("nope") is None
    assert mp.revcomp("ACGTN") == "NACGT"


def test_map_matches_cli_pipeline():
    a = mp.Aligner("tests/data/MT-human.fa", preset="map-ont")
    reads = list(mp.fastx_read("tests/data/MT-orang.fa"))
    assert len(reads) == 1
    name, seq, qual = reads[0]
    assert qual is None
    hits = list(a.map(seq, name=name, cs=True, MD=True))
    assert len(hits) >= 1
    h = hits[0]
    # same values as the mt-sam golden primary line
    assert h.ctg == "MT_human" and h.ctg_len == 16569
    assert h.is_primary and h.strand == 1
    assert h.mapq == 60
    assert (h.q_st, h.q_en) == (0, 16025)
    assert (h.r_st, h.r_en) == (576, 16569)
    assert h.mlen == 13773 and h.blen == 16095
    assert h.NM == h.blen - h.mlen
    assert h.cigar_str.startswith("14M2D4M3I37M")
    assert h.cs.startswith(":14-cc:1*ct")
    assert h.MD and h.MD[0].isdigit()
    assert "cg:Z:" in str(h)


def test_map_paired_and_seq_index():
    ref = ("ACGTACGTGG" * 60) + ("TTGACCATGA" * 60)
    a = mp.Aligner(seq=ref, preset="sr")
    r1 = ref[50:150]
    r2 = mp.revcomp(ref[350:450])
    hits = list(a.map(r1, r2, name="p"))
    assert any(h.read_num == 1 for h in hits)
    assert any(h.read_num == 2 for h in hits)
    h2 = next(h for h in hits if h.read_num == 2)
    assert h2.strand == -1 and h2.r_st >= 300


def test_fastx_read_fastq_comment():
    recs = list(mp.fastx_read("tests/data/sr-r1.fq"))
    assert len(recs) == 40
    name, seq, qual = recs[0]
    assert name == "pair0/1" and len(seq) == 101 and qual == "I" * 101
