"""The later-ported paftools subcommands (liftover, splice2bed, delta2paf,
bedcov, mason2fq, pbsim2fq, sim2bed) on hand-built fixtures with outputs
derived from the reference JS semantics (misc/paftools.js)."""
import contextlib
import io
import os

from minimap2_tpu.tools import paftools as pt

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "golden")


def test_delta2paf(tmp_path):
    d = tmp_path / "t.delta"
    d.write_text("/r /q\nNUCMER\n>r1 q1 100 90\n1 50 1 50 2 2 0\n"
                 "10\n-20\n0\n")
    out = io.StringIO()
    pt.delta2paf([str(d)], out=out)
    assert out.getvalue().strip() == \
        "q1\t90\t0\t50\t+\tr1\t100\t0\t50\t49\t51\t0" \
        "\tNM:i:2\tcg:Z:9M1D19M1I21M"


def test_bedcov(tmp_path):
    reg = tmp_path / "reg.bed"
    tgt = tmp_path / "tgt.bed"
    reg.write_text("c1\t10\t50\nc1\t40\t80\n")
    tgt.write_text("c1\t0\t20\nc1\t70\t100\nc2\t0\t5\n")
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stderr(err):
        pt.bedcov(["-p", str(reg), str(tgt)], out=out)
    assert "# target bases: 55" in err.getvalue()
    assert "overlapping regions: 20" in err.getvalue()


def test_sim2bed(tmp_path):
    f = tmp_path / "sim.txt"
    f.write_text("r0!chr1!100!200!+\nr1!chr2!300_400!350_470!+-/2\n")
    out = io.StringIO()
    pt.sim2bed([str(f)], out=out)
    lines = out.getvalue().strip().split("\n")
    assert lines[0] == "chr1\t100\t200\tr0!chr1!100!200!+\t0\t+"
    assert lines[1] == "chr2\t400\t470\tr1!chr2!300_400!350_470!+-/2\t0\t-"


def test_pbsim2fq(tmp_path):
    fai = tmp_path / "ref.fai"
    maf = tmp_path / "p.maf"
    fai.write_text("chrA\t1000\nchrB\t2000\n")
    maf.write_text("a\ns ref 100 10 + 1000 ACGTACGTAC\n"
                   "s S2_1 0 10 - 10 ACGT-ACGTAC\n")
    out = io.StringIO()
    pt.pbsim2fq([str(fai), str(maf)], out=out)
    assert out.getvalue() == ">S2_1!chrB!100!110!-\nGTACGTACGT\n"


def test_mason2fq(tmp_path):
    sam = tmp_path / "mason.sam"
    sam.write_text(
        "@HD\tVN:1\n"
        "simulated.r7\t99\tchr3\t101\t60\t5M\t=\t0\t0\tACGTA\tIIIII"
        "\tXE:i:1\tXS:i:2\tXI:i:0\n"
        "simulated.r7\t147\tchr3\t201\t60\t5M\t=\t0\t0\tTTTTA\tJJJJJ"
        "\tXE:i:0\tXS:i:0\tXI:i:3\n")
    out = io.StringIO()
    pt.mason2fq([str(sam)], out=out)
    v = out.getvalue().split("\n")
    assert v[0] == "@r7!chr3!100_200!105_205!+-/1 1:2:0"
    assert v[1] == "ACGTA"
    assert v[4] == "@r7!chr3!100_200!105_205!+-/2 0:0:3"
    assert v[5] == "TAAAA"


def test_liftover_golden(tmp_path):
    bed = tmp_path / "lift.bed"
    bed.write_text("MT_orang\t100\t200\nMT_orang\t5000\t5100\n")
    out = io.StringIO()
    pt.liftover(["-l", "1000", os.path.join(GOLD, "mt-paf.out"), str(bed)],
                out=out)
    lines = out.getvalue().strip().split("\n")
    assert lines[0].split("\t")[0] == "MT_human"
    for ln in lines:
        t = ln.split("\t")
        span = int(t[2]) - int(t[1])
        assert 80 <= span <= 130


def test_splice2bed_golden():
    out = io.StringIO()
    pt.splice2bed([os.path.join(GOLD, "x3s-splice-paf.out")], out=out)
    for ln in out.getvalue().strip().split("\n"):
        t = ln.split("\t")
        assert len(t) == 12
        nb = int(t[9])
        sizes = [int(x) for x in t[10].rstrip(",").split(",")]
        starts = [int(x) for x in t[11].rstrip(",").split(",")]
        assert len(sizes) == nb == len(starts)
        assert int(t[1]) + starts[-1] + sizes[-1] == int(t[2])
        assert nb >= 2     # x3s reads are spliced


def test_badread2fa(tmp_path):
    fai = tmp_path / "ref.fai"
    fq = tmp_path / "br.fq"
    fai.write_text("chr1\t1000\n")
    fq.write_text(
        "@r1 chr1,+strand,100-200 length=100 read_identity=92.5%\n"
        "ACGT\n+\nIIII\n"
        "@r2 chr1,-strand,300-400 length=100 read_identity=88.0%\n"
        "TTTT\n+\nJJJJ\n"
        "@r3 junk chimera junk\nGGGG\n+\nKKKK\n")
    out, err = io.StringIO(), io.StringIO()
    pt.badread2fa([str(fai), str(fq)], out=out, err=err)
    v = out.getvalue().split("\n")
    assert v[0] == ">S1!chr1!100!200!+\tri:f:92.5"
    assert v[1] == "ACGT"
    assert v[2] == ">S2!chr1!600!700!-\tri:f:88.0"
    assert "discarded 1 reads" in err.getvalue()


def test_longcs2seq(tmp_path):
    paf = tmp_path / "t.paf"
    base = "q1\t10\t0\t8\t+\tt1\t20\t5\t12\t8\t8\t60"
    paf.write_text(base + "\tcs:Z:=ACG*ta+GG-TT=A\n")
    out = io.StringIO()
    pt.longcs2seq([str(paf)], out=out)
    assert out.getvalue() == ">t1_5_12\nACGTTTA\n"
    out = io.StringIO()
    pt.longcs2seq(["-q", str(paf)], out=out)
    assert out.getvalue() == ">q1_0_8\nACGAGGA\n"


def test_gff2junc(tmp_path):
    gff = tmp_path / "t.gff3"
    gff.write_text(
        "# comment\n"
        "chr1\tsrc\tCDS\t101\t200\t.\t+\t0\tID=c1;Parent=tx1\n"
        "chr1\tsrc\tCDS\t301\t400\t.\t+\t0\tID=c2;Parent=tx1\n"
        "chr1\tsrc\texon\t1\t500\t.\t+\t.\tParent=tx1\n"
        "chr2\tsrc\tCDS\t51\t60\t.\t-\t0\tParent=tx2\n")
    out = io.StringIO()
    pt.gff2junc([str(gff)], out=out)
    assert out.getvalue() == "chr1\t200\t300\ttx1\t0\t+\n"


def test_vcfstat(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "c\t1\t.\tA\tG\t.\t.\t.\n"          # ts
        "c\t2\t.\tA\tC\t.\t.\t.\n"          # tv
        "c\t3\t.\tA\tAT\t.\t.\t.\n"         # 1bp ins
        "c\t4\t.\tATTT\tA\t.\t.\t.\n"       # 3bp del
        "c\t5\t.\tA\t" + "A" * 60 + "\t.\t.\t.\n")   # 59bp ins
    out = io.StringIO()
    pt.vcfstat([str(vcf)], out=out)
    v = out.getvalue()
    assert "# substitutions: 2" in v
    assert "ts/tv: 1.000" in v
    assert "# 1bp insertions: 1" in v
    assert "# [3,50) deletions: 1" in v
    assert "# [50,1000) insertions: 1" in v


def test_vcfsel(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "c\t1\t.\tA\tG\t.\t.\t.\n"                    # diff 0
        "c\t2\t.\tA\tATTTTT\t.\t.\t.\n"               # diff 5
        "c\t3\t.\tA\t<DEL>\t.\t.\tSVLEN=-100\n")      # |svlen| 100
    out = io.StringIO()
    pt.vcfsel(["-l", "3", str(vcf)], out=out)
    body = [x for x in out.getvalue().split("\n")
            if x and not x.startswith("#")]
    assert len(body) == 2 and body[0].startswith("c\t2") \
        and body[1].startswith("c\t3")
    out = io.StringIO()
    pt.vcfsel(["-L", "10", str(vcf)], out=out)
    body = [x for x in out.getvalue().split("\n")
            if x and not x.startswith("#")]
    assert [b.split("\t")[1] for b in body] == ["1", "2"]


def test_vcfpair(tmp_path):
    vcf = tmp_path / "pair.vcf"
    vcf.write_text(
        "##source=x\n"
        "##contig=<ID=chr1,length=100>\n"
        "##contig=<ID=chr1_random,length=5>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tH1\tH2\n"
        "chr1\t10\t.\tA\tG\t.\t.\t.\tGT:AD\t1/1:0,5\t1/1:1,4\n"
        "chr1\t20\t.\tC\tT\t.\t.\t.\tGT:AD\t0/1:3,3\t1/1:0,6\n"
        "chr1\t30\t.\tG\tA\t.\t.\t.\tGT:AD\t./.:0,0\t0/0:7,0\n"
        "chrUn\t5\t.\tT\tC\t.\t.\t.\tGT:AD\t1/1:0,2\t1/1:0,2\n")
    out = io.StringIO()
    pt.vcfpair(["-s", "samp", str(vcf)], out=out)
    v = out.getvalue().split("\n")
    assert "##source=x" not in out.getvalue()
    assert "chr1_random" not in out.getvalue()
    assert any(x.startswith("##FILTER=<ID=HET1") for x in v)
    hdr = [x for x in v if x.startswith("#CHROM")][0]
    assert hdr.endswith("\tsamp") and "\tH1" not in hdr
    body = [x for x in v if x and not x.startswith("#")]
    assert len(body) == 3
    assert body[0].split("\t")[6] == "." \
        and body[0].split("\t")[9] == "1|1:1,9"
    assert body[1].split("\t")[6] == "HET1" \
        and body[1].split("\t")[9] == ".|1:3,9"
    assert body[2].split("\t")[6] == "GAP1" \
        and body[2].split("\t")[9] == ".|0:7,0"
    assert all(x.split("\t")[5] == "30" for x in body)


def test_pafcmp(tmp_path):
    base = tmp_path / "base.paf"
    test = tmp_path / "test.paf"
    row = "{q}\t9000\t0\t8000\t+\t{t}\t50000\t{st}\t{en}\t7000\t8000\t{mq}"
    base.write_text("\n".join([
        row.format(q="r1", t="c1", st=1000, en=9000, mq=60),
        row.format(q="r2", t="c1", st=20000, en=28000, mq=60),
        row.format(q="r3", t="c2", st=100, en=8100, mq=60)]) + "\n")
    test.write_text("\n".join([
        row.format(q="r1", t="c1", st=1100, en=9100, mq=60),   # hit
        row.format(q="r2", t="c2", st=20000, en=28000, mq=60),  # wrong chr
    ]) + "\n")
    out, err = io.StringIO(), io.StringIO()
    pt.pafcmp([str(base), str(test)], out=out, err=err)
    v = out.getvalue()
    assert "X\t3 base alignments with mapQ>=10" in v
    assert "X\t1 base alignments correctly mapped by test" in v
    assert "X\t1 wrong test alignment" in v
    assert "X\t1 base alignments missing" in v
    assert any(x.startswith("W\tr2") for x in v.split("\n"))
    assert any(x.startswith("M\tr3") for x in v.split("\n"))


def test_misjoin(tmp_path):
    paf = tmp_path / "asm.paf"
    row = ("{q}\t{ql}\t{qs}\t{qe}\t{st}\t{t}\t{tl}\t{ts}\t{te}\t{bm}\t{bl}"
           "\t60")
    # ctg1: two big blocks on different chromosomes -> 1 inter-chrom misjoin
    # ctg2: same chr, same strand, 5M reference gap -> 1 intra gap
    paf.write_text("\n".join([
        row.format(q="ctg1", ql=8000000, qs=0, qe=3000000, st="+", t="chr1",
                   tl=50000000, ts=0, te=3000000, bm=2900000, bl=3000000),
        row.format(q="ctg1", ql=8000000, qs=3000000, qe=7000000, st="+",
                   t="chr2", tl=50000000, ts=0, te=4000000, bm=3900000,
                   bl=4000000),
        row.format(q="ctg2", ql=8000000, qs=0, qe=3000000, st="+", t="chr3",
                   tl=50000000, ts=0, te=3000000, bm=2900000, bl=3000000),
        row.format(q="ctg2", ql=8000000, qs=3000000, qe=7000000, st="+",
                   t="chr3", tl=50000000, ts=8000000, te=12000000,
                   bm=3900000, bl=4000000)]) + "\n")
    out = io.StringIO()
    pt.misjoin([str(paf)], out=out)
    v = out.getvalue()
    assert "# inter-chromosomal misjoins: 1,0" in v
    assert "# intra-chromosomal gaps: 1,0" in v
    # with chr1 block inside a centromere it moves to the cen counter
    cen = tmp_path / "cen.bed"
    cen.write_text("chr1\t0\t4000000\n")
    out = io.StringIO()
    pt.misjoin(["-c", str(cen), str(paf)], out=out)
    assert "# inter-chromosomal misjoins: 1,1" in out.getvalue()


def test_sveval(tmp_path):
    hdr = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
    base = tmp_path / "base.vcf"
    call = tmp_path / "call.vcf"
    ins100 = "A" + "G" * 100
    del80 = "A" + "C" * 80
    base.write_text(hdr
                    + f"c1\t1000\t.\tA\t{ins100}\t.\tPASS\t.\n"
                    + f"c1\t5000\t.\t{del80}\tA\t.\tPASS\t.\n"
                    + f"c1\t9000\t.\tA\t{'T' * 61}\t.\tPASS\t.\n")
    call.write_text(hdr
                    + f"c1\t1050\t.\tA\t{ins100}\t.\tPASS\t.\n"   # TP
                    + f"c1\t5020\t.\t{del80}\tA\t.\t.\t.\n"       # TP
                    + f"c2\t100\t.\tA\t{'T' * 70}\t.\tPASS\t.\n")  # FP
    out = io.StringIO()
    pt.sveval([str(base), str(call)], out=out)
    v = out.getvalue().strip().split("\n")
    assert v[0] == "SN\t3\t2\t0.666667"
    assert v[1] == "PC\t3\t2\t0.666667"
    assert v[2] == "F1\t0.666667"


def test_paf2gff(tmp_path):
    paf = tmp_path / "mp.paf"
    # exon1 300bp, 1000bp intron (N), exon2 150bp
    paf.write_text("p1\t100\t0\t100\t+\tchr1\t100000\t2000\t3450\t95\t100"
                   "\t60\tAS:i:500\tcg:Z:300M1000N150M\n")
    out = io.StringIO()
    pt.paf2gff([str(paf)], out=out)
    v = out.getvalue().strip().split("\n")
    t0 = v[0].split("\t")
    assert t0[2] == "transcript" and t0[3] == "2001" and t0[4] == "3450"
    assert "transcript_id=p1#1" in t0[8]
    assert "identity=0.9500" in t0[8]
    cds = [x.split("\t") for x in v[1:]]
    assert [c[2] for c in cds] == ["CDS", "CDS"]
    assert (cds[0][3], cds[0][4]) == ("2001", "2300")
    assert (cds[1][3], cds[1][4]) == ("3301", "3450")


def test_asmgene(tmp_path):
    ref = tmp_path / "ref.paf"
    asm = tmp_path / "asm.paf"
    r = "{g}\t{ql}\t{qs}\t{qe}\t+\t{t}\t1000000\t{ts}\t{te}\t{ml}\t{bl}\t60"
    # g1: full single copy in both; g2: full in ref, missing in asm
    ref.write_text("\n".join([
        r.format(g="g1", ql=1000, qs=0, qe=1000, t="chr1", ts=1000,
                 te=2000, ml=1000, bl=1000),
        r.format(g="g2", ql=2000, qs=0, qe=2000, t="chr1", ts=50000,
                 te=52000, ml=2000, bl=2000)]) + "\n")
    asm.write_text(
        r.format(g="g1", ql=1000, qs=0, qe=1000, t="ctg1", ts=100,
                 te=1100, ml=1000, bl=1000) + "\n")
    out = io.StringIO()
    pt.asmgene([str(ref), str(asm)], out=out)
    v = out.getvalue().strip().split("\n")
    assert v[0].startswith("H\tMetric")
    d = {x.split("\t")[1]: x.split("\t")[2:] for x in v[1:]}
    assert d["full_sgl"] == ["2", "1"]
    assert d["part10-"] == ["0", "1"]


def test_asmstat(tmp_path):
    fai = tmp_path / "ref.fai"
    paf = tmp_path / "a.paf"
    fai.write_text("chr1\t900000\n")
    row = ("ctg1\t500000\t{qs}\t{qe}\t+\tchr1\t900000\t{ts}\t{te}"
           "\t{m}\t{b}\t60\ttp:A:P")
    paf.write_text("\n".join([
        row.format(qs=0, qe=200000, ts=0, te=200000, m=200000, b=200000),
        row.format(qs=200000, qe=500000, ts=300000, te=600000, m=300000,
                   b=300000)]) + "\n")
    out = io.StringIO()
    pt.asmstat([str(fai), str(paf)], out=out)
    v = out.getvalue().strip().split("\n")
    d = {x.split("\t")[0]: x.split("\t")[1:] for x in v[1:]}
    assert d["Length"] == ["500000"]
    assert d["l_cov"] == ["500000"]
    assert d["Rcov"] == ["55.56%"]
    assert d["Rdup"] == ["0.00%"]
    assert d["Qcov"] == ["100.00%"]
    assert d["#breaks"] == ["1"]
    assert d["NGA50"] == ["200000"]


def test_exoneval(tmp_path):
    gtf = tmp_path / "anno.gtf"
    sam = tmp_path / "aln.sam"
    gtf.write_text(
        'chr1\tx\texon\t1001\t1200\t.\t+\t.\ttranscript_id "tx1";\n'
        'chr1\tx\texon\t2001\t2300\t.\t+\t.\ttranscript_id "tx1";\n')
    # read with two exons: first matches annotation exactly, second is off
    sam.write_text(
        "@SQ\tSN:chr1\tLN:100000\n"
        "r1\t0\tchr1\t1001\t60\t200M800N300M\t*\t0\t0\t*\t*\n"
        "r2\t0\tchr1\t5001\t60\t100M\t*\t0\t0\t*\t*\n")
    out, err = io.StringIO(), io.StringIO()
    pt.exoneval([str(gtf), str(sam)], out=out, err=err)
    v = out.getvalue()
    assert "# mapped reads: 2" in v
    assert "# predicted exons: 3" in v
    assert "# correct exons: 2 (66.67%)" in v
    assert "# non-overlapping exons: 1" in v
    # base-level Sn/Sp
    out = io.StringIO()
    pt.exoneval(["-s", str(gtf), str(sam)], out=out, err=err)
    v = out.getvalue()
    assert "Base Sn: 500 / 500 = 100.00%" in v
    assert "Base Sp: 500 / 600 = 83.33%" in v


def test_call_overlap_coverage_and_skips(tmp_path):
    """paf_call edge semantics traced from paftools.js:386-520:
    - variants in regions covered by >1 alignment are suppressed (o[3]!=1)
    - R lines segment at overlap boundaries (c1_start=c1_end on overlap)
    - records with s1 but no s2 are skipped entirely
    - tp:A:S (secondary) records are skipped
    - reverse-strand V lines report QSTART from the query END (y=t[3])
    """
    # two overlapping alignments on ctg: [1000,60000) and [40000,100000);
    # a SNP at 20000 (cov 1) and one at 50000 (cov 2, suppressed)
    def paf(q, ql, qs, qe, strand, rs, re_, mapq, cs, extra=""):
        bl = re_ - rs
        return (f"{q}\t{ql}\t{qs}\t{qe}\t{strand}\tctg\t200000\t{rs}\t{re_}"
                f"\t{bl}\t{bl}\t{mapq}\ttp:A:P{extra}\tcs:Z:{cs}")
    l1 = paf("q1", 60000, 0, 59000, "+", 1000, 60000, 60,
             ":19000*ac:39999")
    l2 = paf("q2", 80000, 0, 60000, "-", 40000, 100000, 60,
             ":10000*ga:49999")
    # skipped: s1 without s2; secondary
    l3 = paf("q3", 90000, 0, 60000, "+", 120000, 180000, 60,
             ":30000*tg:29999", extra="\ts1:i:100")
    l4 = paf("q4", 90000, 0, 60000, "+", 120000, 180000, 60,
             ":30000*tg:29999").replace("tp:A:P", "tp:A:S")
    p = tmp_path / "c.paf"
    p.write_text("\n".join([l1, l2, l3, l4]) + "\n")
    out = io.StringIO()
    pt.call(["-l", "10000", "-L", "10000", str(p)], out=out)
    lines = [l.split("\t") for l in out.getvalue().splitlines()]
    vs = [l for l in lines if l[0] == "V"]
    rs = [l for l in lines if l[0] == "R"]
    # cov-1 SNP at 20000 present; cov-2 SNP at 50000 suppressed; nothing
    # from the skipped records (which sit at 120k-180k)
    assert any(v[2] == "20000" and v[6] == "a" and v[7] == "c"
               for v in vs), vs
    assert all(v[2] != "50000" for v in vs if int(v[4]) == 1), vs
    assert not any(v[2] == "150000" for v in vs), vs
    # R lines: cov-1 region [1000,40000) then [60000,100000)
    assert ["R", "ctg", "1000", "40000"] in rs, rs
    assert ["R", "ctg", "60000", "100000"] in rs, rs
    assert len(rs) == 2, rs
    # reverse strand record: query start counts down from y=t[3]; after
    # the 10000-match prefix y=50000 and the '*' op records qs=y-1
    # (paftools.js rev branch: qs = y - 1)
    v2 = [v for v in vs if v[2] == "50000"]
    assert v2 and int(v2[0][4]) == 2        # emitted with coverage 2
    assert v2[0][9] == "49999" and v2[0][11] == "-", v2


def test_liftover_insertion_and_truncation(tmp_path):
    """liftover edge semantics traced from paftools.js:
    - a BED position inside an insertion run lifts to the pre-insertion
      target coordinate x (not x+offset)
    - intervals extending past the aligned query end get the _t3 suffix
      and clamp to t[8]; past the start, _t5 and t[7]
    - reverse-strand BED positions project through flipped coordinates
    """
    # q1: qlen 1000, q[100,900) + vs ctg[5000,5790), cigar 300M10I490M
    paf_lines = [
        "q1\t1000\t100\t900\t+\tctg\t100000\t5000\t5790\t790\t800\t60"
        "\ttp:A:P\tcg:Z:300M10I490M",
        # q2: qlen 600, q[50,550) - strand vs ctg[8000,8500), 500M
        "q2\t600\t50\t550\t-\tctg\t100000\t8000\t8500\t500\t500\t60"
        "\ttp:A:P\tcg:Z:500M",
    ]
    bed_lines = [
        "q1\t350\t360",     # plain: 5250-5260
        "q1\t405\t408",     # inside the I run at y=400..410 -> x=5300
        "q1\t890\t950",     # runs past qe=900 -> _t3, end=5790
        "q2\t100\t110",     # rev: y' in [600-110, 600-100) = [490,500)
    ]
    paf = tmp_path / "lo.paf"
    bed = tmp_path / "lo.bed"
    paf.write_text("\n".join(paf_lines) + "\n")
    bed.write_text("\n".join(bed_lines) + "\n")
    out = io.StringIO()
    pt.liftover(["-l", "100", str(paf), str(bed)], out=out)
    got = {tuple(l.split()[:6]) for l in out.getvalue().splitlines()}
    # q1 350-360: M-projected
    assert ("ctg", "5250", "5260", "q1_350_360", "0", "+") in got, got
    # q1 405-408: both endpoints inside the insertion -> [5300, 5301)
    assert ("ctg", "5300", "5301", "q1_405_408", "0", "+") in got, got
    # q1 890-950: 890 lifts to 5000+300+(890-410)=5780; end truncated
    assert ("ctg", "5780", "5790", "q1_890_950_t3", "0", "+") in got, got
    # q2 rev: a-coords [600-110, 600-100-1]=[490,499]; y starts at
    # t[1]-t[3]=50, x at 8000: lift start=8000+(490-50)=8440, end=8450
    assert ("ctg", "8440", "8450", "q2_100_110", "0", "-") in got, got


def test_misjoin_inversions_and_labels(tmp_path):
    """misjoin inversion classification traced from paftools.js:
    - a '-' segment bracketed by '+' segments is a CLOSED inversion (M,
      consumes the bracket so no extra events are counted)
    - a trailing strand flip is a HANGING inversion (counted, no M)
    - with -e, inter-chr pairs print J (or j when both breakpoints'
      ends are centromeric points)
    """
    row = ("{q}\t{ql}\t{qs}\t{qe}\t{st}\t{t}\t{tl}\t{ts}\t{te}\t{bm}\t{bl}"
           "\t60")
    lines = [
        # ctgI: + / - / + closed inversion on chr1
        row.format(q="ctgI", ql=9000000, qs=0, qe=3000000, st="+",
                   t="chr1", tl=60000000, ts=0, te=3000000,
                   bm=2900000, bl=3000000),
        row.format(q="ctgI", ql=9000000, qs=3000000, qe=5000000, st="-",
                   t="chr1", tl=60000000, ts=3000000, te=5000000,
                   bm=1900000, bl=2000000),
        row.format(q="ctgI", ql=9000000, qs=5000000, qe=8000000, st="+",
                   t="chr1", tl=60000000, ts=5000000, te=8000000,
                   bm=2900000, bl=3000000),
        # ctgH: + then - (hanging inversion)
        row.format(q="ctgH", ql=8000000, qs=0, qe=3000000, st="+",
                   t="chr2", tl=60000000, ts=0, te=3000000,
                   bm=2900000, bl=3000000),
        row.format(q="ctgH", ql=8000000, qs=3000000, qe=6000000, st="-",
                   t="chr2", tl=60000000, ts=3000000, te=6000000,
                   bm=2900000, bl=3000000),
        # ctgJ: inter-chromosomal pair
        row.format(q="ctgJ", ql=8000000, qs=0, qe=3000000, st="+",
                   t="chr3", tl=60000000, ts=0, te=3000000,
                   bm=2900000, bl=3000000),
        row.format(q="ctgJ", ql=8000000, qs=3000000, qe=6000000, st="+",
                   t="chr4", tl=60000000, ts=0, te=3000000,
                   bm=2900000, bl=3000000),
    ]
    paf = tmp_path / "inv.paf"
    paf.write_text("\n".join(lines) + "\n")
    out = io.StringIO()
    pt.misjoin(["-e", str(paf)], out=out)
    v = out.getvalue()
    assert "# candidate inversions in the middle: 1,0" in v
    assert "# candidate inversions at contig ends: 1,0" in v
    assert "# inter-chromosomal misjoins: 1,0" in v
    jlines = [l for l in v.splitlines() if l.startswith("J")]
    assert len(jlines) == 2 and all("ctgJ" in l for l in jlines)
    mlines = [l for l in v.splitlines() if l.startswith("M")]
    assert len(mlines) == 3 and all("ctgI" in l for l in mlines)
    # centromeric breakpoint points -> label j
    cen = tmp_path / "cen.bed"
    cen.write_text("chr3\t2500000\t3500000\nchr4\t0\t500000\n")
    out = io.StringIO()
    pt.misjoin(["-e", "-c", str(cen), "-r", "0.99", str(paf)], out=out)
    v = out.getvalue()
    jl = [l for l in v.splitlines() if l.split("\t")[0] in ("J", "j")]
    assert jl and all(l.startswith("j") for l in jl), v


def test_asmgene_classes(tmp_path):
    """asmgene classification traced from paftools.js: full_dup (>1 full
    copy, D), frag (fragmented but covered, F), part50+ (cov>=0.5),
    part10- (missing, M), and the -a autosome filter on chr[XY]."""
    def row(g, ql, qs, qe, chrom, ts, te, mlen, blen):
        return (f"{g}\t{ql}\t{qs}\t{qe}\t+\t{chrom}\t100000000\t{ts}\t{te}"
                f"\t{mlen}\t{blen}\t60")
    genes = [("gOK", "chr1", 0), ("gDUP", "chr1", 20000),
             ("gFRAG", "chr2", 0), ("gPART", "chr2", 20000),
             ("gMISS", "chr3", 0), ("gX", "chrX", 0)]
    ref_lines = [row(g, 10000, 0, 10000, c, off, off + 10000, 10000, 10000)
                 for g, c, off in genes]
    asm_lines = [
        row("gOK", 10000, 0, 10000, "a1", 0, 10000, 10000, 10000),
        row("gDUP", 10000, 0, 10000, "a1", 50000, 60000, 10000, 10000),
        row("gDUP", 10000, 0, 10000, "a2", 0, 10000, 10000, 10000),
        # fragmented: two non-overlapping halves, full combined coverage
        row("gFRAG", 10000, 0, 5000, "a3", 0, 5000, 5000, 5000),
        row("gFRAG", 10000, 5000, 10000, "a4", 0, 5000, 5000, 5000),
        # partial: 60% of the gene
        row("gPART", 10000, 0, 6000, "a5", 0, 6000, 6000, 6000),
        # gMISS absent entirely; gX maps fine but sits on chrX in ref
        row("gX", 10000, 0, 10000, "a6", 0, 10000, 10000, 10000),
    ]
    ref = tmp_path / "ref.paf"
    asm = tmp_path / "asm.paf"
    ref.write_text("\n".join(ref_lines) + "\n")
    asm.write_text("\n".join(asm_lines) + "\n")
    out = io.StringIO()
    pt.asmgene(["-a", "-e", str(ref), str(asm)], out=out)
    v = out.getvalue()
    rows = {l.split("\t")[1]: l.split("\t") for l in v.splitlines()
            if l.startswith("X\t")}
    asm_col = 2 + 1    # [X, metric, ref, asm]
    assert rows["full_sgl"][3] == "1", v        # gOK only
    assert rows["full_dup"][3] == "1", v        # gDUP
    assert rows["frag"][3] == "1", v            # gFRAG
    assert rows["part50+"][3] == "1", v         # gPART
    assert rows["part10-"][3] == "1", v         # gMISS
    # the chrX gene must not be counted anywhere with -a
    total = sum(int(rows[k][3]) for k in
                ("full_sgl", "full_dup", "frag", "part50+", "part10+",
                 "part10-"))
    assert total == 5, v
    # -e labels
    assert any(l.startswith("D\t") and "gDUP" in l for l in v.splitlines())
    assert any(l.startswith("F\t") and "gFRAG" in l for l in v.splitlines())
    assert any(l.startswith("M\t") and "gMISS" in l for l in v.splitlines())
