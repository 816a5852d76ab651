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
