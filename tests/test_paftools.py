"""paftools.py subcommands (port of misc/paftools.js)."""
import io

from minimap2_tpu.tools import paftools as pt

GOLD = "tests/golden"
DATA = "tests/data"


def run(fn, argv):
    out = io.StringIO()
    rc = fn(argv, out=out)
    assert rc == 0
    return out.getvalue()


def test_sam2paf_matches_paf_golden():
    """sam2paf(mt-sam) core fields == mt-paf golden core fields."""
    out = run(pt.sam2paf, [f"{GOLD}/mt-sam.out"])
    got = [l.split("\t")[:12] for l in out.splitlines()]
    want = [l.split("\t")[:12] for l in open(f"{GOLD}/mt-paf.out")
            if not l.startswith("@")]
    assert got == want


def test_sam2paf_cs_from_md():
    out = run(pt.sam2paf, [f"{GOLD}/mt-sam-eqx.out"])
    line = out.splitlines()[0]
    assert "\tcs:Z:" in line
    cs = [f for f in line.split("\t") if f.startswith("cs:Z:")][0][5:]
    # mt-paf golden's cs for the same alignment
    want = [f for f in open(f"{GOLD}/mt-paf.out").readline().split("\t")
            if f.startswith("cs:Z:")][0][5:].strip()
    assert cs.lower() == want.lower()  # JS emits SAM-case; minimap2 lowercases


def test_stat_paf():
    out = run(pt.stat, [f"{GOLD}/mt-paf.out"])
    lines = dict(l.rsplit(": ", 1) for l in out.splitlines())
    assert lines["Number of mapped sequences"] == "1"
    assert lines["Number of primary alignments"] == "1"
    assert lines["Number of bases in mapped sequences"] == "16499"
    assert lines["Number of mapped bases"] == "16025"
    assert lines["Number of substitutions"] == "2150"


def test_stat_sam_equals_stat_paf():
    a = run(pt.stat, [f"{GOLD}/mt-sam.out"])
    b = run(pt.stat, [f"{GOLD}/mt-paf.out"])
    # identical except qlen-dependent lines are equal here too
    assert a == b


def test_mapeval_paf(tmp_path):
    paf = tmp_path / "sim.paf"
    lines = []
    # 10 pbsim-named reads, 9 mapped correctly at q60, 1 wrong at q30
    for i in range(9):
        st = 1000 * i
        lines.append("\t".join(map(str, [
            f"r{i}!chr1!{st}!{st + 900}!+", 900, 0, 900, "+", "chr1", 99999,
            st + 10, st + 890, 880, 900, 60])))
    lines.append("\t".join(map(str, [
        "r9!chr1!50000!50900!+", 900, 0, 900, "+", "chr2", 99999,
        7, 880, 870, 900, 30])))
    paf.write_text("\n".join(lines) + "\n")
    out = run(pt.mapeval, [str(paf)])
    rows = [l.split("\t") for l in out.splitlines()]
    assert rows[0] == ["Q", "60", "9", "0", "0.000000000", "9"]
    assert rows[1] == ["Q", "30", "1", "1", "0.100000000", "10"]


def test_junceval(tmp_path):
    gtf = tmp_path / "anno.gtf"
    gtf.write_text(
        'chr1\tx\texon\t1\t100\t.\t+\t.\ttranscript_id "t1";\n'
        'chr1\tx\texon\t201\t300\t.\t+\t.\ttranscript_id "t1";\n'
        'chr1\tx\texon\t401\t500\t.\t+\t.\ttranscript_id "t1";\n')
    sam = tmp_path / "aln.sam"
    sam.write_text(
        "@SQ\tSN:chr1\tLN:1000\n"
        # read with two introns: one exact (100-200), one wrong (300-390)
        "r1\t0\tchr1\t51\t60\t50M100N50M90N50M\t*\t0\t0\t*\t*\n"
        # single-exon read
        "r2\t0\tchr1\t1\t60\t100M\t*\t0\t0\t*\t*\n")
    out = run(pt.junceval, [str(gtf), str(sam)])
    d = dict(l.split(": ", 1) for l in out.splitlines())
    assert d["# mapped reads"] == "2"
    assert d["# singletons"] == "1"
    assert d["# predicted introns"] == "2"
    assert d["# correct introns"].startswith("1 ")


def test_view_aln():
    out = run(pt.view, [f"{GOLD}/mt-paf.out"])
    assert out.startswith(">MT_orang")
    assert "Ref+:  " in out and "Qry+:  " in out and "|" in out
