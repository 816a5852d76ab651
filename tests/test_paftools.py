"""paftools.py subcommands (port of misc/paftools.js)."""
import io
from contextlib import redirect_stdout

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


def test_call_known_variants(tmp_path):
    """call recovers exact SNP/ins/del planted in an assembly-vs-ref PAF."""
    import numpy as np

    from minimap2_tpu.cli import main as cli_main
    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 60000))
    # plant: SNP at 10000 (ref->C if not C else A), 3bp del at 20000,
    # 2bp ins at 30000
    alt = list(ref)
    snp_ref = alt[10000]
    snp_alt = "C" if snp_ref != "C" else "A"
    alt[10000] = snp_alt
    qry = "".join(alt[:20000]) + "".join(alt[20003:30000]) + "GG" + \
        "".join(alt[30000:])
    fa_r = tmp_path / "r.fa"
    fa_q = tmp_path / "q.fa"
    fa_r.write_text(f">chr1\n{ref}\n")
    fa_q.write_text(f">asm\n{qry}\n")
    paf = tmp_path / "a.paf"
    with open(paf, "w") as f:
        with redirect_stdout(f):
            cli_main(["-cx", "asm5", "--cs", str(fa_r), str(fa_q)])
    out = run(pt.call, ["-l", "1000", "-L", "1000", str(paf)])
    vlines = [l.split("\t") for l in out.splitlines() if l.startswith("V")]
    assert ["V", "chr1", "10000", "10001", "1", "60", snp_ref.lower(),
            snp_alt.lower()] == vlines[0][:8]
    assert any(v[2] == "20000" and v[6] == ref[20000:20003].lower()
               and v[7] == "-" for v in vlines)
    assert any(v[2] == "30000" and v[6] == "-" and v[7] == "gg"
               for v in vlines)
    assert len(vlines) == 3


def test_ov_eval():
    import io as _io
    lines = [
        "r0!c!100!5000!+\t4900\t0\t4000\t+\tr1!c!3000!9000!+\t6000\t0\t4000"
        "\t3000\t4000\t0",
        "r2!c!100!2000!+\t1900\t0\t1000\t+\tr3!c!50000!52000!+\t2000\t0\t1000"
        "\t900\t1000\t0",
    ]
    p = "/tmp/ov_eval_test.paf"
    open(p, "w").write("\n".join(lines) + "\n")
    out = run(pt.ov_eval, [p])
    assert out.startswith("1 / 2 reported overlaps are true (50.00%)")


def test_gff2bed(tmp_path):
    gtf = tmp_path / "a.gtf"
    gtf.write_text(
        'chr1\tx\texon\t1\t100\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; '
        'transcript_type "protein_coding";\n'
        'chr1\tx\texon\t201\t300\t.\t+\t.\tgene_id "g1"; transcript_id '
        '"t1"; transcript_type "protein_coding";\n'
        'chr1\tx\tCDS\t10\t280\t.\t+\t.\tgene_id "g1"; transcript_id '
        '"t1";\n')
    out = run(pt.gff2bed, [str(gtf)])
    f = out.strip().split("\t")
    assert f[:6] == ["chr1", "0", "300", "t1|protein_coding|g1", "1000", "+"]
    assert f[6:9] == ["9", "280", "0,128,255"]
    assert f[9:] == ["2", "100,100,", "0,200,"]
    junc = run(pt.gff2bed, ["-j", str(gtf)]).strip().split("\t")
    assert junc[:4] == ["chr1", "100", "200", "t1|protein_coding|g1"]
