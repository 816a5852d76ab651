"""End-to-end CLI golden parity tests (byte equality with the reference binary).

Each case mirrors an invocation in tests/make_goldens.sh. The MT cases take
~10-60s each through the NumPy oracle kernels, so the slowest are marked slow.
"""
import io
import sys
from contextlib import redirect_stdout

import pytest

from minimap2_tpu.cli import main as cli_main

GOLD = "tests/golden"
DATA = "tests/data"


def run_cli(args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args)
    assert rc == 0
    return buf.getvalue()


def check(args, golden):
    out = run_cli(args)
    want = open(f"{GOLD}/{golden}").read()
    assert out == want


def test_t2_inv_paf():
    check(["-c", "--cs", f"{DATA}/t-inv.fa", f"{DATA}/q-inv.fa"], "inv-paf.out")


def test_t2_inv_sam():
    check(["-a", f"{DATA}/t-inv.fa", f"{DATA}/q-inv.fa"], "inv-sam.out")


@pytest.mark.slow
def test_mt_paf_cs():
    check(["-c", "--cs", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-paf.out")


@pytest.mark.slow
def test_mt_sam():
    check(["-a", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-sam.out")


@pytest.mark.slow
def test_mt_sam_eqx_md():
    check(["-a", "--eqx", "--MD", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"],
          "mt-sam-eqx.out")


@pytest.mark.slow
def test_mt_asm20_rmq():
    check(["-cx", "asm20", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-asm.out")


def test_x3s_splice_sam():
    check(["-ax", "splice", f"{DATA}/x3s-ref.fa", f"{DATA}/x3s-qry.fa"],
          "x3s-splice-sam.out")


def test_x3s_splice_paf_cs():
    check(["-cx", "splice", "--cs", f"{DATA}/x3s-ref.fa", f"{DATA}/x3s-qry.fa"],
          "x3s-splice-paf.out")


def test_t2_splice_paf():
    check(["-cx", "splice", "-k14", "-w4", "-m10", "-s10",
           f"{DATA}/t2.fa", f"{DATA}/q2.fa"], "t2-paf.out")


def test_t2_splice_sam():
    check(["-ax", "splice", "-k14", "-w4", "-m10", "-s10",
           f"{DATA}/t2.fa", f"{DATA}/q2.fa"], "t2-sam.out")


@pytest.mark.slow
def test_sr_paired_sam():
    check(["-ax", "sr", f"{DATA}/MT-human.fa", f"{DATA}/sr-r1.fq",
           f"{DATA}/sr-r2.fq"], "sr-sam.out")


def test_sr_paired_paf():
    check(["-x", "sr", f"{DATA}/MT-human.fa", f"{DATA}/sr-r1.fq",
           f"{DATA}/sr-r2.fq"], "sr-paf.out")


def test_x3s_junc_bed():
    check(["-ax", "splice", "--junc-bed", f"{DATA}/x3s-junc.bed",
           f"{DATA}/x3s-ref.fa", f"{DATA}/x3s-qry.fa"], "x3s-juncbed.out")


def test_x3s_spsc():
    check(["-ax", "splice", "--spsc", f"{DATA}/x3s.spsc",
           f"{DATA}/x3s-ref.fa", f"{DATA}/x3s-qry.fa"], "x3s-spsc.out")


@pytest.mark.slow
def test_mt_map_hifi():
    check(["-cx", "map-hifi", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"],
          "mt-hifi.out")


@pytest.mark.slow
def test_mt_map_pb_hpc():
    check(["-cx", "map-pb", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"],
          "mt-pb.out")


def test_x3s_jump_rescue():
    check(["-ax", "splice:sr", "-j", f"{DATA}/x3s-anno.bed",
           f"{DATA}/x3s-ref.fa", f"{DATA}/jumpreads.fa"], "x3s-jump.out")


def test_x3s_write_junc():
    check(["-cx", "splice", "--write-junc", f"{DATA}/x3s-ref.fa",
           f"{DATA}/x3s-qry.fa"], "x3s-wj.out")


def test_x3s_sr_rna():
    check(["-ax", "splice:sr", f"{DATA}/x3s-ref.fa",
           f"{DATA}/jumpreads.fa"], "x3s-srrna.out")


def test_mt_alt_contigs():
    check(["-c", "--alt", f"{DATA}/alt.txt", f"{DATA}/MT-both.fa",
           f"{DATA}/MT-orang.fa"], "mt-alt.out")


def test_mt_multipart_split_merge():
    check(["-c", "-I", "10k", f"{DATA}/MT-both.fa", f"{DATA}/MT-orang.fa"],
          "mt-split.out")


@pytest.mark.slow
def test_mt_dust():
    check(["-c", "-T20", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"],
          "mt-dust.out")


def test_mt_ava_ont():
    check(["-x", "ava-ont", f"{DATA}/MT-both.fa", f"{DATA}/MT-both.fa"], "mt-ava.out")


def test_mt_nocig():
    check([f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-nocig.out")


def run_cli_stderr(args):
    import contextlib
    buf, err = io.StringIO(), io.StringIO()
    with redirect_stdout(buf), contextlib.redirect_stderr(err):
        rc = cli_main(args)
    assert rc == 0
    return err.getvalue()


def test_print_seeds_golden():
    err = run_cli_stderr(["-t1", "--print-seeds", f"{DATA}/MT-human.fa",
                          f"{DATA}/MT-orang.fa"])
    got = [l for l in err.splitlines() if l[:3] in ("SD\t", "RS\t")]
    want = [l for l in open(f"{GOLD}/mt-seeds.err").read().splitlines()
            if l[:3] in ("SD\t", "RS\t")]
    assert got == want


def test_print_chains_golden():
    err = run_cli_stderr(["-t1", "--print-chains", f"{DATA}/MT-human.fa",
                          f"{DATA}/MT-orang.fa"])
    got = [l for l in err.splitlines() if l.startswith("CN\t")]
    want = [l for l in open(f"{GOLD}/mt-chains.err").read().splitlines()
            if l.startswith("CN\t")]
    assert got == want


def test_print_aln_seq_golden():
    # align.c:339-346, 361-367; QM/QT lines are kalloc/time-dependent and
    # excluded from the byte comparison
    err = run_cli_stderr(["-a", "--print-aln-seq", f"{DATA}/MT-human.fa",
                          f"{DATA}/MT-orang.fa"])
    drop = ("[M::", "QM\t", "QT\t")
    got = [l for l in err.splitlines() if not l.startswith(drop)]
    want = [l for l in open(f"{GOLD}/mt-alnseq.err").read().splitlines()
            if not l.startswith(drop)]
    assert got == want


def test_dbg_seed_occ_golden():
    # seed.c:115-116 SF lines
    err = run_cli_stderr(["--dbg-seed-occ", f"{DATA}/MT-human.fa",
                          f"{DATA}/MT-orang.fa"])
    got = [l for l in err.splitlines() if l.startswith("SF\t")]
    want = [l for l in open(f"{GOLD}/mt-seedocc.err").read().splitlines()
            if l.startswith("SF\t")]
    assert got == want


def test_long_cigar_cg_tag():
    # format.c:524,577-590: with -L and >65535 ops the CIGAR column becomes
    # <slen>S<reflen>N and the real CIGAR moves to CG:B:I (unit-level: the
    # reference needs a >8Mbp alignment to trigger this, so the structure is
    # checked against the C logic rather than a golden)
    from minimap2_tpu.config import MM_F_LONG_CIGAR
    from minimap2_tpu.io.format import write_sam
    from minimap2_tpu.io.fastx import SeqRecord
    from minimap2_tpu.map.hit import Extra, Reg
    from minimap2_tpu.index.index import MiniIndex

    n_ops = 70000
    qlen = n_ops * 2 - (n_ops // 2)
    mi = MiniIndex.build(["ctg"], [b"ACGT" * 60000], w=10, k=15)
    r = Reg()
    r.id = r.parent = 0
    r.rid = 0
    r.rev = 0
    r.qs, r.qe = 5, qlen
    r.rs, r.re = 0, n_ops * 2 - n_ops // 2 - 5
    r.mapq = 60
    r.score = 100
    r.blen = r.mlen = qlen
    r.sam_pri = True
    p = Extra()
    # alternating 2M1I -> n_ops ops, none mergeable
    p.cigar = [(2 << 4) | 0 if i % 2 == 0 else (1 << 4) | 1
               for i in range(n_ops)]
    r.p = p
    rec = SeqRecord(name="lr", seq=b"A" * qlen, qual=None, comment=None)
    line = write_sam(mi, rec, 0, 0, 1, [1], [[r]], MM_F_LONG_CIGAR, 0)
    fields = line.split("\t")
    assert fields[5] == f"{qlen}S{r.re - r.rs}N"
    cg = [f for f in fields if f.startswith("CG:B:I")]
    assert len(cg) == 1
    ops = cg[0][len("CG:B:I,"):].split(",")
    assert len(ops) == n_ops + 1            # + leading 5S clip entry
    assert int(ops[0]) == (5 << 4) | 4      # 5S encoded soft clip
    assert int(ops[1]) == p.cigar[0]
    line2 = write_sam(mi, rec, 0, 0, 1, [1], [[r]], 0, 0)
    assert "CG:B:I" not in line2            # without -L: plain giant CIGAR


# --- round 4: option-wiring goldens (main.c:166-351 long options + -o) ---

def test_opt_chain_gap_scale():
    check(["--chain-gap-scale", "3.0", "--chain-skip-scale", "1.0",
           f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-gapscale.out")


def test_opt_seed():
    check(["--seed", "42", "-c", f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"],
          "mt-seed.out")


@pytest.mark.slow
def test_opt_min_dp_len():
    check(["--min-dp-len", "1000", "-c", f"{DATA}/MT-human.fa",
           f"{DATA}/MT-orang.fa"], "mt-dplen.out")


def test_opt_misc_chain_tuning():
    # --max-chain-skip/--max-chain-iter/--mask-len/--heap-sort/--rmq=no
    # happen to leave MT output unchanged vs defaults; the golden proves
    # they parse and do not corrupt the pipeline (main.c:221-222,251,297,301)
    check(["--max-chain-skip", "1", "--max-chain-iter", "20",
           "--mask-len", "500", "--heap-sort=yes", "--rmq=no",
           f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"], "mt-optmisc.out")


def test_opt_end_bonus():
    check(["--end-bonus", "50", "-a", f"{DATA}/t-inv.fa", f"{DATA}/q-inv.fa"],
          "inv-endbonus.out")


def test_opt_output_file(tmp_path):
    # -o FILE == stdout redirection (main.c:208-215)
    out = run_cli(["-c", f"{DATA}/t-inv.fa", f"{DATA}/q-inv.fa"])
    p = tmp_path / "o.paf"
    rc = cli_main(["-c", "-o", str(p), f"{DATA}/t-inv.fa", f"{DATA}/q-inv.fa"])
    assert rc == 0
    assert p.read_text() == out


def test_opt_long_aliases():
    """The 9 long-form aliases of short flags (main.c:24-100) parse and
    act identically to their short forms (r04 verdict weak #7)."""
    num = ["--min-chain-score", "30", "--mask-level", "0.6",
           "--min-count", "4", "--min-dp-score", "90",
           "--mb-size", "400M", "--cost-non-gt-ag", "5"]
    srt = ["-m", "30", "-M", "0.6", "-n", "4", "-s", "90",
           "-K", "400M", "-C", "5"]
    tgt = [f"{DATA}/MT-human.fa", f"{DATA}/MT-orang.fa"]
    assert run_cli(num + ["-c"] + tgt) == run_cli(srt + ["-c"] + tgt)
    flg = ["--no-self", "--all-chain", "--max-intron-len", "50k"]
    sfl = ["-D", "-P", "-G", "50k"]
    assert run_cli(flg + tgt) == run_cli(sfl + tgt)
    # the alias output actually RESPONDS to the value (not warn-ignored)
    assert run_cli(["--min-chain-score", "3000"] + tgt) \
        != run_cli(["--min-chain-score", "30"] + tgt)
