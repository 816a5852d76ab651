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
