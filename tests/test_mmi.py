"""Binary MMI format (index.c:475-569 compatibility)."""
import os
import subprocess

import numpy as np
import pytest

from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.index.mmi import dump_mmi, load_mmi, pack_seq4, unpack_seq4

REF_BIN = os.environ.get("MM2_REF_BIN", "/tmp/mm2build/minimap2")


def _mt_index():
    from minimap2_tpu.io.fastx import read_fasta
    names, seqs = read_fasta("tests/data/MT-human.fa")
    return MiniIndex.build(names, seqs, w=10, k=15)


def test_seq4_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 5, 1001).astype(np.uint8)
    assert np.array_equal(unpack_seq4(pack_seq4(codes), len(codes)), codes)


def test_mmi_roundtrip(tmp_path):
    mi = _mt_index()
    p = str(tmp_path / "mt.mmi")
    dump_mmi(mi, p)
    mi2 = load_mmi(p)
    assert (mi2.w, mi2.k, mi2.b, mi2.flag) == (mi.w, mi.k, mi.b, mi.flag)
    assert [(s.name, s.length) for s in mi2.seq] == \
        [(s.name, s.length) for s in mi.seq]
    np.testing.assert_array_equal(mi2.keys, mi.keys)
    np.testing.assert_array_equal(mi2.starts, mi.starts)
    np.testing.assert_array_equal(mi2.pos, mi.pos)
    np.testing.assert_array_equal(mi2.S, mi.S)


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference binary")
def test_reference_mmi_interop(tmp_path):
    """Our loader reads the reference's MMI and vice versa, identically."""
    ref_mmi = str(tmp_path / "ref.mmi")
    subprocess.run([REF_BIN, "-d", ref_mmi, "tests/data/MT-human.fa"],
                   check=True, capture_output=True)
    mi_ref = load_mmi(ref_mmi)
    mi = _mt_index()
    np.testing.assert_array_equal(mi_ref.keys, mi.keys)
    np.testing.assert_array_equal(mi_ref.pos, mi.pos)
    np.testing.assert_array_equal(mi_ref.S, mi.S)
    # reference binary maps identically from our dumped index
    ours_mmi = str(tmp_path / "ours.mmi")
    dump_mmi(mi, ours_mmi)
    a = subprocess.run([REF_BIN, "-a", ours_mmi, "tests/data/MT-orang.fa"],
                       check=True, capture_output=True).stdout
    b = subprocess.run([REF_BIN, "-a", "tests/data/MT-human.fa",
                        "tests/data/MT-orang.fa"],
                       check=True, capture_output=True).stdout
    strip = lambda s: b"\n".join(l for l in s.splitlines()  # noqa: E731
                                 if not l.startswith(b"@PG"))
    assert strip(a) == strip(b)
