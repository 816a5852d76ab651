"""Native C++ FASTA/FASTQ parser (mm_fastx_scan) vs the Python
line-parser oracle: multiline FASTA, comments, U->T, CRLF, blank lines,
gzip, FASTQ, and chunk-boundary streaming."""
import gzip, io, os, sys

import numpy as np

def test_native_fastx_matches_python(tmp_path):
    # build a mixed torture file: multiline fasta, comments, U bases, CRLF,
    # blank lines, fastq with multi... (fastq seq single-line per spec)
    fa = (">r1 first comment\nACGU\nuGGA\n\n"
          ">r2\r\nACGTACGTACGT\r\nTTTT\r\n"
          "@q1 c2\nACGTN\n+\nIIIII\n"
          "@q2\nGGGGGGGG\n+anything\nJJJJJJJJ\n"
          ">last\nA\n")
    paths = []
    (tmp_path / "t1.fa").write_text(fa)
    with gzip.open(str(tmp_path / "t1.fa.gz"), "wt") as f:
        f.write(fa)
    from minimap2_tpu.io.fastx import FastxReader
    def read_all(path, force_py=False):
        rd = FastxReader(path)
        if force_py:
            rd._native = None
        out = []
        while True:
            r = rd.read1()
            if r is None:
                break
            out.append((r.name, r.seq, r.qual, r.comment))
        rd.close()
        return out
    for p in (str(tmp_path / "t1.fa"), str(tmp_path / "t1.fa.gz")):
        a = read_all(p, force_py=False)
        b = read_all(p, force_py=True)
        assert a == b, (p, a, b)
        assert a[0] == ("r1", b"ACGTtGGA", None, "first comment"), a[0]
        assert a[2][1] == b"ACGTN" and a[2][2] == b"IIIII"
    # chunk-boundary torture: tiny chunk size
    rd = FastxReader(str(tmp_path / "t1.fa"))
    rd._CHUNK = 7
    out = []
    while True:
        r = rd.read1()
        if r is None: break
        out.append((r.name, r.seq, r.qual, r.comment))
    assert out == read_all(str(tmp_path / "t1.fa"), force_py=True), out
