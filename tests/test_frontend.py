"""Front-end parity tests: sketch, index, seeds, chaining, PAF (no CIGAR)."""
import numpy as np
import pytest

import refbind
from minimap2_tpu.config import IndexOptions, MapOptions, mapopt_update, set_opt
from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.index.sketch import sketch, sketch_ref
from minimap2_tpu.io.fastx import read_fasta
from minimap2_tpu.io.format import write_paf
from minimap2_tpu.map.pipeline import map_frag_core
from minimap2_tpu.map.seed import collect_seed_hits, seed_mz_flt
from minimap2_tpu.utils.intfloat import SEQ_NT4

DATA = "tests/data"
GOLD = "tests/golden"


def _build_mt():
    tn, ts = read_fasta(f"{DATA}/MT-human.fa")
    mi = MiniIndex.build(tn, ts, w=10, k=15)
    mo = MapOptions()
    mapopt_update(mo, mi)
    return mi, mo


@pytest.mark.skipif(not refbind.available(), reason="reference .so not built")
def test_sketch_bit_exact_vs_reference_c():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(40, 800))
        bases = rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        seq = bytes(bases.tolist())
        for (w, k, hpc) in [(10, 15, False), (5, 19, True), (4, 14, False), (11, 21, False)]:
            rx, ry = refbind.ref_sketch(seq, w, k, 0, hpc)
            vx, vy = sketch(SEQ_NT4[np.frombuffer(seq, np.uint8)], w, k, 0, hpc)
            assert np.array_equal(rx, vx) and np.array_equal(ry, vy)


def test_sketch_vectorized_equals_oracle():
    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(50, 400))
        seq = bytes(rng.choice(list(b"ACGTN"), size=n).tolist())
        for (w, k, hpc) in [(10, 15, False), (5, 19, True)]:
            ox, oy = sketch_ref(seq, w, k, 0, hpc)
            vx, vy = sketch(SEQ_NT4[np.frombuffer(seq, np.uint8)], w, k, 0, hpc)
            assert np.array_equal(ox, vx) and np.array_equal(oy, vy)


def test_mid_occ_matches_reference():
    mi, mo = _build_mt()
    assert mo.mid_occ == 10  # [M::mm_mapopt_update] mid_occ = 10 in golden


def test_anchors_match_print_seeds_golden():
    mi, mo = _build_mt()
    qn, qs = read_fasta(f"{DATA}/MT-orang.fa")
    mx, my = sketch(SEQ_NT4[np.frombuffer(qs[0], np.uint8)], mi.w, mi.k, 0, False)
    mx, my = seed_mz_flt(mx, my, mo.mid_occ, mo.q_occ_frac)
    ax, ay, rep_len, _ = collect_seed_hits(mi, mo, mo.mid_occ, mx, my, len(qs[0]), qn[0])
    lines = [f"RS\t{rep_len}"]
    for i in range(len(ax)):
        x, y = int(ax[i]), int(ay[i])
        rid = (x << 1 & 0xFFFFFFFFFFFFFFFF) >> 33
        gd = 0 if i == 0 else int(
            (np.int32(y & 0xFFFFFFFF) - np.int32(int(ay[i - 1]) & 0xFFFFFFFF))
            - (np.int32(x & 0xFFFFFFFF) - np.int32(int(ax[i - 1]) & 0xFFFFFFFF)))
        lines.append(f"SD\t{mi.seq[rid].name}\t{np.int32(x & 0xFFFFFFFF)}\t"
                     f"{'+-'[x >> 63]}\t{np.int32(y & 0xFFFFFFFF)}\t{(y >> 32) & 0xFF}\t{gd}")
    golden = [l for l in open(f"{GOLD}/mt-seeds.err").read().splitlines()
              if l.startswith(("SD", "RS"))]
    assert lines == golden


def test_chains_match_print_chains_golden():
    mi, mo = _build_mt()
    qn, qs = read_fasta(f"{DATA}/MT-orang.fa")
    res = map_frag_core(mi, [qs[0]], mo, qn[0])[0]
    ax, ay = res.ax, res.ay
    lines = []
    for j, r in enumerate(res.regs):
        for i in range(r.as_, r.as_ + r.cnt):
            x, y = int(ax[i]), int(ay[i])
            rid = (x << 1 & 0xFFFFFFFFFFFFFFFF) >> 33
            gd = 0 if i == r.as_ else int(
                (np.int32(y & 0xFFFFFFFF) - np.int32(int(ay[i - 1]) & 0xFFFFFFFF))
                - (np.int32(x & 0xFFFFFFFF) - np.int32(int(ax[i - 1]) & 0xFFFFFFFF)))
            lines.append(f"CN\t{j}\t{mi.seq[rid].name}\t{np.int32(x & 0xFFFFFFFF)}\t"
                         f"{'+-'[x >> 63]}\t{np.int32(y & 0xFFFFFFFF)}\t{(y >> 32) & 0xFF}\t{gd}")
    golden = [l for l in open(f"{GOLD}/mt-chains.err").read().splitlines()
              if l.startswith("CN")]
    assert lines == golden


def test_paf_no_cigar_matches_golden():
    mi, mo = _build_mt()
    qn, qs = read_fasta(f"{DATA}/MT-orang.fa")
    res = map_frag_core(mi, [qs[0]], mo, qn[0])[0]
    assert len(res.regs) == 1
    line = write_paf(mi, qn[0], len(qs[0]), res.regs[0], mo.flag, res.rep_len)
    golden = open(f"{GOLD}/mt-nocig.out").read().strip()
    assert line == golden


def test_presets_match_options_c():
    io, mo = IndexOptions(), MapOptions()
    assert set_opt("splice", io, mo) == 0
    assert (io.k, io.w, mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2) == (15, 5, 1, 2, 2, 1, 32, 0)
    assert mo.noncan == 9 and mo.bw == 200000
    io, mo = IndexOptions(), MapOptions()
    assert set_opt("sr", io, mo) == 0
    assert (io.k, io.w, mo.mid_occ, mo.max_occ) == (21, 11, 1000, 5000)
    assert set_opt("nope", IndexOptions(), MapOptions()) == -1
