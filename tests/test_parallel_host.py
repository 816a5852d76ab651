"""Fork-pool host mapping (-t) must be byte-identical to the serial path."""
import io
import sys

import pytest

from minimap2_tpu.config import IndexOptions, MapOptions, set_opt, \
    mapopt_update
from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.map.driver import iter_fragments, map_fragment, \
    write_fragment
from minimap2_tpu.map.parallel_host import run_parallel

pytestmark = pytest.mark.skipif(not sys.platform.startswith("linux"),
                                reason="fork pool is linux-only")


def _build(tmp_path):
    import numpy as np
    rng = np.random.default_rng(0)
    ref = "".join(rng.choice(list("ACGT"), 200000))
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(40):
            st = int(rng.integers(0, len(ref) - 3000))
            f.write(f">q{i}\n{ref[st:st + 3000]}\n")
    mi = MiniIndex.build(["c1"], [ref], w=10, k=15)
    io_, mo = IndexOptions(), MapOptions()
    set_opt("map-ont", io_, mo)
    mo.flag |= 0x4        # MM_F_CIGAR
    mapopt_update(mo, mi)
    return mi, mo, [str(reads)]


def test_pool_matches_serial(tmp_path):
    mi, mo, queries = _build(tmp_path)
    ser = io.StringIO()
    n_ser = 0
    for frag in iter_fragments(queries, False):
        results = map_fragment(mi, mo, frag)
        write_fragment(ser, mi, mo, frag, [r.regs for r in results],
                       [r.rep_len for r in results])
        n_ser += len(frag)
    par = io.StringIO()
    n_par = run_parallel(mi, mo, queries, par, False, 3, chunk_frags=4)
    assert n_par == n_ser
    assert par.getvalue() == ser.getvalue()
