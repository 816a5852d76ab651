"""Concurrency smoke tests: the --batch prefetch/dispatch queue must be
deterministic under load -- output independent of batch size, queue
timing, and repetition (the kthread.c:97-159 ordering guarantee carried
over to the device-queue driver)."""
import io

import numpy as np
import pytest

from minimap2_tpu.config import IndexOptions, MapOptions, mapopt_update, \
    set_opt
from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.parallel.engine import run_batched_cli


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conc")
    rng = np.random.default_rng(5)
    ref = "".join(rng.choice(list("ACGT"), 60000))
    reads = tmp / "reads.fa"
    with open(reads, "w") as f:
        for i in range(48):
            st = int(rng.integers(0, len(ref) - 400))
            seq = ref[st:st + 400]
            if i % 3 == 0:      # revcomp a third of them
                comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
                seq = "".join(comp[c] for c in reversed(seq))
            f.write(f">q{i}\n{seq}\n")
    mi = MiniIndex.build(["c1"], [ref], w=10, k=15)
    io_, mo = IndexOptions(), MapOptions()
    set_opt("map-ont", io_, mo)
    mapopt_update(mo, mi)
    return mi, mo, [str(reads)]


def _run(world, batch_reads):
    mi, mo, queries = world
    out = io.StringIO()
    n = run_batched_cli(mi, mo, queries, out, batch_reads=batch_reads,
                        L=512)
    return n, out.getvalue()


def test_batch_queue_deterministic(world):
    n1, o1 = _run(world, 8)     # 6 batches through the bounded queue
    n2, o2 = _run(world, 8)     # identical rerun (thread-timing jitter)
    n3, o3 = _run(world, 16)    # different batching, same reads
    n4, o4 = _run(world, 48)    # single batch
    assert n1 == n2 == n3 == n4 == 48
    assert o1 == o2, "prefetch-queue output nondeterministic across runs"
    assert o1 == o3, "output depends on batch size"
    assert o1 == o4, "output depends on batching at all"
