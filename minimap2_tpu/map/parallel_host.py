"""Multi-worker host mapping: the kt_for/kt_pipeline analogue (-t).

The reference maps fragments with `kt_for` worker threads inside a
3-step ordered pipeline (kthread.c:54-159, map.c:541-641). Python
threads cannot parallelize the mapping inner loop, so fragments are
fanned out to spawned worker processes instead: the index and options
are shipped once per worker through the pool initializer, each worker
maps + formats a chunk of fragments, and `imap` preserves input order
exactly like the pipeline's ordered step-2 write.

Spawn (not fork) is mandatory here: JAX initializes worker threads at
interpreter start on this platform, and forking a multithreaded process
deadlocks (CPython emits DeprecationWarnings for exactly this case).
"""
from __future__ import annotations

import io
import sys

from .driver import iter_fragments, map_fragment, write_fragment

_G: tuple | None = None     # (mi, mo) installed by the pool initializer


def _init_worker(mi, mo):
    global _G
    _G = (mi, mo)


def _work_chunk(frags):
    mi, mo = _G
    buf = io.StringIO()
    n = 0
    for frag in frags:
        results = map_fragment(mi, mo, frag)
        write_fragment(buf, mi, mo, frag, [res.regs for res in results],
                       [res.rep_len for res in results])
        n += len(frag)
    return n, buf.getvalue()


def run_parallel(mi, mo, queries, out, frag_mode: bool, n_threads: int,
                 chunk_frags: int = 16) -> int:
    """Map all fragments with a spawn pool; returns #reads mapped."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")

    def chunks():
        cur = []
        for frag in iter_fragments(queries, frag_mode):
            cur.append(frag)
            if len(cur) >= chunk_frags:
                yield cur
                cur = []
        if cur:
            yield cur

    n_mapped = 0
    with ctx.Pool(n_threads, initializer=_init_worker,
                  initargs=(mi, mo)) as pool:
        for n, txt in pool.imap(_work_chunk, chunks()):
            out.write(txt)
            n_mapped += n
    return n_mapped
