"""Batched device base-level alignment for the --batch path.

The host parity path aligns per chain segment (left ext / gap fill /
right ext, align.c:645-914).  This device path instead runs ONE banded
global alignment over each read's best-chain extent on the extd2 v2
Pallas kernel and walks the CIGAR back on device (traceback_pallas), so
the O(read x band) direction matrix never crosses the host link.  It is
the throughput CIGAR engine: statistically gated (identity/coverage vs
the parity path) rather than byte-exact -- chain-internal zdrop splits
and end extensions are approximated by the global band.

Reads whose chain extent exceeds the compiled capacity (or whose
query/target length gap exceeds the band) fall back to the host path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..map.hit import Extra, Reg
from ..utils.intfloat import SEQ_NT4
from .batch import BatchParams
from .engine import _mapq

_COMP4 = np.array([3, 2, 1, 0, 4], np.uint8)


@functools.partial(jax.jit, static_argnames=(
    "G", "W", "RB", "R", "QP", "TP", "q", "e", "q2", "e2", "w",
    "sc_mch", "sc_mis", "interpret"))
def _align_step(qr, sf, lens, *, G, W, RB, R, QP, TP, q, e, q2, e2, w,
                sc_mch, sc_mis, interpret=False):
    from ..ops.extend_pallas2 import extd2_batch2
    from ..ops.traceback_pallas import traceback_batch
    p, ez = extd2_batch2(qr, sf, lens, G=G, W=W, RB=RB, R=R, QP=QP, TP=TP,
                         q=q, e=e, q2=q2, e2=e2, w=w, zdrop=-1,
                         right_mode=False, approx_max=True,
                         approx_drop=False, sc_mch=sc_mch, sc_mis=sc_mis,
                         sc_N=0, with_cigar=True, interpret=interpret)
    ops, fin = traceback_batch(p, lens, G=G, W=W, RB=RB, R=R, w=w,
                               interpret=interpret)
    return ops, fin


class AlignBatcher:
    """Aligns (read, best-chain) jobs in fixed-shape device sub-batches."""

    def __init__(self, mi, opt, *, QP=12800, TP=12800, G=16, W=640, RB=128,
                 sub=64):
        self.mi = mi
        self.opt = opt
        self.QP, self.TP = QP, TP
        self.G, self.W, self.RB = G, W, RB
        self.sub = sub
        self.w = min(opt.bw, W - 48)
        self.R = (QP + TP + RB - 1) // RB * RB
        # host nt4 reference codes for target slicing
        self.S = np.asarray(mi.S, np.uint8)
        self.seq_off = np.array([s.offset for s in mi.seq] or [0], np.int64)
        self.interpret = jax.default_backend() != "tpu"

    def fits(self, qlen_seg: int, tlen_seg: int) -> bool:
        return (0 < qlen_seg <= self.QP and 0 < tlen_seg <= self.TP
                and abs(qlen_seg - tlen_seg) <= self.w - 48)

    def dispatch(self, chunk):
        """Enqueue one sub-batch of (qseg, rid, rs, re) jobs; returns an
        async (ops, fin) device future pair."""
        qr = np.zeros((self.sub, self.QP), np.uint8)
        sf = np.zeros((self.sub, self.TP), np.uint8)
        lens = np.ones((self.sub, 2), np.int32)
        for i, (qseg, rid, rs, re_) in enumerate(chunk):
            qr[i, :len(qseg)] = qseg[::-1]
            off = int(self.seq_off[rid])
            tseg = self.S[off + rs:off + re_]
            sf[i, :len(tseg)] = tseg
            lens[i] = (len(qseg), len(tseg))
        return _align_step(
            jnp.asarray(qr), jnp.asarray(sf), jnp.asarray(lens),
            G=self.G, W=self.W, RB=self.RB, R=self.R, QP=self.QP,
            TP=self.TP, q=self.opt.q, e=self.opt.e, q2=self.opt.q2,
            e2=self.opt.e2, w=self.w, sc_mch=self.opt.a,
            sc_mis=-abs(self.opt.b), interpret=self.interpret)

    def collect(self, fut, n):
        """Fetch a dispatched sub-batch and decode its n cigars."""
        from ..ops.traceback_pallas import decode_ops
        ops, fin = fut
        ops = np.asarray(ops)
        fin = np.asarray(fin)
        return [decode_ops(ops[i], int(fin[i, 0]), int(fin[i, 1]))
                for i in range(n)]

    def align_jobs(self, jobs):
        """jobs: list of (qseg u8 codes, rid, rs, re).  Returns a list of
        cigars (len<<4|op ints), one per job, in order.  Sub-batches are
        double-buffered: the next dispatch overlaps the previous fetch."""
        out = []
        inflight = []
        for lo in range(0, len(jobs), self.sub):
            chunk = jobs[lo:lo + self.sub]
            inflight.append((len(chunk), self.dispatch(chunk)))
            while len(inflight) > 1:
                n, fut = inflight.pop(0)
                out.extend(self.collect(fut, n))
        while inflight:
            n, fut = inflight.pop(0)
            out.extend(self.collect(fut, n))
        return out


def build_reg(mi, opt, mat, qlen, qseg, rec, cigar, rep_len, reg_id=0,
              parent=None):
    """Chain record + device cigar -> a Reg the SAM/PAF writers accept.

    rec: dict with keys sc, sub, cnt, rev, rid, qs, qe, rs, re in STRAND
    coordinates (qs/qe on the aligned strand).  parent != reg_id marks a
    secondary of that parent chain (tp:A:S, SAM 0x100, mapq 0);
    parent == reg_id > 0 is a split-read supplementary primary."""
    from .. import native
    r = Reg()
    r.id = reg_id
    r.parent = reg_id if parent is None else parent
    sec = r.parent != r.id
    r.rid = int(rec["rid"])
    r.rev = bool(rec["rev"])
    r.cnt = int(rec["cnt"])
    r.qs, r.qe = int(rec["qs"]), int(rec["qe"])
    r.rs, r.re = int(rec["rs"]), int(rec["re"])
    if r.rev:       # back to read coordinates (hit.c:23-38)
        r.qs, r.qe = qlen - int(rec["qe"]), qlen - int(rec["qs"])
    r.score = int(rec["sc"])
    r.mapq = (0 if sec else
              _mapq(int(rec["sc"]), int(rec["sub"]), int(rec["cnt"]),
                    opt.min_chain_score))
    r.sam_pri = reg_id == 0
    p = Extra()
    p.cigar = list(cigar)
    tseg = np.asarray(mi.S, np.uint8)[
        mi.seq[r.rid].offset + int(rec["rs"]):
        mi.seq[r.rid].offset + int(rec["re"])]
    if native.available():
        blen, mlen, n_ambi, dp_max, _ = native.update_extra_scan(
            qseg, tseg, p.cigar, mat, 5, opt.q, opt.e, False)
        r.blen, r.mlen, p.n_ambi = blen, mlen, n_ambi
        p.dp_max = p.dp_max0 = p.dp_score = dp_max
    else:
        r.blen = max(r.qe - r.qs, r.re - r.rs)
        r.mlen = min(r.qe - r.qs, r.re - r.rs)
        p.dp_max = p.dp_max0 = p.dp_score = r.score
    r.p = p
    r.div = -1.0
    return r


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP4[codes[::-1]]
