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


@jax.jit
def _ops_extent(ops):
    """1 + the last nonzero column of the sparse traceback ops plane --
    computed ON DEVICE so only the populated prefix crosses the slow
    download link (the full (sub, R) buffer is ~6 MB per sub-batch and
    made the -c path fetch-bound)."""
    R = ops.shape[1]
    col = jnp.arange(R, dtype=jnp.int32)[None, :]
    return jnp.max(jnp.where(ops != 0, col, 0)) + 1


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

    def __init__(self, mi, opt, *, QP=12800, TP=12800, G=32, W=640, RB=64,
                 sub=64):
        self.mi = mi
        self.opt = opt
        self.QP, self.TP = QP, TP
        self.G, self.W, self.RB = G, W, RB
        self.sub = sub
        # chunk-uniform window: band + 48 + <= RB/2 drift must fit in W
        drift = -(-(RB // 2) // 16) * 16
        self.w = min(opt.bw, W - 48 - drift)
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
        """Fetch a dispatched sub-batch and decode its n cigars.

        fin comes back first (tiny) so the ops plane can be sliced to
        the actual max op count before crossing the host link -- the
        axon download path runs at ~1-10 MB/s, and the full (sub, R)
        ops buffer was ~6 MB per sub-batch (the -c path's wall-time
        was fetch-bound, not DP-bound)."""
        from ..ops.traceback_pallas import decode_ops
        ops, fin = fut
        fin = np.asarray(fin)
        mx = int(_ops_extent(ops))
        ops = np.asarray(ops[:, :max(mx, 1)])
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


class SpliceAlignBatcher:
    """Splice-aware device alignment for --batch -x splice: per job the
    exts2 Pallas kernel runs the TWO-ROUND transcript-strand trial
    (mm_align_skeleton align.c:1068-1096: once with SPLICE_FOR
    donor/acceptor arrays, once with SPLICE_REV) and the higher-scoring
    round's device CIGAR (with N introns) wins."""

    def __init__(self, mi, opt, mat=None, *, QP=2048, TP=8192, G=8,
                 RB=64, sub=32):
        from ..config import MM_F_SPLICE_OLD
        self.mat = mat
        self.mi = mi
        self.opt = opt
        self.QP, self.TP = QP, TP
        self.G, self.RB, self.sub = G, RB, sub
        self.W = (QP + 32 + 127) // 128 * 128
        self.R = (QP + TP + RB - 1) // RB * RB
        self.S = np.asarray(mi.S, np.uint8)
        self.seq_off = np.array([s.offset for s in mi.seq] or [0], np.int64)
        self.interpret = jax.default_backend() != "tpu"
        self.cmplx = not (opt.flag & MM_F_SPLICE_OLD)
        lt = (opt.q2 - opt.q) // opt.e - 1
        if opt.q2 > opt.q + opt.e + lt * opt.e:
            lt += 1
        self.long_thres = lt

    def fits(self, qlen_seg: int, tlen_seg: int) -> bool:
        return 0 < qlen_seg <= self.QP and 0 < tlen_seg <= self.TP

    def _dispatch(self, chunk, flag_for: bool):
        from ..ops.exts_pallas import exts2_batch, splice_site_arrays
        from ..ops.traceback_pallas import traceback_batch
        o = self.opt
        qr = np.zeros((self.sub, self.QP), np.uint8)
        sf = np.zeros((self.sub, self.TP), np.uint8)
        lens = np.ones((self.sub, 2), np.int32)
        for i, (qseg, rid, rs, re_) in enumerate(chunk):
            qr[i, :len(qseg)] = qseg[::-1]
            off = int(self.seq_off[rid])
            tseg = self.S[off + rs:off + re_]
            sf[i, :len(tseg)] = tseg
            lens[i] = (len(qseg), len(tseg))
        dn, ac = splice_site_arrays(sf, lens[:, 1], flag_for, o.noncan,
                                    self.cmplx, False)
        # sc_N from the scoring matrix ambi entry (ksw2_exts.py:128)
        sc_N = -o.e if (self.mat is None or int(self.mat[-1]) == 0) \
            else int(self.mat[-1])
        p, ez = exts2_batch(qr, sf, dn, ac, lens, G=self.G, W=self.W,
                            RB=self.RB, R=self.R, QP=self.QP, TP=self.TP,
                            q=o.q, e=o.e, q2=o.q2, zdrop=-1,
                            right_mode=False, approx_max=True,
                            approx_drop=False, sc_mch=o.a,
                            sc_mis=-abs(o.b), sc_N=sc_N, with_cigar=True,
                            interpret=self.interpret)
        ops, fin = traceback_batch(p, jnp.asarray(lens), G=self.G,
                                   W=self.W, RB=self.RB, R=self.R, w=0,
                                   splice=True, QP=self.QP,
                                   interpret=self.interpret)
        return ops, fin, ez

    def align_jobs(self, jobs):
        """Returns [(cigar, trans_strand, score)] per job; the 2-round
        strand trial picks per job the better of FOR/REV."""
        from ..ops.extend_pallas2 import EZ_SCORE
        from ..ops.traceback_pallas import decode_ops
        out = []
        for lo in range(0, len(jobs), self.sub):
            chunk = jobs[lo:lo + self.sub]
            rounds = []
            for flag_for in (True, False):
                ops, fin, ez = self._dispatch(chunk, flag_for)
                fin_h = np.asarray(fin)
                mx = int(_ops_extent(ops))
                rounds.append((np.asarray(ops[:, :max(mx, 1)]),
                               fin_h, np.asarray(ez)))
            for i in range(len(chunk)):
                sc_f = int(rounds[0][2][i, EZ_SCORE])
                sc_r = int(rounds[1][2][i, EZ_SCORE])
                # strand pick incl. the tie pseudo-random (align.c:1078-1080)
                if sc_f > sc_r:
                    ridx, ts = 0, 1
                elif sc_f < sc_r:
                    ridx, ts = 1, 2
                else:
                    ts = 3
                    ridx = (len(chunk[i][0]) + sc_f) & 1
                ops, fin, ez = rounds[ridx]
                cig = decode_ops(ops[i], int(fin[i, 0]), int(fin[i, 1]),
                                 splice=True, long_thres=self.long_thres)
                out.append((cig, ts, int(ez[i, EZ_SCORE])))
        return out


def split_extent(qs, qe, rs, re_, wq, wr, w_thr, qp_max, tp_max):
    """Anchored decomposition of one chain extent (align.c:803-872 as
    segment planning): walk the chain waypoints and cut the extent
    wherever the diagonal jumps by more than w_thr (an SV-scale indel
    the global band cannot absorb) or a segment outgrows the DP
    capacity.  Returns (segs, joints): segs = [(qa, ra, qb, rb)]
    diagonal-consistent spans, joints[i] between seg i and i+1 is
    (op, len) with op 1=I, 2=D, 0=plain concatenation.

    The jump is attributed to the waypoint BEFORE it; the true joint
    lies within one waypoint spacing (~chain_len/64), and the next
    segment's banded DP re-places the local bases, so the residual
    placement error is bounded by the band."""
    pts = [(int(qs), int(rs))]
    for q, r in zip(wq, wr):
        q, r = int(q), int(r)
        if q < 0:
            continue
        if qs < q < qe and rs < r < re_ and q > pts[-1][0] \
                and r > pts[-1][1]:
            pts.append((q, r))
    pts.append((int(qe), int(re_)))
    segs, joints = [], []
    sq, sr = pts[0]
    for (q1, r1), (q2, r2) in zip(pts, pts[1:]):
        d = (r2 - r1) - (q2 - q1)
        if abs(d) > w_thr and q1 > sq and r1 > sr:
            segs.append((sq, sr, q1, r1))
            if d > 0:
                joints.append((2, d))           # deletion joint
                sq, sr = q1, r1 + d
            else:
                joints.append((1, -d))          # insertion joint
                sq, sr = q1 - d, r1
        elif (q2 - sq > qp_max - 512 or r2 - sr > tp_max - 512) \
                and q1 > sq and r1 > sr:
            segs.append((sq, sr, q1, r1))       # capacity cut, no joint
            joints.append((0, 0))
            sq, sr = q1, r1
    segs.append((sq, sr, int(qe), int(re_)))
    return segs, joints


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
    r.score = r.score0 = int(rec["sc"])
    r.subsc = max(int(rec["sub"]), 0)
    r.mapq = (0 if sec else
              _mapq(int(rec["sc"]), int(rec["sub"]), int(rec["cnt"]),
                    opt.min_chain_score))
    r.sam_pri = reg_id == 0
    p = Extra()
    p.cigar = list(cigar)
    p.trans_strand = int(rec.get("ts", 0))
    r.is_spliced = any((c & 0xF) == 3 for c in p.cigar)
    tseg = np.asarray(mi.S, np.uint8)[
        mi.seq[r.rid].offset + int(rec["rs"]):
        mi.seq[r.rid].offset + int(rec["re"])]
    # canonicalize like the host path: indel left-shift, 5I6D7I merge,
    # leading-indel removal (mm_fix_cigar align.c:105-181) -- without
    # this, tie-equivalent device paths diverge from the host output
    from ..map.align_engine import fix_cigar
    r.p = p
    qshift, tshift = fix_cigar(r, qseg, tseg)
    p = r.p
    qseg = qseg[qshift:]
    tseg = tseg[tshift:]
    if native.available():
        from ..config import MM_F_SR
        blen, mlen, n_ambi, dp_max, spliced = native.update_extra_scan(
            qseg, tseg, p.cigar, mat, 5, opt.q, opt.e,
            not (opt.flag & MM_F_SR))     # log_gap (align.c:906)
        r.blen, r.mlen, p.n_ambi = blen, mlen, n_ambi
        r.is_spliced = bool(spliced) or r.is_spliced
        p.dp_max = p.dp_max0 = p.dp_score = dp_max
        if "dsc" in rec:          # device DP score (splice path): the
            p.dp_score = int(rec["dsc"])   # AS:i the ksw run would report
        if r.is_spliced and p.trans_strand:   # align.c:1090-1094
            if p.trans_strand in (1, 2):
                p.dp_max += (opt.a + opt.b) + ((opt.a + opt.b) >> 1)
            elif p.trans_strand == 3:
                p.dp_max -= opt.a + opt.b
    else:
        r.blen = max(r.qe - r.qs, r.re - r.rs)
        r.mlen = min(r.qe - r.qs, r.re - r.rs)
        p.dp_max = p.dp_max0 = p.dp_score = r.score
    r.p = p
    r.div = -1.0
    return r


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP4[codes[::-1]]
