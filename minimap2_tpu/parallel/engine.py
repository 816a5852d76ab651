"""Batched TPU mapping engine: end-to-end PAF throughput path.

The host per-read path (map/pipeline.py) is the bit-exact parity oracle;
this engine is the high-throughput device path: whole read mega-batches run
sketch -> seed lookup -> anchor sort -> chain DP -> top-K chain selection as
ONE jitted device program, and only (K, B) compact chain records return to
the host for PAF emission.  Quality is gated statistically (paftools
mapeval ROC on simulated reads) rather than byte parity: the device chain
scan uses a fixed look-back window (max_iter analogue) and the top-K
selection approximates mm_set_parent's query-overlap primary marking.

Corresponds to the reference's mapping mode without base alignment
(minimap2 without -c/-a: seed/chain/mapq only, map.c:227-341).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.intfloat import SEQ_NT4
from .batch import (BatchParams, DeviceIndex, _chain_scan, _compact_minimizers,
                    _lookup_anchors, device_sketch, topk_chains)


def make_paf_step(di: DeviceIndex, p: BatchParams, K: int, min_sc: int,
                  interpret: bool = False, with_sec: bool = False,
                  with_wp: bool = False, WP: int = 64):
    """Jitted device program: read batch -> (K, B) chain records.

    The index is an argument (not a closure constant): jit constants are
    embedded in the compile payload, which breaks for real-size indices."""

    use_pallas_sketch = (not interpret and p.L % 512 == 0
                         and p.k + p.w <= 128)
    di_dev = jax.device_put(di)

    @jax.jit
    def step_di(di, packed, nbits, lens):
        codes = unpack_codes(packed, nbits, p.L)
        if p.hpc:        # homopolymer-compress, sketch the run stream
            from .batch import hpc_compact
            codes_s, hpos, lens_s = hpc_compact(codes, lens,
                                                use_pallas=use_pallas_sketch)
        else:
            codes_s, hpos, lens_s = codes, None, lens
        if use_pallas_sketch:
            from ..ops.sketch_pallas import sketch_batch
            hhi, hlo, z, is_mini, _ = sketch_batch(codes_s, lens_s, G=8, T=512,
                                                k=p.k, w=p.w)
        else:
            hhi, hlo, z, is_mini = device_sketch(codes_s, lens_s, p.k, p.w)
        mh_hi, mh_lo, mz, mpos, mvalid = _compact_minimizers(
            hhi, hlo, z, is_mini, p.M, use_pallas=use_pallas_sketch)
        mspan = None
        if p.hpc:        # map minimizer slots back to original coords;
            # the true HPC span = hpos[mc] - hpos[mc-k] (sum of the k
            # runs' lengths, sketch.c:94-105), capped at 255
            L = codes.shape[1]
            mc = jnp.clip(mpos, 0, L - 1)
            end_orig = jnp.take_along_axis(hpos, mc, axis=1)
            prev_orig = jnp.where(
                mc >= p.k,
                jnp.take_along_axis(hpos, jnp.clip(mc - p.k, 0, L - 1),
                                    axis=1), -1)
            mspan = jnp.clip(end_orig - prev_orig, 1, 255).astype(jnp.int32)
            mspan = jnp.where(mvalid, mspan, p.k)
            mpos = jnp.where(mvalid, end_orig, L)
        rev, rid, rpos, qpos, span, av, rep_len = _lookup_anchors(
            di, mh_hi, mh_lo, mz, mpos, mvalid, lens, p, interpret,
            mspan=mspan)
        B = codes.shape[0]

        def run_chain(bw, max_dist):
            if not interpret and B % 128 == 0 and p.A % 256 == 0 \
                    and not p.rmq_tier:
                from ..ops.chain_pallas import chain_batch
                f, pred, qs_a, rs_a = chain_batch(
                    rev, rid, rpos, qpos, span, av, BL=128,
                    WND=p.chain_window, AC=256, k=p.k, max_dist_x=max_dist,
                    max_dist_y=max_dist, bw=bw,
                    chn_pen_gap=p.chn_pen_gap, chn_pen_skip=p.chn_pen_skip)
            else:
                import dataclasses
                p2 = dataclasses.replace(p, bw=bw, max_dist_x=max_dist,
                                         max_dist_y=max_dist)
                _, (f, pred, vv, qs_a, rs_a) = _chain_scan(
                    rev, rid, rpos, qpos, span, av, p2)
            return f, qs_a, rs_a

        f, qs_a, rs_a = run_chain(p.bw, p.max_dist_x)
        recs = topk_chains(f, qs_a, rs_a, rev, rid, rpos, qpos, av, K,
                           min_sc, with_sec=with_sec)
        qs2_a = rs2_a = trig = None
        if p.bw_long > p.bw:
            # long-join rescue (map.c:283-292): reads whose best chain
            # leaves > rmq_rescue_size uncovered query (or spans > 10% of
            # the read and has competitors) are rechained over the SAME
            # anchors with the wide band; pass-2 scores dominate pass-1
            # whenever a join exists, so triggered reads take pass-2.
            sc0, qs0, qe0 = recs[0][0], recs[2][0], recs[3][0]   # (B,)
            n_multi = jnp.sum(recs[0] >= min_sc, axis=0) > 1
            span0 = qe0 - qs0
            lq = lens.astype(jnp.int32)
            trig = (sc0 > 0) & n_multi & (
                (lq - span0 > p.rmq_rescue_size)
                | (span0.astype(jnp.float32)
                   > lq.astype(jnp.float32) * p.rmq_rescue_ratio))
            f2, qs2_a, rs2_a = run_chain(
                p.bw_long, max(p.max_dist_x, p.bw_long))
            recs2 = topk_chains(f2, qs2_a, rs2_a, rev, rid, rpos, qpos,
                                av, K, min_sc, with_sec=with_sec)
            recs = [jnp.where(trig[None, :], b, a)
                    for a, b in zip(recs, recs2)]
        Kout = recs[0].shape[0]
        recs.append(jnp.broadcast_to(rep_len[None, :], (Kout, rep_len.shape[0])))
        stack = jnp.stack(recs)    # one (10, K, B) array -> one host fetch
        if not with_wp:
            return stack
        # waypoints of the chosen chain (anchored decomposition input):
        # chain membership keys off the (qs_a, rs_a) plane of whichever
        # chain pass produced the chosen record
        from .batch import chain_waypoints
        rec0 = (recs[2][0], recs[4][0], recs[6][0], recs[7][0])
        wq, wr = chain_waypoints(qs_a, rs_a, rev, rid, rpos, qpos, av,
                                 rec0, WP)
        if trig is not None:
            wq2, wr2 = chain_waypoints(qs2_a, rs2_a, rev, rid, rpos,
                                       qpos, av, rec0, WP)
            wq = jnp.where(trig[:, None], wq2, wq)
            wr = jnp.where(trig[:, None], wr2, wr)
        return stack, jnp.stack([wq, wr])

    def step(packed, nbits, lens):
        return step_di(di_dev, packed, nbits, lens)

    return step


def encode_batch(seqs: list[bytes], L: int):
    """Pack reads into a fixed-shape (B, L) nt4 batch."""
    B = len(seqs)
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        n = min(len(s), L)
        codes[i, :n] = SEQ_NT4[np.frombuffer(s[:n], np.uint8)]
        lens[i] = n
    return codes, lens


def pack_codes(codes: np.ndarray):
    """(B, L) nt4 codes -> 2-bit packed (B, L//4) + N bitmap (B, L//8).

    The read batch crosses the host->device link every step; packing
    cuts that transfer ~4x (ambiguous bases ride in the bitmap)."""
    B, L = codes.shape
    assert L % 8 == 0
    isn = codes >= 4
    c2 = np.where(isn, 0, codes).astype(np.uint8)
    c4 = c2.reshape(B, L // 4, 4)
    packed = (c4[:, :, 0] | (c4[:, :, 1] << 2) | (c4[:, :, 2] << 4)
              | (c4[:, :, 3] << 6)).astype(np.uint8)
    nb = np.packbits(isn.reshape(B, L // 8, 8), axis=-1,
                     bitorder="little")[:, :, 0]
    return packed, nb


def unpack_codes(packed, nbits, L: int):
    """Device-side inverse of pack_codes -> (B, L) u8 nt4."""
    B = packed.shape[0]
    sh = jnp.arange(4, dtype=jnp.uint8) * 2
    c = (packed[:, :, None] >> sh[None, None, :]) & jnp.uint8(3)
    c = c.reshape(B, L)
    nb = (nbits[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
    nmask = nb.reshape(B, L) != 0
    return jnp.where(nmask, jnp.uint8(4), c)


def _mapq(score: int, sub: int, cnt: int, min_chain_score: int,
          rep_len: int = 0, sum_sc: int | None = None,
          n_sub: int = 0) -> int:
    """mm_set_mapq2 (hit.c:432-485), no-DP branch: the chain-only mapq of
    the reference's PAF mode, including the uniq_ratio repeat penalty and
    the n_sub correction.  sum_sc defaults to this chain's own score (the
    single-primary case)."""
    if score <= 0:
        return 0
    if sum_sc is None:
        sum_sc = score
    uniq_ratio = np.float32(sum_sc) / np.float32(sum_sc + rep_len)
    pen_s1 = (np.float32(1.0) if score > 100
              else np.float32(0.01) * score) * uniq_ratio
    pen_cm = np.float32(1.0) if cnt > 10 else np.float32(0.1) * cnt
    pen_cm = min(pen_s1, pen_cm)
    subsc = max(sub, min_chain_score)
    x = np.float32(subsc) / np.float32(score)
    mapq = int(pen_cm * np.float32(40.0) * (np.float32(1.0) - x)
               * np.log(np.float32(score)))
    mapq -= int(np.float32(4.343) * np.log(np.float32(n_sub + 1))
                + np.float32(0.499))
    return max(0, min(mapq, 60))


def _occ_cap(opt) -> int:
    """Device occurrence cap: honor mid_occ up to a shape-friendly bound
    (the 65+ occurrence band is repeat bloat that dominates the anchor
    gather/sort/chain cost; override with MM2TPU_OCC_CAP)."""
    import os
    cap = int(os.environ.get("MM2TPU_OCC_CAP", "64"))
    return min(max(opt.mid_occ, 10), cap)



def _bw_long(opt) -> int:
    """Long-join band (map.c:283: only without splice/sr/no-ljoin and
    when bw_long actually exceeds bw)."""
    from ..config import MM_F_NO_LJOIN, MM_F_SPLICE, MM_F_SR
    if (opt.flag & (MM_F_SPLICE | MM_F_SR | MM_F_NO_LJOIN)) == 0             and opt.bw_long > opt.bw:
        return opt.bw_long
    return 0


def run_batched_cli(mi, opt, queries, out, batch_reads: int = 512,
                    L: int = 16384):
    """CLI --batch driver: device PAF mapping over read mega-batches.

    Reads longer than L fall back to the host (bit-exact) path."""
    import sys
    import time

    import jax

    from ..io.fastx import FastxReader
    from ..map.pipeline import map_frag_core
    from ..io import format as fmt

    # persistent compile cache: --batch re-runs skip the multi-minute
    # Mosaic/XLA compile (cache key covers shapes + backend)
    import os
    cache_dir = os.environ.get("MM2TPU_JIT_CACHE",
                               os.path.expanduser("~/.cache/mm2tpu_jit"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from ..config import MM_F_RMQ, MM_I_HPC
    hpc = bool(mi.flag & MM_I_HPC)
    p = BatchParams(L=L, M=max(256, L // 4), A=4096,
                    occ_cap=_occ_cap(opt), chain_window=64,
                    k=mi.k, w=mi.w, max_dist_x=opt.max_gap,
                    max_dist_y=opt.max_gap, bw=opt.bw, hpc=hpc,
                    bw_long=_bw_long(opt) or (opt.bw_long
                                              if opt.flag & MM_F_RMQ
                                              else 0),
                    rmq_tier=bool(opt.flag & MM_F_RMQ))
    di = DeviceIndex.from_host(mi, 1)[0]
    interp = jax.default_backend() != "tpu"
    step = make_paf_step(di, p, K=opt.best_n if opt.best_n < 8 else 5,
                         min_sc=opt.min_chain_score, interpret=interp)
    t0 = time.time()
    n_reads = n_mapped = n_fallback = 0
    names, seqs = [], []

    # dispatch thread: encode + host->device upload of the next batch
    # overlaps the previous batch's compute and host-side PAF emit (the
    # kt_pipeline read/map/write overlap, kthread.c:97-159, as a
    # prefetch thread + device queue)
    import queue as _queue
    import threading as _threading
    q_disp: _queue.Queue = _queue.Queue(maxsize=2)
    q_done: _queue.Queue = _queue.Queue(maxsize=4)

    def _feeder():
        while True:
            item = q_disp.get()
            if item is None:
                return
            nm, sq = item
            q_done.put((nm, sq,
                        dispatch_batch(step, sq, p, pad_to=batch_reads)))

    _th = _threading.Thread(target=_feeder, daemon=True)
    _th.start()
    outstanding = 0

    def drain(keep: int):
        nonlocal n_mapped, outstanding
        while outstanding > keep:
            nm, sq, fut = q_done.get()
            outstanding -= 1
            n_mapped += map_batch_paf(mi, di, step, nm, sq, None, p, out,
                                      pending=fut)

    def flush():
        nonlocal names, seqs, outstanding
        if not names:
            return
        q_disp.put((names, seqs))
        outstanding += 1
        names, seqs = [], []
        drain(2)

    for qf in queries:
        rd = FastxReader(qf)
        while True:
            rec = rd.read1()
            if rec is None:
                break
            n_reads += 1
            if len(rec.seq) > L:     # host fallback for oversize reads
                n_fallback += 1
                flush()
                drain(0)
                res = map_frag_core(mi, [rec.seq], opt, rec.name)[0]
                for r in res.regs:
                    out.write(fmt.write_paf(mi, rec.name, len(rec.seq), r,
                                            opt.flag, res.rep_len) + "\n")
                continue
            names.append(rec.name)
            seqs.append(rec.seq)
            if len(names) >= batch_reads:
                flush()
        rd.close()
    flush()
    drain(0)
    q_disp.put(None)
    _th.join()
    dt = time.time() - t0
    print(f"[M::batch] mapped {n_reads} reads in {dt:.2f}s "
          f"({n_reads / dt:.1f} reads/s); host fallbacks: {n_fallback} "
          f"({100.0 * n_fallback / max(n_reads, 1):.1f}%)", file=sys.stderr)
    return n_reads


def dispatch_batch(step, seqs, p: BatchParams, pad_to: int | None = None):
    """Encode + enqueue one device batch (async; pairs with emit_batch).

    Partial batches are padded up to `pad_to` (or the next multiple of 8,
    the sketch kernel's row-group size) with empty reads; the extra rows
    produce no hits and are sliced away by the caller's B loop."""
    B = len(seqs)
    tgt = pad_to if pad_to is not None else (B + 7) // 8 * 8
    if tgt > B:
        seqs = list(seqs) + [b""] * (tgt - B)
    codes, lens = encode_batch(seqs, p.L)
    packed, nbits = pack_codes(codes)
    return step(jnp.asarray(packed), jnp.asarray(nbits), jnp.asarray(lens))


def map_batch_paf(mi, di: DeviceIndex, step, names, seqs, lens_full,
                  p: BatchParams, out, pending=None):
    """Run one encoded batch through the device step and write PAF lines."""
    if pending is None:
        pending = dispatch_batch(step, seqs, p)
    rec = np.asarray(pending)
    sc, sub, qs, qe, rs, re_, rev, rid, cnt, rep = rec
    K, B = sc.shape
    n_mapped = 0
    for b in range(min(B, len(seqs))):    # B may include pad rows
        qlen = len(seqs[b])
        rep_len = int(rep[0, b])
        # sum_sc over primaries (hit.c:438-443): the K slots are
        # query-disjoint, so every positive slot is a primary here
        sum_sc = int(np.sum(np.maximum(sc[:, b], 0)))
        wrote = False
        for k in range(K):
            if sc[k, b] <= 0:
                break
            mq = _mapq(int(sc[k, b]), int(sub[k, b]), int(cnt[k, b]), 40,
                       rep_len=rep_len, sum_sc=sum_sc)
            if k > 0:
                mq = 0
            r0 = int(mi.seq[int(rid[k, b])].length) \
                if int(rid[k, b]) < mi.n_seq else 0
            qs_, qe_ = int(max(qs[k, b], 0)), int(min(qe[k, b], qlen))
            rs_, re2 = int(max(rs[k, b], 0)), int(min(re_[k, b], r0))
            if qe_ <= qs_ or re2 <= rs_:
                continue
            if int(rev[k, b]):
                qs_, qe_ = qlen - qe_, qlen - qs_
            mlen = min(int(cnt[k, b]) * p.k, qe_ - qs_)
            blen = max(qe_ - qs_, re2 - rs_)
            out.write("\t".join(map(str, [
                names[b], qlen, qs_, qe_, "-" if int(rev[k, b]) else "+",
                mi.seq[int(rid[k, b])].name, r0, rs_, re2, mlen, blen, mq,
                "tp:A:" + ("P" if k == 0 else "S"),
                f"cm:i:{int(cnt[k, b])}", f"s1:i:{int(sc[k, b])}",
                f"s2:i:{max(int(sub[k, b]), 0)}", f"rl:i:{rep_len}",
            ])) + "\n")
            wrote = True
        if wrote:
            n_mapped += 1
    return n_mapped


def _stitch_segments(ab, opt, mat, meta, segs, joints, seg_cigs,
                     qseg_full):
    """Audit + join segmented cigars (anchored decomposition tail).

    Terminal segments may be Kadane-trimmed at their OUTER edge only
    (the reference's extensions stop at the max score, align.c:779-890);
    any inner-edge trim or an internal z-drop means the segments were
    mis-joined -> (None, meta) sends the read to the exact host path.
    Returns (cigar, updated_meta)."""
    from .. import native
    if not native.available():
        out = []
        for si, cg in enumerate(seg_cigs):
            out.extend(cg)
            if si < len(joints):
                op, ln = joints[si]
                if op and ln:
                    out.append((ln << 4) | op)
        return _merge_cigar(out), dict(meta)
    off = int(ab.seq_off[meta["rid"]])
    new_meta = dict(meta)
    out = []
    last = len(segs) - 1
    w_thr_ = max(getattr(ab, "w", 500) // 2, 64)
    pend = 0        # diagonal seam bases carried into the next joint
    for si, ((qa, ra, qb, rb), cg) in enumerate(zip(segs, seg_cigs)):
        qseg_i = qseg_full[qa - meta["qs"]: qb - meta["qs"]]
        tseg_i = ab.S[off + ra: off + rb]
        q0, t0, q1, t1, _bsc, tcig = native.cigar_kadane_trim(
            qseg_i, tseg_i, list(cg), mat, 5, opt.q, opt.e, opt.q2,
            opt.e2, end_bonus=max(opt.end_bonus, 0))
        if not tcig:
            return None, meta
        if si > 0:
            # seam repair: a waypoint joint can sit up to one waypoint
            # spacing before the true breakpoint, so this segment's DP
            # left-trims bases that belong on the PREVIOUS diagonal; a
            # diagonal trim (q0 == t0) re-attaches as an M run BEFORE
            # the joint (the joint length is unchanged -- the seam
            # shifts, the indel does not).  Non-diagonal or oversized
            # trims mean mis-joined segments -> exact host path.
            if q0 != t0 or q0 > 4 * w_thr_:
                return None, meta
            if pend + q0:
                out.append(((pend + q0) << 4) | 0)
            op_, ln_ = joints[si - 1]
            if op_ and ln_:
                out.append((ln_ << 4) | op_)
        elif q0 or t0:          # outer left edge: extension trim
            new_meta["qs"] = meta["qs"] + q0
            new_meta["rs"] = meta["rs"] + t0
        rq_, rt_ = len(qseg_i) - q1, len(tseg_i) - t1
        if si < last:
            if rq_ != rt_ or rq_ > 4 * w_thr_:
                return None, meta
            pend = rq_          # carried to the next seam's M run
        elif rq_ or rt_:        # outer right edge
            new_meta["qe"] = qa + q1
            new_meta["re"] = ra + t1
        if opt.zdrop > 0:
            mz, _pos = native.zdrop_scan(qseg_i[q0:q1], tseg_i[t0:t1],
                                         tcig, mat, 5, opt.q, opt.e)
            if mz > opt.zdrop:
                return None, meta
        out.extend(tcig)
    return _merge_cigar(out), new_meta


def _merge_cigar(cig):
    """Merge adjacent same-op entries (seam hygiene after stitching)."""
    out = []
    for c in cig:
        if out and (out[-1] & 0xF) == (c & 0xF):
            out[-1] = ((out[-1] >> 4) + (c >> 4)) << 4 | (c & 0xF)
        else:
            out.append(c)
    return out


def batch_build_regs(recs, map_fut, ab, mi, opt, mat, sec_mode, splice_mode,
                     out_jobs=None):
    """Chain records + device CIGARs -> per-read Reg lists (the shared
    core of the --batch -a/-c and paired-end paths).

    Returns (by_read: dict id(rec) -> (rec, [Reg...]), fallback list,
    unmapped list, fb_ids set)."""
    from .align_batch import build_reg, revcomp_codes, split_extent
    wp = None
    if isinstance(map_fut, tuple):
        map_fut, wp_fut = map_fut
        wp = np.asarray(wp_fut)            # (2, B, WP) [wq, wr]
    arr = np.asarray(map_fut)
    # (10, K, B): rep_len rides as the last plane
    sc, sub, qs, qe, rs, re_, rev, rid, cnt, rep = arr
    w_thr = max(getattr(ab, "w", 500) // 2, 64)
    jobs, jmeta = [], []
    fallback, unmapped = [], []
    for b, rec in enumerate(recs):
        qlen = len(rec.seq)
        if sc[0, b] <= 0:
            unmapped.append(rec)
            continue
        codes_f = SEQ_NT4[np.frombuffer(rec.seq, np.uint8)]
        codes_r = None
        bad_pri = False
        for k in range(arr.shape[1]):
            if bad_pri:
                break
            is_sec = sec_mode and k % 2 == 1
            if sc[k, b] <= 0:
                if k == 0:
                    break
                continue    # empty interleaved slot
            # mm_select_sub (hit.c:265): a secondary survives against
            # ITS OWN parent slot's score, with the min_diff escape
            # (min_diff = mi->k*2 at every call site, map.c:210/221/529)
            if is_sec:
                psc = int(sc[k - 1, b])
                s_ = int(sc[k, b])
                if not (s_ >= opt.pri_ratio * psc
                        or s_ + 2 * mi.k >= psc):
                    continue
            r0 = (int(mi.seq[int(rid[k, b])].length)
                  if int(rid[k, b]) < mi.n_seq else 0)
            qs_, qe_ = int(max(qs[k, b], 0)), int(min(qe[k, b], qlen))
            rs_, re2 = int(max(rs[k, b], 0)), int(min(re_[k, b], r0))
            if qe_ <= qs_ or re2 <= rs_:
                if k == 0:
                    unmapped.append(rec)
                    bad_pri = True
                continue
            if rev[k, b]:
                if codes_r is None:
                    codes_r = revcomp_codes(codes_f)
                codes = codes_r
            else:
                codes = codes_f
            # extend the anchor-bounded chain extent to the read ends
            # (align.c:779-890 left/right extension), clamped to the
            # contig so the global band never force-inserts an
            # overhang; secondaries keep their chain extent
            if k == 0:
                dl = min(qs_, rs_)
                qs_, rs_ = qs_ - dl, rs_ - dl
                dr = min(qlen - qe_, r0 - re2)
                qe_, re2 = qe_ + dr, re2 + dr
            # anchored decomposition (align.c:803-872): split the
            # primary chain extent at waypoint diagonal jumps into
            # band-sized segment DPs joined by explicit I/D ops, so
            # SV-scale indels no longer force a per-read host fallback
            segs, joints = [(qs_, rs_, qe_, re2)], []
            if k == 0 and wp is not None:
                segs, joints = split_extent(
                    qs_, qe_, rs_, re2, wp[0, b], wp[1, b],
                    w_thr, ab.QP, ab.TP)
            if not all(ab.fits(qb - qa, rb - ra)
                       for qa, ra, qb, rb in segs):
                if k == 0:
                    fallback.append(rec)
                    bad_pri = True
                continue    # drop oversize secondaries only
            for qa, ra, qb, rb in segs:
                jobs.append((codes[qa:qb], int(rid[k, b]), ra, rb))
            jmeta.append((rec, b, k, is_sec, codes[qs_:qe_],
                          {"sc": int(sc[k, b]), "sub": int(sub[k, b]),
                           "cnt": int(cnt[k, b]),
                           "rev": int(rev[k, b]),
                           "rid": int(rid[k, b]), "qs": qs_,
                           "qe": qe_, "rs": rs_, "re": re2,
                           "rep": int(rep[0, b])}, segs, joints))
    cigs = ab.align_jobs(jobs) if jobs else []
    by_read = {}        # id(rec) -> (rec, [Reg, ...])
    fb_ids = set()
    from .. import native
    can_audit = native.available()
    ci_ = 0
    for (rec, b, k, is_sec, qseg, meta, segs, joints) in jmeta:
        n_seg = len(segs)
        cres_list = cigs[ci_:ci_ + n_seg]
        ci_ += n_seg
        if splice_mode:
            cig, ts_, dsc_ = cres_list[0]
            if meta["rev"] and ts_:
                ts_ ^= 3        # flip to the read strand (align.c:907)
            meta = dict(meta, ts=ts_, dsc=dsc_)
        else:
            cig = cres_list[0]
        if any(not c for c in cres_list):
            if k == 0 and id(rec) not in fb_ids:
                fallback.append(rec)
                fb_ids.add(id(rec))
            continue
        if n_seg > 1:
            # anchored decomposition: audit each segment, then join the
            # cigars with the explicit I/D joint ops between them
            cig, meta2 = _stitch_segments(ab, opt, mat, meta, segs,
                                          joints, cres_list, qseg)
            if cig is None:
                if k == 0 and id(rec) not in fb_ids:
                    fallback.append(rec)
                    fb_ids.add(id(rec))
                continue
            qseg = qseg[meta2["qs"] - meta["qs"]:
                        len(qseg) - (meta["qe"] - meta2["qe"])]
            meta = meta2
            r = build_reg(mi, opt, mat, len(rec.seq), qseg, meta, cig,
                          meta.get("rep", 0), reg_id=k,
                          parent=k - 1 if is_sec else k)
            r._rep_len = meta.get("rep", 0)
            by_read.setdefault(id(rec), (rec, []))[1].append(r)
            continue
        if can_audit:
            tseg = ab.S[ab.seq_off[meta["rid"]] + meta["rs"]:
                        ab.seq_off[meta["rid"]] + meta["re"]]
            # 1) trim the forced global path at its max-scoring
            #    sub-path (the reference's extensions STOP at the max
            #    score, align.c:779-890; the global band instead
            #    force-aligns to the extent ends -- junk ends and
            #    over-extension fall off here)
            # splice: the intron penalty is the flat q2 (e2=0)
            q0, t0, q1, t1, bsc, tcig = native.cigar_kadane_trim(
                qseg, tseg, cig, mat, 5, opt.q, opt.e, opt.q2,
                0 if splice_mode else opt.e2,
                end_bonus=max(opt.end_bonus, 0))
            if not tcig:
                if k == 0 and id(rec) not in fb_ids:
                    fallback.append(rec)
                    fb_ids.add(id(rec))
                continue
            if q1 > q0 and (q0 or t0 or q1 < len(qseg)
                            or t1 < len(tseg)):
                meta = dict(meta)
                meta["qe"] = meta["qs"] + q1
                meta["qs"] += q0
                meta["re"] = meta["rs"] + t1
                meta["rs"] += t0
                qseg = qseg[q0:q1]
                tseg = tseg[t0:t1]
                cig = tcig
            if (k == 0 and id(rec) not in fb_ids and opt.zdrop > 0
                    and not splice_mode):
                # (splice cigars carry N introns the flat-gap zdrop
                # scan would misread as giant deletions)
                # 2) post-hoc z-drop audit (mm_test_zdrop
                #    align.c:61-103, applied at align.c:843-868):
                #    an internal drop means the reference would split
                #    the chain / try inversion rescue -> exact host
                #    path for this read
                mz, _pos = native.zdrop_scan(qseg, tseg, cig, mat, 5,
                                             opt.q, opt.e)
                if mz > opt.zdrop:
                    fallback.append(rec)
                    fb_ids.add(id(rec))
                    continue
        r = build_reg(mi, opt, mat, len(rec.seq), qseg, meta, cig,
                      meta.get("rep", 0), reg_id=k,
                      parent=k - 1 if is_sec else k)
        r._rep_len = meta.get("rep", 0)
        by_read.setdefault(id(rec), (rec, []))[1].append(r)
    # finalize: dp_max2/n_sub from the aligned secondaries
    # (mm_set_parent hit.c:171-176,226-237) then the full DP-informed
    # mm_set_mapq2 (hit.c:432-485) via the host port
    from ..config import MM_F_SR, MM_F_SPLICE
    from ..map import hit as hitmod
    is_sr = bool(opt.flag & MM_F_SR)
    is_splice = bool(opt.flag & MM_F_SPLICE)
    sub_diff = opt.a * 2 + opt.b
    for _rec, regs in by_read.values():
        by_id = {r.id: r for r in regs}
        for r in regs:
            if r.parent == r.id or r.parent not in by_id:
                continue
            rp = by_id[r.parent]
            ident = (r.rid == rp.rid and r.rs == rp.rs and r.re == rp.re)
            cnt_sub = 1 if r.cnt >= rp.cnt else 0
            if rp.p is not None and r.p is not None and not ident:
                rp.p.dp_max2 = max(rp.p.dp_max2, r.p.dp_max)
                if rp.p.dp_max - r.p.dp_max <= sub_diff:
                    cnt_sub = 1
            if cnt_sub:
                rp.n_sub += 1
        hitmod.set_mapq(regs, opt.min_chain_score, opt.a,
                        regs[0]._rep_len if regs else 0, is_sr, is_splice)
    return by_read, fallback, unmapped, fb_ids



def run_batched_align_cli(mi, opt, queries, out, batch_reads: int = 512,
                          L: int = 12288, align_kw: dict | None = None):
    """--batch with -c/-a: device mapping + device base-level alignment.

    Per batch: the PAF mapping step picks each read's best chain, then
    the chain extents run through the batched extd2 forward + on-device
    traceback (parallel/align_batch.py).  Reads whose extent exceeds the
    compiled capacity (or that need an exact zdrop/inversion treatment)
    fall back to the bit-exact host path."""
    import sys
    import time

    import jax

    from ..config import MM_F_OUT_SAM, MM_F_SAM_HIT_ONLY, MM_I_HPC
    from ..io import format as fmt
    from ..io.fastx import FastxReader
    from ..map.align_engine import gen_ts_mat
    from ..map.driver import map_fragment, write_fragment
    from .align_batch import (AlignBatcher, SpliceAlignBatcher, build_reg,
                              revcomp_codes)

    import os
    cache_dir = os.environ.get("MM2TPU_JIT_CACHE",
                               os.path.expanduser("~/.cache/mm2tpu_jit"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    hpc = bool(mi.flag & MM_I_HPC)
    from ..config import MM_F_RMQ as _RMQ
    p = BatchParams(L=L, M=max(256, L // 4), A=4096,
                    occ_cap=_occ_cap(opt), chain_window=64,
                    k=mi.k, w=mi.w, max_dist_x=opt.max_gap,
                    max_dist_y=opt.max_gap, bw=opt.bw, hpc=hpc,
                    bw_long=_bw_long(opt) or (opt.bw_long
                                              if opt.flag & _RMQ else 0),
                    rmq_tier=bool(opt.flag & _RMQ))
    di = DeviceIndex.from_host(mi, 1)[0]
    interp = jax.default_backend() != "tpu"
    # with secondaries on, each selection round yields [primary,
    # overlapping-secondary] slot pairs (mm_select_sub semantics: keep
    # secondaries while sc >= pri_ratio * best; hit.c:255-281)
    sec_mode = opt.best_n > 0 and opt.pri_ratio > 0
    K = 3 if sec_mode else 1
    from ..config import MM_F_SPLICE
    splice_mode = bool(opt.flag & MM_F_SPLICE)
    # waypoints feed the anchored decomposition (genomic modes only:
    # the splice path's N introns are the exts kernel's own business)
    step = make_paf_step(di, p, K=K, min_sc=opt.min_chain_score,
                         interpret=interp, with_sec=sec_mode,
                         with_wp=not splice_mode)
    mat = gen_ts_mat(5, opt.a, opt.b, opt.transition, opt.sc_ambi)
    if splice_mode:
        skw = {k: v for k, v in (align_kw or {}).items()
               if k in ("QP", "TP", "G", "RB", "sub")}
        ab = SpliceAlignBatcher(mi, opt, mat, **{"QP": min(L, 2048),
                                                 "TP": 8192, **skw})
    else:
        ab = AlignBatcher(mi, opt, **{"QP": L, "TP": L + 512,
                                      **(align_kw or {})})
    sam = bool(opt.flag & MM_F_OUT_SAM)
    t0 = time.time()
    n_reads = 0

    n_fallback = 0

    def emit_batch(recs, map_fut):
        nonlocal n_reads, n_fallback
        n_reads += len(recs)
        by_read, fallback, unmapped, fb_ids = batch_build_regs(
            recs, map_fut, ab, mi, opt, mat, sec_mode, splice_mode)
        for rec, regs in by_read.values():
            if id(rec) in fb_ids or not regs:
                continue
            if regs[0].id != 0:     # primary cigar failed -> host path
                fallback.append(rec)
                continue
            if sam:
                for i in range(len(regs)):
                    out.write(fmt.write_sam(mi, rec, 0, i, 1,
                                            [len(regs)], [regs],
                                            opt.flag, 0,
                                            rg_id=getattr(opt, "rg_id",
                                                          None)))
                    out.write("\n")
            else:
                for r in regs:
                    out.write(fmt.write_paf(mi, rec.name, len(rec.seq),
                                            r, opt.flag, 0, qseq=rec.seq,
                                            comment=rec.comment))
                    out.write("\n")
        n_fallback += len(fallback)
        for rec in fallback:    # exact host path
            results = map_fragment(mi, opt, [rec])
            write_fragment(out, mi, opt, [rec],
                           [res.regs for res in results],
                           [res.rep_len for res in results])
        for rec in unmapped:
            if sam and not (opt.flag & MM_F_SAM_HIT_ONLY):
                out.write(fmt.write_sam(mi, rec, 0, -1, 1, [0], [[]],
                                        opt.flag, 0,
                                        rg_id=getattr(opt, "rg_id", None)))
                out.write("\n")

    pending = []    # [(recs, map_future)] -- map dispatch overlaps the
                    # previous batch's align + emit work

    def queue_batch(recs):
        pending.append((recs, dispatch_batch(step, [r.seq for r in recs],
                                             p, pad_to=batch_reads)))
        while len(pending) > 1:
            r0, f0 = pending.pop(0)
            emit_batch(r0, f0)

    recs = []
    for qf in queries:
        rd = FastxReader(qf)
        while True:
            rec = rd.read1()
            if rec is None:
                break
            recs.append(rec)
            if len(recs) >= batch_reads:
                queue_batch(recs)
                recs = []
        rd.close()
    if recs:
        queue_batch(recs)
    while pending:
        r0, f0 = pending.pop(0)
        emit_batch(r0, f0)
    dt = time.time() - t0
    # fallback rate is a quality signal: a regression that silently
    # pushes reads to the exact host path would otherwise be invisible
    print(f"[M::batch] aligned {n_reads} reads in {dt:.2f}s "
          f"({n_reads / dt:.1f} reads/s); host fallbacks: {n_fallback} "
          f"({100.0 * n_fallback / max(n_reads, 1):.1f}%)", file=sys.stderr)
    return n_reads


def run_batched_pe_cli(mi, opt, queries, out, batch_frags: int = 256,
                       L: int = 1024, align_kw: dict | None = None):
    """--batch paired-end (-ax sr r1 r2): both ends map independently on
    the device engine (the reference's weak-pairing mode, map.c:380-390),
    then mm_pair's sort + windowed join rescues proper pairs and blends
    the pair mapq (pe.c:81-182).  Fragments where either end needs the
    exact treatment fall back to the host path whole."""
    import sys
    import time

    import jax

    from ..config import MM_F_OUT_SAM, MM_I_HPC
    from ..map.align_engine import gen_ts_mat
    from ..map.driver import iter_fragments, map_fragment, write_fragment
    from ..map.pe import pair as pe_pair
    from .align_batch import AlignBatcher

    import os
    cache_dir = os.environ.get("MM2TPU_JIT_CACHE",
                               os.path.expanduser("~/.cache/mm2tpu_jit"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    hpc = bool(mi.flag & MM_I_HPC)
    p = BatchParams(L=L, M=max(256, L // 4), A=2048,
                    occ_cap=_occ_cap(opt), chain_window=64,
                    k=mi.k, w=mi.w, max_dist_x=opt.max_gap,
                    max_dist_y=opt.max_gap, bw=opt.bw, hpc=hpc)
    di = DeviceIndex.from_host(mi, 1)[0]
    interp = jax.default_backend() != "tpu"
    sec_mode = opt.best_n > 0 and opt.pri_ratio > 0
    K = 3 if sec_mode else 1
    B = 2 * batch_frags
    step = make_paf_step(di, p, K=K, min_sc=opt.min_chain_score,
                         interpret=interp, with_sec=sec_mode)
    mat = gen_ts_mat(5, opt.a, opt.b, opt.transition, opt.sc_ambi)
    ab = AlignBatcher(mi, opt, **{"QP": L, "TP": L + 512, "W": 256,
                                  **(align_kw or {})})
    t0 = time.time()
    n_reads = 0
    n_fallback = 0
    pe_ori = opt.pe_ori

    def process(frags):
        nonlocal n_reads, n_fallback
        from ..io.fastx import revcomp_record
        # flatten: seg1 revcomp'ed per pe_ori (worker_for map.c:437-442)
        recs, flips = [], []
        for frag in frags:
            for j, rec in enumerate(frag):
                flip = (j == 0 and (pe_ori >> 1) & 1) \
                    or (j == 1 and pe_ori & 1)
                recs.append(revcomp_record(rec) if flip else rec)
                flips.append(flip)
        n_reads += len(recs)
        fut = dispatch_batch(step, [r.seq for r in recs], p, pad_to=B)
        by_read, _fb, _unm, fb_ids = batch_build_regs(
            recs, fut, ab, mi, opt, mat, sec_mode, False)
        # per-fragment: pair IN THE MAPPED ORIENTATION (mm_pair runs
        # before worker_for's flip-back, map.c:355 vs :454-470), then
        # flip the revcomp'ed mate's regs to the read strand and write
        idx = 0
        for frag in frags:
            n_seg = len(frag)
            regss = []
            host_fb = False
            for j in range(n_seg):
                rec = recs[idx + j]
                if id(rec) in fb_ids:
                    host_fb = True
                    break
                regs = by_read.get(id(rec), (None, []))[1]
                if regs and regs[0].id != 0:
                    host_fb = True
                    break
                regss.append(regs)
            if host_fb:
                idx += n_seg
                n_fallback += n_seg
                results = map_fragment(mi, opt, frag)
                write_fragment(out, mi, opt, frag,
                               [res.regs for res in results],
                               [res.rep_len for res in results])
                continue
            if n_seg == 2:
                qlens = [len(r.seq) for r in frag]
                # max_chain_gap_ref (map.c:266-271) feeds mm_pair
                # (map.c:354): honor max_gap_ref, else derive from
                # max_frag_len
                if opt.max_gap_ref > 0:
                    mgr = opt.max_gap_ref
                elif opt.max_frag_len > 0:
                    mgr = max(opt.max_frag_len - sum(qlens), opt.max_gap)
                else:
                    mgr = opt.max_gap
                pe_pair(mgr, opt.pe_bonus, opt.a * 2 + opt.b, opt.a,
                        qlens, regss)
            for j in range(n_seg):
                if flips[idx + j]:      # back to the read strand
                    qlen = len(frag[j].seq)
                    for r in regss[j]:
                        r.qs, r.qe = qlen - r.qe, qlen - r.qs
                        r.rev = 0 if r.rev else 1
            idx += n_seg
            write_fragment(out, mi, opt, frag, regss,
                           [0] * n_seg)

    buf = []
    for frag in iter_fragments(queries, True):
        buf.append(frag)
        if len(buf) >= batch_frags:
            process(buf)
            buf = []
    if buf:
        process(buf)
    dt = time.time() - t0
    print(f"[M::batch] aligned {n_reads} paired reads in {dt:.2f}s "
          f"({n_reads / dt:.1f} reads/s); host fallbacks: {n_fallback} "
          f"({100.0 * n_fallback / max(n_reads, 1):.1f}%)", file=sys.stderr)
    return n_reads
