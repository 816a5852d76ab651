"""(w,k)-minimizer sketching, bit-exact with the reference.

The semantics replicated here are those of mm_sketch (reference sketch.c:77-143):
symmetric-kmer skipping, HPC compression, invertible hash, windowed minimum
with tie emission, and the exact emission *order* (downstream is_tandem/rep_len
depend on it).

Two implementations:
  * sketch_ref  — direct sequential port; the oracle used by unit tests.
  * sketch      — vectorized NumPy path: kmer/hash computation is fully
                  vectorized; the window scan runs over a compressed event
                  stream.  Verified bit-identical to sketch_ref.

The device-side (Pallas) query sketcher in ops/ is validated against these.
"""
from __future__ import annotations

import numpy as np

from ..utils.intfloat import SEQ_NT4, hash64

UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def sketch_ref(seq, w: int, k: int, rid: int, is_hpc: bool):
    """Sequential oracle. seq: bytes/str or nt4 uint8 array.

    Returns (x, y) uint64 arrays:
      x = hash64(kmer)<<8 | kmer_span
      y = rid<<32 | last_pos<<1 | strand
    """
    if isinstance(seq, (bytes, str)):
        codes = SEQ_NT4[np.frombuffer(seq.encode() if isinstance(seq, str) else seq,
                                      dtype=np.uint8)]
    else:
        codes = np.asarray(seq, dtype=np.uint8)
    length = len(codes)
    assert length > 0 and 0 < w < 256 and 0 < k <= 28
    shift1 = 2 * (k - 1)
    mask = (1 << (2 * k)) - 1
    kmer = [0, 0]
    buf = [(0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF)] * w
    tq: list[int] = []
    out_x: list[int] = []
    out_y: list[int] = []
    mn = (0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF)
    MAXV = 0xFFFFFFFFFFFFFFFF
    i = l = buf_pos = min_pos = 0
    kmer_span = 0
    while i < length:
        c = int(codes[i])
        info = (MAXV, MAXV)
        if c < 4:
            if is_hpc:
                skip_len = 1
                if i + 1 < length and codes[i + 1] == c:
                    skip_len = 2
                    while i + skip_len < length and codes[i + skip_len] == c:
                        skip_len += 1
                    i += skip_len - 1
                tq.append(skip_len)
                kmer_span += skip_len
                if len(tq) > k:
                    kmer_span -= tq.pop(0)
            else:
                kmer_span = l + 1 if l + 1 < k else k
            kmer[0] = ((kmer[0] << 2) | c) & mask
            kmer[1] = (kmer[1] >> 2) | ((3 ^ c) << shift1)
            if kmer[0] == kmer[1]:
                i += 1
                continue  # symmetric k-mer: indeterminate strand
            z = 0 if kmer[0] < kmer[1] else 1
            l += 1
            if l >= k and kmer_span < 256:
                info = (int(hash64(np.uint64(kmer[z]), np.uint64(mask))) << 8 | kmer_span,
                        (rid << 32) | (i << 1) | z)
        else:
            l = 0
            tq.clear()
            kmer_span = 0
        buf[buf_pos] = info
        if l == w + k - 1 and mn[0] != MAXV:
            for j in range(buf_pos + 1, w):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_x.append(buf[j][0]); out_y.append(buf[j][1])
            for j in range(buf_pos):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_x.append(buf[j][0]); out_y.append(buf[j][1])
        if info[0] <= mn[0]:
            if l >= w + k and mn[0] != MAXV:
                out_x.append(mn[0]); out_y.append(mn[1])
            mn, min_pos = info, buf_pos
        elif buf_pos == min_pos:
            if l >= w + k - 1 and mn[0] != MAXV:
                out_x.append(mn[0]); out_y.append(mn[1])
            mn = (MAXV, MAXV)
            for j in range(buf_pos + 1, w):
                if mn[0] >= buf[j][0]:
                    mn, min_pos = buf[j], j
            for j in range(buf_pos + 1):
                if mn[0] >= buf[j][0]:
                    mn, min_pos = buf[j], j
            if l >= w + k - 1 and mn[0] != MAXV:
                for j in range(buf_pos + 1, w):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_x.append(buf[j][0]); out_y.append(buf[j][1])
                for j in range(buf_pos + 1):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_x.append(buf[j][0]); out_y.append(buf[j][1])
        buf_pos += 1
        if buf_pos == w:
            buf_pos = 0
        i += 1
    if mn[0] != MAXV:
        out_x.append(mn[0]); out_y.append(mn[1])
    return np.array(out_x, dtype=np.uint64), np.array(out_y, dtype=np.uint64)


def _event_stream(codes: np.ndarray, w: int, k: int, rid: int, is_hpc: bool):
    """Vectorized stage: produce the per-slot info stream fed to the window scan.

    A 'slot' is every event that writes into the circular buffer in mm_sketch:
    ambiguous bases and non-symmetric accepted k-mer ends (symmetric k-mers
    write no slot).  Returns (X, Y, L) arrays over slots where X/Y are the
    info pair (UMAX for invalid) and L is the post-increment l counter.
    """
    length = len(codes)
    if is_hpc:
        # run-length collapse: event at the end of each homopolymer run.
        # Ambiguous bases are never collapsed (each writes its own slot).
        change = np.empty(length, dtype=bool)
        change[:-1] = (codes[1:] != codes[:-1]) | (codes[:-1] == 4)
        change[-1] = True
        pos = np.nonzero(change)[0]                    # event positions (run ends)
        ev_c = codes[pos].astype(np.int64)
        starts = np.concatenate(([0], pos[:-1] + 1))
        skip = (pos - starts + 1).astype(np.int64)     # run lengths
    else:
        pos = np.arange(length, dtype=np.int64)
        ev_c = codes.astype(np.int64)
        skip = np.ones(length, dtype=np.int64)

    n_ev = len(pos)
    valid = ev_c < 4

    # forward/reverse k-mer registers accumulate over *accepted* events only and
    # are NOT reset at ambiguous bases (mm_sketch keeps stale codes in the shift
    # registers; they only matter for the symmetric-kmer test at l<k, but that
    # test changes which events occupy buffer slots, so it must be exact).
    acc_idx = np.nonzero(valid)[0]                     # event index of each accepted
    n_acc = len(acc_idx)
    c_acc = ev_c[acc_idx].astype(np.uint64)            # codes of accepted events
    comp_acc = (3 ^ ev_c[acc_idx]).astype(np.uint64)
    mask = np.uint64((1 << (2 * k)) - 1)
    kf_acc = np.zeros(n_acc, dtype=np.uint64)
    kr_acc = np.zeros(n_acc, dtype=np.uint64)
    for j in range(k):                                  # window over accepted stream
        if j == 0:
            kf_acc |= c_acc
            kr_acc |= comp_acc << np.uint64(2 * (k - 1))
        else:
            kf_acc[j:] |= c_acc[:-j] << np.uint64(2 * j)
            kr_acc[j:] |= comp_acc[:-j] << np.uint64(2 * (k - 1 - j))
    kf = np.zeros(n_ev, dtype=np.uint64)
    kr = np.zeros(n_ev, dtype=np.uint64)
    kf[acc_idx] = kf_acc & mask
    kr[acc_idx] = kr_acc
    sym = valid & (kf == kr)

    # slots = ambiguous events + non-symmetric accepted events
    is_slot = (~valid) | (valid & ~sym)
    slot_idx = np.nonzero(is_slot)[0]
    # l counter: counts non-symmetric accepted events since last reset
    inc = (valid & ~sym).astype(np.int64)
    csum = np.cumsum(inc)
    reset_base = np.zeros(n_ev, dtype=np.int64)
    amb_pos = np.nonzero(~valid)[0]
    if len(amb_pos) > 0:
        reset_at = csum[amb_pos]
        reset_base = np.zeros(n_ev, dtype=np.int64)
        fill = np.zeros(n_ev, dtype=np.int64)
        fill[amb_pos] = reset_at - np.concatenate(([0], reset_at[:-1]))
        reset_base = np.maximum.accumulate(np.where(~valid, csum, 0))
    lvals = csum - reset_base  # post-increment l at each event (0 for ambiguous)

    # kmer_span
    if is_hpc:
        # queue counts ALL accepted events since reset (incl. symmetric)
        acc = valid.astype(np.int64)
        acc_csum = np.cumsum(acc)
        acc_base = np.maximum.accumulate(np.where(~valid, acc_csum, 0))
        cnt = acc_csum - acc_base                       # queue length after push
        skip_c = np.where(valid, skip, 0)
        scs = np.cumsum(skip_c)
        # span = sum of last min(cnt, k) skips among accepted events
        # find the accepted event k back: use positions of accepted events
        acc_rank = acc_csum - 1                         # rank among accepted (0-based)
        acc_pos_of_rank = np.full(n_ev + 1, -1, dtype=np.int64)
        ap = np.nonzero(valid)[0]
        acc_pos_of_rank[: len(ap)] = ap
        back_rank = acc_rank - k                        # accepted event shifted out
        has_back = valid & (cnt > k)
        span = np.where(valid, scs, 0)
        base = np.zeros(n_ev, dtype=np.int64)
        hb = np.nonzero(has_back)[0]
        base[hb] = scs[acc_pos_of_rank[back_rank[hb]]]
        # if cnt <= k but run-reset: subtract sum before run start
        first_k = valid & (cnt <= k)
        fk = np.nonzero(first_k)[0]
        run_start_excl = acc_rank - cnt                 # accepted rank before run
        sel = fk[run_start_excl[fk] >= 0]
        base[sel] = scs[acc_pos_of_rank[run_start_excl[sel]]]
        span = span - base
    else:
        span = np.minimum(lvals, k)  # for kept events, l here = min(l_prev+1, k)
        # note: span for symmetric/ambiguous events is unused

    z = (kf >= kr).astype(np.uint64)
    chosen = np.where(z == 0, kf, kr)
    h = hash64(chosen, mask)

    X = np.full(n_ev, UMAX, dtype=np.uint64)
    Y = np.full(n_ev, UMAX, dtype=np.uint64)
    ok = valid & ~sym & (lvals >= k) & (span < 256)
    X[ok] = (h[ok] << np.uint64(8)) | span[ok].astype(np.uint64)
    Y[ok] = ((np.uint64(rid) << np.uint64(32))
             | (pos[ok].astype(np.uint64) << np.uint64(1)) | z[ok])

    return X[slot_idx], Y[slot_idx], lvals[slot_idx]


def sketch(seq, w: int, k: int, rid: int, is_hpc: bool):
    """Vectorized sketch; bit-identical to sketch_ref (same values, same order)."""
    if isinstance(seq, (bytes, str)):
        codes = SEQ_NT4[np.frombuffer(seq.encode() if isinstance(seq, str) else seq,
                                      dtype=np.uint8)]
    else:
        codes = np.asarray(seq, dtype=np.uint8)
    assert len(codes) > 0 and 0 < w < 256 and 0 < k <= 28
    X, Y, L = _event_stream(codes, w, k, rid, is_hpc)
    return _window_scan(X, Y, L, w, k)


def _window_scan(X, Y, L, w: int, k: int):
    """The sliding-window min emission over the slot stream (pure python scan
    over the compressed stream; exact port of the buffer logic)."""
    MAXV = 0xFFFFFFFFFFFFFFFF
    Xl = X.tolist(); Yl = Y.tolist(); Ll = L.tolist()
    buf = [(MAXV, MAXV)] * w
    out_x: list[int] = []
    out_y: list[int] = []
    mn = (MAXV, MAXV)
    buf_pos = min_pos = 0
    for t in range(len(Xl)):
        info = (Xl[t], Yl[t])
        l = Ll[t]
        buf[buf_pos] = info
        if l == w + k - 1 and mn[0] != MAXV:
            for j in range(buf_pos + 1, w):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_x.append(buf[j][0]); out_y.append(buf[j][1])
            for j in range(buf_pos):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out_x.append(buf[j][0]); out_y.append(buf[j][1])
        if info[0] <= mn[0]:
            if l >= w + k and mn[0] != MAXV:
                out_x.append(mn[0]); out_y.append(mn[1])
            mn, min_pos = info, buf_pos
        elif buf_pos == min_pos:
            if l >= w + k - 1 and mn[0] != MAXV:
                out_x.append(mn[0]); out_y.append(mn[1])
            mn = (MAXV, MAXV)
            for j in range(buf_pos + 1, w):
                if mn[0] >= buf[j][0]:
                    mn, min_pos = buf[j], j
            for j in range(buf_pos + 1):
                if mn[0] >= buf[j][0]:
                    mn, min_pos = buf[j], j
            if l >= w + k - 1 and mn[0] != MAXV:
                for j in range(buf_pos + 1, w):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_x.append(buf[j][0]); out_y.append(buf[j][1])
                for j in range(buf_pos + 1):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out_x.append(buf[j][0]); out_y.append(buf[j][1])
        buf_pos += 1
        if buf_pos == w:
            buf_pos = 0
    if mn[0] != MAXV:
        out_x.append(mn[0]); out_y.append(mn[1])
    return np.array(out_x, dtype=np.uint64), np.array(out_y, dtype=np.uint64)
