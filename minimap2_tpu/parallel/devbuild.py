"""TPU-side minimizer index construction.

The reference builds its index on the host with a 3-thread pipeline
(read -> sketch -> bucket-scatter, index.c:315-399) plus a parallel
bucket finalize (kt_for over 2^14 buckets, index.c:280-283).  On a TPU
host with few cores that design is the cold-start bottleneck (minutes
for a 1 Gb genome), while the device is idle.  This module is the
TPU-native equivalent: the WHOLE build -- sketch, sort, distinct-key
compaction, bucket table -- runs on the device, and the finished
DeviceIndex never leaves HBM (the host->device link here uploads at
~350 MB/s but downloads ~1 MB/s, so nothing big may come back).

Layout produced (the binary-search probe layout of DeviceIndex):
  keys2 (K, 2) u32   sorted distinct minimizer hashes as (hi, lo)
  sc2   (K, 2) i32   (start, count) into pos2
  pos2  (P,)   u32   (global_end_pos << 1 | strand), sorted by (key, pos)
  bucket_start (2^bb + 1,) i32  searchsorted(keys >> shift) table
  S     (T,)   u8    nt4 codes with OV-wide code-4 separators between
                     sequences (see below)

Chunking correctness: a position p's minimizer flag depends only on
windows [p-w+1, p] -> codes [p-k-w+2, p+w-1] (sketch_pallas emission
rule, itself parity-tested against mm_sketch).  Sequences are
concatenated with OV = k + 2w - 3 code-4 separator bytes (code 4 =
ambiguous) before/between/after; rows of length LC tile the flat array
at stride STEP = LC - OV, and each row owns local positions
[LCTX, LCTX + STEP) with LCTX = k + w - 2.  The separators invalidate
any k-mer or window crossing a sequence boundary, which reproduces the
reference's sequence-start/end semantics exactly (mm_sketch's l-counter
resets, sketch.c:89-140) -- no per-row masks needed.

Coordinates: positions are stored in the SEPARATED global space, and
seq_off records each sequence's separated offset, so rid recovery and
reference-sequence gathers (_gather_s) work unchanged.

Scope: 2k <= 56 (all presets); genomes up to 4 Gb total separated bp
and any contig count (GRCh38's 195 included).  < 2^31 bp uses pos_fmt 1
(strand in the position LSB); 2^31..2^32 uses pos_fmt 2 (full u32
positions, strand bitmap, 4-bit packed reference plane) -- the same
regimes as DeviceIndex.from_host.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

UMAX = np.uint32(0xFFFFFFFF)


@dataclass
class DevBuildMeta:
    """Host-side metadata of a device-built index."""
    names: list
    seq_off: np.ndarray        # separated-space offsets (i64)
    seq_len: np.ndarray        # true lengths (i64)
    w: int
    k: int
    n_mini: int                # total minimizer occurrences
    n_distinct: int            # distinct minimizer hashes
    mid_occ: int               # cal_max_occ(2e-4) analogue

    def seq_table(self):
        """A MiniIndex-shaped shim carrying only the per-sequence
        metadata (what the PAF/SAM emitters need)."""
        from ..index.index import MiniIndex, SeqMeta
        mi = MiniIndex(self.w, self.k, 14, 0)
        for nm, off, ln in zip(self.names, self.seq_off, self.seq_len):
            mi.seq.append(SeqMeta(str(nm), int(off), int(ln)))
        return mi


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shr_cols(x, d, fill):
    """x shifted right by d columns (x[:, p-d] lands at column p)."""
    return jnp.concatenate(
        [jnp.full((x.shape[0], d), fill, x.dtype), x[:, :-d]], axis=1)


def _shl_cols(x, d, fill):
    """x shifted left by d columns (x[:, p+d] lands at column p)."""
    return jnp.concatenate(
        [x[:, d:], jnp.full((x.shape[0], d), fill, x.dtype)], axis=1)


def _edge_fix(hhi, hlo, valid, is_mini, rows, k: int, w: int):
    """Reproduce mm_sketch's lazy-emission edge behaviour exactly
    (sketch.c:89-143): at an ambiguous-base reset the scan silently
    DROPS its current window minimum (l resets before the min can be
    emitted), while at a true sequence end the final flush EMITS the
    current minimum even when no complete window exists.  The current
    minimum is always the latest-position argmin of the trailing w
    slots, so both events reduce to a windowed latest-argmin:

      * reset  = first base of a real-N run (code 4): drop the latest
        argmin of slots [p-w, p).
      * flush  = first byte of the inter-sequence separator (code 5):
        add it.

    Known residual divergences, both vanishingly rare and additive-only
    in repeat regions: symmetric k-mers count as window slots here (the
    reference skips their buffer slot entirely), and two ambiguity
    resets within w positions interact through the reference's buffer
    in a way this per-event rule does not model."""
    big = jnp.uint32(0xFFFFFFFF)
    xhi = jnp.where(valid, hhi, big)
    xlo = jnp.where(valid, hlo, big)
    c = rows
    prev = _shr_cols(c, 1, 5)
    reset = (c == 4) & (prev != 4)
    flush = (c == 5) & (prev != 5)
    event = reset | flush
    wm_hi = jnp.full_like(xhi, big)
    wm_lo = jnp.full_like(xlo, big)
    for d in range(1, w + 1):           # min over slots [p-w, p)
        shh = _shr_cols(xhi, d, big)
        shl = _shr_cols(xlo, d, big)
        lt = (shh < wm_hi) | ((shh == wm_hi) & (shl < wm_lo))
        wm_hi = jnp.where(lt, shh, wm_hi)
        wm_lo = jnp.where(lt, shl, wm_lo)
    have = event & ~((wm_hi == big) & (wm_lo == big))
    seen = jnp.zeros(c.shape, bool)
    dropm = jnp.zeros(c.shape, bool)
    addm = jnp.zeros(c.shape, bool)
    for d in range(1, w + 1):           # smallest d = latest position
        eq = (_shr_cols(xhi, d, big) == wm_hi) \
            & (_shr_cols(xlo, d, big) == wm_lo) & have
        hit = eq & ~seen
        seen = seen | eq
        dropm = dropm | _shl_cols(hit & reset, d, False)
        addm = addm | _shl_cols(hit & flush, d, False)
    return (is_mini & ~dropm) | (addm & valid)


@functools.partial(jax.jit, static_argnames=("NR", "LC", "STEP", "OV",
                                             "LCTX", "k", "w", "CAPC",
                                             "wide", "fmt2", "interpret"),
                   donate_argnums=(1, 2, 3, 4))
def _sketch_chunk(S, keys_buf, khi_buf, pos_buf, str_buf, n_off, base_row,
                  base_off, *, NR, LC, STEP, OV, LCTX, k, w, CAPC, wide,
                  fmt2, interpret):
    """Sketch NR rows starting at flat offset base_off, compact the
    owned minimizers to the front, and append them to the global
    (key, pos) buffers at n_off.

    fmt2 (>= 2^31 bp genomes): positions are the full u32 separated
    offset (no strand bit), the strand rides in its own u8 plane, and
    all offset arithmetic is uint32 (base_off itself may exceed 2^31)."""
    X = lax.dynamic_slice(S, (base_off,), (NR * STEP + OV,))
    main = X[:NR * STEP].reshape(NR, STEP)
    tail = lax.dynamic_slice(S, (base_off + STEP,),
                             (NR * STEP,)).reshape(NR, STEP)[:, :OV]
    rows = jnp.concatenate([main, tail], axis=1)              # (NR, LC)
    lens = jnp.full((NR,), LC, jnp.int32)
    if interpret:
        from .batch import device_sketch
        hhi, hlo, z, is_mini, valid = device_sketch(rows, lens, k, w,
                                                    with_valid=True)
    else:
        from ..ops.sketch_pallas import sketch_batch
        hhi, hlo, z, is_mini, valid = sketch_batch(rows, lens, G=8, T=512,
                                                   k=k, w=w)
    is_mini = _edge_fix(hhi, hlo, valid, is_mini, rows, k, w)
    posl = lax.broadcasted_iota(jnp.int32, (NR, LC), 1)
    owned = (posl >= LCTX) & (posl < LCTX + STEP)
    valid = is_mini & owned
    # global separated position of the k-mer END
    if fmt2:
        gpos_u = (posl.astype(jnp.uint32)
                  + (base_row.astype(jnp.uint32)
                     * jnp.uint32(STEP))[None, None]
                  + lax.broadcasted_iota(jnp.uint32, (NR, LC), 0)
                  * jnp.uint32(STEP))
        pval = gpos_u
    else:
        gpos = (posl + (base_row * STEP)[None, None]
                + lax.broadcasted_iota(jnp.int32, (NR, LC), 0) * STEP)
        pval = ((gpos.astype(jnp.uint32) << jnp.uint32(1))
                | z.astype(jnp.uint32))
    # compaction via nonzero+gather, NOT a sort: a 67M-lane lax.sort
    # costs ~30 s of XLA compile; order does not matter here (the
    # global (key, pos) sort downstream fixes it)
    vflat = valid.reshape(-1)
    cnt = jnp.sum(vflat, dtype=jnp.int32)
    idx = jnp.nonzero(vflat, size=CAPC, fill_value=vflat.shape[0] - 1)[0]
    sel = jnp.arange(CAPC, dtype=jnp.int32) < cnt
    skey = jnp.where(sel, hlo.reshape(-1)[idx], UMAX)
    pval = jnp.where(sel, pval.reshape(-1)[idx], jnp.uint32(0))
    if wide:
        skhi = jnp.where(sel, hhi.reshape(-1)[idx], UMAX)
        khi_buf = lax.dynamic_update_slice(khi_buf, skhi, (n_off,))
    if fmt2:
        sstr = jnp.where(sel, z.reshape(-1)[idx].astype(jnp.uint8),
                         jnp.uint8(0))
        str_buf = lax.dynamic_update_slice(str_buf, sstr, (n_off,))
    keys_buf = lax.dynamic_update_slice(keys_buf, skey, (n_off,))
    pos_buf = lax.dynamic_update_slice(pos_buf, pval, (n_off,))
    return keys_buf, khi_buf, pos_buf, str_buf, n_off + cnt, cnt


@functools.partial(jax.jit, static_argnames=("NPAD",),
                   donate_argnums=(0,))
def _trim(buf, *, NPAD):
    """Shrink a capture buffer to the sort size in its own donated
    program: the sort's donation cannot alias buffers of unequal size,
    so sorting CAP_TOT-sized buffers into NPAD-sized outputs held both
    generations live (the 3 Gb-genome OOM: 16.09 of 15.75 GB HBM)."""
    return buf[:NPAD]


@functools.partial(jax.jit, static_argnames=("NPAD", "wide", "fmt2"),
                   donate_argnums=(0, 1, 2, 3))
def _global_sort(keys_buf, khi_buf, pos_buf, str_buf, n, *, NPAD, wide,
                 fmt2):
    """Sort all collected (key, pos) pairs by (key, pos) and count the
    distinct keys among the first n entries.  fmt2 carries the strand
    plane through the same permutation (positions are unique per entry,
    so (key, pos) remains a total order)."""
    keys_buf = keys_buf[:NPAD]
    pos_buf = pos_buf[:NPAD]
    extra = (str_buf[:NPAD],) if fmt2 else ()
    if wide:
        khi_buf = khi_buf[:NPAD]
        khi_buf, keys_buf, pos_buf, *extra = lax.sort(
            (khi_buf, keys_buf, pos_buf) + extra, num_keys=3)
    else:
        keys_buf, pos_buf, *extra = lax.sort(
            (keys_buf, pos_buf) + extra, num_keys=2)
    str_out = extra[0] if fmt2 else str_buf
    i = jnp.arange(keys_buf.shape[0])
    neq = (keys_buf != jnp.roll(keys_buf, 1)) | (
        (khi_buf != jnp.roll(khi_buf, 1)) if wide else False)
    neq = neq.at[0].set(True) & (i < n)
    K = jnp.sum(neq, dtype=jnp.int32)
    return keys_buf, khi_buf, pos_buf, str_out, neq, K


@functools.partial(jax.jit, static_argnames=("KPAD", "NPAD", "wide",
                                             "with_krows"),
                   donate_argnums=(0, 1, 2, 3))
def _compact(keys_s, khi_s, pos_s, neq, n, *, KPAD, NPAD, wide,
             with_krows=True):
    """Distinct-key compaction (the worker_post analogue, index.c:226-278,
    as a rank-scatter).  All NPAD-sized inputs are DONATED: the sorted
    key/pos planes are the single largest live buffers at this point and
    r03's bench died on a compile-time HBM OOM when they were held across
    the (then-fused) bucket-table retry loop.  The bucket table is built
    separately (_bucket_table) from the KPAD-sized output so retrying a
    different bucket width never re-touches NPAD-sized arrays."""
    i = jnp.arange(NPAD, dtype=jnp.int32)
    # rank of each run-start among distinct keys; i32 throughout (a
    # size=KPAD jnp.nonzero would build int64 NPAD-scale intermediates)
    rank = jnp.cumsum(neq.astype(jnp.int32)) - 1
    tgt = jnp.where(neq, rank, jnp.int32(KPAD))      # OOB rows -> dropped
    starts = jnp.full((KPAD,), n, jnp.int32).at[tgt].set(i, mode="drop")
    counts = jnp.diff(jnp.append(starts, jnp.int32(n)))
    gi = jnp.minimum(starts, jnp.int32(NPAD - 1))
    pad = starts >= n
    klo_c = jnp.where(pad, UMAX, keys_s[gi])
    if wide:
        khi_c = jnp.where(pad, UMAX, khi_s[gi])
    else:
        khi_c = jnp.where(pad, UMAX, jnp.uint32(0))
    keys2 = jnp.stack([khi_c, klo_c], axis=1)
    # windowed-probe row plane: 64 interleaved (hi, lo) pairs per
    # 128-lane row -- minor dim 128 keeps every XLA layout compact (a
    # (K, 2) operand of a row gather gets relaid out to {1,0:T(8,128)},
    # a 64x pad = 49 GB at 1 Gb scale; see DeviceIndex.krows).  Built by
    # strided lane scatters: every intermediate keeps minor dim >= 64 so
    # layout assignment can never pick a padded tiling for it.
    if with_krows:
        r64 = KPAD // 64
        krows = jnp.zeros((r64, 128), jnp.uint32)
        krows = krows.at[:, 0::2].set(khi_c.reshape(r64, 64))
        krows = krows.at[:, 1::2].set(klo_c.reshape(r64, 64))
    else:
        # h2r planned: skip the windowed-probe plane (KPAD*8 bytes of
        # peak HBM at GRCh38 scale); _krows_build recovers it from
        # keys2 if the h2r build ends up failing
        krows = jnp.zeros((1, 128), jnp.uint32)
    sc2 = jnp.stack([starts, counts.astype(jnp.int32)], axis=1)
    # occurrence-count histogram (clipped at 2^16): the exact k-smallest
    # of mm_idx_cal_max_occ (index.c:198-220) reads off its cumsum -- a
    # full sort of the counts would cost ~30 s of XLA compile alone
    CLIP = 1 << 16
    hist = jnp.zeros((CLIP,), jnp.int32).at[
        jnp.where(pad, 0, jnp.minimum(counts, CLIP - 1))].add(1)
    chist = jnp.cumsum(hist)
    return keys2, krows, sc2, pos_s, chist


@functools.partial(jax.jit, static_argnames=("NPAD",), donate_argnums=(0,))
def _pack_strand(str_s, *, NPAD):
    """Sorted strand u8 plane -> little-bit-order bitmap (the pstrand
    side plane of pos_fmt 2; bit j of byte b = strand[8b+j]).  Strided
    1D slices only -- no small-minor-dim intermediates."""
    out = jnp.zeros((NPAD // 8,), jnp.uint8)
    for i in range(8):
        out = out | (str_s[i::8] << jnp.uint8(i))
    return out


@functools.partial(jax.jit, static_argnames=("CH",),
                   donate_argnums=(1,))
def _pack_s4_piece(S, out, off, *, CH):
    x = lax.dynamic_slice(S, (off,), (CH,)).astype(jnp.int32)
    x = jnp.minimum(x, 4)
    o = (x[0::2] | (x[1::2] << 4)).astype(jnp.uint8)
    return lax.dynamic_update_slice(out, o, (off // jnp.uint32(2),))


def _pack_s4_dev(S):
    """nt4 u8 -> two 4-bit codes per byte, on device (s_fmt 1; the
    device twin of batch._pack_s4).  Chunked: u8 arithmetic promotes to
    i32 inside XLA, so packing the whole plane at once materialized a
    4x-genome-sized program (the 3 Gb pack-step OOM); 2^28-byte pieces
    keep the temps under ~2 GB."""
    T = int(S.shape[0])
    CH = min(1 << 28, T)
    out = jnp.zeros((T // 2,), jnp.uint8)
    off = 0
    while off + CH <= T:
        out = _pack_s4_piece(S, out, jnp.uint32(off), CH=CH)
        off += CH
    if off < T:
        out = _pack_s4_piece(S, out, jnp.uint32(off), CH=T - off)
    return out


@functools.partial(jax.jit, static_argnames=("NB", "CAPM", "key_bits",
                                             "stride2"))
def _h2rows_try(keys2, sc2, K, *, NB, CAPM, key_bits, stride2=False):
    """Device build of the payload-fused 2-choice bucket table (the
    2-gather probe; see batch.DeviceIndex.h2r / batch.build_h2rows_np).

    Choice 1 = mulhi(top32(key), NB) is MONOTONE over the sorted distinct
    keys, so within-bucket ranks come from run positions with a cummax --
    no extra genome-scale sort.  Overflow keys (> 32 deep) are compacted
    (<= CAPM of them) and fall to choice 2 = the Fibonacci rehash; any
    key failing both is counted in n_ov and the host grows NB + retries.
    Returns (rows (NB, 128) u32, n_ov, n_movers)."""
    from .batch import H2R_SLOTS, _mulhi_u32
    khi, klo = keys2[:, 0], keys2[:, 1]
    KPAD = khi.shape[0]
    i = jnp.arange(KPAD, dtype=jnp.int32)
    pad = i >= K
    # choice 1 = Fibonacci hash (NOT value interpolation: minimizer keys
    # are window MINIMA of hash64 values, so their magnitudes skew low
    # and interpolation overloads the low buckets ~5x); ranks within
    # buckets come from one (b1, idx) sort
    b1 = jnp.where(pad, NB,
                   _mulhi_u32(klo * jnp.uint32(2654435769),
                              NB).astype(jnp.int32))
    b1s, ord1 = lax.sort((b1, i), num_keys=1)
    runstart = jnp.concatenate([jnp.ones(1, bool), b1s[1:] != b1s[:-1]])
    grp = lax.cummax(jnp.where(runstart, i, 0))
    rank1s = i - grp
    placed1s = (rank1s < H2R_SLOTS) & (b1s < NB)
    # back to key order (scatter the sorted-ranks through ord1)
    rank1 = jnp.zeros((KPAD,), jnp.int32).at[ord1].set(rank1s)
    placed1 = jnp.zeros((KPAD,), bool).at[ord1].set(placed1s)
    occ1 = jnp.zeros((NB + 1,), jnp.int32).at[b1].add(
        placed1.astype(jnp.int32), mode="drop")
    k11 = (((klo >> jnp.uint32(11)) | (khi << jnp.uint32(21)))
           * jnp.uint32(2654435761))
    b2 = _mulhi_u32(k11, NB).astype(jnp.int32)
    mover = ~placed1 & ~pad
    n_mv = jnp.sum(mover, dtype=jnp.int32)
    midx = jnp.nonzero(mover, size=CAPM,
                       fill_value=KPAD - 1)[0].astype(jnp.int32)
    msel = jnp.arange(CAPM, dtype=jnp.int32) < n_mv
    mb2 = jnp.where(msel, b2[midx], NB)
    mb2s, mord = lax.sort((mb2, jnp.arange(CAPM, dtype=jnp.int32)),
                          num_keys=1)
    j = jnp.arange(CAPM, dtype=jnp.int32)
    rs2 = jnp.concatenate([jnp.ones(1, bool), mb2s[1:] != mb2s[:-1]])
    grp2 = lax.cummax(jnp.where(rs2, j, 0))
    rank2 = j - grp2
    occ_at = occ1[jnp.minimum(mb2s, NB)]
    placed2 = (rank2 < H2R_SLOTS - occ_at) & (mb2s < NB)
    n_ov = n_mv - jnp.sum(placed2, dtype=jnp.int32)
    wide = key_bits > 31
    starts_u = sc2[:, 0].astype(jnp.uint32)
    cnts_u = sc2[:, 1].astype(jnp.uint32)
    if stride2:
        # [key|cnt_hi2<<30, start|cnt_lo4<<28] (batch.py H2R stride 2)
        cnt6 = jnp.minimum(cnts_u, jnp.uint32(63))
        vals = (klo | ((cnt6 >> jnp.uint32(4)) << jnp.uint32(30)),
                starts_u | ((cnt6 & jnp.uint32(15)) << jnp.uint32(28)))
        stw = 2
    else:
        vals = (khi if wide else klo,
                klo if wide else jnp.zeros_like(klo),
                starts_u, cnts_u)
        stw = 4
    ROWW = stw * H2R_SLOTS
    flat = jnp.full((NB * ROWW,), UMAX, jnp.uint32)
    tgt1 = jnp.where(placed1, b1 * ROWW + rank1 * stw, NB * ROWW)
    for d, v in enumerate(vals):
        flat = flat.at[tgt1 + d].set(v, mode="drop")
    orig = midx[mord]
    tgt2 = jnp.where(placed2, mb2s * ROWW + (occ_at + rank2) * stw,
                     NB * ROWW)
    for d, v in enumerate(vals):
        flat = flat.at[tgt2 + d].set(v[orig], mode="drop")
    return flat.reshape(NB, ROWW), n_ov, n_mv


@functools.partial(jax.jit, static_argnames=("NB", "ROWW"))
def _h2r_alloc(*, NB, ROWW):
    return jnp.full((NB * ROWW,), UMAX, jnp.uint32)


@functools.partial(jax.jit, static_argnames=("NB", "CK", "CKM", "key_bits",
                                             "stride2"),
                   donate_argnums=(2, 3, 4))
def _h2r_chunk(keys2, sc2, flat, occ, mvbuf, mv_n, off, K, *, NB, CK, CKM,
               key_bits, stride2):
    """One CK-key slice of the chunked h2r pass-1: rank the slice's keys
    within their choice-1 buckets given the running occupancy `occ`,
    scatter the placed entries into `flat`, and append overflow keys'
    global indices to `mvbuf`.  Peak memory is O(CK), so GRCh38-scale
    builds fit where the monolithic rank sort OOMed."""
    from .batch import H2R_SLOTS, _mulhi_u32
    kh = lax.dynamic_slice(keys2, (off, 0), (CK, 2))
    khi, klo = kh[:, 0], kh[:, 1]
    sc = lax.dynamic_slice(sc2, (off, 0), (CK, 2))
    i_local = jnp.arange(CK, dtype=jnp.int32)
    pad = (off + i_local) >= K
    b1 = jnp.where(pad, NB,
                   _mulhi_u32(klo * jnp.uint32(2654435769),
                              NB).astype(jnp.int32))
    b1s, ord1 = lax.sort((b1, i_local), num_keys=1)
    runstart = jnp.concatenate([jnp.ones(1, bool), b1s[1:] != b1s[:-1]])
    grp = lax.cummax(jnp.where(runstart, i_local, 0))
    rank_c = jnp.zeros((CK,), jnp.int32).at[ord1].set(i_local - grp)
    prior = occ[jnp.minimum(b1, NB)]
    rank = prior + rank_c
    placed = (rank < H2R_SLOTS) & ~pad
    occ = occ.at[b1].add((~pad).astype(jnp.int32), mode="drop")
    starts_u = sc[:, 0].astype(jnp.uint32)
    cnts_u = sc[:, 1].astype(jnp.uint32)
    if stride2:
        cnt6 = jnp.minimum(cnts_u, jnp.uint32(63))
        vals = (klo | ((cnt6 >> jnp.uint32(4)) << jnp.uint32(30)),
                starts_u | ((cnt6 & jnp.uint32(15)) << jnp.uint32(28)))
        stw = 2
    else:
        vals = (khi if key_bits > 31 else klo,
                klo if key_bits > 31 else jnp.zeros_like(klo),
                starts_u, cnts_u)
        stw = 4
    ROWW = stw * H2R_SLOTS
    tgt = jnp.where(placed, b1 * ROWW + rank * stw, NB * ROWW)
    for d, v in enumerate(vals):
        flat = flat.at[tgt + d].set(v, mode="drop")
    mover = ~placed & ~pad
    n_mv_c = jnp.sum(mover, dtype=jnp.int32)
    midx_c = jnp.nonzero(mover, size=CKM,
                         fill_value=CK - 1)[0].astype(jnp.int32)
    gmov = jnp.where(jnp.arange(CKM, dtype=jnp.int32) < n_mv_c,
                     off + midx_c, -1)
    mvbuf = lax.dynamic_update_slice(mvbuf, gmov, (mv_n,))
    return flat, occ, mvbuf, n_mv_c


@functools.partial(jax.jit, static_argnames=("NB", "key_bits", "stride2"),
                   donate_argnums=(2,))
def _h2r_pass2(keys2, sc2, flat, occ, mvbuf, mv_n, K, *, NB, key_bits,
               stride2):
    """Chunked build pass 2: place the collected overflow keys via
    choice 2 into the remaining slot capacity; returns (flat, n_ov)."""
    from .batch import H2R_SLOTS, _mulhi_u32
    CAPM = mvbuf.shape[0]
    j = jnp.arange(CAPM, dtype=jnp.int32)
    ok = (j < mv_n) & (mvbuf >= 0)
    gi = jnp.clip(mvbuf, 0, keys2.shape[0] - 1)
    khi = keys2[gi, 0]
    klo = keys2[gi, 1]
    k11 = (((klo >> jnp.uint32(11)) | (khi << jnp.uint32(21)))
           * jnp.uint32(2654435761))
    b2 = jnp.where(ok, _mulhi_u32(k11, NB).astype(jnp.int32), NB)
    b2s, mord = lax.sort((b2, j), num_keys=1)
    rs2 = jnp.concatenate([jnp.ones(1, bool), b2s[1:] != b2s[:-1]])
    grp2 = lax.cummax(jnp.where(rs2, j, 0))
    rank2 = j - grp2
    occ_slots = jnp.minimum(occ[jnp.minimum(b2s, NB)],
                            jnp.int32(H2R_SLOTS))
    placed2 = (rank2 < H2R_SLOTS - occ_slots) & (b2s < NB)
    n_ov = jnp.sum(ok, dtype=jnp.int32)         - jnp.sum(placed2, dtype=jnp.int32)
    orig = gi[mord]
    starts_u = sc2[orig, 0].astype(jnp.uint32)
    cnts_u = sc2[orig, 1].astype(jnp.uint32)
    klo_o = keys2[orig, 1]
    khi_o = keys2[orig, 0]
    if stride2:
        cnt6 = jnp.minimum(cnts_u, jnp.uint32(63))
        vals = (klo_o | ((cnt6 >> jnp.uint32(4)) << jnp.uint32(30)),
                starts_u | ((cnt6 & jnp.uint32(15)) << jnp.uint32(28)))
        stw = 2
    else:
        vals = (khi_o if key_bits > 31 else klo_o,
                klo_o if key_bits > 31 else jnp.zeros_like(klo_o),
                starts_u, cnts_u)
        stw = 4
    ROWW = stw * H2R_SLOTS
    tgt2 = jnp.where(placed2, b2s * ROWW + (occ_slots + rank2) * stw,
                     NB * ROWW)
    for d, v in enumerate(vals):
        flat = flat.at[tgt2 + d].set(v, mode="drop")
    return flat, n_ov


def _build_h2r_chunked(keys2, sc2, K, KPAD, key_bits, stride2, NB0,
                       verbose, t0):
    """GRCh38-scale h2r build: O(CK) peak instead of the monolithic
    KPAD-scale rank sort.  Returns (rows, NB) or (None, 0)."""
    import sys
    import time
    from .batch import H2R_SLOTS
    stw = 2 if stride2 else 4
    ROWW = stw * H2R_SLOTS
    CK = 16 << 20
    while KPAD % CK:
        CK >>= 1
    CKM = max(CK // 4, 1 << 18)
    CAPM = _round_up(max(KPAD // 16, 1 << 20), 1 << 20)
    NB = NB0
    for _try in range(3):
        flat = _h2r_alloc(NB=NB, ROWW=ROWW)
        occ = jnp.zeros((NB + 1,), jnp.int32)
        mvbuf = jnp.full((CAPM,), -1, jnp.int32)
        mv_n = 0
        ok = True
        try:
            for off in range(0, KPAD, CK):
                flat, occ, mvbuf, nmv = _h2r_chunk(
                    keys2, sc2, flat, occ, mvbuf, jnp.int32(mv_n),
                    jnp.int32(off), jnp.int32(K), NB=NB, CK=CK, CKM=CKM,
                    key_bits=key_bits, stride2=stride2)
                mv_n += int(nmv)
                if mv_n > CAPM - CKM:
                    ok = False
                    break
            if ok:
                flat, n_ov_d = _h2r_pass2(keys2, sc2, flat, occ, mvbuf,
                                          jnp.int32(mv_n), jnp.int32(K),
                                          NB=NB, key_bits=key_bits,
                                          stride2=stride2)
                n_ov = int(n_ov_d)
                if n_ov <= max(0, K // 1_000_000):
                    if verbose:
                        print(f"[devbuild] h2rows(chunked) NB={NB} "
                              f"movers={mv_n} dropped={n_ov} "
                              f"({time.time()-t0:.1f}s)", file=sys.stderr)
                    return flat.reshape(NB, ROWW), NB
                if verbose:
                    print(f"[devbuild] h2rows(chunked) NB={NB}: "
                          f"overflow={n_ov}; growing", file=sys.stderr)
        except Exception as e:
            if verbose:
                print(f"[devbuild] h2rows(chunked) failed ({e})",
                      file=sys.stderr)
            return None, 0
        del flat, occ, mvbuf
        NB = int(NB * 1.12) + 1
    return None, 0


@jax.jit
def _krows_build(keys2):
    """(KPAD, 2) sorted keys -> the windowed-probe krows plane (64
    interleaved (hi, lo) pairs per 128-lane row); only needed when the
    h2r build was skipped or failed."""
    khi_c, klo_c = keys2[:, 0], keys2[:, 1]
    r64 = keys2.shape[0] // 64
    krows = jnp.zeros((r64, 128), jnp.uint32)
    krows = krows.at[:, 0::2].set(khi_c.reshape(r64, 64))
    krows = krows.at[:, 1::2].set(klo_c.reshape(r64, 64))
    return krows


@functools.partial(jax.jit, static_argnames=("bb", "shift"))
def _bucket_table(keys2, K, *, bb, shift):
    """bucket_start[b] = first distinct-key row whose (key >> shift) >= b.
    KPAD-sized only, so the grow-bb retry loop recompiles cheaply."""
    khi_c, klo_c = keys2[:, 0], keys2[:, 1]
    KPAD = keys2.shape[0]
    if shift >= 32:
        b_of = (khi_c >> jnp.uint32(shift - 32))
    elif shift > 0:
        b_of = (khi_c << jnp.uint32(32 - shift)) | (klo_c >> jnp.uint32(shift))
    else:
        b_of = klo_c
    NBK = 1 << bb
    pad = jnp.arange(KPAD, dtype=jnp.int32) >= K
    b_of = jnp.where(pad, jnp.uint32(NBK), b_of.astype(jnp.uint32))
    b_of = jnp.minimum(b_of, jnp.uint32(NBK)).astype(jnp.int32)
    bs = jnp.full((NBK + 1,), K, jnp.int32)
    bs = bs.at[b_of].min(jnp.arange(KPAD, dtype=jnp.int32))
    bs = lax.cummin(bs[::-1])[::-1]
    bmax = jnp.max(jnp.diff(bs))
    return bs, bmax


def build_device_index(names, codes_list, w: int, k: int,
                       cap_frac: float = 0.26, chunk_pos: int = 64 << 20,
                       occ_frac: float = 2e-4, interpret: bool = False,
                       verbose: bool = False,
                       force_pos_fmt: int | None = None,
                       consume: bool = False):
    """Build a DeviceIndex on the TPU from host nt4 code arrays.

    Returns (DeviceIndex, DevBuildMeta).  The index stays in HBM; only
    scalars (counts, bucket max, mid_occ) come back to the host.
    """
    from .batch import DeviceIndex
    import sys
    import time
    assert 2 * k <= 56, "device build supports k <= 28"
    wide = 2 * k >= 32          # keys need the hi u32 plane
    LC = 8192
    OV = _round_up(k + 2 * w - 3, 32)
    assert OV <= LC // 2
    STEP = LC - OV
    LCTX = k + w - 2
    t0 = time.time()
    # --- separated flat genome, assembled on device ---
    lens = np.array([len(c) for c in codes_list], np.int64)
    total_sep = OV + int(np.sum(lens + OV))
    NR = max(1, math.ceil((total_sep - OV) / STEP))
    NRC = max(8, min(_round_up(NR, 8), _round_up(chunk_pos // LC, 8)))
    n_calls = math.ceil(NR / NRC)
    # pad the row grid to whole chunks (surplus rows see only code-4
    # padding -> zero minimizers, so no position is owned twice), plus
    # one STEP of slack so the tail slice never hits the clamp
    NR = n_calls * NRC
    pad_to = NR * STEP + OV + STEP
    seq_off = OV + np.concatenate([[0], np.cumsum(lens + OV)[:-1]])
    # < 2^31 bp separated: pos_fmt 1 (strand in the position LSB);
    # 2^31..2^32: pos_fmt 2 (full u32 positions, strand bitmap) -- the
    # GRCh38-scale regime (index.c:50-110 has the same 2^32 total bound)
    if pad_to >= (1 << 32) - 1:
        raise ValueError("genome too large for device build (> 4 Gb)")
    fmt2 = total_sep >= (1 << 31) - 1
    if force_pos_fmt is not None:       # test hook: exercise the fmt2
        fmt2 = force_pos_fmt == 2       # path on small genomes
    # separators use code 5 (ambiguous like 4, but distinguishable from
    # a real N: _edge_fix flushes at 5-boundaries and drops at 4-resets)
    if consume:
        # GRCh38-scale: assemble S by donated in-place writes, freeing
        # each source contig as it is copied -- a concatenate would hold
        # genome + copy (2x ~3 GB) live simultaneously
        @functools.partial(jax.jit, donate_argnums=(0,))
        def _wr(Sb, part, off):
            return lax.dynamic_update_slice(Sb, part, (off,))

        S = jnp.full((pad_to,), 5, jnp.uint8)
        offs_w = [int(o) for o in seq_off]
        for j in range(len(codes_list)):
            c = codes_list[j]
            codes_list[j] = None            # drop the caller's reference
            if not isinstance(c, jax.Array):
                c = jax.device_put(np.ascontiguousarray(c, np.uint8))
            S = _wr(S, c.astype(jnp.uint8), jnp.uint32(offs_w[j])
                    if fmt2 else jnp.int32(offs_w[j]))
            del c
    else:
        sep = jnp.full((OV,), 5, jnp.uint8)
        parts = [sep]
        for c in codes_list:
            if isinstance(c, jax.Array):    # already in HBM (device gen)
                parts.append(c.astype(jnp.uint8))
            else:
                parts.append(jax.device_put(
                    np.ascontiguousarray(c, np.uint8)))
            parts.append(sep)
        if pad_to > total_sep:
            parts.append(jnp.full((pad_to - total_sep,), 5, jnp.uint8))
        S = jnp.concatenate(parts)
        del parts
    if verbose:
        print(f"[devbuild] upload+assemble {time.time()-t0:.1f}s "
              f"total_sep={total_sep}", file=sys.stderr)
    # --- chunked sketch + compaction ---
    CAPC = _round_up(int(NRC * STEP * cap_frac), 1 << 20)
    CAP_TOT = _round_up(int(NR * STEP * cap_frac), 1 << 20) + CAPC
    keys_buf = jnp.full((CAP_TOT,), UMAX, jnp.uint32)
    khi_buf = jnp.full((CAP_TOT if wide else 1,), UMAX, jnp.uint32)
    pos_buf = jnp.zeros((CAP_TOT,), jnp.uint32)
    str_buf = jnp.zeros((CAP_TOT if fmt2 else 1,), jnp.uint8)
    n_off = jnp.int32(0)
    cnts = []
    for ci in range(n_calls):
        tci = time.time()
        base_row = ci * NRC
        keys_buf, khi_buf, pos_buf, str_buf, n_off, cnt = _sketch_chunk(
            S, keys_buf, khi_buf, pos_buf, str_buf, n_off,
            jnp.uint32(base_row) if fmt2 else jnp.int32(base_row),
            jnp.uint32(base_row * STEP) if fmt2
            else jnp.int32(base_row * STEP),
            NR=NRC, LC=LC, STEP=STEP, OV=OV, LCTX=LCTX, k=k, w=w,
            CAPC=CAPC, wide=wide, fmt2=fmt2, interpret=interpret)
        cnts.append(cnt)
        if verbose:
            int(cnt)    # sync
            print(f"[devbuild]   chunk {ci}: {time.time()-tci:.1f}s",
                  file=sys.stderr)
    jax.block_until_ready(n_off)
    cnts_h = [int(c) for c in cnts]
    if max(cnts_h) > CAPC:
        raise OverflowError(
            f"minimizer density exceeded cap_frac={cap_frac}: "
            f"chunk count {max(cnts_h)} > {CAPC}; rebuild with a larger "
            "cap_frac")
    N = int(sum(cnts_h))
    if verbose:
        print(f"[devbuild] sketch {n_calls} chunks {time.time()-t0:.1f}s "
              f"n_mini={N}", file=sys.stderr)
    if verbose:
        la = sorted((x.nbytes, str(x.shape), str(x.dtype))
                    for x in jax.live_arrays())[::-1][:12]
        tot = sum(x.nbytes for x in jax.live_arrays())
        print(f"[devbuild] live HBM before pack: {tot/1e9:.2f} GB; top: "
              + "; ".join(f"{n/1e9:.2f}G {s} {d}" for n, s, d in la[:8]),
              file=sys.stderr)
    NPAD = min(_round_up(max(N, 1), 8 << 20), CAP_TOT)
    if NPAD < CAP_TOT:      # trim one buffer at a time (bounded peak)
        # block after each trim: trims cannot alias (unequal sizes), so
        # enqueueing all of them holds every (input, output) pair live
        # at once -- at 3.1 Gb that async peak is ~14.4 GB and OOMs;
        # serialized, the peak is one CAP_TOT+NPAD pair
        keys_buf = _trim(keys_buf, NPAD=NPAD)
        keys_buf.block_until_ready()
        if wide:
            khi_buf = _trim(khi_buf, NPAD=NPAD)
            khi_buf.block_until_ready()
        pos_buf = _trim(pos_buf, NPAD=NPAD)
        pos_buf.block_until_ready()
        if fmt2:
            str_buf = _trim(str_buf, NPAD=NPAD)
            str_buf.block_until_ready()
    if fmt2:
        # pack the reference plane to 4-bit BEFORE the genome-scale sort
        # (and after the trim frees the capture-buffer overhang): at 3 Gb
        # the u8 plane is ~20% of HBM and the sort is the peak
        assert S.shape[0] % 2 == 0      # pad_to is even by construction
        S = _pack_s4_dev(S)
    keys_s, khi_s, pos_s, str_s, neq, K = _global_sort(
        keys_buf, khi_buf, pos_buf, str_buf, jnp.int32(N),
        NPAD=NPAD, wide=wide, fmt2=fmt2)
    del keys_buf, khi_buf, pos_buf, str_buf
    K = int(K)
    if verbose:
        print(f"[devbuild] sort {time.time()-t0:.1f}s distinct={K}",
              file=sys.stderr)
    KPAD = _round_up(max(K, 1), 1 << 20)
    NPAD = min(NPAD, CAP_TOT)
    key_bits = 2 * k
    import os
    # h2r build peak (krows deferred): keys2+sc2 (KPAD*16) + the
    # (b1, idx) rank sort (~KPAD*16 transient) + the stride-4 table
    # (NB*1KB; stride-2 halves it) on top of pos2 + S.  Above ~12 GB
    # (GRCh38 scale: the failed-attempt state could not even rebuild the
    # krows fallback -- a chunked h2r rank build is the real fix)
    # keep the 4-gather krows probe instead of OOMing.
    _nb_est = max(64, -(-K // 44))
    _stride2_est = (key_bits <= 30 and N < (1 << 28))
    _base_mem = 4 * NPAD + (total_sep // 2 if fmt2 else total_sep)
    _tbl_mem = _nb_est * (512 if _stride2_est else 1024)
    _mono_peak = KPAD * 32 + _tbl_mem + _base_mem
    # chunked pass-1 replaces the KPAD-scale rank sort with O(CK) temps
    _chunk_peak = (KPAD * 16 + _tbl_mem + _base_mem + (KPAD // 16) * 4
                   + (16 << 20) * 48)
    _env = os.environ.get("MM2TPU_DEVBUILD_H2R", "1")
    _env_on = _env != "0"
    plan_mono = bool(K and _env_on and _env != "chunk"
                     and _mono_peak < 12.0e9)
    plan_chunk = bool(K and _env_on and not plan_mono
                      and _chunk_peak < 14.0e9)
    plan_h2r = plan_mono or plan_chunk
    keys2, krows, sc2, pos2, chist = _compact(
        keys_s, khi_s, pos_s, neq, jnp.int32(N),
        KPAD=KPAD, NPAD=NPAD, wide=wide, with_krows=not plan_h2r)
    del keys_s, khi_s, pos_s, neq      # donated -- already invalid
    h2r = None
    h2r_nb = 0
    if plan_chunk:
        from .batch import H2R_LOAD
        NBH = max(64, -(-K // H2R_LOAD))
        stride2 = key_bits <= 30 and N < (1 << 28)
        h2r_arr, nb_out = _build_h2r_chunked(keys2, sc2, K, KPAD,
                                             key_bits, stride2, NBH,
                                             verbose, t0)
        if h2r_arr is not None:
            h2r, h2r_nb = h2r_arr, nb_out
        if h2r is None:     # failed: recover the krows probe plane
            krows = _krows_build(keys2)
    elif plan_h2r:
        from .batch import H2R_LOAD
        CAPM = _round_up(max(KPAD // 16, 1 << 20), 1 << 20)
        NBH = max(64, -(-K // H2R_LOAD))
        stride2 = key_bits <= 30 and N < (1 << 28)
        for _ in range(5):
            try:
                flatr, n_ov_d, n_mv_d = _h2rows_try(keys2, sc2,
                                                    jnp.int32(K),
                                                    NB=NBH, CAPM=CAPM,
                                                    key_bits=key_bits,
                                                    stride2=stride2)
                n_ov_h, n_mv_h = int(n_ov_d), int(n_mv_d)
            except Exception as e:      # runtime OOM at the margin:
                if verbose:             # fall back to the krows probe
                    print(f"[devbuild] h2rows build failed ({e}); "
                          "keeping the krows probe", file=sys.stderr)
                break
            # residual overflow <= 1e-6 of keys is dropped (those
            # minimizers never match -- far below the occ filter's
            # effect); larger overflow grows the table and retries
            if n_mv_h <= CAPM and n_ov_h <= max(0, K // 1_000_000):
                h2r, h2r_nb = flatr, NBH
                break
            if verbose:
                print(f"[devbuild] h2rows NB={NBH}: movers={n_mv_h} "
                      f"overflow={n_ov_h}; growing", file=sys.stderr)
            del flatr
            NBH = int(NBH * 1.15) + 1
        if verbose and h2r is not None:
            print(f"[devbuild] h2rows NB={h2r_nb} movers={n_mv_h} "
                  f"dropped={n_ov_h} ({time.time()-t0:.1f}s)",
                  file=sys.stderr)
        if h2r is None:     # failed after retries: recover krows
            krows = _krows_build(keys2)
    if h2r is not None:
        # the 2-gather payload probe replaces keys2/sc2/krows/bucket_start
        bs = jnp.zeros((2,), jnp.int32)
        shift, probe_win, n_probe = 0, 0, 1
    else:
        bb = min(26, max(4, int(math.ceil(math.log2(max(K, 2)))) + 2),
                 key_bits)
        while True:
            shift = max(0, key_bits - bb)
            bs, bmax = _bucket_table(keys2, jnp.int32(K), bb=bb, shift=shift)
            bmax = int(bmax)
            # the windowed probe's 2-row krows gather covers >= 64 keys past
            # bucket_start but the guarantee is verified at <= 25 per bucket;
            # hash-uniform keys make bmax <= 25 overwhelmingly likely at avg
            # load <= 1.5 -- grow bb if not (cheap: KPAD-sized recompile only)
            if bmax <= 25 or bb >= min(28, key_bits):
                break
            bb += 1
        probe_win = 2 if (bmax <= 25 and KPAD >= 128) else 0
        n_probe = max(1, int(math.ceil(math.log2(int(bmax) + 1))))
    # mid_occ = (kth-smallest count) + 1 read off the histogram cumsum
    if K:
        kk = min(int((1.0 - occ_frac) * K), K - 1)
        cum_real = np.asarray(chist) - (KPAD - K)   # drop pad bin-0 mass
        mid_occ = int(np.searchsorted(cum_real, kk + 1, side="left")) + 1
    else:
        mid_occ = (1 << 31) - 1
    del chist
    pstrand = None
    s_fmt = 0
    if fmt2:
        pstrand = _pack_strand(str_s, NPAD=NPAD)
        s_fmt = 1       # S was 4-bit packed before the sort
    else:
        # the retained reference plane must be plain nt4: separator
        # code 5 exists only for the sketch's flush/reset distinction
        # -- the -a path's _gather_s expects codes 0..4
        S = jnp.minimum(S, jnp.uint8(4))
    del str_s
    if h2r is not None:
        # the payload probe reads h2r only: drop the key/offset planes
        # (~1.5 GB of HBM at 1 Gb scale, ~4.6 GB at GRCh38 scale)
        keys2 = jnp.full((1, 2), UMAX, jnp.uint32)
        sc2 = jnp.zeros((1, 2), jnp.int32)
        krows = None
    elif probe_win:
        # the windowed probe reads krows/sc2 only; drop the (K, 2) key
        # plane so it does not hold 770 MB of HBM at 1 Gb scale (the
        # binary-search fallback that needs it is only taken at
        # probe_win=0)
        keys2 = jnp.full((1, 2), UMAX, jnp.uint32)
    else:
        krows = None
    from .batch import build_rtab_np
    rtab = build_rtab_np(np.asarray(seq_off, np.int64), int(total_sep))
    di = DeviceIndex(keys2, sc2, pos2, S,
                     jnp.asarray(seq_off.astype(np.uint32).view(np.int32)),
                     jnp.asarray(lens.astype(np.int32)),
                     bucket_start=bs, h2=None, pstrand=pstrand, krows=krows,
                     h2r=h2r,
                     rtab=None if rtab is None else jnp.asarray(rtab),
                     key_shift=shift, n_probe=n_probe, h2_bits=0,
                     h2_slots=8, pos_fmt=2 if fmt2 else 1, h2_nb=0,
                     s_fmt=s_fmt, probe_win=probe_win, h2r_nb=h2r_nb,
                     key_bits=key_bits, rtab_on=0 if rtab is None else 1)
    jax.block_until_ready(di.pos2)
    if verbose:
        print(f"[devbuild] done {time.time()-t0:.1f}s n_probe={n_probe} "
              f"mid_occ={mid_occ}", file=sys.stderr)
    meta = DevBuildMeta(names=list(names), seq_off=seq_off, seq_len=lens,
                        w=w, k=k, n_mini=N, n_distinct=K, mid_occ=mid_occ)
    return di, meta
