"""Device-batched mapping step: the TPU-throughput path.

This module is the batched analogue of map/pipeline.py (the host,
reference-exact path).  One `map_batch` call runs sketch -> seed lookup ->
anchor sort -> chain DP -> banded extension for a whole (B, L) mega-batch of
reads entirely on device, with fixed shapes throughout.  It is the unit the
parallel layer shards over a `jax.sharding.Mesh`:

  * reads are data-parallel over the 'data' mesh axis (the analogue of the
    reference's kt_for over fragments, kthread.c:54-72);
  * the minimizer index may be sharded over the 'idx' axis (the analogue of
    the reference's multi-part index, index.c:621-635), with per-read anchors
    merged by an all_gather over 'idx' -- the reference's merge_hits
    (map.c:476-539) re-expressed as a collective;
  * mapping-rate statistics aggregate with psum (the only cross-device
    reduction; nothing else leaves a shard on the hot path).

Numerics follow the reference: hash64 (sketch.c:28-38) for minimizer hashing,
comput_sc with the mg_log2 fast-log penalty (lchain.c:113-138, mmpriv.h:139)
for chaining, and the extd2 Pallas kernel (ops/extend_pallas2.py) for base
extension.  The device chaining scan uses a fixed look-back window (the
reference's own max_iter/max_skip heuristics bound its scan the same way).

64-bit values (minimizer hashes, index keys) are carried as (hi, lo) uint32
pairs: TPUs have no native 64-bit integer datapath (XLA emulates it), Mosaic
cannot lower it at all, and the global jax_enable_x64 flag breaks Pallas
lowering helpers -- so the framework never enables x64 and does its own
pair arithmetic, which is also the faster layout on the VPU.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

U32 = jnp.uint32
NEG_INF = jnp.int32(-0x40000000)
UMAX64_NP = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# uint64 as (hi, lo) uint32 pairs
# ---------------------------------------------------------------------------


def _shl64(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s < 32:
        return (hi << s) | (lo >> (32 - s)), lo << s
    if s == 32:
        return lo, jnp.zeros_like(lo)
    return lo << (s - 32), jnp.zeros_like(lo)


def _shr64(hi, lo, s: int):
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return ahi + bhi + carry, lo


def _lt64(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def _le64(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def _min64(ahi, alo, bhi, blo):
    t = _lt64(bhi, blo, ahi, alo)
    return jnp.where(t, bhi, ahi), jnp.where(t, blo, alo)


def hash64_pair(khi, klo, mask_hi: int, mask_lo: int):
    """hash64 (sketch.c:28-38) on (hi, lo) uint32 pairs, bit-exact."""
    mh, ml = jnp.uint32(mask_hi), jnp.uint32(mask_lo)

    def band(hi, lo):
        return hi & mh, lo & ml

    # key = (~key + (key << 21)) & mask
    shi, slo = _shl64(khi, klo, 21)
    khi2, klo2 = _add64(~khi, ~klo, shi, slo)
    khi, klo = band(khi2, klo2)
    # key ^= key >> 24
    shi, slo = _shr64(khi, klo, 24)
    khi, klo = khi ^ shi, klo ^ slo
    # key = (key + (key<<3) + (key<<8)) & mask
    ahi, alo = _shl64(khi, klo, 3)
    bhi, blo = _shl64(khi, klo, 8)
    khi2, klo2 = _add64(khi, klo, ahi, alo)
    khi2, klo2 = _add64(khi2, klo2, bhi, blo)
    khi, klo = band(khi2, klo2)
    # key ^= key >> 14
    shi, slo = _shr64(khi, klo, 14)
    khi, klo = khi ^ shi, klo ^ slo
    # key = (key + (key<<2) + (key<<4)) & mask
    ahi, alo = _shl64(khi, klo, 2)
    bhi, blo = _shl64(khi, klo, 4)
    khi2, klo2 = _add64(khi, klo, ahi, alo)
    khi2, klo2 = _add64(khi2, klo2, bhi, blo)
    khi, klo = band(khi2, klo2)
    # key ^= key >> 28
    shi, slo = _shr64(khi, klo, 28)
    khi, klo = khi ^ shi, klo ^ slo
    # key = (key + (key << 31)) & mask
    shi, slo = _shl64(khi, klo, 31)
    khi2, klo2 = _add64(khi, klo, shi, slo)
    return band(khi2, klo2)


def _mulhi_u32(a, nb: int):
    """High 32 bits of a (u32) * nb (static int): the non-pow2 bucket
    range reduction, decomposed into 16-bit halves (TPU has no u64)."""
    nb_l = jnp.uint32(nb & 0xFFFF)
    nb_h = jnp.uint32(nb >> 16)
    al = a & jnp.uint32(0xFFFF)
    ah = a >> jnp.uint32(16)
    cross = ah * nb_l + ((al * nb_l) >> jnp.uint32(16))
    cross2 = al * nb_h + (cross & jnp.uint32(0xFFFF))
    return (ah * nb_h + (cross >> jnp.uint32(16))
            + (cross2 >> jnp.uint32(16)))


H2R_SLOTS = 64      # entries per row (64 slots either stride)
H2R_LOAD = 44       # target mean keys per bucket (load ~0.69: Poisson
#                     tails at capacity 64 make 2-choice overflow ~1e-7;
#                     32-slot rows at load 0.8 overflowed ~3e-3 of keys)
# Row strides:
#   stride 4 (256-lane rows): [key_sel, aux, start, cnt] -- any key
#     width / position-plane size.
#   stride 2 (128-lane rows): [key|cnt_hi2<<30, start|cnt_lo4<<28] --
#     keys <= 30 bits (k <= 15) AND < 2^28 positions: HALVES the probe's
#     gather traffic (the dominant cost is the materialized (B, M, row)
#     gather output, not the descriptor count).  cnt is clamped at 63
#     (63 = ">= 63"), so occ_cap must be <= 62 on this layout -- see
#     H2R2_OCC_CAP.
H2R2_OCC_CAP = 62


def _h2r_b1_np(lo, NB):
    """Choice-1 bucket: Fibonacci hash of the key's low word.  NOT the
    key value itself -- minimizer keys are window MINIMA of hash64
    values, so their magnitude distribution is heavily skewed low and
    interpolation bucketing overloads the low buckets ~5x."""
    m1 = (lo * np.uint32(2654435769))
    return ((m1.astype(np.uint64) * np.uint64(NB))
            >> np.uint64(32)).astype(np.int64)


def build_h2rows_np(keys_u64: np.ndarray, starts: np.ndarray,
                    cnts: np.ndarray, key_bits: int,
                    nb0: int | None = None):
    """Host build of the payload-fused 2-choice bucket table.

    keys_u64 must be the SORTED distinct minimizer hashes; starts/cnts the
    (offset, count) runs into the position plane.  Returns (rows (NB, 128)
    u32, NB).  Choice 1 = mulhi(top32(key), NB) is monotone over the
    sorted keys, so within-bucket ranks come straight from run positions;
    overflow keys (bucket > 32 deep) fall to choice 2 = the Fibonacci
    rehash; any key failing both grows NB 15% and retries (rare at load
    0.81: P(Poisson(26) > 32) per bucket is ~5%, and choice 2 absorbs
    the spill)."""
    K = len(keys_u64)
    stride2 = key_bits <= 30 and (len(starts) == 0
                                  or int(starts[-1] + cnts[-1]) < (1 << 28))
    ROWW = (2 if stride2 else 4) * H2R_SLOTS
    wide = key_bits > 31
    hi = (keys_u64 >> np.uint64(32)).astype(np.uint32)
    lo = keys_u64.astype(np.uint32)
    k11 = (((lo >> np.uint32(11)) | (hi << np.uint32(21)))
           * np.uint32(2654435761))
    NB = nb0 if nb0 else max(64, -(-K // H2R_LOAD))
    i = np.arange(K, dtype=np.int64)
    while True:
        b1 = _h2r_b1_np(lo, NB)
        ord1 = np.argsort(b1, kind="stable")
        b1s = b1[ord1]
        rs = np.r_[True, b1s[1:] != b1s[:-1]] if K else np.zeros(0, bool)
        grp = np.maximum.accumulate(np.where(rs, i, 0))
        rank1s = i - grp
        placed1s = rank1s < H2R_SLOTS
        # back to key order
        rank1 = np.empty(K, np.int64); rank1[ord1] = rank1s
        placed1 = np.zeros(K, bool); placed1[ord1] = placed1s
        occ1 = np.bincount(b1[placed1], minlength=NB) if K else \
            np.zeros(NB, np.int64)
        b2 = ((k11.astype(np.uint64) * np.uint64(NB))
              >> np.uint64(32)).astype(np.int64)
        midx = np.nonzero(~placed1)[0]
        ordm = np.argsort(b2[midx], kind="stable")
        midx = midx[ordm]
        mbs = b2[midx]
        nm = len(midx)
        j = np.arange(nm, dtype=np.int64)
        rs2 = np.r_[True, mbs[1:] != mbs[:-1]] if nm else np.zeros(0, bool)
        grp2 = np.maximum.accumulate(np.where(rs2, j, 0)) if nm else j
        rank2 = j - grp2
        cap2 = H2R_SLOTS - occ1[mbs] if nm else np.zeros(0, np.int64)
        placed2 = rank2 < cap2
        n_ov = int(nm - placed2.sum())
        if n_ov <= max(0, K // 1_000_000) or NB > 4 * max(64, -(-K // H2R_LOAD)):
            # residual overflow (<= 1e-6 of keys) is dropped: those
            # minimizers simply never match, like an occurrence filter
            break
        NB = int(NB * 1.15) + 1
    rows = np.full(NB * ROWW, 0xFFFFFFFF, np.uint32)

    if stride2:
        cnt6 = np.minimum(cnts, 63).astype(np.uint32)
        w0_all = lo | ((cnt6 >> np.uint32(4)) << np.uint32(30))
        w1_all = (starts.astype(np.uint32)
                  | ((cnt6 & np.uint32(15)) << np.uint32(28)))

        def scatter(bkt, slot, sel):
            base = bkt * ROWW + slot * 2
            rows[base] = w0_all[sel]
            rows[base + 1] = w1_all[sel]
    else:
        def scatter(bkt, slot, sel):
            base = bkt * ROWW + slot * 4
            rows[base] = (hi[sel] if wide else lo[sel])
            rows[base + 1] = (lo[sel] if wide else 0)
            rows[base + 2] = starts[sel].astype(np.uint32)
            rows[base + 3] = cnts[sel].astype(np.uint32)

    if K:
        scatter(b1[placed1], rank1[placed1], placed1)
        scatter(mbs[placed2], (occ1[mbs] + rank2)[placed2], midx[placed2])
    return rows.reshape(NB, ROWW), NB


def build_rtab_np(seq_off64: np.ndarray, total_len: int):
    """4 KiB-block rid table, or None when ineligible (<= 16 contigs
    use unrolled compares; any contig < 4 KiB would put two boundaries
    in one block and break the single-compare correction).

    Each 4-lane row holds [off, next_off, rid, 0] (u32) for the contig
    at the block start, so rid recovery is ONE 16 B gather: the
    boundary correction (gpos >= next_off -> rid+1, off = next_off)
    reuses the fetched next_off instead of two more gathers."""
    n = len(seq_off64)
    if n <= 16 or n >= 65535:
        return None
    gaps = np.diff(np.append(seq_off64.astype(np.int64), total_len))
    if len(gaps) == 0 or gaps.min() < 4096:
        return None
    nb = (total_len + 4095) // 4096
    rid = np.maximum(np.searchsorted(
        seq_off64, np.arange(nb, dtype=np.int64) * 4096,
        side="right") - 1, 0)
    off64 = seq_off64.astype(np.int64)
    nxt64 = np.append(off64[1:], np.int64(0xFFFFFFFF))
    rt = np.zeros((nb, 4), np.uint32)
    rt[:, 0] = off64[rid].astype(np.uint32)
    rt[:, 1] = nxt64[rid].astype(np.uint32)
    rt[:, 2] = rid.astype(np.uint32)
    return rt


def searchsorted_u64pair(khi, klo, qhi, qlo):
    """Left insertion point of (qhi, qlo) into the lexicographically sorted
    key pair arrays (vectorized binary search; index.c:93 analogue)."""
    K = khi.shape[0]
    lo = jnp.zeros(qhi.shape, jnp.int32)
    hi = jnp.full(qhi.shape, K, jnp.int32)
    for _ in range(max(1, (K + 1).bit_length())):
        mid = (lo + hi) >> 1
        midc = jnp.clip(mid, 0, K - 1)
        less = _lt64(khi[midc], klo[midc], qhi, qlo) & (mid < hi)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


# ---------------------------------------------------------------------------
# static parameters of a batched mapping step
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BatchParams:
    """Fixed shapes + scoring for one compiled mapping step (map-ont-like).

    The capacity fields are the XLA-shape analogues of the reference's own
    caps: max_occ (options.c:69-83) -> occ_cap, max_iter (lchain.c:173) ->
    chain_window, bw (options.c:24) -> band width w.
    """
    k: int = 15
    w: int = 10
    L: int = 2048          # max read length in batch
    M: int = 512           # minimizer capacity per read
    occ_cap: int = 16      # occurrences taken per seed (mid_occ analogue)
    A: int = 1024          # anchor capacity per read
    chain_window: int = 64 # chain DP look-back window (max_iter analogue)
    # chaining scores (map-ont: chain_gap_scale=0.8, k=15)
    max_dist_x: int = 5000
    max_dist_y: int = 5000
    bw: int = 500
    chn_pen_gap: float = 0.8 * 0.01 * 15
    chn_pen_skip: float = 0.0
    # extension (map-ont: -A2 -B4 -O4,24 -E2,1, zdrop 400)
    QP: int = 2048         # query segment capacity
    TP: int = 2048         # target segment capacity
    W: int = 640           # extension band lanes; must be >= ext_w + 32
    ext_w: int = 500       # extension band half-width (map-ont bw)
    sc_mch: int = 2
    sc_mis: int = -4
    gapo: int = 4
    gape: int = 2
    gapo2: int = 24
    gape2: int = 1
    zdrop: int = 400
    hpc: bool = False      # homopolymer-compressed minimizers (map-pb/hifi)
    # long-join rescue (map.c:283-292): when the best chain leaves a big
    # uncovered tail, rechain the same anchors with the wide band
    # (bw_long, options.c:26) so SV-spanning joins survive; 0 = off
    bw_long: int = 0
    rmq_rescue_size: int = 1000
    rmq_rescue_ratio: float = 0.1
    # device RMQ tier (lchain.c:219-368 re-expressed): a SECOND, strided
    # look-back window in the chain scan -- every rmq_stride-th anchor is
    # retained for rmq_window more slots, so predecessors up to
    # rmq_stride*rmq_window anchors back join under the wide band.  The
    # asm presets / --rmq=yes set this (the reference's O(n log n) AVL
    # chainer exists for exactly that long-gap regime); the windowed
    # scan alone tops out at chain_window anchors back.
    rmq_tier: bool = False
    rmq_window: int = 64
    rmq_stride: int = 32


# ---------------------------------------------------------------------------
# device index
# ---------------------------------------------------------------------------


def _pack_s4(S: np.ndarray) -> np.ndarray:
    """nt4 u8 codes -> two 4-bit codes per byte (code 4 = ambiguous fits)."""
    T = len(S)
    Sp = S if T % 2 == 0 else np.concatenate([S, np.zeros(1, np.uint8)])
    h = Sp.reshape(-1, 2)
    return (h[:, 0] | (h[:, 1] << np.uint8(4))).astype(np.uint8)


def _gather_s(di, idx):
    """Gather nt4 codes from di.S at int32/uint32 indices, any s_fmt."""
    if di.s_fmt == 0:
        return di.S[jnp.clip(idx, 0, di.S.shape[0] - 1)]
    byte_i = (idx >> jnp.asarray(1, idx.dtype)).astype(jnp.int32)
    b = di.S[jnp.clip(byte_i, 0, di.S.shape[0] - 1)]
    odd = (idx & jnp.asarray(1, idx.dtype)).astype(jnp.uint8)
    return (b >> (odd << jnp.uint8(2))) & jnp.uint8(0xF)


@jax.tree_util.register_pytree_node_class
class DeviceIndex:
    """Flat-tensor minimizer index resident in HBM (index.c:93-110 layout
    re-expressed as sorted keys + offset/count + int32 position planes)."""

    def __init__(self, keys2, sc2, pos2, S, seq_off, seq_len,
                 bucket_start=None, h2=None, pstrand=None, krows=None,
                 h2r=None, rtab=None,
                 key_shift: int = 0, n_probe: int = 6, h2_bits: int = 0,
                 h2_slots: int = 8, pos_fmt: int = 0, h2_nb: int = 0,
                 s_fmt: int = 0, probe_win: int = 0, h2r_nb: int = 0,
                 key_bits: int = 0, rtab_on: int = 0):
        # pair-packed planes: one 2-wide gather fetches what used to take
        # two element gathers (gathers are the device bottleneck)
        self.keys2 = keys2          # (K, 2) u32 [hi, lo], sorted, UMAX pad
        self.sc2 = sc2              # (K, 2) i32 [start, cnt]
        # pos_fmt 0: (P, 2) i32 [rid, rpos<<1|strand]
        # pos_fmt 1: (P,) u32 global (seq_off[rid]+rpos)<<1|strand -- HALF
        #            the gather bytes; rid recovered by comparing against
        #            seq_off (requires total<2^31 and small n_seq)
        # pos_fmt 2: (P,) u32 global seq_off[rid]+rpos, strand riding in
        #            the pstrand bitmap -- the 2^31..2^32 (GRCh38-scale)
        #            regime; seq_off is then the i32 BITCAST of u32 offsets
        self.pos2 = pos2
        # s_fmt 0: (T,) u8 nt4 codes, concatenated refs
        # s_fmt 1: (ceil(T/2),) u8, two 4-bit nt4 codes per byte (halves
        #          the resident bytes AND keeps gather indices < 2^31 for
        #          genomes up to 4 Gb)
        self.S = S
        self.seq_off = seq_off      # (n_seq,) i32 (u32 bitcast if pos_fmt 2)
        self.seq_len = seq_len      # (n_seq,) i32
        # direct-address bucket table over the top key bits (the 2^b-bucket
        # structure of index.c:50, rebuilt for O(1)-ish device probes)
        self.bucket_start = bucket_start   # (2^bb + 1,) i32 or None
        # 2-choice bucketed hash table (native build_hash2_table): one
        # probe = TWO (h2_slots*stride)-wide row gathers; preferred over
        # the binary search when present
        self.h2 = h2                       # (NB, h2_slots*st) i32 or None
        self.pstrand = pstrand             # (ceil(P/8),) u8 bitmap or None
        self.key_shift = key_shift         # static: key >> shift = bucket
        self.n_probe = n_probe             # static: ceil(log2(max bucket))
        self.h2_bits = h2_bits             # static: log2(NB) (mask mode)
        self.h2_slots = h2_slots           # static: slots per bucket
        self.pos_fmt = pos_fmt             # static: pos2 layout
        self.h2_nb = h2_nb                 # static: >0 = mulhi bucket map
        self.s_fmt = s_fmt                 # static: S layout
        # windowed probe: bucket contents are CONTIGUOUS in the sorted key
        # array, so when every bucket holds <= 25 keys (verified at build)
        # a 2-row window gather over krows starting at bucket_start[b]
        # replaces the whole binary search.  krows is (ceil(K/64), 128)
        # u32 with 64 interleaved (hi, lo) pairs per row: minor dim 128
        # means EVERY possible XLA tiled layout is compact.  A (K, 2)
        # view reshaped to rows inside the step forced layout assignment
        # into {1,0:T(8,128)} -- a 64x pad (2 -> 128 lanes) that at
        # GRCh38 scale is a 49 GB relayout copy (the r03/r04 bench OOM).
        self.krows = krows                 # (ceil(K/64), 128) u32 or None
        self.probe_win = probe_win         # static: 1 = windowed probe ok
        # payload-fused 2-choice bucket table (the preferred probe): one
        # 256-lane row per bucket, 64 slots of [key_sel, aux, start, cnt]
        # (key32: key_sel = key, aux = spare; wide: key_sel = hi,
        # aux = lo).  Choices 1/2 are two independent Fibonacci hashes
        # (NOT value interpolation: minimizer keys are window minima, so
        # their magnitudes skew low) -- the whole probe is TWO 1 KB row
        # gathers, vs four transactions for the windowed krows probe
        # (bucket_start + 2 key rows + sc2).  The row payload replaces
        # keys2/sc2/bucket_start entirely.
        self.h2r = h2r                     # (NB, 128) u32 or None
        self.h2r_nb = h2r_nb               # static: NB (mulhi reduction)
        self.key_bits = key_bits           # static: 2k (for top32 shift)
        # 4 KiB-block rid lookup (u16), for > 16 contigs with every
        # contig >= 4 KiB: rid recovery in 3 gathers instead of a
        # log2(n_seq)-step binary search (each step is a FULL-SIZE
        # (B, A) gather even though the table is tiny)
        self.rtab = rtab                   # (ceil(total/4096),) u16 or None
        self.rtab_on = rtab_on             # static: 1 = rtab present

    _AUX_FIELDS = ("key_shift", "n_probe", "h2_bits", "h2_slots",
                   "pos_fmt", "h2_nb", "s_fmt", "probe_win", "h2r_nb",
                   "key_bits", "rtab_on")

    def aux_dict(self):
        return {a: getattr(self, a) for a in self._AUX_FIELDS}

    def tree_flatten(self):
        return ((self.keys2, self.sc2, self.pos2, self.S,
                 self.seq_off, self.seq_len, self.bucket_start, self.h2,
                 self.pstrand, self.krows, self.h2r, self.rtab),
                tuple(getattr(self, a) for a in self._AUX_FIELDS))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, **dict(zip(cls._AUX_FIELDS, aux)))

    @classmethod
    def from_host(cls, mi, n_shards: int = 1, pad_pos_to: int | None = None,
                  cache: str | None = None, force_pos_fmt: int | None = None,
                  force_s_fmt: int | None = None):
        """Build 1..n_shards DeviceIndex pytrees from a host MiniIndex.

        Sharding is by contiguous key range (the capacity-sharding analogue of
        the reference's multi-part index).  Each shard is padded to a common
        size so shards can be stacked along a leading axis for shard_map.

        `cache` names an .npz file holding the prebuilt flat tensors (the
        native-serialization analogue of mm_idx_dump, index.c:475-569):
        at genome scale the 2-choice table build + position packing cost
        minutes per process, so the driver persists them once.
        """
        import os
        if cache and os.path.exists(cache):
            try:
                return cls._load_cache(cache, n_shards)
            except Exception:
                pass
        K = len(mi.keys)
        cnts_all = (mi.starts[1:] - mi.starts[:-1]).astype(np.int32)
        bounds = [(i * K) // n_shards for i in range(n_shards + 1)]
        kpad = max(1, max((bounds[i + 1] - bounds[i] for i in range(n_shards)),
                          default=1))
        kpad = (kpad + 63) // 64 * 64   # windowed probe: 64-pair krows rows
        shards = []
        S = np.ascontiguousarray(mi.S if mi.S is not None
                                 else np.zeros(1, np.uint8))
        # offsets can exceed 2^31 at GRCh38 scale: build u64 then bitcast
        # the u32 view into the i32 plane (pos_fmt 2 reads it back as u32)
        seq_off64 = np.array([s.offset for s in mi.seq] or [0], np.uint64)
        seq_off = seq_off64.astype(np.uint32).view(np.int32)
        seq_len = np.array([s.length for s in mi.seq] or [0], np.int32)
        ppad = pad_pos_to
        if ppad is None:
            ppad = max(1, max((int(mi.starts[bounds[i + 1]] - mi.starts[bounds[i]])
                               for i in range(n_shards)), default=1))
        import math
        bb = min(26, max(4, int(math.ceil(math.log2(max(K, 2)))) + 2))
        key_bits = 2 * mi.k
        shift = max(0, key_bits - bb)
        from .. import native
        use_h2r = K > 0 and os.environ.get("MM2TPU_H2R", "1") != "0"
        use_h2 = (not use_h2r) and native.available() and K > 0
        key32 = key_bits < 32
        h2_slots = 4 if key32 else 8
        h2_bits = 0
        h2_nb = 0
        h2_tables = None
        h2r_nb = 0
        h2r_tables = None
        if use_h2r:
            kmax = max(bounds[i + 1] - bounds[i] for i in range(n_shards))
            nb = max(64, -(-kmax // H2R_LOAD))
            while True:     # all shards share one NB (stackable pytrees)
                h2r_tables = []
                ok = True
                for i in range(n_shards):
                    lo, hi = bounds[i], bounds[i + 1]
                    p0 = int(mi.starts[lo])
                    rel = (mi.starts[lo:hi] - p0).astype(np.int64)
                    rows, nb_out = build_h2rows_np(
                        mi.keys[lo:hi], rel, cnts_all[lo:hi], key_bits,
                        nb0=nb)
                    if nb_out != nb:
                        nb = nb_out
                        ok = False
                        break
                    h2r_tables.append(rows)
                if ok:
                    break
            h2r_nb = nb
        if use_h2:
            kmax = max(bounds[i + 1] - bounds[i] for i in range(n_shards))
            # non-pow2 bucket count with the mulhi range reduction: a pow2
            # table wastes up to 2x HBM from rounding, which is the margin
            # between fitting and not fitting a 3 Gb genome on one chip
            h2_nb = max(64, int(math.ceil(kmax / (h2_slots * 0.85))))
            while True:     # all shards share one size (stackable pytrees)
                h2_tables = []
                ov_tot = 0
                for i in range(n_shards):
                    lo, hi = bounds[i], bounds[i + 1]
                    p0 = int(mi.starts[lo])
                    rel = (mi.starts[lo:hi + 1] - p0).astype(np.int64)
                    t, ov = native.build_hash2_table(
                        mi.keys[lo:hi], rel, h2_nb, h2_slots, key32,
                        mulhi=True)
                    ov_tot += ov
                    h2_tables.append(t)
                if ov_tot == 0:
                    break
                h2_nb = int(h2_nb * 1.15) + 1    # overflow: grow 15%
        for i in range(n_shards):
            lo, hi = bounds[i], bounds[i + 1]
            p0 = int(mi.starts[lo]) if K else 0
            p1 = int(mi.starts[hi]) if K else 0
            h2 = None
            h2r = None
            if use_h2r or use_h2:
                if use_h2r:
                    h2r = jnp.asarray(h2r_tables[i])
                else:
                    h2 = jnp.asarray(h2_tables[i])
                # placeholders keep the pytree shape without the upload
                keys2 = np.full((1, 2), 0xFFFFFFFF, np.uint32)
                sc2 = np.zeros((1, 2), np.int32)
                bstart = np.zeros(2, np.int32)
                n_probe = 1
                probe_win = 0
            else:
                keys = np.full(kpad, UMAX64_NP, np.uint64)
                keys[:hi - lo] = mi.keys[lo:hi]
                keys2 = np.empty((kpad, 2), np.uint32)
                keys2[:, 0] = (keys >> np.uint64(32)).astype(np.uint32)
                keys2[:, 1] = keys.astype(np.uint32)
                nb = 1 << min(bb, key_bits)
                bstart = np.searchsorted(
                    mi.keys[lo:hi] >> np.uint64(shift),
                    np.arange(nb + 1, dtype=np.uint64)).astype(np.int32)
                sc2 = np.zeros((kpad, 2), np.int32)
                sc2[:hi - lo, 0] = (mi.starts[lo:hi] - p0).astype(np.int32)
                sc2[:hi - lo, 1] = cnts_all[lo:hi]
                bmax = int(np.diff(bstart).max()) if len(bstart) > 1 else 1
                n_probe = max(1, int(math.ceil(math.log2(bmax + 1))))
                probe_win = 2 if (bmax <= 25 and kpad >= 128) else 0
            pos = mi.pos[p0:p1]
            total_len = (int(seq_off64[-1]) + int(seq_len[-1])
                         if len(S) else 0)
            # rid recovery handles any contig count (binary search over
            # seq_off for > 16 contigs, _expand_anchors)
            if total_len < (1 << 31):
                pos_fmt = 1
            elif total_len < (1 << 32) - 1:
                pos_fmt = 2      # GRCh38-scale: strand in a side bitmap
            else:
                pos_fmt = 0
            if force_pos_fmt is not None:
                pos_fmt = force_pos_fmt
            pstrand = None
            seq_off_out = seq_off
            if pos_fmt:
                rid_h = (pos >> np.uint64(32)).astype(np.int64)
                rp_h = (pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                goff = seq_off64.astype(np.uint32)[
                    np.clip(rid_h, 0, len(seq_off64) - 1)]
                pos2 = np.zeros(ppad, np.uint32)
                if pos_fmt == 1:
                    pos2[:len(pos)] = rp_h + (goff << np.uint32(1))
                else:
                    pos2[:len(pos)] = (rp_h >> np.uint32(1)) + goff
                    sbits = np.zeros(((ppad + 7) // 8) * 8, np.uint8)
                    sbits[:len(pos)] = (rp_h & np.uint32(1)).astype(np.uint8)
                    pstrand = np.packbits(sbits.reshape(-1, 8), axis=-1,
                                          bitorder="little")[:, 0]
                    # u32 offsets ride bitcast in the i32 seq_off plane
                    seq_off_out = seq_off64.astype(np.uint32).view(np.int32)
            else:
                pos2 = np.zeros((ppad, 2), np.int32)
                pos2[:len(pos), 0] = (pos >> np.uint64(32)).astype(np.int32)
                # packed: rpos<<1 | strand (one gather serves both)
                pos2[:len(pos), 1] = (pos
                                      & np.uint64(0xFFFFFFFF)).astype(np.int32)
            s_fmt = 1 if (len(S) >= int(1.6e9) or pos_fmt == 2
                          or os.environ.get("MM2TPU_PACK_S") == "1") else 0
            if force_s_fmt is not None:
                s_fmt = force_s_fmt
            S_out = _pack_s4(S) if s_fmt else S
            krows = None
            if probe_win:
                # (kpad, 2) row-major flat == interleaved [hi0, lo0, ...]
                krows = jnp.asarray(
                    np.ascontiguousarray(keys2).reshape(-1, 128))
            rtab = build_rtab_np(seq_off64, total_len) if pos_fmt else None
            shards.append(cls(jnp.asarray(keys2), jnp.asarray(sc2),
                              jnp.asarray(pos2), jnp.asarray(S_out),
                              jnp.asarray(seq_off_out), jnp.asarray(seq_len),
                              jnp.asarray(bstart), h2,
                              None if pstrand is None else jnp.asarray(pstrand),
                              krows, h2r,
                              None if rtab is None else jnp.asarray(rtab),
                              key_shift=shift,
                              n_probe=n_probe, h2_bits=h2_bits,
                              h2_slots=h2_slots, pos_fmt=pos_fmt,
                              h2_nb=h2_nb, s_fmt=s_fmt,
                              probe_win=probe_win, h2r_nb=h2r_nb,
                              key_bits=key_bits,
                              rtab_on=0 if rtab is None else 1))
        if cache:
            try:
                cls._save_cache(cache, shards)
            except Exception:
                pass
        return shards

    _CACHE_LEAVES = ("keys2", "sc2", "pos2", "S", "seq_off", "seq_len",
                     "bucket_start", "h2", "pstrand", "krows", "h2r",
                     "rtab")
    _CACHE_AUX = ("key_shift", "n_probe", "h2_bits", "h2_slots", "pos_fmt",
                  "h2_nb", "s_fmt", "probe_win", "h2r_nb", "key_bits",
                  "rtab_on")

    @classmethod
    def _save_cache(cls, path, shards):
        arrs = {}
        for i, sh in enumerate(shards):
            for name in cls._CACHE_LEAVES:
                v = getattr(sh, name)
                if v is not None:
                    arrs[f"s{i}_{name}"] = np.asarray(v)
        sh0 = shards[0]
        arrs["meta"] = np.array(
            [len(shards)] + [int(getattr(sh0, a)) for a in cls._CACHE_AUX],
            np.int64)
        np.savez(path, **arrs)

    @classmethod
    def _load_cache(cls, path, n_shards):
        z = np.load(path)
        meta = z["meta"]
        if int(meta[0]) != n_shards:
            raise ValueError("shard count mismatch")
        if len(meta) != 1 + len(cls._CACHE_AUX):
            raise ValueError("cache from an older layout")
        aux = {a: int(v) for a, v in zip(cls._CACHE_AUX, meta[1:])}
        shards = []
        for i in range(n_shards):
            leaves = []
            for name in cls._CACHE_LEAVES:
                k = f"s{i}_{name}"
                leaves.append(jnp.asarray(z[k]) if k in z.files else None)
            if aux.get("probe_win") \
                    and leaves[cls._CACHE_LEAVES.index("krows")] is None:
                raise ValueError("cache predates the krows layout")
            if aux.get("h2r_nb") \
                    and leaves[cls._CACHE_LEAVES.index("h2r")] is None:
                raise ValueError("cache predates the h2r layout")
            shards.append(cls(*leaves, **aux))
        return shards


# ---------------------------------------------------------------------------
# device kernels (jnp)
# ---------------------------------------------------------------------------


def mg_log2_dev(x):
    """mg_log2 (mmpriv.h:139-147), bit-exact float32."""
    z = x.astype(jnp.float32)
    zi = lax.bitcast_convert_type(z, jnp.uint32)
    log2i = (((zi >> jnp.uint32(23)) & jnp.uint32(255)).astype(jnp.int32)
             - 128).astype(jnp.float32)
    zi = (zi & jnp.uint32(0x007FFFFF)) | jnp.uint32(127 << 23)
    zf = lax.bitcast_convert_type(zi, jnp.float32)
    return log2i + ((jnp.float32(-0.34484843) * zf + jnp.float32(2.02466578))
                    * zf - jnp.float32(0.67487759))


def device_sketch(codes, lens, k: int, w: int, with_valid: bool = False):
    """Batched (w,k)-minimizer selection (sketch.c:77-143, non-HPC).

    codes: (B, L) uint8 nt4 (4 = ambiguous / padding); lens: (B,) int32.
    A position i holds the k-mer ending at i.  Returns (hhi, hlo, strand,
    is_mini) with (hhi, hlo) = hash64(min(kf,kr)) as a u32 pair, strand =
    kf >= kr.  Minimizer rule: a valid position is emitted iff its hash
    equals the minimum of at least one full window of w positions -- the
    same set as the reference's queued scan (ties included).
    """
    B, L = codes.shape
    mask = (1 << (2 * k)) - 1
    mask_hi, mask_lo = mask >> 32, mask & 0xFFFFFFFF
    c = codes.astype(U32)
    comp = jnp.where(codes < 4, (3 ^ codes).astype(U32), U32(0))
    z0 = jnp.zeros((B, L), U32)
    kf_hi = z0; kf_lo = z0
    kr_hi = z0; kr_lo = z0
    for j in range(k):  # static unroll: kmer[i] collects codes[i-k+1..i]
        cj = jnp.pad(c, ((0, 0), (j, 0)))[:, :L]
        pj = jnp.pad(comp, ((0, 0), (j, 0)))[:, :L]
        shi, slo = _shl64(z0, cj, 2 * j)
        kf_hi, kf_lo = kf_hi | shi, kf_lo | slo
        shi, slo = _shl64(z0, pj, 2 * (k - 1 - j))
        kr_hi, kr_lo = kr_hi | shi, kr_lo | slo
    kf_hi = kf_hi & jnp.uint32(mask_hi)
    kf_lo = kf_lo & jnp.uint32(mask_lo)
    # validity: no ambiguous base among the k codes, position >= k-1, < len
    amb = (codes >= 4).astype(jnp.int32)
    camb = jnp.cumsum(amb, axis=1)
    camb_k = jnp.pad(camb, ((0, 0), (k, 0)))[:, :L]
    posi = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = (camb - camb_k == 0) & (posi >= k - 1) & (posi < lens[:, None])
    sym = (kf_hi == kr_hi) & (kf_lo == kr_lo)
    valid = valid & ~sym
    z = ~_lt64(kf_hi, kf_lo, kr_hi, kr_lo)                    # kf >= kr
    mh_hi = jnp.where(z, kr_hi, kf_hi)
    mh_lo = jnp.where(z, kr_lo, kf_lo)
    hhi, hlo = hash64_pair(mh_hi, mh_lo, mask_hi, mask_lo)
    big = jnp.uint32(0xFFFFFFFF)
    xhi = jnp.where(valid, hhi, big)
    xlo = jnp.where(valid, hlo, big)
    # windowed min over w consecutive kmer positions; window j covers
    # kmer-end positions [j, j+w)
    wm_hi, wm_lo = xhi, xlo
    for d in range(1, w):
        shh = jnp.concatenate([xhi[:, d:], jnp.full((B, d), big, U32)], axis=1)
        shl = jnp.concatenate([xlo[:, d:], jnp.full((B, d), big, U32)], axis=1)
        wm_hi, wm_lo = _min64(wm_hi, wm_lo, shh, shl)
    # window j is complete iff all w member kmer ends [j, j+w) are valid
    # positions (covers the l >= w+k-1 rule incl. ambiguous-base resets);
    # symmetric k-mers still count as slots here (rare-case divergence from
    # the reference's l counter; the host path is the parity oracle).
    okpos = ((posi >= k - 1) & (posi < lens[:, None])
             & (camb - camb_k == 0))
    cok = jnp.cumsum(okpos.astype(jnp.int32), axis=1)
    cok_w = jnp.concatenate([cok[:, w - 1:],
                             jnp.zeros((B, w - 1), jnp.int32)], axis=1)
    cok_prev = jnp.pad(cok, ((0, 0), (1, 0)))[:, :L]
    wok = (cok_w - cok_prev) == w
    wj = jnp.arange(L, dtype=jnp.int32)[None, :]
    wok = wok & (wj <= lens[:, None] - w)
    # x[i] is a minimizer iff SOME complete window covering i has
    # wmin == x[i]; since wmin <= x[i] on covering windows, that is
    # max over covering valid windows of wmin == x[i].
    zero = jnp.uint32(0)
    mx_hi = jnp.where(wok, wm_hi, zero)
    mx_lo = jnp.where(wok, wm_lo, zero)
    cv_hi, cv_lo = mx_hi, mx_lo
    anyw = wok
    for d in range(1, w):
        shh = jnp.concatenate([jnp.zeros((B, d), U32), mx_hi[:, :-d]], axis=1)
        shl = jnp.concatenate([jnp.zeros((B, d), U32), mx_lo[:, :-d]], axis=1)
        swk = jnp.concatenate([jnp.zeros((B, d), bool), wok[:, :-d]], axis=1)
        t = _lt64(cv_hi, cv_lo, shh, shl)
        cv_hi = jnp.where(t, shh, cv_hi)
        cv_lo = jnp.where(t, shl, cv_lo)
        anyw = anyw | swk
    not_max = ~((xhi == big) & (xlo == big))
    is_mini = valid & anyw & (cv_hi == xhi) & (cv_lo == xlo) & not_max
    if with_valid:
        return hhi, hlo, z, is_mini, valid
    return hhi, hlo, z, is_mini


def _compact_minimizers(hhi, hlo, strand, is_mini, M: int,
                        use_pallas: bool = False):
    """Select up to M minimizer positions per read, in position order.

    TPU path: 1-key bitonic row sort of (is_mini ? pos : INF) in a Pallas
    kernel (ops/sort_pallas.sort1_rows), then the first M lanes are the
    compacted positions. Fallback: rank-scatter compaction (XLA scatter,
    ~30x slower on TPU at L ~ 12k)."""
    B, L = hhi.shape
    posi = jnp.arange(L, dtype=jnp.int32)[None, :]
    if use_pallas and B % 8 == 0:
        # 3-plane bitonic: key = pos<<1|strand (unique per row), with the
        # hash pair riding as carried values -- no post-sort gathers
        # (element gathers are the device bottleneck; see memory notes)
        from ..ops.sort_pallas import sort3_chunked, sort3_rows
        A = 1 << (L - 1).bit_length()                       # pad to pow2
        key = jnp.where(is_mini,
                        (posi << 1) | strand.astype(jnp.int32),
                        jnp.int32(0x7FFFFFFF)).astype(jnp.uint32)
        if A > L:
            pad = ((0, 0), (0, A - L))
            key = jnp.pad(key, pad, constant_values=np.uint32(0x7FFFFFFF))
            hhi = jnp.pad(hhi, pad)
            hlo = jnp.pad(hlo, pad)
        if A > 16384:
            # sort3_chunked's second-level sort runs over (A/2048)*1024
            # lanes, which blows scoped VMEM past A = 16384 (the
            # L = 32768 off-distribution config); XLA's sort is exact
            # and these capacities are off the hot path
            skey, mh_hi, mh_lo = lax.sort((key, hhi, hlo), dimension=1,
                                          num_keys=1)
        elif A > 4096:
            # full-width 3-plane bitonic overflows scoped VMEM; the
            # chunked variant is exact while any 2048-lane window holds
            # <= 1024 minimizers (density ~2/(w+1) makes >1024 require
            # a degenerate all-tie repeat, where M-capping drops tails
            # anyway)
            skey, mh_hi, mh_lo = sort3_chunked(key, hhi, hlo, chunk=2048,
                                               keep=1024, G=8)
        else:
            skey, mh_hi, mh_lo = sort3_rows(key, hhi, hlo, G=8)
        skey = skey[:, :M]
        mh_hi, mh_lo = mh_hi[:, :M], mh_lo[:, :M]
        mvalid = skey != jnp.uint32(0x7FFFFFFF)
        mpos = jnp.where(mvalid, (skey >> jnp.uint32(1)).astype(jnp.int32),
                         L)
        mz = jnp.where(mvalid, (skey & jnp.uint32(1)).astype(jnp.int32), 0)
        return mh_hi, mh_lo, mz, mpos, mvalid
    else:
        csum = jnp.cumsum(is_mini.astype(jnp.int32), axis=1)
        rank = jnp.where(is_mini, csum - 1, M)                # (B, L)
        rank = jnp.minimum(rank, M)                           # overflow sink
        mpos = jnp.full((B, M + 1), L, jnp.int32)
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        mpos = mpos.at[rows, rank].min(jnp.where(is_mini, posi, L))
        mpos = mpos[:, :M]
    mvalid = mpos < L
    gidx = jnp.clip(mpos, 0, L - 1)
    mh_hi = jnp.take_along_axis(hhi, gidx, axis=1)
    mh_lo = jnp.take_along_axis(hlo, gidx, axis=1)
    mz = jnp.take_along_axis(strand.astype(jnp.int32), gidx, axis=1)
    return mh_hi, mh_lo, mz, mpos, mvalid


def hpc_compact(codes, lens, use_pallas: bool = False):
    """Homopolymer-run compression on device (sketch.c:94-105 HPC mode).

    Each run contributes one symbol; positions map to the run's LAST base
    (the reference records minimizer pos at the end of the current run).
    Returns (hcodes (B,L) u8, hpos (B,L) i32 original end positions,
    lc (B,) i32 compacted lengths).  Spans >= 256 are not masked (the
    reference drops such k-mers; vanishingly rare, statistical path)."""
    B, L = codes.shape
    posi = jnp.arange(L, dtype=jnp.int32)[None, :]
    c32 = codes.astype(jnp.int32)
    nxt = jnp.concatenate([c32[:, 1:], jnp.full((B, 1), 4, jnp.int32)],
                          axis=1)
    in_read = posi < lens[:, None]
    run_end = in_read & ((c32 != nxt) | (posi == lens[:, None] - 1))
    lc = jnp.sum(run_end, axis=1, dtype=jnp.int32)
    if use_pallas and B % 8 == 0:
        from ..ops.sort_pallas import sort1_rows
        A = 1 << (L - 1).bit_length()
        key = jnp.where(run_end, posi, jnp.int32(0x7FFFFFFF)) \
            .astype(jnp.uint32)
        if A > L:
            key = jnp.pad(key, ((0, 0), (0, A - L)),
                          constant_values=np.uint32(0x7FFFFFFF))
        hpos = jnp.minimum(sort1_rows(key, G=8)[:, :L].astype(jnp.int32), L)
    else:
        csum = jnp.cumsum(run_end.astype(jnp.int32), axis=1)
        rank = jnp.where(run_end, csum - 1, L)
        rank = jnp.minimum(rank, L)
        hpos = jnp.full((B, L + 1), L, jnp.int32)
        rows = jnp.arange(B, dtype=jnp.int32)[:, None]
        hpos = hpos.at[rows, rank].min(jnp.where(run_end, posi, L))
        hpos = hpos[:, :L]
    hvalid = hpos < L
    hcodes = jnp.where(hvalid,
                       jnp.take_along_axis(c32, jnp.clip(hpos, 0, L - 1),
                                           axis=1), 4).astype(jnp.uint8)
    return hcodes, hpos, lc


def _lookup_anchors(di: DeviceIndex, mh_hi, mh_lo, mz, mpos, mvalid, qlen,
                    p: BatchParams, interpret: bool = True, mspan=None):
    """Seed lookup + anchor expansion (seed.c:30-52, map.c:168-204).

    Returns int32 anchor planes sorted by (rev, rid, rpos, qpos):
      a_rev, a_rid, a_rpos, a_qpos (B, A) with valid mask, plus the
      per-read rep_len (B,) -- the union length of the query intervals of
      occurrence-filtered seeds (seed.c:113-129), which feeds both the
      rl:i tag and the mapq uniq_ratio (hit.c:447).
    """
    B, M = mh_hi.shape
    K = di.keys2.shape[0]
    if mspan is None:       # per-anchor query span; k unless HPC
        mspan = jnp.full((B, M), p.k, jnp.int32)
    if di.h2r is not None:
        # payload-fused 2-choice probe: TWO row gathers total.  Choice
        # 1/2 = two independent Fibonacci hashes (see DeviceIndex.h2r).
        kb = di.key_bits
        b1 = _mulhi_u32(mh_lo * jnp.uint32(2654435769),
                        di.h2r_nb).astype(jnp.int32)
        k11 = (((mh_lo >> jnp.uint32(11)) | (mh_hi << jnp.uint32(21)))
               * jnp.uint32(2654435761))
        b2 = _mulhi_u32(k11, di.h2r_nb).astype(jnp.int32)
        if di.h2r.shape[1] == 2 * H2R_SLOTS:
            # stride-2 rows: [key|cnt_hi2<<30, start|cnt_lo4<<28] at
            # even/odd lanes.  No deinterleaving slices: compare the
            # whole row against the query key under an even-lane mask,
            # roll the hit plane one lane right to select the odd word.
            # (The benign corner: an empty slot's masked w0 is
            # 0x3FFFFFFF, so THAT one key value can false-hit with
            # cnt = 63 -> occurrence-filtered; harmless.)
            lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            evmask = (lane128 & 1) == 0
            kmask = jnp.uint32(0x3FFFFFFF)

            def probe2(bkt):
                r = di.h2r[bkt]                           # (B, M, 128)
                hitu = (((r & kmask) == mh_lo[..., None]) & evmask) \
                    .astype(jnp.uint32)
                hod = jnp.roll(hitu, 1, axis=-1)
                w0 = jnp.max(r * hitu, axis=-1)
                w1 = jnp.max(r * hod, axis=-1)
                return w0, w1, jnp.max(hitu, axis=-1)

            w0a, w1a, fa = probe2(b1)
            w0b, w1b, fb = probe2(b2)
            w0v = jnp.maximum(w0a, w0b)
            w1v = jnp.maximum(w1a, w1b)
            found = ((fa | fb) > 0) & mvalid
            start = jnp.where(found,
                              (w1v & jnp.uint32(0x0FFFFFFF))
                              .astype(jnp.int32), 0)
            cnt_raw = (((w0v >> jnp.uint32(30)) << jnp.uint32(4))
                       | (w1v >> jnp.uint32(28))).astype(jnp.int32)
            occ_eff = min(p.occ_cap, H2R2_OCC_CAP)
            cnt = jnp.where(found & (cnt_raw <= occ_eff), cnt_raw, 0)
            flt = found & (cnt_raw > occ_eff)
            return _expand_anchors(di, start, cnt, flt, mz, mpos, mspan,
                                   qlen, p, interpret)
        cat = jnp.concatenate([di.h2r[b1], di.h2r[b2]], axis=-1)
        kpl = cat[..., 0::4]                              # (B, M, 128)
        spl = cat[..., 2::4].astype(jnp.int32)
        cpl = cat[..., 3::4].astype(jnp.int32)
        if kb < 32:      # the full key fits key_sel; sentinel can't match
            hit = kpl == mh_lo[..., None]
        else:
            hit = ((kpl == mh_hi[..., None])
                   & (cat[..., 1::4] == mh_lo[..., None]))
        found = jnp.any(hit, axis=-1) & mvalid
        start = jnp.where(found, jnp.max(jnp.where(hit, spl, 0), axis=-1), 0)
        cnt_raw = jnp.max(jnp.where(hit, cpl, 0), axis=-1)
        cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
        flt = found & (cnt_raw > p.occ_cap)
        return _expand_anchors(di, start, cnt, flt, mz, mpos, mspan, qlen,
                               p, interpret)
    if di.h2 is not None:
        # 2-choice bucketed hash probe: exactly two row gathers per
        # minimizer (native build_hash2_table layout)
        S_ = di.h2_slots
        key32 = di.h2.shape[1] == S_ * 3
        stride = 3 if key32 else 4
        k11 = (((mh_lo >> jnp.uint32(11)) | (mh_hi << jnp.uint32(21)))
               * jnp.uint32(2654435761))
        if di.h2_nb:        # non-pow2 table: mulhi range reduction
            m1 = mh_lo * jnp.uint32(2654435769)
            b1 = _mulhi_u32(m1, di.h2_nb).astype(jnp.int32)
            b2 = _mulhi_u32(k11, di.h2_nb).astype(jnp.int32)
        else:               # legacy pow2 table: low-bits mask
            mask = jnp.uint32((1 << di.h2_bits) - 1)
            b1 = (mh_lo & mask).astype(jnp.int32)
            b2 = ((k11 >> jnp.uint32(7)) & mask).astype(jnp.int32)
        t = jnp.concatenate([di.h2[b1], di.h2[b2]], axis=-1) \
            .reshape(B, M, 2 * S_, stride)                 # (B, M, 2S, st)
        if key32:
            hit = t[..., 0] == mh_lo.astype(jnp.int32)[..., None]
            s_pl, c_pl = t[..., 1], t[..., 2]
        else:
            hit = ((t[..., 0] == mh_hi.astype(jnp.int32)[..., None])
                   & (t[..., 1] == mh_lo.astype(jnp.int32)[..., None]))
            s_pl, c_pl = t[..., 2], t[..., 3]
        found = jnp.any(hit, axis=-1) & mvalid
        start = jnp.max(jnp.where(hit, s_pl, 0), axis=-1)
        cnt_raw = jnp.max(jnp.where(hit, c_pl, 0), axis=-1)
        start = jnp.where(found, start, 0)
        cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
        flt = found & (cnt_raw > p.occ_cap)
        return _expand_anchors(di, start, cnt, flt, mz, mpos, mspan, qlen,
                               p, interpret)
    if di.bucket_start is not None and di.probe_win and di.krows is not None:
        # windowed probe: bucket b's keys live at sorted positions
        # [bucket_start[b], bucket_start[b+1]) with <= 25 keys per bucket
        # (verified at build; devbuild grows bb otherwise).  krows packs
        # 64 interleaved (hi, lo) pairs per 128-lane row, so TWO
        # consecutive 512 B row gathers starting at floor(lo/64) cover
        # pairs lo..lo+64 >= the whole bucket, and one bucket_start
        # gather + 1 sc2 pair gather complete the probe -- no binary
        # search, and no (K, 2) relayout (see DeviceIndex.krows).
        RK = di.krows.shape[0]
        KP = di.sc2.shape[0]
        nb1 = di.bucket_start.shape[0]
        bhi, blo = _shr64(mh_hi, mh_lo, di.key_shift) \
            if di.key_shift else (mh_hi, mh_lo)
        bkt = jnp.clip(blo, 0, nb1 - 2).astype(jnp.int32)
        lo = di.bucket_start[bkt]                               # (B, M)
        row = jnp.clip(lo >> 6, 0, RK - 2)
        cat = jnp.concatenate([di.krows[row], di.krows[row + 1]],
                              axis=-1)                          # (B, M, 256)
        # interleaved [hi0, lo0, hi1, lo1, ...]: stride-2 slices keep the
        # minor dim >= 128 (a reshape to (.., 128, 2) would re-pad)
        eq = ((cat[..., 0::2] == mh_hi[..., None])
              & (cat[..., 1::2] == mh_lo[..., None]))           # (B, M, 128)
        found = jnp.any(eq, axis=-1) & mvalid
        lane = jnp.argmax(eq, axis=-1).astype(jnp.int32)
        pos = row * 64 + lane
        sv = di.sc2[jnp.minimum(pos, KP - 1)]
        start = jnp.where(found, sv[..., 0], 0)
        cnt_raw = sv[..., 1]
        cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
        flt = found & (cnt_raw > p.occ_cap)
        return _expand_anchors(di, start, cnt, flt, mz, mpos, mspan, qlen,
                               p, interpret)
    if di.bucket_start is not None:
        # direct-address bucket probe (index.c bucket structure as a
        # device table): ~6 bounded-search gathers instead of ~2*log2(K);
        # keys are (hi, lo)-pair-packed so each probe is ONE gather
        nb1 = di.bucket_start.shape[0]
        bhi, blo = _shr64(mh_hi, mh_lo, di.key_shift) \
            if di.key_shift else (mh_hi, mh_lo)
        bkt = jnp.clip(blo, 0, nb1 - 2).astype(jnp.int32)
        lo = di.bucket_start[bkt]
        hi = di.bucket_start[bkt + 1]
        for _ in range(di.n_probe):  # static bound: ceil(log2(max bucket))
            mid = (lo + hi) >> 1
            midc = jnp.clip(mid, 0, K - 1)
            kv = di.keys2[midc]                       # (B, M, 2)
            less = _lt64(kv[..., 0], kv[..., 1], mh_hi,
                         mh_lo) & (mid < hi)
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        idx = lo
    else:
        idx = searchsorted_u64pair(di.keys2[:, 0], di.keys2[:, 1],
                                   mh_hi, mh_lo)
    idx_c = jnp.minimum(idx, K - 1)
    kv = di.keys2[idx_c]
    found = (kv[..., 0] == mh_hi) & (kv[..., 1] == mh_lo) & mvalid
    sv = di.sc2[idx_c]
    start = jnp.where(found, sv[..., 0], 0)
    # mid_occ semantics (seed.c:30-52): seeds above the occurrence
    # threshold are skipped entirely, not truncated
    cnt_raw = sv[..., 1]
    cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
    flt = found & (cnt_raw > p.occ_cap)
    return _expand_anchors(di, start, cnt, flt, mz, mpos, mspan, qlen, p,
                           interpret)


def _expand_anchors(di: DeviceIndex, start, cnt, flt, mz, mpos, mspan, qlen,
                    p: BatchParams, interpret: bool):
    """Seed (start, cnt) runs -> sorted anchor planes + rep_len (the
    shared tail of _lookup_anchors for both probe schemes)."""
    B, M = start.shape
    # rep_len: union of [pos-k+1, pos+1) over filtered seeds, in position
    # order (mpos is ascending) -- sum of min(k, en_i - en_prev_filtered)
    en = mpos + 1
    en_f = jnp.where(flt, en, 0)
    prev_incl = lax.associative_scan(jnp.maximum, en_f, axis=1)
    prev_excl = jnp.concatenate(
        [jnp.zeros((prev_incl.shape[0], 1), prev_incl.dtype),
         prev_incl[:, :-1]], axis=1)
    contrib = jnp.where(flt, jnp.minimum(p.k, en - prev_excl), 0)
    rep_len = jnp.sum(contrib, axis=1).astype(jnp.int32)
    # adaptive per-read occurrence cap: when the anchor capacity A would
    # overflow, shrink every seed's taken count to A // n_seeds instead
    # of silently dropping the HIGH-qpos seeds' anchors wholesale (which
    # cost rev-strand reads 2-5 kb of query coverage at 3 Gb genome
    # scale -- the reference never drops, it adapts via mid_occ)
    total0 = jnp.sum(cnt, axis=1, keepdims=True)
    nfound = jnp.maximum(jnp.sum(cnt > 0, axis=1, keepdims=True), 1)
    cap_r = jnp.maximum(p.A // nfound, 1).astype(cnt.dtype)
    cnt = jnp.where(total0 > p.A, jnp.minimum(cnt, cap_r), cnt)
    # per-seed output offsets; anchors beyond capacity A are dropped
    offs = jnp.cumsum(cnt, axis=1) - cnt                      # (B, M)
    ends = offs + cnt
    slot = jnp.arange(p.A, dtype=jnp.int32)[None, :]          # (1, A)
    # seed_of[a] = j covering slot a: scatter seed ids at run starts,
    # then a forward running max (replaces a per-row binary search)
    mark = jnp.full((B, p.A), -1, jnp.int32)
    jrow = jnp.arange(M, dtype=jnp.int32)[None, :].repeat(B, 0)
    scat = jnp.where(cnt > 0, jnp.minimum(offs, p.A - 1), p.A - 1)
    mark = mark.at[jnp.arange(B)[:, None], scat].max(
        jnp.where(cnt > 0, jrow, -1))
    seed_of = lax.associative_scan(jnp.maximum, mark, axis=1)
    seed_of = jnp.clip(seed_of, 0, M - 1)
    a_valid = slot < ends[:, -1:]
    # one 5-wide row gather replaces five take_along_axis calls
    seedpk = jnp.stack([offs, start, mz, mpos, mspan], axis=-1)
    g = jnp.take_along_axis(seedpk, seed_of[..., None], axis=1)
    within = slot - g[..., 0]
    pidx = g[..., 1] + within
    pidx = jnp.clip(pidx, 0, di.pos2.shape[0] - 1)
    if di.pos_fmt in (1, 2):
        # single u32 plane: global position; rid recovered by unrolled
        # compares against the (small) seq_off table -- no gather.
        # fmt 1 packs strand in the LSB (total < 2^31); fmt 2 keeps the
        # full u32 for position (GRCh38 scale) with strand in a bitmap.
        pv1 = di.pos2[pidx]                                   # (B, A) u32
        if di.pos_fmt == 1:
            gpos = (pv1 >> jnp.uint32(1)).astype(jnp.int32)
            rstrand = (pv1 & jnp.uint32(1)).astype(jnp.int32)
            so_u = di.seq_off.astype(jnp.uint32)
            gpos_u = gpos.astype(jnp.uint32)
        else:
            gpos_u = pv1
            sb = di.pstrand[jnp.clip((pidx >> 3), 0,
                                     di.pstrand.shape[0] - 1)]
            rstrand = ((sb >> (pidx & 7).astype(jnp.uint8))
                       & jnp.uint8(1)).astype(jnp.int32)
            so_u = lax.bitcast_convert_type(di.seq_off, jnp.uint32)
        n_seq = di.seq_off.shape[0]
        if n_seq <= 16:
            # tiny contig tables: unrolled compares, no gathers at all
            rid = jnp.zeros(gpos_u.shape, jnp.int32)
            off_sel = jnp.zeros(gpos_u.shape, jnp.uint32)
            for j in range(1, n_seq):
                in_j = gpos_u >= so_u[j]
                rid = rid + in_j.astype(jnp.int32)
                off_sel = jnp.where(in_j, so_u[j], off_sel)
        elif di.rtab is not None:
            # GRCh38-class contig counts (195+): a 4 KiB-block lookup
            # row [off, next_off, rid] -- ONE 16 B gather.  At most one
            # contig boundary can sit inside a block (contigs are
            # >= 4 KiB), and the correction reuses the fetched
            # next_off.  The binary search this replaces cost
            # ceil(log2(n_seq))+1 = 9 full-size gathers per batch
            # (~180 ms at GRCh38 scale; gather cost is per-descriptor
            # even from tiny source tables).
            rv_ = di.rtab[jnp.minimum((gpos_u >> jnp.uint32(12))
                                      .astype(jnp.int32),
                                      di.rtab.shape[0] - 1)]
            nxt = rv_[..., 1]
            ge_ = gpos_u >= nxt
            rid = (rv_[..., 2].astype(jnp.int32)
                   + ge_.astype(jnp.int32))
            off_sel = jnp.where(ge_, nxt, rv_[..., 0])
        else:
            # fallback: branchless binary search over the sorted
            # separated offsets (ceil(log2(n_seq)) tiny-table gathers)
            import math as _math
            lo_ = jnp.zeros(gpos_u.shape, jnp.int32)
            hi_ = jnp.full(gpos_u.shape, n_seq, jnp.int32)
            for _ in range(int(_math.ceil(_math.log2(n_seq))) + 1):
                mid_ = (lo_ + hi_) >> 1
                go_ = so_u[jnp.clip(mid_, 0, n_seq - 1)]
                take = (mid_ < n_seq) & (go_ <= gpos_u)
                lo_ = jnp.where(take, mid_ + 1, lo_)
                hi_ = jnp.where(take, hi_, mid_)
            rid = jnp.maximum(lo_ - 1, 0)
            off_sel = so_u[rid]
        rpos = (gpos_u - off_sel).astype(jnp.int32)
    else:
        pv = di.pos2[pidx]                                    # (B, A, 2)
        rid = pv[..., 0]
        rps = pv[..., 1]             # rpos<<1 | strand (packed plane)
        rpos = rps >> 1
        rstrand = rps & 1
    qz = g[..., 2]
    qpos = g[..., 3]
    span = g[..., 4]
    same = rstrand == qz
    rev = (~same).astype(jnp.int32)
    # query coordinate flip on reverse strand (seed.c / map.c:196-201)
    # using the per-anchor span (exact for HPC minimizers)
    qpos_out = jnp.where(same, qpos, qlen[:, None] - (qpos + 1 - span) - 1)
    # sort by (rev<<30|rid, rpos, span<<20|qpos); invalid to end; all
    # planes are reconstructible from the three keys (span rides in
    # key3's high bits; qpos < 2^20)
    key1 = jnp.where(a_valid, (rev.astype(jnp.uint32) << jnp.uint32(30))
                     | rid.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    key2 = rpos.astype(jnp.uint32)
    key3 = ((jnp.clip(span, 1, 255).astype(jnp.uint32) << jnp.uint32(20))
            | jnp.clip(qpos_out, 0, None).astype(jnp.uint32))
    B_, A_ = key1.shape
    if not interpret and B_ % 8 == 0 and (A_ & (A_ - 1)) == 0 \
            and A_ <= 4096:
        # (above 4096 lanes the scoped 3-plane bitonic can blow VMEM
        # under unlucky scheduling; XLA's sort is fine for the rare
        # big-capacity configs)
        from ..ops.sort_pallas import sort3_rows
        key1, key2, key3 = sort3_rows(key1, key2, key3, G=8)
    else:
        key1, key2, key3 = lax.sort((key1, key2, key3), dimension=1,
                                    num_keys=3)
    av = key1 != jnp.uint32(0xFFFFFFFF)
    rev = (key1 >> jnp.uint32(30)).astype(jnp.int32) & 1
    rid = (key1 & jnp.uint32(0x3FFFFFFF)).astype(jnp.int32)
    rpos = key2.astype(jnp.int32)
    qpos_s = (key3 & jnp.uint32(0xFFFFF)).astype(jnp.int32)
    span_s = (key3 >> jnp.uint32(20)).astype(jnp.int32)
    return rev, rid, rpos, qpos_s, span_s, av.astype(bool), rep_len


def _chain_scan(rev, rid, rpos, qpos, span, av, p: BatchParams):
    """Windowed chaining DP (lchain.c:148-217 with a fixed look-back window).

    Scans anchors in sorted order; for each anchor i the best predecessor is
    searched among the previous `chain_window` anchors (the reference bounds
    its own scan with max_iter/max_skip).  Tracks per-chain start coordinates
    so the best chain's extent is available without a backtrack pass.
    Returns per-read best chain (score, qs, qe, rs, re, rev, rid).
    """
    B, A = rpos.shape
    WND = p.chain_window
    RW, RS = p.rmq_window, p.rmq_stride
    bw2 = p.bw_long if p.bw_long > p.bw else p.bw

    def step(carry, xs):
        # window planes: (B, WND) of predecessor candidates
        if p.rmq_tier:
            (fw, revw, ridw, rposw, qposw, spanw, qsw, rsw, vw, w2,
             best, i) = carry
        else:
            fw, revw, ridw, rposw, qposw, spanw, qsw, rsw, vw, best, i \
                = carry
        rv, ri, rp, qp_, sp_, ok = xs                          # (B,) each

        def cands(qposw_, rposw_, revw_, ridw_, spanw_, fw_, band):
            dq = qp_[:, None] - qposw_                         # i minus j
            dr = rp[:, None] - rposw_
            same = (revw_ == rv[:, None]) & (ridw_ == ri[:, None])
            bad = (dq <= 0) | (dq > p.max_dist_x)
            bad |= (dr == 0) | (dq > p.max_dist_y)
            dd = jnp.abs(dr - dq)
            bad |= dd > band
            bad |= ~same
            dg = jnp.minimum(dr, dq)
            # q_span of the PREDECESSOR caps the gain (lchain.c:126)
            sc = jnp.minimum(spanw_, dg)
            lin = (jnp.float32(p.chn_pen_gap) * dd.astype(jnp.float32)
                   + jnp.float32(p.chn_pen_skip)
                   * dg.astype(jnp.float32))
            logp = jnp.where(dd >= 1,
                             mg_log2_dev((dd + 1).astype(jnp.float32)),
                             jnp.float32(0))
            pen = jnp.trunc(lin + jnp.float32(0.5) * logp) \
                .astype(jnp.int32)
            need = (dd != 0) | (dg > spanw_)
            sc = jnp.where(need, sc - pen, sc)
            return jnp.where(bad | (fw_ <= NEG_INF // 2), NEG_INF,
                             fw_ + sc)

        cand = cands(qposw, rposw, revw, ridw, spanw, fw, p.bw)
        qsw_all, rsw_all, vw_all = qsw, rsw, vw
        if p.rmq_tier:
            # long tier: strided history under the wide band (the RMQ
            # chainer's long-gap joins; see BatchParams.rmq_tier)
            (fw2, revw2, ridw2, rposw2, qposw2, spanw2, qsw2, rsw2,
             vw2) = w2
            cand2 = cands(qposw2, rposw2, revw2, ridw2, spanw2, fw2, bw2)
            cand = jnp.concatenate([cand, cand2], axis=1)
            qsw_all = jnp.concatenate([qsw, qsw2], axis=1)
            rsw_all = jnp.concatenate([rsw, rsw2], axis=1)
            vw_all = jnp.concatenate([vw, vw2], axis=1)
        bj = jnp.argmax(cand, axis=1)                          # (B,)
        bsc = jnp.take_along_axis(cand, bj[:, None], 1)[:, 0]
        indep = sp_
        use_pred = bsc >= indep
        f_i = jnp.where(use_pred, bsc, indep)
        f_i = jnp.where(ok, f_i, NEG_INF)
        qs_i = jnp.where(use_pred,
                         jnp.take_along_axis(qsw_all, bj[:, None], 1)[:, 0],
                         qp_ - sp_ + 1)
        rs_i = jnp.where(use_pred,
                         jnp.take_along_axis(rsw_all, bj[:, None], 1)[:, 0],
                         rp - sp_ + 1)
        # peak score along the chain (lchain.c v[] semantics)
        v_pred = jnp.take_along_axis(vw_all, bj[:, None], 1)[:, 0]
        v_i = jnp.where(use_pred & (v_pred > f_i), v_pred, f_i)
        # global predecessor index (window slot w holds anchor i - WND + w;
        # long-tier slots report -2: sufficient for "has a predecessor")
        pred_i = jnp.where(use_pred & ok,
                           jnp.where(bj < WND, i - WND + bj, -2), -1)
        qs_i = jnp.where(ok, qs_i, 0)
        rs_i = jnp.where(ok, rs_i, 0)

        # roll window, insert current at the end
        def push(wnd, val):
            return jnp.concatenate([wnd[:, 1:], val[:, None]], axis=1)
        carry2 = (push(fw, f_i), push(revw, rv), push(ridw, ri),
                  push(rposw, rp), push(qposw, qp_), push(spanw, sp_),
                  push(qsw, qs_i), push(rsw, rs_i), push(vw, v_i))
        if p.rmq_tier:
            # every RS-th anchor also enters the strided long window
            take2 = (i % RS) == 0

            def push2(wnd, val):
                return jnp.where(take2, push(wnd, val), wnd)
            w2n = (push2(fw2, f_i), push2(revw2, rv), push2(ridw2, ri),
                   push2(rposw2, rp), push2(qposw2, qp_),
                   push2(spanw2, sp_), push2(qsw2, qs_i),
                   push2(rsw2, rs_i), push2(vw2, v_i))
            carry2 = carry2 + (w2n,)
        # track the best-ending chain per read
        b_sc, b_qs, b_qe, b_rs, b_re, b_rev, b_rid = best
        better = f_i > b_sc
        best2 = (jnp.where(better, f_i, b_sc),
                 jnp.where(better, qs_i, b_qs),
                 jnp.where(better, qp_ + 1, b_qe),
                 jnp.where(better, rs_i, b_rs),
                 jnp.where(better, rp + 1, b_re),
                 jnp.where(better, rv, b_rev),
                 jnp.where(better, ri, b_rid))
        carry2 = carry2 + (best2, i + 1)
        return carry2, (f_i, pred_i, v_i, qs_i, rs_i)

    z32 = jnp.zeros((B, WND), jnp.int32)
    init = (jnp.full((B, WND), NEG_INF, jnp.int32), z32, z32, z32, z32,
            z32, z32, z32, jnp.full((B, WND), NEG_INF, jnp.int32))
    if p.rmq_tier:
        z2 = jnp.zeros((B, RW), jnp.int32)
        init = init + ((jnp.full((B, RW), NEG_INF, jnp.int32), z2, z2,
                        z2, z2, z2, z2, z2,
                        jnp.full((B, RW), NEG_INF, jnp.int32)),)
    init = init + (
        (jnp.full((B,), NEG_INF, jnp.int32), jnp.zeros((B,), jnp.int32),
         jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
         jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
         jnp.zeros((B,), jnp.int32)),
        jnp.int32(0))
    xs = (rev.T, rid.T, rpos.T, qpos.T, span.T, av.T)
    carry, (f, pred, vv, qs_a, rs_a) = lax.scan(step, init, xs)
    best = carry[10] if p.rmq_tier else carry[9]
    return best, (f.T, pred.T, vv.T, qs_a.T, rs_a.T)


def topk_chains(f, qs_a, rs_a, rev, rid, rpos, qpos, av, K: int,
                min_sc: int, with_sec: bool = False):
    """Greedy top-K query-non-overlapping chains per read, on device.

    Device analogue of mg_chain_backtrack + mm_set_parent's primary
    selection (lchain.c:27-76, hit.c:125-186): repeatedly take the
    best-scoring chain end, mask out all anchors overlapping its query
    span, record the runner-up overlapping score as the chain's sub-score.
    Returns (K, B) planes: score, sub, qs, qe, rs, re, rev, rid, cnt.

    with_sec=True additionally emits, after each selected chain, the
    best query-OVERLAPPING runner-up chain as an explicit record (the
    reference keeps such chains as secondaries, hit.c:125-186, rather
    than discarding them) -> (2K, B) planes, slots interleaved
    [pri0, sec0, pri1, sec1, ...]; missing secondaries have score<=0.
    """
    B, A = f.shape
    alive = av & (f >= min_sc)
    outs = []
    for _ in range(K):
        fm = jnp.where(alive, f, NEG_INF)
        bi = jnp.argmax(fm, axis=1)                            # (B,)
        take = lambda x: jnp.take_along_axis(x, bi[:, None], 1)[:, 0]
        sc1 = take(fm)
        qs1, rs1 = take(qs_a), take(rs_a)
        qe1 = take(qpos) + 1
        re1 = take(rpos) + 1
        rev1, rid1 = take(rev), take(rid)
        member = (qs_a == qs1[:, None]) & (rs_a == rs1[:, None]) \
            & (rev == rev1[:, None]) & (rid == rid1[:, None])
        cnt1 = jnp.sum(member & alive, axis=1).astype(jnp.int32)
        # query-overlap mask (mask_level analogue); sub-score = best
        # overlapping non-member chain end
        ovlp = (qpos >= qs1[:, None]) & (qpos < qe1[:, None])
        sub_cand = jnp.where(alive & ovlp & ~member, f, NEG_INF)
        sub1 = jnp.max(sub_cand, axis=1)
        outs.append((sc1, sub1, qs1, qe1, rs1, re1, rev1, rid1, cnt1))
        if with_sec:
            bi2 = jnp.argmax(sub_cand, axis=1)
            tk2 = lambda x: jnp.take_along_axis(x, bi2[:, None], 1)[:, 0]
            qs2, rs2 = tk2(qs_a), tk2(rs_a)
            qe2, re2 = tk2(qpos) + 1, tk2(rpos) + 1
            rev2, rid2 = tk2(rev), tk2(rid)
            member2 = (qs_a == qs2[:, None]) & (rs_a == rs2[:, None]) \
                & (rev == rev2[:, None]) & (rid == rid2[:, None])
            cnt2 = jnp.sum(member2 & alive, axis=1).astype(jnp.int32)
            outs.append((sub1, sc1, qs2, qe2, rs2, re2, rev2, rid2, cnt2))
        alive = alive & ~ovlp
    return [jnp.stack(x) for x in zip(*outs)]


def chain_waypoints(qs_a, rs_a, rev, rid, rpos, qpos, av, rec0, WP: int):
    """Up to WP evenly spaced member anchors of each read's chosen chain
    (the device side of anchored decomposition, align.c:803-872): the
    align driver splits the chain extent at waypoint diagonal jumps into
    band-sized segment DPs instead of one global band.

    rec0 = (qs1, rs1, rev1, rid1) -- the chosen chain's start/strand
    planes, each (B,).  Returns (wq, wr) int32 (B, WP), -1 = empty.
    Within a chain both rpos and qpos are non-decreasing along the
    anchor order, so per-bucket max picks a consistent (q, r) pair."""
    qs1, rs1, rev1, rid1 = rec0
    B = qs_a.shape[0]
    member = av & (qs_a == qs1[:, None]) & (rs_a == rs1[:, None]) \
        & (rev == rev1[:, None]) & (rid == rid1[:, None])
    rank = jnp.cumsum(member.astype(jnp.int32), axis=1)
    cnt = rank[:, -1:]
    j = jnp.clip((rank - 1) * (WP - 1) // jnp.maximum(cnt - 1, 1),
                 0, WP - 1)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    jm = jnp.where(member, j, WP - 1)
    neg = jnp.full((B, WP), -1, jnp.int32)
    wq = neg.at[rows, jm].max(jnp.where(member, qpos, -1))
    wr = neg.at[rows, jm].max(jnp.where(member, rpos, -1))
    return wq, wr


def _extend_best(di: DeviceIndex, codes, lens, best, p: BatchParams,
                 interpret: bool):
    """Banded extension of each read's best chain region via the extd2 v2
    Pallas kernel (approx-max score mode, the reference's gap-fill mode),
    aligning query[qs:qe] vs target[rs:re]."""
    from ..ops.extend_pallas2 import EZ_SCORE, extd2_batch2
    b_sc, qs, qe, rs, re_, rv, rid = best
    B, L = codes.shape
    qs = jnp.clip(qs, 0, lens)
    qe = jnp.clip(qe, qs, lens)
    tlen_full = di.seq_len[jnp.clip(rid, 0, di.seq_len.shape[0] - 1)]
    rs = jnp.clip(rs, 0, tlen_full)
    re_ = jnp.clip(re_, rs, tlen_full)
    qlen = jnp.minimum(qe - qs, p.QP)
    tlen = jnp.minimum(re_ - rs, p.TP)
    # query segment, reverse-complemented when rev, then stored reversed
    # (kernel expects reversed query)
    ar = jnp.arange(p.QP, dtype=jnp.int32)[None, :]
    qidx_f = qs[:, None] + ar
    qidx_r = (lens - qe)[:, None] + ar                         # rev strand
    qidx = jnp.where(rv[:, None] == 0, qidx_f, qidx_r)
    qcode = jnp.take_along_axis(codes, jnp.clip(qidx, 0, L - 1), axis=1)
    qcode = jnp.where(rv[:, None] == 1,
                      jnp.where(qcode < 4, 3 - qcode, qcode), qcode)
    qcode = jnp.where(ar < qlen[:, None], qcode, jnp.uint8(4)).astype(jnp.uint8)
    if True:  # rev-strand query runs 3'->5' on the read; flip to segment order
        flip = jnp.where(rv[:, None] == 1, qlen[:, None] - 1 - ar, ar)
        qcode = jnp.take_along_axis(qcode, jnp.clip(flip, 0, p.QP - 1), axis=1)
    # kernel wants the REVERSED query: qr[i] = q[qlen-1-i]
    ridx = jnp.clip(qlen[:, None] - 1 - ar, 0, p.QP - 1)
    qr = jnp.take_along_axis(qcode, ridx, axis=1)
    art = jnp.arange(p.TP, dtype=jnp.int32)[None, :]
    soff = di.seq_off[jnp.clip(rid, 0, di.seq_off.shape[0] - 1)]
    if di.pos_fmt == 2:      # u32 offsets ride bitcast in the i32 plane
        soff_u = lax.bitcast_convert_type(soff, jnp.uint32)
        tidx = (soff_u[:, None] + rs.astype(jnp.uint32)[:, None]
                + art.astype(jnp.uint32))
    else:
        tidx = soff[:, None] + rs[:, None] + art
    tcode = _gather_s(di, tidx)
    tcode = jnp.where(art < tlen[:, None], tcode, jnp.uint8(4)).astype(jnp.uint8)
    lens2 = jnp.stack([jnp.maximum(qlen, 1), jnp.maximum(tlen, 1)],
                      axis=1).astype(jnp.int32)
    R = p.QP + p.TP - 1
    # chunk-uniform window: band + 48 + RB/2 drift must fit in W
    w_eff = min(p.ext_w, p.W - 48 - 64)
    _, ez = extd2_batch2(qr, tcode, lens2, G=16, W=p.W, RB=128, R=R,
                         QP=p.QP, TP=p.TP, q=p.gapo, e=p.gape, q2=p.gapo2,
                         e2=p.gape2, w=w_eff, zdrop=p.zdrop,
                         right_mode=False, approx_max=True,
                         approx_drop=False, sc_mch=p.sc_mch, sc_mis=p.sc_mis,
                         sc_N=-1, with_cigar=False, interpret=interpret)
    return ez[:, EZ_SCORE]


def map_batch(di: DeviceIndex, codes, lens, p: BatchParams,
              interpret: bool = False):
    """One full device mapping step over a (B, L) read batch.

    Returns dict of per-read arrays: chain score, extension score, locus.
    """
    hhi, hlo, z, is_mini = device_sketch(codes, lens, p.k, p.w)
    mh_hi, mh_lo, mz, mpos, mvalid = _compact_minimizers(hhi, hlo, z,
                                                         is_mini, p.M)
    rev, rid, rpos, qpos, span, av, _rep = _lookup_anchors(
        di, mh_hi, mh_lo, mz, mpos, mvalid, lens, p, interpret)
    best, _ = _chain_scan(rev, rid, rpos, qpos, span, av, p)
    ext = _extend_best(di, codes, lens, best, p, interpret)
    b_sc, qs, qe, rs, re_, rv, rid_b = best
    mapped = b_sc > 0
    return {
        "chain_score": b_sc, "ext_score": ext, "mapped": mapped,
        "rid": rid_b, "rev": rv, "qs": qs, "qe": qe, "rs": rs, "re": re_,
        "n_anchors": av.sum(axis=1).astype(jnp.int32),
    }


# ---------------------------------------------------------------------------
# sharded step
# ---------------------------------------------------------------------------


def make_sharded_step(mesh, p: BatchParams, interpret: bool = False,
                      **aux):
    """Build a pjit-ed mapping step over a ('data', 'idx') mesh.

    Reads shard over 'data'.  The index shards over 'idx' by key range; each
    idx shard finds its local anchors and the shards' anchors are merged with
    an all_gather over 'idx' (merge_hits map.c:476-539 as a collective), then
    chain+extend run on the merged set.  Read-level stats psum over 'data'.
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
        _sm_kw = {"check_vma": False}      # jax >= 0.8 renamed check_rep
    except ImportError:                    # older jax
        from jax.experimental.shard_map import shard_map
        _sm_kw = {"check_rep": False}

    def local_step(di, codes, lens):
        hhi, hlo, z, is_mini = device_sketch(codes, lens, p.k, p.w)
        mh_hi, mh_lo, mz, mpos, mvalid = _compact_minimizers(hhi, hlo, z,
                                                             is_mini, p.M)
        # di leaves carry a leading shard axis of size 1 inside shard_map
        di_l = jax.tree_util.tree_map(lambda x: x[0], di)
        rev, rid, rpos, qpos, span, av, _rep = _lookup_anchors(
            di_l, mh_hi, mh_lo, mz, mpos, mvalid, lens, p)
        # per-(data, idx)-shard anchor count: the load-balance observable
        # for key-range index sharding (a skewed key distribution shows up
        # here before it shows up as a straggler)
        n_anc_local = av.sum(dtype=jnp.int32).reshape(1, 1)
        # merge anchors across index shards (collective merge_hits)
        n_idx = mesh.shape["idx"]
        if n_idx > 1:
            gathered = lax.all_gather((rev, rid, rpos, qpos, span,
                                       av.astype(jnp.int32)), "idx", axis=1,
                                      tiled=True)
            rev, rid, rpos, qpos, span, av_i = gathered
            # re-sort merged anchors, keep top A
            key1 = jnp.where(av_i.astype(bool),
                             (rev.astype(jnp.uint32) << jnp.uint32(30))
                             | rid.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
            key1, key2, key3, rev, rid, rpos, qpos, span, av_i = lax.sort(
                (key1, rpos.astype(jnp.uint32), qpos.astype(jnp.uint32),
                 rev, rid, rpos, qpos, span, av_i), dimension=1, num_keys=3)
            rev, rid, rpos, qpos, span = (a[:, :p.A] for a in
                                          (rev, rid, rpos, qpos, span))
            av = av_i[:, :p.A].astype(bool)
        best, _ = _chain_scan(rev, rid, rpos, qpos, span, av, p)
        ext = _extend_best(di_l, codes, lens, best, p, interpret)
        b_sc, qs, qe, rs, re_, rv, rid_b = best
        n_mapped = lax.psum((b_sc > 0).sum(), "data")
        out = {"chain_score": b_sc, "ext_score": ext, "rid": rid_b,
               "rev": rv, "qs": qs, "qe": qe, "rs": rs, "re": re_}
        return out, n_mapped, n_anc_local

    di_spec = jax.tree_util.tree_map(lambda _: P("idx"), _di_proto(**aux))
    fn = shard_map(local_step, mesh=mesh,
                   in_specs=(di_spec, P("data", None), P("data")),
                   out_specs=(jax.tree_util.tree_map(
                       lambda _: P("data"), {"chain_score": 0, "ext_score": 0,
                                             "rid": 0, "rev": 0, "qs": 0,
                                             "qe": 0, "rs": 0, "re": 0}),
                       P(), P("data", "idx")),
                   **_sm_kw)
    return jax.jit(fn)


def _di_proto(**aux):
    # optional leaves exist iff their aux marker says so; None keeps the
    # pytree structures of the spec proto and the real stacked
    # DeviceIndex aligned
    ps = 0 if aux.get("pos_fmt", 0) == 2 else None
    h2 = 0 if (aux.get("h2_nb", 0) or aux.get("h2_bits", 0)) else None
    h2r = 0 if aux.get("h2r_nb", 0) else None
    kr = 0 if aux.get("probe_win", 0) else None
    rt = 0 if aux.get("rtab_on", 0) else None
    return DeviceIndex(0, 0, 0, 0, 0, 0, 0, h2, ps, kr, h2r, rt, **aux)


def stack_shards(shards: list[DeviceIndex]) -> DeviceIndex:
    """Stack per-shard DeviceIndex pytrees along a leading 'idx' axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
