"""ctypes loader for the native host kernels (mmtpu.cpp).

Compiles on first import with g++ (cache keyed on a content hash of the
source, so a stale or foreign binary is never loaded); falls back to
`available() == False` if no compiler is present, in which case callers
use the NumPy paths.
"""
from __future__ import annotations

import ctypes as C
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mmtpu.cpp")
_SO = os.path.join(_DIR, "_mmtpu.so")
_HASH = _SO + ".srchash"

_lib = None


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(h: str) -> bool:
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "--param", "vect-max-version-for-alias-checks=40",
                        _SRC, "-o", _SO + ".tmp"], check=True,
                       capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        with open(_HASH, "w") as f:
            f.write(h)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    h = _src_hash()
    cached = None
    if os.path.exists(_SO) and os.path.exists(_HASH):
        with open(_HASH) as f:
            cached = f.read().strip()
    if cached != h:
        if not _build(h):
            return None
    lib = C.CDLL(_SO)
    lib.mm_sketch_nt4.restype = C.c_int64
    lib.mm_sketch_nt4.argtypes = [
        C.c_void_p, C.c_int64, C.c_int, C.c_int, C.c_uint32, C.c_int,
        C.c_void_p, C.c_void_p, C.c_int64]
    lib.mm_collect_anchors.restype = C.c_int64
    lib.mm_collect_anchors.argtypes = [
        C.c_void_p, C.c_void_p, C.c_int64, C.c_void_p, C.c_void_p,
        C.c_int64, C.c_void_p, C.c_int64, C.c_int64, C.c_int64, C.c_int64,
        C.c_void_p, C.c_void_p, C.c_int64, C.c_void_p, C.c_void_p,
        C.c_void_p]
    class _EzOut(C.Structure):
        _fields_ = [(n, C.c_int32) for n in (
            "max", "zdropped", "max_q", "max_t", "mqe", "mqe_t", "mte",
            "mte_q", "score", "reach_end", "n_cigar", "pad")]
    lib.EzOut = _EzOut
    lib.ksw_extd2_cpp.restype = C.c_int64
    lib.ksw_extd2_cpp.argtypes = [
        C.c_int, C.c_void_p, C.c_int, C.c_void_p, C.c_int, C.c_void_p,
        C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, C.POINTER(_EzOut), C.c_void_p, C.c_int64]
    lib.ksw_extz2_cpp.restype = C.c_int64
    lib.ksw_extz2_cpp.argtypes = [
        C.c_int, C.c_void_p, C.c_int, C.c_void_p, C.c_int, C.c_void_p,
        C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.POINTER(_EzOut), C.c_void_p, C.c_int64]
    lib.ksw_exts2_cpp.restype = C.c_int64
    lib.ksw_exts2_cpp.argtypes = [
        C.c_int, C.c_void_p, C.c_int, C.c_void_p, C.c_int, C.c_void_p,
        C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_int,
        C.c_int, C.c_int, C.c_void_p, C.POINTER(_EzOut), C.c_void_p,
        C.c_int64]
    lib.mg_lchain_dp_cpp.restype = C.c_int64
    lib.mg_lchain_dp_cpp.argtypes = [
        C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64,
        C.c_int64, C.c_float, C.c_float, C.c_int, C.c_int, C.c_int64,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
        C.c_void_p]
    lib.ksw_ll_cpp.restype = C.c_int64
    lib.ksw_ll_cpp.argtypes = [
        C.c_int, C.c_void_p, C.c_int, C.c_void_p, C.c_int, C.c_void_p,
        C.c_int, C.c_int, C.c_void_p, C.c_void_p]
    lib.mm_sketch_many.restype = C.c_int64
    lib.mm_sketch_many.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_int64, C.c_int, C.c_int,
        C.c_int, C.c_void_p, C.c_void_p, C.c_int64]
    lib.mg_lchain_rmq_cpp.restype = C.c_int64
    lib.mg_lchain_rmq_cpp.argtypes = [
        C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64, C.c_int64,
        C.c_int64, C.c_float, C.c_float, C.c_int64,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
        C.c_void_p]
    lib.mm_zdrop_scan.restype = None
    lib.mm_zdrop_scan.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_int64, C.c_void_p, C.c_int,
        C.c_int, C.c_int, C.c_void_p]
    lib.mm_update_extra_scan.restype = None
    lib.mm_update_extra_scan.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_int64, C.c_void_p, C.c_int,
        C.c_int, C.c_int, C.c_int, C.c_void_p]
    lib.radix_sort_u64_pair.restype = None
    lib.radix_sort_u64_pair.argtypes = [
        C.c_void_p, C.c_void_p, C.c_int64, C.c_int]
    lib.build_hash2_table.restype = C.c_int64
    lib.build_hash2_table.argtypes = [
        C.c_void_p, C.c_void_p, C.c_int64, C.c_int64, C.c_int, C.c_int,
        C.c_int, C.c_void_p]
    lib.mm_fastx_scan.restype = C.c_int64
    lib.mm_fastx_scan.argtypes = [
        C.c_void_p, C.c_int64, C.c_int, C.c_void_p, C.c_int64, C.c_void_p,
        C.c_void_p, C.c_int64, C.c_void_p]
    lib.mm_cigar_kadane_trim.restype = None
    lib.mm_cigar_kadane_trim.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_int64, C.c_void_p, C.c_int,
        C.c_int, C.c_int, C.c_int, C.c_int, C.c_int, C.c_void_p,
        C.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(C.c_void_p)


def sketch(codes: np.ndarray, w: int, k: int, rid: int, is_hpc: bool):
    """Native mm_sketch over nt4 codes -> (x, y) uint64 arrays."""
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    cap = max(16, 2 * len(codes) // max(w, 1) + 64)
    while True:
        out_x = np.empty(cap, np.uint64)
        out_y = np.empty(cap, np.uint64)
        n = lib.mm_sketch_nt4(_ptr(codes), len(codes), w, k, rid,
                              int(is_hpc), _ptr(out_x), _ptr(out_y), cap)
        if n <= cap:
            return out_x[:n], out_y[:n]
        cap = int(n) + 64


def sketch_many(codes: np.ndarray, offs: np.ndarray, lens: np.ndarray,
                w: int, k: int, is_hpc: bool):
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    cap = max(16, 2 * len(codes) // 2 + 1024)
    while True:
        out_x = np.empty(cap, np.uint64)
        out_y = np.empty(cap, np.uint64)
        n = lib.mm_sketch_many(_ptr(codes), _ptr(offs), _ptr(lens),
                               len(offs), w, k, int(is_hpc), _ptr(out_x),
                               _ptr(out_y), cap)
        if n <= cap:
            return out_x[:n], out_y[:n]
        cap = int(n) + 1024


def collect_anchors(mx: np.ndarray, my: np.ndarray, keys: np.ndarray,
                    starts: np.ndarray, pos: np.ndarray, qlen: int,
                    max_occ: int, max_max_occ: int, dist: int,
                    cap: int | None = None):
    """Native seed lookup + selection + anchor expansion + sort.

    Returns (ax, ay, rep_len, mini_pos)."""
    lib = _load()
    mx = np.ascontiguousarray(mx, dtype=np.uint64)
    my = np.ascontiguousarray(my, dtype=np.uint64)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    pos = np.ascontiguousarray(pos, dtype=np.uint64)
    if cap is None:
        cap = max(1024, 64 * len(mx))
    rep = np.zeros(1, np.int64)
    n_mini = np.zeros(1, np.int64)
    while True:
        ax = np.empty(cap, np.uint64)
        ay = np.empty(cap, np.uint64)
        minipos = np.empty(cap, np.uint64)
        n = lib.mm_collect_anchors(
            _ptr(mx), _ptr(my), len(mx), _ptr(keys), _ptr(starts),
            len(keys), _ptr(pos), qlen, max_occ, max_max_occ, dist,
            _ptr(ax), _ptr(ay), cap, _ptr(rep), _ptr(minipos),
            _ptr(n_mini))
        if n < cap:
            return ax[:n], ay[:n], int(rep[0]), minipos[:int(n_mini[0])]
        cap *= 4


def build_hash2_table(keys: np.ndarray, starts: np.ndarray, NB: int,
                      S: int, key32: bool,
                      mulhi: bool = False) -> tuple[np.ndarray, int]:
    """Build the (NB, S*stride) int32 2-choice bucketed device seed table
    (stride 3 when key32 else 4).  Returns (table, n_overflow).
    mulhi=True maps buckets via ((u64)h * NB) >> 32 (any NB, not just
    pow2), matching _mulhi_u32 on the device side."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    stride = 3 if key32 else 4
    table = np.empty((NB, S * stride), np.int32)
    ov = lib.build_hash2_table(_ptr(keys), _ptr(starts), len(keys), NB, S,
                               int(key32), int(mulhi), _ptr(table))
    return table, int(ov)


def radix_sort_pair(keys: np.ndarray, vals: np.ndarray, key_bits: int):
    """Stable in-place LSD radix sort of (u64 key, u64 payload) by the low
    key_bits of the key."""
    lib = _load()
    assert keys.dtype == np.uint64 and vals.dtype == np.uint64
    assert keys.flags.c_contiguous and vals.flags.c_contiguous
    lib.radix_sort_u64_pair(_ptr(keys), _ptr(vals), len(keys), key_bits)


def ksw_extd2(qlen, query, tlen, target, m, mat, q, e, q2, e2, w, zdrop,
              end_bonus, flag):
    """Native extd2; returns (ez_dict, cigar list)."""
    lib = _load()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    ez = lib.EzOut()
    cap = 2 * (qlen + tlen) + 16
    cig = np.empty(cap, np.uint32)
    lib.ksw_extd2_cpp(qlen, _ptr(query), tlen, _ptr(target), m, _ptr(mat),
                      q, e, q2, e2, w, zdrop, end_bonus, flag,
                      C.byref(ez), _ptr(cig), cap)
    assert ez.n_cigar <= cap, "cigar overflow (truncated native buffer)"
    d = {n: getattr(ez, n) for n, _t in ez._fields_}
    return d, cig[:ez.n_cigar].tolist()


def ksw_extz2(qlen, query, tlen, target, m, mat, q, e, w, zdrop,
              end_bonus, flag):
    """Native extz2; returns (ez_dict, cigar list)."""
    lib = _load()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    ez = lib.EzOut()
    cap = 2 * (qlen + tlen) + 16
    cig = np.empty(cap, np.uint32)
    lib.ksw_extz2_cpp(qlen, _ptr(query), tlen, _ptr(target), m, _ptr(mat),
                      q, e, w, zdrop, end_bonus, flag, C.byref(ez),
                      _ptr(cig), cap)
    assert ez.n_cigar <= cap, "cigar overflow (truncated native buffer)"
    d = {n: getattr(ez, n) for n, _t in ez._fields_}
    return d, cig[:ez.n_cigar].tolist()


def ksw_exts2(qlen, query, tlen, target, m, mat, q, e, q2, noncan, zdrop,
              end_bonus, junc_bonus, junc_pen, flag, junc):
    """Native exts2; returns (ez_dict, cigar list)."""
    lib = _load()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    jptr = None
    if junc is not None:
        junc = np.ascontiguousarray(junc, dtype=np.uint8)
        jptr = _ptr(junc)
    ez = lib.EzOut()
    cap = 2 * (qlen + tlen) + 16
    cig = np.empty(cap, np.uint32)
    lib.ksw_exts2_cpp(qlen, _ptr(query), tlen, _ptr(target), m, _ptr(mat),
                      q, e, q2, noncan, zdrop, end_bonus, junc_bonus,
                      junc_pen, flag, jptr, C.byref(ez), _ptr(cig), cap)
    assert ez.n_cigar <= cap, "cigar overflow (truncated native buffer)"
    d = {n: getattr(ez, n) for n, _t in ez._fields_}
    return d, cig[:ez.n_cigar].tolist()


def lchain_dp(max_dist_x, max_dist_y, bw, max_skip, max_iter, min_cnt,
              min_sc, chn_pen_gap, chn_pen_skip, is_cdna, n_seg, ax, ay):
    """Native mg_lchain_dp; returns (u, new_ax, new_ay)."""
    lib = _load()
    ax = np.ascontiguousarray(ax, dtype=np.uint64)
    ay = np.ascontiguousarray(ay, dtype=np.uint64)
    n = len(ax)
    out_u = np.empty(max(n, 1), np.uint64)
    out_ax = np.empty(max(n, 1), np.uint64)
    out_ay = np.empty(max(n, 1), np.uint64)
    n_anchor = np.zeros(1, np.int64)
    n_u = lib.mg_lchain_dp_cpp(
        max_dist_x, max_dist_y, bw, max_skip, max_iter, min_cnt, min_sc,
        float(chn_pen_gap), float(chn_pen_skip), int(is_cdna), int(n_seg),
        n, _ptr(ax), _ptr(ay), _ptr(out_u), _ptr(out_ax), _ptr(out_ay),
        _ptr(n_anchor))
    na = int(n_anchor[0])
    return out_u[:n_u].copy(), out_ax[:na].copy(), out_ay[:na].copy()


def ksw_ll(qlen, query, tlen, target, m, mat, gapo, gape):
    """Native Farrar local SW; returns (score, qe, te)."""
    lib = _load()
    query = np.ascontiguousarray(query, dtype=np.uint8)
    target = np.ascontiguousarray(target, dtype=np.uint8)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    qe = np.zeros(1, np.int32)
    te = np.zeros(1, np.int32)
    sc = lib.ksw_ll_cpp(qlen, _ptr(query), tlen, _ptr(target), m,
                        _ptr(mat), gapo, gape, _ptr(qe), _ptr(te))
    return int(sc), int(qe[0]), int(te[0])


def fastx_scan(buf: bytes, is_final: bool):
    """Parse a FASTA/FASTQ text buffer (native kseq.h analogue).

    Returns (n_records, seq_bytes ndarray, meta (n,6) int64,
    qmeta (n,2) int64, consumed).  meta columns: name_off, name_len,
    comment_off, comment_len, seq_off, seq_len; offsets for names into
    `buf`, for seq/qual into seq_bytes.  Raises ValueError on malformed
    input."""
    lib = _load()
    bufa = np.frombuffer(buf, np.uint8)
    rec_cap = max(64, len(buf) // 32)
    seq_cap = len(buf) + 64
    while True:
        out_seq = np.empty(seq_cap, np.uint8)
        meta = np.empty((rec_cap, 6), np.int64)
        qmeta = np.empty((rec_cap, 2), np.int64)
        consumed = np.zeros(1, np.int64)
        n = lib.mm_fastx_scan(_ptr(bufa), len(bufa), int(is_final),
                              _ptr(out_seq), seq_cap, _ptr(meta),
                              _ptr(qmeta), rec_cap, _ptr(consumed))
        if n == -1:
            rec_cap *= 2
            seq_cap *= 2
            continue
        if n == -2:
            raise ValueError("malformed FASTA/FASTQ input")
        return int(n), out_seq, meta[:n], qmeta[:n], int(consumed[0])


def cigar_kadane_trim(qseq, tseq, cigar, mat, m, q, e, q2, e2,
                      end_bonus=0):
    """Max-scoring sub-path trim of a forced global cigar.

    Returns (q0, t0, q1, t1, best_score, trimmed_cigar list)."""
    lib = _load()
    qseq = np.ascontiguousarray(qseq, dtype=np.uint8)
    tseq = np.ascontiguousarray(tseq, dtype=np.uint8)
    cig = np.ascontiguousarray(cigar, dtype=np.uint32)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    out = np.zeros(8, np.int64)
    cout = np.empty(len(cig) + 2, np.uint32)
    lib.mm_cigar_kadane_trim(_ptr(qseq), _ptr(tseq), _ptr(cig), len(cig),
                             _ptr(mat), m, q, e, q2, e2, end_bonus,
                             _ptr(cout), _ptr(out))
    n = int(out[5])
    return (int(out[0]), int(out[1]), int(out[2]), int(out[3]),
            int(out[4]), cout[:n].tolist())


def zdrop_scan(qseq, tseq, cigar, mat, m, q, e):
    """mm_test_zdrop scan part -> (max_zdrop, pos[[i0,i1],[j0,j1]])."""
    lib = _load()
    qseq = np.ascontiguousarray(qseq, dtype=np.uint8)
    tseq = np.ascontiguousarray(tseq, dtype=np.uint8)
    cig = np.ascontiguousarray(cigar, dtype=np.uint32)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    out = np.empty(5, np.int64)
    lib.mm_zdrop_scan(_ptr(qseq), _ptr(tseq), _ptr(cig), len(cig),
                      _ptr(mat), m, q, e, _ptr(out))
    return int(out[0]), [[int(out[1]), int(out[2])],
                         [int(out[3]), int(out[4])]]


def update_extra_scan(qseq, tseq, cigar, mat, m, q, e, log_gap):
    """mm_update_extra stats -> (blen, mlen, n_ambi, dp_max, is_spliced)."""
    lib = _load()
    qseq = np.ascontiguousarray(qseq, dtype=np.uint8)
    tseq = np.ascontiguousarray(tseq, dtype=np.uint8)
    cig = np.ascontiguousarray(cigar, dtype=np.uint32)
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    out = np.empty(5, np.int64)
    lib.mm_update_extra_scan(_ptr(qseq), _ptr(tseq), _ptr(cig), len(cig),
                             _ptr(mat), m, q, e, int(log_gap), _ptr(out))
    return (int(out[0]), int(out[1]), int(out[2]), int(out[3]),
            bool(out[4]))


def lchain_rmq(max_dist, max_dist_inner, bw, max_chn_skip, cap_rmq_size,
               min_cnt, min_sc, chn_pen_gap, chn_pen_skip, ax, ay):
    """Native mg_lchain_rmq; returns (u, new_ax, new_ay)."""
    lib = _load()
    ax = np.ascontiguousarray(ax, dtype=np.uint64)
    ay = np.ascontiguousarray(ay, dtype=np.uint64)
    n = len(ax)
    out_u = np.empty(max(n, 1), np.uint64)
    out_ax = np.empty(max(n, 1), np.uint64)
    out_ay = np.empty(max(n, 1), np.uint64)
    n_anchor = np.zeros(1, np.int64)
    n_u = lib.mg_lchain_rmq_cpp(
        max_dist, max_dist_inner, bw, max_chn_skip, cap_rmq_size, min_cnt,
        min_sc, float(chn_pen_gap), float(chn_pen_skip), n, _ptr(ax),
        _ptr(ay), _ptr(out_u), _ptr(out_ax), _ptr(out_ay), _ptr(n_anchor))
    na = int(n_anchor[0])
    return out_u[:n_u].copy(), out_ax[:na].copy(), out_ay[:na].copy()
