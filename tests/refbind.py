"""ctypes bindings to the reference shared library (built outside the repo)
used ONLY as a test oracle. Tests that need it skip if the library is absent.

Build: cp -r /root/reference /tmp/mm2build && cd /tmp/mm2build &&
       make CFLAGS="-g -O2 -fPIC" && cc -shared -o libminimap2.so *.o -lm -lz -lpthread
"""
import ctypes as C
import os

import numpy as np

LIB_PATH = os.environ.get("MM2_REF_LIB", "/tmp/mm2build/libminimap2.so")


class mm128_t(C.Structure):
    _fields_ = [("x", C.c_uint64), ("y", C.c_uint64)]


class mm128_v(C.Structure):
    _fields_ = [("n", C.c_size_t), ("m", C.c_size_t), ("a", C.POINTER(mm128_t))]


def load():
    if not os.path.exists(LIB_PATH):
        return None
    lib = C.CDLL(LIB_PATH)
    lib.mm_sketch.argtypes = [C.c_void_p, C.c_char_p, C.c_int, C.c_int, C.c_int,
                              C.c_uint32, C.c_int, C.POINTER(mm128_v)]
    return lib


_LIB = load()


def available() -> bool:
    return _LIB is not None


def ref_sketch(seq: bytes, w: int, k: int, rid: int = 0, is_hpc: bool = False):
    """Call the reference mm_sketch; returns (x, y) uint64 arrays."""
    assert _LIB is not None
    mv = mm128_v(0, 0, None)
    _LIB.mm_sketch(None, seq, len(seq), w, k, rid, 1 if is_hpc else 0, C.byref(mv))
    n = mv.n
    x = np.fromiter((mv.a[i].x for i in range(n)), dtype=np.uint64, count=n)
    y = np.fromiter((mv.a[i].y for i in range(n)), dtype=np.uint64, count=n)
    return x, y


class ksw_extz_t(C.Structure):
    _fields_ = [("max_zdropped", C.c_uint32),
                ("max_q", C.c_int), ("max_t", C.c_int),
                ("mqe", C.c_int), ("mqe_t", C.c_int),
                ("mte", C.c_int), ("mte_q", C.c_int),
                ("score", C.c_int),
                ("m_cigar", C.c_int), ("n_cigar", C.c_int),
                ("reach_end", C.c_int),
                ("cigar", C.POINTER(C.c_uint32))]


def _setup_ksw():
    if _LIB is None:
        return
    u8p = C.POINTER(C.c_uint8)
    i8p = C.POINTER(C.c_int8)
    _LIB.ksw_extz2_sse.argtypes = [C.c_void_p, C.c_int, u8p, C.c_int, u8p,
                                   C.c_int8, i8p, C.c_int8, C.c_int8, C.c_int,
                                   C.c_int, C.c_int, C.c_int, C.POINTER(ksw_extz_t)]
    _LIB.ksw_extd2_sse.argtypes = [C.c_void_p, C.c_int, u8p, C.c_int, u8p,
                                   C.c_int8, i8p, C.c_int8, C.c_int8, C.c_int8,
                                   C.c_int8, C.c_int, C.c_int, C.c_int, C.c_int,
                                   C.POINTER(ksw_extz_t)]
    _LIB.ksw_exts2_sse.argtypes = [C.c_void_p, C.c_int, u8p, C.c_int, u8p,
                                   C.c_int8, i8p, C.c_int8, C.c_int8, C.c_int8,
                                   C.c_int8, C.c_int, C.c_int, C.c_int8, C.c_int8,
                                   C.c_int, u8p, C.POINTER(ksw_extz_t)]
    _LIB.ksw_ll_qinit.restype = C.c_void_p
    _LIB.ksw_ll_qinit.argtypes = [C.c_void_p, C.c_int, C.c_int, u8p, C.c_int, i8p]
    _LIB.ksw_ll_i16.argtypes = [C.c_void_p, C.c_int, u8p, C.c_int, C.c_int,
                                C.POINTER(C.c_int), C.POINTER(C.c_int)]


_setup_ksw()


def _ez_to_dict(ez):
    cig = [ez.cigar[i] for i in range(ez.n_cigar)]
    return dict(max=ez.max_zdropped & 0x7FFFFFFF, zdropped=bool(ez.max_zdropped >> 31),
                max_q=ez.max_q, max_t=ez.max_t, mqe=ez.mqe, mqe_t=ez.mqe_t,
                mte=ez.mte, mte_q=ez.mte_q, score=ez.score,
                reach_end=bool(ez.reach_end), cigar=cig)


def _u8(a):
    a = np.ascontiguousarray(a, dtype=np.uint8)
    return a, a.ctypes.data_as(C.POINTER(C.c_uint8))


def ref_extz2(q, t, mat, gapo, gape, w, zdrop, end_bonus, flag):
    ez = ksw_extz_t()
    qa, qp = _u8(q); ta, tp = _u8(t)
    mata = np.ascontiguousarray(mat, dtype=np.int8)
    _LIB.ksw_extz2_sse(None, len(q), qp, len(t), tp, 5,
                       mata.ctypes.data_as(C.POINTER(C.c_int8)),
                       gapo, gape, w, zdrop, end_bonus, flag, C.byref(ez))
    return _ez_to_dict(ez)


def ref_extd2(q, t, mat, gapo, gape, gapo2, gape2, w, zdrop, end_bonus, flag):
    ez = ksw_extz_t()
    qa, qp = _u8(q); ta, tp = _u8(t)
    mata = np.ascontiguousarray(mat, dtype=np.int8)
    _LIB.ksw_extd2_sse(None, len(q), qp, len(t), tp, 5,
                       mata.ctypes.data_as(C.POINTER(C.c_int8)),
                       gapo, gape, gapo2, gape2, w, zdrop, end_bonus, flag, C.byref(ez))
    return _ez_to_dict(ez)


def ref_ksw_ll(q, t, mat, gapo, gape):
    qa, qp = _u8(q); ta, tp = _u8(t)
    mata = np.ascontiguousarray(mat, dtype=np.int8)
    qstruct = _LIB.ksw_ll_qinit(None, 2, len(q), qp, 5,
                                mata.ctypes.data_as(C.POINTER(C.c_int8)))
    qe, te = C.c_int(), C.c_int()
    score = _LIB.ksw_ll_i16(qstruct, len(t), tp, gapo, gape, C.byref(qe), C.byref(te))
    import ctypes.util
    C.CDLL(None).free(C.c_void_p(qstruct))
    return score, qe.value, te.value
