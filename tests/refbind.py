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
