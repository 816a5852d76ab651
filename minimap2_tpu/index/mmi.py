"""Binary MMI index format, drop-in compatible with the reference
(mm_idx_dump/mm_idx_load, index.c:475-569; magic "MMI\\x02").

Layout:
  magic[4]  "MMI\\x02"
  u32 x[5]  w, k, b, n_seq, flag
  per seq:  u8 name_len, name bytes, u32 len
  per bucket (2^b):
     u32 n; u64 p[n];           # position-sorted y records of multi-occ keys
     u32 size;                  # hash entries
     size x (u64 key, u64 val)  # key=(hash>>b)<<1 | singleton;
                                # val = y (singleton) or start<<32|n into p
  packed 4-bit reference (unless MM_I_NO_SEQ), (sum_len+7)/8 u32 words

The in-memory form is the framework's flat-tensor MiniIndex; hash-bucket
structure is converted on load/dump.  Dump emits bucket hash entries in
key-sorted order (the reference's own dump order is khash iteration order,
which its loader ignores), so reference minimap2 loads our files directly.
"""
from __future__ import annotations

import struct

import numpy as np

MM_IDX_MAGIC = b"MMI\x02"
MM_I_NO_SEQ = 0x2


def load_mmi(path: str):
    """mm_idx_load (index.c:517-569) -> MiniIndex."""
    from .index import MiniIndex, SeqMeta
    with open(path, "rb") as fp:
        if fp.read(4) != MM_IDX_MAGIC:
            raise ValueError(f"{path}: not an MMI file")
        w, k, b, n_seq, flag = struct.unpack("<5I", fp.read(20))
        mi = MiniIndex(w, k, b, flag)
        sum_len = 0
        for _ in range(n_seq):
            (nl,) = struct.unpack("<B", fp.read(1))
            name = fp.read(nl).decode() if nl else ""
            (ln,) = struct.unpack("<I", fp.read(4))
            mi.seq.append(SeqMeta(name=name, offset=sum_len, length=ln))
            sum_len += ln
        h_parts, y_parts = [], []
        for i in range(1 << b):
            (n,) = struct.unpack("<i", fp.read(4))
            p = np.frombuffer(fp.read(8 * n), dtype="<u8")
            (size,) = struct.unpack("<I", fp.read(4))
            if size == 0:
                continue
            kv = np.frombuffer(fp.read(16 * size), dtype="<u8").reshape(-1, 2)
            key, val = kv[:, 0], kv[:, 1]
            minier = ((key >> np.uint64(1)) << np.uint64(b)) | np.uint64(i)
            single = (key & np.uint64(1)) != 0
            h_parts.append(minier[single])
            y_parts.append(val[single])
            for mk, mv in zip(minier[~single], val[~single]):
                st = int(mv >> np.uint64(32))
                cnt = int(mv & np.uint64(0xFFFFFFFF))
                h_parts.append(np.full(cnt, mk, np.uint64))
                y_parts.append(p[st:st + cnt])
        if h_parts:
            h = np.concatenate(h_parts)
            y = np.concatenate(y_parts)
            order = np.lexsort((y, h))
            h, y = h[order], y[order]
            uk, start_idx, counts = np.unique(h, return_index=True,
                                              return_counts=True)
            mi.keys = uk
            mi.starts = np.concatenate((start_idx, [len(y)])).astype(np.int64)
            mi.pos = y
        if not (flag & MM_I_NO_SEQ):
            n_words = (sum_len + 7) // 8
            S4 = np.frombuffer(fp.read(4 * n_words), dtype="<u4")
            mi.S = unpack_seq4(S4, sum_len)
    return mi


def dump_mmi(mi, path: str) -> None:
    """mm_idx_dump (index.c:475-514) from a MiniIndex."""
    b = mi.b
    mask = np.uint64((1 << b) - 1)
    with open(path, "wb") as fp:
        fp.write(MM_IDX_MAGIC)
        fp.write(struct.pack("<5I", mi.w, mi.k, b, mi.n_seq, mi.flag))
        sum_len = 0
        for s in mi.seq:
            nb = s.name.encode()[:255]
            fp.write(struct.pack("<B", len(nb)))
            fp.write(nb)
            fp.write(struct.pack("<I", s.length))
            sum_len += s.length
        cnts = (mi.starts[1:] - mi.starts[:-1]).astype(np.int64)
        bucket_of = (mi.keys & mask).astype(np.int64)
        order = np.argsort(bucket_of, kind="stable")
        bounds = np.searchsorted(bucket_of[order], np.arange((1 << b) + 1))
        for i in range(1 << b):
            sel = order[bounds[i]:bounds[i + 1]]
            multi = sel[cnts[sel] > 1]
            single = sel[cnts[sel] == 1]
            n_p = int(cnts[multi].sum())
            fp.write(struct.pack("<i", n_p))
            kv = []
            p_parts = []
            start_p = 0
            for kix in multi:
                st, cnt = int(mi.starts[kix]), int(cnts[kix])
                p_parts.append(mi.pos[st:st + cnt])
                key = (np.uint64(mi.keys[kix]) >> np.uint64(b)) << np.uint64(1)
                kv.append((int(key), (start_p << 32) | cnt))
                start_p += cnt
            for kix in single:
                key = ((np.uint64(mi.keys[kix]) >> np.uint64(b))
                       << np.uint64(1)) | np.uint64(1)
                kv.append((int(key), int(mi.pos[int(mi.starts[kix])])))
            if p_parts:
                fp.write(np.concatenate(p_parts).astype("<u8").tobytes())
            fp.write(struct.pack("<I", len(kv)))
            if kv:
                kv.sort()
                arr = np.array(kv, dtype="<u8")
                fp.write(arr.tobytes())
        if not (mi.flag & MM_I_NO_SEQ) and mi.S is not None:
            fp.write(pack_seq4(mi.S).tobytes())


def unpack_seq4(S4: np.ndarray, total_len: int) -> np.ndarray:
    """4-bit packed u32 words -> nt4 uint8 codes (mm_seq4_get)."""
    bytes_ = S4.view(np.uint8)
    lo = bytes_ & 0xF
    hi = bytes_ >> 4
    out = np.empty(len(bytes_) * 2, np.uint8)
    out[0::2] = lo
    out[1::2] = hi
    return np.minimum(out[:total_len], 4).astype(np.uint8)


def pack_seq4(codes: np.ndarray) -> np.ndarray:
    """nt4 uint8 codes -> 4-bit packed u32 words (mm_seq4_set)."""
    total = len(codes)
    n_words = (total + 7) // 8
    padded = np.zeros(n_words * 8, np.uint8)
    padded[:total] = np.minimum(codes, 4)
    by = (padded[0::2] | (padded[1::2] << 4)).astype(np.uint8)
    return by.view("<u4")
