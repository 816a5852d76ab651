"""Microbenchmark of the seed-lookup stage's sub-steps (probe vs the
expansion pieces) on the bench workload.  The r04 stage table showed
lookup = 75% of the device step (~120 ms: ~60 probe + ~66 expansion);
this script splits the expansion further (seed-attr gather, pos gather,
3-key sort) so the optimization lands on the dominant piece.

Run on the TPU host; builds the 1 Gb device workload (cached jit makes
repeats fast)."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
cache_dir = os.path.expanduser("~/.cache/mm2tpu_jit")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from minimap2_tpu.parallel import engine
from minimap2_tpu.parallel.batch import (BatchParams, _compact_minimizers,
                                         _lookup_anchors, _shr64, _mulhi_u32)
from minimap2_tpu.parallel.devbuild import build_device_index
from minimap2_tpu.utils.simgenome_dev import (simulate_genome_device,
                                              simulate_reads_device)

B = 512
GENOME_LEN = int(float(os.environ.get("MM2TPU_GENOME_LEN", "1e9")))
t0 = time.time()
names_g, parts = simulate_genome_device(GENOME_LEN, 8, 7)
di, meta = build_device_index(names_g, parts, w=10, k=15, verbose=False)
print(f"genome+index {time.time()-t0:.0f}s", flush=True)
p = BatchParams(L=12288, M=2048, A=4096,
                occ_cap=min(max(meta.mid_occ, 10), 64), chain_window=64)
rnames, rcodes = simulate_reads_device(parts, B, seed=1, names=names_g)
del parts
ACGT = np.frombuffer(b"ACGT", np.uint8)
seqs = [ACGT[c].tobytes() for c in rcodes][:B]
codes, lens = engine.encode_batch(seqs, p.L)
packed, nbits = engine.pack_codes(codes)
lens_d = jnp.asarray(lens)


@jax.jit
def st_front(packed, nbits, lens):
    from minimap2_tpu.ops.sketch_pallas import sketch_batch
    codes = engine.unpack_codes(packed, nbits, p.L)
    hhi, hlo, zst, is_mini, _ = sketch_batch(codes, lens, G=8, T=512,
                                             k=p.k, w=p.w)
    return _compact_minimizers(hhi, hlo, zst, is_mini, p.M, use_pallas=True)


mh_hi, mh_lo, mz, mpos, mvalid = jax.block_until_ready(
    st_front(jnp.asarray(packed), jnp.asarray(nbits), lens_d))


def timeit(label, fn, *args):
    s, out = fn(*args)
    jax.block_until_ready(s)
    ts = []
    for _ in range(7):
        t1 = time.perf_counter()
        s, _o = fn(*args)
        jax.block_until_ready(s)
        ts.append(time.perf_counter() - t1)
    print(f"{label:24s} {1e3*np.median(ts):8.1f} ms", flush=True)
    return out


# --- probe only (h2r payload path, truncated after start/cnt)
@jax.jit
def st_probe_h2r(di, mh_hi, mh_lo, mvalid):
    b1 = _mulhi_u32(mh_lo * jnp.uint32(2654435769),
                    di.h2r_nb).astype(jnp.int32)
    k11 = (((mh_lo >> jnp.uint32(11)) | (mh_hi << jnp.uint32(21)))
           * jnp.uint32(2654435761))
    b2 = _mulhi_u32(k11, di.h2r_nb).astype(jnp.int32)
    cat = jnp.concatenate([di.h2r[b1], di.h2r[b2]], axis=-1)
    kpl = cat[..., 0::4]
    spl = cat[..., 2::4].astype(jnp.int32)
    cpl = cat[..., 3::4].astype(jnp.int32)
    hit = kpl == mh_lo[..., None]
    found = jnp.any(hit, axis=-1) & mvalid
    start = jnp.where(found, jnp.max(jnp.where(hit, spl, 0), axis=-1), 0)
    cnt_raw = jnp.max(jnp.where(hit, cpl, 0), axis=-1)
    cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
    flt = found & (cnt_raw > p.occ_cap)
    return start + cnt + flt, (start, cnt, flt)


# --- probe only (legacy krows windowed path, truncated after start/cnt)
@jax.jit
def st_probe(di, mh_hi, mh_lo, mvalid):
    RK = di.krows.shape[0]
    KP = di.sc2.shape[0]
    nb1 = di.bucket_start.shape[0]
    bhi, blo = _shr64(mh_hi, mh_lo, di.key_shift) \
        if di.key_shift else (mh_hi, mh_lo)
    bkt = jnp.clip(blo, 0, nb1 - 2).astype(jnp.int32)
    lo = di.bucket_start[bkt]
    row = jnp.clip(lo >> 6, 0, RK - 2)
    cat = jnp.concatenate([di.krows[row], di.krows[row + 1]], axis=-1)
    eq = ((cat[..., 0::2] == mh_hi[..., None])
          & (cat[..., 1::2] == mh_lo[..., None]))
    found = jnp.any(eq, axis=-1) & mvalid
    lane = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    pos = row * 64 + lane
    sv = di.sc2[jnp.minimum(pos, KP - 1)]
    start = jnp.where(found, sv[..., 0], 0)
    cnt_raw = sv[..., 1]
    cnt = jnp.where(found & (cnt_raw <= p.occ_cap), cnt_raw, 0)
    flt = found & (cnt_raw > p.occ_cap)
    return start + cnt + flt, (start, cnt, flt)


if di.h2r is not None:
    out = timeit("probe(h2r,2-gather)", st_probe_h2r, di, mh_hi, mh_lo,
                 mvalid)
else:
    out = timeit("probe(krows,4-gather)", st_probe, di, mh_hi, mh_lo,
                 mvalid)
start, cnt, flt = out


# --- expansion pieces
@jax.jit
def st_exp_scaffold(start, cnt):
    """offsets + seed_of scatter/scan, NO big gathers."""
    Bm, M = start.shape
    offs = jnp.cumsum(cnt, axis=1) - cnt
    ends = offs + cnt
    slot = jnp.arange(p.A, dtype=jnp.int32)[None, :]
    mark = jnp.full((Bm, p.A), -1, jnp.int32)
    jrow = jnp.arange(M, dtype=jnp.int32)[None, :].repeat(Bm, 0)
    scat = jnp.where(cnt > 0, jnp.minimum(offs, p.A - 1), p.A - 1)
    mark = mark.at[jnp.arange(Bm)[:, None], scat].max(
        jnp.where(cnt > 0, jrow, -1))
    seed_of = lax.associative_scan(jnp.maximum, mark, axis=1)
    seed_of = jnp.clip(seed_of, 0, M - 1)
    a_valid = slot < ends[:, -1:]
    return seed_of.sum() + a_valid.sum(), (seed_of, a_valid, offs)


out = timeit("exp:scaffold", st_exp_scaffold, start, cnt)
seed_of, a_valid, offs = out


@jax.jit
def st_exp_seedpk5(start, offs, mz, mpos, seed_of):
    mspan = jnp.full(start.shape, p.k, jnp.int32)
    seedpk = jnp.stack([offs, start, mz, mpos, mspan], axis=-1)
    g = jnp.take_along_axis(seedpk, seed_of[..., None], axis=1)
    return g.sum(), g


g5 = timeit("exp:seedpk(5-plane)", st_exp_seedpk5, start, offs, mz, mpos,
            seed_of)


@jax.jit
def st_exp_seedpk2(start, offs, mz, mpos, seed_of):
    sb = start - offs
    attrs = ((mz.astype(jnp.uint32) << jnp.uint32(23))
             | (mpos.astype(jnp.uint32) << jnp.uint32(8))
             | jnp.uint32(p.k))
    seedpk = jnp.stack([sb.astype(jnp.uint32), attrs], axis=-1)
    g = jnp.take_along_axis(seedpk, seed_of[..., None], axis=1)
    return g.sum(), g


timeit("exp:seedpk(2-plane)", st_exp_seedpk2, start, offs, mz, mpos, seed_of)


@jax.jit
def st_exp_posgather(pos2, g):
    slot = jnp.arange(p.A, dtype=jnp.int32)[None, :]
    within = slot - g[..., 0]
    pidx = g[..., 1] + within
    pidx = jnp.clip(pidx, 0, pos2.shape[0] - 1)
    pv1 = pos2[pidx]
    return pv1.sum(), pv1


timeit("exp:pos2-gather", st_exp_posgather, di.pos2, g5)


@jax.jit
def st_exp_sort(g):
    from minimap2_tpu.ops.sort_pallas import sort3_rows
    Bm = g.shape[0]
    key1 = g[..., 0].astype(jnp.uint32)
    key2 = g[..., 1].astype(jnp.uint32)
    key3 = g[..., 3].astype(jnp.uint32)
    key1, key2, key3 = sort3_rows(key1, key2, key3, G=8)
    return key1.sum() + key2.sum() + key3.sum(), None


timeit("exp:sort3(A=4096)", st_exp_sort,
       jnp.broadcast_to(g5[:, :, :], (B, p.A, 5)).astype(jnp.int32)
       if g5.shape[1] != p.A else g5)


# --- full current lookup for reference
@jax.jit
def st_lookup(di, mh_hi, mh_lo, mz, mpos, mvalid, lens):
    out = _lookup_anchors(di, mh_hi, mh_lo, mz, mpos, mvalid, lens, p, False)
    s = sum(jnp.sum(o, dtype=jnp.int32) for o in out[:5])
    return s + jnp.sum(out[6], dtype=jnp.int32), out


timeit("lookup(full,current)", st_lookup, di, mh_hi, mh_lo, mz, mpos,
       mvalid, lens_d)
print("anchors/read avg:",
      float(np.asarray(cnt).sum()) / B, flush=True)
