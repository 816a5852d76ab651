"""Per-kernel device timing of the batched PAF step (telemetry
north-star: per-stage ms for upload / sketch / compact / lookup /
chain / topk on the cached 1 Gb workload).  Each stage is jitted
separately with all outputs reduced into the fetched scalar (XLA DCE
guard).  Run on a TPU host after `python bench.py` has populated
.bench_cache/."""
import os, sys, time
import numpy as np
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax, jax.numpy as jnp
cache_dir = os.path.expanduser("~/.cache/mm2tpu_jit")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from minimap2_tpu.index.index import MiniIndex
from minimap2_tpu.config import MapOptions, mapopt_update
from minimap2_tpu.parallel import engine
from minimap2_tpu.parallel.batch import (BatchParams, DeviceIndex,
                                         _compact_minimizers,
                                         _lookup_anchors, topk_chains)

B = 512
# device-generated workload (bench.py's exact artifacts: genome + index
# built in HBM, reads sliced in HBM)
from minimap2_tpu.parallel.devbuild import build_device_index
from minimap2_tpu.utils.simgenome_dev import (simulate_genome_device,
                                              simulate_reads_device)
GENOME_LEN = int(float(os.environ.get("MM2TPU_GENOME_LEN", "1e9")))
t0 = time.time()
names_g, parts = simulate_genome_device(GENOME_LEN, 8, 7)
di, meta = build_device_index(names_g, parts, w=10, k=15, verbose=True)
print(f"genome+index {time.time()-t0:.0f}s", flush=True)
mid_occ = meta.mid_occ
p = BatchParams(L=12288, M=2048, A=int(os.environ.get("MM2TPU_A", "4096")),
                occ_cap=min(max(mid_occ, 10),
                            int(os.environ.get("MM2TPU_OCC_CAP", "64"))),
                chain_window=64)
rnames, rcodes = simulate_reads_device(parts, B, seed=1, names=names_g)
del parts
ACGT = np.frombuffer(b"ACGT", np.uint8)
seqs = [ACGT[c].tobytes() for c in rcodes][:B]
codes, lens = engine.encode_batch(seqs, p.L)
packed, nbits = engine.pack_codes(codes)
packed_d, nbits_d = jnp.asarray(packed), jnp.asarray(nbits)
lens_d = jnp.asarray(lens)

@jax.jit
def st_upload_only(packed, nbits, lens):
    return (jnp.sum(packed.astype(jnp.int32), dtype=jnp.int32)
            + jnp.sum(nbits.astype(jnp.int32), dtype=jnp.int32)
            + jnp.sum(lens, dtype=jnp.int32)), 0

@jax.jit
def st_sketch(packed, nbits, lens):
    from minimap2_tpu.ops.sketch_pallas import sketch_batch
    codes = engine.unpack_codes(packed, nbits, p.L)
    hhi, hlo, zst, is_mini, _ = sketch_batch(codes, lens, G=8, T=512, k=p.k, w=p.w)
    return (jnp.sum(hhi, dtype=jnp.int32) + jnp.sum(hlo, dtype=jnp.int32)
            + jnp.sum(zst, dtype=jnp.int32)
            + jnp.sum(is_mini, dtype=jnp.int32)), (hhi, hlo, zst, is_mini)

@jax.jit
def st_compact(hhi, hlo, zst, is_mini):
    out = _compact_minimizers(hhi, hlo, zst, is_mini, p.M, use_pallas=True)
    s = sum(jnp.sum(o, dtype=jnp.int32) for o in out)
    return s, out

@jax.jit
def st_lookup(di, mh_hi, mh_lo, mz, mpos, mvalid, lens):
    out = _lookup_anchors(di, mh_hi, mh_lo, mz, mpos, mvalid, lens, p, False)
    s = sum(jnp.sum(o, dtype=jnp.int32) for o in out[:6])
    return s + jnp.sum(out[6], dtype=jnp.int32), out

@jax.jit
def st_chain(rev, rid, rpos, qpos, span, av):
    from minimap2_tpu.ops.chain_pallas import chain_batch
    f, pred, qs_a, rs_a = chain_batch(
        rev, rid, rpos, qpos, span, av, BL=128, WND=p.chain_window, AC=256,
        k=p.k, max_dist_x=p.max_dist_x, max_dist_y=p.max_dist_y, bw=p.bw,
        chn_pen_gap=p.chn_pen_gap, chn_pen_skip=p.chn_pen_skip)
    s = (jnp.sum(f, dtype=jnp.int32) + jnp.sum(pred, dtype=jnp.int32)
         + jnp.sum(qs_a, dtype=jnp.int32) + jnp.sum(rs_a, dtype=jnp.int32))
    return s, (f, pred, qs_a, rs_a)

@jax.jit
def st_topk(f, qs_a, rs_a, rev, rid, rpos, qpos, av):
    recs = topk_chains(f, qs_a, rs_a, rev, rid, rpos, qpos, av, 5, 40)
    return sum(jnp.sum(r, dtype=jnp.int32) for r in recs), recs

def timeit(label, fn, *args):
    s, out = fn(*args)
    int(np.asarray(s))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, _o = fn(*args)
        int(np.asarray(s))
        ts.append(time.perf_counter() - t0)
    print(f"{label:10s} {1e3*np.median(ts):8.1f} ms", flush=True)
    return out

def timeit_up(label):
    # time including the host->device transfer of a fresh batch each rep
    s, _ = st_upload_only(packed_d, nbits_d, lens_d)
    int(np.asarray(s))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        s, _o = st_upload_only(jnp.asarray(packed), jnp.asarray(nbits),
                               jnp.asarray(lens))
        int(np.asarray(s))
        ts.append(time.perf_counter() - t0)
    print(f"{label:10s} {1e3*np.median(ts):8.1f} ms", flush=True)

timeit_up("upload")
out = timeit("sketch", st_sketch, packed_d, nbits_d, lens_d)
hhi, hlo, zst, is_mini = out
out = timeit("compact", st_compact, hhi, hlo, zst, is_mini)
mh_hi, mh_lo, mz, mpos, mvalid = out
out = timeit("lookup", st_lookup, di, mh_hi, mh_lo, mz, mpos, mvalid, lens_d)
rev, rid, rpos, qpos, span, av, rep = out
out = timeit("chain", st_chain, rev, rid, rpos, qpos, span, av)
f, pred, qs_a, rs_a = out
_ = timeit("topk", st_topk, f, qs_a, rs_a, rev, rid, rpos, qpos, av)
print("anchors/read avg:", float(np.asarray(av).sum()) / B, flush=True)
