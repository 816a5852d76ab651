// Native host kernels for the irregular front-end stages: minimizer
// sketching, index lookup, seed selection and anchor sort.  These are the
// host-side counterparts of the reference's sketch.c / seed.c / map.c
// anchor path (sketch.c:77-143, seed.c:30-132, map.c:168-204), re-written
// from this framework's own (test-verified) Python implementations --
// bit-exact with them, and therefore with the reference.
//
// TPUs pay ~100x for random element gathers, so the gather-heavy stages
// live here; the device keeps the regular DP compute (chain scan,
// extension kernels).
//
// Build: g++ -O3 -march=native -shared -fPIC mmtpu.cpp -o _mmtpu.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// hash64 (sketch.c:28-38)
// ---------------------------------------------------------------------
static inline uint64_t hash64(uint64_t key, uint64_t mask)
{
    key = (~key + (key << 21)) & mask;
    key = key ^ key >> 24;
    key = ((key + (key << 3)) + (key << 8)) & mask;
    key = key ^ key >> 14;
    key = ((key + (key << 2)) + (key << 4)) & mask;
    key = key ^ key >> 28;
    key = (key + (key << 31)) & mask;
    return key;
}

// ---------------------------------------------------------------------
// (w,k)-minimizer sketch over nt4 codes; identical scan structure to the
// framework's sketch_ref (index/sketch.py), incl. HPC and tie emission.
// Returns number of minimizers written (<= cap).
// ---------------------------------------------------------------------
int64_t mm_sketch_nt4(const uint8_t *codes, int64_t len, int w, int k,
                      uint32_t rid, int is_hpc,
                      uint64_t *out_x, uint64_t *out_y, int64_t cap)
{
    const uint64_t MAXV = ~0ULL;
    uint64_t shift1 = 2 * (k - 1), mask = (1ULL << (2 * k)) - 1;
    uint64_t kmer[2] = {0, 0};
    std::vector<uint64_t> bx(w, MAXV), by(w, MAXV);
    int tq[256];
    int tq_front = 0, tq_count = 0;
    int kmer_span = 0;
    uint64_t mnx = MAXV, mny = MAXV;
    int64_t i = 0, n_out = 0, l = 0;
    int buf_pos = 0, min_pos = 0;

    auto emit = [&](uint64_t x, uint64_t y) {
        if (n_out < cap) { out_x[n_out] = x; out_y[n_out] = y; }
        ++n_out;
    };

    while (i < len) {
        int c = codes[i];
        uint64_t ix = MAXV, iy = MAXV;
        if (c < 4) {
            if (is_hpc) {
                int64_t skip_len = 1;
                if (i + 1 < len && codes[i + 1] == c) {
                    skip_len = 2;
                    while (i + skip_len < len && codes[i + skip_len] == c)
                        ++skip_len;
                    i += skip_len - 1;
                }
                tq[(tq_front + tq_count) & 255] = (int)skip_len;
                ++tq_count;
                kmer_span += (int)skip_len;
                if (tq_count > k) {
                    kmer_span -= tq[tq_front];
                    tq_front = (tq_front + 1) & 255;
                    --tq_count;
                }
            } else {
                kmer_span = l + 1 < k ? (int)(l + 1) : k;
            }
            kmer[0] = (kmer[0] << 2 | c) & mask;
            kmer[1] = (kmer[1] >> 2) | ((uint64_t)(3 ^ c) << shift1);
            if (kmer[0] == kmer[1]) { ++i; continue; }  // symmetric k-mer
            int z = kmer[0] < kmer[1] ? 0 : 1;
            ++l;
            if (l >= k && kmer_span < 256) {
                ix = hash64(kmer[z], mask) << 8 | (uint64_t)kmer_span;
                iy = ((uint64_t)rid << 32) | ((uint64_t)i << 1) | (uint64_t)z;
            }
        } else {
            l = 0;
            tq_front = tq_count = 0;
            kmer_span = 0;
        }
        bx[buf_pos] = ix; by[buf_pos] = iy;
        if (l == w + k - 1 && mnx != MAXV) {
            for (int j = buf_pos + 1; j < w; ++j)
                if (mnx == bx[j] && by[j] != mny) emit(bx[j], by[j]);
            for (int j = 0; j < buf_pos; ++j)
                if (mnx == bx[j] && by[j] != mny) emit(bx[j], by[j]);
        }
        if (ix <= mnx) {
            if (l >= w + k && mnx != MAXV) emit(mnx, mny);
            mnx = ix; mny = iy; min_pos = buf_pos;
        } else if (buf_pos == min_pos) {
            if (l >= w + k - 1 && mnx != MAXV) emit(mnx, mny);
            mnx = MAXV; mny = MAXV;
            for (int j = buf_pos + 1; j < w; ++j)
                if (mnx >= bx[j]) { mnx = bx[j]; mny = by[j]; min_pos = j; }
            for (int j = 0; j <= buf_pos; ++j)
                if (mnx >= bx[j]) { mnx = bx[j]; mny = by[j]; min_pos = j; }
            if (l >= w + k - 1 && mnx != MAXV) {
                for (int j = buf_pos + 1; j < w; ++j)
                    if (mnx == bx[j] && mny != by[j]) emit(bx[j], by[j]);
                for (int j = 0; j <= buf_pos; ++j)
                    if (mnx == bx[j] && mny != by[j]) emit(bx[j], by[j]);
            }
        }
        if (++buf_pos == w) buf_pos = 0;
        ++i;
    }
    if (mnx != MAXV) emit(mnx, mny);
    return n_out;
}

// ---------------------------------------------------------------------
// binary search over sorted u64 keys (index.c:93-110 analogue)
// ---------------------------------------------------------------------
static inline int64_t lower_bound_u64(const uint64_t *keys, int64_t n,
                                      uint64_t q)
{
    int64_t lo = 0, hi = n;
    while (lo < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (keys[mid] < q) lo = mid + 1; else hi = mid;
    }
    return lo;
}

struct SeedRec {
    uint32_t q_pos;
    int32_t q_span, seg_id;
    int64_t start, n;
    uint8_t is_tandem, flt;
};

// ---------------------------------------------------------------------
// mm_collect_matches + collect_seed_hits (seed.c:98-132, map.c:168-204),
// single-segment path (no ava skip_seed / qstrand; caller guards).
// Writes sorted (ax, ay) anchors; returns count (<= cap), rep_len via ptr.
// ---------------------------------------------------------------------
int64_t mm_collect_anchors(const uint64_t *mx, const uint64_t *my,
                           int64_t n_m, const uint64_t *keys,
                           const int64_t *starts, int64_t n_keys,
                           const uint64_t *pos, int64_t qlen,
                           int64_t max_occ, int64_t max_max_occ,
                           int64_t dist,
                           uint64_t *ax, uint64_t *ay, int64_t cap,
                           int64_t *rep_len_out,
                           uint64_t *mini_pos, int64_t *n_mini_out)
{
    std::vector<SeedRec> seeds;
    seeds.reserve(n_m);
    // seed_collect_all (seed.c:30-52)
    for (int64_t i = 0; i < n_m; ++i) {
        uint64_t h = mx[i] >> 8;
        int64_t ki = lower_bound_u64(keys, n_keys, h);
        if (ki >= n_keys || keys[ki] != h) continue;
        SeedRec s;
        s.q_pos = (uint32_t)my[i];
        s.q_span = (int32_t)(mx[i] & 0xFF);
        s.seg_id = (int32_t)(my[i] >> 32);
        s.start = starts[ki];
        s.n = starts[ki + 1] - starts[ki];
        s.is_tandem = 0;
        s.flt = 0;
        if (i > 0 && (mx[i - 1] >> 8) == h) s.is_tandem = 1;
        if (i + 1 < n_m && (mx[i + 1] >> 8) == h) s.is_tandem = 1;
        seeds.push_back(s);
    }
    int64_t n = (int64_t)seeds.size();
    // seed_select (seed.c:56-96) or plain max_occ filter
    if (dist > 0 && max_max_occ > max_occ) {
        const int MAX_MAX_HIGH_OCC = 128;
        if (n > 1) {
            int64_t last0 = -1;
            for (int64_t i = 0; i <= n; ++i) {
                if (i == n || seeds[i].n <= max_occ) {
                    if (i - last0 > 1) {
                        int64_t ps = last0 < 0 ? 0
                            : (int64_t)(seeds[last0].q_pos >> 1);
                        int64_t pe = i == n ? qlen
                            : (int64_t)(seeds[i].q_pos >> 1);
                        int64_t st = last0 + 1, en = i;
                        int64_t mho = (int64_t)((double)(pe - ps) / dist
                                                + 0.499);
                        if (mho > 0) {
                            if (mho > MAX_MAX_HIGH_OCC)
                                mho = MAX_MAX_HIGH_OCC;
                            std::vector<uint64_t> keyv;
                            keyv.reserve(en - st);
                            for (int64_t j = st; j < en; ++j)
                                keyv.push_back(((uint64_t)seeds[j].n << 32)
                                               | (uint64_t)j);
                            std::stable_sort(keyv.begin(), keyv.end());
                            int64_t kk = mho < (int64_t)keyv.size()
                                ? mho : (int64_t)keyv.size();
                            for (int64_t j = st; j < en; ++j)
                                seeds[j].flt = 1;
                            for (int64_t j = 0; j < kk; ++j)
                                seeds[keyv[j] & 0xFFFFFFFF].flt = 0;
                        } else {
                            for (int64_t j = st; j < en; ++j)
                                seeds[j].flt = 1;
                        }
                        for (int64_t j = st; j < en; ++j)
                            if (seeds[j].n > max_max_occ)
                                seeds[j].flt = 1;
                    }
                    last0 = i;
                }
            }
        }
    } else {
        for (auto &s : seeds)
            if (s.n > max_occ) s.flt = 1;
    }
    // rep_len: merged interval union of filtered seeds, in seed order
    int64_t rep_len = 0, rep_st = 0, rep_en = 0;
    for (auto &s : seeds) {
        if (!s.flt) continue;
        int64_t en2 = (int64_t)(s.q_pos >> 1) + 1;
        int64_t st2 = en2 - s.q_span;
        if (st2 > rep_en) {
            rep_len += rep_en - rep_st;
            rep_st = st2; rep_en = en2;
        } else {
            rep_en = en2;
        }
    }
    rep_len += rep_en - rep_st;
    *rep_len_out = rep_len;
    // mini_pos of kept seeds (span<<32 | pos), for mm_est_err
    int64_t n_mini = 0;
    for (auto &s : seeds)
        if (!s.flt && n_mini < cap)
            mini_pos[n_mini++] = ((uint64_t)s.q_span << 32)
                | (uint64_t)(s.q_pos >> 1);
    *n_mini_out = n_mini;
    // anchor expansion (map.c:168-204), forward/reverse coordinates
    int64_t n_a = 0;
    for (auto &s : seeds) {
        if (s.flt) continue;
        for (int64_t j = 0; j < s.n; ++j) {
            if (n_a >= cap) return n_a;  // capacity clip (caller re-tries)
            uint64_t r = pos[s.start + j];
            uint64_t rpos = (uint32_t)r >> 1;
            int same = (int)((r & 1) == (s.q_pos & 1));
            uint64_t hi = r & 0xFFFFFFFF00000000ULL;
            uint64_t qp = s.q_pos >> 1;
            uint64_t x, y;
            if (same) {
                x = hi | rpos;
                y = ((uint64_t)s.q_span << 32) | qp;
            } else {
                x = (1ULL << 63) | hi | rpos;
                y = ((uint64_t)s.q_span << 32)
                    | ((uint64_t)qlen - (qp + 1 - (uint64_t)s.q_span) - 1);
            }
            y |= (uint64_t)s.seg_id << 48;
            if (s.is_tandem) y |= 1ULL << 42;  // MM_SEED_TANDEM (mmpriv.h:21)
            ax[n_a] = x; ay[n_a] = y;
            ++n_a;
        }
    }
    // stable sort by x (radix_sort_128x semantics)
    std::vector<int64_t> ord(n_a);
    for (int64_t i = 0; i < n_a; ++i) ord[i] = i;
    std::stable_sort(ord.begin(), ord.end(),
                     [&](int64_t a, int64_t b) { return ax[a] < ax[b]; });
    std::vector<uint64_t> tx(n_a), ty(n_a);
    for (int64_t i = 0; i < n_a; ++i) { tx[i] = ax[ord[i]]; ty[i] = ay[ord[i]]; }
    std::memcpy(ax, tx.data(), n_a * 8);
    std::memcpy(ay, ty.data(), n_a * 8);
    return n_a;
}

// ---------------------------------------------------------------------
// batched sketch for index build: seqs concatenated, offsets per rid
// ---------------------------------------------------------------------
int64_t mm_sketch_many(const uint8_t *codes, const int64_t *offs,
                       const int64_t *lens, int64_t n_seq, int w, int k,
                       int is_hpc, uint64_t *out_x, uint64_t *out_y,
                       int64_t cap)
{
    int64_t total = 0;
    for (int64_t r = 0; r < n_seq; ++r) {
        if (lens[r] < k) continue;
        int64_t m = mm_sketch_nt4(codes + offs[r], lens[r], w, k,
                                  (uint32_t)r, is_hpc, out_x + total,
                                  out_y + total, cap - total);
        total += m;
        if (total > cap) return total;  // caller re-allocates
    }
    return total;
}

}  // extern "C"
