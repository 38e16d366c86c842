// cwpack — native core for WELL-CW (chunk-window WELL) packing.
//
// Implements the rank-placement loops of
// spmv_tpu/models/wellcw.py::_pack_level and ::_pack_pool with
// identical semantics (kept in lockstep by tests/test_cw_native.py):
//
//  - per-group (level) or per-pool (pool mode) column ranges in
//    xt-row units, band-adaptive rank-alternating anchors (level:
//    a_low for even ranks, a_high for odd) or the position ladder
//    (pool: a_low + 8*(k % npos) clamped to a_high);
//  - an entry is placed at the first rank whose window contains it
//    and whose (slot, lane) cell is free; ties resolve to the
//    earliest entry in input order (the Python packer's stable
//    argsort + first-of-run mask does exactly this);
//  - pool mode stops after a full cycle of the widest ladder finds
//    no candidates anywhere (empty_streak >= max npos);
//  - level mode optionally prunes rank>0 chunks filled below
//    min_pop (their entries respill), exactly once;
//  - chunks are emitted in (group, rank) / (pool, rank) key order
//    with cell scatter, anchor, group/pool id, rank, and (pool mode)
//    the per-cell rowmap; spilled entry indices return in ascending
//    input order.
//
// The Python packer is vectorized numpy but still walks multi-pass
// argsorts and 134 MB random scatters; this single-pass C++ core is
// ~4-6x faster and byte-identical.  Exposed as a C ABI for ctypes;
// build: csrc/Makefile -> libcwpack.so.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t GROUP_ROWS = 128;
constexpr int64_t SLOTS = 8;
constexpr int64_t LANE = 128;
constexpr int64_t CELLS = SLOTS * LANE;

}  // namespace

extern "C" {

struct CwPacked {
    int64_t num_chunks;
    double* value;         // (chunks, 8, 128)
    int32_t* local_index;  // (chunks, 8, 128)
    int32_t* anchor4;      // (chunks,)
    int32_t* grp;          // (chunks,) group / pool of chunk
    int64_t* rank;         // (chunks,)
    int32_t* rowmap;       // (chunks, 8, 128); null in level mode
    int64_t num_spill;
    int64_t* spill_idx;    // ascending indices into the input
};

// pool_groups == 0 -> level mode (min_pop applies); else pool mode.
CwPacked* cw_pack(int64_t num_rows, int64_t num_columns,
                  const int64_t* rows, const int64_t* cols,
                  const double* vals, int64_t n,
                  int64_t d, int64_t cap, double min_pop,
                  int64_t pool_groups) {
    (void)num_columns;
    const bool pool_mode = pool_groups > 0;
    const int64_t wd = SLOTS * d;
    const int64_t ng = std::max<int64_t>(
        (num_rows + GROUP_ROWS - 1) / GROUP_ROWS, 1);
    const int64_t nkey = pool_mode
        ? std::max<int64_t>(
              (ng + pool_groups - 1) / pool_groups, 1)
        : ng;  // groups (level) or pools (pool mode)

    // --- per-key x2d-row range -> anchor bounds ----------------------
    std::vector<int64_t> glo(nkey, INT64_MAX), ghi(nkey, -1);
    std::vector<int64_t> key_of(n), x2d(n);
    std::vector<int32_t> lane(n);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t g = rows[i] >> 7;
        const int64_t k = pool_mode ? g / pool_groups : g;
        key_of[i] = k;
        x2d[i] = cols[i] >> 7;
        lane[i] = (int32_t)(rows[i] & (GROUP_ROWS - 1));
        glo[k] = std::min(glo[k], x2d[i]);
        ghi[k] = std::max(ghi[k], x2d[i]);
    }
    std::vector<int64_t> a_low(nkey), a_high(nkey), npos(nkey, 1);
    int64_t npos_max = 1;
    for (int64_t k = 0; k < nkey; ++k) {
        if (ghi[k] < 0) {
            a_low[k] = a_high[k] = 0;
        } else {
            a_low[k] = std::max<int64_t>(glo[k] / d, 0);
            a_high[k] = std::max<int64_t>(
                (ghi[k] + 1 + d - 1) / d - SLOTS, 0);
            if (pool_mode) a_high[k] = std::max(a_high[k], a_low[k]);
        }
        if (pool_mode) {
            npos[k] = (a_high[k] - a_low[k] + 7) / SLOTS + 1;
            npos_max = std::max(npos_max, npos[k]);
        }
    }

    // --- rank placement ---------------------------------------------
    // claim[cell] stores (rank+1) of the claim; one int16 per
    // (key, slot, lane) cell doubles as the per-rank "free" test.
    std::vector<int32_t> claim(nkey * CELLS, 0);
    std::vector<int64_t> placed_rank(n, -1);
    std::vector<int64_t> anchors((size_t)cap * nkey);
    std::vector<int64_t> remaining(n);
    for (int64_t i = 0; i < n; ++i) remaining[i] = i;
    std::vector<int64_t> next;
    next.reserve(n);

    int64_t empty_streak = 0;
    for (int64_t k = 0; k < cap; ++k) {
        for (int64_t q = 0; q < nkey; ++q) {
            int64_t a4;
            if (pool_mode) {
                a4 = std::min(a_low[q] + SLOTS * (k % npos[q]),
                              a_high[q]);
            } else {
                a4 = (k % 2 == 0) ? a_low[q] : a_high[q];
            }
            anchors[(size_t)k * nkey + q] = a4;
        }
        if (remaining.empty()) break;
        next.clear();
        int64_t candidates = 0;
        for (int64_t idx : remaining) {
            const int64_t q = key_of[idx];
            const int64_t w =
                x2d[idx] - anchors[(size_t)k * nkey + q] * d;
            if (w < 0 || w >= wd) {
                next.push_back(idx);
                continue;
            }
            ++candidates;
            const int64_t cell =
                (q * SLOTS + w / d) * LANE + lane[idx];
            if (claim[cell] == (int32_t)(k + 1)) {
                next.push_back(idx);    // cell taken this rank
            } else {
                claim[cell] = (int32_t)(k + 1);
                placed_rank[idx] = k;
            }
        }
        remaining.swap(next);
        if (pool_mode) {
            if (candidates == 0) {
                if (++empty_streak >= npos_max) break;
            } else {
                empty_streak = 0;
            }
        }
    }

    // --- chunk enumeration (key*cap + rank, ascending) ---------------
    // count entries per (key, rank) pair
    std::vector<int64_t> pop((size_t)nkey * cap, 0);
    for (int64_t i = 0; i < n; ++i) {
        if (placed_rank[i] >= 0) {
            ++pop[(size_t)key_of[i] * cap + placed_rank[i]];
        }
    }
    if (!pool_mode && min_pop > 0.0) {
        // prune under-populated rank>0 chunks, once (their entries
        // respill); rank-0 chunks always survive
        // float compare, exactly like numpy's pop < min_pop * 1024.0
        const double floor_pop =
            min_pop * (double)(SLOTS * GROUP_ROWS);
        auto pruned = [&](int64_t c) {
            return c > 0 && (double)c < floor_pop;
        };
        for (int64_t i = 0; i < n; ++i) {
            const int64_t r = placed_rank[i];
            if (r > 0 && pruned(pop[(size_t)key_of[i] * cap + r])) {
                placed_rank[i] = -1;
            }
        }
        for (int64_t q = 0; q < nkey; ++q)
            for (int64_t r = 1; r < cap; ++r) {
                int64_t& c = pop[(size_t)q * cap + r];
                if (pruned(c)) c = 0;
            }
    }
    std::vector<int64_t> chunk_of_key((size_t)nkey * cap, -1);
    int64_t num_chunks = 0;
    for (size_t kk = 0; kk < pop.size(); ++kk) {
        if (pop[kk] > 0) chunk_of_key[kk] = num_chunks++;
    }

    auto* out = (CwPacked*)std::calloc(1, sizeof(CwPacked));
    out->num_chunks = num_chunks;
    out->value = (double*)std::calloc(
        (size_t)std::max<int64_t>(num_chunks, 1) * CELLS,
        sizeof(double));
    out->local_index = (int32_t*)std::calloc(
        (size_t)std::max<int64_t>(num_chunks, 1) * CELLS,
        sizeof(int32_t));
    out->anchor4 = (int32_t*)std::calloc(
        (size_t)std::max<int64_t>(num_chunks, 1), sizeof(int32_t));
    out->grp = (int32_t*)std::calloc(
        (size_t)std::max<int64_t>(num_chunks, 1), sizeof(int32_t));
    out->rank = (int64_t*)std::calloc(
        (size_t)std::max<int64_t>(num_chunks, 1), sizeof(int64_t));
    out->rowmap = nullptr;
    if (pool_mode) {
        out->rowmap = (int32_t*)std::malloc(
            (size_t)std::max<int64_t>(num_chunks, 1) * CELLS
            * sizeof(int32_t));
    }
    for (size_t kk = 0; kk < chunk_of_key.size(); ++kk) {
        const int64_t c = chunk_of_key[kk];
        if (c < 0) continue;
        const int64_t q = (int64_t)(kk / cap);
        const int64_t r = (int64_t)(kk % cap);
        out->anchor4[c] =
            (int32_t)anchors[(size_t)r * nkey + q];
        out->grp[c] = (int32_t)q;
        out->rank[c] = r;
        if (pool_mode) {
            // padding cells point at the pool's base group
            const int32_t base = (int32_t)(q * pool_groups);
            int32_t* rm = out->rowmap + (size_t)c * CELLS;
            for (int64_t j = 0; j < CELLS; ++j) rm[j] = base;
        }
    }

    int64_t num_spill = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t r = placed_rank[i];
        if (r < 0) { ++num_spill; continue; }
        const int64_t q = key_of[i];
        const int64_t c = chunk_of_key[(size_t)q * cap + r];
        const int64_t w =
            x2d[i] - anchors[(size_t)r * nkey + q] * d;
        const int64_t cell = (w / d) * LANE + lane[i];
        out->value[(size_t)c * CELLS + cell] = vals[i];
        out->local_index[(size_t)c * CELLS + cell] =
            (int32_t)((w << 7) | (cols[i] & (LANE - 1)));
        if (pool_mode) {
            out->rowmap[(size_t)c * CELLS + cell] =
                (int32_t)(rows[i] >> 7);
        }
    }
    out->num_spill = num_spill;
    out->spill_idx = (int64_t*)std::malloc(
        (size_t)std::max<int64_t>(num_spill, 1) * sizeof(int64_t));
    int64_t s = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (placed_rank[i] < 0) out->spill_idx[s++] = i;
    }
    return out;
}

// Stable LSD radix sort of entry indices by (row, col) — the native
// counterpart of numpy's lexsort((cols, rows)) in
// models/_convert.py::sorted_entries_0based, which is the second
// cost center of large-matrix conversion (~4 s at 8.4M entries).
// Writes the permutation into perm (caller-allocated, n elements).
void rc_sort_perm(const int64_t* rows, const int64_t* cols,
                  int64_t n, int64_t* perm) {
    int64_t max_row = 0, max_col = 0;
    for (int64_t i = 0; i < n; ++i) {
        max_row = std::max(max_row, rows[i]);
        max_col = std::max(max_col, cols[i]);
    }
    std::vector<int64_t> key(n);
    int col_bits = 1;
    while ((int64_t(1) << col_bits) <= max_col) ++col_bits;
    for (int64_t i = 0; i < n; ++i) {
        key[i] = (rows[i] << col_bits) | cols[i];
    }
    int key_bits = col_bits + 1;
    while ((max_row >> (key_bits - col_bits)) > 0) ++key_bits;

    constexpr int RADIX_BITS = 16;
    constexpr int64_t BUCKETS = int64_t(1) << RADIX_BITS;
    std::vector<int64_t> tmp_perm(n), tmp_key(n);
    std::vector<int64_t> count(BUCKETS);
    for (int64_t i = 0; i < n; ++i) perm[i] = i;
    int64_t* pa = perm;
    int64_t* pb = tmp_perm.data();
    int64_t* ka = key.data();
    int64_t* kb = tmp_key.data();
    for (int shift = 0; shift < key_bits; shift += RADIX_BITS) {
        std::fill(count.begin(), count.end(), 0);
        for (int64_t i = 0; i < n; ++i) {
            ++count[(ka[i] >> shift) & (BUCKETS - 1)];
        }
        int64_t run = 0;
        for (int64_t b = 0; b < BUCKETS; ++b) {
            const int64_t c = count[b];
            count[b] = run;
            run += c;
        }
        for (int64_t i = 0; i < n; ++i) {
            const int64_t pos = count[(ka[i] >> shift)
                                      & (BUCKETS - 1)]++;
            pb[pos] = pa[i];
            kb[pos] = ka[i];
        }
        std::swap(pa, pb);
        std::swap(ka, kb);
    }
    if (pa != perm) {
        std::memcpy(perm, pa, (size_t)n * sizeof(int64_t));
    }
}

void cw_pack_free(CwPacked* p) {
    if (!p) return;
    std::free(p->value);
    std::free(p->local_index);
    std::free(p->anchor4);
    std::free(p->grp);
    std::free(p->rank);
    std::free(p->rowmap);
    std::free(p->spill_idx);
    std::free(p);
}

}  // extern "C"
