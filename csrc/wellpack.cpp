// wellpack — native core for WELL (windowed sliced-ELL) conversion.
//
// Implements the packing loop of spmv_tpu/models/well.py::_build with
// identical semantics (kept in lockstep by tests/test_well_native.py):
//
//  - rows in groups of 128; entries packed slot-major into chunks of
//    (8 slots x 128 rows);
//  - per (chunk, slot): a lane-aligned column window start chosen to
//    cover the maximum number of that slot's columns (first maximal
//    candidate wins, matching np.argmax);
//  - out-of-window entries go to the next packing round; rounds after
//    the first run only while leftovers are dense enough (>= 256 per
//    distinct leftover group); the final leftovers are returned as the
//    spill (sorted by row, then column);
//  - one inert zero chunk per 8-group output block with no chunks;
//    chunks ordered by group (stable within a group).
//
// Exposed as a C ABI for ctypes. Build: csrc/Makefile -> libwellpack.so.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int64_t GROUP_ROWS = 128;
constexpr int64_t SLOTS = 8;
constexpr int64_t LANE = 128;

struct Entry {
    int64_t row;
    int64_t col;
    double val;
};

int64_t best_window(const std::vector<int64_t>& sorted_cols,
                    int64_t wcols) {
    // First lane-aligned start (derived from an entry) covering the
    // most columns; mirrors WellMatrix._best_window (np.argmax picks
    // the first maximum).
    const int64_t n = (int64_t)sorted_cols.size();
    if (n == 0) return 0;
    int64_t best_start = (sorted_cols[0] / LANE) * LANE;
    int64_t best_count = -1;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t start = (sorted_cols[i] / LANE) * LANE;
        const auto end = std::lower_bound(
            sorted_cols.begin(), sorted_cols.end(), start + wcols);
        const int64_t count = (int64_t)(end - sorted_cols.begin()) - i;
        if (count > best_count) {
            best_count = count;
            best_start = start;
        }
    }
    return best_start / LANE;
}

}  // namespace

extern "C" {

struct WellPacked {
    int64_t num_chunks;
    double* value;         // num_chunks * 8 * 128
    int32_t* local_index;  // num_chunks * 8 * 128
    int32_t* window_start; // num_chunks * 8
    int32_t* group_of_chunk;  // num_chunks
    int64_t num_spill;
    int64_t* spill_rows;
    int64_t* spill_cols;
    double* spill_vals;
};

void well_pack_free(WellPacked* p) {
    if (!p) return;
    std::free(p->value);
    std::free(p->local_index);
    std::free(p->window_start);
    std::free(p->group_of_chunk);
    std::free(p->spill_rows);
    std::free(p->spill_cols);
    std::free(p->spill_vals);
    std::free(p);
}

WellPacked* well_pack(
    int64_t num_rows, int64_t /*num_cols*/,
    const int64_t* row_ptr, const int64_t* cols, const double* vals,
    int64_t window_rows, int64_t max_rounds) {
    const int64_t wcols = window_rows * LANE;
    const int64_t num_groups =
        std::max<int64_t>((num_rows + GROUP_ROWS - 1) / GROUP_ROWS, 1);

    std::vector<double> c_val;
    std::vector<int32_t> c_loc;
    std::vector<int32_t> c_ws;
    std::vector<int32_t> c_grp;

    // current round's entries, row-major sorted
    std::vector<Entry> cur;
    cur.reserve((size_t)row_ptr[num_rows]);
    for (int64_t r = 0; r < num_rows; ++r)
        for (int64_t k = row_ptr[r]; k < row_ptr[r + 1]; ++k)
            cur.push_back({r, cols[k], vals[k]});

    std::vector<int64_t> rp((size_t)num_rows + 1);
    std::vector<int64_t> slot_cols;
    std::vector<Entry> next;

    for (int64_t round = 0; round < max_rounds && !cur.empty();
         ++round) {
        if (round > 0) {
            // density guard: >= 256 leftovers per distinct group
            int64_t distinct = 0;
            int64_t last = -1;
            for (const auto& e : cur) {
                const int64_t g = e.row / GROUP_ROWS;
                if (g != last) { ++distinct; last = g; }
            }
            if ((int64_t)cur.size() < 256 * distinct) break;
        }
        // rebuild row_ptr for this round
        std::fill(rp.begin(), rp.end(), 0);
        for (const auto& e : cur) ++rp[(size_t)e.row + 1];
        for (int64_t r = 0; r < num_rows; ++r) rp[r + 1] += rp[r];

        next.clear();
        for (int64_t g = 0; g < num_groups; ++g) {
            const int64_t r0 = g * GROUP_ROWS;
            const int64_t r1 = std::min(r0 + GROUP_ROWS, num_rows);
            int64_t max_len = 0;
            for (int64_t r = r0; r < r1; ++r)
                max_len = std::max(max_len, rp[r + 1] - rp[r]);
            const int64_t n_sc = (max_len + SLOTS - 1) / SLOTS;
            for (int64_t sc = 0; sc < n_sc; ++sc) {
                const int64_t s0 = sc * SLOTS;
                const size_t base_v = c_val.size();
                c_val.resize(base_v + SLOTS * GROUP_ROWS, 0.0);
                c_loc.resize(c_loc.size() + SLOTS * GROUP_ROWS, 0);
                const size_t base_w = c_ws.size();
                c_ws.resize(base_w + SLOTS, 0);
                c_grp.push_back((int32_t)g);
                double* vt = &c_val[base_v];
                int32_t* lt = &c_loc[base_v];
                int32_t* wt = &c_ws[base_w];
                for (int64_t s = 0; s < SLOTS; ++s) {
                    slot_cols.clear();
                    for (int64_t r = r0; r < r1; ++r) {
                        const int64_t len = rp[r + 1] - rp[r];
                        if (len > s0 + s)
                            slot_cols.push_back(
                                cur[(size_t)(rp[r] + s0 + s)].col);
                    }
                    if (slot_cols.empty()) continue;
                    std::sort(slot_cols.begin(), slot_cols.end());
                    const int64_t ws = best_window(slot_cols, wcols);
                    wt[s] = (int32_t)ws;
                    for (int64_t r = r0; r < r1; ++r) {
                        const int64_t len = rp[r + 1] - rp[r];
                        if (len <= s0 + s) continue;
                        const Entry& e = cur[(size_t)(rp[r] + s0 + s)];
                        const int64_t local = e.col - ws * LANE;
                        if (local >= 0 && local < wcols) {
                            vt[s * GROUP_ROWS + (r - r0)] = e.val;
                            lt[s * GROUP_ROWS + (r - r0)] =
                                (int32_t)local;
                        } else {
                            next.push_back(e);
                        }
                    }
                }
            }
        }
        std::stable_sort(next.begin(), next.end(),
                         [](const Entry& a, const Entry& b) {
                             return a.row != b.row ? a.row < b.row
                                                  : a.col < b.col;
                         });
        cur.swap(next);
    }

    // inert chunk for every empty 8-group output block
    const int64_t num_blocks = (num_groups + 7) / 8;
    std::vector<char> seen((size_t)num_blocks, 0);
    for (int32_t g : c_grp) seen[(size_t)g / 8] = 1;
    for (int64_t blk = 0; blk < num_blocks; ++blk) {
        if (!seen[(size_t)blk]) {
            c_val.resize(c_val.size() + SLOTS * GROUP_ROWS, 0.0);
            c_loc.resize(c_loc.size() + SLOTS * GROUP_ROWS, 0);
            c_ws.resize(c_ws.size() + SLOTS, 0);
            c_grp.push_back((int32_t)(blk * 8));
        }
    }

    // stable sort chunks by group
    const int64_t nc = (int64_t)c_grp.size();
    std::vector<int64_t> order((size_t)nc);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) {
                         return c_grp[(size_t)a] < c_grp[(size_t)b];
                     });

    WellPacked* out =
        (WellPacked*)std::calloc(1, sizeof(WellPacked));
    out->num_chunks = nc;
    out->value = (double*)std::malloc(
        sizeof(double) * (size_t)nc * SLOTS * GROUP_ROWS);
    out->local_index = (int32_t*)std::malloc(
        sizeof(int32_t) * (size_t)nc * SLOTS * GROUP_ROWS);
    out->window_start =
        (int32_t*)std::malloc(sizeof(int32_t) * (size_t)nc * SLOTS);
    out->group_of_chunk =
        (int32_t*)std::malloc(sizeof(int32_t) * (size_t)nc);
    for (int64_t i = 0; i < nc; ++i) {
        const int64_t src = order[(size_t)i];
        std::memcpy(out->value + i * SLOTS * GROUP_ROWS,
                    c_val.data() + src * SLOTS * GROUP_ROWS,
                    sizeof(double) * SLOTS * GROUP_ROWS);
        std::memcpy(out->local_index + i * SLOTS * GROUP_ROWS,
                    c_loc.data() + src * SLOTS * GROUP_ROWS,
                    sizeof(int32_t) * SLOTS * GROUP_ROWS);
        std::memcpy(out->window_start + i * SLOTS,
                    c_ws.data() + src * SLOTS,
                    sizeof(int32_t) * SLOTS);
        out->group_of_chunk[i] = c_grp[(size_t)src];
    }

    std::stable_sort(cur.begin(), cur.end(),
                     [](const Entry& a, const Entry& b) {
                         return a.row != b.row ? a.row < b.row
                                              : a.col < b.col;
                     });
    out->num_spill = (int64_t)cur.size();
    if (!cur.empty()) {
        out->spill_rows = (int64_t*)std::malloc(
            sizeof(int64_t) * cur.size());
        out->spill_cols = (int64_t*)std::malloc(
            sizeof(int64_t) * cur.size());
        out->spill_vals =
            (double*)std::malloc(sizeof(double) * cur.size());
        for (size_t i = 0; i < cur.size(); ++i) {
            out->spill_rows[i] = cur[i].row;
            out->spill_cols[i] = cur[i].col;
            out->spill_vals[i] = cur[i].val;
        }
    }
    return out;
}

}  // extern "C"
