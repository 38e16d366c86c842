// Native greedy aggregation for the SA-AMG setup.
//
// Statement-for-statement mirror of the pure-Python reference
// (spmv_tpu/ops/amg.py::_aggregate_py, Vanek/Mandel/Brezina 1996
// greedy aggregation over the strength graph) — lockstep-tested in
// tests/test_amg.py.  The Python loop visits every node three times
// sequentially, which costs seconds per million rows; this runs the
// same O(nnz) passes at C++ speed.  Same C-ABI + ctypes pattern as
// csrc/ic0.cpp.

#include <cstdint>

extern "C" {

// rp/cols: strength-graph CSR (off-diagonal strong edges only).
// agg: out, length n (any contents; fully overwritten).
// scratch: length n work buffer.
// Returns the number of aggregates.
int64_t spmv_amg_aggregate(int64_t n, const int64_t* rp,
                           const int32_t* cols, int64_t* agg,
                           int64_t* scratch) {
    for (int64_t i = 0; i < n; ++i) agg[i] = -1;
    int64_t cnt = 0;

    // pass 1: aggregate every node whose strong neighborhood is
    // entirely unassigned
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        bool untouched = true;
        for (int64_t t = rp[i]; t < rp[i + 1]; ++t) {
            if (agg[cols[t]] != -1) {
                untouched = false;
                break;
            }
        }
        if (untouched) {
            agg[i] = cnt;
            for (int64_t t = rp[i]; t < rp[i + 1]; ++t)
                agg[cols[t]] = cnt;
            ++cnt;
        }
    }

    // pass 2: attach leftovers to the first pass-1 neighbor aggregate
    // (decisions read the pass-1 state, not each other's)
    for (int64_t i = 0; i < n; ++i) scratch[i] = agg[i];
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        for (int64_t t = rp[i]; t < rp[i + 1]; ++t) {
            const int64_t a = agg[cols[t]];
            if (a != -1) {
                scratch[i] = a;
                break;
            }
        }
    }
    for (int64_t i = 0; i < n; ++i) agg[i] = scratch[i];

    // pass 3: group whatever remains with its unassigned neighbors
    for (int64_t i = 0; i < n; ++i) {
        if (agg[i] != -1) continue;
        agg[i] = cnt;
        for (int64_t t = rp[i]; t < rp[i + 1]; ++t) {
            const int64_t j = cols[t];
            if (agg[j] == -1) agg[j] = cnt;
        }
        ++cnt;
    }
    return cnt;
}

}  // extern "C"
