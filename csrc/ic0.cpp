// Native incomplete-factorization kernels (IC(0) / ILU(0)).
//
// Both operate in place on column-sorted CSR value arrays that the
// Python side (spmv_tpu/ops/incomplete.py) prepares; the numeric
// semantics mirror the pure-Python loops exactly (lockstep-tested in
// tests/test_incomplete.py), they just run the O(nnz * row) sparse
// dot products at C++ speed — the Python factorization of a 262k-row
// Laplacian costs ~6.5 s, which dominates preconditioner setup
// (experiments/RESULTS.md, probes 51-52).
//
// C ABI, loaded via ctypes (spmv_tpu/ops/_ic_native.py).

#include <cmath>
#include <cstdint>

extern "C" {

// IC(0) on the lower pattern (diagonal last in each sorted row).
// vals is updated in place to hold L.  Returns 0 on success,
// (i + 1) when row i's pivot is non-positive.
int64_t spmv_ic0_factor(int64_t n, const int64_t* rp,
                        const int32_t* cols, double* vals) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t s = rp[i], e = rp[i + 1];
        // off-diagonal entries first (columns ascending, diag last)
        for (int64_t t = s; t < e - 1; ++t) {
            const int64_t j = cols[t];
            const int64_t sj = rp[j], ej = rp[j + 1];
            // two-pointer sparse dot of L[i, :j] and L[j, :j]
            double acc = 0.0;
            int64_t a = s, b = sj;
            while (a < t && b < ej - 1) {
                const int32_t ca = cols[a], cb = cols[b];
                if (ca == cb) {
                    acc += vals[a] * vals[b];
                    ++a;
                    ++b;
                } else if (ca < cb) {
                    ++a;
                } else {
                    ++b;
                }
            }
            vals[t] = (vals[t] - acc) / vals[ej - 1];
        }
        double pivot = vals[e - 1];
        for (int64_t t = s; t < e - 1; ++t)
            pivot -= vals[t] * vals[t];
        if (pivot <= 0.0)
            return i + 1;
        vals[e - 1] = std::sqrt(pivot);
    }
    return 0;
}

// ILU(0) IKJ elimination on the full pattern (columns ascending per
// row); vals updated in place (strict lower = L multipliers, upper
// incl. diagonal = U).  diag_slot[i] is the flat index of (i, i).
// Returns 0 on success, (k + 1) when pivot row k has a zero pivot.
int64_t spmv_ilu0_factor(int64_t n, const int64_t* rp,
                         const int32_t* cols, double* vals,
                         const int64_t* diag_slot) {
    for (int64_t i = 1; i < n; ++i) {
        const int64_t s = rp[i], e = rp[i + 1];
        for (int64_t t = s; t < e; ++t) {
            const int64_t k = cols[t];
            if (k >= i) break;
            const double piv = vals[diag_slot[k]];
            if (piv == 0.0)
                return k + 1;
            const double lik = vals[t] / piv;
            vals[t] = lik;
            // row i -= lik * U[k, j] for j > k, pattern-restricted:
            // two-pointer walk over row i's tail and row k's U part
            int64_t a = t + 1;
            int64_t b = diag_slot[k] + 1;
            const int64_t ke = rp[k + 1];
            while (a < e && b < ke) {
                const int32_t ca = cols[a], cb = cols[b];
                if (ca == cb) {
                    vals[a] -= lik * vals[b];
                    ++a;
                    ++b;
                } else if (ca < cb) {
                    ++a;
                } else {
                    ++b;
                }
            }
        }
    }
    return 0;
}

// Dependency levels of a triangular CSR: level[i] = 1 + max level of
// the rows row i reads (columns < i for lower, > i for upper; upper
// is processed in reverse row order).  Writes levels into out_level
// and returns the level count.
int64_t spmv_level_schedule(int64_t n, const int64_t* rp,
                            const int32_t* cols, int32_t lower,
                            int64_t* out_level) {
    int64_t nl = 0;
    if (lower) {
        for (int64_t i = 0; i < n; ++i) {
            int64_t lvl = 0;
            for (int64_t t = rp[i]; t < rp[i + 1]; ++t) {
                const int64_t j = cols[t];
                if (j < i && out_level[j] + 1 > lvl)
                    lvl = out_level[j] + 1;
            }
            out_level[i] = lvl;
            if (lvl + 1 > nl) nl = lvl + 1;
        }
    } else {
        for (int64_t i = n - 1; i >= 0; --i) {
            int64_t lvl = 0;
            for (int64_t t = rp[i]; t < rp[i + 1]; ++t) {
                const int64_t j = cols[t];
                if (j > i && out_level[j] + 1 > lvl)
                    lvl = out_level[j] + 1;
            }
            out_level[i] = lvl;
            if (lvl + 1 > nl) nl = lvl + 1;
        }
    }
    return n ? nl : 0;
}

// Greedy first-fit vertex coloring over a symmetrized adjacency,
// visiting vertices in the given order (Welsh-Powell when the order
// is by descending degree).  color must be preinitialized to -1.
// Returns the color count.  Mirrors the Python greedy exactly: the
// smallest color unused by any already-colored neighbor.
int64_t spmv_greedy_color(int64_t n, const int64_t* sptr,
                          const int64_t* sadj, const int64_t* visit,
                          int64_t* color, uint8_t* used_scratch) {
    int64_t ncolors = 0;
    for (int64_t k = 0; k < n; ++k) {
        const int64_t v = visit[k];
        // mark neighbor colors
        for (int64_t t = sptr[v]; t < sptr[v + 1]; ++t) {
            const int64_t c = color[sadj[t]];
            if (c >= 0) used_scratch[c] = 1;
        }
        int64_t c = 0;
        while (used_scratch[c]) ++c;
        color[v] = c;
        if (c + 1 > ncolors) ncolors = c + 1;
        // unmark
        for (int64_t t = sptr[v]; t < sptr[v + 1]; ++t) {
            const int64_t cc = color[sadj[t]];
            if (cc >= 0) used_scratch[cc] = 0;
        }
    }
    return ncolors;
}

}  // extern "C"
