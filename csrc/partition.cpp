// Native cores for the multilevel graph partitioner
// (spmv_tpu/models/reorder.py::partition_graph).
//
// The Python orchestration (coarsening contraction, induced
// subgraphs, recursion) is vectorized numpy; the two per-node/
// per-move loops are not, and dominated wall time on irregular
// graphs (181 s for a 100k-row random_sparse at P=8).  This file
// provides exactly those two loops:
//
//   hem_match:  greedy heavy-edge matching in a given visit order
//   fm_refine:  boundary Fiduccia-Mattheyses passes with a lazy heap
//
// hem_match mirrors the Python loop bit-for-bit given the same visit
// order (tests/test_reorder_quality.py::test_native_matches_python);
// fm_refine runs the same algorithm but std::priority_queue breaks
// equal-gain ties by largest node id where Python's heapq takes the
// smallest, so refined partitions may differ between implementations.
// Plain C ABI for ctypes; no dependencies.

#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// Greedy heavy-edge matching.  order: visit order (n entries).
// cid out: coarse id per node.  Returns the coarse node count.
int64_t hem_match(int64_t n, const int64_t *ptr, const int64_t *adj,
                  const int64_t *wgt, const int64_t *order,
                  int64_t *cid) {
  std::vector<int64_t> match(n, -1);
  for (int64_t k = 0; k < n; ++k) {
    int64_t u = order[k];
    if (match[u] >= 0) continue;
    int64_t best = -1, best_w = -1;
    for (int64_t e = ptr[u]; e < ptr[u + 1]; ++e) {
      int64_t v = adj[e];
      if (match[v] >= 0 || v == u) continue;
      if (wgt[e] > best_w) {
        best_w = wgt[e];
        best = v;
      }
    }
    if (best >= 0) {
      match[u] = best;
      match[best] = u;
    } else {
      match[u] = u;
    }
  }
  int64_t nc = 0;
  for (int64_t u = 0; u < n; ++u) cid[u] = -1;
  for (int64_t u = 0; u < n; ++u) {
    if (cid[u] < 0) {
      cid[u] = nc;
      cid[match[u]] = nc;
      ++nc;
    }
  }
  return nc;
}

// Boundary FM refinement.  side: 0/1 per node (updated in place).
// limit_a / limit_b: max weight of side 0 / side 1 under the balance
// bound.  Runs `passes` passes; each pass moves best-gain boundary
// nodes under the bound, keeps the best prefix, reverts the rest.
// Returns the total cut delta applied (<= 0).
int64_t fm_refine(int64_t n, const int64_t *ptr, const int64_t *adj,
                  const int64_t *wgt, const int64_t *vwgt,
                  uint8_t *side, double limit_a, double limit_b,
                  int64_t passes) {
  typedef std::pair<int64_t, int64_t> hitem;  // (-gain, node)
  std::vector<int64_t> gain(n), stamp(n);
  std::vector<uint8_t> locked(n), cur(n);
  std::vector<int64_t> moves;
  int64_t total_delta = 0;

  for (int64_t pass = 0; pass < passes; ++pass) {
    int64_t wA = 0, wB = 0;
    for (int64_t u = 0; u < n; ++u)
      (side[u] ? wB : wA) += vwgt[u];

    std::priority_queue<std::pair<int64_t, hitem>> heap;
    for (int64_t u = 0; u < n; ++u) {
      locked[u] = 0;
      stamp[u] = 0;
      cur[u] = side[u];
      int64_t ext = 0, inte = 0;
      for (int64_t e = ptr[u]; e < ptr[u + 1]; ++e)
        (side[adj[e]] != side[u] ? ext : inte) += wgt[e];
      gain[u] = ext - inte;
      if (ext > 0) heap.push({gain[u], {u, 0}});
    }
    int64_t boundary0 = (int64_t)heap.size();

    moves.clear();
    int64_t cut_delta = 0, best_delta = 0, best_len = 0;
    int64_t max_moves = 4 * boundary0 + 16;
    while (!heap.empty() && (int64_t)moves.size() <= max_moves) {
      auto top = heap.top();
      heap.pop();
      int64_t u = top.second.first, st = top.second.second;
      if (locked[u] || st != stamp[u]) continue;
      int64_t wv = vwgt[u];
      if (cur[u]) {  // B -> A
        if (wA + wv > limit_a) continue;
        wA += wv;
        wB -= wv;
      } else {  // A -> B
        if (wB + wv > limit_b) continue;
        wA -= wv;
        wB += wv;
      }
      locked[u] = 1;
      cut_delta -= gain[u];
      moves.push_back(u);
      cur[u] ^= 1;
      if (cut_delta < best_delta) {
        best_delta = cut_delta;
        best_len = (int64_t)moves.size();
      }
      for (int64_t e = ptr[u]; e < ptr[u + 1]; ++e) {
        int64_t v = adj[e];
        if (locked[v]) continue;
        if (cur[v] == cur[u])
          gain[v] -= 2 * wgt[e];
        else
          gain[v] += 2 * wgt[e];
        stamp[v] += 1;
        heap.push({gain[v], {v, stamp[v]}});
      }
    }
    if (best_len == 0) break;
    for (int64_t k = 0; k < best_len; ++k) side[moves[k]] ^= 1;
    total_delta += best_delta;
  }
  return total_delta;
}

}  // extern "C"
