"""Bandwidth-reducing and locality reordering.

Counterpart of the reference's src/matrix/matrix-market-reorder.cpp:

- ``find_new_order_rcm``: Reverse Cuthill-McKee with the reference's
  exact strategy (matrix-market-reorder.cpp:60-170): adjacency from
  row-wise off-diagonal entries, BFS restarted from the globally
  minimum-degree untaken node, neighbors enqueued in increasing degree
  order, final order reversed; returns an old->new index map.
- ``find_new_order_gp``: graph-partition clustering.  The reference
  calls METIS_PartGraphKway (183-279) and degrades to the identity
  without METIS (172-180).  METIS is not in this image, so we implement
  recursive BFS (level-set) bisection into ``num_parts`` clusters and
  order rows by cluster — same role (grouping tightly coupled rows to
  cut remote x-traffic / halo volume), different partitioner.

On the TPU side, reordering is *the* lever for halo volume over ICI:
after RCM, a banded matrix's row-block shards only need neighbor
x-segments (see spmv_tpu.parallel.halo).
"""

from __future__ import annotations

from collections import deque
from typing import List

import numpy as np

from spmv_tpu.io.matrix_market import MatrixMarket

__all__ = ["find_new_order_rcm", "find_new_order_gp",
           "find_new_order_sigma", "find_new_order_coloring",
           "bandwidth"]


def _adjacency(mm: MatrixMarket):
    """CSR-style adjacency of off-diagonal row-wise entries.

    Matches generate_degree_and_adjacency
    (matrix-market-reorder.cpp:14-57): directed i->j edges, duplicates
    kept, diagonal dropped.  Requires a square matrix.
    """
    if mm.num_rows != mm.num_columns:
        raise ValueError("Expected a square matrix")
    i = mm.rows_1based.astype(np.int64) - 1
    j = mm.cols_1based.astype(np.int64) - 1
    offdiag = i != j
    i, j = i[offdiag], j[offdiag]
    order = np.argsort(i, kind="stable")
    i, j = i[order], j[order]
    degrees = np.bincount(i, minlength=mm.num_rows)
    ptr = np.zeros(mm.num_rows + 1, dtype=np.int64)
    np.cumsum(degrees, out=ptr[1:])
    return degrees, ptr, j


def bandwidth(mm: MatrixMarket, new_order: np.ndarray = None) -> int:
    """max |i - j| over entries, optionally under a relabeling."""
    i = mm.rows_1based.astype(np.int64) - 1
    j = mm.cols_1based.astype(np.int64) - 1
    if new_order is not None:
        p = np.asarray(new_order, dtype=np.int64)
        i, j = p[i], p[j]
    if i.size == 0:
        return 0
    return int(np.abs(i - j).max())


def find_new_order_rcm(mm: MatrixMarket) -> np.ndarray:
    """Reverse Cuthill-McKee old->new map (reorder.cpp:60-170)."""
    n = mm.num_rows
    degrees, ptr, adj = _adjacency(mm)

    taken = np.zeros(n, dtype=bool)
    visited = np.zeros(n, dtype=bool)
    R: List[int] = []

    # Min-degree order for component restarts: stable argsort by degree
    # gives the same node the reference's linear scan would find.
    restart_order = np.argsort(degrees, kind="stable")
    restart_pos = 0

    while len(R) < n:
        while restart_pos < n and taken[restart_order[restart_pos]]:
            restart_pos += 1
        start = int(restart_order[restart_pos])
        R.append(start)
        taken[start] = True
        visited[start] = True

        q = deque()
        nbrs = adj[ptr[start]:ptr[start + 1]]
        fresh = nbrs[~visited[nbrs]]
        # Dedup preserving first occurrence, then sort by degree
        # (stable, like std::sort with the reference's comparator on
        # first-occurrence order).
        fresh = fresh[np.sort(np.unique(fresh, return_index=True)[1])]
        visited[fresh] = True
        q.extend(fresh[np.argsort(degrees[fresh], kind="stable")].tolist())

        while q:
            u = q.popleft()
            if not taken[u]:
                R.append(int(u))
                taken[u] = True
                nbrs = adj[ptr[u]:ptr[u + 1]]
                fresh = nbrs[~visited[nbrs]]
                fresh = fresh[np.sort(np.unique(fresh, return_index=True)[1])]
                visited[fresh] = True
                q.extend(
                    fresh[np.argsort(degrees[fresh], kind="stable")].tolist()
                )

    R_arr = np.array(R[::-1], dtype=np.int64)
    new_order = np.empty(n, dtype=np.int64)
    new_order[R_arr] = np.arange(n, dtype=np.int64)
    return new_order


def find_new_order_gp(mm: MatrixMarket, num_parts: int = 16) -> np.ndarray:
    """Graph-partition clustering order (METIS replacement).

    Recursive BFS bisection into ``num_parts`` clusters (balanced level
    sets), then rows ordered by cluster id (stable).  Returns an
    old->new map like the reference's find_new_order_GP.
    """
    n = mm.num_rows
    if num_parts <= 1 or n == 0:
        return np.arange(n, dtype=np.int64)

    degrees, ptr, adj = _adjacency(mm)

    def bfs_halves(nodes: np.ndarray) -> tuple:
        """Split a node set roughly in half by BFS level sets."""
        node_set = np.zeros(n, dtype=bool)
        node_set[nodes] = True
        target = nodes.size // 2
        visited = np.zeros(n, dtype=bool)
        first: List[int] = []
        # Start from the minimum-degree node in the set.
        start = int(nodes[np.argmin(degrees[nodes])])
        q = deque([start])
        visited[start] = True
        while len(first) < target:
            if not q:
                # Disconnected: restart from an unvisited node.
                rest = nodes[~visited[nodes]]
                if rest.size == 0:
                    break
                s = int(rest[np.argmin(degrees[rest])])
                visited[s] = True
                q.append(s)
                continue
            u = q.popleft()
            first.append(u)
            nbrs = adj[ptr[u]:ptr[u + 1]]
            nbrs = nbrs[node_set[nbrs] & ~visited[nbrs]]
            visited[nbrs] = True
            q.extend(nbrs.tolist())
        first_arr = np.array(first, dtype=np.int64)
        in_first = np.zeros(n, dtype=bool)
        in_first[first_arr] = True
        second = nodes[~in_first[nodes]]
        return first_arr, second

    labels = np.zeros(n, dtype=np.int64)

    def recurse(nodes: np.ndarray, parts: int, base: int) -> None:
        if parts <= 1 or nodes.size <= 1:
            labels[nodes] = base
            return
        left_parts = parts // 2
        right_parts = parts - left_parts
        a, b = bfs_halves(nodes)
        recurse(a, left_parts, base)
        recurse(b, right_parts, base + left_parts)

    recurse(np.arange(n, dtype=np.int64), num_parts, 0)
    order = np.argsort(labels, kind="stable")
    new_order = np.empty(n, dtype=np.int64)
    new_order[order] = np.arange(n, dtype=np.int64)
    return new_order


def find_new_order_sigma(
    mm: MatrixMarket, sigma: int = 1024
) -> np.ndarray:
    """SELL-sigma row ordering: sort rows by descending length within
    windows of ``sigma`` rows.

    No reference counterpart (the reference's orders are RCM and
    graph-partition, matrix-market-reorder.cpp); this one serves the
    WELL format (models.well): rows of similar length land in the same
    128-row group, so slot columns stay aligned and chunk padding
    shrinks.  Like every order here it composes with
    ``MatrixMarket.permute`` — the matrix is permuted once on the host
    and vectors are permuted at the boundary, which is the TPU-correct
    place for a permutation (no device gather).
    """
    lengths = np.zeros(mm.num_rows, dtype=np.int64)
    np.add.at(lengths, mm.rows_1based - 1, 1)
    order = np.arange(mm.num_rows, dtype=np.int64)
    for start in range(0, mm.num_rows, max(int(sigma), 1)):
        stop = min(start + sigma, mm.num_rows)
        window = order[start:stop]
        # stable: equal lengths keep their relative (e.g. RCM) order
        key = np.argsort(-lengths[window], kind="stable")
        order[start:stop] = window[key]
    # new_order maps old index -> new position (permute() convention)
    new_order = np.empty_like(order)
    new_order[order] = np.arange(mm.num_rows, dtype=np.int64)
    return new_order


def find_new_order_coloring(mm: MatrixMarket) -> np.ndarray:
    """Greedy multicolor (graph-coloring) old->new map.

    The parallel-preconditioning classic: color the adjacency graph so
    no two neighbors share a color, then number rows color-by-color.
    Rows of one color have no dependencies on each other, so an
    incomplete factor of the *reordered* matrix has one triangular-
    solve level per color — a 5-point Laplacian collapses from
    ~2*sqrt(n) natural-order levels to 2, turning the level-scheduled
    solve (ops.incomplete.DeviceTriSolve) into a handful of fully
    vectorized scan steps.  The trade is a (usually mild) loss of
    factor quality vs the natural order.

    Greedy first-fit in degree order (Welsh-Powell), symmetrized
    adjacency; like every order here it composes with
    ``MatrixMarket.permute``.
    """
    n = mm.num_rows
    degrees, ptr, adj = _adjacency(mm)
    # symmetrize: color constraints are undirected
    i = np.repeat(np.arange(n, dtype=np.int64), np.diff(ptr))
    si = np.concatenate([i, adj])
    sj = np.concatenate([adj, i])
    order_e = np.argsort(si, kind="stable")
    si, sj = si[order_e], sj[order_e]
    sptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(si, minlength=n), out=sptr[1:])

    visit = np.argsort(-(np.bincount(si, minlength=n)), kind="stable")
    from spmv_tpu.ops import _ic_native

    if _ic_native.available():
        color = _ic_native.greedy_color(sptr, sj, visit)
    else:
        color = np.full(n, -1, dtype=np.int64)
        for v in visit:
            neigh = sj[sptr[v]:sptr[v + 1]]
            used = set(color[neigh][color[neigh] >= 0].tolist())
            c = 0
            while c in used:
                c += 1
            color[v] = c
    # number rows color-major, stable within a color
    perm = np.lexsort((np.arange(n), color))
    new_order = np.empty(n, dtype=np.int64)
    new_order[perm] = np.arange(n, dtype=np.int64)
    return new_order
