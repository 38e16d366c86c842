"""Cache simulation, reference strings, trace config, roofline model.

Mirrors test_replacement.cpp: hand-written reference strings with exact
expected miss counts, including the two-thread shared-cache interleaving
and per-NUMA-domain attribution cases; plus native-vs-Python equality.
"""

import json

import numpy as np
import pytest

from spmv_tpu.errors import TraceConfigError
from spmv_tpu.io import parse_matrix_market
from spmv_tpu.io.generate import poisson2d
from spmv_tpu.kernels import make_kernel
from spmv_tpu.models import CsrMatrix
from spmv_tpu.perfmodel import (
    FIFO,
    LRU,
    RAND,
    TraceConfig,
    VirtualLayout,
    parse_trace_config,
    spmv_traffic_model,
    roofline_time,
    thread_of_index,
    trace_cache_misses,
    trace_cache_misses_interleaved,
    trace_cache_misses_single,
)
from spmv_tpu.perfmodel import native
from spmv_tpu.perfmodel.refstring import csr_spmv_refstring
from spmv_tpu.perfmodel.tiling import TPU_V5E


def refs(lines, line_size=1):
    """Hand-written reference string on line-sized addresses."""
    a = np.asarray(lines, dtype=np.uint64) * line_size
    return a, np.zeros(a.size, dtype=np.int32)


# --- replacement algorithms (test_replacement.cpp style) -----------------

def test_lru_basic():
    # Cache of 2 lines: 0,1 miss; 0 hit (now MRU); 2 miss evicts 1;
    # 1 miss; 0 miss (evicted when 1 came in? trace: after 2: {0,2};
    # after 1: evicts 0 -> {2,1}; then 0 misses.
    alg = LRU(2, 1)
    seq = [0, 1, 0, 2, 1, 0]
    misses = [alg.allocate(a) for a in seq]
    assert misses == [1, 1, 0, 1, 1, 1]


def test_lru_recency_update_vs_fifo():
    # Distinguishes LRU from FIFO: 0,1,0,2 -> LRU evicts 1, FIFO evicts 0.
    lru, fifo = LRU(2, 1), FIFO(2, 1)
    for a in (0, 1, 0, 2):
        lru.allocate(a)
        fifo.allocate(a)
    assert lru.allocate(0) == 0   # still resident
    assert fifo.allocate(0) == 1  # was evicted


def test_line_granularity():
    alg = LRU(1, 64)
    assert alg.allocate(0) == 1
    assert alg.allocate(63) == 0   # same line
    assert alg.allocate(64) == 1   # next line


def test_rand_capacity():
    alg = RAND(2, 1)
    seq = [0, 1, 2, 3, 4]
    total = sum(alg.allocate(a) for a in seq)
    assert total == 5  # all distinct -> all miss
    # residency never exceeds capacity
    assert len(alg._set) == 2


def test_single_string_numa_attribution():
    # Misses attributed to the reference's numa domain
    # (test_replacement.cpp:355-384 analogue).
    alg = LRU(4, 1)
    addrs = np.array([0, 1, 2, 0, 1, 2], dtype=np.uint64)
    numas = np.array([0, 1, 1, 0, 1, 1], dtype=np.int32)
    out = trace_cache_misses_single(alg, addrs, numas, 2)
    np.testing.assert_array_equal(out, [1, 2])


def test_interleaved_two_threads_shared_cache():
    # Two threads, shared cache of 2 lines, round-robin interleave
    # (test_replacement.cpp:276-350 analogue).
    # t0: [0, 0, 0], t1: [1, 1, 1] -> interleaved 0,1,0,1,0,1:
    # misses only on the first occurrence of each line.
    alg = LRU(2, 1)
    s0 = refs([0, 0, 0])
    s1 = refs([1, 1, 1])
    out = trace_cache_misses_interleaved(alg, [s0, s1], 1,
                                         use_native=False)
    np.testing.assert_array_equal(out, [[1], [1]])


def test_interleaved_contention():
    # Cache of 1 line: threads alternate lines 0/1 -> every access
    # misses (mutual eviction).
    alg = LRU(1, 1)
    s0 = refs([0, 0])
    s1 = refs([1, 1])
    out = trace_cache_misses_interleaved(alg, [s0, s1], 1,
                                         use_native=False)
    np.testing.assert_array_equal(out, [[2], [2]])


def test_interleaved_unequal_lengths():
    alg = LRU(8, 1)
    s0 = refs([0, 1, 2, 3, 4])
    s1 = refs([10])
    out = trace_cache_misses_interleaved(alg, [s0, s1], 1,
                                         use_native=False)
    np.testing.assert_array_equal(out, [[5], [1]])


@pytest.mark.skipif(not native.available(), reason="no native simcache")
@pytest.mark.parametrize("policy,cls", [(0, LRU), (1, FIFO)])
def test_native_matches_python(policy, cls):
    rng = np.random.default_rng(42)
    strings = []
    for p in range(4):
        n = int(rng.integers(100, 400))
        addrs = rng.integers(0, 256, n).astype(np.uint64) * 64
        numas = rng.integers(0, 3, n).astype(np.int32)
        strings.append((addrs, numas))

    py = trace_cache_misses_interleaved(
        cls(32, 64), strings, 3, use_native=False
    )
    nat = native.replay_interleaved(policy, 32, 64, strings, 3)
    np.testing.assert_array_equal(py, nat)


@pytest.mark.skipif(not native.available(), reason="no native simcache")
def test_native_warmup_drops_compulsory_misses():
    strings = [refs([0, 1, 2, 3] * 4)]
    cold = native.replay_interleaved(0, 8, 1, strings, 1, warmup=False)
    warm = native.replay_interleaved(0, 8, 1, strings, 1, warmup=True)
    assert cold[0, 0] == 4   # compulsory
    assert warm[0, 0] == 0   # everything resident after warmup


# --- page ownership -------------------------------------------------------

def test_thread_of_index_block_ownership():
    lay = VirtualLayout(page_size=4096)
    arr = lay.allocate("x", 4096, 8)  # 4096 doubles = 8 pages
    # 2 threads x 2048 elements = 4 pages each.
    owners = thread_of_index(arr, np.arange(4096), 2, 4096)
    np.testing.assert_array_equal(owners[:2048], 0)
    np.testing.assert_array_equal(owners[2048:], 1)


def test_thread_of_index_sub_page_blocks():
    # Blocks smaller than a page: the page belongs to the thread whose
    # block contains its first byte (reference fallback semantics).
    lay = VirtualLayout(page_size=4096)
    arr = lay.allocate("x", 64, 8)  # 64 doubles, one page
    owners = thread_of_index(arr, np.arange(64), 4, 4096)
    np.testing.assert_array_equal(owners, 0)


# --- reference strings ----------------------------------------------------

def csr_fixture():
    mm = parse_matrix_market(
        "%%MatrixMarket matrix coordinate real general\n"
        "4 5 7\n1 1 1.0\n1 2 2.0\n2 2 1.0\n3 3 3.0\n4 1 -1.0\n"
        "4 4 2.0\n4 5 1.0\n"
    )
    return CsrMatrix.from_matrix_market(mm)


def make_layout_for_csr(m):
    lay = VirtualLayout()
    lay.allocate("row_ptr", m.row_ptr.size, 4)
    lay.allocate("column_index", m.column_index.size, 4)
    lay.allocate("value", m.value.size, 8)
    lay.allocate("x", m.num_columns, 8)
    lay.allocate("y", m.num_rows, 8)
    return lay


def test_csr_refstring_structure():
    m = csr_fixture()
    lay = make_layout_for_csr(m)
    addrs, numas = csr_spmv_refstring(
        m, lay, 0, 1, np.array([0]), page_size=4096
    )
    # 3*nnz + 2*rows + 1 (csr-matrix.cpp:105).
    assert addrs.size == 3 * 7 + 2 * 4 + 1
    # First ref is row_ptr[0]; the x refs hit the x array range.
    assert addrs[0] == lay["row_ptr"].base
    x0, x1 = lay["x"].base, lay["x"].base + lay["x"].nbytes
    x_refs = addrs[(addrs >= x0) & (addrs < x1)]
    assert x_refs.size == 7
    # Exact x addresses: columns of the sorted entries.
    np.testing.assert_array_equal(
        np.sort(x_refs),
        np.sort(lay["x"].addresses(m.column_index)),
    )


def test_csr_refstring_two_threads_split():
    m = csr_fixture()
    lay = make_layout_for_csr(m)
    nd = np.array([0, 1])
    a0, n0 = csr_spmv_refstring(m, lay, 0, 2, nd)
    a1, n1 = csr_spmv_refstring(m, lay, 1, 2, nd)
    # ceil(4/2)=2 rows each; thread 0 owns rows 0-1 (3 nnz), thread 1
    # rows 2-3 (4 nnz).
    assert a0.size == 3 * 3 + 2 * 2 + 1
    assert a1.size == 3 * 4 + 2 * 2 + 1
    assert set(np.unique(n0)) <= {0, 1}


@pytest.mark.parametrize(
    "name", ["csr", "ell", "coo", "coo-atomic", "hybrid", "dia", "well"]
)
def test_kernel_refstrings_replayable(name):
    mm = poisson2d(8, 8)
    k = make_kernel(name, mm=mm)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    total = 0
    for t in range(2):
        addrs, numas = k.memory_reference_string(cfg, t, 2)
        assert addrs.size == numas.size
        total += addrs.size
        if numas.size:
            assert numas.min() >= 0 and numas.max() < 2
    # a thread may own zero work units (e.g. well with one chunk),
    # but the kernel as a whole always issues references
    assert total > 0


def test_triad_kernel_refstring():
    k = make_kernel("triad", triad_entries=100)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    a0, _ = k.memory_reference_string(cfg, 0, 2)
    assert a0.size == 3 * 50


def test_xla_csr_refstring_not_implemented():
    from spmv_tpu.errors import KernelError

    k = make_kernel("xla-csr", mm=poisson2d(4, 4))
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    with pytest.raises(KernelError):
        k.memory_reference_string(cfg, 0, 2)


# --- trace config ----------------------------------------------------------

EXAMPLE_CONFIG = {
    "caches": {
        "L1-0": {"size": 32768, "line_size": 64, "parent": "L2-0"},
        "L1-1": {"size": 32768, "line_size": 64, "parent": "L2-1"},
        "L2-0": {"size": 262144, "line_size": 64, "parent": "L3"},
        "L2-1": {"size": 262144, "line_size": 64, "parent": "L3"},
        "L3": {"size": 20971520, "line_size": 64, "parent": None},
    },
    "num_numa_domains": 2,
    "thread_affinities": [
        {"thread": 0, "cpu": 0, "cache": "L1-0", "numa_domain": 0},
        {"thread": 1, "cpu": 1, "cache": "L1-1", "numa_domain": 1},
    ],
}


def test_trace_config_parse_and_topology():
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    assert cfg.num_threads == 2
    assert cfg.max_cache_size() == 20971520
    assert cfg.caches["L1-0"].num_lines == 512
    assert cfg.active_threads("L1-0") == [0]
    assert cfg.active_threads("L3") == [0, 1]
    assert cfg.cache_has_ancestor("L1-0", "L3")
    assert not cfg.cache_has_ancestor("L1-0", "L2-1")


def test_trace_config_validation_errors():
    bad = json.loads(json.dumps(EXAMPLE_CONFIG))
    bad["thread_affinities"][0]["cache"] = "nope"
    with pytest.raises(TraceConfigError):
        parse_trace_config(bad)
    bad2 = json.loads(json.dumps(EXAMPLE_CONFIG))
    bad2["thread_affinities"][0]["numa_domain"] = 7
    with pytest.raises(TraceConfigError):
        parse_trace_config(bad2)
    bad3 = json.loads(json.dumps(EXAMPLE_CONFIG))
    bad3["caches"]["L3"]["parent"] = "L1-0"  # cycle
    with pytest.raises(TraceConfigError):
        parse_trace_config(bad3)


def test_trace_config_roundtrip():
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    again = parse_trace_config(cfg.to_json())
    assert again.caches.keys() == cfg.caches.keys()
    assert again.num_numa_domains == cfg.num_numa_domains


# --- end-to-end simulation --------------------------------------------------

def test_trace_cache_misses_end_to_end():
    mm = poisson2d(16, 16)
    k = make_kernel("csr", mm=mm)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    out = trace_cache_misses(cfg, k, warmup=False)
    # Every cache reported with a (threads, domains) matrix.
    assert set(out.cache_misses.keys()) == set(cfg.caches.keys())
    m = out.cache_misses["L1-0"]
    assert m.shape == (2, 2)
    # Thread 1 is inactive on L1-0 (private cache).
    np.testing.assert_array_equal(m[1], 0)
    # For thread 0, the much larger L3 (compulsory misses only at this
    # size) cannot miss more than its tiny private L1.
    assert (
        out.cache_misses["L3"][0].sum()
        <= out.cache_misses["L1-0"][0].sum()
    )
    # JSON report is serializable and has the reference's shape.
    doc = out.to_json()
    json.dumps(doc)
    assert "cache_misses" in doc and "trace_config" in doc


def test_trace_cache_misses_warmup_reduces():
    mm = poisson2d(12, 12)
    k = make_kernel("ell", mm=mm)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    cold = trace_cache_misses(cfg, k, warmup=False)
    warm = trace_cache_misses(cfg, k, warmup=True)
    # The huge L3 keeps everything resident after warmup.
    assert warm.cache_misses["L3"].sum() < cold.cache_misses["L3"].sum()


def test_python_and_native_orchestrations_agree():
    mm = poisson2d(8, 8)
    k = make_kernel("csr", mm=mm)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    a = trace_cache_misses(cfg, k, warmup=False, use_native=False)
    b = trace_cache_misses(cfg, k, warmup=False, use_native=True)
    for name in a.cache_misses:
        np.testing.assert_array_equal(
            a.cache_misses[name], b.cache_misses[name]
        )


# --- TPU tiling / roofline ---------------------------------------------------

def test_spmv_traffic_model_small_matrix():
    mm = poisson2d(10, 10)
    m = CsrMatrix.from_matrix_market(mm)
    t = spmv_traffic_model(m, value_bytes=4, index_bytes=4)
    # x fits VMEM -> tiled == lower bound, reuse factor 1.
    assert t.x_bytes_tiled == t.x_bytes_lower_bound
    assert t.reuse_factor == 1.0
    assert t.matrix_bytes == m.row_ptr[-1] * 8 + (m.num_rows + 1) * 4
    assert t.flops == 2 * m.num_entries


def test_roofline_memory_bound():
    r = roofline_time(bytes_moved=10**9, flops=10**6, machine=TPU_V5E)
    assert r["bound"] == "memory"
    assert r["time_roofline_s"] == pytest.approx(1e9 / (819 * 1e9))


def test_spmv_scaling_model():
    from spmv_tpu.perfmodel import spmv_scaling_model

    # weak scaling with halo exchange: comm is constant in P and tiny
    # next to the local stream -> efficiency stays ~1
    one = spmv_scaling_model(1, 1 << 21, halo=4096)
    assert one.weak_efficiency == 1.0
    for p in (4, 64, 1024):
        m = spmv_scaling_model(p, 1 << 21, halo=4096)
        assert m.comm_bytes_per_shard == 2 * 4096 * 4
        assert m.weak_efficiency > 0.99
    # all-gather: comm grows with P and eventually dominates
    ag64 = spmv_scaling_model(64, 1 << 21, scheme="all-gather")
    ag1024 = spmv_scaling_model(1024, 1 << 21, scheme="all-gather")
    assert ag1024.weak_efficiency < ag64.weak_efficiency < 1.0
    # hand check: local bytes = 7 * 4 * R
    assert one.t_local_s == (7 * 4 * (1 << 21)) / (819e9 * 0.80)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        spmv_scaling_model(4, 128, scheme="bogus")


def test_ici_efficiency_breakeven():
    """The leash on the unmeasured ICI constant (VERDICT r3 item 8):
    reports carry the efficiency at which the >=0.8 weak-scaling claim
    would fail, pinned here on hand-computable cases."""
    from spmv_tpu.perfmodel import spmv_scaling_model
    from spmv_tpu.perfmodel.scaling import (
        ICI_EFFICIENCY,
        MEASURED_HBM_EFFICIENCY,
        WEAK_SCALING_TARGET,
    )
    from spmv_tpu.perfmodel.tiling import TPU_V5E

    # no communication -> the claim can never fail on ICI
    one = spmv_scaling_model(1, 1 << 21, halo=4096)
    assert one.ici_efficiency_breakeven == 0.0

    # overlapped dia-halo, hand check:
    #   comm  = 2 * 4096 * 4 B
    #   local = 7 * 4 * R / (hbm * 0.80)
    #   e*    = 0.8 * comm / (ici_peak * t_local)
    m = spmv_scaling_model(4, 1 << 21, halo=4096)
    comm = 2 * 4096 * 4
    t_local = (7 * 4 * (1 << 21)) / (
        TPU_V5E.hbm_gbps * 1e9 * MEASURED_HBM_EFFICIENCY)
    ici_peak = TPU_V5E.ici_gbps_per_link * 1e9 * TPU_V5E.ici_links
    expect = WEAK_SCALING_TARGET * comm / (ici_peak * t_local)
    assert m.ici_efficiency_breakeven == pytest.approx(expect)
    # tiny halo next to the local stream: robust to the assumption
    assert m.ici_efficiency_breakeven < 0.01 < ICI_EFFICIENCY

    # serialized all-gather: e* carries the 1/(1-target) factor
    ag = spmv_scaling_model(64, 1 << 21, scheme="all-gather")
    comm_ag = 63 * (1 << 21) * 4
    expect_ag = (WEAK_SCALING_TARGET * comm_ag
                 / (ici_peak * t_local * (1 - WEAK_SCALING_TARGET)))
    assert ag.ici_efficiency_breakeven == pytest.approx(expect_ag)

    # the invariant the field encodes: claim holds at the assumed
    # efficiency iff the assumption exceeds the breakeven
    for model in (m, ag):
        holds = model.weak_efficiency >= WEAK_SCALING_TARGET
        assert holds == (
            ICI_EFFICIENCY >= model.ici_efficiency_breakeven), model

    # and it is in the JSON report
    d = ag.to_json()
    assert d["ici_efficiency_breakeven"] == pytest.approx(expect_ag)
    assert d["weak_scaling_target"] == WEAK_SCALING_TARGET


def test_replay_progress_reporting():
    # SIGALRM-progress analogue (replacement.cpp:65-93): both the
    # native and Python replay paths invoke the callback with
    # monotonically growing counts and the correct total.
    import numpy as np
    from spmv_tpu.perfmodel.cache_sim import (
        LRU, trace_cache_misses_interleaved,
    )

    rng = np.random.default_rng(0)
    addrs = (rng.integers(0, 512, 400_000) * 64).astype(np.uint64)
    doms = np.zeros(addrs.size, dtype=np.int32)
    for use_native in (True, False):
        calls = []
        alg = LRU(64, 64)
        trace_cache_misses_interleaved(
            alg, [(addrs, doms)], 1, use_native=use_native,
            progress=lambda d, t, w: calls.append((d, t)),
            progress_interval=1e-4,
        )
        if calls:  # timing-dependent; only check shape when it fired
            done, total = zip(*calls)
            assert total[0] == addrs.size
            assert all(np.diff(done) > 0)
            assert max(done) <= addrs.size


# --- WELL reference string (VERDICT r1 missing #3) -------------------------


def test_well_refstring_exact_counts():
    from spmv_tpu.models import WellMatrix
    from spmv_tpu.perfmodel.refstring import well_spmv_refstring

    mm = poisson2d(16, 16)  # 256 rows, fits 2 groups, no spill
    k = make_kernel("well", mm=mm)
    k.init()
    w = k.matrix
    assert w.spill is None
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    nd = np.asarray(cfg.numa_domains_of_threads())
    a, n = well_spmv_refstring(w, k.layout, 0, 1, nd)
    # per chunk: 8 window starts + 3*8*128 slot refs + 128 y refs
    assert a.size == w.num_chunks * (8 + 3 * 8 * 128 + 128)
    assert a.size == n.size

    # two threads: equal chunk blocks, sizes sum to the single string
    a0, _ = well_spmv_refstring(w, k.layout, 0, 2, nd)
    a1, _ = well_spmv_refstring(w, k.layout, 1, 2, nd)
    assert a0.size + a1.size == a.size


def test_well_refstring_spill_appends_csr_string():
    from spmv_tpu.io.generate import random_sparse
    from spmv_tpu.perfmodel.refstring import well_spmv_refstring

    mm = random_sparse(300, 300, 6, seed=4)
    k = make_kernel("well", mm=mm)
    k.matrix = None
    # force a tiny window so entries spill
    from spmv_tpu.models import WellMatrix
    w = WellMatrix.from_matrix_market(mm, window_rows=1)
    assert w.spill is not None and w.spill.num_entries > 0
    k._premade = w
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    nd = np.asarray(cfg.numa_domains_of_threads())
    a, n = well_spmv_refstring(w, k.layout, 0, 1, nd)
    sp = w.spill
    expected = (
        w.num_chunks * (8 + 3 * 8 * 128 + 128)
        + 3 * sp.num_entries + 2 * sp.num_rows + 1
    )
    assert a.size == expected


def test_well_simulation_mode_end_to_end():
    # `-s well` must now work in simulation mode (cold-cache miss
    # count for a huge cache == number of distinct lines touched).
    from spmv_tpu.perfmodel.cache_sim import LRU
    from spmv_tpu.perfmodel.cache_trace import trace_cache_misses

    mm = poisson2d(12, 12)
    k = make_kernel("well", mm=mm)
    k.init()
    cfg = parse_trace_config(EXAMPLE_CONFIG)
    trace = trace_cache_misses(cfg, k)
    for name, m in trace.cache_misses.items():
        assert m.sum() > 0

    nd = np.asarray(cfg.numa_domains_of_threads())
    a, n = k.memory_reference_string(cfg, 0, 1)
    huge = LRU(1 << 24, 64)
    misses = sum(huge.allocate(int(x)) for x in a)
    assert misses == np.unique(a // 64).size


def test_roofline_rw_rate_and_residency_fold():
    from spmv_tpu.perfmodel.tiling import TPU_V5E, roofline_time

    gb = 10**9
    # resident working set fits: priced at the resident bandwidth
    r = roofline_time(gb, 10**6, machine=TPU_V5E,
                      resident_rw_bytes=100 * 2**20)
    assert r["resident_rw_bytes"] == 100 * 2**20
    assert r["rw_bytes"] == 0
    # too large to stay resident: folded into rw_bytes at the
    # measured same-buffer r+w rate (slower than the read pin rate)
    big = 2 * TPU_V5E.resident_bytes + 2**20
    r2 = roofline_time(gb, 10**6, machine=TPU_V5E,
                       resident_rw_bytes=big)
    assert r2["resident_rw_bytes"] == 0 and r2["rw_bytes"] == big
    expect = gb / (TPU_V5E.hbm_gbps * 1e9) \
        + big / (TPU_V5E.hbm_rw_gbps * 1e9)
    assert abs(r2["time_memory_bound_s"] - expect) < 1e-12
    # r+w bytes cost more than the same bytes read-only
    r3 = roofline_time(gb + big, 10**6, machine=TPU_V5E)
    assert r2["time_memory_bound_s"] > r3["time_memory_bound_s"]


def test_shipped_config_files_parse():
    import pathlib

    from spmv_tpu.perfmodel.trace_config import read_trace_config

    root = pathlib.Path(__file__).resolve().parents[1] / "configs"
    for name in ("cpu-2thread.json", "tpu-v5e-measured.json"):
        cfg = read_trace_config(str(root / name))
        assert cfg.caches and cfg.thread_affinities
        assert cfg.max_cache_size() > 0


def test_refstring_empty_thread_blocks():
    """More threads than rows: trailing threads' ceil-blocks are empty
    and must yield the reference's single row_ptr read, not crash
    (round-2 review, reproduced crash)."""
    from spmv_tpu.io.generate import poisson2d
    from spmv_tpu.kernels import make_kernel
    from spmv_tpu.perfmodel.trace_config import parse_trace_config

    cfg = parse_trace_config({
        "caches": {
            f"L1-{t}": {"size": 4096, "line_size": 64, "parent": None}
            for t in range(4)
        },
        "num_numa_domains": 1,
        "thread_affinities": [
            {"thread": t, "cpu": t, "cache": f"L1-{t}",
             "numa_domain": 0}
            for t in range(4)
        ],
    })
    mm = poisson2d(3, 3)   # 9 rows over 4 threads: last block short
    k = make_kernel("csr", mm=mm)
    k.init()
    sizes = []
    for t in range(4):
        addrs, numas = k.memory_reference_string(cfg, t, 4)
        assert addrs.size == numas.size
        sizes.append(addrs.size)
    assert sizes[0] > 1
    # 9 rows / ceil-block 3 -> threads 0..2 hold rows, thread 3 empty
    assert sizes[3] == 1


def test_trace_config_rejects_bad_thread_ids():
    from spmv_tpu.errors import TraceConfigError
    from spmv_tpu.perfmodel.trace_config import parse_trace_config

    doc = {
        "caches": {"L1": {"size": 4096, "line_size": 64,
                          "parent": None}},
        "num_numa_domains": 1,
        "thread_affinities": [
            {"thread": 1, "cpu": 0, "cache": "L1", "numa_domain": 0},
            {"thread": 2, "cpu": 1, "cache": "L1", "numa_domain": 0},
        ],
    }
    with pytest.raises(TraceConfigError):
        parse_trace_config(doc)
