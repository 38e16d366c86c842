"""Performance-model subsystem.

Two complementary models, mirroring and extending the reference:

1. **Cache-hierarchy trace simulation** (the reference's headline
   feature): synthesize each thread's exact memory reference string for
   a kernel, replay the interleaved strings through a simulated
   multi-level private/shared cache hierarchy (LRU/FIFO/RAND) and
   report misses per thread per NUMA domain
   (reference: src/cache-trace.cpp, src/cache-simulation/).
   The hot replay loop runs in C++ (csrc/simcache.cpp) with a pure
   Python fallback; reference strings are generated vectorized in
   numpy over a *virtual* page-aligned address space.

2. **TPU HBM<->VMEM tiling / roofline model**: the TPU-native analogue —
   per (matrix, format, tiling) compute the HBM traffic lower bound,
   the achievable x-block reuse given the VMEM budget, a roofline time
   target, and per-shard local/remote (ICI) byte counts
   (SURVEY.md section 7, step 4).
"""

from spmv_tpu.perfmodel.trace_config import (
    Cache,
    ThreadAffinity,
    TraceConfig,
    read_trace_config,
    parse_trace_config,
)
from spmv_tpu.perfmodel.cache_sim import (
    LRU,
    FIFO,
    RAND,
    trace_cache_misses_single,
    trace_cache_misses_interleaved,
)
from spmv_tpu.perfmodel.layout import VirtualLayout, thread_of_index
from spmv_tpu.perfmodel.cache_trace import CacheTrace, trace_cache_misses
from spmv_tpu.perfmodel.tiling import (
    TpuMachineModel,
    spmv_traffic_model,
    roofline_time,
)
from spmv_tpu.perfmodel.scaling import SpmvScalingModel, spmv_scaling_model

__all__ = [
    "Cache",
    "ThreadAffinity",
    "TraceConfig",
    "read_trace_config",
    "parse_trace_config",
    "LRU",
    "FIFO",
    "RAND",
    "trace_cache_misses_single",
    "trace_cache_misses_interleaved",
    "VirtualLayout",
    "thread_of_index",
    "CacheTrace",
    "trace_cache_misses",
    "TpuMachineModel",
    "spmv_traffic_model",
    "roofline_time",
    "SpmvScalingModel",
    "spmv_scaling_model",
]
