"""Host-side utilities: sample statistics and JSON report output.

TPU-native replacements for the reference's src/util/ layer.  The pieces
of that layer that exist only to work around missing C++ runtime features
(zlib/tar streambufs, the hand-rolled C JSON parser, the circular buffer)
are covered by the Python standard library (gzip / tarfile / json) and by
the native cache-simulation core in csrc/; the pieces that define report
*semantics* (sample statistics, NaN-tolerant indented JSON) are
reimplemented here so the report shapes match.
"""

from spmv_tpu.utils.sample import Sample, compute_sample
from spmv_tpu.utils.jsonio import dump_json, json_dumps
from spmv_tpu.utils.compilecache import enable_persistent_cache
from spmv_tpu.utils.aotcache import aot_call

__all__ = ["Sample", "compute_sample", "dump_json", "json_dumps",
           "enable_persistent_cache", "aot_call"]
