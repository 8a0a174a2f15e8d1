"""bilies_go_spark — a PySpark-native inverted-index builder + BM25 top-k
query engine over multi-turn conversation/agent transcripts.

A from-scratch reimagining (NOT a port) of the semantics of
``Adirelle/bilies-go`` (a Go daemon that durably queues JSON log records
and bulk-loads them into Elasticsearch, see /root/reference/main.go:26):

* batched accumulate-and-flush bulk loading  -> per-partition posting-
  segment construction (operators/index_build.py)
* durable LevelDB queue + ack-after-success  -> lineage manifest +
  resumable builds (plans/lineage.py)
* bisect-on-400 poison isolation             -> quarantine table
* per-stage metrics registry                 -> build-metrics DataFrame
* date-suffix index routing                  -> term-bucket partitioned
  segment layout + salted repartition for hot-term skew

Everything is DataFrame-first: Catalyst handles scans, filters, joins,
aggregation and shuffle; custom logic (VByte codec, block-max WAND) lives
in vectorized Arrow/pandas UDF stages only.
"""

__version__ = "0.1.0"

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def _tune_malloc(threshold: int = 512 * 1024 * 1024) -> bool:
    """Raise glibc's mmap/trim thresholds so large numpy temporaries
    reuse heap pages instead of mmap/fault/munmap cycles.

    On this class of VM a fresh 50 MB allocation costs ~0.8 s in page
    faults vs ~9 ms from a reused heap (90x) — and the query kernel and
    Arrow UDF workers allocate multi-MB temporaries per call.  Runs in
    every process that imports the package (driver and Python workers).
    Set BGS_NO_MALLOC_TUNE=1 to disable."""
    import ctypes
    import os

    if os.environ.get("BGS_NO_MALLOC_TUNE"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, threshold)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, threshold)  # M_TRIM_THRESHOLD
        return True
    except Exception:
        return False


_tune_malloc()
