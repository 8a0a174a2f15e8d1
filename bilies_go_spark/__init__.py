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

__version__ = "0.3.0"

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

_prefaulted = 0


def prefault_heap(n_bytes: int = 384 * 1024 * 1024) -> bool:
    """Pre-fault the malloc heap (MADV_HUGEPAGE + MADV_POPULATE_WRITE)
    so per-query numpy temporaries never hit first-touch page faults.

    On this VM class a first touch costs ~0.4 ms/page (~28 s to fault
    256 MB by writing) while hugepage-assisted POPULATE_WRITE populates
    ~7 ms/MB; the block must stay BELOW the raised mmap threshold
    (_tune_malloc) so it lives in the brk arena and the pages survive
    the free (trim threshold keeps them) — later allocations then reuse
    warm pages at ~3 ms/384 MB.  Call once before a latency-sensitive
    serving loop (QueryEngine does this automatically).  Idempotent up
    to the high watermark; BGS_PREFAULT_MB overrides the size, 0
    disables."""
    global _prefaulted
    import ctypes
    import os

    env = os.environ.get("BGS_PREFAULT_MB")
    if env is not None:
        n_bytes = int(env) * 1024 * 1024
    if n_bytes <= _prefaulted:
        return False
    try:
        import numpy as np

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        a = np.empty(n_bytes, dtype=np.uint8)
        addr = a.ctypes.data
        page = 4096
        aligned = (addr + page - 1) // page * page
        size = (n_bytes - (aligned - addr)) // page * page
        MADV_HUGEPAGE, MADV_POPULATE_WRITE = 14, 23
        libc.madvise(ctypes.c_void_p(aligned), ctypes.c_size_t(size), MADV_HUGEPAGE)
        rc = libc.madvise(
            ctypes.c_void_p(aligned), ctypes.c_size_t(size), MADV_POPULATE_WRITE
        )
        if rc != 0:  # pre-5.14 kernel: fall back to strided touch
            a[::page] = 1
        del a
        _prefaulted = n_bytes
        return True
    except Exception:
        return False
