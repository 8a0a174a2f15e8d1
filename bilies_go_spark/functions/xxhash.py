"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on string columns.

The query engine routes terms to segment partitions with
``pmod(xxhash64(term), n_buckets)`` (operators/index_build.py).  Doing
that mapping driver-side for the handful of query terms saves one whole
Spark job per query — but it must agree bit-for-bit with the JVM hash
the build used, or queries read the wrong bucket.  Spark's xxhash64
applies standard XXH64 to the UTF-8 bytes with seed 42
(org.apache.spark.sql.catalyst.expressions.XxHash64).  Equality with
the JVM implementation is pinned by tests/test_xxhash.py over a few
hundred generated terms.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _MASK, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of ``data`` (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_str_signed(s: str, seed: int = SPARK_DEFAULT_SEED) -> int:
    """Spark-compatible: signed 64-bit xxhash64 of a string column."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_pmod(x: int, m: int) -> int:
    """Spark's ``pmod`` on longs (non-negative result)."""
    r = x % m
    return r + m if r < 0 else r


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of operators.index_build.term_bucket_col."""
    return spark_pmod(xxh64_str_signed(term), n_buckets)
