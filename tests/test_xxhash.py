"""Pin the pure-Python XXH64 to Spark's JVM xxhash64 bit-for-bit.

The query engine routes terms to buckets driver-side with this hash
(functions/xxhash.py); any drift silently reads the wrong segment
partition, so equality is load-bearing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bilies_go_spark.functions.xxhash import term_bucket_py, xxh64_str_signed


def test_xxh64_matches_spark(spark):
    terms = ["", "a", "ab", "abc", "abcd", "the", "tok0001", "émojis🙂", "dup"]
    terms += [f"term-{i}" for i in range(100)]
    terms += ["x" * n for n in (7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65)]
    df = spark.createDataFrame(pd.DataFrame({"t": terms}))
    rows = df.select(
        "t",
        F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(16)).alias("b16"),
        F.pmod(F.xxhash64("t"), F.lit(32)).alias("b32"),
    ).collect()
    for r in rows:
        assert xxh64_str_signed(r["t"]) == r["h"], r["t"]
        assert term_bucket_py(r["t"], 16) == r["b16"]
        assert term_bucket_py(r["t"], 32) == r["b32"]
