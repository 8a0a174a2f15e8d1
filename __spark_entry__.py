"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the VByte posting-segment index over
the sf0.001 ``documents`` table and answer the fixed BM25 query set
with the block-max pruned kernel.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the training-data-pipeline suite); every SQL-expressible
entry has a DuckDB oracle with identical column names, round(·,6)
DOUBLE floats, and rounded-score ranking (see
bilies_go_spark/functions/portable.py for the portability rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bilies_go_spark import driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full index build +
    block-max pruned BM25 top-k (rank-identical to the SQL oracle)."""
    return driver_queries.bm25_indexed(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in driver_queries.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in driver_queries.registry().items()
        if sql is not None
    }
