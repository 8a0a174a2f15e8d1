"""Tokenizer equivalence: Catalyst expr == pandas UDF == pure Python ==
DuckDB regexp_split — all four paths must agree or rank-identity dies."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from bilies_go_spark.functions.tokenize import (
    duckdb_tokens_sql,
    tokenize_col,
    tokenize_pandas_udf,
    tokenize_py,
)

CASES = [
    "Hello, World!",
    "the  quick   brown\tfox\njumps",
    "",
    "   ",
    "...!!!",
    "a",
    "MiXeD CaSe 123abc 456",
    "tab\tsep\nnewline\r\nret",
    "trailing space ",
    " leading",
    "punct,comma.dot;semi:colon",
    "unicode café naïve",  # non-ascii letters act as separators (pinned)
    "numbers 007 42x7",
]


def test_py_tokenizer_basics():
    assert tokenize_py("Hello, World!") == ["hello", "world"]
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("...") == []
    assert tokenize_py("a1B2") == ["a1b2"]


def test_spark_paths_match_python(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": CASES}))
    got = (
        df.select(
            "text",
            tokenize_col("text").alias("builtin"),
            tokenize_pandas_udf("text").alias("pandas"),
        )
        .toPandas()
        .set_index("text")
    )
    for case in CASES:
        expected = tokenize_py(case)
        assert list(got.loc[case, "builtin"]) == expected, case
        assert list(got.loc[case, "pandas"]) == expected, case


def test_duckdb_tokens_match_python():
    con = duckdb.connect()
    pdf = pd.DataFrame({"doc_id": range(len(CASES)), "text": CASES})
    con.register("t", pdf)
    sql = duckdb_tokens_sql("t")
    got = con.sql(f"SELECT doc_id, term FROM ({sql}) WHERE term <> '' ORDER BY doc_id").df()
    expected = []
    for i, case in enumerate(CASES):
        expected += [(i, t) for t in tokenize_py(case)]
    got_pairs = list(got.itertuples(index=False, name=None))
    assert sorted(got_pairs) == sorted(expected)


def test_tokenize_col_stays_jvm_side(spark):
    """The hot-path tokenizer must not appear as a Python UDF in the plan."""
    df = spark.createDataFrame(pd.DataFrame({"text": CASES}))
    plan = df.select(F.explode(tokenize_col("text")).alias("t"))._sc  # noqa: SLF001 — just touch
    explained = df.select(
        F.explode(tokenize_col("text")).alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in explained  # no BatchEvalPython / ArrowEvalPython stage
