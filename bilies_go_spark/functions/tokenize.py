"""Analyzer: lowercase + split on non-alphanumeric runs.

This is the single canonical tokenization used by the whole engine
(index build, query parsing, brute-force oracle, DuckDB oracle SQL) —
any drift between paths breaks rank-identity, so every variant here is
pinned to the same regex and covered by equality tests.

Reference analogue: the reference never tokenizes (its payload is
opaque passthrough bytes, /root/reference/data/inputRecord.go:27-31);
its normalization chain is charset-fix + trim + validate
(/root/reference/reader.go:103-152).  We inherit the *shape* — a cheap,
locale-independent, vectorized normalization applied before anything
else — and make it a real analyzer because this engine must index text.

Three equivalent implementations:

* :func:`tokenize_col` — pure Catalyst column expression (JVM-side,
  whole-stage-codegen'd).  The hot path for the index build.
* :func:`tokenize_pandas_udf` — Arrow-vectorized pandas UDF.  Exists to
  satisfy the pandas-UDF analyzer surface and as the seam where a
  heavier analyzer (stemming, ICU) would plug in without touching the
  build pipeline.
* :func:`tokenize_py` — plain-Python reference used only by tests.

All are ASCII-oriented: tokens are maximal ``[a-z0-9]+`` runs of the
lowercased text.  DuckDB equivalent (for oracle SQL)::

    unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) ... <> ''
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical separator pattern. Java/RE2/Python/DuckDB all agree on this
# character class, which is why we restrict ourselves to it.
TOKEN_SPLIT_RE = "[^a-z0-9]+"

_PY_SPLIT = re.compile(TOKEN_SPLIT_RE)


def tokenize_col(col: Column | str) -> Column:
    """JVM-side tokenizer: array<string> of non-empty lowercase tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE),
        lambda t: t != F.lit(""),
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer (pd.Series.str ops, no per-row Python)."""
    lowered = texts.fillna("").str.lower()
    split = lowered.str.split(_PY_SPLIT)
    # Drop empty tokens produced by leading/trailing separators.
    return split.map(lambda toks: [t for t in toks if t])


def tokenize_py(text: str | None) -> list[str]:
    """Plain-Python reference implementation (tests only)."""
    if text is None:
        return []
    return [t for t in _PY_SPLIT.split(text.lower()) if t]


def duckdb_tokens_sql(table: str, doc_id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB subquery producing (doc_id, term) pairs — the oracle-side
    twin of ``select(doc_id, explode(tokenize_col(text)))``."""
    return (
        f"SELECT {doc_id_col} AS doc_id, "
        f"unnest(regexp_split_to_array(lower({text_col}), '{TOKEN_SPLIT_RE}')) AS term "
        f"FROM {table}"
    )


_PY_TOKEN = re.compile("[a-z0-9]+")


def token_offsets_py(text: str | None) -> list[tuple[int, int]]:
    """Char span ``(start, end)`` (0-based, end-exclusive) of each token
    in the ORIGINAL text — the i-th span belongs to the i-th token of
    :func:`tokenize_py`.  Tokens are maximal ``[a-z0-9]+`` runs of the
    lowercased text, and ASCII lowercasing is length-preserving, so
    match offsets on ``text.lower()`` index the raw string directly.
    Used by the highlighter's char-offset surface; the DuckDB oracle
    reconstructs the same spans from ``regexp_extract_all`` + cumulative
    separator lengths."""
    if text is None:
        return []
    return [(m.start(), m.end()) for m in _PY_TOKEN.finditer(text.lower())]
