"""Text-analysis operators: token counting, quality scoring, language ID.

All pure Catalyst column expressions over the ``documents`` corpus —
array/higher-order functions (JVM, whole-stage codegen), zero Python in
the data path, so the plan is a single parquet scan + project with
column pruning (only ``doc_id``/``text``/``lang`` are read).

Each operator has a DuckDB oracle twin built from the same pinned
constants (functions/portable.py); float outputs are round(·, 6) cast
to DOUBLE in both engines.

Reference analogue: the reference validates/normalizes but never
inspects payload content (/root/reference/reader.go:141-152); these
operators are the content-aware extension a training-data pipeline
needs (quality filtering, language routing, token accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bilies_go_spark.functions.portable import (
    ROUND_DIGITS,
    TOKEN_SPLIT_RE,
    duck_round,
    duck_stopword_list,
    duck_tokens,
    spark_stopword_array,
)
from bilies_go_spark.functions.tokenize import tokenize_col

# Language-ID decision constants (pinned across engines)
LID_STOP_RATIO_MIN = 0.05
LID_MIN_TOKENS = 5

_WS_RE = "\\s+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_ws_tokens, n_chars) — analyzer tokens vs
    whitespace tokens vs raw characters."""
    return docs.select(
        "doc_id",
        F.size(tokenize_col(text_col)).alias("n_tokens"),
        F.size(
            F.filter(F.split(F.col(text_col), _WS_RE), lambda t: t != F.lit(""))
        ).alias("n_ws_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def token_counts_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len({duck_tokens()}) AS n_tokens,
       len(list_filter(regexp_split_to_array(text, '{_WS_RE}'), x -> x <> '')) AS n_ws_tokens,
       length(text) AS n_chars
FROM {table}
"""


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, alnum_ratio, stop_ratio, mean_tok_len, quality).

    * ``alnum_ratio``  — [a-z0-9] chars / all chars of lower(text)
    * ``stop_ratio``   — stopword token occurrences / tokens
    * ``mean_tok_len`` — mean token length
    * ``quality``      — 0.5·min(n_tokens,200)/200 + 0.3·alnum_ratio
                         + 0.2·(1 − min(2·stop_ratio, 1))
    """
    tk = docs.select("doc_id", F.col(text_col).alias("text"), tokenize_col(text_col).alias("tk"))
    tk = tk.filter(F.size("tk") > 0)
    stop = spark_stopword_array()
    return tk.select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
            / F.length("text"),
            ROUND_DIGITS,
        ).alias("alnum_ratio"),
        F.round(
            F.expr(f"size(filter(tk, t -> array_contains({stop}, t)))") / F.size("tk"),
            ROUND_DIGITS,
        ).alias("stop_ratio"),
        F.round(
            F.expr("aggregate(tk, CAST(0 AS BIGINT), (a, t) -> a + length(t))") / F.size("tk"),
            ROUND_DIGITS,
        ).alias("mean_tok_len"),
        F.round(
            F.least(F.size("tk"), F.lit(200)) / F.lit(200.0) * 0.5
            + (
                F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
                / F.length("text")
            )
            * 0.3
            + (
                F.lit(1.0)
                - F.least(
                    F.expr(f"size(filter(tk, t -> array_contains({stop}, t)))")
                    / F.size("tk")
                    * 2.0,
                    F.lit(1.0),
                )
            )
            * 0.2,
            ROUND_DIGITS,
        ).alias("quality"),
    )


def quality_scores_oracle(table: str = "documents") -> str:
    tk = duck_tokens()
    stops = duck_stopword_list()
    alnum = "(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) * 1.0 / length(text))"
    stopr = f"(len(list_filter(tk, t -> list_contains({stops}, t))) * 1.0 / len(tk))"
    return f"""
WITH t AS (SELECT doc_id, text, {tk} AS tk FROM {table})
SELECT doc_id,
       len(tk) AS n_tokens,
       {duck_round(alnum)} AS alnum_ratio,
       {duck_round(stopr)} AS stop_ratio,
       {duck_round('(list_sum(list_transform(tk, t -> length(t))) * 1.0 / len(tk))')} AS mean_tok_len,
       {duck_round(f'least(len(tk), 200) / 200.0 * 0.5 + {alnum} * 0.3 + (1.0 - least({stopr} * 2.0, 1.0)) * 0.2')} AS quality
FROM t WHERE len(tk) > 0
"""


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, stop_ratio, pred_lang) — stopword-ratio heuristic
    language ID: 'en' iff stop_ratio >= 0.05 over >= 5 tokens.

    A real pipeline swaps in an n-gram model behind the same column
    contract; the decision plumbing (threshold + min-evidence) is what
    this operator pins down.
    """
    stop = spark_stopword_array()
    tk = docs.select("doc_id", "lang", tokenize_col(text_col).alias("tk")).filter(
        F.size("tk") > 0
    )
    ratio = F.expr(f"size(filter(tk, t -> array_contains({stop}, t)))") / F.size("tk")
    return tk.select(
        "doc_id",
        "lang",
        F.round(ratio, ROUND_DIGITS).alias("stop_ratio"),
        F.when(
            (ratio >= LID_STOP_RATIO_MIN) & (F.size("tk") >= LID_MIN_TOKENS), "en"
        )
        .otherwise("unk")
        .alias("pred_lang"),
    )


def language_id_oracle(table: str = "documents") -> str:
    stops = duck_stopword_list()
    ratio = f"(len(list_filter(tk, t -> list_contains({stops}, t))) * 1.0 / len(tk))"
    return f"""
WITH t AS (SELECT doc_id, lang, {duck_tokens()} AS tk FROM {table})
SELECT doc_id, lang,
       {duck_round(ratio)} AS stop_ratio,
       CASE WHEN {ratio} >= {LID_STOP_RATIO_MIN} AND len(tk) >= {LID_MIN_TOKENS}
            THEN 'en' ELSE 'unk' END AS pred_lang
FROM t WHERE len(tk) > 0
"""
