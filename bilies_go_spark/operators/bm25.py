"""BM25 scoring — shared formula + the brute-force top-k oracle.

The oracle (Milestone 0 of SURVEY.md §7) scores EVERY matching document
with no pruning; the indexed engine (operators/query.py) must be
rank-identical to it.  The reference itself delegates retrieval to
Elasticsearch, so this oracle *is* the reference engine for tests.

Float discipline: float64 everywhere; per-(query, doc) term scores are
summed in ascending-term order in BOTH the oracle (sort_array +
F.aggregate) and the engine (numpy over term-sorted streams) so
summation order cannot reorder near-ties (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bilies_go_spark import B_DEFAULT, K1_DEFAULT
from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.stats import CorpusStats, term_postings, term_stats


def idf(df: int, n_docs: int) -> float:
    """Robertson-Sparck-Jones idf, the Lucene/ES variant:
    ln(1 + (N - df + 0.5) / (df + 0.5)) — always positive."""
    return math.log1p((n_docs - df + 0.5) / (df + 0.5))


def idf_np(dfs: np.ndarray, n_docs: int) -> np.ndarray:
    return np.log1p((n_docs - dfs + 0.5) / (dfs + 0.5))


def tf_norm_np(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT
) -> np.ndarray:
    """tf * (k1+1) / (tf + k1 * (1 - b + b * (dl / avgdl))), float64.

    Expression shape is pinned: any reimplementation must keep the
    exact operation order for bit-level agreement with the oracle.
    """
    tfs = tfs.astype(np.float64)
    dls = dls.astype(np.float64)
    return (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * (dls / avgdl)))


def query_terms_df(spark: SparkSession, queries: pd.DataFrame) -> DataFrame:
    """(query_id, term, k) — tokenized, DEDUPLICATED query terms.

    BM25 here ignores query-side term frequency (repeated terms score
    once) — pinned behavior shared by oracle and engine.
    """
    rows = []
    for r in queries.itertuples(index=False):
        for t in sorted(set(tokenize_py(r.text))):
            rows.append((int(r.query_id), t, int(r.k)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["query_id", "term", "k"]),
        schema="query_id bigint, term string, k int",
    )


def brute_force_scores(
    spark: SparkSession,
    corpus: DataFrame,
    queries: pd.DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    stats: CorpusStats | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Full no-pruning BM25 score table: (query_id, doc_id, score, k)
    for every candidate document of every query (no rank/limit — the
    callers pick their ranking discipline)."""
    from bilies_go_spark.operators.stats import corpus_stats as _cs

    st = stats or _cs(corpus)
    post = postings if postings is not None else term_postings(corpus)
    tstats = term_stats(post)
    qterms = query_terms_df(spark, queries)

    # broadcast the tiny query-term set against the postings
    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(tstats), "term")
        .withColumn(
            "tscore",
            F.log1p(
                (F.lit(float(st.n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * (
                (F.col("tf").cast("double") * F.lit(k1 + 1.0))
                / (
                    F.col("tf").cast("double")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * (F.col("dl").cast("double") / F.lit(st.avgdl))
                    )
                )
            ),
        )
    )
    # deterministic summation order: collect per-term scores, sort by
    # term, fold left in float64
    return (
        scored.groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "tscore"))),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x["tscore"],
            ).alias("score"),
            F.first("k").alias("k"),
        )
    )


def brute_force_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: pd.DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    stats: CorpusStats | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """No-pruning BM25 top-k: score every candidate doc of every query.

    Returns (query_id, rank, doc_id, score); rank is 1-based, ordered
    by (score desc, doc_id asc) — doc_id ascending is the pinned tie
    break (FIXTURES.md §3).
    """
    agg = brute_force_scores(spark, corpus, queries, k1, b, stats, postings)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )
