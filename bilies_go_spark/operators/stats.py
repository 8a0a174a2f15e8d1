"""Corpus / document / term statistics for BM25.

All pure DataFrame aggregations — Catalyst does partial+final
aggregation map-side automatically; `df` (document frequency) is exact
``count(*)`` per term (NOT approx_count_distinct) because BM25 scores
must be rank-identical to the oracle (SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bilies_go_spark.functions.tokenize import tokenize_col


def with_tokens(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus + `tokens` array column (JVM-side analyzer)."""
    return corpus.withColumn("tokens", tokenize_col(text_col))


def doc_stats(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dl) — per-document token count, including dl=0 docs."""
    return corpus.select("doc_id", F.size(tokenize_col(text_col)).alias("dl"))


def term_postings(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, dl) — the raw posting tuples.

    dl rides along with each posting so query-time scoring needs no
    join against a doc-length table (at 10^12 docs a dl lookup join
    would dominate; one extra varint per posting is the cheaper trade).
    """
    toks = corpus.select("doc_id", tokenize_col(text_col).alias("tokens"))
    toks = toks.withColumn("dl", F.size("tokens"))
    return (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — document frequency + collection frequency."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(corpus: DataFrame, text_col: str = "text") -> CorpusStats:
    """Exact integer sum(dl)/N then one float64 division — deterministic
    regardless of partition/summation order (float avgdl drift would
    leak into every BM25 score)."""
    row = doc_stats(corpus, text_col).agg(
        F.count("*").alias("n"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    n = int(row["n"])
    return CorpusStats(n_docs=n, avgdl=(int(row["total_dl"] or 0) / n) if n else 0.0)
