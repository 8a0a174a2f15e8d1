"""End-to-end corpus curation: the keep/drop decision table.

Composes the suite's primitives into the decision a training-data
pipeline actually materializes per document:

* ``is_canonical`` — the doc is its exact-dup group's keeper
  (min doc_id over the md5 token-stream fingerprint — the same
  stable-identity-wins contract as :func:`dedup.exact_groups`);
* ``good_quality`` — composite quality score ≥ a pinned threshold
  (:func:`textstats.quality_scores`; tokenless docs score 0);
* ``sampled`` — deterministic per-stratum hash sample membership
  (:func:`sampling.stratified_sample`);
* ``kept`` — the conjunction: what survives into the training corpus.

One row per input document with every intermediate flag, so the drop
REASONS are auditable (the per-item failure-report discipline of the
reference's quarantine, applied to curation).  Plan shape: one
tokenizing scan feeding three column pipelines + one groupBy on the
32-byte fingerprint — no joins wider than (doc_id) equality, scale-safe
at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bilies_go_spark.functions.portable import ROUND_DIGITS, duck_round, duck_tokens
from bilies_go_spark.functions.tokenize import tokenize_col
from bilies_go_spark.operators import sampling, textstats

QUALITY_KEEP_THRESHOLD = 0.55  # ~median of the fixture quality distribution


def curated_corpus(docs: DataFrame, quality_threshold: float = QUALITY_KEEP_THRESHOLD) -> DataFrame:
    """(doc_id, lang, quality, is_canonical, good_quality, sampled, kept)."""
    fp = docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", tokenize_col("text"))).alias("fingerprint"),
    )
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_doc_id"))
    q = textstats.quality_scores(docs).select("doc_id", "quality")
    s = sampling.stratified_sample(docs).select(
        "doc_id", "lang", F.col("keep").alias("sampled")
    )
    out = (
        fp.join(canon, "fingerprint")
        .join(q, "doc_id", "left")
        .join(s, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.round(F.coalesce("quality", F.lit(0.0)), ROUND_DIGITS).alias("quality"),
            (F.col("doc_id") == F.col("keep_doc_id")).alias("is_canonical"),
            (F.coalesce("quality", F.lit(0.0)) >= quality_threshold).alias("good_quality"),
            "sampled",
        )
    )
    return out.withColumn(
        "kept", F.col("is_canonical") & F.col("good_quality") & F.col("sampled")
    )


def curated_corpus_oracle(
    table: str = "documents", quality_threshold: float = QUALITY_KEEP_THRESHOLD
) -> str:
    quality = textstats.quality_scores_oracle(table).strip()
    sample = sampling.stratified_sample_oracle(table).strip()
    return f"""
WITH fp AS (
  SELECT doc_id, md5(array_to_string({duck_tokens()}, ' ')) AS fingerprint FROM {table}
),
canon AS (SELECT fingerprint, min(doc_id) AS keep_doc_id FROM fp GROUP BY 1),
q AS ({quality}),
s AS ({sample})
SELECT fp.doc_id, s.lang,
       {duck_round('coalesce(q.quality, 0.0)')} AS quality,
       (fp.doc_id = canon.keep_doc_id) AS is_canonical,
       (coalesce(q.quality, 0.0) >= {quality_threshold}) AS good_quality,
       s.keep AS sampled,
       ((fp.doc_id = canon.keep_doc_id)
        AND coalesce(q.quality, 0.0) >= {quality_threshold}
        AND s.keep) AS kept
FROM fp
JOIN canon ON canon.fingerprint = fp.fingerprint
LEFT JOIN q ON q.doc_id = fp.doc_id
JOIN s ON s.doc_id = fp.doc_id
"""
