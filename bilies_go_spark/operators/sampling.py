"""Deterministic stratified sampling for training-data curation.

A 100 TB pipeline downsamples per stratum (language, source, quality
band) with REPRODUCIBLE membership: re-running the job — or running it
on two clusters — must pick the same rows.  So membership is a pure
hash decision, not RNG state: doc ``d`` is kept in stratum ``s`` iff
``md5('sample:' || d)``'s first 4 hex digits, read as a fraction of
16^4, fall below ``rate(s)``.  The comparison is done on the HEX STRING
(lexicographic == numeric for fixed-width lowercase hex), which makes
the predicate bit-identical across Spark and DuckDB with no float in
sight.  Pure map over the scan — no shuffle, trivially scale-safe; the
same predicate pushes into a WHERE clause to sample at read time.

Reference analogue: none (bilies-go forwards everything) — this is one
of the engine-new curation operators (SURVEY §2.1b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pinned per-stratum keep rates (fraction of docs kept per lang)
SAMPLE_RATES: dict[str, float] = {"en": 0.5}
SAMPLE_DEFAULT_RATE = 0.25
_SALT = "sample:"
_HEX_DIGITS = 4  # 16^4 = 65536 buckets


def _rate_to_hex(rate: float) -> str:
    n = min(max(int(rate * (16**_HEX_DIGITS)), 0), 16**_HEX_DIGITS)
    if n >= 16**_HEX_DIGITS:
        return "g" * _HEX_DIGITS  # > every hex string: keep all
    return format(n, f"0{_HEX_DIGITS}x")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = SAMPLE_DEFAULT_RATE,
    stratum_col: str = "lang",
) -> DataFrame:
    """(doc_id, <stratum>, bucket, keep) — deterministic per-stratum
    sample membership for every doc (filter ``keep`` to materialize)."""
    rates = SAMPLE_RATES if rates is None else rates
    bucket = F.substring(
        F.md5(F.concat(F.lit(_SALT), F.col("doc_id").cast("string"))), 1, _HEX_DIGITS
    )
    thr = F.lit(_rate_to_hex(default_rate))
    for lang, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == lang, F.lit(_rate_to_hex(rate))).otherwise(thr)
    return docs.select(
        "doc_id",
        stratum_col,
        bucket.alias("bucket"),
        (bucket < thr).alias("keep"),
    )


def stratified_sample_oracle(
    table: str = "documents",
    rates: dict[str, float] | None = None,
    default_rate: float = SAMPLE_DEFAULT_RATE,
    stratum_col: str = "lang",
) -> str:
    rates = SAMPLE_RATES if rates is None else rates
    cases = " ".join(
        f"WHEN '{lang}' THEN '{_rate_to_hex(rate)}'" for lang, rate in sorted(rates.items())
    )
    thr = f"CASE {stratum_col} {cases} ELSE '{_rate_to_hex(default_rate)}' END"
    bucket = f"substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, {_HEX_DIGITS})"
    return f"""
SELECT doc_id, {stratum_col},
       {bucket} AS bucket,
       ({bucket} < {thr}) AS keep
FROM {table}
"""
