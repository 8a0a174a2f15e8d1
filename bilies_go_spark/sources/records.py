"""The reference's wire format as a Spark source: JSON-lines records.

bilies-go reads one JSON record per line from stdin:
``{"id": <string?>, "date": "YYYY.MM.DD", "log": <raw JSON>}``
(/root/reference/reader.go:23-27, data/inputRecord.go:27-31).  This
module is that ingest chain, column-for-column, as declarative Spark:

| reference step | here |
|---|---|
| trim + drop lines of len<=1 (reader.go:103,111) | `rtrim` + length filter |
| JSON decode, 3-field projection (reader.go:134-137) | `from_json` with a fixed schema; `log` kept as raw passthrough text (`json.RawMessage` analogue) |
| invalid JSON -> drop + count (reader.go:136) | rejects table, reason='invalid_json' |
| require date & log (reader.go:141-144) | rejects, reason='missing_date' / 'missing_log' |
| empty id -> time-UUID (reader.go:146-152) | `uuid()` by default; deterministic md5 surrogate under `deterministic_ids=True` (tests/replays need stable ids — same motivation as the doc_id rank in corpus.py) |

Charset fallback (reader.go:104-110) is a non-goal: Spark file sources
are UTF-8 (SURVEY.md §2.1 S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = "id string, date string, log string"


def parse_records(
    lines: DataFrame,
    line_col: str = "value",
    deterministic_ids: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """lines -> (records, rejects).

    records: (id, suffix, document) — the reference's Record struct
    (data/record.go:24-28): id, date-derived index suffix, raw payload.
    rejects: (line, reason) — the per-stage error-counting surface
    (reader.go:57-60) as a table instead of meters.
    """
    trimmed = lines.select(F.rtrim(F.col(line_col)).alias("line"))
    nonempty = trimmed.filter(F.length("line") > 1)

    parsed = nonempty.withColumn("rec", F.from_json("line", RECORD_SCHEMA))
    # PERMISSIVE from_json returns a struct of nulls for bad JSON, so
    # malformed lines are detected with an explicit try-parse probe
    reason = (
        F.when(F.expr("try_parse_json(line)").isNull(), "invalid_json")
        .when(F.col("rec.date").isNull() | (F.col("rec.date") == ""), "missing_date")
        .when(F.col("rec.log").isNull() | (F.col("rec.log") == ""), "missing_log")
        .otherwise(None)
    )
    tagged = parsed.withColumn("reason", reason)
    rejects = tagged.filter(F.col("reason").isNotNull()).select("line", "reason")

    id_fallback = (
        F.md5(F.concat_ws("\x00", "rec.date", "rec.log"))
        if deterministic_ids
        else F.expr("uuid()")
    )
    records = (
        tagged.filter(F.col("reason").isNull())
        .select(
            F.when(
                F.col("rec.id").isNull() | (F.col("rec.id") == ""), id_fallback
            )
            .otherwise(F.col("rec.id"))
            .alias("id"),
            F.col("rec.date").alias("suffix"),
            F.col("rec.log").alias("document"),
        )
    )
    return records, rejects


def read_jsonl(
    spark: SparkSession, path: str, deterministic_ids: bool = False
) -> tuple[DataFrame, DataFrame]:
    """File-based stand-in for the stdin source (S1): one record per line."""
    return parse_records(spark.read.text(path), "value", deterministic_ids)


def bulk_actions(
    records: DataFrame,
    index_prefix: str = "logs",
    doc_type: str = "logs",
) -> DataFrame:
    """ES `_bulk` action formatting — the exact 2-line wire format of
    /root/reference/batcher.go:91: action header with `_id`,
    time-partitioned `_index` = '<prefix>-<suffix>', then the payload.

    Kept as a sink-format function for drop-in compatibility with an
    Elasticsearch writer; the in-engine pipeline indexes the payload
    itself instead of shipping it.  The header is built with
    ``to_json`` so ids containing quotes/backslashes are escaped as
    valid JSON (raw concat would emit a malformed action line).

    A NULL id fails LOUDLY (``raise_error``): ``to_json`` would silently
    drop the ``_id`` field, and a header without ``_id`` makes
    Elasticsearch auto-generate one — breaking the stable-``_id``
    idempotence/replay contract this module documents
    (/root/reference/batcher.go:91).  parse_records always fills ids,
    so only foreign callers can hit this."""
    checked_id = F.when(
        F.col("id").isNull(),
        F.raise_error(F.lit("bulk_actions: record with NULL id (stable-_id contract)")),
    ).otherwise(F.col("id"))
    header = F.to_json(
        F.struct(
            F.struct(
                checked_id.alias("_id"),
                F.concat(F.lit(index_prefix), F.lit("-"), F.col("suffix")).alias("_index"),
                F.lit(doc_type).alias("_type"),
            ).alias("index")
        )
    )
    return records.select(
        "id",
        "suffix",
        F.concat(header, F.lit("\n"), F.col("document"), F.lit("\n")).alias("action"),
    )
