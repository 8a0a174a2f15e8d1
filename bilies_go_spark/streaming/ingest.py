"""Structured-Streaming ingest: the reference daemon's true Spark twin.

bilies-go IS a streaming ingester: stdin lines -> durable queue ->
batch accumulate (500 rows / 1 s flush) -> bulk POST -> ack
(/root/reference/reader.go:82-116, queue.go:115-205,
batcher.go:76-128, requester.go:126-129).  Structured Streaming gives
every piece natively:

* stdin source + durable queue  -> file/`rate` source + checkpoint WAL
  (offsets survive restarts exactly like the LevelDB read cursor,
  /root/reference/queue.go:125-128);
* batch accumulate-and-flush    -> micro-batches
  (``Trigger.processingTime`` is the 1 s flushDelay,
  ``maxFilesPerTrigger`` the batch-size knob);
* bulk POST + ack               -> ``foreachBatch`` writing posting
  RUNS for the batch (idempotent dynamic-partition overwrite on the
  deterministic part key ``stream-<batch_id>``) then acking lineage —
  at-least-once replay + idempotent overwrite = effective exactly-once,
  the stable-``_id`` argument of /root/reference/batcher.go:91.

Query-side freshness comes from :func:`compact`: invalidate the
segments ledger, re-run the (bucket-chunked, resumable) segment merge
over all runs, refresh corpus stats.  This is the LSM shape: streaming
appends sorted runs, compaction folds them into serving segments —
the same merge machinery the batch build uses (operators/index_build).

Rows must arrive with ``doc_id`` already assigned (streaming global
row_number is ill-defined; at 10^12-turn scale ids come from the
upstream (conv_id, turn_idx) contract, corpus.assign_doc_ids).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bilies_go_spark.operators.index_build import (
    BuildConfig,
    IndexPaths,
    _doc_local_tf,
    _doc_local_tf_pos,
    build_segments,
    build_term_variants,
    encode_segments,
    finalize_stats,
    gc_stale_generations,
    mark_folded,
    pending_folds,
    publish_full_view,
    split_poison,
    write_index_meta,
)
from bilies_go_spark.plans.lineage import Lineage, StageTimer
from bilies_go_spark.sources import tableio

STREAM_PART_FMT = "stream-{batch_id:08d}"


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    paths: IndexPaths,
    cfg: BuildConfig,
    lineage: Lineage,
) -> None:
    """foreachBatch body: one micro-batch -> one runs partition + ack.

    Replays of the same ``batch_id`` (after a crash between write and
    checkpoint commit) overwrite the same partition — idempotent."""
    part = STREAM_PART_FMT.format(batch_id=batch_id)
    tagged = batch_df.withColumn("build_part", F.lit(part))
    clean, poison = split_poison(tagged)
    with StageTimer() as t:
        runs = clean.select("build_part", "doc_id", "text").mapInArrow(
            _doc_local_tf_pos if cfg.positions else _doc_local_tf,
            schema=cfg.runs_schema,
        )
        tableio.write_partitioned(runs, paths.runs, ["build_part"], dynamic_overwrite=True)
        # quarantine keyed on the deterministic stream part + dynamic
        # overwrite: a micro-batch REPLAY after a crash rewrites the
        # same partition instead of appending duplicate poison rows —
        # the same idempotence contract as the runs write above
        tableio.write_partitioned(
            poison, paths.quarantine, ["build_part"], dynamic_overwrite=True
        )
        stats = (
            # schema-pinned read: keeps build_part a raw STRING (no hive
            # partition-type inference), so the part filter and lineage
            # keys always match the written directory names
            spark.read.schema(cfg.runs_schema).parquet(paths.runs)
            .filter(F.col("build_part") == part)
            .groupBy()
            .agg(
                F.count("*").alias("p"),
                F.sum("tf").alias("sum_dl"),
                F.countDistinct("doc_id").alias("n"),
            )
            .collect()[0]
        )
    lineage.ack(
        spark,
        "runs",
        [
            {
                "part": part,
                "rows": stats["n"] or 0,
                "sum_dl": stats["sum_dl"] or 0,
                "postings": stats["p"] or 0,
                "seconds": t.seconds,
            }
        ],
    )
    tableio.commit_snapshot(
        paths.runs, {"stage": "runs", "parts": [part], "run_id": lineage.run_id}
    )


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    cfg: BuildConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
    max_files_per_trigger: int | None = None,
    schema: str | None = None,
) -> StreamingQuery:
    """Tail a directory of transcript parquet files into posting runs.

    ``trigger`` defaults to ``{"availableNow": True}`` (drain-and-stop,
    the EOF behavior of the reference's reader); pass
    ``{"processingTime": "1 second"}`` for the daemon shape with the
    reference's 1 s flush delay.  ``schema`` defaults to the transcripts
    table; any schema with (doc_id bigint, text string) works — the
    ingest only touches those two columns."""
    from bilies_go_spark.corpus import TRANSCRIPTS_SCHEMA

    cfg = cfg or BuildConfig()
    paths = IndexPaths(index_dir)
    lineage = Lineage(index_dir)
    write_index_meta(paths, cfg)
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")

    reader = (
        spark.readStream.schema(schema or (TRANSCRIPTS_SCHEMA + ", doc_id bigint"))
        .option("maxFilesPerTrigger", max_files_per_trigger or 8)
    )
    stream = reader.parquet(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, paths, cfg, lineage)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def compact(spark: SparkSession, index_dir: str, cfg: BuildConfig | None = None) -> None:
    """Fold all runs (batch-built + streamed) into serving segments —
    ATOMICALLY for concurrent readers.

    The full merge builds generation N+1's segments *beside* the live
    generation N (same resumable bucket-chunked merge the batch build
    uses), then flips the ``_current.json`` pointer in one rename: a
    ``QueryEngine`` constructed at any instant sees either the complete
    old view (gen N + its tiers + its stats) or the complete new view
    (gen N+1, no tiers) — never a half-rewritten base or a stale tier
    list double-counting postings.  Crash-safe: until the flip, readers
    keep the old view; a re-run rebuilds the same target generation
    (idempotent overwrite).  Generations retired by the PREVIOUS
    compaction are garbage-collected here (one-full-cycle grace for
    live engines)."""
    if cfg is None:
        from bilies_go_spark.operators.query import load_index_meta

        meta = load_index_meta(index_dir)
        cfg = BuildConfig(
            n_buckets=meta["n_buckets"],
            block_size=meta["block_size"],
            target_postings_per_salt=meta["target_postings_per_salt"],
            positions=meta.get("positions", False),
            serving_cache=meta.get("serving_cache", True),
            serving_cache_min_df=meta.get("serving_cache_min_df", 1000),
        )
    paths = IndexPaths(index_dir)
    gc_stale_generations(paths)
    target = paths.at_gen(paths.read_current()["gen"] + 1)
    lineage = Lineage(index_dir)
    lineage.invalidate(spark, "segments")
    build_segments(spark, target, cfg, lineage)
    build_term_variants(spark, target.term_stats, target.term_variants, cfg)
    stats = finalize_stats(spark, target, lineage)
    if cfg.positions and cfg.serving_cache:
        from bilies_go_spark.operators.index_build import build_pos_cache

        # the new generation's artifact builds BESIDE the live one;
        # readers see it only after the pointer flip below
        build_pos_cache(spark, target, cfg, stats["n_docs"])
    publish_full_view(spark, target, lineage, stats)


#: fold threshold: when a delta fold would leave more than this many
#: tiers, the existing tiers merge with the new delta into ONE tier —
#: the LSM leveling step.  Queries union base + tiers, so an unbounded
#: tier count would degrade every query; K bounds it while keeping
#: per-batch cost O(batch + folded-tier volume), never O(index).
MAX_TIERS = 4


def compact_tiered(
    spark: SparkSession,
    index_dir: str,
    cfg: BuildConfig | None = None,
    max_tiers: int = MAX_TIERS,
) -> str | None:
    """Incremental (LSM-tiered) compaction: encode the runs parts not
    yet folded into any segment tier as a new delta tier the query
    engine unions with the base segments; when that would exceed
    ``max_tiers`` tiers, merge the existing tiers INTO the new one
    (leveling), so a long-running stream never accumulates unbounded
    tiers.

    This is the per-batch serving-freshness path at scale: a streaming
    batch costs O(batch) — amortized O(batch + tier volume / K) with
    leveling — never O(index); :func:`compact` (the full merge into a
    new base generation) remains the periodic history fold.
    Correctness rests on the append-only doc_id contract (upstream ids
    are unique, corpus.assign_doc_ids): tiers are doc-disjoint, so each
    (term, doc) still appears in exactly one segment row and the
    kernel's merge semantics are unchanged; global df per term is the
    SUM over base + tiers (aggregated query-side).

    Atomic for readers: the new tier becomes visible ONLY via the
    single ``_current.json`` pointer replace, which simultaneously
    retires merged tiers and updates corpus stats — no window where a
    reader sees a tier whose parts are also counted elsewhere, or stats
    out of step with the tier list.  Idempotent: the tier id is a hash
    of the covered part set and the tier write is a full overwrite — a
    crashed run re-executes into the same tier.  Returns the tier id,
    or None if nothing was pending.
    """
    import hashlib

    if cfg is None:
        from bilies_go_spark.operators.query import load_index_meta

        meta = load_index_meta(index_dir)
        cfg = BuildConfig(
            n_buckets=meta["n_buckets"],
            block_size=meta["block_size"],
            target_postings_per_salt=meta["target_postings_per_salt"],
            positions=meta.get("positions", False),
        )
    paths = IndexPaths(index_dir)
    lineage = Lineage(index_dir)
    pending = pending_folds(spark, lineage)
    if not pending:
        return None
    cur = paths.read_current()
    keep, merge = cur["tiers"], []
    if len(cur["tiers"]) + 1 > max_tiers:
        # leveling: merge-fold every tier whose part set is known into
        # the new tier (unknown part sets — pre-pointer indexes — are
        # left in place; a full compact retires them)
        merge = [t for t in cur["tiers"] if t.get("parts")]
        keep = [t for t in cur["tiers"] if not t.get("parts")]
    parts = sorted(set(pending) | {p for t in merge for p in t["parts"]})
    tier = hashlib.md5("\x00".join(parts).encode()).hexdigest()[:12]
    # crash-replay guard: if a previous run published this tier but
    # died before mark_folded, the re-run sees the same pending parts,
    # hashes to the SAME tier id — and that id may already sit in the
    # keep list.  Drop it before re-appending, or readers would union
    # the tier's segments twice (df and postings double-counted).
    keep = [t for t in keep if t["id"] != tier]
    runs_delta = (
        spark.read.schema(cfg.runs_schema)
        .parquet(paths.runs)
        .filter(F.col("build_part").isin(parts))
        .drop("build_part")
    )
    # docs deleted while their part was still pending have no negative
    # df delta (deletes.py: delta_counted=false) — drop them physically
    # as the part folds so they never acquire a positive df either
    from bilies_go_spark.operators.deletes import read_uncounted_deleted_ids

    unc = read_uncounted_deleted_ids(paths, lineage)
    if unc.size:
        import pandas as pd

        dd = spark.createDataFrame(
            pd.DataFrame({"doc_id": unc.astype("int64")}), schema="doc_id bigint"
        )
        runs_delta = runs_delta.join(F.broadcast(dd), "doc_id", "left_anti")
    with StageTimer() as t:
        encode_segments(
            spark, runs_delta, paths.tier_segments(tier), paths.tier_term_stats(tier), cfg
        )
        # the tier's NEW terms join the fuzzy dictionary too (variant
        # roots union like the stats roots)
        build_term_variants(
            spark, paths.tier_term_stats(tier), paths.tier_term_variants(tier), cfg
        )
    # stats BEFORE the pointer flip and the folded ack: finalize_stats
    # derives purely from the runs ledger (safe to run early), the
    # pointer publishes tier list + stats in ONE rename, and a crash
    # between flip and ack re-runs into the identical tier id
    stats = finalize_stats(spark, paths, lineage)
    paths.write_current(
        {
            "gen": cur["gen"],
            "tiers": keep + [{"id": tier, "parts": parts}],
            "deletes": cur.get("deletes", []),  # tombstones stay live
            "stats": stats,
        }
    )
    lineage.ack(
        spark,
        "segments",
        [{"part": f"tier-{tier}", "seconds": t.seconds}],
    )
    mark_folded(spark, lineage, pending)
    tableio.commit_snapshot(
        paths.root, {"stage": "compact_tiered", "tier": tier, "parts": parts}
    )
    return tier
