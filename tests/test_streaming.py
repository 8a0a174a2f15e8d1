"""Streaming ingest + compaction: the daemon contract, end to end.

Covers the reference's pipeline semantics re-expressed in Structured
Streaming (streaming/ingest.py): micro-batch runs append with
idempotent partition overwrite, checkpointed resume, lineage acks per
batch, LSM-style compaction, and — the acceptance bar — the streamed
index answers queries rank-identically to a batch-built index over the
same rows.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import QueryEngine
from bilies_go_spark.plans.lineage import Lineage
from bilies_go_spark.streaming.ingest import compact, start_ingest

CFG = BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200)


@pytest.fixture(scope="module")
def source_dir(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    # several files so the stream sees multiple micro-batches
    small_corpus.repartition(6).write.mode("overwrite").parquet(d)
    return d


@pytest.fixture(scope="module")
def streamed_index(spark, source_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_idx"))
    q = start_ingest(spark, source_dir, d, CFG, max_files_per_trigger=2)
    q.awaitTermination(300)
    compact(spark, d, CFG)
    return d


def test_stream_batches_acked(spark, streamed_index):
    lin = Lineage(streamed_index).read(spark)
    runs = lin.filter("stage = 'runs' AND status = 'done'").select("part").distinct()
    parts = sorted(r["part"] for r in runs.collect())
    assert len(parts) >= 2, parts  # multiple micro-batches
    assert all(p.startswith("stream-") for p in parts)


def test_streamed_equals_batch_index(spark, small_corpus, streamed_index, tmp_path_factory):
    batch_idx = str(tmp_path_factory.mktemp("batch_idx"))
    build_index(spark, small_corpus, batch_idx, CFG)
    queries = reference_queries().head(20)
    key = ["query_id", "rank"]
    a = (
        QueryEngine(spark, streamed_index).topk_pandas(queries)
        .sort_values(key).reset_index(drop=True)
    )
    b = (
        QueryEngine(spark, batch_idx).topk_pandas(queries)
        .sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_restart_is_idempotent(spark, source_dir, streamed_index, tmp_path_factory):
    """Re-starting the drained stream processes nothing new (the
    checkpoint WAL is the read cursor) and leaves results unchanged."""
    before = QueryEngine(spark, streamed_index).topk_pandas(reference_queries().head(5))
    q = start_ingest(spark, source_dir, streamed_index, CFG, max_files_per_trigger=2)
    q.awaitTermination(300)
    after = QueryEngine(spark, streamed_index).topk_pandas(reference_queries().head(5))
    pd.testing.assert_frame_equal(before, after)


def test_compact_after_new_data(spark, small_corpus, source_dir, tmp_path_factory):
    """New rows streamed after a compaction are visible after the next
    compaction — and the result matches a batch build over the union."""
    d = str(tmp_path_factory.mktemp("grow_idx"))
    src = str(tmp_path_factory.mktemp("grow_src"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    half1.repartition(2).write.mode("overwrite").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)
    n1 = QueryEngine(spark, d).n_docs
    # stream the second half into the same index
    half2.repartition(2).write.mode("append").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)
    eng = QueryEngine(spark, d)
    assert eng.n_docs > n1
    batch_idx = str(tmp_path_factory.mktemp("grow_batch"))
    build_index(spark, small_corpus, batch_idx, CFG)
    queries = reference_queries().head(12)
    key = ["query_id", "rank"]
    a = eng.topk_pandas(queries).sort_values(key).reset_index(drop=True)
    b = (
        QueryEngine(spark, batch_idx).topk_pandas(queries)
        .sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_ingest_gauges_and_percentiles(spark, source_dir, tmp_path_factory):
    """Live gauges DURING the run (reference queue gauges,
    /root/reference/queue.go:241-278) + percentile straggler view over
    the ack ledger (/root/reference/metrics.go:146-154)."""
    import time

    from bilies_go_spark.plans.gauges import (
        attach_gauges,
        detach_gauges,
        stage_percentiles,
    )

    d = str(tmp_path_factory.mktemp("gauge_idx"))
    g = attach_gauges(spark)
    try:
        q = start_ingest(spark, source_dir, d, CFG, max_files_per_trigger=2)
        q.awaitTermination(300)
        # listener events are delivered asynchronously — poll briefly
        for _ in range(40):
            if len([r for r in g.rows if r["num_input_rows"] > 0]) >= 2:
                break
            time.sleep(0.25)
    finally:
        detach_gauges(spark, g)
    assert g.started
    batches = [r for r in g.rows if r["num_input_rows"] > 0]
    assert len(batches) >= 2, g.rows  # one gauge row per micro-batch
    assert all(r["processed_rows_per_sec"] >= 0 for r in batches)
    assert sorted({r["batch_id"] for r in batches}) == list(range(len({r["batch_id"] for r in batches})))

    compact(spark, d, CFG)
    p = stage_percentiles(spark, Lineage(d)).toPandas().set_index("stage")
    assert {"runs", "segments"} <= set(p.index)
    assert (p["p95_seconds"] >= p["p50_seconds"]).all()
    assert int(p.loc["runs", "n_parts"]) >= 2
    assert (p["p50_docs_per_sec"] > 0).any()


def test_tiered_compaction_equals_batch(spark, small_corpus, tmp_path_factory):
    """Incremental compaction: a streamed second half is folded as a
    DELTA tier (base segments untouched), the engine unions base+tier
    with summed df, and results are rank-identical to a batch build
    over the full corpus; a later FULL compact folds the tier away
    without changing results."""
    from bilies_go_spark.operators.index_build import IndexPaths
    from bilies_go_spark.operators.query import QueryEngine
    from bilies_go_spark.sources.tableio import read_snapshots
    from bilies_go_spark.streaming.ingest import compact_tiered

    d = str(tmp_path_factory.mktemp("tier_idx"))
    src = str(tmp_path_factory.mktemp("tier_src"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    half1.repartition(2).write.mode("overwrite").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)  # full base build over half1 (gen 1)
    paths = IndexPaths(d)
    assert paths.read_tiers() == []
    base_dir = paths.at_gen(paths.read_current()["gen"]).segments
    base_files_before = set(read_snapshots(base_dir)[-1]["files"])

    half2.repartition(2).write.mode("append").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    tier = compact_tiered(spark, d, CFG)
    assert tier is not None
    assert paths.read_tiers() == [tier]
    # the delta path never rewrote the base segments (same generation,
    # identical file set)
    import os

    assert paths.at_gen(paths.read_current()["gen"]).segments == base_dir
    base_files_after = {
        os.path.relpath(os.path.join(r, f), base_dir)
        for r, _, fs in os.walk(base_dir)
        for f in fs
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    }
    assert base_files_before == base_files_after
    # idempotence: nothing pending on a second run
    assert compact_tiered(spark, d, CFG) is None

    batch_idx = str(tmp_path_factory.mktemp("tier_batch"))
    build_index(spark, small_corpus, batch_idx, CFG)
    queries = reference_queries().head(16)
    key = ["query_id", "rank"]
    a = QueryEngine(spark, d).topk_pandas(queries).sort_values(key).reset_index(drop=True)
    b = (
        QueryEngine(spark, batch_idx)
        .topk_pandas(queries)
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # distributed path unions tiers identically
    dist = (
        QueryEngine(spark, d)
        .topk_distributed(queries.head(5))
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, a[a["query_id"] < 5].reset_index(drop=True))

    compact(spark, d, CFG)  # periodic full merge folds the tier away
    assert paths.read_tiers() == []
    c = QueryEngine(spark, d).topk_pandas(queries).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(c, b)


def test_events_windowed_agg_runs_under_readstream(spark, sf_dir, tmp_path_factory):
    """The tumbling-window aggregation the driver gates as a batch
    query (driver_queries.q_events_windowed) runs UNCHANGED as a
    Structured-Streaming query: readStream over the same parquet with
    a watermark, drained with availableNow, must produce the exact
    batch result (append mode emits only watermark-closed windows;
    draining a finite source closes them all)."""
    import os

    from pyspark.sql import functions as F

    src = os.path.join(sf_dir, "events.parquet")
    # watermarks require TIMESTAMP (fixture ts is TIMESTAMP_NTZ); cast
    # identically on both sides and compare on epoch seconds
    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_timestamp("w.start").alias("win_start"), "event_type", "n_events")
        .toPandas()
    )
    schema = spark.read.parquet(src).schema
    out = str(tmp_path_factory.mktemp("ev_sink"))
    ck = str(tmp_path_factory.mktemp("ev_ck"))
    # file-stream sources tail a DIRECTORY; the fixture is a single file
    src_dir = str(tmp_path_factory.mktemp("ev_src"))
    import shutil

    shutil.copy(src, os.path.join(src_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_timestamp("w.start").alias("win_start"), "event_type", "n_events")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas()
    # append mode emits exactly the WATERMARK-CLOSED windows: a window
    # [s, s+1h) is final iff s+1h <= max(ts) - 2h.  The open tail
    # windows are withheld — that IS the late-data contract.
    max_ts = (
        spark.read.parquet(src)
        .agg(F.unix_timestamp(F.max("ts").cast("timestamp")))
        .collect()[0][0]
    )
    closed = batch[batch["win_start"] + 3600 <= max_ts - 7200]
    assert 0 < len(closed) < len(batch)  # some tail windows still open
    key = ["win_start", "event_type"]
    a = got.sort_values(key).reset_index(drop=True)
    b = closed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[key + ["n_events"]], b[key + ["n_events"]])


def test_compact_is_atomic_for_concurrent_readers(spark, small_corpus, tmp_path_factory):
    """Serve-while-compacting: engines constructed at ANY instant while
    a full compact runs must answer from a complete committed view —
    either base+tier (pre-flip) or the folded new generation
    (post-flip), never a mix.  A torn view (new base + stale tier list)
    would double-count postings and shift BM25 scores, failing the
    frame equality."""
    import threading

    from bilies_go_spark.operators.index_build import IndexPaths
    from bilies_go_spark.streaming.ingest import compact_tiered

    d = str(tmp_path_factory.mktemp("atomic_idx"))
    src = str(tmp_path_factory.mktemp("atomic_src"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    half1.repartition(2).write.mode("overwrite").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)
    half2.repartition(2).write.mode("append").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    assert compact_tiered(spark, d, CFG) is not None  # base + 1 tier

    queries = reference_queries().head(8)
    key = ["query_id", "rank"]
    expected = (
        QueryEngine(spark, d).topk_pandas(queries).sort_values(key).reset_index(drop=True)
    )
    errs: list[Exception] = []

    def run_compact():
        try:
            compact(spark, d, CFG)  # folds the tier into a new generation
        except Exception as e:  # surfaced in the main thread below
            errs.append(e)

    t = threading.Thread(target=run_compact)
    t.start()
    checks = 0
    try:
        while True:
            got = (
                QueryEngine(spark, d)
                .topk_pandas(queries)
                .sort_values(key)
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, expected)
            checks += 1
            if not t.is_alive():
                break
    finally:
        t.join()
    assert not errs, errs
    assert checks >= 2  # at least one mid-compact + one post-compact read
    assert IndexPaths(d).read_tiers() == []  # the flip folded the tier


def test_tier_count_bounded_by_leveling(spark, small_corpus, tmp_path_factory):
    """A long-running stream with per-batch compact_tiered never
    accumulates more than max_tiers tiers (the leveling merge folds
    existing tiers into the new one), and results stay rank-identical
    to a batch build over the same rows throughout."""
    from bilies_go_spark.operators.index_build import IndexPaths
    from bilies_go_spark.streaming.ingest import compact_tiered

    d = str(tmp_path_factory.mktemp("level_idx"))
    src = str(tmp_path_factory.mktemp("level_src"))
    paths = IndexPaths(d)
    n_slices, max_tiers = 6, 2
    for i in range(n_slices):
        mode = "overwrite" if i == 0 else "append"
        small_corpus.filter(F.col("doc_id") % n_slices == i).repartition(1).write.mode(
            mode
        ).parquet(src)
        q = start_ingest(spark, src, d, CFG)
        q.awaitTermination(300)
        assert compact_tiered(spark, d, CFG, max_tiers=max_tiers) is not None
        assert len(paths.read_tiers()) <= max_tiers
    # 6 folds but <=2 tiers -> leveling merged at least once
    assert len(paths.read_tiers()) <= max_tiers

    batch_idx = str(tmp_path_factory.mktemp("level_batch"))
    build_index(spark, small_corpus, batch_idx, CFG)
    queries = reference_queries().head(12)
    key = ["query_id", "rank"]
    a = QueryEngine(spark, d).topk_pandas(queries).sort_values(key).reset_index(drop=True)
    b = (
        QueryEngine(spark, batch_idx)
        .topk_pandas(queries)
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_serve_while_ingest_delete_compact_triangle(
    spark, small_corpus, tmp_path_factory
):
    """The serve-while-ingest-while-delete triangle: a reader
    constructing fresh engines at arbitrary instants while the index
    concurrently streams new docs, folds a delta tier, tombstones
    docs, and fully compacts must ONLY ever observe committed states —
    each answer equals a batch-built oracle for exactly one of
    {base-only, base+streamed, post-delete}, never a torn mix (a
    half-published tier or stats/tombstones out of step would match no
    oracle and fail)."""
    import threading

    from bilies_go_spark.operators.deletes import delete_docs
    from bilies_go_spark.streaming.ingest import compact_tiered

    d = str(tmp_path_factory.mktemp("tri_idx"))
    src = str(tmp_path_factory.mktemp("tri_src"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    half1.repartition(2).write.mode("overwrite").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)  # committed state S0: half1 served

    queries = reference_queries().head(6)
    key = ["query_id", "rank"]

    def canon(pdf):
        return (
            pdf.sort_values(key)
            .reset_index(drop=True)
            .round(9)
            .to_csv(index=False)
        )

    def oracle(corpus, tag):
        o = str(tmp_path_factory.mktemp(f"tri_oracle_{tag}"))
        build_index(spark, corpus, o, CFG)
        return canon(QueryEngine(spark, o).topk_pandas(queries))

    s0 = oracle(half1, "s0")
    s1 = oracle(small_corpus, "s1")
    import io

    s1_pdf = pd.read_csv(io.StringIO(s1))
    victims = sorted(set(s1_pdf[s1_pdf["rank"] == 1]["doc_id"].astype(int)))[:3]
    s2 = oracle(small_corpus.filter(~F.col("doc_id").isin(victims)), "s2")
    states = {s0: "S0", s1: "S1", s2: "S2"}

    stop = threading.Event()
    seen: list[str] = []
    errs: list[str] = []

    def reader():
        while not stop.is_set():
            got = canon(QueryEngine(spark, d).topk_pandas(queries))
            if got in states:
                seen.append(states[got])
            else:
                errs.append(got[:400])
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        # the mutation storm, all while the reader loops
        half2.repartition(2).write.mode("append").parquet(src)
        q = start_ingest(spark, src, d, CFG)
        q.awaitTermination(300)          # S0 still (pending parts unserved)
        assert compact_tiered(spark, d, CFG) is not None   # -> S1
        assert delete_docs(spark, d, victims) is not None  # -> S2
        compact(spark, d, CFG)           # purge; answers stay S2
    finally:
        stop.set()
        t.join()
    assert not errs, f"reader observed a torn state:\n{errs[0]}"
    assert len(seen) >= 3
    # the reader must have crossed at least one state transition, and
    # transitions only move forward (S0 -> S1 -> S2)
    order = {"S0": 0, "S1": 1, "S2": 2}
    assert all(order[a] <= order[b] for a, b in zip(seen, seen[1:])), seen
    final = canon(QueryEngine(spark, d).topk_pandas(queries))
    assert states.get(final) == "S2"


def test_events_sessionized_runs_under_readstream(spark, sf_dir, tmp_path_factory):
    """The session-window aggregation the driver gates as a batch query
    (driver_queries.q_events_sessionized) runs UNCHANGED as a stateful
    Structured-Streaming query: readStream + watermark + session_window
    in append mode, drained with availableNow, emits exactly the
    watermark-closed sessions of the batch result — the canonical
    stateful-sessionization deployment shape."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = os.path.join(sf_dir, "events.parquet")

    def sessions(df):
        # expects ts already cast to TIMESTAMP (watermark must be set
        # on the same column instance — a re-cast would drop it)
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.unix_timestamp("w.start").alias("s_start"),
                F.unix_timestamp("w.end").alias("s_end"),
                "user_id",
                "n_events",
            )
        )

    batch = sessions(
        spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))
    ).toPandas()
    schema = spark.read.parquet(src).schema
    src_dir = str(tmp_path_factory.mktemp("sess_src"))
    shutil.copy(src, os.path.join(src_dir, "events.parquet"))
    stream = sessions(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
    )
    out = str(tmp_path_factory.mktemp("sess_sink"))
    ck = str(tmp_path_factory.mktemp("sess_ck"))
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out).toPandas()
    max_ts = (
        spark.read.parquet(src)
        .agg(F.unix_timestamp(F.max("ts").cast("timestamp")))
        .collect()[0][0]
    )
    # append emits sessions whose window end precedes the final
    # watermark; the open tail sessions are withheld (late-data
    # contract), exactly like the tumbling-window twin above
    closed = batch[batch["s_end"] <= max_ts - 7200]
    assert 0 < len(closed) < len(batch)
    key = ["user_id", "s_start"]
    a = got.sort_values(key).reset_index(drop=True)
    b = closed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[key + ["s_end", "n_events"]], b[key + ["s_end", "n_events"]]
    )
