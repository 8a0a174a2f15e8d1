"""Resume-equals-fresh: the ack/replay contract of the reference's
durable queue (/root/reference/requester.go:126-129 ack after success,
/root/reference/queue.go:207-239 prefix delete, cursor rebuild
/root/reference/queue.go:125-128) carried over to lineage checkpoints.
"""

from __future__ import annotations

import pandas as pd
import pytest

from bilies_go_spark.corpus import assign_doc_ids, reference_queries, transcripts_df
from bilies_go_spark.operators.bm25 import brute_force_topk
from bilies_go_spark.operators.index_build import (
    BuildConfig,
    IndexPaths,
    build_index,
    build_runs,
    build_segments,
    finalize_stats,
    write_index_meta,
)
from bilies_go_spark.operators.query import topk
from bilies_go_spark.plans.lineage import Lineage

CFG = dict(n_buckets=4, block_size=32, target_postings_per_salt=300)


@pytest.fixture(scope="module")
def corpus(spark):
    df = assign_doc_ids(transcripts_df(spark, 120, parallelism=4), num_partitions=4)
    df = df.persist()
    df.count()
    return df


def _segments_pdf(spark, d):
    pdf = spark.read.parquet(f"{d}/segments").toPandas()
    pdf = pdf.sort_values(["term", "salt"]).reset_index(drop=True)
    return pdf[sorted(pdf.columns)]


def test_resume_equals_fresh(spark, corpus, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    build_index(spark, corpus, fresh_dir, BuildConfig(**CFG))

    # interrupted build: stop after 2 stage-A chunks and 1 stage-B chunk
    crash_dir = str(tmp_path / "crash")
    cfg = BuildConfig(parts_per_chunk=3, buckets_per_chunk=1, **CFG)
    paths = IndexPaths(crash_dir)
    lin1 = Lineage(crash_dir)
    write_index_meta(paths, cfg)
    n_a = build_runs(spark, corpus, paths, cfg, lin1, max_chunks=2)
    assert n_a == 2
    done_a = lin1.completed(spark, "runs")
    assert 0 < len(done_a) < 31  # genuinely partial

    # "restart": a brand-new Lineage (new run_id) resumes the build
    lin2 = Lineage(crash_dir)
    build_runs(spark, corpus, paths, cfg, lin2)
    n_b = build_segments(spark, paths, cfg, lin2, max_chunks=1)
    assert n_b == 1
    lin3 = Lineage(crash_dir)
    build_segments(spark, paths, cfg, lin3)
    finalize_stats(spark, paths, lin3)

    a = _segments_pdf(spark, fresh_dir)
    b = _segments_pdf(spark, crash_dir)
    pd.testing.assert_frame_equal(a, b)
    sa = spark.read.parquet(f"{fresh_dir}/corpus_stats").collect()[0]
    sb = spark.read.parquet(f"{crash_dir}/corpus_stats").collect()[0]
    assert (sa["n_docs"], sa["avgdl"]) == (sb["n_docs"], sb["avgdl"])

    # and the resumed index answers queries identically
    q = reference_queries().head(10)
    ra = topk(spark, fresh_dir, q).toPandas().sort_values(["query_id", "rank"])
    rb = topk(spark, crash_dir, q).toPandas().sort_values(["query_id", "rank"])
    pd.testing.assert_frame_equal(ra.reset_index(drop=True), rb.reset_index(drop=True))


def test_rerun_completed_build_is_noop(spark, corpus, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, BuildConfig(**CFG))
    before = _segments_pdf(spark, d)
    lin = Lineage(d)
    paths = IndexPaths(d)
    cfg = BuildConfig(**CFG)
    assert build_runs(spark, corpus, paths, cfg, lin) == 0
    assert build_segments(spark, paths, cfg, lin) == 0
    after = _segments_pdf(spark, d)
    pd.testing.assert_frame_equal(before, after)


def test_build_metrics_emitted(spark, corpus, tmp_path):
    """Lineage doubles as the build-metrics table: docs/sec,
    postings/sec, bytes compressed per part (north_star metric set)."""
    d = str(tmp_path / "m")
    build_index(spark, corpus, d, BuildConfig(**CFG))
    m = Lineage(d).metrics(spark).toPandas()
    runs = m[m.stage == "runs"]
    segs = m[m.stage == "segments"]
    assert len(runs) >= 30 and len(segs) == 4
    assert (runs["rows"] > 0).any() and (runs["docs_per_sec"].dropna() > 0).all()
    assert (segs["postings"] > 0).all()
    assert (segs["bytes_out"] > 0).all()
    # engine vs oracle on this corpus for good measure
    q = reference_queries().head(6)
    exp = brute_force_topk(spark, corpus, q).toPandas()
    got = topk(spark, d, q).toPandas()
    assert len(exp) == len(got)
