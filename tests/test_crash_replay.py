"""Crash-replay durability: every window between a data write and its
ack/publish must be safe to re-run.

The reference's write-then-ack queue contract
(/root/reference/queue.go:115-155, requester.go:126-129) means a crash
never loses an acked record and never double-counts a replayed one.
These tests kill each stage of ours at the worst instant and re-run:

* compact_tiered published the tier but died before mark_folded — the
  replay must NOT list the tier twice (double-counted df/postings);
* delete_docs died after writing batch dirs but before the ledger ack —
  the retry must still perform the delete (bare dirs are not a delete);
* delete_docs died after the ack but before the pointer publish — the
  retry must heal (publish from the ledger), not drop the delete;
* a SECOND full compaction must not resurrect docs purged by the
  first (the append-only runs table still contains them);
* deleting a doc whose runs part is not yet folded must neither NaN
  the scores (negative df) nor lose the delete when the part folds.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.deletes import delete_docs
from bilies_go_spark.operators.index_build import BuildConfig, IndexPaths, build_index
from bilies_go_spark.operators.query import QueryEngine
from bilies_go_spark.streaming.ingest import compact, compact_tiered, start_ingest

CFG = BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200)
KEY = ["query_id", "rank"]


def _topk(spark, idx, queries):
    return (
        QueryEngine(spark, idx)
        .topk_pandas(queries)
        .sort_values(KEY)
        .reset_index(drop=True)
    )


def _halves_streamed_base(spark, small_corpus, tmp_path_factory, tag):
    """Base generation built from the even half; odd half streamed in
    but NOT yet folded.  Returns (index_dir, source_dir)."""
    d = str(tmp_path_factory.mktemp(f"{tag}_idx"))
    src = str(tmp_path_factory.mktemp(f"{tag}_src"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    half1.repartition(2).write.mode("overwrite").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    compact(spark, d, CFG)
    half2.repartition(2).write.mode("append").parquet(src)
    q = start_ingest(spark, src, d, CFG)
    q.awaitTermination(300)
    return d, src


def test_compact_tiered_replay_no_duplicate_tier(
    spark, small_corpus, tmp_path_factory, monkeypatch
):
    """Crash window: write_current published tier X, died before
    mark_folded.  The replay sees the same pending parts, derives the
    SAME tier id, and must replace — not duplicate — the pointer entry
    (a duplicate makes the engine union X's segments twice)."""
    import bilies_go_spark.streaming.ingest as ingest_mod

    d, _src = _halves_streamed_base(spark, small_corpus, tmp_path_factory, "duptier")
    paths = IndexPaths(d)

    # simulate the crash: suppress the folded ack of the first fold
    monkeypatch.setattr(ingest_mod, "mark_folded", lambda *a, **k: None)
    t1 = compact_tiered(spark, d, CFG)
    assert t1 is not None
    assert [t["id"] for t in paths.read_current()["tiers"]] == [t1]
    monkeypatch.undo()

    t2 = compact_tiered(spark, d, CFG)  # the replay
    assert t2 == t1  # same pending set -> same deterministic tier id
    tier_ids = [t["id"] for t in paths.read_current()["tiers"]]
    assert tier_ids == [t1], f"tier listed twice: {tier_ids}"

    batch_idx = str(tmp_path_factory.mktemp("duptier_batch"))
    build_index(spark, small_corpus, batch_idx, CFG)
    queries = reference_queries().head(10)
    pd.testing.assert_frame_equal(
        _topk(spark, d, queries), _topk(spark, batch_idx, queries)
    )


@pytest.fixture()
def built_index(spark, small_corpus, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cr_idx"))
    build_index(spark, small_corpus, idx, CFG)
    return idx


def _victims_and_rebuild(spark, small_corpus, idx, tmp_path_factory, tag):
    queries = reference_queries().head(8)
    before = _topk(spark, idx, queries)
    victims = sorted(set(before[before["rank"] == 1]["doc_id"].astype(int)))[:3]
    rebuilt = str(tmp_path_factory.mktemp(f"{tag}_rebuilt"))
    build_index(
        spark, small_corpus.filter(~F.col("doc_id").isin(victims)), rebuilt, CFG
    )
    return queries, victims, rebuilt


def test_delete_crash_before_ack_is_retried(
    spark, small_corpus, built_index, tmp_path_factory, monkeypatch
):
    """Batch dirs on disk WITHOUT a ledger ack are a crashed write, not
    a delete: the retry must re-run the delete, not no-op."""
    from bilies_go_spark.plans.lineage import Lineage

    idx = built_index
    queries, victims, rebuilt = _victims_and_rebuild(
        spark, small_corpus, idx, tmp_path_factory, "preack"
    )

    real_ack = Lineage.ack

    def dying_ack(self, spark_, stage, parts):
        if stage == "deletes":
            raise RuntimeError("crash before ack")
        return real_ack(self, spark_, stage, parts)

    monkeypatch.setattr(Lineage, "ack", dying_ack)
    with pytest.raises(RuntimeError, match="crash before ack"):
        delete_docs(spark, idx, victims)
    monkeypatch.undo()
    # nothing committed: the index still serves the victims
    assert set(_topk(spark, idx, queries)[lambda x: x["rank"] == 1]["doc_id"].astype(int)) & set(
        victims
    )

    batch = delete_docs(spark, idx, victims)  # the retry
    assert batch is not None, "retry treated crashed dirs as already-deleted"
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), _topk(spark, rebuilt, queries))


def test_delete_crash_before_publish_is_healed(
    spark, small_corpus, built_index, tmp_path_factory, monkeypatch
):
    """Acked but never published (crash between ledger ack and pointer
    flip): the next delete_docs call must publish it from the ledger."""
    import bilies_go_spark.operators.deletes as del_mod

    idx = built_index
    queries, victims, rebuilt = _victims_and_rebuild(
        spark, small_corpus, idx, tmp_path_factory, "prepub"
    )

    monkeypatch.setattr(
        del_mod, "_publish", lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    with pytest.raises(RuntimeError, match="crash"):
        delete_docs(spark, idx, victims)
    monkeypatch.undo()
    # tombstones not yet live: pointer knows nothing
    assert IndexPaths(idx).read_current()["deletes"] == []

    # the replay heals: batch already acked -> returns None, but the
    # pointer must now carry the batch and answers must match a rebuild
    assert delete_docs(spark, idx, victims) is None
    assert [d["id"] for d in IndexPaths(idx).read_current()["deletes"]]
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), _topk(spark, rebuilt, queries))


def test_second_full_compact_does_not_resurrect_purged_docs(
    spark, small_corpus, built_index, tmp_path_factory
):
    """The runs table keeps deleted docs forever (append-only); a
    rebuild that anti-joined only POINTER-LIVE delete batches would
    bring purged docs back in the generation after the purge."""
    idx = built_index
    queries, victims, rebuilt = _victims_and_rebuild(
        spark, small_corpus, idx, tmp_path_factory, "resurrect"
    )
    assert delete_docs(spark, idx, victims) is not None
    expected = _topk(spark, rebuilt, queries)
    compact(spark, idx, CFG)  # purge; pointer clears the live delete set
    assert IndexPaths(idx).read_current()["deletes"] == []
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), expected)
    compact(spark, idx, CFG)  # rebuild from runs AGAIN — must stay purged
    got = _topk(spark, idx, queries)
    assert not set(got["doc_id"].astype(int)) & set(victims), "purged docs resurrected"
    pd.testing.assert_frame_equal(got, expected)


def test_delete_in_pending_part_folds_away(spark, small_corpus, tmp_path_factory):
    """Deleting a doc whose runs part is NOT yet folded: no negative df
    delta may be published for it (summed df would go negative -> NaN
    idf); instead the doc must be physically dropped when its part
    folds into a tier — and the final answers must equal a rebuild
    without both victims."""
    import numpy as np

    d, _src = _halves_streamed_base(spark, small_corpus, tmp_path_factory, "pendel")
    queries = reference_queries().head(8)
    served = _topk(spark, d, queries)  # serves the folded half only
    folded_victim = int(served[served["rank"] == 1]["doc_id"].iloc[0])
    assert folded_victim % 2 == 0
    # any odd doc id lives in the still-pending streamed half
    pending_victim = int(
        small_corpus.filter(F.col("doc_id") % 2 == 1).agg(F.min("doc_id")).collect()[0][0]
    )
    batch = delete_docs(spark, d, [folded_victim, pending_victim])
    assert batch is not None

    mid = _topk(spark, d, queries)
    assert folded_victim not in set(mid["doc_id"].astype(int))
    assert np.isfinite(mid["score"].to_numpy()).all(), "negative df -> NaN idf"

    assert compact_tiered(spark, d, CFG) is not None  # folds the pending half
    got = _topk(spark, d, queries)
    assert not {folded_victim, pending_victim} & set(got["doc_id"].astype(int))
    assert np.isfinite(got["score"].to_numpy()).all()

    rebuilt = str(tmp_path_factory.mktemp("pendel_rebuilt"))
    build_index(
        spark,
        small_corpus.filter(~F.col("doc_id").isin([folded_victim, pending_victim])),
        rebuilt,
        CFG,
    )
    pd.testing.assert_frame_equal(got, _topk(spark, rebuilt, queries))
    # full compact purges everything; replay stays a no-op
    compact(spark, d, CFG)
    pd.testing.assert_frame_equal(_topk(spark, d, queries), _topk(spark, rebuilt, queries))
    assert delete_docs(spark, d, [folded_victim, pending_victim]) is None
