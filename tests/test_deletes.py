"""Tombstones (operators/deletes.py): delete / upsert semantics.

The contract under test: after delete_docs, EVERY query path (driver
serving, distributed, sharded, conjunctive) answers exactly as an index
REBUILT from the corpus minus the deleted docs — i.e. not just masked
doc ids, but exact df / n_docs / avgdl adjustments (BM25 scores are
df-sensitive, so a lazy mask-only implementation fails the frame
equality).  Full compaction purges tombstones physically and clears the
live delete set without changing answers; replays are no-ops.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.deletes import delete_docs, read_deleted_ids
from bilies_go_spark.operators.index_build import BuildConfig, IndexPaths, build_index
from bilies_go_spark.operators.query import QueryEngine

CFG = BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200)
KEY = ["query_id", "rank"]


def _topk(spark, idx, queries, **kw):
    return (
        QueryEngine(spark, idx, **kw)
        .topk_pandas(queries)
        .sort_values(KEY)
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def deleted_setup(spark, small_corpus, tmp_path_factory):
    """One index with tombstones + the ground-truth rebuild."""
    idx = str(tmp_path_factory.mktemp("del_idx"))
    build_index(spark, small_corpus, idx, CFG)
    queries = reference_queries().head(10)
    before = _topk(spark, idx, queries)
    # victims: the top-ranked doc of each query -> guaranteed visible
    victims = sorted(set(before[before["rank"] == 1]["doc_id"].astype(int)))
    assert len(victims) >= 3
    batch = delete_docs(spark, idx, victims)
    assert batch is not None

    rebuilt = str(tmp_path_factory.mktemp("del_rebuilt"))
    build_index(
        spark, small_corpus.filter(~F.col("doc_id").isin(victims)), rebuilt, CFG
    )
    return idx, rebuilt, victims, queries


def test_deleted_docs_vanish_and_scores_match_rebuild(spark, deleted_setup):
    idx, rebuilt, victims, queries = deleted_setup
    got = _topk(spark, idx, queries)
    assert not set(got["doc_id"].astype(int)) & set(victims)
    expected = _topk(spark, rebuilt, queries)
    # exact equality: doc ids AND scores -> df / n_docs / avgdl all net
    pd.testing.assert_frame_equal(got, expected)


def test_deletes_respected_by_distributed_and_sharded(spark, deleted_setup):
    idx, rebuilt, _victims, queries = deleted_setup
    expected = _topk(spark, rebuilt, queries)
    dist = (
        QueryEngine(spark, idx)
        .topk_distributed(queries)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dist, expected)
    shard = (
        QueryEngine(spark, idx)
        .topk_sharded(queries, n_shards=4)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(shard, expected)


def test_deletes_respected_by_conjunctive(spark, deleted_setup):
    idx, rebuilt, _victims, queries = deleted_setup
    a = (
        QueryEngine(spark, idx)
        .topk_conjunctive(queries)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    b = (
        QueryEngine(spark, rebuilt)
        .topk_conjunctive(queries)
        .toPandas()
        .sort_values(KEY)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_delete_replay_is_noop_and_compact_purges(spark, deleted_setup):
    from bilies_go_spark.streaming.ingest import compact

    idx, rebuilt, victims, queries = deleted_setup
    expected = _topk(spark, rebuilt, queries)
    # replay: already-tombstoned ids must not double-subtract stats
    assert delete_docs(spark, idx, victims) is None
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), expected)

    compact(spark, idx, CFG)  # physical purge + pointer clears deletes
    paths = IndexPaths(idx)
    assert paths.read_current()["deletes"] == []
    assert read_deleted_ids(paths).size == 0  # live set empty
    eng = QueryEngine(spark, idx)
    assert eng.deleted is None  # kernels run mask-free post-purge
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), expected)
    # re-deleting a historically purged id stays a no-op (all-batches
    # idempotence guard) — stats must not drift
    assert delete_docs(spark, idx, victims[:1]) is None
    pd.testing.assert_frame_equal(_topk(spark, idx, queries), expected)


def test_suggest_phrases_paths_agree_with_deletes(
    spark, small_corpus, tmp_path_factory
):
    """ADVICE r5 (medium): the phrase suggester's distributed and
    sharded paths must mask tombstones exactly like mode='local'
    (whose cached keys bake them in) — adjacency counts over a
    deleted-docs index must equal a rebuild without those docs."""
    from bilies_go_spark.functions.tokenize import tokenize_py

    cfg = BuildConfig(
        n_buckets=8, block_size=32, target_postings_per_salt=200,
        positions=True, serving_cache_min_df=5,
    )
    idx = str(tmp_path_factory.mktemp("sugg_del_idx"))
    build_index(spark, small_corpus, idx, cfg)
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    # delete one-third of the docs containing the bigram "the of" so
    # the adjacency counts visibly change
    bigram_docs = sorted(
        int(r.doc_id)
        for r in corpus_pdf.itertuples(index=False)
        if "the of" in " ".join(tokenize_py(r.text))
    )
    victims = bigram_docs[:: 3]
    assert victims
    assert delete_docs(spark, idx, victims) is not None

    qs = pd.DataFrame({"query_id": [0], "text": ["the of"]})
    eng = QueryEngine(spark, idx)
    key = ["query_id", "rank"]
    dist = eng.suggest_phrases(qs, n_top=5).toPandas()
    loc = eng.suggest_phrases(qs, n_top=5, mode="local").toPandas()
    shd = eng.suggest_phrases(qs, n_top=5, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        dist.sort_values(key).reset_index(drop=True),
        loc.sort_values(key).reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(
        shd.sort_values(key).reset_index(drop=True),
        loc.sort_values(key).reset_index(drop=True),
    )
    # ground truth: rebuild without the victims answers identically
    rebuilt = str(tmp_path_factory.mktemp("sugg_del_rebuilt"))
    build_index(
        spark, small_corpus.filter(~F.col("doc_id").isin(victims)), rebuilt, cfg
    )
    exp = QueryEngine(spark, rebuilt).suggest_phrases(qs, n_top=5).toPandas()
    pd.testing.assert_frame_equal(
        dist.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )


def test_suggest_completions_drops_fully_deleted_terms(
    spark, small_corpus, tmp_path_factory
):
    """ADVICE r5 (low): a term whose every posting is tombstoned
    (net df <= 0) must not be suggested by the completion suggester."""
    from bilies_go_spark.functions.tokenize import tokenize_py

    cfg = BuildConfig(
        n_buckets=8, block_size=32, target_postings_per_salt=200,
        positions=True, serving_cache_min_df=5,
    )
    idx = str(tmp_path_factory.mktemp("comp_del_idx"))
    build_index(spark, small_corpus, idx, cfg)
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    df: dict[str, set] = {}
    for r in corpus_pdf.itertuples(index=False):
        for t in set(tokenize_py(r.text)):
            df.setdefault(t, set()).add(int(r.doc_id))
    # pick a rare 'to…' term and delete every doc containing it
    rare = sorted(
        (len(d), t) for t, d in df.items() if t.startswith("tok")
    )[0][1]
    victims = sorted(df[rare])
    assert delete_docs(spark, idx, victims) is not None
    got = (
        QueryEngine(spark, idx)
        .suggest_completions(
            pd.DataFrame({"query_id": [0], "prefix": [rare[:5]]}), n_top=50
        )
        .toPandas()
    )
    assert rare not in set(got["suggestion"])
