"""Corpus generator determinism + doc_id assignment invariants."""

from __future__ import annotations

import pandas as pd

from bilies_go_spark.corpus import assign_doc_ids, reference_queries, transcripts_df


def test_generator_deterministic_across_parallelism(spark):
    """Same corpus regardless of partitioning — the counter-based
    generation contract (this is what makes resume/scaling tests valid)."""
    a = transcripts_df(spark, 50, parallelism=2).toPandas()
    b = transcripts_df(spark, 50, parallelism=7).toPandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_corpus_shape(spark):
    df = transcripts_df(spark, 100, parallelism=4)
    pdf = df.toPandas()
    assert set(pdf.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert pdf.groupby("conv_id")["turn_idx"].apply(
        lambda s: sorted(s) == list(range(len(s)))
    ).all()
    assert pdf["role"].isin(["user", "assistant", "tool"]).all()
    tool_rows = pdf[pdf["role"] == "tool"]
    assert (tool_rows["tool"].str.startswith("tool_")).all()
    assert pdf[pdf["role"] != "tool"]["tool"].isna().all()
    lens = pdf["text"].str.split().str.len()
    assert lens.min() >= 5 and lens.max() <= 200
    assert pdf["ts"].dt.date.nunique() >= 30  # partition-pruning needs many days


def test_doc_ids_are_global_rank(spark, small_corpus):
    pdf = small_corpus.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(pdf["doc_id"]) == list(range(len(pdf)))


def test_doc_ids_stable_across_num_partitions(spark):
    base = transcripts_df(spark, 80, parallelism=4)
    a = assign_doc_ids(base, num_partitions=2).select("conv_id", "turn_idx", "doc_id").toPandas()
    b = assign_doc_ids(base, num_partitions=11).select("conv_id", "turn_idx", "doc_id").toPandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
    )


def test_per_turn_text_equality_invariant(spark, small_corpus):
    """BASELINE.json input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering — regeneration must reproduce text."""
    regen = transcripts_df(spark, 300, parallelism=3).toPandas()
    orig = small_corpus.select("conv_id", "turn_idx", "text").toPandas()
    key = ["conv_id", "turn_idx"]
    merged = orig.merge(regen[key + ["text"]], on=key, suffixes=("_a", "_b"))
    assert len(merged) == len(orig)
    assert (merged["text_a"] == merged["text_b"]).all()


def test_reference_queries_cover_cases():
    q = reference_queries()
    assert len(q) >= 50
    assert q["query_id"].is_unique
    assert set(q["k"].unique()) >= {1, 10, 100}
    assert (q["text"].str.len() > 0).all()
