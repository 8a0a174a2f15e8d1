"""Plan-shape regression gates (promoted from scripts/explain_plans.py).

The guarantees that make the headline plans scale — partition pruning +
predicate pushdown into the segment scan, broadcast joins for the tiny
query side, equality (hash) joins for LSH candidate pairs, and no
cartesian/nested-loop fan-outs beyond the deliberate constant-side
broadcasts — are asserted here so they cannot silently regress.  These
are EXECUTED-plan string checks (pattern: test_tokenize.py's
EvalPython gate), not result checks; the result side is covered by the
driver's DuckDB oracle gate.
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_bm25_distributed_scan_prunes_and_broadcasts(spark, sf_dir):
    """The segment scan must partition-prune on term_bucket AND push the
    term IN (...) predicate into parquet; the query-terms and term-stats
    joins must broadcast (the fact stream never shuffles for them)."""
    from bilies_go_spark import driver_queries as dq
    from bilies_go_spark.operators.query import QueryEngine

    idx = dq.build_documents_index(spark, sf_dir)
    plan = _plan(QueryEngine(spark, idx).topk_distributed(dq.bm25_queries_pdf()))
    assert "PartitionFilters" in plan and "term_bucket" in plan
    assert "PushedFilters" in plan and "In(term, [" in plan
    assert plan.count("BroadcastHashJoin") >= 2, plan.count("BroadcastHashJoin")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_scan_prunes_and_broadcasts(spark, sf_dir):
    """The positional-index phrase plan keeps the same scale shape as
    the regular distributed plan: term_bucket partition pruning + term
    predicate pushdown on the segment scan, broadcast query-terms and
    term-stats joins, no fan-out joins."""
    from bilies_go_spark import driver_queries as dq
    from bilies_go_spark.operators.query import QueryEngine

    idx = dq.build_documents_index_positional(spark, sf_dir)
    plan = _plan(QueryEngine(spark, idx).topk_phrase(dq.phrase_queries_pdf()))
    assert "PartitionFilters" in plan and "term_bucket" in plan
    assert "PushedFilters" in plan and "In(term, [" in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_composed_and_highlight_scan_prune_and_broadcast(spark, sf_dir):
    """The round-4 positional surfaces keep the scale shape: composed
    (bool) and highlight plans partition-prune + push the term predicate
    into the segment scan and broadcast the tiny query/stats sides —
    the text side of the highlight snippet join must also broadcast the
    k·|queries|-row result, never shuffle the docs scan."""
    from bilies_go_spark import driver_queries as dq
    from bilies_go_spark.operators.query import QueryEngine

    idx = dq.build_documents_index_positional(spark, sf_dir)
    eng = QueryEngine(spark, idx)
    for df in (
        eng.topk_composed(dq.composed_queries_pdf()),
        eng.search_highlight(dq.highlight_queries_pdf()),
    ):
        plan = _plan(df)
        assert "PartitionFilters" in plan and "term_bucket" in plan
        assert "PushedFilters" in plan and "In(term, [" in plan
        assert plan.count("BroadcastHashJoin") >= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    snip = _plan(eng.search_highlight(dq.highlight_queries_pdf(), docs_df=docs))
    assert "BroadcastHashJoin" in snip
    assert "CartesianProduct" not in snip and "BroadcastNestedLoopJoin" not in snip


def test_join_star_broadcasts_dimensions(spark, sf_dir):
    """customer and nation are dimensions: they must broadcast-join,
    and nothing may nested-loop/cartesian."""
    from bilies_go_spark import driver_queries as dq

    plan = _plan(dq.q_join_star(spark, sf_dir))
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_bhj >= 2, f"customer+nation must broadcast, saw {n_bhj}"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("entry", ["dedup_jaccard_lsh", "dedup_embedding_lsh"])
def test_neardup_pair_joins_are_equality_joins(spark, docs, vecs, entry):
    """The gated near-dup scoring plans: candidate generation fans out
    only against constant tiny broadcast sides (MinHash seeds /
    hyperplanes — linear in the corpus), and every PAIR/candidate join
    is an equality (hash) join — never all-pairs."""
    from bilies_go_spark.operators import ann, dedup

    df = (
        dedup.jaccard_on_candidates(docs)
        if entry == "dedup_jaccard_lsh"
        else ann.cosine_pairs_lsh(vecs)
    )
    plan = _plan(df)
    fanouts = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
    hash_joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert fanouts <= 2, f"{entry}: {fanouts} non-equality joins"
    assert hash_joins >= 2, f"{entry}: pair/candidate joins not hash joins ({hash_joins})"


def test_term_stats_reads_only_needed_columns(spark, sf_dir, tmp_path_factory):
    """Column pruning must reach the documents scan: a term-stats plan
    that reads every column would scan the whole table width at 100 TB.

    Reads through a COPY of the fixture dir: other test modules persist
    the original path, and the CacheManager would substitute the cached
    full-schema relation for any plan-matching read, hiding the
    FileScan this test asserts on."""
    import re
    import shutil

    from bilies_go_spark import driver_queries as dq

    d = str(tmp_path_factory.mktemp("ts_docs"))
    shutil.copy(f"{sf_dir}/documents.parquet", f"{d}/documents.parquet")
    plan = _plan(dq.q_term_stats(spark, d))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"doc_id", "text"}, cols
