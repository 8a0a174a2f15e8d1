"""Print the physical plans of the engine's key operators.

Plan-quality checklist (run me after changing any operator):

* BM25 distributed query: segments scan must show
  ``PartitionFilters: [term_bucket IN ...]`` (partition pruning) AND
  ``PushedFilters: [In(term, ...)]`` (predicate pushdown into parquet),
  with BOTH stats/qterms joins as ``BroadcastHashJoin``.
* term_stats: a single scan of (doc_id, text) — ``ReadSchema`` must not
  include unused columns (column pruning).
* dedup / ANN: the small sides (seeds, query vectors, hyperplanes) must
  broadcast; nothing should sort-merge-join at fixture scale.

Usage: python scripts/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bilies_go_spark import driver_queries as dq
    from bilies_go_spark.operators import ann, dedup
    from bilies_go_spark.operators.query import QueryEngine
    from bilies_go_spark.session import get_spark

    spark = get_spark("explain-plans", cpus=8)

    print("=== bm25 distributed (pruned scan + broadcast joins) ===")
    idx = dq.build_documents_index(spark, sf)
    QueryEngine(spark, idx).topk_distributed(dq.bm25_queries_pdf()).explain("formatted")

    print("=== dis_max (same pruned-scan + broadcast shape) ===")
    dm = QueryEngine(spark, idx).topk_dis_max(dq.dis_max_queries_pdf())
    plan = dm._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "PushedFilters" in plan, "dis_max"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    print(f"[ok] dis_max: pruned scan, {plan.count('BroadcastHashJoin')} broadcast joins")

    print("=== ranged composed: range predicate pushes into the metadata scan ===")
    fdf = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
        "doc_id", "lang", "source", "n_chars"
    )
    pred = QueryEngine._range_cond(("n_chars", "100", "400", True, True))
    plan = fdf.where(pred).select("doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(n_chars,100" in plan and "LessThanOrEqual(n_chars,400" in plan, (
        "range predicate must reach PushedFilters:\n" + plan
    )
    print("[ok] ranged: n_chars bounds appear in PushedFilters")

    print("=== term_stats (explode + two-level agg) ===")
    dq.q_term_stats(spark, sf).explain("formatted")

    print("=== composed bool + highlight (positional; pruned scan + broadcasts) ===")
    pidx = dq.build_documents_index_positional(spark, sf)
    peng = QueryEngine(spark, pidx)
    for name, df in [
        ("composed", peng.topk_composed(dq.composed_queries_pdf())),
        ("highlight", peng.search_highlight(dq.highlight_queries_pdf())),
        ("match_phrase_prefix",
         peng.topk_match_phrase_prefix(dq.mpp_queries_pdf(), n_shards=1)),
        ("span_or", peng.topk_span_or(dq.span_or_queries_pdf(), n_shards=1)),
        ("span_not", peng.topk_span_not(dq.span_not_queries_pdf(), n_shards=1)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "PushedFilters" in plan, name
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
        print(f"[ok] {name}: pruned scan, {plan.count('BroadcastHashJoin')} broadcast joins")

    print("=== dedup minhash LSH ===")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    dedup.minhash_lsh_pairs(docs).explain("formatted")

    print("=== ann cosine topk (broadcast queries) ===")
    vecs = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    ann.cosine_topk(vecs).explain("formatted")

    print("=== join_star (broadcast dims; fact join shuffles once) ===")
    js = dq.q_join_star(spark, sf)
    plan = js._jdf.queryExecution().executedPlan().toString()
    n_bhj = plan.count("BroadcastHashJoin")
    assert n_bhj >= 2, f"customer+nation must broadcast, saw {n_bhj} BroadcastHashJoin"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    js.explain("formatted")
    print(f"[ok] join_star: {n_bhj} BroadcastHashJoin, no nested-loop/cartesian joins")

    print("=== near-dup pair plans: candidate joins are equality joins ===")
    vecs = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
    for name, df in [
        ("dedup_embedding_lsh", ann.cosine_pairs_lsh(vecs)),
        ("dedup_jaccard_lsh", dedup.jaccard_on_candidates(docs)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the only non-equality joins allowed are the deliberate
        # broadcast fan-outs against a constant tiny side (8 hyperplane
        # rows / n_hashes seed rows; one per self-join branch) — linear
        # in the corpus.  The PAIR self-join must be an equality (hash)
        # join, never all-pairs.
        fanouts = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
        hash_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin")
        assert fanouts <= 2, f"{name}: {fanouts} non-equality joins"
        assert hash_joins >= 2, f"{name}: pair/candidate joins not hash joins ({hash_joins})"
        print(f"[ok] {name}: {hash_joins} equality joins, {fanouts} constant-side fan-out")


if __name__ == "__main__":
    main()
