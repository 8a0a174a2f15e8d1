"""Dump `.explain("formatted")` for the round-6-touched query surfaces.

Usage: python scripts/dump_plans_r06.py <repo_root> <suffix>
  repo_root — the code tree to import (/root/repo or a worktree of the
              round-5 commit for the `before` plans)
  suffix    — `before` or `after`; files land in /root/repo/plans/r06/

Plans are captured against the sf0.1 bench index artifacts in
/tmp/bgs_bench_sf0.1 (built by bench.py / profile_r06.py).  For routed
(doc-range-sharded) surfaces the round-6 code merges the shard
partials DRIVER-SIDE (n_shards x k rows), so the `after` dump captures
the executed distributed sub-plan (the `partial` DataFrame) plus the
returned local relation; the `before` dump shows the same query's full
plan including the window merge.
"""
from __future__ import annotations

import os
import sys

REPO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "after"
OUT = "/root/repo/plans/r06"
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

import bench  # noqa: E402
import bilies_go_spark  # noqa: E402
from bilies_go_spark.corpus import reference_queries  # noqa: E402
from bilies_go_spark.operators.query import QueryEngine  # noqa: E402


def save(name: str, df) -> None:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(f"# code tree: {REPO}\n# surface: {name} ({SUFFIX})\n\n")
        f.write(txt)
    print(f"wrote {path} ({len(txt)} chars)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = bench.fresh_session(32, conf={})
    idx = "/tmp/bgs_bench_sf0.1/index_c32"
    pidx = f"/tmp/bgs_bench_sf0.1/pindex_{bilies_go_spark.__version__}"
    eng = QueryEngine(spark, idx)
    peng = QueryEngine(spark, pidx)
    qset = reference_queries()

    # light one-task distributed batch (n_shards=1 forced): the plan
    # every non-routed topk shares — scan + broadcast joins + grouped map
    save("bm25_light_batch", eng.topk_distributed(qset.head(4), n_shards=1))

    # the 53-query bench batch (auto-sharded).  Round 6 merges the
    # shard partials driver-side, so capture the executed sub-plan via
    # the window-merge-free components when available.
    pq = pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [10]})
    qt_pdf = peng._phrase_qt_rows(pq)
    n_sh = peng._auto_shards_qt(qt_pdf)
    if hasattr(QueryEngine, "_shards_for_volume"):
        # round-6 tree: reconstruct the partial (pre-merge) plan
        import numpy as np

        from bilies_go_spark.operators.query import (  # noqa: E402
            SEGMENT_SLICE_FIELDS, TOPK_SCHEMA, _phrase_shard,
            _slice_segments_by_shard_pos,
        )
        from pyspark.sql import functions as F

        qt = spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slots array<int>",
        )
        terms, buckets = peng._terms_and_buckets(pq)
        segs = peng._segments_df(terms, buckets)
        tstats = peng._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, peng.n_docs, n_sh + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max
        slice_schema = (
            "query_id bigint, k int, n_terms int, slots array<int>, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(pdf, bounds)
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = peng.k1, peng.b, peng.n_docs, peng.avgdl

        def shard_kernel(key, pdf):
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _phrase_shard(pdf, lo, hi, k1, b, n_docs, avgdl)

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        save("phrase_routed_partial", partial)
        save("phrase_routed_result", peng.topk_phrase(pq))
    else:
        save("phrase_routed_result", peng.topk_phrase(pq))
    print(f"phrase auto shards = {n_sh}")

    # dis_max: heavy clauses (routing added in round 6)
    dq = pd.DataFrame(
        {"query_id": [0], "text": ["the of | water one"], "k": [10]}
    )
    if hasattr(QueryEngine, "_shards_for_volume"):
        # round-6 tree: capture the executed pre-merge sub-plan too
        captured = {}
        orig = QueryEngine._merge_shard_topk

        def spy(self, partial, queries, extra_cols=()):
            captured["partial"] = partial
            return orig(self, partial, queries, extra_cols)

        QueryEngine._merge_shard_topk = spy
        try:
            save("dis_max_heavy", eng.topk_dis_max(dq))
            if "partial" in captured:
                save("dis_max_heavy_partial", captured["partial"])
        finally:
            QueryEngine._merge_shard_topk = orig
    else:
        save("dis_max_heavy", eng.topk_dis_max(dq))


if __name__ == "__main__":
    main()
