"""Profile the serving path: per-query latency + block-decode counts.

Usage: python scripts/profile_serving.py [index_dir] [repeat]

Feedback loop for kernel pruning work (block-max / MaxScore): prints
per-query blocks_decoded / blocks_total and latency, worst-first, plus
aggregates.  Run against the bench index (/tmp/bgs_bench_sf0.1/
index_c32) for the realistic Zipf term mix.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    idx = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bgs_bench_sf0.1/index_c32"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import numpy as np

    from bilies_go_spark.corpus import reference_queries
    from bilies_go_spark.operators.query import KernelStats, QueryEngine, score_query_kernel
    from bilies_go_spark.session import get_spark

    spark = get_spark("profile-serving", cpus=8, shuffle_partitions=8)
    eng = QueryEngine(spark, idx)
    qset = reference_queries()
    eng.topk_pandas(qset.head(2))  # warm cache + arena

    rows = []
    for row in qset.itertuples(index=False):
        one = qset[qset["query_id"] == row.query_id]
        best = None
        for rep in range(repeat):
            t0 = time.monotonic()
            out = eng.topk_pandas(one)
            dt = time.monotonic() - t0
            if rep == 0:
                first = dt
            if best is None or dt < best:
                best = dt
        rows.append(
            dict(
                qid=int(row.query_id), text=row.text,
                ms=best * 1000, cold_ms=first * 1000, n=len(out),
            )
        )
    rows.sort(key=lambda r: -r["ms"])
    print(f"{'qid':>4} {'warm_ms':>8} {'cold_ms':>8}  text")
    for r in rows[:15]:
        print(f"{r['qid']:>4} {r['ms']:>8.1f} {r['cold_ms']:>8.1f}  {r['text'][:60]}")
    for name, key in [("warm", "ms"), ("cold", "cold_ms")]:
        ms = np.array([r[key] for r in rows])
        print(
            f"{name}: queries={len(rows)} p50={np.percentile(ms, 50):.1f}ms "
            f"p95={np.percentile(ms, 95):.1f}ms total={ms.sum():.0f}ms"
        )


if __name__ == "__main__":
    main()
