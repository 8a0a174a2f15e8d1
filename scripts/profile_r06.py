"""Round-6 optimization profiling harness (guide §1: measure first).

Phases (select with argv[1]):
  corpus   — materialize the bench corpus (untimed helper)
  build    — per-stage timing of the offline index build at local[32]
  posbuild — positional twin build (for serving-leg profiling)
  serve    — routed heavy-query sub-plan timings (phrase/proximity/mpp)

Writes timings to stderr; not part of the frozen bench contract
(bench.py is untouched — see OPTIMIZATION_r06.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK = "/tmp/bgs_bench_sf0.1"
CORPUS = os.path.join(WORK, "transcripts")
IDX = os.path.join(WORK, f"index_c{CPUS}")


def log(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)


def session():
    import bench

    return bench.fresh_session(CPUS)


def t(label, fn, *a, **kw):
    t0 = time.monotonic()
    out = fn(*a, **kw)
    log(f"{label}: {time.monotonic() - t0:.2f}s")
    return out


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "build"
    import bench

    if phase == "corpus":
        t("gen_corpus", bench.gen_corpus, CORPUS, 300_000, CPUS)
        return

    if phase == "build":
        import shutil

        from pyspark.sql import functions as F

        from bilies_go_spark.operators.index_build import (
            BuildConfig, IndexPaths, build_runs, build_segments,
            build_term_variants, finalize_stats, publish_full_view,
            write_index_meta,
        )
        from bilies_go_spark.plans.lineage import Lineage

        spark = session()
        shutil.rmtree(IDX, ignore_errors=True)
        corpus = spark.read.parquet(CORPUS)
        corpus.agg(F.sum(F.length("text"))).collect()  # warm page cache
        cfg = BuildConfig(n_buckets=bench.BENCH_BUCKETS)
        paths = IndexPaths(IDX)
        lineage = Lineage(IDX)
        write_index_meta(paths, cfg)
        t0 = time.monotonic()
        t("stage A (runs)", build_runs, spark, corpus, paths, cfg, lineage)
        t("stage B (segments)", build_segments, spark, paths, cfg, lineage)
        t("term_variants", build_term_variants, spark, paths.term_stats,
          paths.term_variants, cfg)
        stats = t("finalize_stats", finalize_stats, spark, paths, lineage)
        t("publish", publish_full_view, spark, paths, lineage, stats)
        log(f"TOTAL build: {time.monotonic() - t0:.2f}s")
        return

    if phase == "buildx":
        # sub-step attribution of stage A + stage B (mirrors
        # build_runs/build_segments internals, fresh index dir)
        import shutil

        from pyspark.sql import functions as F

        from bilies_go_spark.operators.index_build import (
            BuildConfig, IndexPaths, RUNS_SCHEMA, _doc_local_tf, _make_encoder,
            plan_build_parts, split_poison, term_bucket_col,
        )
        from bilies_go_spark.sources import tableio

        spark = session()
        idx = IDX + "_x"
        shutil.rmtree(idx, ignore_errors=True)
        corpus = spark.read.parquet(CORPUS)
        corpus.agg(F.sum(F.length("text"))).collect()
        cfg = BuildConfig(n_buckets=bench.BENCH_BUCKETS)
        paths = IndexPaths(idx)
        tagged = corpus.withColumn("build_part", F.expr(cfg.build_part_expr))
        clean, poison = split_poison(tagged)
        chunk = t("A1 plan_build_parts", plan_build_parts, corpus, cfg)
        log(f"  n_parts={len(chunk)}")
        t("A2 quarantine write", tableio.write_partitioned, poison,
          paths.quarantine, ["build_part"], False)
        n_parallel = spark.sparkContext.defaultParallelism
        sub = clean.filter(F.col("build_part").isin(chunk))
        runs = sub.select("build_part", "doc_id", "text").mapInArrow(
            _doc_local_tf, schema=cfg.runs_schema)
        spread = max(cfg.bucket_spread, -(-2 * n_parallel // max(len(chunk), 1)))
        runs = runs.repartition(
            max(n_parallel, len(chunk)), "build_part",
            F.pmod(F.xxhash64("doc_id"), F.lit(spread)))
        t("A3 tokenize+shuffle+write runs", tableio.write_partitioned,
          runs, paths.runs, ["build_part"], True)
        t("A4 ack stats re-read", lambda: spark.read.schema(RUNS_SCHEMA)
          .parquet(paths.runs).filter(F.col("build_part").isin(chunk))
          .groupBy("build_part")
          .agg(F.count("*").alias("p"), F.sum("tf").alias("sum_dl"),
               F.countDistinct("doc_id").alias("n")).collect())
        # stage B
        bucket_ids = list(range(cfg.n_buckets))
        runs_r = (
            spark.read.schema(cfg.runs_schema).parquet(paths.runs)
            .drop("build_part")
            .withColumn("term_bucket", term_bucket_col("term", cfg.n_buckets))
            .filter(F.col("term_bucket").isin(bucket_ids))
        )
        tstats = runs_r.groupBy("term_bucket", "term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf"))
        t("B1 tstats agg+write", tableio.write_partitioned,
          tstats.select("term", "df", "cf", "term_bucket"),
          paths.term_stats, ["term_bucket"])
        tstats_r = spark.read.parquet(paths.term_stats).filter(
            F.col("term_bucket").isin(bucket_ids))
        n_salts = F.greatest(
            F.lit(1),
            F.ceil(F.col("df") / F.lit(cfg.target_postings_per_salt))).cast("int")
        salted = (
            runs_r.join(tstats_r.select("term", n_salts.alias("n_salts")), "term")
            .withColumn("salt", F.pmod(
                F.xxhash64(F.col("doc_id"), F.lit(0x7F4A7C15)), F.col("n_salts")
            ).cast("int"))
            .select("term_bucket", "term", "salt", "doc_id", "tf", "dl"))
        segments = salted.groupBy("term_bucket", "term", "salt").applyInPandas(
            _make_encoder(cfg.block_size), schema=cfg.segment_schema)
        t("B2 re-read+join+encode+write", tableio.write_partitioned,
          segments, paths.segments, ["term_bucket"])
        t("B3 seg stats re-read", lambda: spark.read.parquet(paths.segments)
          .filter(F.col("term_bucket").isin(bucket_ids))
          .groupBy("term_bucket")
          .agg(F.sum("n_docs").alias("postings"),
               F.sum(F.length("doc_gaps_vb") + F.length("tfs_vb")
                     + F.length("dls_vb")).alias("bytes_out"),
               F.count("*").alias("n_segments")).collect())
        return

    if phase == "b2":
        # A/B the stage-B encode pipeline over the runs table written by
        # a prior `buildx` run (arrow grouped-map vs pandas grouped-map)
        import shutil

        import pandas as pd
        from pyspark.sql import functions as F

        from bilies_go_spark.operators.codec import encode_postings, segment_to_row
        from bilies_go_spark.operators.index_build import (
            BuildConfig, IndexPaths, _make_encoder, term_bucket_col,
        )
        from bilies_go_spark.sources import tableio

        spark = session()
        cfg = BuildConfig(n_buckets=bench.BENCH_BUCKETS)
        paths = IndexPaths(IDX + "_x")
        bucket_ids = list(range(cfg.n_buckets))
        runs_r = (
            spark.read.schema(cfg.runs_schema).parquet(paths.runs)
            .drop("build_part")
            .withColumn("term_bucket", term_bucket_col("term", cfg.n_buckets))
            .filter(F.col("term_bucket").isin(bucket_ids))
        )
        tstats_r = spark.read.parquet(paths.term_stats).filter(
            F.col("term_bucket").isin(bucket_ids))
        n_salts = F.greatest(
            F.lit(1),
            F.ceil(F.col("df") / F.lit(cfg.target_postings_per_salt))).cast("int")
        salted = (
            runs_r.join(tstats_r.select("term", n_salts.alias("n_salts")), "term")
            .withColumn("salt", F.pmod(
                F.xxhash64(F.col("doc_id"), F.lit(0x7F4A7C15)), F.col("n_salts")
            ).cast("int"))
            .select("term_bucket", "term", "salt", "doc_id", "tf", "dl"))

        def pandas_encoder(pdf):
            pdf = pdf.sort_values("doc_id")
            seg = encode_postings(
                pdf["doc_id"].to_numpy("int64"), pdf["tf"].to_numpy("int64"),
                pdf["dl"].to_numpy("int64"), block_size=cfg.block_size)
            row = segment_to_row(str(pdf["term"].iloc[0]), int(pdf["salt"].iloc[0]), seg)
            row["term_bucket"] = int(pdf["term_bucket"].iloc[0])
            return pd.DataFrame([row])

        for label, df in [
            ("B2 pandas", salted.groupBy("term_bucket", "term", "salt")
             .applyInPandas(pandas_encoder, schema=cfg.segment_schema)),
        ]:
            for i in range(2):
                shutil.rmtree(paths.segments + "_ab", ignore_errors=True)
                t(f"{label} #{i}", tableio.write_partitioned, df,
                  paths.segments + "_ab", ["term_bucket"])
        return

    if phase == "posbuild":
        import bilies_go_spark
        from bilies_go_spark.operators.index_build import BuildConfig, build_index

        spark = session()
        pidx = os.path.join(WORK, f"pindex_{bilies_go_spark.__version__}")
        if not os.path.exists(os.path.join(pidx, "_index_meta.json")):
            t("positional build", build_index, spark,
              spark.read.parquet(CORPUS), pidx,
              BuildConfig(n_buckets=bench.BENCH_BUCKETS, positions=True))
        else:
            log("positional index cached")
        return

    if phase == "serve":
        import pandas as pd

        import bilies_go_spark
        from bilies_go_spark.operators.query import QueryEngine

        spark = bench.fresh_session(CPUS, conf={})
        pidx = os.path.join(WORK, f"pindex_{bilies_go_spark.__version__}")
        peng = QueryEngine(spark, pidx)

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        # one routed (heavy) phrase query
        pq = pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [10]})
        qt = peng._phrase_qt_rows(pq)
        n_sh = peng._auto_shards_qt(qt)
        log(f"phrase 'the of' auto shards = {n_sh}")
        # warm python workers
        peng.topk_phrase(pq).count()
        for _ in range(3):
            t("topk_phrase routed count", lambda: peng.topk_phrase(pq).count())
        # sub-plan attribution
        from pyspark.sql import functions as F
        terms, buckets = peng._terms_and_buckets(pq)
        segs = peng._segments_df(terms, buckets)
        t("segs scan count", segs.count)
        t("segs scan noop", lambda: noop(segs))
        tstats = peng._tstats_df(terms, buckets)
        t("tstats count", tstats.count)

        # proximity
        prq = pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [10],
                            "slop": [3]})
        peng.topk_proximity(prq).count()
        for _ in range(3):
            t("topk_proximity routed count", lambda: peng.topk_proximity(prq).count())

        # mpp heavy
        mq = pd.DataFrame({"query_id": [0], "text": ["the o"], "k": [10]})
        peng.topk_match_phrase_prefix(mq).count()
        for _ in range(3):
            t("topk_mpp routed count",
              lambda: peng.topk_match_phrase_prefix(mq).count())
        mqt = peng._mpp_qt_rows(mq)
        log(f"mpp expansion rows = {len(mqt)}, shards = {peng._auto_shards_qt(mqt)}")
        return

    raise SystemExit(f"unknown phase {phase}")


if __name__ == "__main__":
    main()
