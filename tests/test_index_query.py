"""Index build + query engine: rank-identity vs the brute-force oracle.

Pruning-safety argument (tested below): a block of term t survives iff
ub_t(block) + sum over other terms u of (max ub over u-blocks
overlapping the block's doc range) >= theta.  For any doc d, its true
score <= ub of the t-block containing it + sum of ubs of the u-blocks
containing it, each of which overlaps that t-block; so if every block
containing d is pruned, score(d) < theta <= final kth score, and d
cannot belong to the top-k.  The gather pass decodes every u-block
overlapping a surviving block, so surviving candidates are scored
EXACTLY.  Hence pruned == exhaustive, rank for rank, score for score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.bm25 import brute_force_topk
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import topk


@pytest.fixture(scope="module")
def index_dir(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("index"))
    cfg = BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200)
    build_index(spark, small_corpus, d, cfg)
    return d


def _assert_rank_identical(got: pd.DataFrame, exp: pd.DataFrame, tol=1e-9):
    """Rank-for-rank identity, tolerating reorder only inside score ties."""
    for qid in sorted(set(exp["query_id"]) | set(got["query_id"])):
        g = got[got.query_id == qid].sort_values("rank").reset_index(drop=True)
        e = exp[exp.query_id == qid].sort_values("rank").reset_index(drop=True)
        assert len(g) == len(e), f"q{qid}: {len(g)} vs {len(e)} rows"
        gs, es = g["score"].to_numpy(), e["score"].to_numpy()
        np.testing.assert_allclose(gs, es, rtol=0, atol=tol, err_msg=f"q{qid} scores")
        # doc ids must match except within float-tie groups
        mismatch = g["doc_id"].to_numpy() != e["doc_id"].to_numpy()
        if mismatch.any():
            for i in np.flatnonzero(mismatch):
                tie_g = set(g.loc[np.abs(gs - gs[i]) <= tol, "doc_id"])
                tie_e = set(e.loc[np.abs(es - es[i]) <= tol, "doc_id"])
                assert g.loc[i, "doc_id"] in tie_e and e.loc[i, "doc_id"] in tie_g, (
                    f"q{qid} rank {i + 1}: doc {g.loc[i, 'doc_id']} vs {e.loc[i, 'doc_id']}"
                )


def test_engine_rank_identical_to_oracle(spark, small_corpus, index_dir):
    queries = reference_queries()
    exp = brute_force_topk(spark, small_corpus, queries).toPandas()
    got = topk(spark, index_dir, queries, prune=True).toPandas()
    _assert_rank_identical(got, exp)


def test_pruned_equals_exhaustive(spark, index_dir):
    queries = reference_queries()
    a = topk(spark, index_dir, queries, prune=True).toPandas()
    b = topk(spark, index_dir, queries, prune=False).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_absent_term_returns_empty(spark, index_dir):
    q = pd.DataFrame({"query_id": [0], "text": ["zzzqqqxxx"], "k": [10]})
    assert topk(spark, index_dir, q).count() == 0


def test_nondefault_bm25_params(spark, small_corpus, index_dir):
    queries = reference_queries().head(10)
    exp = brute_force_topk(spark, small_corpus, queries, k1=0.9, b=0.4).toPandas()
    got = topk(spark, index_dir, queries, k1=0.9, b=0.4).toPandas()
    _assert_rank_identical(got, exp)


def test_salting_actually_splits_hot_terms(spark, index_dir):
    segs = spark.read.parquet(f"{index_dir}/segments")
    per_term = segs.groupBy("term").count().toPandas()
    assert (per_term["count"] > 1).any(), "expected salted multi-run hot terms"
    # every salted run respects the size target (2x slack for hash skew)
    sizes = segs.select("term", "salt", "n_docs").toPandas()
    assert sizes["n_docs"].max() <= 2 * 200


def _seg_row(term, ids, tfs, dls, df, k=10, block_size=64):
    from bilies_go_spark.operators.codec import encode_postings, segment_to_row

    seg = encode_postings(ids, tfs, dls, block_size=block_size)
    row = segment_to_row(term, 0, seg)
    row.update({"term_bucket": 0, "query_id": 0, "k": k, "df": df})
    return row


def test_pruning_skips_blocks_and_stays_exact():
    """Crafted hot+rare query: a high-idf rare term bootstraps a real
    threshold, so hot-term blocks outside the rare doc range and below
    the threshold must be skipped — while results stay exact."""
    from bilies_go_spark.operators.query import KernelStats, score_query_kernel

    rng = np.random.default_rng(0)
    hot_ids = np.arange(0, 10000, dtype=np.int64)
    hot_tf = rng.integers(1, 4, size=hot_ids.size).astype(np.int64)
    hot_tf[5000:5050] = 50
    dls = np.full(hot_ids.size, 100, dtype=np.int64)
    rare_ids = np.arange(7000, 7020, dtype=np.int64)
    pdf = pd.DataFrame(
        [
            _seg_row("hot", hot_ids, hot_tf, dls, df=10000),
            _seg_row(
                "rare",
                rare_ids,
                np.full(20, 3, dtype=np.int64),
                np.full(20, 100, dtype=np.int64),
                df=20,
            ),
        ]
    )
    st = KernelStats()
    pruned = score_query_kernel(pdf, 1.2, 0.75, 10000, 100.0, prune=True, stats=st)
    exhaustive = score_query_kernel(pdf, 1.2, 0.75, 10000, 100.0, prune=False)
    pd.testing.assert_frame_equal(pruned, exhaustive)
    assert st.blocks_decoded < st.blocks_total, (st.blocks_decoded, st.blocks_total)


def test_pruning_never_overdecodes_on_corpus(spark, index_dir):
    """On the real index, pruned kernel decodes <= total for every
    reference query (and equality to exhaustive is covered above)."""
    from bilies_go_spark.operators.bm25 import query_terms_df
    from bilies_go_spark.operators.index_build import IndexPaths
    from bilies_go_spark.operators.query import KernelStats, score_query_kernel
    from pyspark.sql import functions as F

    paths = IndexPaths(index_dir)
    srow = spark.read.parquet(paths.stats_table).collect()[0]
    q = reference_queries().head(20)
    qt = query_terms_df(spark, q)
    segs = spark.read.parquet(paths.segments)
    tstats = spark.read.parquet(paths.term_stats).select("term", "df")
    joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term").toPandas()
    for _qid, grp in joined.groupby("query_id"):
        st = KernelStats()
        score_query_kernel(
            grp, 1.2, 0.75, int(srow["n_docs"]), float(srow["avgdl"]), prune=True, stats=st
        )
        assert st.blocks_decoded <= st.blocks_total


def test_quarantine_and_poison_rows(spark, tmp_path):
    """Poison rows (null/empty/no-token text) are quarantined with a
    reason and the rest of the build proceeds — the bisect-skip
    contract of /root/reference/requester.go:112-116."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3, 4], dtype="int64"),
            "text": ["good words here", None, "", "!!! ...", "more good text"],
            "ts": pd.to_datetime(["2026-01-01"] * 5),
        }
    )
    corpus = spark.createDataFrame(rows, schema="doc_id bigint, text string, ts timestamp")
    d = str(tmp_path / "idx")
    build_index(spark, corpus, d, BuildConfig(n_buckets=2))
    quarantined = spark.read.parquet(f"{d}/quarantine").toPandas()
    assert sorted(quarantined["doc_id"]) == [1, 2, 3]
    assert set(quarantined["reason"]) == {"null_text", "empty_text", "no_tokens"}
    stats = spark.read.parquet(f"{d}/corpus_stats").collect()[0]
    assert stats["n_docs"] == 2
    got = topk(spark, d, pd.DataFrame({"query_id": [0], "text": ["good"], "k": [5]})).toPandas()
    assert sorted(got["doc_id"]) == [0, 4]


def test_local_equals_distributed(spark, index_dir):
    """The driver-local pyarrow serving path and the distributed Spark
    path share the kernel and must agree row-for-row."""
    from bilies_go_spark.operators.query import QueryEngine

    queries = reference_queries()
    eng = QueryEngine(spark, index_dir)
    key = ["query_id", "rank"]
    loc = eng.topk_pandas(queries).sort_values(key).reset_index(drop=True)
    dist = (
        eng.topk_distributed(queries).toPandas().sort_values(key).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)


def test_local_path_absent_term(spark, index_dir):
    from bilies_go_spark.operators.query import QueryEngine

    eng = QueryEngine(spark, index_dir)
    q = pd.DataFrame({"query_id": [0], "text": ["zzzqqqxxx"], "k": [10]})
    assert len(eng.topk_pandas(q)) == 0
    assert eng.topk(q, mode="local").count() == 0


def test_sharded_equals_serving(spark, index_dir):
    """Doc-range-sharded distributed plan (intra-query parallelism) is
    exact: identical to the serving path for every query, any shard
    count, including shard boundaries that straddle blocks."""
    from bilies_go_spark.operators.query import QueryEngine

    queries = reference_queries().head(24)
    eng = QueryEngine(spark, index_dir)
    key = ["query_id", "rank"]
    base = eng.topk_pandas(queries).sort_values(key).reset_index(drop=True)
    for n_shards in (3, 8):
        sharded = (
            eng.topk_sharded(queries, n_shards=n_shards)
            .toPandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(sharded, base, check_dtype=False)


def test_conjunctive_matches_brute_intersection(spark, index_dir, small_corpus):
    """AND-kernel vs a brute intersection computed from the OR oracle's
    score table: identical docs and scores for multi-term queries."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bilies_go_spark.operators.bm25 import brute_force_scores, query_terms_df
    from bilies_go_spark.operators.query import QueryEngine
    from bilies_go_spark.functions.tokenize import tokenize_py
    from bilies_go_spark.corpus import reference_queries

    queries = reference_queries().head(14)
    eng = QueryEngine(spark, index_dir)
    got = eng.topk_conjunctive(queries).toPandas()

    # brute AND: score every doc, keep docs matching ALL query terms
    scores = brute_force_scores(spark, small_corpus, queries)
    post = query_terms_df(spark, queries)
    from bilies_go_spark.operators.stats import term_postings

    tp = term_postings(small_corpus).select("term", "doc_id")
    matched = (
        tp.join(F.broadcast(post), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.countDistinct("term").alias("nt"))
    )
    nterms = {
        int(r.query_id): len(set(tokenize_py(r.text)))
        for r in queries.itertuples(index=False)
    }
    exp = (
        scores.join(matched, ["query_id", "doc_id"])
        .toPandas()
    )
    exp = exp[exp.apply(lambda r: r["nt"] == nterms[int(r["query_id"])], axis=1)]
    from pyspark.sql import Window

    for qid, grp in exp.groupby("query_id"):
        k = int(grp["k"].iloc[0])
        want = grp.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        g = got[got["query_id"] == qid].sort_values("rank")
        assert list(g["doc_id"]) == list(want["doc_id"]), f"q{qid}"
        import numpy as np

        np.testing.assert_allclose(g["score"].to_numpy(), want["score"].to_numpy(), rtol=0, atol=1e-9)


def test_segment_cache_hits_and_identical_results(spark, index_dir):
    """The serving-path LRU term cache must be invisible to results and
    actually serve repeats from memory."""
    from bilies_go_spark.corpus import reference_queries
    from bilies_go_spark.operators.query import QueryEngine

    queries = reference_queries().head(8)
    eng = QueryEngine(spark, index_dir)
    a = eng.topk_pandas(queries)
    misses_after_first = eng.seg_cache.misses
    b = eng.topk_pandas(queries)
    assert eng.seg_cache.misses == misses_after_first  # all repeats hit
    assert eng.seg_cache.hits > 0
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    # eviction under a tiny budget still returns correct results
    small = QueryEngine(spark, index_dir, cache_mb=1)
    c = small.topk_pandas(queries)
    pd.testing.assert_frame_equal(
        a.sort_values(["query_id", "rank"]).reset_index(drop=True),
        c.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_poison_probe_agrees_with_tokenizer_on_unicode(spark):
    """The cheap 'no_tokens' rlike probe must agree with the tokenizer's
    emptiness predicate even for non-ASCII chars whose lower() maps into
    [a-z0-9] (U+0130 'İ' -> 'i' + combining dot, U+212A Kelvin -> 'k')."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bilies_go_spark.functions.tokenize import tokenize_col
    from bilies_go_spark.operators.index_build import split_poison

    texts = [
        "İSTANBUL",      # dotted capital I -> tokens after lower()
        "K elvin",       # Kelvin sign -> 'k'
        "¡¿...!!",            # punctuation only -> no tokens
        "ÆØÅ",                # lower() stays outside [a-z0-9] -> no tokens
        "naïve café",         # accented but contains plain a-z
        "٣٤٥",                # Arabic-Indic digits: lower() unchanged, not [0-9]
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        schema="doc_id bigint, text string",
    )
    clean, poison = split_poison(df)
    probe_poison = set(poison.toPandas()["doc_id"])
    tok_empty = set(
        df.filter(F.size(tokenize_col("text")) == 0).toPandas()["doc_id"]
    )
    assert probe_poison == tok_empty


def test_match_ids_equals_brute_and(spark, small_corpus, index_dir):
    """QueryEngine.match_ids returns EXACTLY the docs containing every
    query term (AND semantics, full match set, no ranking)."""
    import pandas as pd

    from bilies_go_spark.functions.tokenize import tokenize_py
    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "text": ["the of", "you that he", "zzzmissing the"]}
    )
    got = QueryEngine(spark, index_dir).match_ids(queries).toPandas()
    corpus = small_corpus.select("doc_id", "text").toPandas()
    for q in queries.itertuples(index=False):
        terms = set(tokenize_py(q.text))
        exp = sorted(
            int(r.doc_id)
            for r in corpus.itertuples(index=False)
            if terms <= set(tokenize_py(r.text))
        )
        assert sorted(got[got.query_id == q.query_id]["doc_id"]) == exp
    assert len(got), "fixture must produce at least one match"


def test_collapse_best_per_group_exact(spark, small_corpus, index_dir):
    """topk_collapse == brute: score every matching doc, keep the best
    per group (rounded score desc, doc_id asc), re-rank, cut at k.
    Null group values collapse into ONE group (ES missing-field
    semantics), pinned by leaving some docs out of the groups frame."""
    import pandas as pd

    from bilies_go_spark.functions.tokenize import tokenize_py
    from bilies_go_spark.operators.bm25 import brute_force_scores
    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "text": ["the", "you that", "zzqq"], "k": [4, 3, 5]}
    )
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    # deterministic synthetic collapse field, with a null stripe
    grp_pdf = corpus_pdf[["doc_id"]].copy()
    grp_pdf["grp"] = grp_pdf["doc_id"].map(
        lambda d: None if d % 11 == 0 else f"g{d % 7}"
    )
    groups = spark.createDataFrame(grp_pdf, schema="doc_id bigint, grp string")

    got = (
        QueryEngine(spark, index_dir)
        .topk_collapse(queries, groups, round_digits=6)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )

    scores = brute_force_scores(spark, small_corpus, queries).toPandas()
    scores["score"] = scores["score"].round(6)
    exp_rows = []
    for q in queries.itertuples(index=False):
        sub = scores[scores.query_id == q.query_id].merge(grp_pdf, on="doc_id")
        sub["grp"] = sub["grp"].fillna("\0null")
        sub = sub.sort_values(["score", "doc_id"], ascending=[False, True])
        best = sub.groupby("grp", sort=False).head(1)
        best = best.sort_values(["score", "doc_id"], ascending=[False, True]).head(
            int(q.k)
        )
        for rank, r in enumerate(best.itertuples(index=False), start=1):
            exp_rows.append(
                (
                    int(q.query_id),
                    rank,
                    int(r.doc_id),
                    float(r.score),
                    None if r.grp == "\0null" else r.grp,
                )
            )
    exp = pd.DataFrame(
        exp_rows, columns=["query_id", "rank", "doc_id", "score", "grp"]
    )
    exp["rank"] = exp["rank"].astype("int32")
    pd.testing.assert_frame_equal(got, exp)
    # the fixture must genuinely collapse (fewer survivors than matches)
    n_match = (scores.query_id == 0).sum()
    assert n_match > got[got.query_id == 0].shape[0]
    # and the null group must have contributed exactly one survivor row
    assert got["grp"].isna().sum() >= 1


def test_function_score_modifies_ranking(spark, small_corpus, index_dir):
    """topk_function_score ranks BM25 x factor; docs missing from the
    factors frame keep factor 1; a doc-inverting factor must actually
    reorder the plain top-k."""
    import pandas as pd

    from bilies_go_spark.operators.bm25 import brute_force_scores
    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame({"query_id": [0], "text": ["the"], "k": [10]})
    eng = QueryEngine(spark, index_dir)
    # factor strongly favors high doc ids; odd ids missing (factor 1)
    corpus_pdf = small_corpus.select("doc_id").toPandas()
    fac_pdf = corpus_pdf[corpus_pdf["doc_id"] % 2 == 0].copy()
    fac_pdf["factor"] = 1.0 + fac_pdf["doc_id"] / 10.0
    factors = spark.createDataFrame(fac_pdf, schema="doc_id bigint, factor double")
    got = (
        eng.topk_function_score(queries, factors, round_digits=6)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    scores = brute_force_scores(spark, small_corpus, queries).toPandas()
    fmap = dict(zip(fac_pdf["doc_id"], fac_pdf["factor"]))
    scores["score"] = (
        scores["score"] * scores["doc_id"].map(lambda d: fmap.get(d, 1.0))
    ).round(6)
    exp = (
        scores.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert np.allclose(got["score"], exp["score"])
    # the factor must have changed the plain ordering
    plain = eng.topk(queries).toPandas().sort_values("rank")
    assert list(got["doc_id"]) != list(plain.head(10)["doc_id"])


def test_filtered_topk_exact_on_all_paths(spark, small_corpus, index_dir):
    """Metadata-filtered search (allowed doc set, GLOBAL scoring stats)
    is exact on the serving, per-query-distributed, and sharded paths:
    each equals the brute global scores restricted to the allowed set.
    Pruning stays rank-safe because masking happens at decode time
    (bounds only get looser, theta bootstraps from masked partials)."""
    import numpy as np
    import pandas as pd

    from bilies_go_spark.operators.bm25 import brute_force_scores
    from bilies_go_spark.operators.query import QueryEngine

    queries = reference_queries().head(6)
    scores = brute_force_scores(spark, small_corpus, queries).toPandas()
    all_ids = np.sort(small_corpus.select("doc_id").toPandas()["doc_id"].to_numpy())
    allowed = all_ids[all_ids % 2 == 0]  # every even doc id

    exp_rows = []
    for q in queries.itertuples(index=False):
        sub = scores[
            (scores.query_id == q.query_id) & scores.doc_id.isin(allowed)
        ].sort_values(["score", "doc_id"], ascending=[False, True]).head(int(q.k))
        for rank, r in enumerate(sub.itertuples(index=False), 1):
            exp_rows.append((int(q.query_id), rank, int(r.doc_id), float(r.score)))
    exp = pd.DataFrame(exp_rows, columns=["query_id", "rank", "doc_id", "score"])

    eng = QueryEngine(spark, index_dir)
    got_serving = eng.topk_pandas(queries, allowed=allowed)
    got_dist = eng.topk_distributed(queries, allowed=allowed).toPandas()
    got_shard = eng.topk_sharded(queries, 3, allowed=allowed).toPandas()
    for name, got in [
        ("serving", got_serving), ("distributed", got_dist), ("sharded", got_shard)
    ]:
        _assert_rank_identical(got, exp)
    # every returned doc honors the filter, and the filter actually bit
    assert set(got_dist["doc_id"]).issubset(set(allowed.tolist()))
    unfiltered = eng.topk_pandas(queries)
    assert set(unfiltered["doc_id"]) - set(allowed.tolist()), (
        "fixture filter must exclude some unfiltered top-k docs"
    )


def test_explain_contribs_sum_to_score(spark, sf_dir):
    """bm25_explain: per-term contribs of a hit sum to its score
    (within rounding), idf matches the closed form, and the absent-term
    query yields rows only for its present term."""
    from bilies_go_spark import driver_queries as dq

    got = dq.bm25_explain(spark, sf_dir).toPandas()
    assert len(got) > 0
    sums = got.groupby(["query_id", "doc_id"]).agg(
        s=("score", "first"), c=("contrib", "sum")
    )
    np.testing.assert_allclose(
        sums["s"].to_numpy(), sums["c"].to_numpy(), rtol=0, atol=5e-6
    )
    # single-term query: contrib == score exactly (one row per hit)
    one = got[got["query_id"] == 3]
    assert len(one) > 0 and (one["term"] == "dup").all()
    np.testing.assert_allclose(
        one["score"].to_numpy(), one["contrib"].to_numpy(), rtol=0, atol=1e-9
    )
    # absent-term query contributes rows only for the present term
    q2 = got[got["query_id"] == 2]
    assert len(q2) > 0 and set(q2["term"]) == {"value"}


def test_top_hits_buckets_exact(spark, small_corpus, index_dir):
    """topk_top_hits == brute: bucket the full match set by grp, keep
    the top n_buckets buckets by doc count (grp asc on ties), top
    n_hits hits per bucket (rounded score desc, doc_id asc).  Docs
    absent from the groups frame drop from the aggregation (inner
    fact join), pinned by withholding a doc-id stripe."""
    import pandas as pd

    from bilies_go_spark.operators.bm25 import brute_force_scores
    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame(
        {"query_id": [0, 1, 2], "text": ["the", "you that", "zzqq"], "k": [4, 3, 5]}
    )
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    grp_pdf = corpus_pdf[["doc_id"]].copy()
    grp_pdf = grp_pdf[grp_pdf["doc_id"] % 13 != 0]  # withheld stripe
    grp_pdf["grp"] = grp_pdf["doc_id"].map(lambda d: f"g{d % 5}")
    groups = spark.createDataFrame(grp_pdf, schema="doc_id bigint, grp string")
    n_buckets, n_hits = 3, 2

    got = (
        QueryEngine(spark, index_dir)
        .topk_top_hits(queries, groups, n_buckets=n_buckets, n_hits=n_hits,
                       round_digits=6)
        .toPandas()
        .sort_values(["query_id", "bucket_rank", "hit_rank"])
        .reset_index(drop=True)
    )

    scores = brute_force_scores(spark, small_corpus, queries).toPandas()
    scores["score"] = scores["score"].round(6)
    exp_rows = []
    for qid in queries["query_id"]:
        sub = scores[scores.query_id == qid].merge(grp_pdf, on="doc_id")
        cnt = (
            sub.groupby("grp").size().reset_index(name="bucket_count")
            .sort_values(["bucket_count", "grp"], ascending=[False, True])
            .head(n_buckets)
            .reset_index(drop=True)
        )
        for brank, brow in enumerate(cnt.itertuples(index=False), start=1):
            hits = (
                sub[sub["grp"] == brow.grp]
                .sort_values(["score", "doc_id"], ascending=[False, True])
                .head(n_hits)
            )
            for hrank, h in enumerate(hits.itertuples(index=False), start=1):
                exp_rows.append(
                    (int(qid), brank, brow.grp, int(brow.bucket_count),
                     hrank, int(h.doc_id), float(h.score))
                )
    exp = pd.DataFrame(
        exp_rows,
        columns=["query_id", "bucket_rank", "grp", "bucket_count",
                 "hit_rank", "doc_id", "score"],
    )
    got["bucket_count"] = got["bucket_count"].astype("int64")
    exp["bucket_rank"] = exp["bucket_rank"].astype(got["bucket_rank"].dtype)
    exp["hit_rank"] = exp["hit_rank"].astype(got["hit_rank"].dtype)
    pd.testing.assert_frame_equal(got, exp)
    # fixture must exercise the bucket cut (more groups than n_buckets)
    n_grp = scores[scores.query_id == 0].merge(grp_pdf, on="doc_id")["grp"].nunique()
    assert n_grp > n_buckets
    # and the withheld stripe must have matched docs that then dropped
    withheld = set(
        scores[scores.query_id == 0]["doc_id"]
    ) & set(corpus_pdf[corpus_pdf["doc_id"] % 13 == 0]["doc_id"])
    assert withheld, "fixture must withhold at least one matching doc"


def test_cardinality_approx_within_error(spark, small_corpus, index_dir):
    """The cardinality agg's 10^12-doc serving path — HLL++
    `approx_count_distinct` over the identical match_ids + fact-join
    plan — stays within HLL error of the exact distinct count (the
    gated `search_cardinality` entry is exact; the sketch is the
    documented swap-in, never hash-gated because sketches are
    seed-dependent)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame({"query_id": [0, 1], "text": ["the", "you that"]})
    matches = QueryEngine(spark, index_dir).match_ids(queries)
    # synthetic keyword field with per-query-distinct cardinality
    facts = small_corpus.select(
        "doc_id", (F.col("doc_id") % 37).cast("string").alias("source")
    )
    j = matches.join(facts, "doc_id")
    got = (
        j.groupBy("query_id")
        .agg(
            F.countDistinct("source").alias("exact"),
            F.approx_count_distinct("source", 0.02).alias("approx"),
        )
        .toPandas()
        .sort_values("query_id")
    )
    assert len(got) == 2
    for r in got.itertuples(index=False):
        assert r.exact > 0
        assert abs(int(r.approx) - int(r.exact)) <= max(2, 0.1 * int(r.exact))


def test_dis_max_matches_brute(spark, small_corpus, index_dir):
    """topk_dis_max: per-clause BM25 disjunctions combined as
    best + tie x (sum - best) — equals an independent brute (its own
    parse, scoring, and combine); local == distributed; a single
    clause reduces to the plain disjunctive top-k."""
    from bilies_go_spark import B_DEFAULT, K1_DEFAULT
    from bilies_go_spark.functions.tokenize import tokenize_py
    from bilies_go_spark.operators.query import QueryEngine

    corpus = small_corpus.select("doc_id", "text").toPandas()
    tie = 0.3
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": [
                "the of | water one",
                "you | that he",
                "the water | water the",  # shared terms across clauses
                "water",                  # single clause == plain OR
            ],
            "k": [10, 10, 10, 10],
        }
    )
    toks = {int(r.doc_id): tokenize_py(r.text) for r in corpus.itertuples(index=False)}
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    dfreq: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1

    def bm25(term, t):
        tf = t.count(term)
        if not tf or term not in dfreq:
            return 0.0
        idf = np.log1p((n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        return (
            idf
            * (tf * (K1_DEFAULT + 1.0))
            / (tf + K1_DEFAULT * (1.0 - B_DEFAULT + B_DEFAULT * (len(t) / avgdl)))
        )

    exp_rows = []
    for q in queries.itertuples(index=False):
        clauses = [c for c in
                   (sorted(set(tokenize_py(p))) for p in q.text.split("|")) if c]
        scored = []
        for d, t in toks.items():
            cs = [s for c in clauses if (s := sum(bm25(term, t) for term in c)) > 0.0]
            if cs:
                scored.append((d, max(cs) + tie * (sum(cs) - max(cs))))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[: int(q.k)], 1):
            exp_rows.append((int(q.query_id), rank, d, s))
    exp = pd.DataFrame(exp_rows, columns=["query_id", "rank", "doc_id", "score"])

    eng = QueryEngine(spark, index_dir)
    got = eng.topk_dis_max(queries, tie_breaker=tie).toPandas()
    _assert_rank_identical(got, exp, tol=1e-8)
    loc = eng.topk_dis_max(queries, tie_breaker=tie, mode="local").toPandas()
    _assert_rank_identical(loc, exp, tol=1e-8)
    # every query matched something, and the shared-term query's clause
    # overlap actually exercised the multi-clause term path
    assert sorted(set(exp["query_id"])) == [0, 1, 2, 3]
    plain = topk(spark, index_dir, queries[queries.query_id == 3]).toPandas()
    _assert_rank_identical(
        got[got.query_id == 3].reset_index(drop=True), plain, tol=1e-9
    )


def test_dis_max_routes_heavy_to_sharded(spark, small_corpus, index_dir):
    """ADVICE r5: a heavy (all-hot) dis_max query must route to the
    doc-range-sharded plan instead of decoding full posting lists in
    one task / one driver thread, with identical results in every
    mode; n_shards=1 still forces the one-task paths."""
    from bilies_go_spark.operators.query import QueryEngine

    queries = pd.DataFrame(
        {
            "query_id": [0, 1],
            "text": ["the of | water one", "the water | water the"],
            "k": [10, 10],
        }
    )
    key = ["query_id", "rank"]
    eng = QueryEngine(spark, index_dir)
    base = (
        eng.topk_dis_max(queries, tie_breaker=0.3, n_shards=1)
        .toPandas().sort_values(key).reset_index(drop=True)
    )
    forced = QueryEngine(spark, index_dir)
    forced.SHARD_TARGET_POSTINGS = 1  # every posting volume counts as hot
    routed = {}
    orig = QueryEngine.topk_dis_max_sharded

    def spy(self, q, qt, n):
        routed["n"] = n
        return orig(self, q, qt, n)

    QueryEngine.topk_dis_max_sharded = spy
    try:
        auto = (
            forced.topk_dis_max(queries, tie_breaker=0.3)
            .toPandas().sort_values(key).reset_index(drop=True)
        )
        auto_local = (
            forced.topk_dis_max(queries, tie_breaker=0.3, mode="local")
            .toPandas().sort_values(key).reset_index(drop=True)
        )
    finally:
        QueryEngine.topk_dis_max_sharded = orig
    assert routed["n"] > 1  # the sharded twin actually ran
    pd.testing.assert_frame_equal(auto, base)
    pd.testing.assert_frame_equal(auto_local, base)
