"""search_after pagination (QueryEngine.topk_page).

ES-style cursor paging: the client hands back the (rounded score,
doc_id) of the last hit it saw; the engine returns the next k hits
strictly after it in the pinned display order (rounded score DESC,
doc_id ASC).  Checks: every page equals the corresponding window of a
pure-Python full ranking (any depth, including the geometric-overfetch
doublings and the exhausted tail), the surface is path-agnostic
(phrase kind: local == distributed == sharded), and the tie_margin
precondition is enforced.
"""
from __future__ import annotations

import pandas as pd
import pytest

from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import QueryEngine

from test_phrase import _brute_filtered_topk, _brute_phrase_topk

TIE = 1e-6


@pytest.fixture(scope="module")
def pos_index_dir(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pindex_pg"))
    build_index(
        spark,
        small_corpus,
        d,
        BuildConfig(
            n_buckets=8, block_size=32, target_postings_per_salt=200, positions=True
        ),
    )
    return d


def _rounded_full(brute: pd.DataFrame) -> pd.DataFrame:
    """Re-rank a raw-score brute ranking by (round(score,6) DESC,
    doc_id ASC) — the display order topk_page pages through."""
    out = brute.copy()
    out["score"] = out["score"].round(6)
    out = out.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "doc_id", "score"]]


def _window(full: pd.DataFrame, qid: int, lo: int, hi: int) -> pd.DataFrame:
    w = full[(full["query_id"] == qid) & (full["rank"] > lo) & (full["rank"] <= hi)]
    return w[["doc_id", "score"]].reset_index(drop=True)


def _cursor_at(full: pd.DataFrame, qid: int, rank: int) -> tuple[float, int]:
    row = full[(full["query_id"] == qid) & (full["rank"] == rank)].iloc[0]
    return float(row["score"]), int(row["doc_id"])


def test_pages_match_full_ranking_windows(spark, small_corpus, pos_index_dir):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    queries = pd.DataFrame(
        {"query_id": [0, 1], "text": ["water the", "you that he"], "k": [5, 5]}
    )
    big = queries.assign(k=10**6)
    full = _rounded_full(
        _brute_filtered_topk(
            corpus_pdf,
            big,
            match_fn=lambda q, t: bool(set(tokenize_py(q.text)) & set(t)),
        )
    )
    eng = QueryEngine(spark, pos_index_dir, tie_margin=TIE)

    def page(qdf):
        got = eng.topk_page(qdf).toPandas()
        return {
            int(q): g.sort_values("rank")[["doc_id", "score"]].reset_index(drop=True)
            for q, g in got.groupby("query_id")
        }

    # page 1 (no cursor)
    p1 = page(queries)
    for qid in (0, 1):
        pd.testing.assert_frame_equal(p1[qid], _window(full, qid, 0, 5))
    # page 2 from page-1 cursors
    q2 = queries.copy()
    q2["after_score"], q2["after_doc_id"] = zip(
        *(_cursor_at(full, qid, 5) for qid in (0, 1))
    )
    for qid, got in page(q2).items():
        pd.testing.assert_frame_equal(got, _window(full, qid, 5, 10))
    # deep page: cursor at rank 40 forces the overfetch loop to grow
    q40 = queries.copy()
    q40["after_score"], q40["after_doc_id"] = zip(
        *(_cursor_at(full, qid, 40) for qid in (0, 1))
    )
    for qid, got in page(q40).items():
        pd.testing.assert_frame_equal(got, _window(full, qid, 40, 45))
    # exhausted tail: cursor 2 from the end -> short final page
    for qid in (0, 1):
        n = int((full["query_id"] == qid).sum())
        assert n > 50, "fixture corpus too small for depth checks"
        qe = queries[queries["query_id"] == qid].copy()
        s, d = _cursor_at(full, qid, n - 2)
        qe["after_score"], qe["after_doc_id"] = s, d
        got = page(qe)[qid]
        pd.testing.assert_frame_equal(got, _window(full, qid, n - 2, n))
        assert len(got) == 2
    # a cursor past the very end yields an empty page
    qz = queries.head(1).copy()
    qz["after_score"], qz["after_doc_id"] = -1.0, 10**9
    assert eng.topk_page(qz).count() == 0


def test_phrase_pages_path_agnostic(spark, small_corpus, pos_index_dir):
    """kind='phrase' pages identically through the serving-local,
    distributed, and doc-range-sharded plans, and equals the brute
    phrase ranking's window."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    queries = pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [5]})
    full = _rounded_full(
        _brute_phrase_topk(corpus_pdf, queries.assign(k=10**6))
    )
    eng = QueryEngine(spark, pos_index_dir, tie_margin=TIE)
    q2 = queries.copy()
    s, d = _cursor_at(full, 0, 5)
    q2["after_score"], q2["after_doc_id"] = s, d
    outs = {
        "local": eng.topk_page(q2, kind="phrase", mode="local"),
        "dist": eng.topk_page(q2, kind="phrase", mode="distributed"),
        "shard": eng.topk_page(q2, kind="phrase", mode="distributed", n_shards=2),
    }
    exp = _window(full, 0, 5, 10)
    for name, df in outs.items():
        got = (
            df.toPandas().sort_values("rank")[["doc_id", "score"]].reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, obj=name)
    assert len(exp) == 5


def test_topk_page_requires_tie_margin(spark, pos_index_dir):
    eng = QueryEngine(spark, pos_index_dir)  # tie_margin = 0
    with pytest.raises(ValueError, match="tie_margin"):
        eng.topk_page(pd.DataFrame({"query_id": [0], "text": ["the"], "k": [5]}))
