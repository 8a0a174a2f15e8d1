"""Brute-force BM25 oracle sanity: formula vs hand-computed values on a
tiny corpus, plus structural properties on the synthetic corpus."""

from __future__ import annotations

import math

import pandas as pd

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.bm25 import brute_force_topk, idf


def _tiny_corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat"),
        (2, "cat cat cat"),
        (3, "completely unrelated words here"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), schema="doc_id bigint, text string"
    )


def _hand_bm25(tf, dl, df, n_docs, avgdl, k1=1.2, b=0.75):
    w = math.log1p((n_docs - df + 0.5) / (df + 0.5))
    return w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def test_oracle_matches_hand_computation(spark):
    corpus = _tiny_corpus(spark)
    queries = pd.DataFrame({"query_id": [0], "text": ["cat"], "k": [10]})
    got = (
        brute_force_topk(spark, corpus, queries)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # dl: doc0=6, doc1=3, doc2=3, doc3=4 -> N=4, avgdl=4.0; df(cat)=2
    exp0 = _hand_bm25(tf=3, dl=3, df=2, n_docs=4, avgdl=4.0)  # doc2
    exp1 = _hand_bm25(tf=1, dl=6, df=2, n_docs=4, avgdl=4.0)  # doc0
    assert list(got["doc_id"]) == [2, 0]
    assert abs(got.loc[0, "score"] - exp0) < 1e-12
    assert abs(got.loc[1, "score"] - exp1) < 1e-12


def test_multi_term_sum_and_tie_break(spark):
    corpus = _tiny_corpus(spark)
    queries = pd.DataFrame({"query_id": [0, 1], "text": ["cat sat", "the"], "k": [10, 10]})
    got = brute_force_topk(spark, corpus, queries).toPandas()
    q0 = got[got.query_id == 0].sort_values("rank")
    # docs 0,1,2 match at least one of {cat, sat}; doc3 matches none
    assert set(q0["doc_id"]) == {0, 1, 2}
    # 'the': docs 0 and 1; doc1 has higher tf-norm (shorter, same tf? doc0 tf=2)
    q1 = got[got.query_id == 1].sort_values("rank")
    assert set(q1["doc_id"]) == {0, 1}


def test_idf_positive_and_monotone():
    assert idf(1, 1000) > idf(100, 1000) > idf(999, 1000) > 0


def test_oracle_on_synthetic_corpus(spark, small_corpus):
    queries = reference_queries().head(12)
    got = brute_force_topk(spark, small_corpus, queries).toPandas()
    # ranks dense & 1-based per query; k respected
    for qid, grp in got.groupby("query_id"):
        ks = queries.set_index("query_id").loc[qid, "k"]
        assert list(grp.sort_values("rank")["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= ks
        # scores non-increasing with rank
        s = grp.sort_values("rank")["score"].to_numpy()
        assert (s[:-1] >= s[1:] - 1e-12).all()
    # hot single-term queries must fill k
    hot = got[got.query_id == 0]
    assert len(hot) == 10
