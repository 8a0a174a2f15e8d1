"""multi_match (ES multi-field search): per-field indexes (own
df/dl/avgdl), best_fields / most_fields / tie_breaker combines, exact
threshold-algorithm evaluation — against a pure-pandas brute reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bilies_go_spark import B_DEFAULT, K1_DEFAULT
from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.multifield import field_text, multi_match

TITLE_N = 4


@pytest.fixture(scope="module")
def mf_setup(spark, small_corpus, tmp_path_factory):
    body = small_corpus.select("doc_id", "text")
    title = small_corpus.select(
        "doc_id", field_text("text", TITLE_N).alias("text")
    )
    cfg = BuildConfig(
        n_buckets=8,
        build_part_expr="CAST(doc_id % 4 AS STRING)",
        target_postings_per_salt=200,
    )
    d_t = str(tmp_path_factory.mktemp("mf_title"))
    d_b = str(tmp_path_factory.mktemp("mf_body"))
    build_index(spark, title, d_t, cfg)
    build_index(spark, body, d_b, cfg)
    return {"title": (d_t, title), "body": (d_b, body)}


def _bm25_scores(toks: dict[int, list[str]], terms: list[str]) -> dict[int, float]:
    docs = {d: t for d, t in toks.items() if t}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df: dict[str, int] = {}
    for t in docs.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = {}
    for d, t in docs.items():
        s = 0.0
        for w in sorted(set(terms)):
            tf = t.count(w)
            if tf == 0 or w not in df:
                continue
            idf = np.log1p((n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (K1_DEFAULT + 1.0)) / (
                tf + K1_DEFAULT * (1.0 - B_DEFAULT + B_DEFAULT * (len(t) / avgdl))
            )
        if s > 0.0:
            out[d] = s
    return out


def _brute_multi(corpus_pdf: pd.DataFrame, queries: pd.DataFrame, tboost: float):
    body_toks = {
        int(r.doc_id): tokenize_py(r.text)
        for r in corpus_pdf.itertuples(index=False)
    }
    title_toks = {d: t[:TITLE_N] for d, t in body_toks.items()}
    out = []
    for q in queries.itertuples(index=False):
        terms = sorted(set(tokenize_py(q.text)))
        st = _bm25_scores(title_toks, terms)
        sb = _bm25_scores(body_toks, terms)
        docs = sorted(set(st) | set(sb))
        rows = []
        for d in docs:
            bs = [tboost * st.get(d, 0.0), 1.0 * sb.get(d, 0.0)]
            mx, sm = max(bs), sum(bs)
            s = sm if q.mtype == "most" else mx + q.tie_breaker * (sm - mx)
            rows.append((d, s))
        rows.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(rows[: int(q.k)], 1):
            out.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "score"])


QUERIES = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "water the",      # best
            "water the",      # most: same terms, different combine
            "water the",      # tie_breaker
            "people time",    # best, small k (tight threshold bound)
            "zzqx water",     # absent + present term
            "the of and",     # all-hot, most
        ],
        "k": [10, 10, 10, 3, 10, 5],
        "mtype": ["best", "most", "best", "best", "best", "most"],
        "tie_breaker": [0.0, 0.0, 0.3, 0.5, 0.0, 0.0],
    }
)


def test_multi_match_matches_brute(spark, small_corpus, mf_setup):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_multi(corpus_pdf, QUERIES, tboost=2.0)
    got = (
        multi_match(
            spark,
            fields=[
                ("title", mf_setup["title"][0], 2.0),
                ("body", mf_setup["body"][0], 1.0),
            ],
            corpus_by_field={
                "title": mf_setup["title"][1],
                "body": mf_setup["body"][1],
            },
            queries=QUERIES,
        )
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["query_id"].to_numpy() == exp["query_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    per_q = exp.groupby("query_id").size()
    assert all(per_q.get(i, 0) > 0 for i in range(6))
    # combine modes must actually differ on this fixture
    b0 = exp[exp["query_id"] == 0][["doc_id", "score"]].reset_index(drop=True)
    b1 = exp[exp["query_id"] == 1][["doc_id", "score"]].reset_index(drop=True)
    assert not b0.equals(b1)
