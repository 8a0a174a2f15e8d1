"""Composed (bool) queries: ONE query string mixing "quoted phrase"
(MUST) + -term (MUST_NOT) + term* (prefix) + term~ (fuzzy) + bare
SHOULD terms, optionally under an allowed-set filter — evaluated by
query.composed_query_kernel against a pure-Python brute reference, with
local == distributed pinned and the error surface checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bilies_go_spark import B_DEFAULT, K1_DEFAULT
from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import QueryEngine

KEY = ["query_id", "rank"]


def _lev_le1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _brute_composed(
    corpus_pdf: pd.DataFrame,
    queries: pd.DataFrame,
    allowed=None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> pd.DataFrame:
    """Reference evaluator: eligibility = all phrases contiguous AND no
    negated term AND in the allowed set; score = BM25 over the distinct
    scoring terms (bare + prefix/fuzzy expansions + phrase terms),
    ascending-term pinned fold; GLOBAL stats regardless of the filter."""
    toks = {int(r.doc_id): tokenize_py(r.text) for r in corpus_pdf.itertuples(index=False)}
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    vocab = set(df)
    allowed_set = None if allowed is None else set(int(x) for x in allowed)
    out = []
    for q in queries.itertuples(index=False):
        s = QueryEngine._parse_composed_query(q.text)
        negs = set(s["neg"])
        should = set(s["should"])
        cb = s.get("boosts", {})
        tb: dict[str, float] = {}  # per-term max EXPLICIT clause boost

        def _tb(t, v):
            if v is not None:
                tb[t] = max(tb.get(t, 0.0), v)

        for t in s["should"]:
            _tb(t, cb.get(t))
        for p_ in s["prefix"]:
            exp = {v for v in vocab if v.startswith(p_)}
            should |= exp
            for t in exp:
                _tb(t, cb.get(p_ + "*"))
        for f_ in s["fuzzy"]:
            exp = {v for v in vocab if _lev_le1(f_, v)}
            should |= exp
            for t in exp:
                _tb(t, cb.get(f_ + "~"))
        for p in s["phrases"]:
            for t in p:
                _tb(t, cb.get(" ".join(p)))
        sterms = sorted((should | {t for p in s["phrases"] for t in p}) - negs)
        # minimum_should_match clause predicates (bare / prefix / fuzzy,
        # negation-pruned like the engine); ignored when no clauses
        msm = int(getattr(q, "msm", 0) or 0)
        clause_preds = (
            [lambda ts, c=c: c in ts for c in sorted(set(s["should"]) - negs)]
            + [
                lambda ts, p=p: any(v.startswith(p) for v in ts)
                for p in sorted(set(s["prefix"]) - negs)
            ]
            + [
                lambda ts, f=f: any(_lev_le1(f, v) for v in ts)
                for f in sorted(set(s["fuzzy"]))
            ]
        )
        if not clause_preds:
            msm = 0
        scored = []
        for d, t in toks.items():
            if allowed_set is not None and d not in allowed_set:
                continue
            if negs & set(t):
                continue
            if msm > 0 and sum(1 for pr in clause_preds if pr(set(t))) < msm:
                continue
            if not all(
                any(t[i : i + len(p)] == p for i in range(len(t) - len(p) + 1))
                for p in s["phrases"]
            ):
                continue
            if any(
                any(t[i : i + len(p)] == p for i in range(len(t) - len(p) + 1))
                for p in s["neg_phrases"]
            ):
                continue
            score = 0.0
            for term in sterms:
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = tb.get(term, 1.0) * np.log1p(
                    (n_docs - df[term] + 0.5) / (df[term] + 0.5)
                )
                score += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(t) / avgdl))
                )
            if score > 0.0:
                scored.append((d, score))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, sc) in enumerate(scored[: int(q.k)], 1):
            out.append((int(q.query_id), rank, d, sc))
    return pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "score"])


@pytest.fixture(scope="module")
def pos_idx(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("composed_idx"))
    cfg = BuildConfig(
        n_buckets=8, block_size=32, target_postings_per_salt=200, positions=True
    )
    build_index(spark, small_corpus, d, cfg)
    return d


COMPOSED = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9],
        "text": [
            '"the of" -water',          # phrase + negation
            '"the of" wa*',             # phrase + prefix boost
            "water -the sa*",           # no phrase: OR + neg + prefix
            '"of the" watr~',           # phrase + fuzzy boost
            "the water",                # degenerate plain OR
            '"zzqx the" the',           # unmatched phrase -> empty
            '"the the" -of wor*',       # repeated-term phrase + neg + prefix
            'water -"the of"',          # negated phrase + bare
            '"the of" -"of the" wa*',   # MUST phrase + negated phrase + prefix
            'the -"zzqx zzqx"',         # absent negated phrase -> no-op
        ],
        "k": [10, 10, 10, 10, 10, 10, 10, 10, 10, 10],
    }
)


def _assert_same_topk(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values(KEY).reset_index(drop=True)
    exp = exp.sort_values(KEY).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["query_id"].to_numpy() == exp["query_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )


def test_composed_matches_brute_and_local_equals_distributed(
    spark, small_corpus, pos_idx
):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_composed(corpus_pdf, COMPOSED)
    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(COMPOSED).toPandas()
    _assert_same_topk(dist, exp)
    loc = eng.topk_composed(COMPOSED, mode="local").toPandas()
    _assert_same_topk(loc, exp)
    # the fixture must exercise non-trivial results for the phrase+neg
    # and expansion queries, and emptiness for the unmatched phrase
    per_q = exp.groupby("query_id").size()
    assert per_q.get(0, 0) > 0 and per_q.get(1, 0) > 0 and per_q.get(2, 0) > 0
    assert per_q.get(5, 0) == 0
    assert per_q.get(7, 0) > 0 and per_q.get(9, 0) > 0
    # the negated phrase must be load-bearing on this fixture: dropping
    # it from query 7 changes the matched doc set
    plain = _brute_composed(
        corpus_pdf, pd.DataFrame({"query_id": [0], "text": ["water"], "k": [10]})
    )
    assert set(plain["doc_id"]) != set(exp[exp["query_id"] == 7]["doc_id"])


def test_composed_with_allowed_filter(spark, small_corpus, pos_idx):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    allowed = np.sort(corpus_pdf["doc_id"].to_numpy()[::2]).astype(np.int64)
    exp = _brute_composed(corpus_pdf, COMPOSED, allowed=allowed)
    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(COMPOSED, allowed=allowed).toPandas()
    _assert_same_topk(dist, exp)
    loc = eng.topk_composed(COMPOSED, allowed=allowed, mode="local").toPandas()
    _assert_same_topk(loc, exp)
    assert len(exp) > 0


def test_composed_sharded_equals_distributed(spark, small_corpus, pos_idx):
    """The doc-range-sharded composed plan (all four streams sliced at
    block boundaries, full bool pipeline per shard, window merge) is
    result-identical to the one-task-per-query plan — with and without
    the allowed-set filter."""
    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(COMPOSED).toPandas()
    for n_shards in (3, 8):
        shard = eng.topk_composed(COMPOSED, n_shards=n_shards).toPandas()
        a = shard.sort_values(KEY).reset_index(drop=True)
        b = dist.sort_values(KEY).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, obj=f"n_shards={n_shards}")
    assert len(dist)
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    allowed = np.sort(corpus_pdf["doc_id"].to_numpy()[::2]).astype(np.int64)
    dist_f = eng.topk_composed(COMPOSED, allowed=allowed).toPandas()
    shard_f = eng.topk_composed(COMPOSED, allowed=allowed, n_shards=4).toPandas()
    pd.testing.assert_frame_equal(
        shard_f.sort_values(KEY).reset_index(drop=True),
        dist_f.sort_values(KEY).reset_index(drop=True),
    )


def test_composed_error_surface(spark, small_corpus, pos_idx, tmp_path):
    eng = QueryEngine(spark, pos_idx)
    # MUST_NOT-phrase-only query: no scoring clause -> empty (Lucene's
    # MUST_NOT-only behavior, same as the boolean kernel's neg-only path)
    only_neg = eng.topk_composed(
        pd.DataFrame({"query_id": [0], "text": ['-"the of"'], "k": [5]})
    ).toPandas()
    assert len(only_neg) == 0
    # phrase clause against a positions-free index must raise
    d = str(tmp_path / "nopos_idx")
    build_index(
        spark,
        small_corpus,
        d,
        BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200),
    )
    with pytest.raises(ValueError, match="positions"):
        QueryEngine(spark, d).topk_composed(
            pd.DataFrame({"query_id": [0], "text": ['"the of"'], "k": [5]})
        )
    # ...and so must a negated phrase clause (positional verification)
    with pytest.raises(ValueError, match="positions"):
        QueryEngine(spark, d).topk_composed(
            pd.DataFrame({"query_id": [0], "text": ['water -"the of"'], "k": [5]})
        )
    # ...but phrase-free composed queries work on any index
    got = QueryEngine(spark, d).topk_composed(
        pd.DataFrame({"query_id": [0], "text": ["water -the"], "k": [5]})
    ).toPandas()
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_composed(
        corpus_pdf,
        pd.DataFrame({"query_id": [0], "text": ["water -the"], "k": [5]}),
    )
    _assert_same_topk(got, exp)


FIELDED = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "role:user water the",             # positive metadata scope
            '-role:user "the of"',             # negated scope + MUST phrase
            "water -the",                      # NO field clause, mixed batch
            "role:user role:assistant water",  # contradictory -> empty
            # tool is NULL on most turns: null-safe negation keeps them
            "role:assistant -tool:tool_15 water",
            "tool:tool_15 the",                # sparse positive scope
        ],
        "k": [10, 10, 10, 10, 10, 10],
    }
)


def _resolve_fields_pandas(meta_pdf: pd.DataFrame, s: dict) -> np.ndarray:
    """Independent pandas resolution of a parsed spec's field clauses
    (NaN == value is False, so ~(col == v) keeps missing-field docs —
    the ES must_not semantics the engine must reproduce)."""
    m = pd.Series(True, index=meta_pdf.index)
    for fname, val in s["fields"]:
        m &= meta_pdf[fname] == val
    for fname, val in s["neg_fields"]:
        m &= ~(meta_pdf[fname] == val)
    return np.sort(meta_pdf.loc[m, "doc_id"].to_numpy(np.int64))


def test_composed_field_scoped_matches_brute(spark, small_corpus, pos_idx):
    """field:value / -field:value clauses scope each query to the docs
    whose metadata matches, with GLOBAL scoring stats — per query,
    inside one batch, on both serving paths."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    meta_pdf = small_corpus.select("doc_id", "role", "tool").toPandas()
    fields_df = small_corpus.select("doc_id", "role", "tool")

    exps = []
    for r in FIELDED.itertuples(index=False):
        s = QueryEngine._parse_composed_query(r.text)
        al = (
            _resolve_fields_pandas(meta_pdf, s)
            if (s["fields"] or s["neg_fields"])
            else None
        )
        one = pd.DataFrame(
            {"query_id": [r.query_id], "text": [r.text], "k": [r.k]}
        )
        # _brute_composed parses the same text; its scorer ignores the
        # field keys, so the resolved allowed-set IS the field filter
        exps.append(_brute_composed(corpus_pdf, one, allowed=al))
    exp = pd.concat([e for e in exps if len(e)], ignore_index=True)

    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(FIELDED, fields_df=fields_df).toPandas()
    _assert_same_topk(dist, exp)
    loc = eng.topk_composed(FIELDED, fields_df=fields_df, mode="local").toPandas()
    _assert_same_topk(loc, exp)

    per_q = exp.groupby("query_id").size()
    # scopes must be load-bearing: every non-contradictory query hits,
    # the contradictory one is empty, and the scoped result differs
    # from the unscoped one
    assert per_q.get(0, 0) > 0 and per_q.get(1, 0) > 0 and per_q.get(2, 0) > 0
    assert per_q.get(3, 0) == 0
    assert per_q.get(4, 0) > 0 and per_q.get(5, 0) > 0
    unscoped = _brute_composed(
        corpus_pdf,
        pd.DataFrame({"query_id": [0], "text": ["water the"], "k": [10]}),
    )
    assert set(unscoped["doc_id"]) != set(exp[exp["query_id"] == 0]["doc_id"])


def test_composed_field_scope_intersects_allowed(spark, small_corpus, pos_idx):
    """A tenant allowed-set AND a field scope both apply (intersection),
    and a field-scoped batch without fields_df raises."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    meta_pdf = small_corpus.select("doc_id", "role", "tool").toPandas()
    fields_df = small_corpus.select("doc_id", "role", "tool")
    tenant = np.sort(corpus_pdf["doc_id"].to_numpy(np.int64)[::2])

    q = pd.DataFrame(
        {"query_id": [0], "text": ["role:user water the"], "k": [25]}
    )
    s = QueryEngine._parse_composed_query(q.loc[0, "text"])
    al = np.intersect1d(_resolve_fields_pandas(meta_pdf, s), tenant)
    exp = _brute_composed(corpus_pdf, q, allowed=al)
    assert len(exp) > 0

    eng = QueryEngine(spark, pos_idx)
    got = eng.topk_composed(q, allowed=tenant, fields_df=fields_df).toPandas()
    _assert_same_topk(got, exp)

    with pytest.raises(ValueError, match="fields_df"):
        eng.topk_composed(q)


BOOSTED = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "water^2 the",          # term boost reorders vs plain OR
            "water the",            # control: same terms, unboosted
            '"the of"^3 water',     # phrase boost scales its terms
            "wa*^2 the",            # prefix boost rides every expansion
            "watr~^2.5 the",        # fuzzy boost rides every expansion
            "water water^0.5 the",  # explicit de-boost beats the
                                    # unboosted duplicate clause
        ],
        "k": [10, 10, 10, 10, 10, 10],
    }
)


def test_composed_boosts_match_brute(spark, small_corpus, pos_idx):
    """clause^B boosts (term/phrase/prefix/fuzzy) scale each reached
    term's contribution by the max explicit boost — identical to the
    brute reference on the distributed, local, and sharded paths, and
    actually load-bearing (boosted ranking differs from unboosted)."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_composed(corpus_pdf, BOOSTED)
    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(BOOSTED).toPandas()
    _assert_same_topk(dist, exp)
    loc = eng.topk_composed(BOOSTED, mode="local").toPandas()
    _assert_same_topk(loc, exp)
    shard = eng.topk_composed(BOOSTED, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(KEY).reset_index(drop=True),
        dist.sort_values(KEY).reset_index(drop=True),
    )
    per_q = exp.groupby("query_id").size()
    assert all(per_q.get(i, 0) > 0 for i in range(6))
    # the boost must CHANGE the ranking somewhere vs the control
    b0 = exp[exp["query_id"] == 0][["doc_id", "score"]].reset_index(drop=True)
    b1 = exp[exp["query_id"] == 1][["doc_id", "score"]].reset_index(drop=True)
    assert not b0.equals(b1)
    # and the de-boost query must differ from the plain one too
    b5 = exp[exp["query_id"] == 5][["doc_id", "score"]].reset_index(drop=True)
    assert not b5.equals(b1)


MSM = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5, 6],
        "text": [
            "water the people",        # 2-of-3
            "water the people",        # control: msm=1 == plain OR
            "water the people",        # 3-of-3 == AND
            '"the of" wa* people',     # MUST phrase + 2-of-2 clauses
            "wa* watr~ people",        # prefix + fuzzy + bare, 2-of-3
            "water the people",        # msm > clause count -> empty
            '"the of" -"water the"', # no SHOULD clauses: msm ignored
        ],
        "k": [10, 10, 10, 10, 10, 10, 10],
        "msm": [2, 1, 3, 2, 2, 4, 3],
    }
)


def test_composed_msm_match_brute(spark, small_corpus, pos_idx):
    """minimum_should_match: a doc needs >= msm DISTINCT matched SHOULD
    clauses (prefix/fuzzy count once however many expansions hit);
    identical to the brute reference on the distributed, local, and
    sharded paths; msm beyond the clause count empties the result; msm
    with no SHOULD clauses is ignored."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_composed(corpus_pdf, MSM)
    eng = QueryEngine(spark, pos_idx)
    dist = eng.topk_composed(MSM).toPandas()
    _assert_same_topk(dist, exp)
    loc = eng.topk_composed(MSM, mode="local").toPandas()
    _assert_same_topk(loc, exp)
    shard = eng.topk_composed(MSM, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(KEY).reset_index(drop=True),
        dist.sort_values(KEY).reset_index(drop=True),
    )
    per_q = exp.groupby("query_id").size()
    # msm must BITE: 2-of-3 strictly between OR and AND in hit count
    n_or, n_2, n_and = per_q.get(1, 0), per_q.get(0, 0), per_q.get(2, 0)
    full = _brute_composed(corpus_pdf, MSM.assign(k=10_000))
    fq = full.groupby("query_id").size()
    assert fq.get(1, 0) > fq.get(0, 0) > fq.get(2, 0) > 0, (n_or, n_2, n_and)
    assert per_q.get(5, 0) == 0          # msm > clause count
    assert per_q.get(6, 0) > 0           # ignored without clauses
    assert per_q.get(3, 0) > 0 and per_q.get(4, 0) > 0
