"""ES AUTO fuzziness (per-token edit distance 0/1/2 by length).

The reference delegates fuzzy matching to Elasticsearch, whose
default ``fuzziness: AUTO`` gives distance 0 for 1-2 char terms, 1
for 3-5, 2 for >= 6 (/root/reference/README.md:8-11).  Engine side:
SymSpell depth-2 deletion variants (dictionary terms >= 6 chars get
2-char deletions, index_build.DELETION_VARIANTS2_EXPR) + banded
bounded Levenshtein verify (query._lev_bounded).

Checks here: the pure helpers, dictionary-path == scan-path ==
pure-Python vocabulary brute (three independent implementations), and
the depth marker gating (a depth-1-only variant table must never
serve an AUTO expansion).
"""
from __future__ import annotations

import pandas as pd
import pytest

from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.query import (
    QueryEngine,
    _auto_fuzzy_dist,
    _lev_bounded,
)


@pytest.fixture(scope="module")
def pos_index_dir(spark, small_corpus, tmp_path_factory):
    from bilies_go_spark.operators.index_build import BuildConfig, build_index

    d = str(tmp_path_factory.mktemp("pindex_fz"))
    build_index(
        spark,
        small_corpus,
        d,
        BuildConfig(
            n_buckets=8, block_size=32, target_postings_per_salt=200, positions=True
        ),
    )
    return d


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


def test_auto_dist_bands():
    assert [_auto_fuzzy_dist(t) for t in ["a", "ab", "abc", "abcde", "abcdef", "abcdefgh"]] == [
        0, 0, 1, 1, 2, 2,
    ]


def test_deletion_variants_depth():
    dv = QueryEngine._deletion_variants_d
    assert dv("abc", 0) == {"abc"}
    assert dv("abc", 1) == {"abc", "bc", "ac", "ab"}
    # depth 2 = depth 1 plus every i<j pair deletion
    assert dv("abcd", 2) == {
        "abcd", "bcd", "acd", "abd", "abc",
        "cd", "bd", "bc", "ad", "ac", "ab",
    }
    # SymSpell guarantee, exhaustively on a small alphabet: any pair
    # within distance d shares a variant at deletion depth <= d
    import itertools

    words = ["".join(w) for n in range(0, 5) for w in itertools.product("ab", repeat=n)]
    for a, b in itertools.product(words, repeat=2):
        d = _lev(a, b)
        if d <= 2:
            assert dv(a, 2) & dv(b, 2), (a, b)


def test_fuzzy_auto_dict_equals_scan_equals_brute(spark, small_corpus, pos_index_dir):
    """expand_fuzzy(auto=True) from the depth-2 dictionary == the
    vocabulary-scan join == a pure-Python brute over the corpus
    vocabulary, and a distance-2 expansion genuinely appears."""
    corpus_pdf = small_corpus.select("text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    # pick a real >=7-char vocabulary term and typo it at distance 2
    base = typo2 = None
    for cand in (t for t in vocab if len(t) >= 7):
        t2 = cand[0] + cand[2] + cand[1] + cand[3:-1]  # transpose + drop last
        if _lev(t2, cand) == 2 and len(t2) >= 6:
            base, typo2 = cand, t2
            break
    assert base is not None, "fixture vocabulary has no distance-2 typo target"
    toks = [typo2, "watr", "th", "a", "zzqqxx"]

    eng = QueryEngine(spark, pos_index_dir)
    assert eng._tv_depth2(eng._tv_roots()), "build must write the depth-2 marker"
    fast = eng.expand_fuzzy(toks, auto=True)
    scan = eng._expand_fuzzy_scan(toks, auto=True)
    brute = {
        t: sorted(v for v in vocab if _lev(t, v) <= _auto_fuzzy_dist(t))
        for t in toks
    }
    assert fast == scan == brute
    assert base in fast[typo2], "distance-2 expansion must be found"
    # length bands genuinely differ: a 2-char token matches only exactly
    assert all(v == "th" for v in fast["th"])
    assert fast["zzqqxx"] == []


def test_fuzzy_auto_requires_depth2_marker(spark, pos_index_dir, monkeypatch):
    """AUTO expansion must route to the vocabulary scan when any
    variant root lacks the depth-2 marker (e.g. a table built by an
    older package) — a depth-1 dictionary would silently miss
    distance-2 matches."""
    eng = QueryEngine(spark, pos_index_dir)
    monkeypatch.setattr(eng, "_tv_depth2", lambda roots: False)
    called = {}
    real = eng._expand_fuzzy_scan

    def spy(toks, auto=False, dist=None):
        called["auto"] = auto
        return real(toks, auto=auto, dist=dist)

    monkeypatch.setattr(eng, "_expand_fuzzy_scan", spy)
    got = eng.expand_fuzzy(["watrer"], auto=True)
    assert called.get("auto") is True
    # d<=1-only AUTO batches may still use the depth-1 dictionary
    called.clear()
    eng.expand_fuzzy(["watr"], auto=True)
    assert "auto" not in called


def test_topk_fuzzy_auto_matches_brute(spark, small_corpus, pos_index_dir):
    """topk_fuzzy(fuzziness='auto') == brute disjunctive BM25 over the
    per-token-distance expansion computed independently."""
    from test_phrase import _assert_same_topk, _brute_filtered_topk

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["watrer~ the", "thre~", "zz~"],
            "k": [10, 10, 10],
        }
    )

    def expand(q):
        terms = []
        for piece in q.text.split():
            if piece.endswith("~"):
                tok = piece[:-1]
                terms += [v for v in vocab if _lev(tok, v) <= _auto_fuzzy_dist(tok)]
            else:
                terms.append(piece)
        return terms

    exp = _brute_filtered_topk(
        corpus_pdf,
        queries,
        match_fn=lambda q, t: bool(set(expand(q)) & set(t)),
        terms_fn=expand,
    )
    got = (
        QueryEngine(spark, pos_index_dir)
        .topk_fuzzy(queries, fuzziness="auto")
        .toPandas()
    )
    _assert_same_topk(got, exp)
    with pytest.raises(ValueError):
        QueryEngine(spark, pos_index_dir).topk_fuzzy(queries, fuzziness="2")
