"""Positional postings + phrase queries: codec roundtrip, kernel vs a
pure-Python brute phrase scorer, adjacency/repeated-term semantics, and
the positional-index requirement.

Phrase contract (driver_queries.bm25_phrase / query.phrase_query_kernel):
a doc matches iff the query's token sequence occurs contiguously in the
doc's token stream; matches are BM25-scored over the phrase's DISTINCT
terms with the engine's pinned ascending-term fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from bilies_go_spark import B_DEFAULT, K1_DEFAULT
from bilies_go_spark.functions.tokenize import tokenize_py
from bilies_go_spark.operators.codec import (
    decode_masked,
    decode_masked_pos,
    encode_postings,
    positions_to_blobs,
    row_to_segment,
    segment_to_row,
)
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import QueryEngine


def test_positions_codec_roundtrip():
    rng = np.random.default_rng(7)
    n = 1000
    ids = np.sort(rng.choice(100_000, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 6, n).astype(np.int64)
    dls = rng.integers(5, 500, n).astype(np.int64)
    flat = [
        np.sort(rng.choice(max(dl, tf), tf, replace=False))
        for tf, dl in zip(tfs, dls)
    ]
    blobs = positions_to_blobs(np.concatenate(flat), tfs)
    seg = encode_postings(ids, tfs, dls, block_size=64, pos_blobs=blobs)
    d, t, ln, p = decode_masked_pos(seg, None)
    assert (d == ids).all() and (t == tfs).all() and (ln == dls).all()
    assert (p == np.concatenate(flat)).all()
    # masked decode agrees with the non-positional twin and restores
    # exactly the selected docs' positions
    nb = len(seg.block_last_doc_id)
    mask = np.zeros(nb, dtype=bool)
    mask[::3] = True
    mask[7:10] = True
    d2, t2, ln2, p2 = decode_masked_pos(seg, mask)
    d3, _, _ = decode_masked(seg, mask)
    assert (d2 == d3).all()
    sel = set(d2.tolist())
    exp = np.concatenate([f for i, f in enumerate(flat) if ids[i] in sel])
    assert (p2 == exp).all()
    # parquet-row roundtrip keeps the positional stream
    seg2 = row_to_segment(segment_to_row("x", 0, seg))
    assert seg2.has_positions
    _, _, _, p4 = decode_masked_pos(seg2, mask)
    assert (p4 == p2).all()
    # non-positional rows stay positional-free
    row_np = segment_to_row("x", 0, encode_postings(ids, tfs, dls, block_size=64))
    assert "positions_vb" not in row_np
    assert not row_to_segment(row_np).has_positions


def _brute_filtered_topk(
    corpus: pd.DataFrame,
    queries: pd.DataFrame,
    match_fn,
    terms_fn=None,
    k1=K1_DEFAULT,
    b=B_DEFAULT,
) -> pd.DataFrame:
    """Reference scorer: docs passing ``match_fn(query_row, doc_tokens)``
    BM25-scored over ``terms_fn(query_row)`` (default: the query text's
    distinct tokens), pure Python over (doc_id, text)."""
    toks = {int(r.doc_id): tokenize_py(r.text) for r in corpus.itertuples(index=False)}
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for q in queries.itertuples(index=False):
        terms = sorted(
            set(terms_fn(q)) if terms_fn else set(tokenize_py(q.text))
        )
        scored = []
        for d, t in toks.items():
            if not match_fn(q, t):
                continue
            score = 0.0
            for term in terms:  # ascending-term pinned fold
                tf = t.count(term)
                if tf == 0 or term not in df:
                    continue
                idf = np.log1p((n_docs - df[term] + 0.5) / (df[term] + 0.5))
                score += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(t) / avgdl))
                )
            if score > 0.0:
                scored.append((d, score))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[: int(q.k)], 1):
            out.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "score"])


def _brute_phrase_topk(corpus, queries, k1=K1_DEFAULT, b=B_DEFAULT):
    def match(q, t):
        phrase = tokenize_py(q.text)
        if not phrase:
            return False
        return any(
            t[i : i + len(phrase)] == phrase
            for i in range(len(t) - len(phrase) + 1)
        )

    return _brute_filtered_topk(corpus, queries, match, k1=k1, b=b)


def _brute_proximity_topk(corpus, queries, k1=K1_DEFAULT, b=B_DEFAULT):
    """Window semantics: some window of slop+1 consecutive tokens
    contains every distinct query term (== minimal covering span <=
    slop)."""

    def match(q, t):
        terms = set(tokenize_py(q.text))
        if not terms:
            return False
        w = int(q.slop) + 1
        return any(
            terms <= set(t[i : i + w]) for i in range(max(len(t) - w + 1, 1))
        )

    return _brute_filtered_topk(corpus, queries, match, k1=k1, b=b)


@pytest.fixture(scope="module")
def pos_index_dir(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pindex"))
    cfg = BuildConfig(
        n_buckets=8,
        block_size=32,
        target_postings_per_salt=200,
        positions=True,
        # low df floor so the build-time positional artifact covers the
        # test vocabulary — every local-path test then exercises the
        # artifact load (equality with distributed is pinned throughout)
        serving_cache_min_df=5,
    )
    build_index(spark, small_corpus, d, cfg)
    return d


PHRASES = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4],
        "text": ["the of", "of the and", "the the", "you that he", "zzz the"],
        "k": [10, 10, 10, 10, 10],
    }
)


def test_phrase_engine_matches_brute(spark, small_corpus, pos_index_dir):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_phrase_topk(corpus_pdf, PHRASES)
    got = (
        QueryEngine(spark, pos_index_dir)
        .topk_phrase(PHRASES)
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
    # the fixture corpus must actually exercise a non-trivial phrase
    assert (exp.groupby("query_id").size() > 0).any()


def test_phrase_adjacency_and_repeats(spark, tmp_path):
    """Hand-built corpus pinning the semantics the brute test can't
    isolate: conjunctive-but-not-adjacent docs are excluded; repeated
    terms need a genuine repeat run; overlapping repeats count."""
    rows = [
        (0, "alpha beta gamma"),       # "alpha beta" matches
        (1, "beta alpha gamma"),       # conjunctive yes, phrase no
        (2, "alpha gamma beta alpha"), # both terms, never adjacent
        (3, "gamma alpha beta"),       # matches at offset 1
        (4, "alpha alpha alpha"),      # "alpha alpha" overlapping repeats
        (5, "alpha beta alpha beta"),  # two occurrences
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), schema="doc_id bigint, text string"
    )
    d = str(tmp_path / "tiny_pos")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100,
        positions=True, build_part_expr="'all'",
    )
    build_index(spark, corpus, d, cfg)
    eng = QueryEngine(spark, d)
    q = pd.DataFrame(
        {"query_id": [0, 1], "text": ["alpha beta", "alpha alpha"], "k": [10, 10]}
    )
    got = eng.topk_phrase(q).toPandas()
    assert sorted(got[got.query_id == 0]["doc_id"]) == [0, 3, 5]
    assert sorted(got[got.query_id == 1]["doc_id"]) == [4]


PROX = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3],
        "text": ["the of", "you that he", "the of and", "zzz the"],
        "slop": [1, 4, 2, 3],
        "k": [10, 10, 10, 10],
    }
)


def _assert_same_topk(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["query_id"].to_numpy() == exp["query_id"].to_numpy()).all()
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )


def test_proximity_engine_matches_brute(spark, small_corpus, pos_index_dir):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_proximity_topk(corpus_pdf, PROX)
    got = QueryEngine(spark, pos_index_dir).topk_proximity(PROX).toPandas()
    _assert_same_topk(got, exp)
    assert len(exp), "fixture must exercise at least one proximity match"


def test_proximity_semantics(spark, tmp_path):
    """Unordered + window-bound pinned on a hand-built corpus."""
    rows = [
        (0, "alpha x beta"),        # span 2
        (1, "beta alpha"),          # span 1, reversed order
        (2, "alpha x x x beta"),    # span 4
        (3, "alpha"),               # missing term
        (4, "beta y y alpha"),      # span 3, reversed
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), schema="doc_id bigint, text string"
    )
    d = str(tmp_path / "tiny_prox")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100,
        positions=True, build_part_expr="'all'",
    )
    build_index(spark, corpus, d, cfg)
    eng = QueryEngine(spark, d)

    def run(slop):
        q = pd.DataFrame(
            {"query_id": [0], "text": ["alpha beta"], "slop": [slop], "k": [10]}
        )
        return sorted(eng.topk_proximity(q).toPandas()["doc_id"])

    assert run(1) == [1]            # only adjacent (either order)
    assert run(2) == [0, 1]
    assert run(3) == [0, 1, 4]
    assert run(4) == [0, 1, 2, 4]


def test_prefix_engine_matches_expanded_brute(spark, small_corpus, pos_index_dir):
    """topk_prefix == brute disjunctive BM25 over the dictionary
    expansion computed independently from the corpus."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["th*", "wa* the", "zzqq*"],
            "k": [10, 10, 10],
        }
    )

    def expand(q):
        terms = []
        for piece in q.text.split():
            if piece.endswith("*"):
                terms += [v for v in vocab if v.startswith(piece[:-1])]
            else:
                terms.append(piece)
        return terms

    exp = _brute_filtered_topk(
        corpus_pdf,
        queries,
        match_fn=lambda q, t: bool(set(expand(q)) & set(t)),
        terms_fn=expand,
    )
    got = QueryEngine(spark, pos_index_dir).topk_prefix(queries).toPandas()
    _assert_same_topk(got, exp)
    # the wide prefix must genuinely expand to >1 term
    assert len({v for v in vocab if v.startswith("th")}) > 1


def test_wildcard_engine_matches_expanded_brute(spark, small_corpus, pos_index_dir):
    """topk_wildcard == brute disjunctive BM25 over the regex expansion
    computed independently from the corpus vocabulary; also pins the
    parser's rejection of out-of-alphabet patterns and the empty
    expansion."""
    import re as _re

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["th?", "w*s the", "*er", "zz?q*"],
            "k": [10, 10, 10, 10],
        }
    )

    def expand(q):
        terms = []
        for piece in q.text.split():
            if "*" in piece or "?" in piece:
                rx = _re.compile(
                    "".join(
                        ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                        for c in piece
                    )
                )
                terms += [v for v in vocab if rx.fullmatch(v)]
            else:
                terms.append(piece)
        return terms

    exp = _brute_filtered_topk(
        corpus_pdf,
        queries,
        match_fn=lambda q, t: bool(set(expand(q)) & set(t)),
        terms_fn=expand,
    )
    eng = QueryEngine(spark, pos_index_dir)
    got = eng.topk_wildcard(queries).toPandas()
    _assert_same_topk(got, exp)
    # the leading-wildcard pattern must genuinely expand to >1 term
    assert len([v for v in vocab if v.endswith("er")]) > 1
    # local == distributed on the same queries
    loc = eng.topk_wildcard(queries, mode="local").toPandas()
    pd.testing.assert_frame_equal(
        loc.sort_values(["query_id", "rank"]).reset_index(drop=True),
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        obj="wildcard local",
    )
    with pytest.raises(ValueError):
        eng.topk_wildcard(
            pd.DataFrame({"query_id": [0], "text": ["bad-pat*"], "k": [5]})
        )


def test_local_mode_equals_distributed(spark, pos_index_dir):
    """The driver-local serving path (term-cache + pandas kernels, no
    Spark job) answers identically to the distributed plan for phrase,
    proximity, and prefix."""
    eng = QueryEngine(spark, pos_index_dir)
    prefix_q = pd.DataFrame(
        {"query_id": [0, 1], "text": ["th*", "wa* the"], "k": [10, 10]}
    )
    for name, run in [
        ("phrase", lambda m: eng.topk_phrase(PHRASES, mode=m)),
        ("proximity", lambda m: eng.topk_proximity(PROX, mode=m)),
        ("prefix", lambda m: eng.topk_prefix(prefix_q, mode=m)),
    ]:
        dist = run("distributed").toPandas().sort_values(["query_id", "rank"])
        loc = run("local").toPandas().sort_values(["query_id", "rank"])
        pd.testing.assert_frame_equal(
            loc.reset_index(drop=True), dist.reset_index(drop=True), obj=name
        )
        assert len(dist), f"{name}: fixture produced no rows"


def test_fuzzy_engine_matches_expanded_brute(spark, small_corpus, pos_index_dir):
    """topk_fuzzy == brute disjunctive BM25 over the Levenshtein<=1
    dictionary expansion computed independently (pure-Python edit
    distance over the corpus vocabulary)."""

    def lev(a: str, b: str) -> int:
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["thre~", "watr~ the", "zzqqx~"],
            "k": [10, 10, 10],
        }
    )

    def expand(q):
        terms = []
        for piece in q.text.split():
            if piece.endswith("~"):
                terms += [v for v in vocab if lev(piece[:-1], v) <= 1]
            else:
                terms.append(piece)
        return terms

    exp = _brute_filtered_topk(
        corpus_pdf,
        queries,
        match_fn=lambda q, t: bool(set(expand(q)) & set(t)),
        terms_fn=expand,
    )
    got = QueryEngine(spark, pos_index_dir).topk_fuzzy(queries).toPandas()
    _assert_same_topk(got, exp)
    # the fuzzy tokens must genuinely expand (typo -> real terms)
    assert len([v for v in vocab if lev("thre", v) <= 1]) >= 1


def test_fuzzy_variant_dictionary_equals_scan(spark, pos_index_dir):
    """build_index materializes the SymSpell deletion-variant table;
    expand_fuzzy answers from the pruned dictionary lookup and must
    equal the legacy full-vocabulary-scan join exactly."""
    eng = QueryEngine(spark, pos_index_dir)
    assert eng._tv_roots(), "build_index should write term_variants/"
    toks = ["watr", "thre", "zzqqx", "the"]
    fast = eng.expand_fuzzy(toks)
    scan = eng._expand_fuzzy_scan(toks)
    assert fast == scan
    assert fast["watr"], "typo must expand to at least one real term"
    assert fast["zzqqx"] == []


def test_fuzzy_dictionary_requires_variants_for_every_vocab_root(
    spark, pos_index_dir, monkeypatch
):
    """ADVICE r4 (medium): the dictionary path is taken only when EVERY
    vocabulary root has its variants twin — an index whose base
    generation predates term_variants but that gained a tier WITH
    tier_term_variants must fall back to the vocabulary scan instead of
    silently missing the entire base vocabulary."""
    eng = QueryEngine(spark, pos_index_dir)
    full = eng.expand_fuzzy(["watr", "thre"])

    # simulate the mismatched index: a second vocabulary root (a tier)
    # whose variants twin does not exist
    class _Paths:
        def __init__(self, real):
            self._r = real
            self.term_stats = real.term_stats
            self.term_variants = real.term_variants

        def tier_term_stats(self, t):
            return self.term_stats  # exists

        def tier_term_variants(self, t):
            return self.term_variants + "_missing_tier"  # does not

    monkeypatch.setattr(eng, "paths", _Paths(eng.paths))
    monkeypatch.setattr(eng, "tiers", ["t0"])
    assert eng._tv_roots() == []  # mismatch detected -> scan path
    calls = []
    real_scan = eng._expand_fuzzy_scan

    def spy(toks, auto=False, dist=None):
        calls.append(list(toks))
        return real_scan(toks, auto=auto, dist=dist)

    monkeypatch.setattr(eng, "_expand_fuzzy_scan", spy)
    got = eng.expand_fuzzy(["watr", "thre"])
    assert calls, "mismatched variants coverage must route to the scan"
    assert got == full


def test_phrase_sharded_equals_distributed(spark, pos_index_dir):
    """The doc-range-sharded phrase plan (positions sliced at block
    boundaries, per-shard verification, window merge) is
    result-identical to the one-task-per-query plan."""
    eng = QueryEngine(spark, pos_index_dir)
    dist = eng.topk_phrase(PHRASES).toPandas()
    for n_shards in (3, 8):
        shard = eng.topk_phrase(PHRASES, n_shards=n_shards).toPandas()
        key = ["query_id", "rank"]
        a = shard.sort_values(key).reset_index(drop=True)
        b = dist.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, obj=f"n_shards={n_shards}")
    assert len(dist)


def test_proximity_sharded_equals_distributed(spark, pos_index_dir):
    """The doc-range-sharded proximity plan (positions sliced at block
    boundaries, per-shard minimal-covering-window sweep, window merge)
    is result-identical to the one-task-per-query plan — the shard gate
    that proves no task needs a full hot-term posting list."""
    eng = QueryEngine(spark, pos_index_dir)
    dist = eng.topk_proximity(PROX).toPandas()
    for n_shards in (3, 8):
        shard = eng.topk_proximity(PROX, n_shards=n_shards).toPandas()
        key = ["query_id", "rank"]
        a = shard.sort_values(key).reset_index(drop=True)
        b = dist.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, obj=f"n_shards={n_shards}")
    assert len(dist)


def _brute_highlight(corpus_pdf, queries, k1=K1_DEFAULT, b=B_DEFAULT):
    """Reference: conjunctive BM25 top-k; per hit the minimal covering
    window over all query terms (equal spans -> leftmost) and its token
    snippet."""
    toks = {int(r.doc_id): tokenize_py(r.text) for r in corpus_pdf.itertuples(index=False)}
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = []
    for q in queries.itertuples(index=False):
        qts = sorted(set(tokenize_py(q.text)))
        scored = []
        for d, t in toks.items():
            if not all(term in t for term in qts):
                continue
            score = 0.0
            for term in qts:
                tf = t.count(term)
                idf = np.log1p((n_docs - df[term] + 0.5) / (df[term] + 0.5))
                score += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(t) / avgdl))
                )
            best = None  # (span, end, start)
            for e_idx, tok in enumerate(t):
                if tok not in qts:
                    continue
                last = {}
                for term in qts:
                    occ = [i for i in range(e_idx + 1) if t[i] == term]
                    if not occ:
                        last = None
                        break
                    last[term] = occ[-1]
                if last is None:
                    continue
                s = min(last.values())
                cand = (e_idx - s, e_idx, s)
                if best is None or cand[:2] < best[:2]:
                    best = cand
            assert best is not None
            scored.append((d, score, best[2], best[1], " ".join(t[best[2] : best[1] + 1])))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, sc, s, e, snip) in enumerate(scored[: int(q.k)], 1):
            out.append((int(q.query_id), rank, d, sc, s, e, snip))
    return pd.DataFrame(
        out,
        columns=["query_id", "rank", "doc_id", "score", "win_start", "win_end", "snippet"],
    )


def test_highlight_windows_match_brute(spark, small_corpus, pos_index_dir):
    """search_highlight: conjunctive top-k, minimal covering window
    (leftmost tie-break), and analyzed-token snippet all equal the
    pure-Python argmin reference; absent-term query returns empty."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["the of", "water", "the of water", "zzqx the"],
            "k": [8, 5, 8, 5],
        }
    )
    exp = _brute_highlight(corpus_pdf, queries)
    eng = QueryEngine(spark, pos_index_dir)
    got = (
        eng.search_highlight(queries, docs_df=small_corpus.select("doc_id", "text"))
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for col in ("query_id", "doc_id", "win_start", "win_end", "snippet"):
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    assert (exp.groupby("query_id").size().get(0, 0) or 0) > 0
    assert (exp.groupby("query_id").size().get(3, 0) or 0) == 0
    # char offsets index the ORIGINAL text: the fragment is exactly the
    # raw slice under the window, and re-offsetting with the reference
    # token_offsets_py reproduces (char_start, char_end) for every hit
    from bilies_go_spark.functions.tokenize import token_offsets_py

    text_by_id = dict(
        zip(corpus_pdf["doc_id"].astype(int), corpus_pdf["text"])
    )
    import re as _re

    qtext_by_id = dict(zip(queries["query_id"].astype(int), queries["text"]))
    for r in got.itertuples(index=False):
        t = text_by_id[int(r.doc_id)]
        spans = token_offsets_py(t)
        assert int(r.char_start) == spans[int(r.win_start)][0]
        assert int(r.char_end) == spans[int(r.win_end)][1]
        assert r.fragment == t[int(r.char_start) : int(r.char_end)]
        # analyzed fragment tokens == the snippet's tokens
        assert tokenize_py(r.fragment) == r.snippet.split(" ")
        # <em> tagging: stripping the tags recovers the raw fragment;
        # exactly the window tokens that analyze to a query term are
        # wrapped (conjunctive window => at least one wrap per hit)
        assert _re.sub("</?em>", "", r.fragment_em) == r.fragment
        tset = set(tokenize_py(qtext_by_id[int(r.query_id)]))
        wrapped = _re.findall("<em>(.*?)</em>", r.fragment_em)
        assert len(wrapped) >= 1
        assert all(w.lower() in tset for w in wrapped)
        win_toks = [
            t[a:z].lower()
            for a, z in spans[int(r.win_start) : int(r.win_end) + 1]
        ]
        assert len(wrapped) == sum(1 for w in win_toks if w in tset)
    # windows-only surface (no docs_df): same rows, no snippet column
    wins = eng.search_highlight(queries).toPandas()
    assert "snippet" not in wins.columns and len(wins) >= len(exp)
    # doc-range-sharded plan == one-task plan, window-for-window (the
    # argmin is doc-local, so windows ride through the shard merge)
    for n_shards in (3, 8):
        shard = (
            eng.search_highlight(
                queries, docs_df=small_corpus.select("doc_id", "text"), n_shards=n_shards
            )
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(shard, got, obj=f"n_shards={n_shards}")


def test_auto_sharding_picks_and_matches(spark, pos_index_dir):
    """``n_shards=None`` (the distributed default) picks the shard
    count from the heaviest query's estimated posting volume: on this
    small corpus it stays at the one-task plan, and with the target
    forced down it routes through the sharded plan with identical
    results — the all-hot 10^12-doc case needs no mode knob."""
    key = ["query_id", "rank"]
    eng = QueryEngine(spark, pos_index_dir)
    assert eng._auto_shards_qt(eng._phrase_qt_rows(PHRASES)) == 1
    base = eng.topk_phrase(PHRASES).toPandas()

    forced = QueryEngine(spark, pos_index_dir)
    forced.SHARD_TARGET_POSTINGS = 1  # every posting volume counts as hot
    assert forced._auto_shards_qt(forced._phrase_qt_rows(PHRASES)) > 1
    auto = forced.topk_phrase(PHRASES).toPandas()
    pd.testing.assert_frame_equal(
        auto.sort_values(key).reset_index(drop=True),
        base.sort_values(key).reset_index(drop=True),
    )
    prox_base = eng.topk_proximity(PROX).toPandas()
    prox_auto = forced.topk_proximity(PROX).toPandas()
    pd.testing.assert_frame_equal(
        prox_auto.sort_values(key).reset_index(drop=True),
        prox_base.sort_values(key).reset_index(drop=True),
    )


def test_heavy_local_queries_route_to_sharded_plan(spark, pos_index_dir):
    """mode='local' consults the SAME posting-volume estimator as
    distributed (round-4 verdict item 1): a heavy query routes to the
    doc-range-sharded plan instead of the single-threaded driver sweep,
    with identical results; n_shards=1 still forces the driver path."""
    key = ["query_id", "rank"]
    eng = QueryEngine(spark, pos_index_dir)
    base_ph = eng.topk_phrase(PHRASES, mode="local", n_shards=1).toPandas()
    base_px = eng.topk_proximity(PROX, mode="local", n_shards=1).toPandas()

    forced = QueryEngine(spark, pos_index_dir)
    forced.SHARD_TARGET_POSTINGS = 1  # every query counts as heavy
    routed = {}
    orig_ph, orig_px = (
        QueryEngine.topk_phrase_sharded,
        QueryEngine.topk_proximity_sharded,
    )
    forced.topk_phrase_sharded = lambda *a, **k: routed.__setitem__(
        "ph", True
    ) or orig_ph(forced, *a, **k)
    forced.topk_proximity_sharded = lambda *a, **k: routed.__setitem__(
        "px", True
    ) or orig_px(forced, *a, **k)
    got_ph = forced.topk_phrase(PHRASES, mode="local").toPandas()
    got_px = forced.topk_proximity(PROX, mode="local").toPandas()
    assert routed == {"ph": True, "px": True}, "local heavy queries must shard"
    for got, base in ((got_ph, base_ph), (got_px, base_px)):
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True),
            base.sort_values(key).reset_index(drop=True),
        )
    assert len(got_ph) and len(got_px)


def test_pos_artifact_built_and_equals_decode_fill(
    spark, pos_index_dir, monkeypatch
):
    """build_pos_cache persists each hot term's (ids, tfs, dls, sorted
    keys) arrays at build time; the serving path loads them O(read)
    and must answer exactly like the legacy decode+sort fill
    (BGS_POS_ARTIFACT=0)."""
    import json
    import os

    from bilies_go_spark.operators.index_build import IndexPaths

    root = IndexPaths(pos_index_dir).pos_cache
    tdirs = [n for n in os.listdir(root) if n.startswith("t_")]
    assert tdirs, "positional build must materialize the serving artifact"
    with open(os.path.join(root, tdirs[0], "meta.json")) as f:
        assert "term" in json.load(f)

    key = ["query_id", "rank"]
    eng = QueryEngine(spark, pos_index_dir)
    assert eng._pos_artifact
    hits = []
    real = eng._pos_artifact_entry
    eng._pos_artifact_entry = lambda t, r: hits.append(t) or real(t, r)
    art_ph = eng.topk_phrase(PHRASES, mode="local", n_shards=1).toPandas()
    art_px = eng.topk_proximity(PROX, mode="local", n_shards=1).toPandas()
    assert hits, "the serving fill must consult the artifact"
    # the common terms genuinely load from the artifact (not a miss)
    assert real("the", eng._seg_rows(["the"])) is not None

    monkeypatch.setenv("BGS_POS_ARTIFACT", "0")
    dec = QueryEngine(spark, pos_index_dir)
    assert not dec._pos_artifact
    dec_ph = dec.topk_phrase(PHRASES, mode="local", n_shards=1).toPandas()
    dec_px = dec.topk_proximity(PROX, mode="local", n_shards=1).toPandas()
    for a, b in ((art_ph, dec_ph), (art_px, dec_px)):
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
    assert len(art_ph) and len(art_px)


def test_pos_artifact_respects_tombstones_and_tiers(
    spark, small_corpus, tmp_path_factory, monkeypatch
):
    """The persisted arrays are a pure function of the BASE segments:
    the loader must mask tombstones and merge live tier runs at read
    time.  Delete some phrase matches, fold a second corpus half as a
    delta tier, and pin artifact == decode on every positional local
    surface."""
    from bilies_go_spark.operators.deletes import delete_docs
    from bilies_go_spark.operators.index_build import IndexPaths
    from bilies_go_spark.streaming.ingest import compact_tiered, ingest_batch
    from bilies_go_spark.plans.lineage import Lineage

    cfg = BuildConfig(
        n_buckets=8,
        block_size=32,
        target_postings_per_salt=200,
        positions=True,
        serving_cache_min_df=5,
    )
    d = str(tmp_path_factory.mktemp("pindex_dt"))
    half1 = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half2 = small_corpus.filter(F.col("doc_id") % 2 == 1)
    build_index(spark, half1, d, cfg)
    paths = IndexPaths(d)
    # tier: fold the odd half as a delta (base artifact is now partial)
    ingest_batch(spark, half2, 1, paths, cfg, Lineage(d))
    assert compact_tiered(spark, d, cfg) is not None
    # tombstones: kill a few docs that match "the of"/"you that he"
    eng0 = QueryEngine(spark, d)
    victims = (
        eng0.topk_phrase(PHRASES.head(1), mode="local", n_shards=1)
        .toPandas()["doc_id"].head(3).tolist()
    )
    assert victims
    delete_docs(spark, d, victims)

    key = ["query_id", "rank"]
    art = QueryEngine(spark, d)
    assert art._pos_artifact and art.tiers and art.deleted is not None
    got = {
        "ph": art.topk_phrase(PHRASES, mode="local", n_shards=1).toPandas(),
        "px": art.topk_proximity(PROX, mode="local", n_shards=1).toPandas(),
    }
    assert not set(victims) & set(got["ph"]["doc_id"])
    monkeypatch.setenv("BGS_POS_ARTIFACT", "0")
    dec = QueryEngine(spark, d)
    exp = {
        "ph": dec.topk_phrase(PHRASES, mode="local", n_shards=1).toPandas(),
        "px": dec.topk_proximity(PROX, mode="local", n_shards=1).toPandas(),
    }
    for k in got:
        pd.testing.assert_frame_equal(
            got[k].sort_values(key).reset_index(drop=True),
            exp[k].sort_values(key).reset_index(drop=True),
            obj=k,
        )
    # tier docs (odd ids) genuinely appear through the artifact path
    assert (got["ph"]["doc_id"] % 2 == 1).any()
    assert len(got["ph"]) and len(got["px"])


def test_boolean_negation_matches_brute(spark, small_corpus, pos_index_dir):
    """topk_boolean: OR of positive terms, docs with ANY negated term
    excluded — equals brute, and local == distributed."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["the -of", "you that -he", "the -the"],
            "k": [10, 10, 10],
        }
    )

    def parts(q):
        pos, neg = [], []
        for piece in q.text.split():
            (neg if piece.startswith("-") else pos).append(piece.lstrip("-"))
        return pos, neg

    exp = _brute_filtered_topk(
        corpus_pdf,
        queries,
        match_fn=lambda q, t: bool(set(parts(q)[0]) & set(t))
        and not (set(parts(q)[1]) & set(t)),
        terms_fn=lambda q: parts(q)[0],
    )
    eng = QueryEngine(spark, pos_index_dir)
    got = eng.topk_boolean(queries).toPandas()
    _assert_same_topk(got, exp)
    loc = eng.topk_boolean(queries, mode="local").toPandas()
    _assert_same_topk(loc, exp)
    # the negation must actually exclude something, and -the empties q2
    assert len(exp[exp.query_id == 2]) == 0
    assert len(exp[exp.query_id == 0]) > 0


def test_phrase_respects_tombstones(spark, tmp_path):
    from bilies_go_spark.operators.deletes import delete_docs

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta delta"),
        (2, "beta alpha"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]), schema="doc_id bigint, text string"
    )
    d = str(tmp_path / "tiny_del")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100,
        positions=True, build_part_expr="'all'",
    )
    build_index(spark, corpus, d, cfg)
    q = pd.DataFrame({"query_id": [0], "text": ["alpha beta"], "k": [10]})
    before = sorted(QueryEngine(spark, d).topk_phrase(q).toPandas()["doc_id"])
    assert before == [0, 1]
    delete_docs(spark, d, [0])
    after = sorted(QueryEngine(spark, d).topk_phrase(q).toPandas()["doc_id"])
    assert after == [1]
    # the newest positional surfaces honor the same tombstones: the
    # deleted doc vanishes from highlight hits, composed results, and
    # the local cached paths alike
    eng = QueryEngine(spark, d)
    hq = pd.DataFrame({"query_id": [0], "text": ["alpha beta"], "k": [10]})
    assert sorted(eng.search_highlight(hq).toPandas()["doc_id"]) == [1, 2]
    cq = pd.DataFrame({"query_id": [0], "text": ['"alpha beta" gamma'], "k": [10]})
    assert sorted(eng.topk_composed(cq).toPandas()["doc_id"]) == [1]
    assert sorted(eng.topk_composed(cq, mode="local").toPandas()["doc_id"]) == [1]


def test_phrase_on_streamed_tiered_index(spark, tmp_path):
    """Positional streams survive the streaming ingest + tiered
    compaction path: a phrase query over base + delta tiers answers
    identically to a batch-built positional index."""
    from bilies_go_spark.streaming.ingest import compact_tiered, start_ingest

    rows = [
        (0, "alpha beta gamma"),
        (1, "beta alpha gamma"),
        (2, "gamma alpha beta"),
        (3, "alpha alpha beta beta"),
        (4, "delta alpha beta delta"),
        (5, "beta gamma alpha"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf, schema="doc_id bigint, text string").repartition(
        3
    ).write.parquet(src)
    idx = str(tmp_path / "stream_pos")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100, positions=True
    )
    q = start_ingest(
        spark, src, idx, cfg, max_files_per_trigger=1,
        schema="doc_id bigint, text string",
    )
    q.awaitTermination()
    compact_tiered(spark, idx, cfg)
    eng = QueryEngine(spark, idx)
    assert eng.meta["positions"] is True
    queries = pd.DataFrame(
        {"query_id": [0, 1], "text": ["alpha beta", "gamma alpha"], "k": [10, 10]}
    )
    got = eng.topk_phrase(queries).toPandas()
    assert sorted(got[got.query_id == 0]["doc_id"]) == [0, 2, 3, 4]
    assert sorted(got[got.query_id == 1]["doc_id"]) == [2, 5]


def test_composed_and_highlight_on_streamed_tiered_index(spark, tmp_path):
    """The composed bool pipeline (incl. a negated phrase) and the
    highlight windows answer identically over base + delta tiers as
    they would over a batch-built index — the positional streams union
    across tiers on every path."""
    from bilies_go_spark.streaming.ingest import compact_tiered, start_ingest

    rows = [
        (0, "alpha beta gamma"),
        (1, "beta alpha gamma"),
        (2, "gamma alpha beta"),
        (3, "alpha alpha beta beta"),
        (4, "delta alpha beta delta"),
        (5, "beta gamma alpha"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf, schema="doc_id bigint, text string").repartition(
        3
    ).write.parquet(src)
    idx = str(tmp_path / "stream_pos_c")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100, positions=True
    )
    q = start_ingest(
        spark, src, idx, cfg, max_files_per_trigger=1,
        schema="doc_id bigint, text string",
    )
    q.awaitTermination()
    compact_tiered(spark, idx, cfg)
    eng = QueryEngine(spark, idx)
    # composed: MUST phrase + negated phrase + bare SHOULD term
    comp = eng.topk_composed(
        pd.DataFrame(
            {"query_id": [0], "text": ['"alpha beta" -"delta alpha" gamma'], "k": [10]}
        )
    ).toPandas()
    # docs with "alpha beta": 0, 2, 3, 4; doc 4 contains "delta alpha"
    assert sorted(comp["doc_id"]) == [0, 2, 3]
    # highlight: window covers {beta, gamma} minimally, leftmost
    hl = eng.search_highlight(
        pd.DataFrame({"query_id": [0], "text": ["beta gamma"], "k": [10]})
    ).toPandas()
    by_doc = {int(r.doc_id): (int(r.win_start), int(r.win_end)) for r in hl.itertuples()}
    # doc 0 "alpha beta gamma" -> [1, 2]; doc 5 "beta gamma alpha" -> [0, 1]
    assert by_doc[0] == (1, 2) and by_doc[5] == (0, 1)
    assert set(by_doc) == {0, 1, 2, 5}  # every doc containing both terms


def test_phrase_requires_positional_index(spark, small_corpus, tmp_path):
    d = str(tmp_path / "plain")
    build_index(
        spark, small_corpus, d, BuildConfig(n_buckets=4, target_postings_per_salt=200)
    )
    with pytest.raises(ValueError, match="positions=True"):
        QueryEngine(spark, d).topk_phrase(PHRASES)


# --- ordered span (span_near in_order) ---------------------------------------

def _has_ordered_span(t: list, cseq: list, slop: int) -> bool:
    """Independent reference: DP with explicit prefix-max over chain
    starts (does not share the engine's latest-predecessor shortcut)."""
    import bisect

    occ = [[i for i, w in enumerate(t) if w == c] for c in cseq]
    if any(not o for o in occ):
        return False
    best = {p: p for p in occ[0]}
    for o in occ[1:]:
        prev = sorted(best)
        run_max, m = [], -1
        for p in prev:
            m = max(m, best[p])
            run_max.append(m)
        nb = {}
        for q in o:
            i = bisect.bisect_left(prev, q) - 1
            if i >= 0:
                nb[q] = run_max[i]
        best = nb
        if not best:
            return False
    n = len(cseq)
    return any(q - s + 1 - n <= slop for q, s in best.items())


def _brute_span(corpus_pdf, queries):
    toks = {
        int(r.doc_id): tokenize_py(r.text)
        for r in corpus_pdf.itertuples(index=False)
    }
    toks = {d: t for d, t in toks.items() if t}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    out = []
    for q in queries.itertuples(index=False):
        cseq = tokenize_py(q.text)
        terms = sorted(set(cseq))
        scored = []
        for d, t in toks.items():
            if not _has_ordered_span(t, cseq, int(q.slop)):
                continue
            s = 0.0
            for w in terms:
                tf = t.count(w)
                if tf == 0 or w not in df:
                    continue
                idf = np.log1p((n_docs - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * (tf * (K1_DEFAULT + 1.0)) / (
                    tf + K1_DEFAULT * (1.0 - B_DEFAULT + B_DEFAULT * (len(t) / avgdl))
                )
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[: int(q.k)], 1):
            out.append((int(q.query_id), rank, d, s))
    return pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "score"])


SPAN = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "the of",          # slop 0 == phrase
            "the of",          # widened
            "of the",          # reverse order: different matches
            "the water the",   # 3 clauses, duplicate term
            "water water",     # duplicate clause
            "zzqx the",        # absent -> empty
        ],
        "k": [10, 10, 10, 10, 10, 10],
        "slop": [0, 3, 3, 4, 5, 2],
    }
)


def test_span_near_matches_brute_all_paths(spark, small_corpus, pos_index_dir):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_span(corpus_pdf, SPAN)
    eng = QueryEngine(spark, pos_index_dir)
    key = ["query_id", "rank"]

    def chk(got):
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e)
        assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()
        np.testing.assert_allclose(
            g["score"].to_numpy(), e["score"].to_numpy(), rtol=0, atol=1e-9
        )

    dist = eng.topk_span_near(SPAN).toPandas()
    chk(dist)
    chk(eng.topk_span_near(SPAN, mode="local").toPandas())
    shard = eng.topk_span_near(SPAN, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )
    per_q = exp.groupby("query_id").size()
    assert all(per_q.get(i, 0) > 0 for i in (0, 1, 2, 3, 4))
    assert per_q.get(5, 0) == 0
    # slop widening must add matches; order must matter on this fixture
    full = _brute_span(corpus_pdf, SPAN.assign(k=10_000))
    fq = full.groupby("query_id").size()
    assert fq[1] > fq[0]
    assert not full[full["query_id"] == 1].equals(full[full["query_id"] == 2])
    # slop 0 == the phrase query, rank for rank
    ph = eng.topk_phrase(
        pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [10]})
    ).toPandas()
    pd.testing.assert_frame_equal(
        dist[dist["query_id"] == 0].sort_values(key).reset_index(drop=True),
        ph.sort_values(key).reset_index(drop=True),
    )


def test_span_first_matches_brute_all_paths(spark, small_corpus, pos_index_dir):
    """span_first == ordered span restricted to matches whose last
    position < first (0-based; exclusive span end <= first — Lucene's
    `end`).  first=0 means unlimited; brute reference enumerates
    chains independently."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    sfq = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["the", "the of", "water", "zzqx"],
            "k": [10, 10, 10, 10],
            "slop": [0, 2, 0, 0],
            "first": [1, 8, 0, 4],
        }
    )
    toks = {
        int(r.doc_id): tokenize_py(r.text)
        for r in corpus_pdf.itertuples(index=False)
    }

    def matches(t, cseq, slop, first):
        limited = t[:first] if first > 0 else t
        # chain must fit inside the first-N prefix entirely
        return _has_ordered_span(limited, cseq, slop)

    eng = QueryEngine(spark, pos_index_dir)
    dist = eng.topk_span_first(sfq).toPandas()
    for q in sfq.itertuples(index=False):
        cseq = tokenize_py(q.text)
        exp_docs = sorted(
            d
            for d, t in toks.items()
            if t and matches(t, cseq, int(q.slop), int(q.first))
        )
        got_docs = sorted(dist[dist["query_id"] == q.query_id]["doc_id"])
        full = sorted(
            d for d, t in toks.items() if t and _has_ordered_span(t, cseq, int(q.slop))
        )
        if len(exp_docs) > int(q.k):
            assert set(got_docs) <= set(exp_docs)
        else:
            assert got_docs == exp_docs
        if q.query_id == 0:
            # docs STARTING with "the" are a strict subset of docs containing it
            assert len(exp_docs) < len(full) and len(exp_docs) > 0
    # local path identical
    loc = eng.topk_span_first(sfq, mode="local").toPandas()
    pd.testing.assert_frame_equal(
        loc.sort_values(["query_id", "rank"]).reset_index(drop=True),
        dist.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="first"):
        eng.topk_span_first(sfq.drop(columns=["first"]))


MPP = pd.DataFrame(
    {
        "query_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "the o",        # fixed "the", prefix "o" (of/on/or/out/...)
            "of th",        # hot fixed + hot prefix (the/that/they/...)
            "you that h",   # two fixed slots
            "the the",      # prefix "the" expands to itself and th*-terms
            "the zzqx",     # prefix matches no vocabulary term -> empty
            "zzqx th",      # fixed term absent -> empty
        ],
        "k": [10, 10, 10, 10, 10, 10],
    }
)


def _brute_mpp(corpus, queries, k1=K1_DEFAULT, b=B_DEFAULT):
    """match_phrase_prefix reference: fixed tokens contiguous, the next
    token starts with the prefix; scored over the FIXED tokens only."""

    def match(q, t):
        toks = tokenize_py(q.text)
        fixed, prefix = toks[:-1], toks[-1]
        m = len(fixed)
        return any(
            t[i : i + m] == fixed and t[i + m].startswith(prefix)
            for i in range(len(t) - m)
        )

    def terms(q):
        return tokenize_py(q.text)[:-1]

    return _brute_filtered_topk(corpus, queries, match, terms_fn=terms, k1=k1, b=b)


def test_match_phrase_prefix_matches_brute_all_paths(
    spark, small_corpus, pos_index_dir
):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    exp = _brute_mpp(corpus_pdf, MPP)
    eng = QueryEngine(spark, pos_index_dir)
    key = ["query_id", "rank"]

    def chk(got):
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e)
        assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()
        np.testing.assert_allclose(
            g["score"].to_numpy(), e["score"].to_numpy(), rtol=0, atol=1e-9
        )

    dist = eng.topk_match_phrase_prefix(MPP, n_shards=1).toPandas()
    chk(dist)
    chk(eng.topk_match_phrase_prefix(MPP, n_shards=1, mode="local").toPandas())
    shard = eng.topk_match_phrase_prefix(MPP, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )
    per_q = exp.groupby("query_id").size()
    assert all(per_q.get(i, 0) > 0 for i in (0, 1, 2, 3))
    assert per_q.get(4, 0) == 0 and per_q.get(5, 0) == 0
    # the prefix must genuinely widen beyond the exact phrase: "the o"
    # matches more docs than the exact phrase "the of"
    full_mpp = _brute_mpp(corpus_pdf, MPP.assign(k=10_000))
    full_ph = _brute_phrase_topk(
        corpus_pdf,
        pd.DataFrame({"query_id": [0], "text": ["the of"], "k": [10_000]}),
    )
    assert (
        full_mpp[full_mpp["query_id"] == 0].shape[0]
        > full_ph[full_ph["query_id"] == 0].shape[0]
    )
    # a single-token query (no fixed slot) is rejected loudly
    with pytest.raises(ValueError, match="fixed token"):
        eng.topk_match_phrase_prefix(
            pd.DataFrame({"query_id": [0], "text": ["th"], "k": [5]})
        )


def test_match_phrase_prefix_semantics(spark, tmp_path):
    """Hand-built corpus pinning the mpp contract: the expansion slot
    must IMMEDIATELY follow the fixed run; a doc ending at the fixed
    run (no next token) does not match; the prefix may match the exact
    term itself; a term can serve as fixed slot and expansion at once."""
    rows = [
        (0, "alpha beta gamma"),   # "alpha be" matches (beta), "alpha beta ga" matches
        (1, "alpha gamma beta"),   # "alpha be" no (gamma follows alpha)
        (2, "gamma alpha"),        # "gamma al" matches (alpha)
        (3, "beta alpha"),         # doc ends after "alpha": "beta alpha" has no NEXT token
        (4, "alpha alpha beta"),   # "alpha al" both-roles: alpha followed by alpha*
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id bigint, text string",
    )
    d = str(tmp_path / "tiny_mpp")
    cfg = BuildConfig(
        n_buckets=4, block_size=4, target_postings_per_salt=100,
        positions=True, build_part_expr="'all'",
    )
    build_index(spark, corpus, d, cfg)
    eng = QueryEngine(spark, d)
    q = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["alpha be", "gamma al", "alpha al", "beta alpha"],
            "k": [10, 10, 10, 10],
        }
    )
    got = eng.topk_match_phrase_prefix(q).toPandas()
    assert sorted(got[got.query_id == 0]["doc_id"]) == [0, 4]
    # doc 1's gamma is followed by beta (not al*); doc 0's gamma is final
    assert sorted(got[got.query_id == 1]["doc_id"]) == [2]
    assert sorted(got[got.query_id == 2]["doc_id"]) == [4]
    # "beta alpha": the expansion slot token may be the prefix itself —
    # doc 3's trailing "alpha" satisfies it; doc 4's beta is final (no
    # next token) and doc 0's beta is followed by gamma
    assert sorted(got[got.query_id == 3]["doc_id"]) == [3]


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein — independent of the engine's bounded
    implementation."""
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_suggest_completions_matches_brute(spark, small_corpus, pos_index_dir):
    """Completion suggester == brute: vocabulary terms starting with
    the prefix ranked by (df desc, term asc), top N."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    df: dict[str, int] = {}
    for r in corpus_pdf.itertuples(index=False):
        for t in set(tokenize_py(r.text)):
            df[t] = df.get(t, 0) + 1
    qs = pd.DataFrame(
        {"query_id": [0, 1, 2], "prefix": ["th", "wa", "zzqx"]}
    )
    got = (
        QueryEngine(spark, pos_index_dir)
        .suggest_completions(qs, n_top=4)
        .toPandas()
    )
    for q in qs.itertuples(index=False):
        exp = sorted(
            ((-df[t], t) for t in df if t.startswith(q.prefix))
        )[:4]
        g = got[got.query_id == q.query_id].sort_values("rank")
        assert list(g["suggestion"]) == [t for _, t in exp]
        assert list(g["df"]) == [-n for n, _ in exp]
    assert (got[got.query_id == 0].shape[0]) >= 3  # the/that/they/...
    assert got[got.query_id == 2].empty


def test_suggest_phrases_matches_brute_all_paths(
    spark, small_corpus, pos_index_dir
):
    """Phrase suggester == brute: AUTO-distance per-slot vocabulary
    candidates, pairs ranked by distinct-doc adjacency counts
    (n_docs desc, pair text asc), original pair excluded; local,
    one-task, and sharded paths identical."""
    from bilies_go_spark.operators.query import _auto_fuzzy_dist

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    toks = {
        int(r.doc_id): tokenize_py(r.text)
        for r in corpus_pdf.itertuples(index=False)
    }
    vocab = sorted({t for ts in toks.values() for t in ts})
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["the of", "watr the", "zzqxa zzqyb"],
        }
    )
    eng = QueryEngine(spark, pos_index_dir)
    got = eng.suggest_phrases(qs, n_top=5).toPandas()
    for q in qs.itertuples(index=False):
        t1, t2 = tokenize_py(q.text)
        c1 = [v for v in vocab if _lev(t1, v) <= _auto_fuzzy_dist(t1)]
        c2 = [v for v in vocab if _lev(t2, v) <= _auto_fuzzy_dist(t2)]
        counts: dict[tuple[str, str], int] = {}
        for d, ts in toks.items():
            seen = {(a, b) for a, b in zip(ts, ts[1:])}
            for a, b in seen:
                if a in c1 and b in c2:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        exp = sorted(
            (-n, a, b) for (a, b), n in counts.items() if (a, b) != (t1, t2)
        )[:5]
        g = got[got.query_id == q.query_id].sort_values("rank")
        assert list(g["suggestion"]) == [f"{a} {b}" for _, a, b in exp]
        assert list(g["n_docs"]) == [-n for n, _a, _b in exp]
    assert not got[got.query_id == 0].empty
    assert got[got.query_id == 2].empty
    # all three paths identical
    key = ["query_id", "rank"]
    loc = eng.suggest_phrases(qs, n_top=5, mode="local").toPandas()
    shd = eng.suggest_phrases(qs, n_top=5, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        loc.sort_values(key).reset_index(drop=True),
        got.sort_values(key).reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(
        shd.sort_values(key).reset_index(drop=True),
        got.sort_values(key).reset_index(drop=True),
    )
    with pytest.raises(ValueError, match="two tokens"):
        eng.suggest_phrases(
            pd.DataFrame({"query_id": [0], "text": ["only"]})
        )


def test_regexp_engine_matches_expanded_brute(spark, small_corpus, pos_index_dir):
    """topk_regexp == brute disjunctive BM25 over the independently
    computed anchored-full-match vocabulary expansion."""
    import re as _re

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "pattern": ["th.", "wat.r", "(the|of)", "zzq.*"],
            "k": [10, 10, 10, 10],
        }
    )

    def expand(q):
        rx = _re.compile(q.pattern)
        return [v for v in vocab if rx.fullmatch(v)]

    def match(q, t):
        return bool(set(expand(q)) & set(t))

    exp = _brute_filtered_topk(corpus_pdf, queries, match, terms_fn=expand)
    eng = QueryEngine(spark, pos_index_dir)
    got = (
        eng.topk_regexp(queries)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    # anchoring: "th." must NOT match "the..." longer terms like "they"
    assert "they" not in expand(queries.iloc[[0]].itertuples(index=False).__next__())
    # local path identical
    loc = eng.topk_regexp(queries, mode="local").toPandas()
    pd.testing.assert_frame_equal(
        loc.sort_values(["query_id", "rank"]).reset_index(drop=True), got
    )
    with pytest.raises(ValueError, match="invalid regexp"):
        eng.topk_regexp(
            pd.DataFrame({"query_id": [0], "pattern": ["(unclosed"], "k": [5]})
        )


def _has_ordered_span_or(t, clauses, slop):
    """Brute: strictly increasing positions, one per clause in order,
    clause i matching ANY of its alternatives, window <= len + slop."""
    n = len(clauses)

    def rec(ci, prev_pos, start):
        if ci == n:
            return True
        for p in range(prev_pos + 1, len(t)):
            if t[p] in clauses[ci]:
                if ci == n - 1 and (p - start + 1) - n > slop:
                    continue
                if (p - start + 1) - n > slop:
                    break
                if rec(ci + 1, p, start):
                    return True
        return False

    for s in range(len(t)):
        if t[s] in clauses[0] and rec(1, s, s):
            return True
    return False


def test_span_or_matches_brute_all_paths(spark, small_corpus, pos_index_dir):
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["the|of and", "you that|he", "the zzqx|of", "zzqa|zzqb the"],
            "slop": [1, 3, 0, 0],
            "k": [10, 10, 10, 10],
        }
    )

    def match(q, t):
        clauses = [
            {tokenize_py(a)[0] for a in piece.split("|")}
            for piece in q.text.split()
        ]
        return _has_ordered_span_or(t, clauses, int(q.slop))

    def terms(q):
        return [
            tokenize_py(a)[0] for piece in q.text.split() for a in piece.split("|")
        ]

    exp = _brute_filtered_topk(corpus_pdf, qs, match, terms_fn=terms)
    eng = QueryEngine(spark, pos_index_dir)
    key = ["query_id", "rank"]

    def chk(got):
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e)
        assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()
        np.testing.assert_allclose(
            g["score"].to_numpy(), e["score"].to_numpy(), rtol=0, atol=1e-9
        )

    dist = eng.topk_span_or(qs, n_shards=1).toPandas()
    chk(dist)
    chk(eng.topk_span_or(qs, n_shards=1, mode="local").toPandas())
    shard = eng.topk_span_or(qs, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )
    per_q = exp.groupby("query_id").size()
    assert per_q.get(0, 0) > 0 and per_q.get(1, 0) > 0
    assert per_q.get(2, 0) > 0  # absent alternative inside a live clause
    assert per_q.get(3, 0) == 0  # whole clause absent
    # alternation must widen the match set vs the single-term span
    wide = _brute_filtered_topk(
        corpus_pdf, qs.assign(k=10_000).iloc[[0]], match, terms_fn=terms
    )
    narrow_q = pd.DataFrame(
        {"query_id": [0], "text": ["the and"], "slop": [1], "k": [10_000]}
    )
    narrow = _brute_filtered_topk(
        corpus_pdf,
        narrow_q,
        lambda q, t: _has_ordered_span_or(
            t, [{"the"}, {"and"}], 1
        ),
        terms_fn=lambda q: ["the", "and"],
    )
    assert len(wide) > len(narrow)


def test_span_not_matches_brute_all_paths(spark, small_corpus, pos_index_dir):
    """span_not == brute: ordered include pair within slop with NO
    exclude occurrence inside [p1, p2]; exclusion must actually fire
    on the fixture; absent exclude == plain span."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    qs = pd.DataFrame(
        {
            "query_id": [0, 1, 2, 3],
            "text": ["the of", "you he", "the of", "zzqa the"],
            "exclude": ["and", "that", "zzqx", "of"],
            "slop": [3, 4, 3, 1],
            "k": [10, 10, 10, 10],
        }
    )

    def match(q, t):
        t1, t2 = tokenize_py(q.text)
        (xt,) = tokenize_py(q.exclude)
        slop = int(q.slop)
        for i, a in enumerate(t):
            if a != t1:
                continue
            for j in range(i + 1, min(i + slop + 2, len(t))):
                if t[j] == t2 and xt not in t[i : j + 1]:
                    return True
        return False

    def terms(q):
        return tokenize_py(q.text)

    exp = _brute_filtered_topk(corpus_pdf, qs, match, terms_fn=terms)
    eng = QueryEngine(spark, pos_index_dir)
    key = ["query_id", "rank"]

    def chk(got):
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)
        assert len(g) == len(e)
        assert (g["doc_id"].to_numpy() == e["doc_id"].to_numpy()).all()
        np.testing.assert_allclose(
            g["score"].to_numpy(), e["score"].to_numpy(), rtol=0, atol=1e-9
        )

    dist = eng.topk_span_not(qs, n_shards=1).toPandas()
    chk(dist)
    chk(eng.topk_span_not(qs, n_shards=1, mode="local").toPandas())
    shard = eng.topk_span_not(qs, n_shards=3).toPandas()
    pd.testing.assert_frame_equal(
        shard.sort_values(key).reset_index(drop=True),
        dist.sort_values(key).reset_index(drop=True),
    )
    # exclusion must genuinely remove docs: q0 (exclude "and") must be
    # a strict subset of q2 (absent exclude, same include span)
    full = _brute_filtered_topk(corpus_pdf, qs.assign(k=10_000), match, terms_fn=terms)
    n0 = (full["query_id"] == 0).sum()
    n2 = (full["query_id"] == 2).sum()
    assert 0 < n0 < n2
    assert full[full["query_id"] == 3].empty
    with pytest.raises(ValueError, match="two tokens"):
        eng.topk_span_not(
            pd.DataFrame(
                {"query_id": [0], "text": ["one two three"], "exclude": ["x"],
                 "slop": [1], "k": [5]}
            )
        )


def test_synonyms_engine_matches_expanded_brute(spark, small_corpus, pos_index_dir):
    """topk_synonyms == brute disjunctive BM25 over the token ∪
    synonym-set expansion; vocabulary-absent synonyms contribute
    nothing; expansion must genuinely widen the match set."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    syn = {"two": ["one"], "water": ["zzqabsent"], "he": ["she"]}
    queries = pd.DataFrame(
        {
            "query_id": [0, 1, 2],
            "text": ["two", "water day", "he"],
            "k": [10, 10, 10],
        }
    )

    def expand(q):
        out = set()
        for tok in tokenize_py(q.text):
            out.add(tok)
            out.update(syn.get(tok, []))
        return sorted(out)

    def match(q, t):
        return bool(set(expand(q)) & set(t))

    exp = _brute_filtered_topk(corpus_pdf, queries, match, terms_fn=expand)
    eng = QueryEngine(spark, pos_index_dir)
    got = (
        eng.topk_synonyms(queries, syn)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    # the synonym must widen: "two"∪"one" matches more than "two" alone
    plain = _brute_filtered_topk(
        corpus_pdf,
        queries.iloc[[0]].assign(k=10_000),
        lambda q, t: "two" in t,
        terms_fn=lambda q: ["two"],
    )
    wide = _brute_filtered_topk(
        corpus_pdf, queries.iloc[[0]].assign(k=10_000), match, terms_fn=expand
    )
    assert len(wide) > len(plain)
    # local path identical
    loc = eng.topk_synonyms(queries, syn, mode="local").toPandas()
    pd.testing.assert_frame_equal(
        loc.sort_values(["query_id", "rank"]).reset_index(drop=True), got
    )
    with pytest.raises(ValueError, match="single term"):
        eng.topk_synonyms(queries, {"two": ["two words"]})


def test_match_phrase_prefix_max_expansions(spark, small_corpus, pos_index_dir):
    """max_expansions == ES cap semantics: only the highest-df
    expansion terms (df desc, term asc) fill the alt slot; the capped
    engine result equals brute over the SAME capped expansion."""
    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    df: dict[str, int] = {}
    for r in corpus_pdf.itertuples(index=False):
        for t in set(tokenize_py(r.text)):
            df[t] = df.get(t, 0) + 1
    cap = 3
    exp_terms = [
        t for _, t in sorted((-df[t], t) for t in df if t.startswith("th"))
    ][:cap]
    q = pd.DataFrame({"query_id": [0], "text": ["the th"], "k": [10]})

    def match(qr, t):
        return any(
            t[i] == "the" and t[i + 1] in exp_terms for i in range(len(t) - 1)
        )

    exp = _brute_filtered_topk(corpus_pdf, q, match, terms_fn=lambda qr: ["the"])
    eng = QueryEngine(spark, pos_index_dir)
    got = (
        eng.topk_match_phrase_prefix(q, n_shards=1, max_expansions=cap)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=0, atol=1e-9
    )
    # the cap must actually bite on this vocabulary
    assert len([t for t in df if t.startswith("th")]) > cap


def test_regexp_prefix_filter_soundness(spark, small_corpus, pos_index_dir):
    """ADVICE r5 (high): the dictionary range filter derived from a
    pattern's literal prefix must never drop matches — top-level
    alternation ('the|of' must still find 'of') and trailing
    quantifiers ('thes?' must still find 'the', 'too*' must still
    find 'to') bail to a sound filter or the full scan."""
    import re as _re

    corpus_pdf = small_corpus.select("doc_id", "text").toPandas()
    vocab = sorted({t for txt in corpus_pdf["text"] for t in tokenize_py(txt)})
    eng = QueryEngine(spark, pos_index_dir)
    pats = ["the|of", "thes?", "too*", "th(e|at)", "to+", "thes{0,1}"]
    got = eng.expand_regexps(pats)
    for p in pats:
        rx = _re.compile(p)
        exp = sorted(v for v in vocab if rx.fullmatch(v))
        assert got[p] == exp, p
    # the regression cases concretely: the buggy prefix ranges dropped
    # these in-vocabulary matches
    assert "of" in got["the|of"]
    assert "the" in got["thes?"]
    assert "to" in got["too*"]
    assert "the" in got["thes{0,1}"]
