"""Pure unit tests for the composed-query parser.

``QueryEngine._parse_composed_query`` is the single string->spec step
shared by the engine kernel, the pytest brute reference
(test_composed.py) and the DuckDB oracle (driver_queries.py): a parser
bug would corrupt all three identically and pass every downstream
gate.  These hand-written ``(text, expected_spec)`` pairs are the
independent check on that shared step — no Spark session, no corpus,
just string in / spec out.

Mirrors the ES/Lucene query-string surface the reference's users get
from Elasticsearch (/root/reference/README.md:8-11).
"""
from __future__ import annotations

import pytest

from bilies_go_spark.operators.query import QueryEngine

parse = QueryEngine._parse_composed_query


def spec(
    phrases=(),
    should=(),
    prefix=(),
    fuzzy=(),
    neg=(),
    neg_phrases=(),
    fields=(),
    neg_fields=(),
    ranges=(),
    neg_ranges=(),
    boosts=(),
):
    return {
        "phrases": [list(p) for p in phrases],
        "should": list(should),
        "prefix": list(prefix),
        "fuzzy": list(fuzzy),
        "neg": list(neg),
        "neg_phrases": [list(p) for p in neg_phrases],
        "fields": [tuple(f) for f in fields],
        "neg_fields": [tuple(f) for f in neg_fields],
        "ranges": [tuple(r) for r in ranges],
        "neg_ranges": [tuple(r) for r in neg_ranges],
        "boosts": dict(boosts),
    }


CASES = [
    # bare tokens -> SHOULD, analyzer-normalized (lowercase, ascii)
    ("water than", spec(should=["water", "than"])),
    ("Water THAN", spec(should=["water", "than"])),
    # quoted -> MUST phrase; normalization applies inside quotes
    ('"The Quick" fox', spec(phrases=[["the", "quick"]], should=["fox"])),
    # a single-token POSITIVE phrase stays a phrase (only negated ones fold)
    ('"water"', spec(phrases=[["water"]])),
    # negated phrase -> MUST_NOT phrase; whitespace after '-' allowed
    ('-"a b" c', spec(should=["c"], neg_phrases=[["a", "b"]])),
    ('- "a b" c', spec(should=["c"], neg_phrases=[["a", "b"]])),
    # single-token negated phrase folds into the MUST_NOT term list
    ('-"water" x', spec(should=["x"], neg=["water"])),
    # negated term / prefix / fuzzy markers
    ("-stop word", spec(should=["word"], neg=["stop"])),
    ("wat* x", spec(should=["x"], prefix=["wat"])),
    ("watr~ x", spec(should=["x"], fuzzy=["watr"])),
    # adjacent quoted clauses both parse; order is appearance order
    ('"a b""c d"', spec(phrases=[["a", "b"], ["c", "d"]])),
    # punctuation inside a quoted phrase splits like the analyzer does
    ('-"don\'t stop"', spec(neg_phrases=[["don", "t", "stop"]])),
    # empty / all-punctuation quotes contribute nothing
    ('"" x', spec(should=["x"])),
    ('-"" x', spec(should=["x"])),
    ('"!!!" x', spec(should=["x"])),
    # '*'/'~' INSIDE quotes are analyzer-stripped, not clause markers
    ('"run*" x', spec(phrases=[["run"]], should=["x"])),
    # everything at once, neg-phrase extracted before the phrase pass
    (
        '"the of" -"he was" -water to* numbr~ one',
        spec(
            phrases=[["the", "of"]],
            should=["one"],
            prefix=["to"],
            fuzzy=["numbr"],
            neg=["water"],
            neg_phrases=[["he", "was"]],
        ),
    ),
    # field-scoped clauses: values verbatim (NOT analyzed), negation
    # splits into neg_fields; field name must look like an identifier
    ("lang:en x", spec(should=["x"], fields=[("lang", "en")])),
    ("-lang:zh x", spec(should=["x"], neg_fields=[("lang", "zh")])),
    (
        "lang:en -source:src4 water",
        spec(
            should=["water"],
            fields=[("lang", "en")],
            neg_fields=[("source", "src4")],
        ),
    ),
    # value is verbatim: case/punctuation survive (compare-as-is)
    ("source:Src-4 x", spec(should=["x"], fields=[("source", "Src-4")])),
    # Lucene range clauses: [..] inclusive, {..} exclusive, mixed
    # brackets, * = open end; bounds verbatim (numeric typing happens
    # at resolution, not parse)
    (
        "n_chars:[100 TO 500] x",
        spec(should=["x"], ranges=[("n_chars", "100", "500", True, True)]),
    ),
    (
        "n_chars:{100 TO 500} x",
        spec(should=["x"], ranges=[("n_chars", "100", "500", False, False)]),
    ),
    (
        "n_chars:[100 TO 500} x",
        spec(should=["x"], ranges=[("n_chars", "100", "500", True, False)]),
    ),
    (
        "ts:[2024-01-01 TO *] x",
        spec(should=["x"], ranges=[("ts", "2024-01-01", None, True, True)]),
    ),
    # both ends open = the ES `exists` query; negated range -> neg_ranges
    ("lang:[* TO *] x", spec(should=["x"], ranges=[("lang", None, None, True, True)])),
    (
        "-n_chars:[100 TO 500] x",
        spec(should=["x"], neg_ranges=[("n_chars", "100", "500", True, True)]),
    ),
    # a quoted "[a TO b]" is analyzed text, never a range (phrase pass first)
    (
        '"a TO b" x',
        spec(phrases=[["a", "to", "b"]], should=["x"]),
    ),
    # missing TO -> not a range; falls through to the field-clause rule
    ("n_chars:[100 x", spec(should=["x"], fields=[("n_chars", "[100")])),
    # NOT a field clause: name can't start with a digit (times stay text)
    ("12:30 x", spec(should=["12", "30", "x"])),
    # NOT a field clause: uppercase name fails the identifier shape
    ("Lang:en x", spec(should=["lang", "en", "x"])),
    # inside quotes, ':' is analyzer punctuation, not a field marker
    ('"lang:en" x', spec(phrases=[["lang", "en"]], should=["x"])),
    # clause boosts: term / phrase / prefix / fuzzy, keyed by clause
    ("water^2 x", spec(should=["water", "x"], boosts={"water": 2.0})),
    ("water^2.5 x", spec(should=["water", "x"], boosts={"water": 2.5})),
    (
        '"the quick"^3 x',
        spec(phrases=[["the", "quick"]], should=["x"], boosts={"the quick": 3.0}),
    ),
    ("wat*^2 x", spec(should=["x"], prefix=["wat"], boosts={"wat*": 2.0})),
    ("watr~^2 x", spec(should=["x"], fuzzy=["watr"], boosts={"watr~": 2.0})),
    # same clause boosted twice -> max; de-boost < 1 survives an
    # unboosted duplicate (explicit-only max)
    ("water^2 water^3", spec(should=["water", "water"], boosts={"water": 3.0})),
    ("water water^0.5", spec(should=["water", "water"], boosts={"water": 0.5})),
    # boost on scoreless clauses is stripped and ignored
    ("-water^2 x", spec(should=["x"], neg=["water"])),
    ('-"a b"^2 x', spec(should=["x"], neg_phrases=[["a", "b"]])),
    ("lang:en^2 x", spec(should=["x"], fields=[("lang", "en")])),
    # a multi-token bare piece boosts each resulting token
    ("don't^2 x", spec(should=["don", "t", "x"], boosts={"don": 2.0, "t": 2.0})),
    # '^' with no number is not a boost: analyzer strips it
    ("water^ x", spec(should=["water", "x"])),
    # empty-ish inputs
    ("", spec()),
    ("   ", spec()),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0] or "<empty>" for c in CASES])
def test_parse_composed(text, expected):
    assert parse(text) == expected


@pytest.mark.parametrize(
    "bad",
    [
        "-stop-me",  # negated piece analyzes to two terms
        "ab-cd*",    # prefix piece analyzes to two terms
        "a-b~",      # fuzzy piece analyzes to two terms
        "x -",       # bare '-' -> empty negated piece
        "x -!",      # negated punctuation -> empty after analysis
    ],
)
def test_parse_composed_rejects(bad):
    with pytest.raises(ValueError):
        parse(bad)


def test_should_keeps_duplicates_and_appearance_order():
    # the parser does NOT dedup SHOULD terms — topk_composed does
    # (set-fold) — so the parse must preserve what was written
    assert parse("b a b").get("should") == ["b", "a", "b"]
