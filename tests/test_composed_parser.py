"""Pure unit tests for QueryEngine._parse_composed_query with
HAND-WRITTEN expected specs (no Spark session).

The composed-query engine, the pytest brute reference
(test_composed.py) and the DuckDB oracle (driver_queries.py) all
derive their clause sets from this ONE parser, so a parsing bug would
corrupt all three identically and pass every downstream gate — these
expectations are the independent check on the string->spec step
(round-4 verdict, "What's wrong" #1).
"""

from __future__ import annotations

import pytest

from bilies_go_spark.operators.query import QueryEngine

parse = QueryEngine._parse_composed_query


def spec(phrases=(), should=(), prefix=(), fuzzy=(), neg=(), neg_phrases=()):
    return {
        "phrases": [list(p) for p in phrases],
        "should": list(should),
        "prefix": list(prefix),
        "fuzzy": list(fuzzy),
        "neg": list(neg),
        "neg_phrases": [list(p) for p in neg_phrases],
    }


CASES = [
    # bare tokens -> SHOULD, analyzer-normalized
    ("hello World", spec(should=["hello", "world"])),
    # quoted phrase MUST + bare SHOULD
    ('"foo bar" baz', spec(phrases=[["foo", "bar"]], should=["baz"])),
    # negated multi-token phrase
    ('-"foo bar"', spec(neg_phrases=[["foo", "bar"]])),
    # negated phrase normalizing to ONE token folds into plain MUST_NOT
    ('-"foo"', spec(neg=["foo"])),
    # punctuation inside a negated phrase re-tokenizes to multi-token
    ('-"Foo-Bar"', spec(neg_phrases=[["foo", "bar"]])),
    # space between - and the quote still negates
    ('- "foo bar"', spec(neg_phrases=[["foo", "bar"]])),
    # -term MUST_NOT, term* prefix, term~ fuzzy
    ("-stop go* fast~", spec(should=[], prefix=["go"], fuzzy=["fast"], neg=["stop"])),
    # every clause type in one string, order preserved per kind
    (
        'alpha -"b c" delta "e f" -g h* i~ "j k"',
        spec(
            phrases=[["e", "f"], ["j", "k"]],
            should=["alpha", "delta"],
            prefix=["h"],
            fuzzy=["i"],
            neg=["g"],
            neg_phrases=[["b", "c"]],
        ),
    ),
    # a hyphen INSIDE quotes is not negation — it splits tokens
    ('"a -b"', spec(phrases=[["a", "b"]])),
    # but a hyphen glued BEFORE the quote negates, and the preceding
    # token survives as SHOULD
    ('x-"y z"', spec(should=["x"], neg_phrases=[["y", "z"]])),
    # multiple negations of both kinds
    (
        'foo -"bar" -"baz qux" -quux',
        spec(should=["foo"], neg=["bar", "quux"], neg_phrases=[["baz", "qux"]]),
    ),
    # empty quotes contribute nothing
    ('"" foo', spec(should=["foo"])),
    # uppercase + punctuation normalize everywhere
    ('"Foo, Bar!" -Baz QUX*', spec(phrases=[["foo", "bar"]], neg=["baz"], prefix=["qux"])),
    # a bare token with punctuation splits into multiple SHOULD terms
    ("data-base", spec(should=["data", "base"])),
]


@pytest.mark.parametrize("text,expected", CASES, ids=[c[0] for c in CASES])
def test_parse_composed_hand_written(text, expected):
    assert parse(text) == expected


ERROR_CASES = [
    "-foo-bar",  # negated piece tokenizes to two terms
    "a.b*",  # prefix piece tokenizes to two terms
    "c,d~",  # fuzzy piece tokenizes to two terms
    '"a b"~',  # ~ applied to a quoted phrase: the orphan ~ is invalid
    "-",  # bare minus: negated piece tokenizes to zero terms
]


@pytest.mark.parametrize("text", ERROR_CASES)
def test_parse_composed_rejects_malformed(text):
    with pytest.raises(ValueError):
        parse(text)
