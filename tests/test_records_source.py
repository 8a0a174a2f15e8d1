"""Wire-format ingest chain (sources/records.py) vs the reference's
reader contract: trim, drop short lines, JSON projection, validation
rejects, ID enrichment, bulk-action formatting."""

from __future__ import annotations

import json

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def lines(spark):
    raw = [
        '{"id":"a1","date":"2026.01.02","log":{"msg":"hello world"}}',
        '  {"id":"","date":"2026.01.02","log":{"msg":"needs uuid"}}  ',
        '{"date":"2026.01.03","log":"plain string payload"}',
        "not json at all {{{",
        '{"id":"x","log":{"msg":"no date"}}',
        '{"id":"y","date":"2026.01.04"}',
        "",
        " ",
        '{"id":"z","date":"2026.01.05","log":{"nested":{"deep":[1,2,3]}}}',
    ]
    return spark.createDataFrame(pd.DataFrame({"value": raw}))


def test_parse_and_reject(spark, lines):
    from bilies_go_spark.sources.records import parse_records

    records, rejects = parse_records(lines, deterministic_ids=True)
    rec = records.toPandas().sort_values("suffix").reset_index(drop=True)
    rej = rejects.toPandas()
    assert len(rec) == 4
    assert set(rej["reason"]) == {"invalid_json", "missing_date", "missing_log"}
    assert len(rej) == 3  # blank lines dropped silently (len <= 1)
    # ID enrichment: empty id replaced, non-empty preserved
    assert "a1" in set(rec["id"]) and "z" in set(rec["id"])
    assert (rec["id"] != "").all()
    # payload is opaque passthrough: nested JSON survives byte-for-byte
    z = rec[rec["id"] == "z"]["document"].iloc[0]
    assert json.loads(z) == {"nested": {"deep": [1, 2, 3]}}


def test_deterministic_ids_stable(spark, lines):
    from bilies_go_spark.sources.records import parse_records

    a, _ = parse_records(lines, deterministic_ids=True)
    b, _ = parse_records(lines, deterministic_ids=True)
    assert sorted(r["id"] for r in a.collect()) == sorted(r["id"] for r in b.collect())


def test_bulk_action_wire_format(spark, lines):
    from bilies_go_spark.sources.records import bulk_actions, parse_records

    records, _ = parse_records(lines, deterministic_ids=True)
    docs = {r["id"]: r["document"] for r in records.collect()}
    actions = bulk_actions(records, index_prefix="logs", doc_type="logs").toPandas()
    for r in actions.itertuples(index=False):
        head, payload, trail = r.action.split("\n")
        assert trail == ""
        h = json.loads(head)["index"]
        assert h["_id"] == r.id
        assert h["_index"] == f"logs-{r.suffix}"
        assert h["_type"] == "logs"
        assert payload == docs[r.id]  # opaque passthrough, byte-for-byte
        if payload.startswith("{"):
            json.loads(payload)  # object payloads stay intact JSON


def test_bulk_action_header_escapes_special_ids(spark):
    """Ids containing quotes/backslashes must be JSON-escaped in the
    action header (raw concat would emit a malformed line)."""
    import pandas as pd

    from bilies_go_spark.sources.records import bulk_actions

    recs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": ['we"ird', "back\\slash", "tab\tchar"],
                "suffix": ["2026.01.02"] * 3,
                "document": ['{"k":1}'] * 3,
            }
        )
    )
    for r in bulk_actions(recs).toPandas().itertuples(index=False):
        head = r.action.split("\n")[0]
        h = json.loads(head)["index"]  # parses -> escaping is valid JSON
        assert h["_id"] == r.id


def test_bulk_action_null_id_fails_loudly(spark):
    """A NULL id must raise, not emit a header without _id (ES would
    auto-generate one, silently breaking stable-_id replay)."""
    import pandas as pd
    import pytest
    from py4j.protocol import Py4JJavaError

    from bilies_go_spark.sources.records import bulk_actions

    recs = spark.createDataFrame(
        pd.DataFrame(
            {"id": [None], "suffix": ["2026.01.02"], "document": ['{"k":1}']}
        ),
        schema="id string, suffix string, document string",
    )
    with pytest.raises((Py4JJavaError, Exception), match="NULL id"):
        bulk_actions(recs).collect()
