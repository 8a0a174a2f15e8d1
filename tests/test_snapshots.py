"""Snapshot manifest + time travel (sources/tableio): the Iceberg-seam
contract the north_star's 'resumable from Iceberg snapshot checkpoints'
rests on — every committed write records a complete file view, and a
reader can pin a past snapshot."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bilies_go_spark.sources import tableio


@pytest.fixture()
def table(spark, tmp_path):
    return str(tmp_path / "tbl")


def _write(spark, path, lo, hi, part):
    pdf = pd.DataFrame({"x": range(lo, hi), "p": [part] * (hi - lo)})
    tableio.write_partitioned(
        spark.createDataFrame(pdf, schema="x bigint, p string"), path, ["p"]
    )


def test_snapshot_time_travel(spark, table):
    _write(spark, table, 0, 10, "a")
    tableio.commit_snapshot(table, {"stage": "s1"})
    _write(spark, table, 10, 25, "b")
    tableio.commit_snapshot(table, {"stage": "s2"})

    latest = tableio.read_snapshot(spark, table)
    assert latest.count() == 25
    asof0 = tableio.read_snapshot(spark, table, 0)
    assert asof0.count() == 10
    assert asof0.agg(F.max("x")).collect()[0][0] == 9
    # partition column recovered via basePath
    assert set(r["p"] for r in asof0.select("p").distinct().collect()) == {"a"}


def test_snapshot_isolated_from_later_appends(spark, table):
    _write(spark, table, 0, 5, "a")
    tableio.commit_snapshot(table, {"stage": "s1"})
    snap_files = tableio.read_snapshots(table)[-1]["files"]
    _write(spark, table, 5, 9, "c")  # uncommitted write
    # reader of the committed snapshot must not see uncommitted files
    assert tableio.read_snapshot(spark, table, 0).count() == 5
    assert tableio.read_snapshots(table)[-1]["files"] == snap_files


def test_snapshot_errors(spark, table):
    with pytest.raises(FileNotFoundError):
        tableio.read_snapshot(spark, table)
    _write(spark, table, 0, 3, "a")
    tableio.commit_snapshot(table, {"stage": "s1"})
    with pytest.raises(KeyError):
        tableio.read_snapshot(spark, table, 99)


def test_index_build_commits_snapshots(spark, small_corpus, tmp_path):
    from bilies_go_spark.operators.index_build import BuildConfig, build_index, IndexPaths

    d = str(tmp_path / "idx")
    build_index(spark, small_corpus, d, BuildConfig(n_buckets=8, target_postings_per_salt=200))
    paths = IndexPaths(d)
    runs_snaps = tableio.read_snapshots(paths.runs)
    seg_snaps = tableio.read_snapshots(paths.segments)
    assert runs_snaps and seg_snaps
    assert runs_snaps[-1]["files"], "runs snapshot must record data files"
    # snapshot read equals direct read for the committed state
    assert (
        tableio.read_snapshot(spark, paths.runs).count()
        == spark.read.parquet(paths.runs).count()
    )
