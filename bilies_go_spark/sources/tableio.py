"""TableIO seam: Iceberg-style tables on a plain filesystem.

The sandbox has no Iceberg jars, so tables are Parquet directories plus
a JSON *snapshot manifest* that records every committed write (the
Iceberg-snapshot stand-in).  The API is the narrow seam SURVEY.md §7
calls for — swap the body for an Iceberg catalog (`df.writeTo(...)
.overwritePartitions()`) without touching callers.

Durability contract mirrors the reference's queue (write → ack,
/root/reference/queue.go:115-155): a write is only *visible* to
readers of the manifest once `commit_snapshot` has appended its entry;
partition-level overwrite is idempotent (dynamic partition overwrite),
so replaying a crashed chunk converges — the stable-`_id` upsert
contract of /root/reference/batcher.go:91.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Write with dynamic partition overwrite: only the partitions
    present in ``df`` are replaced — re-running a chunk is idempotent."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        if dynamic_overwrite:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def manifest_path(table_path: str) -> str:
    return os.path.join(table_path, "_snapshots.json")


def _list_data_files(table_path: str) -> list[str]:
    """Relative paths of all visible parquet data files under a table."""
    out = []
    for root, _dirs, files in os.walk(table_path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.relpath(os.path.join(root, f), table_path))
    return sorted(out)


def commit_snapshot(table_path: str, entry: dict) -> None:
    """Append a snapshot entry (atomic via write-tmp + rename).

    Each snapshot records the COMPLETE data-file listing at commit time
    — the Iceberg snapshot model: a snapshot IS a full view of the
    table, so :func:`read_snapshot` can time-travel and a resumed build
    can pin its input to the snapshot it planned against."""
    mp = manifest_path(table_path)
    snaps = read_snapshots(table_path)
    entry = dict(entry)
    entry["snapshot_id"] = len(snaps)
    entry["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    entry["files"] = _list_data_files(table_path)
    snaps.append(entry)
    tmp = mp + ".tmp"
    os.makedirs(table_path, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump(snaps, f, indent=1)
    os.replace(tmp, mp)


def read_snapshots(table_path: str) -> list[dict]:
    mp = manifest_path(table_path)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        return json.load(f)


def read_snapshot(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Time-travel read: the table AS OF a committed snapshot.

    ``snapshot_id=None`` reads the latest snapshot.  Raises if the
    table has no commits or the id is unknown.  Files deleted since the
    snapshot (e.g. by partition overwrite) make that snapshot
    unreadable — same contract as expired Iceberg snapshots."""
    snaps = read_snapshots(table_path)
    if not snaps:
        raise FileNotFoundError(f"no snapshots committed at {table_path}")
    if snapshot_id is None:
        snap = snaps[-1]
    else:
        matching = [s for s in snaps if s["snapshot_id"] == snapshot_id]
        if not matching:
            raise KeyError(f"snapshot {snapshot_id} not found at {table_path}")
        snap = matching[0]
    files = [os.path.join(table_path, f) for f in snap.get("files", [])]
    if not files:
        raise FileNotFoundError(f"snapshot {snap['snapshot_id']} records no data files")
    return (
        spark.read.option("basePath", table_path).parquet(*files)
    )
