"""Document tombstones: delete / upsert for a serving index.

The reference gets per-document upsert for free from Elasticsearch's
stable ``_id`` (/root/reference/batcher.go:91: a re-sent id overwrites
the old document).  A posting-list index can't rewrite in place, so we
use the Lucene recipe: a **tombstone set** masks deleted doc ids at
query time, per-term **negative df deltas** keep BM25's idf exact, and
the next FULL compaction purges tombstoned postings physically.  An
*update* is delete(old internal id) + ingest the new version under a
fresh internal id (stable external identity — (conv_id, turn_idx) —
maps to the newest internal id upstream, exactly Lucene's
delete-then-add under a new internal docid).

Layout (all under ``<index>/deletes/<batch_id>/``):

* ``docs/``        — parquet (doc_id) — the tombstone set
* ``term_deltas/`` — parquet (term, df, cf, term_bucket), partitioned
  by term_bucket with **negative** df/cf: the query engine simply adds
  these directories to its term-stats roots and the existing
  ``sum(df)`` aggregation nets out global df — no special-case code in
  the idf path, and the same partition pruning applies.

Visibility is atomic: a delete batch is live only once it appears in
the ``_current.json`` pointer's ``deletes`` list (single rename), in
the same write that updates corpus stats — readers never see stats and
tombstones out of step.  Corpus stats subtract via the lineage ledger
(stage ``deletes``), so :func:`finalize_stats` stays a pure
ledger-derived computation.

Scale contract: the tombstone set between full compactions is small
relative to the corpus (deletes are rare events); it ships to kernels
as a sorted int64 array (8 B/doc).  The delta computation is one
predicate-pushed scan of the runs table filtered to the deleted ids.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bilies_go_spark.operators.index_build import (
    RUNS_SCHEMA,
    IndexPaths,
    finalize_stats,
    term_bucket_col,
)
from bilies_go_spark.plans.lineage import Lineage
from bilies_go_spark.sources import tableio


def delete_batch_dir(paths: IndexPaths, batch: str) -> str:
    return os.path.join(paths.root, "deletes", batch)


def delete_docs_dir(paths: IndexPaths, batch: str) -> str:
    return os.path.join(delete_batch_dir(paths, batch), "docs")


def delete_term_deltas_dir(paths: IndexPaths, batch: str) -> str:
    return os.path.join(delete_batch_dir(paths, batch), "term_deltas")


def read_deleted_ids(paths: IndexPaths, cur: dict | None = None, all_batches: bool = False):
    """Sorted int64 numpy array of tombstoned doc ids (driver-side
    pyarrow read).

    ``all_batches=False`` (query path): only the batches LIVE in the
    pointer — those not yet physically purged by a full compaction.
    ``all_batches=True`` (idempotence path): every batch ever written,
    including purged ones — a doc id, once deleted, must never be
    delta-counted again even though the append-only runs table still
    contains its rows (new document versions always get FRESH internal
    ids, so re-deleting a historical id is always a replay)."""
    import numpy as np
    import pyarrow.dataset as pads

    if all_batches:
        root = os.path.join(paths.root, "deletes")
        batch_ids = sorted(os.listdir(root)) if os.path.isdir(root) else []
    else:
        cur = cur or paths.read_current()
        batch_ids = [d["id"] for d in cur.get("deletes", [])]
    parts = []
    for b in batch_ids:
        p = delete_docs_dir(paths, b)
        if os.path.isdir(p):
            parts.append(
                pads.dataset(p).to_table(columns=["doc_id"])["doc_id"].to_numpy()
            )
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts).astype(np.int64))


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids, n_buckets: int | None = None
) -> str | None:
    """Tombstone the given doc ids.  Returns the delete-batch id, or
    None when every id is already tombstoned (idempotent replay) or
    absent from the index.

    Steps: (1) restrict to ids actually indexed and not yet deleted,
    (2) one predicate-pushed runs scan computes the per-term negative
    (df, cf) deltas and the (n_docs, sum_dl) stats delta, (3) write the
    batch dirs, ack the ledger, and (4) publish atomically by appending
    the batch to the pointer's ``deletes`` with refreshed stats.
    """
    import numpy as np
    import pandas as pd

    paths = IndexPaths(index_dir)
    lineage = Lineage(index_dir)
    if n_buckets is None:
        from bilies_go_spark.operators.query import load_index_meta

        n_buckets = load_index_meta(index_dir)["n_buckets"]
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    already = read_deleted_ids(paths, all_batches=True)
    if already.size:
        ids = ids[~np.isin(ids, already)]
    if ids.size == 0:
        return None
    id_list = [int(x) for x in ids]

    victim = (
        spark.read.schema(RUNS_SCHEMA)
        .parquet(paths.runs)
        .filter(F.col("doc_id").isin(id_list))
    )
    # per-term negative deltas, bucket-partitioned like term_stats so
    # the engine's pruned stats scan covers them with zero new code
    deltas = (
        victim.groupBy("term")
        .agg((-F.count("*")).alias("df"), (-F.sum("tf")).alias("cf"))
        .withColumn("term_bucket", term_bucket_col("term", n_buckets))
    )
    stat = victim.groupBy("doc_id").agg(F.sum("tf").alias("dl")).agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_deleted, dl_deleted = int(stat["n"] or 0), int(stat["sum_dl"] or 0)
    if n_deleted == 0:
        return None  # ids not present in the index at all

    batch = hashlib.md5(("\x00".join(map(str, id_list))).encode()).hexdigest()[:12]
    tableio.write_partitioned(deltas, delete_term_deltas_dir(paths, batch), ["term_bucket"])
    spark.createDataFrame(
        pd.DataFrame({"doc_id": id_list}), schema="doc_id bigint"
    ).coalesce(1).write.mode("overwrite").parquet(delete_docs_dir(paths, batch))

    # ledger row: finalize_stats subtracts stage='deletes' sums, so the
    # stats stay a pure function of the (append-only) ledger
    lineage.ack(
        spark,
        "deletes",
        [{"part": batch, "rows": n_deleted, "sum_dl": dl_deleted}],
    )
    stats = finalize_stats(spark, paths, lineage)
    cur = paths.read_current()
    cur["deletes"] = cur.get("deletes", []) + [
        {"id": batch, "n_docs": n_deleted, "total_dl": dl_deleted}
    ]
    cur["stats"] = stats
    paths.write_current(cur)
    tableio.commit_snapshot(
        paths.root, {"stage": "delete", "batch": batch, "n_docs": n_deleted}
    )
    return batch
