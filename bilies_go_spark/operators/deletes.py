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

* ``docs/``        — parquet (doc_id, delta_counted) — the tombstone
  set.  ``delta_counted`` records whether the doc's runs part was
  already FOLDED into served segments when the delete ran: only then
  does a negative df delta exist for it (see below).
* ``term_deltas/`` — parquet (term, df, cf, term_bucket), partitioned
  by term_bucket with **negative** df/cf: the query engine simply adds
  these directories to its term-stats roots and the existing
  ``sum(df)`` aggregation nets out global df — no special-case code in
  the idf path, and the same partition pruning applies.

Durability / idempotence protocol (the write-then-ack-then-publish
shape of /root/reference/queue.go:115-155):

1. batch dirs are written (idempotent overwrite — the batch id is a
   hash of the id set, so a crashed retry rewrites the same dirs);
2. the ledger ack (stage ``deletes``) commits the stats subtraction —
   **acked batches define "already deleted"** for replay filtering (a
   bare dir left by a crash before its ack is garbage, NOT a delete);
3. the pointer append + stats refresh makes the tombstones live, then
   stage ``del_published`` acks that publication happened.  Any acked
   batch missing its ``del_published`` ack is re-published by
   :func:`heal_unpublished` (run at the top of every delete) — so a
   crash in any window loses nothing and double-counts nothing
   (ledger stats dedup per part via max-aggregation).

Folded vs pending victims: runs parts not yet folded into any segment
tier are not served, so a victim doc living in such a part has no
positive df anywhere — publishing a negative delta for it would drive
summed df negative (idf = log of a negative → NaN).  Such docs get
``delta_counted=false``: no delta now; instead tiered compaction
physically drops them when their part folds (they never acquire a
positive df), keeping df exact on both paths.  Corpus stats (n_docs,
sum_dl) subtract for BOTH kinds, mirroring the runs ledger, which
counts pending parts too.

Scale contract: the tombstone set between full compactions is small
relative to the corpus (deletes are rare events); per-victim metadata
is collected driver-side (O(#victims) rows) and the set ships to
kernels as a sorted int64 array (8 B/doc).  The delta computation is
one predicate-pushed scan of the runs table filtered to the deleted
ids.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
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


def _read_docs_tables(paths: IndexPaths, batch_ids) -> list:
    """pyarrow tables of the docs/ dirs for the given batches (schema
    normalized: docs dirs written before delta_counted default true)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    out = []
    for b in batch_ids:
        p = delete_docs_dir(paths, b)
        if os.path.isdir(p):
            t = pads.dataset(p).to_table()
            if "delta_counted" not in t.column_names:
                t = t.append_column(
                    "delta_counted", pa.array([True] * len(t), pa.bool_())
                )
            out.append(t.select(["doc_id", "delta_counted"]))
    return out


def read_deleted_ids(paths: IndexPaths, cur: dict | None = None, batch_ids=None):
    """Sorted int64 numpy array of tombstoned doc ids (driver-side
    pyarrow read).  Default (query path): the batches LIVE in the
    pointer — those not yet physically purged by a full compaction.
    Pass ``batch_ids`` explicitly for any other batch set."""
    if batch_ids is None:
        cur = cur or paths.read_current()
        batch_ids = [d["id"] for d in cur.get("deletes", [])]
    parts = [t["doc_id"].to_numpy() for t in _read_docs_tables(paths, batch_ids)]
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts).astype(np.int64))


def acked_delete_batches(lineage: Lineage):
    """part -> {rows, sum_dl} for every ledger-acked delete batch.
    THE durable definition of "this delete happened" (dirs alone are
    not: a crash can leave dirs whose stats were never committed)."""
    pdf = lineage.read_pandas()
    d = pdf[(pdf["stage"] == "deletes") & (pdf["status"] == "done")]
    if not len(d):
        return {}
    per = d.groupby("part").agg({"rows": "max", "sum_dl": "max"})
    return {
        str(p): {"rows": int(r["rows"]), "sum_dl": int(r["sum_dl"])}
        for p, r in per.iterrows()
    }


def published_delete_batches(lineage: Lineage) -> set[str]:
    pdf = lineage.read_pandas()
    d = pdf[(pdf["stage"] == "del_published") & (pdf["status"] == "done")]
    return set(d["part"].astype(str)) if len(d) else set()


def read_acked_deleted_ids(paths: IndexPaths, lineage: Lineage):
    """Every doc id in every ACKED batch — purged or not.  Full segment
    builds anti-join against THIS set (not the pointer-live one): the
    append-only runs table keeps deleted docs forever, so a rebuild
    that only excluded live batches would resurrect docs purged by an
    earlier compaction."""
    return read_deleted_ids(paths, batch_ids=sorted(acked_delete_batches(lineage)))


def read_uncounted_deleted_ids(paths: IndexPaths, lineage: Lineage):
    """Acked tombstoned docs with ``delta_counted=false`` — deleted
    while their runs part was still pending.  Tiered compaction drops
    these physically when folding (their terms never got a negative
    delta, so serving their postings would overstate df)."""
    import pyarrow as pa

    tabs = _read_docs_tables(paths, sorted(acked_delete_batches(lineage)))
    if not tabs:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(tabs)
    ids = t.filter(pa.compute.invert(t["delta_counted"].combine_chunks()))[
        "doc_id"
    ].to_numpy()
    return np.unique(ids.astype(np.int64))


def _publish(spark: SparkSession, paths: IndexPaths, lineage: Lineage, entries) -> None:
    """Make delete batches live: append to the pointer's ``deletes``
    (skipping ids already present — replays are idempotent) together
    with ledger-derived stats in ONE rename, then ack publication."""
    stats = finalize_stats(spark, paths, lineage)
    cur = paths.read_current()
    live = {d["id"] for d in cur.get("deletes", [])}
    cur["deletes"] = cur.get("deletes", []) + [
        e for e in entries if e["id"] not in live
    ]
    cur["stats"] = stats
    paths.write_current(cur)
    lineage.ack(spark, "del_published", [{"part": e["id"]} for e in entries])


def heal_unpublished(spark: SparkSession, paths: IndexPaths, lineage: Lineage) -> list[str]:
    """Re-publish delete batches that were ledger-acked but never made
    the pointer (crash between ack and publish).  Returns healed ids."""
    acked = acked_delete_batches(lineage)
    todo = sorted(set(acked) - published_delete_batches(lineage))
    if todo:
        _publish(
            spark,
            paths,
            lineage,
            [
                {"id": b, "n_docs": acked[b]["rows"], "total_dl": acked[b]["sum_dl"]}
                for b in todo
            ],
        )
    return todo


def delete_docs(
    spark: SparkSession, index_dir: str, doc_ids, n_buckets: int | None = None
) -> str | None:
    """Tombstone the given doc ids.  Returns the delete-batch id, or
    None when every id is already tombstoned (idempotent replay) or
    absent from the index.

    Steps: (0) heal any previously-crashed publish, (1) restrict to
    ids actually indexed and not yet in any ACKED batch, (2) one
    predicate-pushed runs scan finds each victim's part + doc length
    and computes per-term negative (df, cf) deltas over FOLDED parts
    only, (3) write the batch dirs (idempotent), ack the ledger, and
    (4) publish atomically via the pointer + ``del_published`` ack.
    """
    import pandas as pd

    paths = IndexPaths(index_dir)
    lineage = Lineage(index_dir)
    heal_unpublished(spark, paths, lineage)
    if n_buckets is None:
        from bilies_go_spark.operators.query import load_index_meta

        n_buckets = load_index_meta(index_dir)["n_buckets"]
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    already = read_acked_deleted_ids(paths, lineage)
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
    # per-victim part + doc length, driver-side (O(#victims) rows —
    # deletes are small by contract).  Each doc lives in exactly ONE
    # runs part (append-only unique-id contract), so first() is exact.
    per_doc = (
        victim.groupBy("doc_id")
        .agg(F.first("build_part").alias("part"), F.sum("tf").alias("dl"))
        .collect()
    )
    if not per_doc:
        return None  # ids not present in the index at all
    folded = lineage.completed(spark, "folded")
    counted = [int(r["doc_id"]) for r in per_doc if r["part"] in folded]
    n_deleted = len(per_doc)
    dl_deleted = int(sum(r["dl"] for r in per_doc))
    found_ids = sorted(int(r["doc_id"]) for r in per_doc)

    batch = hashlib.md5(("\x00".join(map(str, found_ids))).encode()).hexdigest()[:12]
    # negative deltas ONLY for victims whose positive df is actually
    # served (folded parts): a delta without a positive counterpart
    # would drive summed df negative -> NaN idf (see module docstring)
    if counted:
        deltas = (
            victim.filter(F.col("doc_id").isin([int(x) for x in counted]))
            .groupBy("term")
            .agg((-F.count("*")).alias("df"), (-F.sum("tf")).alias("cf"))
            .withColumn("term_bucket", term_bucket_col("term", n_buckets))
        )
        tableio.write_partitioned(
            deltas, delete_term_deltas_dir(paths, batch), ["term_bucket"]
        )
    # (no term_deltas dir when every victim was pending — the stats
    # roots skip missing dirs, and the fold-time purge keeps df exact)
    counted_set = set(counted)
    spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": found_ids,
                "delta_counted": [d in counted_set for d in found_ids],
            }
        ),
        schema="doc_id bigint, delta_counted boolean",
    ).coalesce(1).write.mode("overwrite").parquet(delete_docs_dir(paths, batch))

    # ledger row: finalize_stats subtracts stage='deletes' sums, so the
    # stats stay a pure function of the (append-only) ledger
    lineage.ack(
        spark,
        "deletes",
        [{"part": batch, "rows": n_deleted, "sum_dl": dl_deleted}],
    )
    _publish(
        spark,
        paths,
        lineage,
        [{"id": batch, "n_docs": n_deleted, "total_dl": dl_deleted}],
    )
    tableio.commit_snapshot(
        paths.root, {"stage": "delete", "batch": batch, "n_docs": n_deleted}
    )
    return batch
