"""Per-partition lineage: the ack ledger that makes builds resumable.

Reimagines the reference's durable-queue contract in table form:

* queue write + ack-after-success  (/root/reference/queue.go:115-155,
  requester.go:126-129, queue.go:207-239)  ->  `ack()` appends a
  status row AFTER the partition's data write committed;
* resume-from-cursor (/root/reference/queue.go:125-128, 246-255)  ->
  `pending()` anti-joins planned parts against completed acks;
* per-stage metrics registry (/root/reference/queue.go:51-60 etc.)  ->
  the same ledger carries rows/postings/bytes/seconds per part, from
  which docs/sec & postings/sec derive.

At-least-once + idempotent partition overwrite (tableio) = effective
exactly-once, the same argument as the reference's stable-`_id`
re-send (/root/reference/batcher.go:91).
"""

from __future__ import annotations

import os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "stage string, part string, status string, rows bigint, postings bigint, "
    "sum_dl bigint, bytes_out bigint, seconds double, run_id string, ts double"
)


class Lineage:
    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "_lineage")
        self.run_id = uuid.uuid4().hex[:12]

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self.exists():
            return spark.createDataFrame([], schema=LINEAGE_SCHEMA)
        df = spark.read.option("mergeSchema", "true").parquet(self.path)
        if "ts" not in df.columns:  # ledgers written before the ts column
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.lit(0.0))
        return df

    def read_pandas(self) -> pd.DataFrame:
        """Driver-side ledger read (the ledger is O(#parts) rows —
        never worth a Spark job)."""
        cols = [c.split(" ")[0] for c in LINEAGE_SCHEMA.split(", ")]
        if not self.exists():
            return pd.DataFrame(columns=cols)
        import pyarrow.parquet as pq

        frames = []
        for f in sorted(os.listdir(self.path)):
            if f.endswith(".parquet") and not f.startswith("."):
                frames.append(pq.read_table(os.path.join(self.path, f)).to_pandas())
        if not frames:
            return pd.DataFrame(columns=cols)
        pdf = pd.concat(frames, ignore_index=True)
        if "ts" not in pdf.columns:
            pdf["ts"] = 0.0
        pdf["ts"] = pdf["ts"].fillna(0.0)
        return pdf

    def completed(self, spark: SparkSession, stage: str) -> set[str]:
        """Parts whose LATEST ack row is 'done' (a later 'stale' row —
        written by :meth:`invalidate` — reopens the part)."""
        pdf = self.read_pandas()
        pdf = pdf[pdf["stage"] == stage]
        if not len(pdf):
            return set()
        last = pdf.sort_values("ts", kind="stable").groupby("part").tail(1)
        return set(last[last["status"] == "done"]["part"])

    def pending(self, spark: SparkSession, stage: str, planned: list[str]) -> list[str]:
        """Resume = planned parts minus acked parts (order-preserving)."""
        done = self.completed(spark, stage)
        return [p for p in planned if p not in done]

    def ack(self, spark: SparkSession, stage: str, parts: list[dict]) -> None:
        """Append 'done' rows — the DropC/prefix-delete analogue.

        Written driver-side with pyarrow (atomic tmp+rename into the
        ledger dir): the ledger is a handful of rows per chunk, and a
        Spark job per ack would add pure serial latency to every build
        chunk.  Spark reads the directory fine (same schema)."""
        if not parts:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = pd.DataFrame(
            [
                {
                    "stage": stage,
                    "part": str(p["part"]),
                    "status": p.get("status", "done"),
                    "rows": int(p.get("rows", 0)),
                    "postings": int(p.get("postings", 0)),
                    "sum_dl": int(p.get("sum_dl", 0)),
                    "bytes_out": int(p.get("bytes_out", 0)),
                    "seconds": float(p.get("seconds", 0.0)),
                    "run_id": self.run_id,
                    "ts": time.time(),
                }
                for p in parts
            ]
        )
        schema = pa.schema(
            [
                ("stage", pa.string()),
                ("part", pa.string()),
                ("status", pa.string()),
                ("rows", pa.int64()),
                ("postings", pa.int64()),
                ("sum_dl", pa.int64()),
                ("bytes_out", pa.int64()),
                ("seconds", pa.float64()),
                ("run_id", pa.string()),
                ("ts", pa.float64()),
            ]
        )
        os.makedirs(self.path, exist_ok=True)
        name = f"ack-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(self.path, "." + name + ".tmp")
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(self.path, name))

    def invalidate(self, spark: SparkSession, stage: str) -> None:
        """Reopen every done part of a stage (append 'stale' rows) —
        used by streaming compaction when new runs arrive after the
        segments stage already acked."""
        done = self.completed(spark, stage)
        if not done:
            return
        self.ack(spark, stage, [{"part": p, "status": "stale"} for p in sorted(done)])

    def metrics(self, spark: SparkSession) -> DataFrame:
        """Per-part build metrics: docs/sec, postings/sec, bytes out —
        the north_star's build-metrics surface (reference analogue:
        metric dump /root/reference/metrics.go:63-165)."""
        from pyspark.sql import functions as F

        lin = self.read(spark)
        return lin.withColumn(
            "docs_per_sec",
            F.when(F.col("seconds") > 0, F.col("rows") / F.col("seconds")),
        ).withColumn(
            "postings_per_sec",
            F.when(F.col("seconds") > 0, F.col("postings") / F.col("seconds")),
        )


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.seconds = time.monotonic() - self.t0
        return False
