"""Live ingest gauges + straggler percentiles.

Two observability surfaces the reference daemon exposes that the batch
ledger alone does not:

* :class:`IngestGauges` — a ``StreamingQueryListener`` capturing
  per-micro-batch input rows, rows/sec, and batch ids WHILE the ingest
  runs — the Spark twin of the reference's live queue gauges
  (queue length / pending count meters, /root/reference/queue.go:241-278),
  which sample the queue during the run rather than after it.
* :func:`stage_percentiles` — ``percentile_approx`` over the lineage
  ack ledger's per-part seconds and docs/sec — the percentile dump of
  /root/reference/metrics.go:146-154, i.e. the straggler detector: a
  p95/p50 seconds ratio ≫ 1 for a stage means some parts (hot days,
  hot buckets) need more salt/spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from bilies_go_spark.plans.lineage import Lineage


class IngestGauges(StreamingQueryListener):
    """Collects one gauge row per micro-batch progress event.

    Attach BEFORE ``start_ingest`` via :func:`attach_gauges`; rows
    accumulate in ``self.rows`` (driver-side, O(#batches)).
    """

    def __init__(self) -> None:
        self.rows: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.rows.append(
            {
                "query_id": str(p.id),
                "batch_id": int(p.batchId),
                "num_input_rows": int(p.numInputRows),
                "input_rows_per_sec": float(p.inputRowsPerSecond or 0.0),
                "processed_rows_per_sec": float(p.processedRowsPerSecond or 0.0),
                "timestamp": str(p.timestamp),
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))


def attach_gauges(spark: SparkSession) -> IngestGauges:
    g = IngestGauges()
    spark.streams.addListener(g)
    return g


def detach_gauges(spark: SparkSession, g: IngestGauges) -> None:
    spark.streams.removeListener(g)


def stage_percentiles(spark: SparkSession, lineage: Lineage) -> DataFrame:
    """(stage, n_parts, p50_seconds, p95_seconds, p50_docs_per_sec,
    p95_docs_per_sec, max_seconds) — straggler view over the ack ledger.

    ``percentile_approx`` keeps this a single pass at any ledger size;
    the ledger itself is O(#parts), so at 10^12-turn scale (tens of
    thousands of parts) this still runs in milliseconds.
    """
    m = (
        lineage.metrics(spark)
        .filter((F.col("status") == "done") & (F.col("seconds") > 0))
    )
    pa = lambda c, q: F.percentile_approx(c, q, 10_000)  # noqa: E731
    return m.groupBy("stage").agg(
        F.count("*").alias("n_parts"),
        pa("seconds", 0.5).alias("p50_seconds"),
        pa("seconds", 0.95).alias("p95_seconds"),
        pa("docs_per_sec", 0.5).alias("p50_docs_per_sec"),
        pa("docs_per_sec", 0.95).alias("p95_docs_per_sec"),
        F.max("seconds").alias("max_seconds"),
    )
