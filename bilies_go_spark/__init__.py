"""bilies_go_spark — a PySpark-native inverted-index builder + BM25 top-k
query engine over multi-turn conversation/agent transcripts.

A from-scratch reimagining (NOT a port) of the semantics of
``Adirelle/bilies-go`` (a Go daemon that durably queues JSON log records
and bulk-loads them into Elasticsearch, see /root/reference/main.go:26):

* batched accumulate-and-flush bulk loading  -> per-partition posting-
  segment construction (operators/index_build.py)
* durable LevelDB queue + ack-after-success  -> lineage manifest +
  resumable builds (plans/lineage.py)
* bisect-on-400 poison isolation             -> quarantine table
* per-stage metrics registry                 -> build-metrics DataFrame
* date-suffix index routing                  -> term-bucket partitioned
  segment layout + salted repartition for hot-term skew

Everything is DataFrame-first: Catalyst handles scans, filters, joins,
aggregation and shuffle; custom logic (VByte codec, block-max WAND) lives
in vectorized Arrow/pandas UDF stages only.
"""

__version__ = "0.1.0"

K1_DEFAULT = 1.2
B_DEFAULT = 0.75
