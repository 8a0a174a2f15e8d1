"""Deterministic synthetic transcripts corpus + doc_id assignment.

The input table per BASELINE.json input_hint:
``(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp)``.  Generation is **counter-based** (splitmix64 mixing of
(conv, turn, token) indices — no RNG state, no wall clock), so the same
logical row is produced regardless of partitioning or parallelism.
This is what lets the same generator run distributed via
``spark.range(n_convs).mapInPandas`` at any scale and still produce a
byte-identical corpus — the moral equivalent of the reference's
deterministic wire format (/root/reference/reader.go:23-27, demo
producer /root/reference/demo/syslog-ng.conf:22).

Term frequencies are Zipfian (s≈1.1) over a ~5k-word vocabulary so
hot-term skew is real, per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
BASE_TS = np.datetime64("2026-01-01T00:00:00")

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_COMMON_WORDS = (
    "the of and to a in is it you that he was for on are with as his they be at "
    "one have this from or had by hot word but what some we can out other were "
    "all there when up use your how said an each she which do their time if will "
    "way about many then them write would like so these her long make thing see "
    "him two has look more day could go come did number sound no most people my "
    "over know water than call first who may down side been now find any new "
    "work part take get place made live where after back little only round man "
    "year came show every good me give our under name very through just form"
).split()

_TOOL_NAMES = [f"tool_{i:02d}" for i in range(20)]
_ROLES = ["user", "assistant"]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — the deterministic 'RNG'."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _mix(*parts: np.ndarray | int) -> np.ndarray:
    acc = np.uint64(SEED)
    for p in parts:
        arr = np.asarray(p, dtype=np.uint64)
        acc = _splitmix64(acc ^ (arr * np.uint64(0xD6E8FEB86659FD93)))
    return acc


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def build_vocab() -> np.ndarray:
    """Deterministic ~5k-word vocabulary; head = common English words
    (these become the Zipf-hot terms), tail = synthetic tokens."""
    vocab = list(dict.fromkeys(_COMMON_WORDS))
    i = 0
    while len(vocab) < VOCAB_SIZE:
        vocab.append(f"tok{i:04d}")
        i += 1
    return np.array(vocab[:VOCAB_SIZE], dtype=object)


def zipf_cdf() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    w = ranks ** (-ZIPF_S)
    return np.cumsum(w / w.sum())


_VOCAB = build_vocab()
_CDF = zipf_cdf()


def _gen_batch(conv_ids: np.ndarray, ts_spacing_s: int) -> pd.DataFrame:
    """Generate all turns for a batch of conversation indices."""
    n_turns = (1 + (_mix(conv_ids, 1) % np.uint64(12))).astype(np.int64)
    conv_rep = np.repeat(conv_ids, n_turns)
    turn_idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n_turns])

    # roles: alternate user/assistant; ~10% of turns become 'tool'
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_mask = (_mix(conv_rep, turn_idx, 7) % np.uint64(10)) == 0
    role[tool_mask] = "tool"
    tool = np.full(conv_rep.size, None, dtype=object)
    tool_pick = (_mix(conv_rep, turn_idx, 8) % np.uint64(20)).astype(np.int64)
    tool[tool_mask] = np.array(_TOOL_NAMES, dtype=object)[tool_pick[tool_mask]]

    # token counts per turn: 5..200, skewed short
    u_len = _u01(_mix(conv_rep, turn_idx, 2))
    n_tok = (5 + np.floor((u_len**2) * 196)).astype(np.int64)

    # token stream for the whole batch
    tok_row = np.repeat(np.arange(conv_rep.size, dtype=np.int64), n_tok)
    tok_pos = np.concatenate([np.arange(k, dtype=np.int64) for k in n_tok])
    h = _mix(conv_rep[tok_row], turn_idx[tok_row], 3, tok_pos)
    zipf_idx = np.searchsorted(_CDF, _u01(h), side="left")
    words = _VOCAB[np.minimum(zipf_idx, VOCAB_SIZE - 1)].copy()

    # deterministic "dirt": capitalization, punctuation, newlines
    cap_mask = (h % np.uint64(7)) == 0
    words[cap_mask] = np.char.capitalize(words[cap_mask].astype(str)).astype(object)
    comma_mask = (h % np.uint64(11)) == 1
    words[comma_mask] = np.char.add(words[comma_mask].astype(str), ",").astype(object)
    dot_mask = (h % np.uint64(23)) == 2
    words[dot_mask] = np.char.add(words[dot_mask].astype(str), ".").astype(object)
    nl_mask = (h % np.uint64(53)) == 3
    words[nl_mask] = np.char.add(words[nl_mask].astype(str), "\n").astype(object)

    ends = np.cumsum(n_tok)
    starts = ends - n_tok
    wl = words.tolist()
    text = [" ".join(wl[s:e]) for s, e in zip(starts.tolist(), ends.tolist())]

    ts = BASE_TS + (conv_rep * ts_spacing_s + turn_idx * 13).astype("timedelta64[s]")
    return pd.DataFrame(
        {
            "conv_id": pd.Series([f"conv-{c:08d}" for c in conv_rep.tolist()], dtype=object),
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def transcripts_df(spark: SparkSession, n_convs: int, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: ~6.5 turns/conv on average.

    Spacing is chosen so `ts` spans >= 30 distinct days at any size
    (partition-pruning tests need multiple days).
    """
    spacing = max(60, (30 * 86400) // max(n_convs, 1) + 1)
    rng = spark.range(0, n_convs, 1, parallelism or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(np.uint64), spacing)

    return rng.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic global doc_id = rank in (conv_id, turn_idx) order.

    Two-phase, no single-partition sort (the parallel analogue of the
    reference's monotone ``lastID++`` key assignment,
    /root/reference/queue.go:137): range-partition + local sort, count
    rows per partition, broadcast the prefix-sum offsets, then add
    offset + local index per partition.  The result depends only on the
    total order, not on where range boundaries fall, because
    (conv_id, turn_idx) is unique.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(n, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
    )
    sorted_df = sorted_df.persist()
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sorted_df.schema.fields if f.name != "_pid"
    ) + ", doc_id bigint"

    def add_ids(batches):
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"])
            out["doc_id"] = np.arange(base + seen, base + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield out

    result = sorted_df.mapInPandas(add_ids, schema=out_schema)
    return result


def reference_queries(vocab: np.ndarray | None = None) -> pd.DataFrame:
    """The deterministic reference query set (FIXTURES.md §2): >=50
    queries covering rare/hot single terms, all-hot multi-term (WAND
    stress), mixed, absent, repeated, and case/punct variants."""
    v = vocab if vocab is not None else _VOCAB
    hot = [str(w) for w in v[:12]]
    mid = [str(w) for w in v[40:52]]
    rare = [str(w) for w in v[900:912]]
    rows: list[tuple[str, int]] = []
    rows += [(h, 10) for h in hot[:6]]  # hot single
    rows += [(r, 10) for r in rare[:6]]  # rare single
    rows += [(f"{hot[i]} {hot[i + 1]}", 10) for i in range(5)]  # all-hot pairs
    rows += [(f"{hot[i]} {hot[i + 1]} {hot[i + 2]}", 10) for i in range(4)]
    rows += [(f"{hot[i]} {rare[i]}", 10) for i in range(6)]  # mixed
    rows += [(f"{mid[i]} {mid[i + 1]} {rare[i]}", 10) for i in range(5)]
    rows += [("zzzqqqxxx", 10), ("zzzqqqxxx " + hot[0], 10)]  # absent
    rows += [(f"{hot[0]} {hot[0]}", 10), (f"{rare[0]} {rare[0]} {rare[0]}", 10)]  # repeated
    rows += [(hot[0].upper(), 10), (f"  {hot[1]},  {mid[0]}!! ", 10)]  # case/punct
    rows += [(h, 1) for h in hot[6:10]]  # k=1
    rows += [(f"{hot[i]} {mid[i]}", 100) for i in range(6)]  # k=100
    rows += [(f"{mid[i + 5]} {mid[i + 6]}", 10) for i in range(5)]
    return pd.DataFrame(
        {
            "query_id": np.arange(len(rows), dtype=np.int64),
            "text": [r[0] for r in rows],
            "k": np.array([r[1] for r in rows], dtype=np.int32),
        }
    )


def write_transcripts(spark: SparkSession, path: str, n_convs: int) -> None:
    """Materialize the corpus (with doc ids) to parquet, partitioned by
    day — the Iceberg-table stand-in (date routing echoes the
    reference's per-day index suffix, /root/reference/batcher.go:91)."""
    df = assign_doc_ids(transcripts_df(spark, n_convs))
    df.withColumn("day", F.to_date("ts")).write.mode("overwrite").partitionBy("day").parquet(path)
