"""Resumable inverted-index build: corpus -> posting segments.

The pipeline (the reference's ingest/drain loop re-expressed for
Catalyst — accumulate-and-flush /root/reference/batcher.go:76-128,
ack-after-success /root/reference/requester.go:126-129):

Stage A ("runs"), chunked by build partition (default: day(ts), so the
corpus scan partition-prunes — the date-suffix routing of
/root/reference/batcher.go:91 reborn as partition pruning):

    corpus chunk -> quarantine split -> mapInPandas doc-local tf
    -> (term, doc_id, tf, dl) -> single shuffle on (build_part, spread)
    -> write runs/ partitioned by build_part (the resume/overwrite
       unit) with dynamic partition overwrite -> lineage ack per part

  Doc-local tf (pandas value_counts per Arrow batch) means the ONLY
  shuffle of the token stream is the bucket repartition: tf compression
  happens before bytes move, which at 100 TB is the difference between
  shuffling ~N tokens and ~N distinct (term,doc) pairs.

Stage B ("segments"), chunked by term_bucket:

    runs for bucket -> exact per-term df -> salt count S(term) =
    ceil(df / target_postings_per_salt) -> salt = pmod(xxhash64(doc_id
    * PRIME), S) -> groupBy(term, salt).applyInPandas(encode VByte
    segment) -> write segments/ + term_stats/ partitioned by
    term_bucket -> lineage ack per bucket

  Salting is mandatory for Zipf hot terms (AQE cannot split one key,
  SURVEY.md §4.2): each salted group is bounded by ~target postings,
  so no straggler task and bounded executor memory at any scale.

Everything resumes: `Lineage.pending` anti-joins planned parts against
acks; dynamic partition overwrite makes replays idempotent.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bilies_go_spark.functions.tokenize import TOKEN_SPLIT_RE
from bilies_go_spark.operators.codec import (
    DEFAULT_BLOCK_SIZE,
    encode_postings,
    segment_to_row,
)
from bilies_go_spark.plans.lineage import Lineage, StageTimer
from bilies_go_spark.sources import tableio

RUNS_SCHEMA = "build_part string, doc_id bigint, term string, tf int, dl int"
# positional builds carry a per-(doc, term) VByte position blob through
# the same single shuffle (codec.positions_to_blobs — ~1 byte/token, the
# same order as the gap/tf streams themselves)
RUNS_POS_SCHEMA = RUNS_SCHEMA + ", pos_vb binary"
SEGMENT_SCHEMA = (
    "term string, salt int, term_bucket int, n_docs int, block_size int, "
    "doc_gaps_vb binary, tfs_vb binary, dls_vb binary, "
    "block_last_doc_id array<bigint>, block_max_tf array<bigint>, "
    "block_min_dl array<bigint>, block_doc_off array<bigint>, "
    "block_tf_off array<bigint>, block_dl_off array<bigint>"
)
SEGMENT_POS_SCHEMA = SEGMENT_SCHEMA + ", positions_vb binary, block_pos_off array<bigint>"
TERM_STATS_SCHEMA = "term string, df bigint, cf bigint, term_bucket int"

# decorrelate the salt hash from the bucket hash (both xxhash64-based)
_SALT_MIX = 0x7F4A7C15


def term_bucket_col(term_col: str | Column, n_buckets: int) -> Column:
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.pmod(F.xxhash64(c), F.lit(n_buckets)).cast("int")


def split_poison(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Separate malformed rows so they never block the build — the
    skip-poison contract of /root/reference/requester.go:112-116.

    Returns (clean, quarantined-with-reason)."""
    # "no tokens" == lower(text) has no [a-z0-9] character — EXACTLY the
    # tokenizer's emptiness predicate (tokenize lowercases then splits
    # on [^a-z0-9]+), including non-ASCII chars whose lower() maps into
    # the class (U+0130 'İ' -> 'i̇', U+212A Kelvin -> 'k').  A single
    # rlike probe instead of a full tokenize+size pass; runs inline in
    # every build scan, so it must stay cheap.
    reason = (
        F.when(F.col("doc_id").isNull(), "null_doc_id")
        .when(F.col("text").isNull(), "null_text")
        .when(F.length("text") == 0, "empty_text")
        .when(~F.lower(F.col("text")).rlike("[a-z0-9]"), "no_tokens")
        .otherwise(None)
    )
    tagged = corpus.withColumn("_reason", reason)
    clean = tagged.filter(F.col("_reason").isNull()).drop("_reason")
    poison = tagged.filter(F.col("_reason").isNotNull()).withColumnRenamed("_reason", "reason")
    return clean, poison


def _batch_token_stream(rb):
    """Tokenize one Arrow batch into a flat token stream.

    Arrow C++ kernels end-to-end (utf8_lower + split_pattern_regex run
    in RE2, ~2.5x the pandas ``str`` path): returns
    ``(parent int64, codes int64, dictionary StringArray)`` where
    ``parent`` is the batch row index per non-empty token (ascending)
    and ``codes`` indexes the batch-local term dictionary.  Token
    semantics are pinned to :func:`tokenize_py` (lower + split on
    ``[^a-z0-9]+``, empties dropped) — parity-tested."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(pc.utf8_lower(rb.column("text")), TOKEN_SPLIT_RE)
    flat = lists.flatten()  # null texts yield null lists -> skipped
    parent = pc.list_parent_indices(lists).to_numpy().astype(np.int64)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    if not keep_np.any():
        return None
    if not keep_np.all():
        flat = flat.filter(keep)
        parent = parent[keep_np]
    de = flat.dictionary_encode()
    codes = de.indices.to_numpy().astype(np.int64)
    return parent, codes, de.dictionary


def _group_starts(keys: np.ndarray) -> np.ndarray:
    """Start offsets of equal-value runs in a sorted key array."""
    change = np.empty(keys.size, dtype=bool)
    change[0] = True
    np.not_equal(keys[1:], keys[:-1], out=change[1:])
    return np.flatnonzero(change)


def _doc_local_tf(batches):
    """mapInArrow kernel: per-document term frequencies, vectorized.

    Arrow C++ tokenization (:func:`_batch_token_stream`) + one int64
    key sort per batch — no per-row Python, no pandas string ops, and
    the output batch is built as Arrow arrays (no pandas -> Arrow
    conversion on the ~N-distinct-pairs output).
    Output: one row per distinct (doc, term) with tf and dl attached.
    """
    import pyarrow as pa

    for rb in batches:
        if rb.num_rows == 0:
            continue
        stream = _batch_token_stream(rb)
        if stream is None:
            continue
        parent, codes, dictionary = stream
        nvoc = len(dictionary)
        key = parent * nvoc + codes
        key.sort()
        starts = _group_starts(key)
        tf = np.diff(np.append(starts, key.size))
        gk = key[starts]
        gdoc = gk // nvoc
        gcode = gk % nvoc
        dl = np.bincount(parent, minlength=rb.num_rows)
        idx = pa.array(gdoc)
        yield pa.RecordBatch.from_arrays(
            [
                rb.column("build_part").take(idx),
                rb.column("doc_id").take(idx),
                dictionary.take(pa.array(gcode)),
                pa.array(tf.astype(np.int32)),
                pa.array(dl[gdoc].astype(np.int32)),
            ],
            names=["build_part", "doc_id", "term", "tf", "dl"],
        )


def _doc_local_tf_pos(batches):
    """Positional twin of :func:`_doc_local_tf`: additionally emits
    ``pos_vb`` — the (doc, term) pair's token positions as a
    self-contained VByte delta blob (codec.positions_to_blobs), encoded
    doc-locally BEFORE the shuffle so the position stream compresses at
    the same point the tf stream does."""
    import pyarrow as pa

    from bilies_go_spark.operators.codec import positions_to_blobs

    for rb in batches:
        if rb.num_rows == 0:
            continue
        stream = _batch_token_stream(rb)
        if stream is None:
            continue
        parent, codes, dictionary = stream
        nvoc = len(dictionary)
        # token position among the doc's non-empty tokens (parent is
        # ascending, so positions are offsets from the doc's first row)
        doc_starts = _group_starts(parent)
        doc_counts = np.diff(np.append(doc_starts, parent.size))
        pos = np.arange(parent.size, dtype=np.int64) - np.repeat(
            doc_starts, doc_counts
        )
        key = parent * nvoc + codes
        # stable sort keeps each (doc, term) group's positions ascending
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = _group_starts(ks)
        tf = np.diff(np.append(starts, ks.size))
        gk = ks[starts]
        gdoc = gk // nvoc
        gcode = gk % nvoc
        dl = np.bincount(parent, minlength=rb.num_rows)
        blobs = positions_to_blobs(pos[order], tf)
        idx = pa.array(gdoc)
        yield pa.RecordBatch.from_arrays(
            [
                rb.column("build_part").take(idx),
                rb.column("doc_id").take(idx),
                dictionary.take(pa.array(gcode)),
                pa.array(tf.astype(np.int32)),
                pa.array(dl[gdoc].astype(np.int32)),
                pa.array(blobs, type=pa.binary()),
            ],
            names=["build_part", "doc_id", "term", "tf", "dl", "pos_vb"],
        )


def _make_encoder(block_size: int, positions: bool = False):
    """applyInPandas grouped-map encoder: one (term, salt) group ->
    one encoded segment row.  (An applyInArrow twin was measured 4x
    SLOWER end-to-end on the bench corpus — Spark 4.1's arrow
    grouped-map path pays far more per group at ~6k groups — so the
    pandas grouped map stays; see OPTIMIZATION_r06.md.)"""

    def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        pos_blobs = (
            [bytes(x) for x in pdf["pos_vb"]] if positions else None
        )
        seg = encode_postings(
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["dl"].to_numpy(np.int64),
            block_size=block_size,
            pos_blobs=pos_blobs,
        )
        row = segment_to_row(str(pdf["term"].iloc[0]), int(pdf["salt"].iloc[0]), seg)
        row["term_bucket"] = int(pdf["term_bucket"].iloc[0])
        return pd.DataFrame([row])

    return _encode_group


@dataclass
class IndexPaths:
    """Index directory layout, generation-aware.

    Serving state is published through ONE atomically-replaced pointer
    file ``_current.json``: ``{"gen": N, "tiers": [{"id", "parts"}...],
    "stats": {...}}``.  A full (online) compaction builds segments for
    generation N+1 *beside* the live generation and flips the pointer —
    readers pinned to a generation never observe a half-rewritten base,
    stale tier lists, or torn corpus stats (the Iceberg
    snapshot-pointer model; reference durability analogue:
    write-then-ack, /root/reference/queue.go:115-155).

    ``gen`` selects which generation's segment dirs the ``segments`` /
    ``term_stats`` properties resolve to (generation 0 keeps the plain
    dir names).
    """

    root: str
    gen: int = 0

    def at_gen(self, gen: int) -> "IndexPaths":
        return IndexPaths(self.root, gen=gen)

    @property
    def runs(self) -> str:
        return os.path.join(self.root, "runs")

    @property
    def segments(self) -> str:
        return os.path.join(self.root, "segments" if self.gen == 0 else f"segments.g{self.gen}")

    @property
    def term_stats(self) -> str:
        return os.path.join(
            self.root, "term_stats" if self.gen == 0 else f"term_stats.g{self.gen}"
        )

    @property
    def term_variants(self) -> str:
        return os.path.join(
            self.root,
            "term_variants" if self.gen == 0 else f"term_variants.g{self.gen}",
        )

    @property
    def pos_cache(self) -> str:
        """Persisted positional serving-cache arrays (one dir per hot
        term, see :func:`build_pos_cache`), generation-suffixed like
        ``term_variants`` so an online compaction builds the new
        generation's artifact beside the live one."""
        return os.path.join(
            self.root, "pos_cache" if self.gen == 0 else f"pos_cache.g{self.gen}"
        )

    @property
    def quarantine(self) -> str:
        return os.path.join(self.root, "quarantine")

    @property
    def stats_table(self) -> str:
        return os.path.join(self.root, "corpus_stats")

    # --- tiered (incremental) compaction layout ---------------------------
    # tiers/<tier_id>/{segments,term_stats} hold DELTA segments built from
    # runs parts streamed after the last full compaction; the query engine
    # unions base + tiers (doc-disjoint, so per-(term,doc) uniqueness holds)

    def tier_segments(self, tier: str) -> str:
        return os.path.join(self.root, "tiers", tier, "segments")

    def tier_term_stats(self, tier: str) -> str:
        return os.path.join(self.root, "tiers", tier, "term_stats")

    def tier_term_variants(self, tier: str) -> str:
        return os.path.join(self.root, "tiers", tier, "term_variants")

    # --- the serving pointer ------------------------------------------------

    @property
    def current_pointer(self) -> str:
        return os.path.join(self.root, "_current.json")

    def read_current(self) -> dict:
        """The committed serving view: generation, tier list (with the
        runs parts each tier covers), and corpus stats.  Falls back to
        generation 0 / no tiers / no stats for indexes that predate the
        pointer (or are mid-first-build)."""
        import json

        if os.path.exists(self.current_pointer):
            with open(self.current_pointer) as f:
                cur = json.load(f)
            cur.setdefault("deletes", [])
            return cur
        return {"gen": 0, "tiers": [], "deletes": [], "stats": None}

    def write_current(self, cur: dict) -> None:
        """Atomically flip the serving pointer (write-tmp + rename).
        This is the ONLY write that changes what readers see."""
        import json

        tmp = self.current_pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f, indent=1)
        os.replace(tmp, self.current_pointer)

    def read_tiers(self) -> list[str]:
        return [t["id"] for t in self.read_current()["tiers"]]


@dataclass
class BuildConfig:
    n_buckets: int = 16
    block_size: int = DEFAULT_BLOCK_SIZE
    target_postings_per_salt: int = 250_000
    # tasks a single hot (build_part, bucket) dir spreads across in the
    # stage-A shuffle; also the files-per-dir bound
    bucket_spread: int = 2
    parts_per_chunk: int | None = None  # None = all pending in one chunk
    buckets_per_chunk: int | None = None
    build_part_expr: str = "date_format(ts, 'yyyy-MM-dd')"
    # store token positions (Lucene DOCS_AND_FREQS_AND_POSITIONS
    # analogue) — enables phrase queries; costs ~1 byte/token extra in
    # the runs shuffle and segments, so off by default
    positions: bool = False
    # materialize the positional serving-cache arrays for hot terms at
    # build time (build_pos_cache) — positional indexes only; turns the
    # serving cold-start from O(decode+sort) into O(read)
    serving_cache: bool = True
    # absolute df floor for "hot" (the effective threshold is
    # max(serving_cache_min_df, 1% of n_docs), mirroring
    # QueryEngine.HOT_DF_FRAC); tests lower it to exercise the artifact
    serving_cache_min_df: int = 1000

    @property
    def runs_schema(self) -> str:
        return RUNS_POS_SCHEMA if self.positions else RUNS_SCHEMA

    @property
    def segment_schema(self) -> str:
        return SEGMENT_POS_SCHEMA if self.positions else SEGMENT_SCHEMA


#: salt lookup rides the query plan as a literal map while the hot-term
#: set (df > target_postings_per_salt) fits; past this, fall back to the
#: broadcast join (a 10^12-doc vocabulary can have ~10^5+ hot terms and
#: a literal that large would blow up planning, guide §7.3)
SALT_MAP_MAX_TERMS = 4096


def _attach_salt(runs: DataFrame, tstats_r: DataFrame, cfg: BuildConfig) -> DataFrame:
    """Attach the per-posting ``salt`` column: ``pmod(xxhash64(doc_id,
    MIX), n_salts(term))`` with ``n_salts = ceil(df / target)``.

    Almost every term has ``n_salts == 1`` (only Zipf-hot terms split),
    so shipping the few hot terms as a literal ``create_map`` lookup
    (probe stays inside whole-stage codegen) measures ~6 s faster per
    bench build than broadcast-joining the full term-stats table —
    the join forced an extra exchange + codegen break on the ~N-postings
    stream.  Result-identical either way (segment partition only)."""
    n_salts = F.greatest(
        F.lit(1),
        F.ceil(F.col("df") / F.lit(cfg.target_postings_per_salt)),
    ).cast("int")
    hot = (
        tstats_r.filter(F.col("df") > cfg.target_postings_per_salt)
        .select("term", n_salts.alias("n_salts"))
        .limit(SALT_MAP_MAX_TERMS + 1)
        .collect()
    )
    if len(hot) <= SALT_MAP_MAX_TERMS:
        if hot:
            mp = F.create_map(
                *[F.lit(x) for r in hot for x in (r["term"], r["n_salts"])]
            )
            ns = F.coalesce(mp[F.col("term")], F.lit(1))
        else:
            ns = F.lit(1)
        salted = runs.withColumn("n_salts", ns)
    else:
        salted = runs.join(
            tstats_r.select("term", n_salts.alias("n_salts")), "term"
        )
    return salted.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("doc_id"), F.lit(_SALT_MIX)), F.col("n_salts")
        ).cast("int"),
    )


def plan_build_parts(corpus: DataFrame, cfg: BuildConfig) -> list[str]:
    rows = (
        corpus.select(F.expr(cfg.build_part_expr).alias("build_part"))
        .distinct()
        .collect()
    )
    return sorted(str(r["build_part"]) for r in rows)


def _chunks(items: list, size: int | None) -> list[list]:
    if not items:
        return []
    if size is None or size >= len(items):
        return [items]
    return [items[i : i + size] for i in range(0, len(items), size)]


def build_runs(
    spark: SparkSession,
    corpus: DataFrame,
    paths: IndexPaths,
    cfg: BuildConfig,
    lineage: Lineage,
    max_chunks: int | None = None,
) -> int:
    """Stage A. Returns number of chunks processed (0 = nothing pending)."""
    tagged = corpus.withColumn("build_part", F.expr(cfg.build_part_expr))
    clean, poison = split_poison(tagged)
    planned = plan_build_parts(corpus, cfg)
    pending = lineage.pending(spark, "runs", planned)
    if pending and not lineage.completed(spark, "runs"):
        # first run: materialize the quarantine table once — partitioned
        # by build_part (same layout the streaming path overwrites
        # per-batch, so replays stay idempotent in both modes)
        tableio.write_partitioned(
            poison, paths.quarantine, ["build_part"], dynamic_overwrite=False
        )
    chunks = _chunks(pending, cfg.parts_per_chunk)
    if max_chunks is not None:
        chunks = chunks[:max_chunks]
    n_parallel = spark.sparkContext.defaultParallelism
    for chunk in chunks:
        with StageTimer() as t:
            sub = clean.filter(F.col("build_part").isin(chunk))
            runs = sub.select("build_part", "doc_id", "text").mapInArrow(
                _doc_local_tf_pos if cfg.positions else _doc_local_tf,
                schema=cfg.runs_schema,
            )
            # the one token-stream shuffle: co-locate each build_part's
            # rows into ~spread tasks (doc-hash fan-out keeps a hot part
            # from straggling).  Runs are partitioned on disk by
            # build_part ONLY — that is the resume/overwrite unit; term
            # routing is a cheap hash recomputed in stage B, and
            # files-per-chunk stays O(parts x spread), not
            # O(parts x buckets x spread) (a 933-file-per-2k-docs
            # explosion in the first layout).
            spread = max(cfg.bucket_spread, -(-2 * n_parallel // max(len(chunk), 1)))
            runs = runs.repartition(
                max(n_parallel, len(chunk)),
                "build_part",
                F.pmod(F.xxhash64("doc_id"), F.lit(spread)),
            )
            tableio.write_partitioned(
                runs, paths.runs, ["build_part"], dynamic_overwrite=True
            )
            # ack-ledger stats from the WRITTEN runs, one columnar agg —
            # dl(doc) == sum of its tfs, so no second tokenization pass
            # over the corpus text (2x text-scan would dominate at scale)
            stat_rows = {
                r["build_part"]: r
                # schema-pinned read: the user schema types build_part
                # as STRING, disabling hive partition-type inference
                # entirely (DATE-/int-looking part values would
                # otherwise canonicalize — '01' -> '1' — and miss the
                # ledger keys, acking rows=0 and corrupting n_docs)
                for r in spark.read.schema(RUNS_SCHEMA).parquet(paths.runs)
                .filter(F.col("build_part").isin(chunk))
                .groupBy("build_part")
                .agg(
                    F.count("*").alias("p"),
                    F.sum("tf").alias("sum_dl"),
                    F.countDistinct("doc_id").alias("n"),
                )
                .collect()
            }
        per = t.seconds / max(len(chunk), 1)
        lineage.ack(
            spark,
            "runs",
            [
                {
                    "part": p,
                    "rows": stat_rows[p]["n"] if p in stat_rows else 0,
                    "sum_dl": stat_rows[p]["sum_dl"] if p in stat_rows else 0,
                    "postings": stat_rows[p]["p"] if p in stat_rows else 0,
                    "seconds": per,
                }
                for p in chunk
            ],
        )
        tableio.commit_snapshot(
            paths.runs, {"stage": "runs", "parts": chunk, "run_id": lineage.run_id}
        )
    return len(chunks)


def build_segments(
    spark: SparkSession,
    paths: IndexPaths,
    cfg: BuildConfig,
    lineage: Lineage,
    max_chunks: int | None = None,
) -> int:
    """Stage B. Returns number of chunks processed."""
    planned = [str(b) for b in range(cfg.n_buckets)]
    pending = lineage.pending(spark, "segments", planned)
    chunks = _chunks(pending, cfg.buckets_per_chunk)
    if max_chunks is not None:
        chunks = chunks[:max_chunks]
    encoder = _make_encoder(cfg.block_size, positions=cfg.positions)
    for chunk in chunks:
        bucket_ids = [int(b) for b in chunk]
        with StageTimer() as t:
            runs = (
                spark.read.schema(cfg.runs_schema).parquet(paths.runs)
                .drop("build_part")  # segment layout is bucket-keyed only
                .withColumn("term_bucket", term_bucket_col("term", cfg.n_buckets))
                .filter(F.col("term_bucket").isin(bucket_ids))
            )
            runs = _purge_tombstones(spark, paths, lineage, runs)
            tstats = runs.groupBy("term_bucket", "term").agg(
                F.count("*").alias("df"), F.sum("tf").alias("cf")
            )
            tableio.write_partitioned(
                tstats.select("term", "df", "cf", "term_bucket"),
                paths.term_stats,
                ["term_bucket"],
            )
            tstats_r = spark.read.parquet(paths.term_stats).filter(
                F.col("term_bucket").isin(bucket_ids)
            )
            salted = _attach_salt(runs, tstats_r, cfg).select(
                "term_bucket", "term", "salt", "doc_id", "tf", "dl",
                *(["pos_vb"] if cfg.positions else []),
            )
            segments = salted.groupBy("term_bucket", "term", "salt").applyInPandas(
                encoder, schema=cfg.segment_schema
            )
            tableio.write_partitioned(segments, paths.segments, ["term_bucket"])
            seg_stats = {
                r["term_bucket"]: r
                for r in spark.read.parquet(paths.segments)
                .filter(F.col("term_bucket").isin(bucket_ids))
                .groupBy("term_bucket")
                .agg(
                    F.sum("n_docs").alias("postings"),
                    F.sum(
                        F.length("doc_gaps_vb")
                        + F.length("tfs_vb")
                        + F.length("dls_vb")
                    ).alias("bytes_out"),
                    F.count("*").alias("n_segments"),
                )
                .collect()
            }
        per = t.seconds / max(len(chunk), 1)
        lineage.ack(
            spark,
            "segments",
            [
                {
                    "part": str(b),
                    "rows": seg_stats[b]["n_segments"] if b in seg_stats else 0,
                    "postings": seg_stats[b]["postings"] if b in seg_stats else 0,
                    "bytes_out": seg_stats[b]["bytes_out"] if b in seg_stats else 0,
                    "seconds": per,
                }
                for b in bucket_ids
            ],
        )
        tableio.commit_snapshot(
            paths.segments,
            {"stage": "segments", "parts": chunk, "run_id": lineage.run_id},
        )
    return len(chunks)


def encode_segments(
    spark: SparkSession,
    runs: DataFrame,
    seg_path: str,
    ts_path: str,
    cfg: BuildConfig,
) -> None:
    """Encode a runs DataFrame into VByte segments + term stats at the
    given paths (single pass over all buckets, idempotent overwrite).
    The chunked/resumable outer loop over buckets is
    :func:`build_segments`; this is the shared inner pipeline, also
    used by tiered compaction to encode a small DELTA of runs."""
    runs = runs.withColumn("term_bucket", term_bucket_col("term", cfg.n_buckets))
    tstats = runs.groupBy("term_bucket", "term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    tableio.write_partitioned(
        tstats.select("term", "df", "cf", "term_bucket"), ts_path, ["term_bucket"]
    )
    tstats_r = spark.read.parquet(ts_path)
    salted = _attach_salt(runs, tstats_r, cfg).select(
        "term_bucket", "term", "salt", "doc_id", "tf", "dl",
        *(["pos_vb"] if cfg.positions else []),
    )
    segments = salted.groupBy("term_bucket", "term", "salt").applyInPandas(
        _make_encoder(cfg.block_size, positions=cfg.positions),
        schema=cfg.segment_schema,
    )
    tableio.write_partitioned(segments, seg_path, ["term_bucket"])


#: SQL generator for a term's SymSpell deletion variants (the term
#: itself + every single-character deletion) — shared by the build-time
#: variant-dictionary writer and the legacy per-batch expansion scan
DELETION_VARIANTS_EXPR = (
    "array_union(array(term), transform(sequence(1, length(term)), "
    "i -> concat(substring(term, 1, i - 1), substring(term, i + 1, length(term)))))"
)

#: ES ``AUTO`` fuzziness allows Levenshtein distance 2 only for terms
#: of length >= 6 (0 for 1-2, 1 for 3-5) — so depth-2 deletion variants
#: are only ever needed for dictionary terms this long: a distance-2
#: pair needs 2 dictionary-side deletions only when both edits consume
#: a dictionary char (2 substitutions / 2 deletions), which forces
#: len(dict term) >= len(query term) >= 6.
SYMSPELL_DEPTH2_MIN_LEN = 6

#: depth-<=2 variant generator: the depth-1 set plus every i<j
#: two-character deletion, the latter only for terms long enough to
#: ever need distance 2 under ES AUTO (see SYMSPELL_DEPTH2_MIN_LEN)
DELETION_VARIANTS2_EXPR = (
    "array_union(" + DELETION_VARIANTS_EXPR + ", "
    f"IF(length(term) >= {SYMSPELL_DEPTH2_MIN_LEN}, "
    "array_distinct(flatten(transform(sequence(1, length(term) - 1), "
    "i -> transform(sequence(i + 1, length(term)), "
    "j -> concat(substring(term, 1, i - 1), substring(term, i + 1, j - i - 1), "
    "substring(term, j + 1, length(term))))))), "
    "array()))"
)


def build_term_variants(
    spark: SparkSession, ts_path: str, tv_path: str, cfg: BuildConfig
) -> None:
    """Materialize the SymSpell deletion-variant dictionary next to the
    term stats: (variant, term) for every 0/1-char deletion of every
    vocabulary term, partitioned by ``variant_bucket`` (hash of the
    VARIANT).  Fuzzy expansion then answers from a partition-pruned
    equality lookup instead of scanning + exploding the entire
    vocabulary per query batch — the SymSpell design as intended: pay
    O(vocab · len) ONCE at build, O(query variants) per query.  One
    linear pass over the vocabulary; idempotent full overwrite.

    Depth: 0/1-char deletions for every term, plus 2-char deletions for
    terms >= :data:`SYMSPELL_DEPTH2_MIN_LEN` chars — exactly the
    dictionary side ES ``AUTO`` fuzziness (distance 2 at length >= 6)
    requires.  A ``_symspell.json`` marker records the depth so readers
    can tell this table from a depth-1-only one built by an older
    package (those route AUTO expansion to the vocabulary scan)."""
    import json

    ts = spark.read.parquet(ts_path).select("term").distinct()
    tv = (
        ts.select("term", F.explode(F.expr(DELETION_VARIANTS2_EXPR)).alias("variant"))
        .distinct()
        .withColumn("variant_bucket", term_bucket_col("variant", cfg.n_buckets))
    )
    tableio.write_partitioned(
        tv.select("variant", "term", "variant_bucket"), tv_path, ["variant_bucket"]
    )
    with open(os.path.join(tv_path, "_symspell.json"), "w") as f:
        json.dump({"max_depth": 2, "depth2_min_len": SYMSPELL_DEPTH2_MIN_LEN}, f)


def pos_cache_term_dir(root: str, term: str) -> str:
    """Filesystem-safe per-term artifact dir (md5 digest of the term;
    the digest is a filename, never a lookup key — loaders verify the
    exact term against meta.json, so a collision degrades to a miss)."""
    import hashlib

    return os.path.join(root, "t_" + hashlib.md5(term.encode("utf-8")).hexdigest())


def build_pos_cache(
    spark: SparkSession, paths: IndexPaths, cfg: BuildConfig, n_docs: int
) -> int:
    """Materialize the positional serving cache for HOT terms at build
    time: each term's decoded (ids, tfs, dls) posting arrays plus the
    SORTED composite (doc·2^21 + pos) key array — exactly the
    ``_PosCache`` entry the phrase/proximity/composed serving path
    consumes — written as raw ``.npy`` files the engine mmaps on first
    touch.  Turns the serving cold-start from O(decode + sort) (a
    measured 52.9 s for one hot-term query set on a 2M-turn index)
    into O(read).

    One task per hot term (the per-term arrays are inherently a single
    serialized artifact): hot terms are bounded by df >= 1% of the
    corpus, so this is a few hundred tasks over the already-encoded
    segments.  Like the dense-contribution cache, the artifact serves
    the SINGLE-NODE serving regime — the 10^12-doc path is the
    doc-range-sharded plans, which never touch it.  The root is wiped
    first so a rebuild (resumed offline build over more data) can
    never leave a stale no-longer-hot term behind; readers that race
    the wipe fall back to the decode path (artifact miss is always
    safe).  Tombstones and tiers are applied/merged at LOAD time by
    the engine, so the artifact is a pure function of this
    generation's base segments."""
    import shutil

    thresh = max(cfg.serving_cache_min_df, 0.01 * n_docs)
    root = paths.pos_cache
    hot = (
        spark.read.parquet(paths.term_stats)
        .filter(F.col("df") >= F.lit(float(thresh)))
        .select("term_bucket", "term")
    )
    segs = spark.read.parquet(paths.segments).join(
        F.broadcast(hot), ["term_bucket", "term"]
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    def writer(pdf: pd.DataFrame) -> pd.DataFrame:
        import json
        import shutil as _sh
        import uuid

        import bilies_go_spark
        from bilies_go_spark.operators.codec import row_to_segment
        from bilies_go_spark.operators.query import build_pos_entry

        term = str(pdf["term"].iloc[0])
        vb = int(
            pdf["doc_gaps_vb"].str.len().sum()
            + pdf["tfs_vb"].str.len().sum()
            + pdf["dls_vb"].str.len().sum()
            + pdf["positions_vb"].str.len().sum()
        )
        bilies_go_spark.prefault_heap(min(24 * vb + (32 << 20), 384 << 20))
        runs = [row_to_segment(r) for _, r in pdf.iterrows()]
        ids, tfs, dls, keys = build_pos_entry(runs, None)
        final = pos_cache_term_dir(root, term)
        tmp = final + ".tmp." + uuid.uuid4().hex[:8]
        os.makedirs(tmp)
        np.save(os.path.join(tmp, "ids.npy"), ids)
        np.save(os.path.join(tmp, "tfs.npy"), tfs)
        np.save(os.path.join(tmp, "dls.npy"), dls)
        np.save(os.path.join(tmp, "keys.npy"), keys)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"term": term, "n_postings": int(ids.size)}, f)
        _sh.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)  # term dirs appear atomically
        nb = int(ids.nbytes + tfs.nbytes + dls.nbytes + keys.nbytes)
        return pd.DataFrame(
            [
                {
                    "term": term,
                    "n_postings": int(ids.size),
                    "n_keys": int(keys.size),
                    "n_bytes": nb,
                }
            ]
        )

    manifest = segs.groupBy("term").applyInPandas(
        writer, schema="term string, n_postings bigint, n_keys bigint, n_bytes bigint"
    )
    # O(#hot terms) rows — driver-metadata-sized
    return len(manifest.collect())


def pending_folds(spark: SparkSession, lineage: Lineage) -> list[str]:
    """Runs parts whose postings are not yet folded into ANY segment
    tier (nor the base segments)."""
    done_runs = sorted(lineage.completed(spark, "runs"))
    folded = lineage.completed(spark, "folded")
    return [p for p in done_runs if p not in folded]


def mark_folded(spark: SparkSession, lineage: Lineage, parts: list[str]) -> None:
    if parts:
        lineage.ack(spark, "folded", [{"part": p} for p in parts])


def finalize_stats(spark: SparkSession, paths: IndexPaths, lineage: Lineage) -> dict:
    """Derive exact corpus stats (N, avgdl) from the stage-A ack ledger
    and commit them as a one-row table the query engine broadcasts.

    Pure driver-side work (the ledger is O(#parts) rows): no Spark job.
    Returns the stats dict so callers can publish it atomically inside
    the serving pointer (readers use the pointer copy; the parquet
    table is the external/Spark-join surface).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    lin_all = lineage.read_pandas()
    lin = lin_all[(lin_all["stage"] == "runs") & (lin_all["status"] == "done")]
    # one ack per part counts (replays append identical deterministic values)
    per_part = lin.groupby("part").agg({"rows": "max", "sum_dl": "max"}) if len(lin) else None
    n = int(per_part["rows"].sum()) if per_part is not None else 0
    total_dl = int(per_part["sum_dl"].sum()) if per_part is not None else 0
    # tombstones subtract (operators/deletes.py): the runs ledger is
    # append-only and still counts deleted docs; the deletes stage
    # records the exact (n_docs, sum_dl) each batch removed
    dels = lin_all[(lin_all["stage"] == "deletes") & (lin_all["status"] == "done")]
    if len(dels):
        per_del = dels.groupby("part").agg({"rows": "max", "sum_dl": "max"})
        n -= int(per_del["rows"].sum())
        total_dl -= int(per_del["sum_dl"].sum())
    avgdl = (total_dl / n) if n else 0.0
    schema = pa.schema(
        [("n_docs", pa.int64()), ("total_dl", pa.int64()), ("avgdl", pa.float64())]
    )
    pdf = pd.DataFrame([{"n_docs": n, "total_dl": total_dl, "avgdl": avgdl}])
    os.makedirs(paths.stats_table, exist_ok=True)
    tmp = os.path.join(paths.stats_table, ".stats.parquet.tmp")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp)
    # atomic single-file replace — no rmtree window where readers see
    # an empty stats table
    os.replace(tmp, os.path.join(paths.stats_table, "stats.parquet"))
    tableio.commit_snapshot(paths.root, {"stage": "finalize", "n_docs": n, "avgdl": avgdl})
    return {"n_docs": n, "total_dl": total_dl, "avgdl": avgdl}


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    cfg: BuildConfig | None = None,
) -> IndexPaths:
    """Full (resumable) OFFLINE build: stage A + stage B + stats +
    pointer publish.  Writes segment dirs of the CURRENT generation in
    place (idempotent partition overwrite) — use
    ``streaming.ingest.compact`` for the online path, which builds a
    new generation beside the live one and flips the pointer.

    Safe to call again after a crash — completed parts are skipped via
    the lineage ledger; partially-written parts are idempotently
    overwritten.
    """
    cfg = cfg or BuildConfig()
    paths = IndexPaths(index_dir, gen=IndexPaths(index_dir).read_current()["gen"])
    lineage = Lineage(index_dir)
    write_index_meta(paths, cfg)
    build_runs(spark, corpus, paths, cfg, lineage)
    build_segments(spark, paths, cfg, lineage)
    build_term_variants(spark, paths.term_stats, paths.term_variants, cfg)
    stats = finalize_stats(spark, paths, lineage)
    if cfg.positions and cfg.serving_cache:
        build_pos_cache(spark, paths, cfg, stats["n_docs"])
    publish_full_view(spark, paths, lineage, stats)
    return paths


def _purge_tombstones(
    spark: SparkSession, paths: IndexPaths, lineage: Lineage, runs: DataFrame
) -> DataFrame:
    """FULL segment builds physically exclude tombstoned docs (the
    Lucene merge-purge): anti-join the runs stream against every
    ledger-ACKED delete batch — not just pointer-live ones.  The runs
    table is append-only and keeps deleted docs forever, so excluding
    only live batches would RESURRECT docs purged by an earlier
    compaction (its pointer flip cleared the deletes list).  The
    pointer flip that publishes this build retires the live batches in
    the same rename, so per-term df is never double-subtracted (base
    already net + negative delta would be).  The delete set is small
    by contract (operators/deletes.py), hence the broadcast."""
    from bilies_go_spark.operators.deletes import read_acked_deleted_ids

    ids = read_acked_deleted_ids(paths, lineage)
    if ids.size == 0:
        return runs
    dd = spark.createDataFrame(
        pd.DataFrame({"doc_id": ids.astype("int64")}), schema="doc_id bigint"
    )
    return runs.join(F.broadcast(dd), "doc_id", "left_anti")


def publish_full_view(
    spark: SparkSession, paths: IndexPaths, lineage: Lineage, stats: dict
) -> None:
    """After a FULL segment build at ``paths.gen`` covering every runs
    part: mark all parts folded, then atomically point readers at
    (this generation, no tiers, no live tombstones — the build purged
    them physically — and these stats).  Every acked delete batch is
    marked published here: the purge retired them all, including any
    acked-but-never-published batch a crash left behind (its docs were
    purged too, so re-publishing it later would double-subtract df)."""
    from bilies_go_spark.operators.deletes import (
        acked_delete_batches,
        published_delete_batches,
    )

    mark_folded(spark, lineage, pending_folds(spark, lineage))
    unpub = sorted(set(acked_delete_batches(lineage)) - published_delete_batches(lineage))
    if unpub:
        lineage.ack(spark, "del_published", [{"part": b} for b in unpub])
    paths.write_current({"gen": paths.gen, "tiers": [], "deletes": [], "stats": stats})


def gc_stale_generations(paths: IndexPaths) -> list[str]:
    """Remove segment generations and tier directories no longer
    referenced by the committed pointer.

    Grace policy: this runs at the START of the next compaction, so a
    view retired by compaction N stays readable until compaction N+1
    begins — a live ``QueryEngine`` (pinned at construction) survives
    at least one full compaction cycle instead of crashing on files
    deleted under it."""
    import shutil

    cur = paths.read_current()
    live_tiers = {t["id"] for t in cur["tiers"]}
    removed = []
    for name in sorted(os.listdir(paths.root)) if os.path.isdir(paths.root) else []:
        for prefix in ("segments.g", "term_stats.g", "term_variants.g", "pos_cache.g"):
            if name.startswith(prefix):
                gen = int(name[len(prefix):])
                if gen != cur["gen"]:
                    shutil.rmtree(os.path.join(paths.root, name), ignore_errors=True)
                    removed.append(name)
    if cur["gen"] != 0:
        for name in ("segments", "term_stats", "term_variants", "pos_cache"):  # generation 0
            p = os.path.join(paths.root, name)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(name)
    tiers_root = os.path.join(paths.root, "tiers")
    if os.path.isdir(tiers_root):
        for name in sorted(os.listdir(tiers_root)):
            if name not in live_tiers:
                shutil.rmtree(os.path.join(tiers_root, name), ignore_errors=True)
                removed.append(f"tiers/{name}")
    return removed


def write_index_meta(paths: IndexPaths, cfg: BuildConfig) -> None:
    import json

    os.makedirs(paths.root, exist_ok=True)
    meta = {
        "n_buckets": cfg.n_buckets,
        "block_size": cfg.block_size,
        "target_postings_per_salt": cfg.target_postings_per_salt,
        "build_part_expr": cfg.build_part_expr,
        "positions": cfg.positions,
        "serving_cache": cfg.serving_cache,
        "serving_cache_min_df": cfg.serving_cache_min_df,
        "format_version": 1,
    }
    tmp = os.path.join(paths.root, "_index_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(paths.root, "_index_meta.json"))


def expected_salts(df: int, target: int) -> int:
    return max(1, math.ceil(df / target))
