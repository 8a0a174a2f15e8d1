"""Deduplication operators for large-scale training-data pipelines.

Five levels, each a first-class ``queries()`` entry with a DuckDB
oracle (functions/portable.py pins the shared constants):

* :func:`exact_groups` — exact dedup: md5 fingerprint of the normalized
  token stream, groupBy fingerprint.  One shuffle on a 32-byte key;
  at 100 TB this is the cheapest possible full-corpus dedup (the
  fingerprint is computed scan-side, so the shuffle moves 32 B + ids
  per doc, never the text).
* :func:`ngram_jaccard_pairs` — exact n-gram (shingle) Jaccard
  similarity pairs above a threshold via shingle self-join.  Exact but
  quadratic in collisions; the honest baseline the approximate methods
  are tested against.  At scale you run it only *within* LSH buckets.
* :func:`minhash_lsh_pairs` — MinHash signatures (md5-based, portable)
  + banded LSH: candidate pairs = docs sharing any band key.  The scale
  path: cost is linear in corpus size, the only self-join is on band
  keys whose expected collision rate is tuned by (n_hashes, band_size).
* :func:`simhash` — per-doc SimHash: tf-weighted majority vote over
  hash bits of each distinct term.  Near-dup docs differ in few bits.
* :func:`min_fingerprint` — single min-hash document fingerprint over
  5-token shingles (a cheap locality-sensitive doc signature used for
  candidate grouping / winnowing-style sketching).

Reference analogue: bilies-go dedupes nothing itself but relies on
stable ``_id`` upserts for idempotence (/root/reference/batcher.go:91);
``exact_groups``'s keep-min-doc_id is the same "stable identity wins"
contract applied corpus-wide.

Everything is pure DataFrame/Catalyst: hashing, shingling and joins are
JVM-side (whole-stage codegen); there is no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bilies_go_spark.functions.portable import (
    FINGERPRINT_SHINGLE_N,
    JACCARD_THRESHOLD,
    MINHASH_BAND_SIZE,
    MINHASH_N,
    ROUND_DIGITS,
    SHINGLE_N,
    SIMHASH_BITS,
    duck_nibble,
    duck_round,
    duck_shingles,
    duck_tokens,
    spark_nibble_expr,
    spark_shingles_expr,
)
from bilies_go_spark.functions.tokenize import tokenize_col


def with_shingles(docs: DataFrame, n: int = SHINGLE_N, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — DISTINCT n-token shingles per document."""
    tk = docs.select("doc_id", tokenize_col(text_col).alias("tk"))
    return (
        tk.filter(F.size("tk") > 0)
        .select("doc_id", F.explode(F.expr(spark_shingles_expr("tk", n))).alias("shingle"))
        .distinct()
    )


def exact_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, n_docs, keep_doc_id) — exact-dup groups.

    Fingerprint = md5 of the space-joined token stream, i.e. dedup is
    insensitive to case/punctuation/whitespace but exact on content.
    """
    fp = docs.select(
        F.md5(F.concat_ws(" ", tokenize_col(text_col))).alias("fingerprint"),
        "doc_id",
    )
    return fp.groupBy("fingerprint").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


def exact_groups_oracle(table: str = "documents") -> str:
    return f"""
SELECT md5(array_to_string({duck_tokens()}, ' ')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM {table}
GROUP BY 1
"""


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact shingle-set Jaccard >= threshold.

    Shuffle plan: one exchange on ``shingle`` for the self-join, one on
    the (a, b) pair for the intersection count — both keyed on values
    far more uniform than raw terms.  At 100 TB, run inside LSH buckets
    (see :func:`minhash_lsh_pairs`) instead of corpus-wide.
    """
    sh = with_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("ns"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("ns", "na"), inter.doc_a == sizes.doc_id)
        .drop("doc_id")
        .join(sizes.withColumnRenamed("ns", "nb"), F.col("doc_b") == sizes.doc_id)
        .drop("doc_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), ROUND_DIGITS),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_oracle(
    table: str = "documents",
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
) -> str:
    return f"""
WITH tk AS (SELECT doc_id, {duck_tokens()} AS tk FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, s.shingle
  FROM tk, unnest({duck_shingles('tk', n)}) AS s(shingle)
  WHERE len(tk) > 0
),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       {duck_round('i.inter * 1.0 / (na.ns + nb.ns - i.inter)')} AS jaccard
FROM inter i JOIN sizes na ON i.doc_a = na.doc_id JOIN sizes nb ON i.doc_b = nb.doc_id
WHERE {duck_round('i.inter * 1.0 / (na.ns + nb.ns - i.inter)')} >= {threshold}
"""


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
    n: int = SHINGLE_N,
) -> DataFrame:
    """(doc_a, doc_b) — banded-MinHash LSH candidate pairs, distinct.

    sig(doc, seed) = min over shingles of md5('<seed>:<shingle>');
    band key = md5 of the band's seed-ordered signature concat.  Two
    docs collide iff some band's signatures all agree — the standard
    (b, r) S-curve with b=4, r=3 here.  Portable: md5 string-min is
    identical in Spark and DuckDB.

    Scale notes: seeds arrive via a broadcast cross-join (n_hashes
    rows); the heavy groupBy is on (doc_id, seed) — uniform keys; the
    final self-join is on band keys, whose cardinality LSH keeps tiny.
    """
    spark = docs.sparkSession
    sh = with_shingles(docs, n)
    seeds = F.broadcast(spark.range(n_hashes).select(F.col("id").cast("int").alias("seed")))
    sig = (
        sh.crossJoin(seeds)
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )
    bands = sig.withColumn("band", F.floor(F.col("seed") / band_size).cast("int")).groupBy(
        "doc_id", "band"
    ).agg(
        F.expr(
            "md5(concat_ws('', transform(array_sort(collect_list(struct(seed, sig))), x -> x.sig)))"
        ).alias("band_key")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_oracle(
    table: str = "documents",
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
    n: int = SHINGLE_N,
) -> str:
    return f"""
WITH tk AS (SELECT doc_id, {duck_tokens()} AS tk FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, s.shingle
  FROM tk, unnest({duck_shingles('tk', n)}) AS s(shingle)
  WHERE len(tk) > 0
),
seeds AS (SELECT unnest(generate_series(0, {n_hashes - 1})) AS seed),
sig AS (
  SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS sig
  FROM sh, seeds GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, seed // {band_size} AS band,
         md5(string_agg(sig, '' ORDER BY seed)) AS band_key
  FROM sig GROUP BY 1, 2
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def jaccard_on_candidates(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact Jaccard scored ONLY on
    MinHash-LSH candidate pairs (:func:`minhash_lsh_pairs`).

    THE scale path for near-dup scoring: candidate generation is linear
    (banded signatures), and exact scoring joins the shingle sets only
    for candidate pairs — every join here is an equality join on doc
    ids or (doc, shingle), so no quadratic shingle blow-up on Zipf-hot
    shingles (the failure mode of corpus-wide
    :func:`ngram_jaccard_pairs`, which stays as the test-side recall
    oracle).  LSH recall vs the brute path is pinned in tests.
    """
    cand = minhash_lsh_pairs(docs, n_hashes, band_size, n)
    sh = with_shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("ns"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("ns", "na"), inter.doc_a == sizes.doc_id)
        .drop("doc_id")
        .join(sizes.withColumnRenamed("ns", "nb"), F.col("doc_b") == sizes.doc_id)
        .drop("doc_id")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), ROUND_DIGITS),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def jaccard_on_candidates_oracle(
    table: str = "documents",
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
) -> str:
    return f"""
WITH tk AS (SELECT doc_id, {duck_tokens()} AS tk FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, s.shingle
  FROM tk, unnest({duck_shingles('tk', n)}) AS s(shingle)
  WHERE len(tk) > 0
),
seeds AS (SELECT unnest(generate_series(0, {n_hashes - 1})) AS seed),
sig AS (
  SELECT doc_id, seed, min(md5(seed || ':' || shingle)) AS sig
  FROM sh, seeds GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, seed // {band_size} AS band,
         md5(string_agg(sig, '' ORDER BY seed)) AS band_key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       {duck_round('i.inter * 1.0 / (na.ns + nb.ns - i.inter)')} AS jaccard
FROM inter i JOIN sizes na ON i.doc_a = na.doc_id JOIN sizes nb ON i.doc_b = nb.doc_id
WHERE {duck_round('i.inter * 1.0 / (na.ns + nb.ns - i.inter)')} >= {threshold}
"""


def duplicate_components(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
    max_iters: int = 50,
) -> DataFrame:
    """(doc_id, component) — connected components of the near-dup graph.

    Edges = :func:`jaccard_on_candidates` pairs; component = the
    minimum doc_id reachable (so each dup GROUP gets the stable "keep"
    id, extending exact_groups' keep-min contract to near-dups).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels — converges in
    O(graph diameter) rounds, and near-dup graphs are unions of small
    cliques (diameter ~2), so 2-3 rounds in practice.  Each round is
    one shuffle-join + aggregation; the only driver-side value is the
    converged? count — the standard large-scale CC recipe (no
    collect of nodes/edges).  Labels are ``localCheckpoint``-ed every
    round: without lineage truncation the logical plan DOUBLES per
    round and long chains (diameter >~8) blow up plan compilation —
    the same reason GraphX checkpoints iterative state.
    """
    pairs = jaccard_on_candidates(docs, threshold, n, n_hashes, band_size)
    edges = pairs.select("doc_a", "doc_b").union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            labels.join(nbr, labels.doc_id == nbr.doc_a, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    if changed:
        # never return unconverged labels as if they were components: a
        # chain with diameter > max_iters would silently diverge from
        # the transitive-closure oracle
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iters} rounds "
            f"({changed} labels still shrinking); raise max_iters"
        )
    return labels.select("doc_id", "component")


def duplicate_components_oracle(
    table: str = "documents",
    threshold: float = JACCARD_THRESHOLD,
    n: int = SHINGLE_N,
    n_hashes: int = MINHASH_N,
    band_size: int = MINHASH_BAND_SIZE,
) -> str:
    pairs = jaccard_on_candidates_oracle(table, threshold, n, n_hashes, band_size).strip()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
)
SELECT a AS doc_id, least(a, min(b)) AS component FROM reach GROUP BY a
"""


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over md5 bits of terms.

    bit b of md5(term) = bit (b mod 4) of the hex nibble at position
    (b div 4 + 1); per (doc, b) the vote is sum(tf * (2*bit - 1)); the
    doc's bit is 1 iff the vote is strictly positive.  The b-way
    expansion is a constant-factor (x``bits``) JVM-side explode with
    map-side partial aggregation — no Python, no skew (keys are
    (doc_id, b)).
    """
    toks = docs.select("doc_id", F.explode(tokenize_col(text_col)).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    tf = tf.withColumn("h", F.md5(F.col("term")))
    bits_df = F.broadcast(
        docs.sparkSession.range(bits).select(F.col("id").cast("int").alias("b"))
    )
    nib = spark_nibble_expr("h", "(b div 4) + 1")
    votes = (
        tf.crossJoin(bits_df)
        .withColumn("bit", F.expr(f"(shiftright({nib}, pmod(b, 4)) & 1)"))
        .groupBy("doc_id", "b")
        .agg(F.sum(F.col("tf") * (F.col("bit") * 2 - 1)).alias("vote"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.expr("CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END")
        ).alias("simhash")
    )


def simhash_oracle(table: str = "documents", bits: int = SIMHASH_BITS) -> str:
    nib = duck_nibble("h", "(b // 4) + 1")
    return f"""
WITH toks AS (
  SELECT doc_id, t.term FROM {table},
  unnest({duck_tokens()}) AS t(term)
),
tf AS (SELECT doc_id, term, count(*) AS tf, md5(term) AS h FROM toks GROUP BY 1, 2),
bits AS (SELECT unnest(generate_series(0, {bits - 1})) AS b),
votes AS (
  SELECT doc_id, b, sum(tf * ((({nib} >> (b % 4)) & 1) * 2 - 1)) AS vote
  FROM tf, bits GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS BIGINT) AS simhash
FROM votes GROUP BY 1
"""


def min_fingerprint(
    docs: DataFrame, n: int = FINGERPRINT_SHINGLE_N, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fingerprint) — min-hash-of-shingles doc signature."""
    sh = with_shingles(docs, n, text_col)
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


def min_fingerprint_oracle(table: str = "documents", n: int = FINGERPRINT_SHINGLE_N) -> str:
    return f"""
WITH tk AS (SELECT doc_id, {duck_tokens()} AS tk FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, s.shingle
  FROM tk, unnest({duck_shingles('tk', n)}) AS s(shingle)
  WHERE len(tk) > 0
)
SELECT doc_id, min(md5(shingle)) AS fingerprint FROM sh GROUP BY 1
"""
