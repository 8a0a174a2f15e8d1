"""Similarity search over an embedding column (array<float>).

Two paths, as a 100 TB pipeline needs both:

* :func:`cosine_topk` — brute-force exact cosine top-k.  The query set
  is tiny (broadcast); candidates stream through a single scan with the
  dot products computed by JVM higher-order functions
  (``zip_with`` + ``aggregate`` in float64 — no Python, no shuffle of
  the embedding column beyond the final per-query top-k).  Exact
  baseline and the verifier for the bucketed path.
* :func:`lsh_buckets` / :func:`lsh_topk` — random-hyperplane sign LSH:
  bucket = the 8-bit sign pattern of dot products against 8 fixed
  hyperplane vectors (rows of the corpus itself, so the scheme is fully
  deterministic and oracle-expressible).  ``lsh_topk`` restricts the
  exact search to the query's bucket — the IVF-style scale path where
  each bucket is a partition and only 1/2^bits of the corpus is read
  per query (bucket pruning via partitioned storage at scale).

Float parity with the DuckDB oracle: products and sums in float64 in
ascending element order in both engines; cosine rounded to 6 digits;
ranks ordered by (rounded cosine DESC, vec_id ASC) in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bilies_go_spark.functions.portable import (
    ANN_K,
    ANN_LSH_K,
    ANN_LSH_PLANES,
    ANN_N_QUERIES,
    duck_round,
)


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _duck_dot(a: str, b: str, dim_of: str = "") -> str:
    """Float64 dot product, left-to-right summation — the DuckDB twin of
    :func:`_dot` (indexed list lambda; ``dim_of`` kept for signature
    stability, unused)."""
    return (
        f"list_sum(list_transform({a}, (x, i) -> "
        f"CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def with_norm(vecs: DataFrame, col: str = "embedding") -> DataFrame:
    return vecs.withColumn("norm", F.sqrt(_dot(col, col)))


def cosine_topk(
    vecs: DataFrame, n_queries: int = ANN_N_QUERIES, k: int = ANN_K
) -> DataFrame:
    """(query_id, rank, vec_id, cosine) — exact top-k per query vector.

    Queries = ``vec_id < n_queries``; candidates = every other vector.
    """
    v = with_norm(vecs).select("vec_id", "embedding", "norm")
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    pairs = v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(
            _dot("q_emb", "embedding") / (F.col("q_norm") * F.col("norm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_oracle(
    table: str = "embeddings", n_queries: int = ANN_N_QUERIES, k: int = ANN_K
) -> str:
    dot = _duck_dot("q.embedding", "c.embedding", "q.embedding")
    qn = _duck_dot("q.embedding", "q.embedding", "q.embedding")
    cn = _duck_dot("c.embedding", "c.embedding", "c.embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table} WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id,
         {duck_round(f'{dot} / (sqrt({qn}) * sqrt({cn}))')} AS cosine
  FROM q JOIN {table} c ON c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


def cosine_topk_filtered(
    vecs: DataFrame, n_queries: int = ANN_N_QUERIES, k: int = ANN_K
) -> DataFrame:
    """Filtered vector search — the ES kNN ``filter`` semantics
    (PRE-filter: the metadata predicate restricts the candidate set,
    so the query always gets k matching results, never post-filtered
    holes): per query vector, exact top-k among candidates sharing the
    query's ``label``.  The label equi-join rides the same broadcast
    as the query vectors, so Catalyst pushes the candidate restriction
    below the dot product — at 10^12 vectors the label predicate
    prunes the scan before any arithmetic, and the LSH-bucketed path
    (:func:`lsh_topk`) composes the same way (filter the bucket join's
    candidate side)."""
    v = with_norm(vecs).select("vec_id", "embedding", "norm", "label")
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("label").alias("q_label"),
    )
    pairs = v.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") == F.col("q_label")),
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(
            _dot("q_emb", "embedding") / (F.col("q_norm") * F.col("norm")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def cosine_topk_filtered_oracle(
    table: str = "embeddings", n_queries: int = ANN_N_QUERIES, k: int = ANN_K
) -> str:
    dot = _duck_dot("q.embedding", "c.embedding", "q.embedding")
    qn = _duck_dot("q.embedding", "q.embedding", "q.embedding")
    cn = _duck_dot("c.embedding", "c.embedding", "c.embedding")
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding, label FROM {table} WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, c.vec_id,
         {duck_round(f'{dot} / (sqrt({qn}) * sqrt({cn}))')} AS cosine
  FROM q JOIN {table} c ON c.vec_id <> q.query_id AND c.label = q.label
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


COSINE_DEDUP_THRESHOLD = 0.45  # fixture-calibrated; a real near-dup run uses ~0.95


def cosine_pairs(
    vecs: DataFrame, threshold: float = COSINE_DEDUP_THRESHOLD
) -> DataFrame:
    """(vec_a, vec_b, cosine) — embedding-cosine near-duplicate pairs.

    Brute self-join baseline (exact).  At 100 TB you restrict the join
    to LSH buckets first (:func:`lsh_buckets` gives the bucket column;
    the join key becomes (bucket) and the comparison count drops by
    ~2^bits) — the brute path is the oracle that validates that
    restriction's recall."""
    v = with_norm(vecs).select("vec_id", "embedding", "norm")
    a = v.alias("a")
    b = v.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = F.round(
        _dot("a.embedding", "b.embedding") / (F.col("a.norm") * F.col("b.norm")), 6
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_oracle(
    table: str = "embeddings", threshold: float = COSINE_DEDUP_THRESHOLD
) -> str:
    dot = _duck_dot("a.embedding", "b.embedding")
    na = _duck_dot("a.embedding", "a.embedding")
    nb = _duck_dot("b.embedding", "b.embedding")
    cos = duck_round(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


COSINE_LSH_BAND_BITS = 4  # 2 bands of 4 hyperplane bits each


def _band_keys(vecs: DataFrame, planes: list[int], band_bits: int) -> DataFrame:
    """(vec_id, band, key) — split the sign-LSH bucket into OR-amplified
    bands (same S-curve trick as MinHash banding)."""
    n_bands = len(planes) // band_bits
    mask = (1 << band_bits) - 1
    b = lsh_buckets(vecs, planes)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"(bucket >> {i * band_bits}) & {mask}").alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    return b.select("vec_id", F.explode(bands).alias("bk")).select(
        "vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def cosine_pairs_lsh(
    vecs: DataFrame,
    threshold: float = COSINE_DEDUP_THRESHOLD,
    planes: list[int] | None = None,
    band_bits: int = COSINE_LSH_BAND_BITS,
) -> DataFrame:
    """(vec_a, vec_b, cosine) — near-dup pairs, candidate generation
    restricted to banded sign-LSH collisions.  THE scale path: the only
    self-join is an equality join on (band, key) — never all-pairs — so
    comparisons drop by ~2^band_bits per band while banding (OR over
    bands) recovers recall; exact cosine is scored only on candidates.
    At production thresholds (>=0.9 cosine) per-band collision
    probability is (1 - theta/pi)^band_bits ~ 0.75 per band; the
    fixture's 0.45-cosine pairs are deliberately weak (recall 3/14,
    pinned in tests against :func:`cosine_pairs`, the brute recall
    oracle)."""
    planes = planes if planes is not None else ANN_LSH_PLANES
    bands = _band_keys(vecs, planes, band_bits)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    v = with_norm(vecs).select("vec_id", "embedding", "norm")
    scored = cand.join(
        v.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("emb_a"),
            F.col("norm").alias("norm_a"),
        ),
        "vec_a",
    ).join(
        v.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("emb_b"),
            F.col("norm").alias("norm_b"),
        ),
        "vec_b",
    )
    cos = F.round(_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b")), 6)
    return (
        scored.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_lsh_oracle(
    table: str = "embeddings",
    threshold: float = COSINE_DEDUP_THRESHOLD,
    planes: list[int] | None = None,
    band_bits: int = COSINE_LSH_BAND_BITS,
) -> str:
    planes = planes if planes is not None else ANN_LSH_PLANES
    n_bands = len(planes) // band_bits
    mask = (1 << band_bits) - 1
    buckets = lsh_buckets_oracle(table, planes).strip()
    dot = _duck_dot("a.embedding", "b.embedding")
    na = _duck_dot("a.embedding", "a.embedding")
    nb = _duck_dot("b.embedding", "b.embedding")
    cos = duck_round(f"{dot} / (sqrt({na}) * sqrt({nb}))")
    return f"""
WITH bk AS ({buckets}),
bands AS (
  SELECT vec_id, g.band, (bucket >> (g.band * {band_bits})) & {mask} AS key
  FROM bk, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) g
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b, {cos} AS cosine
FROM cand c JOIN {table} a ON a.vec_id = c.vec_a JOIN {table} b ON b.vec_id = c.vec_b
WHERE {cos} >= {threshold}
"""


def lsh_buckets(vecs: DataFrame, planes: list[int] | None = None) -> DataFrame:
    """(vec_id, bucket) — 2^len(planes)-way sign-LSH bucketing.

    Hyperplanes are the embedding rows with ``vec_id`` in ``planes``
    (deterministic, data-derived — at scale you'd sample or train
    them; the bucketing/partition plumbing is identical).
    """
    planes = planes if planes is not None else ANN_LSH_PLANES
    spark = vecs.sparkSession
    p = vecs.filter(F.col("vec_id").isin(planes)).select(
        F.col("vec_id").alias("plane_id"), F.col("embedding").alias("p_emb")
    )
    order = {pid: i for i, pid in enumerate(sorted(planes))}
    omap = F.create_map(
        *[x for pid, i in order.items() for x in (F.lit(pid), F.lit(i))]
    )
    bits = (
        vecs.select("vec_id", "embedding")
        .crossJoin(F.broadcast(p))
        .select(
            "vec_id",
            omap[F.col("plane_id")].alias("bit_pos"),
            (_dot("embedding", "p_emb") >= 0).cast("int").alias("bit"),
        )
    )
    return bits.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(CAST(bit AS BIGINT), bit_pos)")).alias("bucket")
    )


def lsh_buckets_oracle(table: str = "embeddings", planes: list[int] | None = None) -> str:
    planes = planes if planes is not None else ANN_LSH_PLANES
    rows = ", ".join(f"({pid}, {i})" for i, pid in enumerate(sorted(planes)))
    dot = _duck_dot("v.embedding", "p.embedding", "v.embedding")
    return f"""
WITH plane_pos(plane_id, bit_pos) AS (VALUES {rows}),
p AS (
  SELECT pp.bit_pos, e.embedding FROM plane_pos pp JOIN {table} e ON e.vec_id = pp.plane_id
)
SELECT v.vec_id,
       CAST(sum(CASE WHEN {dot} >= 0 THEN (1::BIGINT << p.bit_pos) ELSE 0::BIGINT END) AS BIGINT) AS bucket
FROM {table} v, p
GROUP BY 1
"""


def lsh_topk(
    vecs: DataFrame,
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_LSH_K,
    planes: list[int] | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cosine) — exact cosine, candidates
    restricted to the query's LSH bucket (the IVF probe-1 pattern)."""
    b = lsh_buckets(vecs, planes)
    v = with_norm(vecs).join(b, "vec_id").select("vec_id", "embedding", "norm", "bucket")
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = v.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(_dot("q_emb", "embedding") / (F.col("q_norm") * F.col("norm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_topk_multiprobe(
    vecs: DataFrame,
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_LSH_K,
    planes: list[int] | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, cosine) — exact cosine over candidates
    in the query's bucket OR any bucket at Hamming distance 1.

    Multi-probe LSH: instead of growing the index (more tables) to
    recover recall, probe the 1 + n_bits most likely buckets per query
    — scan fraction rises from 1/2^bits to (1+bits)/2^bits while recall
    jumps (a near neighbor differs from the query in at most a few sign
    bits).  Candidates join on bucket EQUALITY against the exploded
    probe set (tiny, broadcast), so the plan stays a single hash join —
    the IVF nprobe>1 pattern."""
    planes = planes if planes is not None else ANN_LSH_PLANES
    nbits = len(planes)
    b = lsh_buckets(vecs, planes)
    v = with_norm(vecs).join(b, "vec_id").select("vec_id", "embedding", "norm", "bucket")
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("bucket").alias("q_bucket"),
    )
    probe_set = F.array(
        F.col("q_bucket"),
        *[F.expr(f"q_bucket ^ CAST({1 << i} AS BIGINT)") for i in range(nbits)],
    )
    probes = q.select(
        "query_id", "q_emb", "q_norm", F.explode(probe_set).alias("p_bucket")
    )
    pairs = v.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("p_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(_dot("q_emb", "embedding") / (F.col("q_norm") * F.col("norm")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_topk_multiprobe_oracle(
    table: str = "embeddings",
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_LSH_K,
    planes: list[int] | None = None,
) -> str:
    planes = planes if planes is not None else ANN_LSH_PLANES
    nbits = len(planes)
    buckets = lsh_buckets_oracle(table, planes).strip()
    dot = _duck_dot("q.embedding", "c.embedding", "q.embedding")
    qn = _duck_dot("q.embedding", "q.embedding", "q.embedding")
    cn = _duck_dot("c.embedding", "c.embedding", "c.embedding")
    return f"""
WITH b AS ({buckets}),
ve AS (SELECT e.vec_id, e.embedding, b.bucket FROM {table} e JOIN b ON e.vec_id = b.vec_id),
q AS (SELECT vec_id AS query_id, embedding, bucket FROM ve WHERE vec_id < {n_queries}),
bits AS (SELECT unnest(generate_series(-1, {nbits - 1})) AS i),
probes AS (
  SELECT q.query_id, q.embedding,
         CASE WHEN i < 0 THEN q.bucket ELSE xor(q.bucket, (1::BIGINT << i)) END AS p_bucket
  FROM q, bits
),
scored AS (
  SELECT q.query_id, c.vec_id,
         {duck_round(f'{dot} / (sqrt({qn}) * sqrt({cn}))')} AS cosine
  FROM probes q JOIN ve c ON c.bucket = q.p_bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


def lsh_topk_oracle(
    table: str = "embeddings",
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_LSH_K,
    planes: list[int] | None = None,
) -> str:
    planes = planes if planes is not None else ANN_LSH_PLANES
    buckets = lsh_buckets_oracle(table, planes).strip().rstrip()
    dot = _duck_dot("q.embedding", "c.embedding", "q.embedding")
    qn = _duck_dot("q.embedding", "q.embedding", "q.embedding")
    cn = _duck_dot("c.embedding", "c.embedding", "c.embedding")
    return f"""
WITH b AS ({buckets}),
ve AS (SELECT e.vec_id, e.embedding, b.bucket FROM {table} e JOIN b ON e.vec_id = b.vec_id),
q AS (SELECT vec_id AS query_id, embedding, bucket FROM ve WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, c.vec_id,
         {duck_round(f'{dot} / (sqrt({qn}) * sqrt({cn}))')} AS cosine
  FROM q JOIN ve c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""
