"""Portable (Spark ⇄ DuckDB) expression fragments.

The driver's correctness gate runs every ``queries()`` DataFrame next to
its ``oracle_sql()`` DuckDB query and value-hashes both results.  Any
semantic drift between the two dialects — tokenization, hashing, float
rounding, tie-breaking — shows up as a hash mismatch.  This module is
the single source of truth for every shared constant and for the DuckDB
SQL fragments, so the Spark operator modules and the oracle builders
cannot diverge silently.

Portability rules used throughout:

* **Hashes** are ``md5`` hex strings — bit-identical between Spark's
  ``F.md5`` and DuckDB's ``md5``; never engine-native hashes
  (``xxhash64`` exists only on the Spark side and stays internal to the
  index layout).
* **Floats** are computed in float64 with the same operation order, and
  every float column that reaches a driver-compared result is
  ``round(x, 6)`` **cast back to DOUBLE** (DuckDB's ``round`` returns
  DECIMAL, which would hash differently).
* **Ranks** order by the *rounded* score, tie-broken by ascending id,
  in both engines, so a 1e-12 summation-order difference can never flip
  a rank.
"""

from __future__ import annotations

# --- analyzer (must match functions/tokenize.py) -------------------------
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# --- text-analysis constants ---------------------------------------------
STOPWORDS: tuple[str, ...] = (
    "the", "of", "and", "to", "a", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "with", "as", "his", "they", "be",
    "at", "one", "have", "this", "from", "or", "had", "by", "we", "an",
)

# --- dedup / fingerprint constants ----------------------------------------
SHINGLE_N = 3
FINGERPRINT_SHINGLE_N = 5
JACCARD_THRESHOLD = 0.8
MINHASH_N = 12
MINHASH_BAND_SIZE = 3  # 4 bands of 3 rows

# --- simhash constants -----------------------------------------------------
SIMHASH_BITS = 32

# --- ANN constants ----------------------------------------------------------
ANN_N_QUERIES = 5          # query vectors = vec_id in [0, 5)
ANN_K = 10
ANN_LSH_PLANES = list(range(10, 18))  # hyperplanes = these vec_ids (8 bits)
ANN_LSH_K = 5

ROUND_DIGITS = 6


def duck_tokens(text_col: str = "text") -> str:
    """DuckDB list of non-empty lowercase tokens — twin of
    ``tokenize_col`` (functions/tokenize.py)."""
    return (
        f"list_filter(regexp_split_to_array(lower({text_col}), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> '')"
    )


def duck_shingles(tk: str, n: int) -> str:
    """DuckDB n-token shingle list over a token-list expression ``tk``.

    Documents with fewer than *n* tokens contribute one shingle — the
    space-joined full token list — so every non-empty doc has >=1
    shingle (twin of :func:`operators.dedup.shingles_col`).
    """
    parts = " || ' ' || ".join(f"{tk}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({tk}) < {n} THEN [array_to_string({tk}, ' ')] "
        f"ELSE list_transform(generate_series(1, len({tk}) - {n - 1}), "
        f"i -> {parts.replace(f'{tk}[i + 0]', f'{tk}[i]')}) END"
    )


def spark_shingles_expr(tk: str, n: int) -> str:
    """Spark SQL twin of :func:`duck_shingles` (for ``F.expr``)."""
    parts = ", ' ', ".join(f"element_at({tk}, i + {j})" for j in range(n))
    parts = parts.replace(f"element_at({tk}, i + 0)", f"element_at({tk}, i)")
    return (
        f"CASE WHEN size({tk}) < {n} THEN array(concat_ws(' ', {tk})) "
        f"ELSE transform(sequence(1, size({tk}) - {n - 1}), "
        f"i -> concat({parts})) END"
    )


def duck_round(expr: str, digits: int = ROUND_DIGITS) -> str:
    return f"CAST(round({expr}, {digits}) AS DOUBLE)"


def duck_nibble(hash_expr: str, pos_expr: str) -> str:
    """Value 0..15 of the hex digit at 1-based position ``pos_expr``."""
    return f"(strpos('0123456789abcdef', substr({hash_expr}, {pos_expr}, 1)) - 1)"


def spark_nibble_expr(hash_expr: str, pos_expr: str) -> str:
    """Spark SQL twin of :func:`duck_nibble` (``position`` ==
    ``strpos`` with swapped args)."""
    return f"(position(substring({hash_expr}, {pos_expr}, 1), '0123456789abcdef') - 1)"


def duck_stopword_list() -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def spark_stopword_array() -> str:
    return "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
