"""Broadcast-bitmap doc filters: large allowed sets ship as packed
bitmaps (1 bit/id) through a Spark broadcast instead of 8 B/id int64
arrays in every task closure — same answers, bounded closure.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pytest

from bilies_go_spark.corpus import reference_queries
from bilies_go_spark.operators.index_build import BuildConfig, build_index
from bilies_go_spark.operators.query import DocBitmap, DocSetFilter, QueryEngine

KEY = ["query_id", "rank"]


def test_docbitmap_contains_matches_isin():
    rng = np.random.default_rng(3)
    ids = np.unique(rng.choice(1_000_000, 50_000, replace=False)).astype(np.int64)
    bm = DocBitmap(ids)
    probe = np.concatenate(
        [ids[::7], rng.integers(0, 2_000_000, 10_000), [-5, 0, 999_999, 10**12]]
    ).astype(np.int64)
    got = bm.contains(probe)
    exp = np.isin(probe, ids)
    assert (got == exp).all()
    assert bm.size == ids.size
    # the DocSetFilter mask agrees between array and bitmap forms
    f_arr = DocSetFilter(None, ids)
    f_bm = DocSetFilter(None, bm)
    assert (f_arr.keep_mask(probe) == f_bm.keep_mask(probe)).all()


@pytest.fixture(scope="module")
def idx(spark, small_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bmf_idx"))
    build_index(
        spark,
        small_corpus,
        d,
        BuildConfig(n_buckets=8, block_size=32, target_postings_per_salt=200),
    )
    return d


def test_large_allowed_set_uses_bitmap_and_matches_array_form(
    spark, small_corpus, idx
):
    """A synthetic allowed set 10x past the bitmap threshold answers
    identically to the equivalent small array filter, with the shipped
    filter orders of magnitude smaller than the int64 array."""
    eng = QueryEngine(spark, idx)
    # 40M even ids spanning [0, 80M) — far beyond the corpus id range,
    # so the EFFECTIVE filter is "even corpus ids"
    big = np.arange(0, 80_000_000, 2, dtype=np.int64)
    assert big.size >= QueryEngine.ALLOWED_BITMAP_MIN
    flt = eng._doc_filter(big)
    assert isinstance(flt.allowed, DocBitmap)
    # closure-size bound: bits beat int64s by ~64x
    nb_bitmap = len(pickle.dumps(flt))
    nb_array = len(pickle.dumps(DocSetFilter(None, big)))
    assert nb_bitmap < nb_array / 10
    # ...and a filter this size leaves the closure entirely (broadcast)
    shipped = eng._ship_filter(flt)
    assert hasattr(shipped, "value")

    queries = reference_queries().head(8)
    small = np.sort(
        small_corpus.select("doc_id").toPandas()["doc_id"].to_numpy()[::1]
    )
    small = small[small % 2 == 0].astype(np.int64)
    a = (
        eng.topk_distributed(queries, allowed=big)
        .toPandas().sort_values(KEY).reset_index(drop=True)
    )
    b = (
        eng.topk_distributed(queries, allowed=small)
        .toPandas().sort_values(KEY).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    assert (a["doc_id"].to_numpy() % 2 == 0).all()
    # the driver-local serving path masks through the same bitmap
    c = eng.topk_pandas(queries, allowed=big).sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(c, b)
    # sharded plan: same filter, same answers
    d = (
        eng.topk_sharded(queries, n_shards=4, allowed=big)
        .toPandas().sort_values(KEY).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(d, b)
