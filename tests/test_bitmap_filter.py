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


def test_docbitmap_windowed_build_matches_one_shot(monkeypatch):
    """The chunked constructor (fixed 16 MB transient instead of a
    max_id+1-byte dense bool) produces bit-identical bitmaps across
    window boundaries, unsorted input, and ids landing exactly on
    window edges."""
    rng = np.random.default_rng(11)
    ids = rng.choice(1_000_000, 60_000, replace=False).astype(np.int64)
    # include exact window-edge ids once the chunk is shrunk
    ids = np.unique(np.concatenate([ids, [0, 4095, 4096, 4097, 999_999]]))
    one_shot = DocBitmap(ids).bits
    monkeypatch.setattr(DocBitmap, "_BUILD_CHUNK", 1 << 12)  # 245 windows
    shuffled = ids.copy()
    rng.shuffle(shuffled)  # constructor must tolerate unsorted input
    windowed = DocBitmap(shuffled)
    assert windowed.bits.shape == one_shot.shape
    assert (windowed.bits == one_shot).all()
    assert windowed.contains(ids).all()


def test_contrib_cache_pin_blocks_same_query_eviction():
    """ADVICE r4 (high): an in-flight query's dense views must never be
    recycled by its OWN later allocs — alloc_for returns None instead
    of evicting a pinned entry, and the earlier views stay intact."""
    from bilies_go_spark.operators.query import _ContribCache

    c = _ContribCache(max_bytes=8 * 20)  # arena: two 10-float slots
    a = c.alloc_for("t_a", 10)
    b = c.alloc_for("t_b", 10)
    a[:], b[:] = 1.0, 2.0
    c.pin(["t_a", "t_b", "t_c"])
    try:
        # arena spent, every evictable entry pinned -> no slot, no evict
        assert c.alloc_for("t_c", 10) is None
        assert a[0] == 1.0 and b[0] == 2.0
        assert c.get("t_a") is not None and c.get("t_b") is not None
    finally:
        c.unpin()
    # unpinned, the same alloc succeeds by recycling the LRU slot
    d = c.alloc_for("t_c", 10)
    assert d is not None
    d[:] = 3.0
    # exactly one of the old entries was displaced; the other survives
    assert (c.get("t_a") is None) != (c.get("t_b") is None)


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
