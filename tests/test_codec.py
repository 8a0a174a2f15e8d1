"""VByte / delta-gap / block metadata unit + property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bilies_go_spark.operators.codec import (
    PostingSegment,
    decode_block,
    decode_postings,
    encode_postings,
    row_to_segment,
    segment_to_row,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_known_values():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    buf = vbyte_encode(vals)
    assert buf[0] == 0x80  # 0 encodes to a single terminator byte
    np.testing.assert_array_equal(vbyte_decode(buf), vals)


def test_vbyte_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)).size == 0
    assert vbyte_decode(b"").size == 0


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(vbyte_decode(vbyte_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=700, unique=True),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids, block_size):
    doc_ids = np.sort(np.array(ids, dtype=np.int64))
    n = doc_ids.size
    tfs = (doc_ids % 17 + 1).astype(np.int64)
    dls = (doc_ids % 211 + 5).astype(np.int64)
    seg = encode_postings(doc_ids, tfs, dls, block_size=block_size)
    d2, t2, l2 = decode_postings(seg)
    np.testing.assert_array_equal(d2, doc_ids)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(l2, dls)
    # block invariants: block max >= every tf in block, last id correct
    nb = len(seg.block_last_doc_id)
    for i in range(nb):
        s, e = i * block_size, min((i + 1) * block_size, n)
        assert seg.block_max_tf[i] == tfs[s:e].max()
        assert seg.block_min_dl[i] == dls[s:e].min()
        assert seg.block_last_doc_id[i] == doc_ids[e - 1]
        bd, bt, bl = decode_block(seg, i)
        np.testing.assert_array_equal(bd, doc_ids[s:e])
        np.testing.assert_array_equal(bt, tfs[s:e])
        np.testing.assert_array_equal(bl, dls[s:e])


def test_segment_row_roundtrip():
    doc_ids = np.array([3, 9, 10, 500, 100000], dtype=np.int64)
    seg = encode_postings(doc_ids, doc_ids % 5 + 1, doc_ids % 7 + 2, block_size=2)
    row = segment_to_row("hello", 1, seg)
    seg2 = row_to_segment(row)
    assert isinstance(seg2, PostingSegment)
    for a, b in zip(decode_postings(seg), decode_postings(seg2)):
        np.testing.assert_array_equal(a, b)


def test_encode_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(
            np.array([5, 3], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
            np.array([1, 1], dtype=np.int64),
        )


def test_vbyte_two_byte_fast_path_correct_and_fast():
    """Boundary correctness around the 1/2/3-byte width edges, and the
    <=2-byte fast path must beat the general multi-width path clearly
    (it skips the per-byte group-index cumsum/shift/reduceat)."""
    import time

    import numpy as np

    from bilies_go_spark.operators.codec import vbyte_decode, vbyte_encode

    edges = np.array([0, 1, 126, 127, 128, 129, 16382, 16383], dtype=np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(edges)), edges)
    with_wide = np.concatenate([edges, [16384, 2**21 - 1, 2**40]]).astype(np.uint64)
    assert np.array_equal(vbyte_decode(vbyte_encode(with_wide)), with_wide)

    rng = np.random.default_rng(11)
    two_b = vbyte_encode(rng.integers(0, 16384, 500_000).astype(np.uint64))
    three_b = vbyte_encode(rng.integers(0, 2_000_000, 500_000).astype(np.uint64))

    def rate(buf):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            vbyte_decode(buf)
            best = min(best, time.perf_counter() - t0)
        return best

    assert rate(three_b) / rate(two_b) > 2.0


def test_contrib_cache_lru_recycles_slots():
    """_ContribCache: LRU eviction recycles arena slots best-fit, so
    later hot terms displace stale ones instead of staying uncached
    forever; an entry larger than every recyclable slot stays uncached."""
    from bilies_go_spark.operators.query import _ContribCache

    c = _ContribCache(max_bytes=8 * 30)  # room for three 10-float slots
    a = c.alloc_for("t_a", 10)
    b = c.alloc_for("t_b", 10)
    d = c.alloc_for("t_c", 10)
    for arr, val in ((a, 1.0), (b, 2.0), (d, 3.0)):
        arr[:] = val
    assert c.get("t_a")[0] == 1.0
    # bump space spent: next alloc evicts the LRU entry (t_b — t_a was
    # just touched) and recycles its slot
    e = c.alloc_for("t_d", 10)
    assert e is not None and e[0] == 0.0
    e[:] = 4.0
    assert c.get("t_b") is None
    assert c.get("t_a")[0] == 1.0 and c.get("t_c")[0] == 3.0 and c.get("t_d")[0] == 4.0
    # an entry bigger than every slot evicts everything it can, then
    # gives up (slots cannot merge) — and the survivors are gone
    assert c.alloc_for("t_huge", 25) is None
    # smaller entries keep recycling freed 10-float slots
    f = c.alloc_for("t_e", 8)
    assert f is not None
    f[:] = 5.0
    assert c.get("t_e")[0] == 5.0


def test_pos_cache_lru_evicts_by_bytes():
    """_PosCache: byte-capped LRU — new hot entries evict the least
    recently used until they fit; oversized entries stay uncached."""
    import numpy as np

    from bilies_go_spark.operators.query import _PosCache

    def entry(nbytes):
        return (np.zeros(nbytes // 8, dtype=np.int64),)

    c = _PosCache(max_bytes=80)
    assert c.put("a", entry(40)) and c.put("b", entry(40))
    assert c.get("a") is not None  # touch: a is now most-recent
    assert c.put("c", entry(40))   # evicts b (LRU), not a
    assert c.get("b") is None and c.get("a") is not None and c.get("c") is not None
    assert not c.put("huge", entry(200))  # over budget entirely: uncached
    assert c.get("a") is not None  # and nothing was evicted for it
