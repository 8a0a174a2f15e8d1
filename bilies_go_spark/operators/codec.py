"""Posting-list codec: delta-gap + VByte + block-max skip metadata.

Pure numpy, no Spark imports — this is the byte-level format of one
posting segment, invoked from inside ``applyInPandas`` stages.

Layout mirrors the reference's ``IndexedBuffer`` shape — one contiguous
byte buffer plus an offset index enabling O(1) addressing of a record
range (/root/reference/indexedBuffer.go:27-71) — but columnar: three
VByte streams (doc-id gaps, term frequencies, doc lengths) with
per-block byte offsets and block maxima/minima for WAND skipping.

VByte convention: little-endian 7-bit groups; the high bit (0x80) marks
the TERMINATING byte of a value.  Encode/decode are fully vectorized
(np.reduceat), no per-value Python loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_BLOCK_SIZE = 128

_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)


def vbyte_encode(values: np.ndarray) -> np.ndarray:
    """Encode a uint64 array to a VByte uint8 buffer (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # bytes needed per value = 1 + number of thresholds <= value
    nbytes = 1 + np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nbytes.max())
    for j in range(max_nb):
        mask = nbytes > j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        out[starts[mask] + j] = chunk.astype(np.uint8)
    # set terminator bit on the last byte of each value
    out[ends - 1] |= 0x80
    return out


def vbyte_decode(buf: np.ndarray | bytes) -> np.ndarray:
    """Decode a VByte buffer back to a uint64 array (vectorized)."""
    b = np.frombuffer(bytes(buf), dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) != 0
    if is_end.all():
        # all values < 128 (dense doc gaps, small tfs — the hot-term
        # common case): single masked pass instead of five array passes
        return (b & np.uint8(0x7F)).astype(np.uint64)
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nb = ends - starts
    if nb.max() == 1:
        # all values <= 2 bytes (< 16384: doc lengths, most gaps/tfs) —
        # direct two-byte assembly, skipping the per-byte group-index
        # cumsum + shift + reduceat of the general path (~3x fewer
        # array passes on the serving-path hot decodes)
        lo = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
        two = nb == 1
        lo[two] |= (b[ends[two]] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7)
        return lo
    pos = np.arange(b.size, dtype=np.int64)
    # offset of each byte within its value
    group_idx = np.cumsum(is_end) - is_end  # 0-based group id per byte
    within = pos - starts[group_idx]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * within.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


@dataclass
class PostingSegment:
    """One encoded posting segment (the value side of a segment row)."""

    n_docs: int
    block_size: int
    doc_gaps_vb: bytes
    tfs_vb: bytes
    dls_vb: bytes
    block_last_doc_id: np.ndarray  # int64[n_blocks]
    block_max_tf: np.ndarray  # int64[n_blocks]
    block_min_dl: np.ndarray  # int64[n_blocks]
    block_doc_off: np.ndarray  # int64[n_blocks] byte offset into doc_gaps_vb
    block_tf_off: np.ndarray
    block_dl_off: np.ndarray
    # optional positional stream (phrase queries): per doc, tf VByte
    # position deltas (first absolute within the doc) concatenated in
    # doc order.  ``block_pos_off`` addresses block starts; within a
    # block, doc i's positions are values [Σ tf_<i, Σ tf_<=i) of the
    # block's decoded stream — tf is the per-doc position count, so no
    # extra per-doc length array is stored.
    positions_vb: bytes = b""
    block_pos_off: np.ndarray | None = None

    @property
    def has_positions(self) -> bool:
        return self.block_pos_off is not None


def positions_to_blobs(flat_pos: np.ndarray, counts: np.ndarray) -> list[bytes]:
    """Encode per-group token positions to per-group VByte blobs.

    ``flat_pos`` concatenates each group's ascending positions
    (group = one (doc, term) pair); ``counts`` gives group sizes.
    Deltas are within-group (first value absolute), so a blob is
    self-contained and can be concatenated with other docs' blobs in
    any order.  One vectorized encode of the whole batch; the only
    Python loop is the final per-group byte slicing."""
    counts = np.asarray(counts, dtype=np.int64)
    p = np.ascontiguousarray(flat_pos, dtype=np.int64)
    if p.size == 0:
        return [b""] * len(counts)
    ends = np.cumsum(counts)
    starts = ends - counts
    d = np.empty(p.size, dtype=np.int64)
    d[0] = p[0]
    d[1:] = p[1:] - p[:-1]
    nz = starts[counts > 0]
    d[nz] = p[nz]  # each group's first delta is its absolute position
    vals = d.astype(np.uint64)
    buf = vbyte_encode(vals).tobytes()
    nb = 1 + np.searchsorted(_THRESHOLDS, vals, side="right").astype(np.int64)
    byte_ends = np.concatenate([[0], np.cumsum(nb)])
    return [
        buf[byte_ends[s] : byte_ends[e]]
        for s, e in zip(starts, ends)
    ]


def _restore_positions(deltas: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Invert :func:`positions_to_blobs` for a decoded delta stream:
    per-doc cumulative sums via one global cumsum minus group bases."""
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(tfs)
    starts = ends - tfs
    c = np.cumsum(deltas.astype(np.int64))
    base = np.zeros(tfs.size, dtype=np.int64)
    nz = starts > 0
    base[nz] = c[starts[nz] - 1]
    return c - np.repeat(base, tfs)


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = DEFAULT_BLOCK_SIZE,
    pos_blobs: list[bytes] | None = None,
) -> PostingSegment:
    """Encode one term's postings (doc_ids strictly increasing).

    ``pos_blobs`` (optional): per-doc VByte position blobs — from
    :func:`positions_to_blobs` — aligned with ``doc_ids``; enables
    phrase queries on the segment."""
    d = np.ascontiguousarray(doc_ids, dtype=np.int64)
    t = np.ascontiguousarray(tfs, dtype=np.int64)
    ln = np.ascontiguousarray(dls, dtype=np.int64)
    n = d.size
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return PostingSegment(
            0, block_size, b"", b"", b"", e, e, e, e, e, e,
            positions_vb=b"",
            block_pos_off=e if pos_blobs is not None else None,
        )
    if n > 1 and not (d[1:] > d[:-1]).all():
        raise ValueError("doc_ids must be strictly increasing")
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = d[0]
    gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
    n_blocks = (n + block_size - 1) // block_size
    bstarts = np.arange(n_blocks, dtype=np.int64) * block_size
    bends = np.minimum(bstarts + block_size, n)

    def _per_value_nbytes(vals: np.ndarray) -> np.ndarray:
        return 1 + np.searchsorted(_THRESHOLDS, vals.astype(np.uint64), side="right")

    doc_nb = _per_value_nbytes(gaps)
    tf_nb = _per_value_nbytes(t)
    dl_nb = _per_value_nbytes(ln)
    # byte offset of each block start within each stream
    doc_csum = np.concatenate([[0], np.cumsum(doc_nb)])
    tf_csum = np.concatenate([[0], np.cumsum(tf_nb)])
    dl_csum = np.concatenate([[0], np.cumsum(dl_nb)])
    positions_vb, block_pos_off = b"", None
    if pos_blobs is not None:
        if len(pos_blobs) != n:
            raise ValueError("pos_blobs must align with doc_ids")
        pos_lens = np.fromiter((len(x) for x in pos_blobs), dtype=np.int64, count=n)
        pos_csum = np.concatenate([[0], np.cumsum(pos_lens)])
        positions_vb = b"".join(pos_blobs)
        block_pos_off = pos_csum[bstarts]
    return PostingSegment(
        n_docs=int(n),
        block_size=block_size,
        doc_gaps_vb=vbyte_encode(gaps).tobytes(),
        tfs_vb=vbyte_encode(t.astype(np.uint64)).tobytes(),
        dls_vb=vbyte_encode(ln.astype(np.uint64)).tobytes(),
        block_last_doc_id=d[bends - 1].copy(),
        block_max_tf=np.maximum.reduceat(t, bstarts),
        block_min_dl=np.minimum.reduceat(ln, bstarts),
        block_doc_off=doc_csum[bstarts],
        block_tf_off=tf_csum[bstarts],
        block_dl_off=dl_csum[bstarts],
        positions_vb=positions_vb,
        block_pos_off=block_pos_off,
    )


def decode_postings(seg: PostingSegment) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full segment -> (doc_ids int64, tfs int64, dls int64)."""
    if seg.n_docs == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    gaps = vbyte_decode(np.frombuffer(seg.doc_gaps_vb, dtype=np.uint8))
    doc_ids = np.cumsum(gaps.astype(np.int64))
    tfs = vbyte_decode(np.frombuffer(seg.tfs_vb, dtype=np.uint8)).astype(np.int64)
    dls = vbyte_decode(np.frombuffer(seg.dls_vb, dtype=np.uint8)).astype(np.int64)
    return doc_ids, tfs, dls


def decode_block_range(
    seg: PostingSegment, i0: int, i1: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode blocks ``i0..i1`` (inclusive) in ONE vectorized pass.

    Uses the per-block byte offsets — the ``IndexedBuffer.Slice``
    analogue (/root/reference/indexedBuffer.go:55-59): address a
    contiguous byte range by record range without touching the rest.
    Gap decoding works across block boundaries because gaps are
    relative to the previous posting, whose doc id at a block start is
    exactly ``block_last_doc_id[i0 - 1]``.
    """
    n_blocks = len(seg.block_last_doc_id)
    if not (0 <= i0 <= i1 < n_blocks):
        raise IndexError((i0, i1))

    def _slice(buf: bytes, offs: np.ndarray) -> np.ndarray:
        start = int(offs[i0])
        end = int(offs[i1 + 1]) if i1 + 1 < n_blocks else len(buf)
        return np.frombuffer(buf, dtype=np.uint8)[start:end]

    gaps = vbyte_decode(_slice(seg.doc_gaps_vb, seg.block_doc_off)).astype(np.int64)
    base = int(seg.block_last_doc_id[i0 - 1]) if i0 > 0 else 0
    doc_ids = base + np.cumsum(gaps)
    tfs = vbyte_decode(_slice(seg.tfs_vb, seg.block_tf_off)).astype(np.int64)
    dls = vbyte_decode(_slice(seg.dls_vb, seg.block_dl_off)).astype(np.int64)
    return doc_ids, tfs, dls


def decode_block(seg: PostingSegment, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only block ``i`` of a segment (single-block skip path)."""
    return decode_block_range(seg, i, i)


def decode_block_range_pos(
    seg: PostingSegment, i0: int, i1: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Positional twin of :func:`decode_block_range`: additionally
    decodes the blocks' position stream -> (doc_ids, tfs, dls, pos)
    where ``pos`` is flat absolute token positions aligned with
    ``np.repeat(doc_ids, tfs)``.  Position deltas are per-doc
    self-contained, so a range decode needs no cross-block base."""
    if not seg.has_positions:
        raise ValueError("segment has no positional stream")
    doc_ids, tfs, dls = decode_block_range(seg, i0, i1)
    n_blocks = len(seg.block_last_doc_id)
    start = int(seg.block_pos_off[i0])
    end = int(seg.block_pos_off[i1 + 1]) if i1 + 1 < n_blocks else len(seg.positions_vb)
    deltas = vbyte_decode(np.frombuffer(seg.positions_vb, dtype=np.uint8)[start:end])
    pos = _restore_positions(deltas, tfs)
    return doc_ids, tfs, dls, pos


def decode_masked_pos(
    seg: PostingSegment, mask: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Positional twin of :func:`decode_masked` (same consecutive-range
    batching)."""
    nb = len(seg.block_last_doc_id)
    e = np.empty(0, dtype=np.int64)
    if nb == 0:
        return e, e, e, e
    if mask is None or mask.all():
        return decode_block_range_pos(seg, 0, nb - 1)
    sel = np.flatnonzero(mask)
    if sel.size == 0:
        return e, e, e, e
    brk = np.flatnonzero(np.diff(sel) > 1)
    starts = np.concatenate([[sel[0]], sel[brk + 1]])
    ends = np.concatenate([sel[brk], [sel[-1]]])
    parts = [decode_block_range_pos(seg, int(a), int(b)) for a, b in zip(starts, ends)]
    if len(parts) == 1:
        return parts[0]
    return tuple(np.concatenate([p[i] for p in parts]) for i in range(4))


def decode_masked(
    seg: PostingSegment, mask: np.ndarray | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the selected blocks of a segment, batching consecutive
    selected blocks into single vectorized range decodes.

    ``mask=None`` or all-True short-circuits to the full-stream decode
    (one pass, no block addressing at all)."""
    nb = len(seg.block_last_doc_id)
    e = np.empty(0, dtype=np.int64)
    if nb == 0:
        return e, e, e
    if mask is None or mask.all():
        return decode_postings(seg)
    sel = np.flatnonzero(mask)
    if sel.size == 0:
        return e, e, e
    brk = np.flatnonzero(np.diff(sel) > 1)
    starts = np.concatenate([[sel[0]], sel[brk + 1]])
    ends = np.concatenate([sel[brk], [sel[-1]]])
    parts = [decode_block_range(seg, int(a), int(b)) for a, b in zip(starts, ends)]
    if len(parts) == 1:
        return parts[0]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
        np.concatenate([p[2] for p in parts]),
    )


def segment_to_row(term: str, salt: int, seg: PostingSegment) -> dict:
    """Flatten a PostingSegment into a dict matching SEGMENT_SCHEMA
    (plus the positional columns when the segment carries them)."""
    row = _segment_row_base(term, salt, seg)
    if seg.has_positions:
        row["positions_vb"] = seg.positions_vb
        row["block_pos_off"] = [int(x) for x in seg.block_pos_off]
    return row


def _segment_row_base(term: str, salt: int, seg: PostingSegment) -> dict:
    return {
        "term": term,
        "salt": int(salt),
        "n_docs": int(seg.n_docs),
        "block_size": int(seg.block_size),
        "doc_gaps_vb": seg.doc_gaps_vb,
        "tfs_vb": seg.tfs_vb,
        "dls_vb": seg.dls_vb,
        "block_last_doc_id": [int(x) for x in seg.block_last_doc_id],
        "block_max_tf": [int(x) for x in seg.block_max_tf],
        "block_min_dl": [int(x) for x in seg.block_min_dl],
        "block_doc_off": [int(x) for x in seg.block_doc_off],
        "block_tf_off": [int(x) for x in seg.block_tf_off],
        "block_dl_off": [int(x) for x in seg.block_dl_off],
    }


def row_to_segment(row) -> PostingSegment:
    """Inverse of :func:`segment_to_row` (accepts dict-like / pd row)."""
    has_pos = "block_pos_off" in row and row["block_pos_off"] is not None
    return PostingSegment(
        positions_vb=bytes(row["positions_vb"]) if has_pos else b"",
        block_pos_off=(
            np.asarray(row["block_pos_off"], dtype=np.int64) if has_pos else None
        ),
        n_docs=int(row["n_docs"]),
        block_size=int(row["block_size"]),
        doc_gaps_vb=bytes(row["doc_gaps_vb"]),
        tfs_vb=bytes(row["tfs_vb"]),
        dls_vb=bytes(row["dls_vb"]),
        block_last_doc_id=np.asarray(row["block_last_doc_id"], dtype=np.int64),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int64),
        block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int64),
        block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int64),
        block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int64),
        block_dl_off=np.asarray(row["block_dl_off"], dtype=np.int64),
    )
