"""Top-k BM25 query engine over the posting-segment index.

Plan shape (all tiny on the query side, per SURVEY.md §2.2 joins):

    query texts -> tokenize -> (query_id, term, k)           [driver]
    -> term->bucket map (one tiny JVM job, no data read)
    -> segments parquet scan with term_bucket partition pruning AND
       term IN (...) predicate pushdown                       [scan]
    -> broadcast-join query terms + term stats onto segments
    -> groupBy(query_id).applyInPandas(kernel)                [1 shuffle
       of a few segment rows per query]
    -> (query_id, rank, doc_id, score)

Two exact kernels:

* ``exhaustive`` — decode every block of every matching run, vectorized
  accumulation.  The always-correct baseline.
* ``pruned`` (default) — block-max candidate pruning: bootstrap a
  threshold from the highest-impact term's own scores, bound every
  block by ub(block) + sum of overlapping-block maxima of the other
  terms, decode only surviving blocks (+ the gather blocks needed to
  finish candidates exactly).  Rank-identical to exhaustive by
  construction: pruning only discards docs whose score upper bound is
  strictly below the kth bootstrap score.

Scores are float64; per-doc term contributions accumulate in ascending
term order — the same pinned summation order as the oracle
(operators/bm25.py), so near-ties cannot reorder between engines.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bilies_go_spark import B_DEFAULT, K1_DEFAULT
from bilies_go_spark.operators.bm25 import query_terms_df
from bilies_go_spark.operators.codec import decode_masked, row_to_segment
from bilies_go_spark.operators.index_build import IndexPaths

TOPK_SCHEMA = "query_id bigint, rank int, doc_id bigint, score double"

# sharded-plan slice rows: only the byte streams + the decode base —
# block metadata is not needed (shard kernels decode their whole slice)
SEGMENT_SLICE_FIELDS = (
    "base_doc bigint, doc_gaps_vb binary, tfs_vb binary, dls_vb binary"
)


def _slice_segments_by_shard(pdf: pd.DataFrame, bounds: np.ndarray) -> pd.DataFrame | None:
    """Cut each segment row's VByte streams at block boundaries into
    per-shard byte slices (offset arithmetic only — no decode).

    A block straddling a shard boundary is emitted to every shard it
    overlaps; the shard kernel's doc-range filter keeps each doc
    exactly once.  ``base_doc`` carries the previous block's last doc
    id so gap decoding restarts correctly mid-stream."""
    out = []
    n_shards = len(bounds) - 1
    for row in pdf.itertuples(index=False):
        last = np.asarray(row.block_last_doc_id, dtype=np.int64)
        nb = last.size
        if nb == 0:
            continue
        starts_doc = np.concatenate([[-1], last[:-1]]) + 1
        offs = [
            np.asarray(row.block_doc_off, dtype=np.int64),
            np.asarray(row.block_tf_off, dtype=np.int64),
            np.asarray(row.block_dl_off, dtype=np.int64),
        ]
        bufs = [bytes(row.doc_gaps_vb), bytes(row.tfs_vb), bytes(row.dls_vb)]
        first_arr = np.searchsorted(last, bounds[:-1], side="left")
        last_arr = np.searchsorted(starts_doc, bounds[1:], side="left") - 1
        for s in range(n_shards):
            first, last_i = int(first_arr[s]), int(last_arr[s])
            if first > last_i or first >= nb:
                continue
            slices = []
            for off, buf in zip(offs, bufs):
                b0 = int(off[first])
                b1 = int(off[last_i + 1]) if last_i + 1 < nb else len(buf)
                slices.append(buf[b0:b1])
            base = int(last[first - 1]) if first > 0 else 0
            out.append(
                (
                    int(row.query_id),
                    int(row.k),
                    row.term,
                    int(row.df),
                    s,
                    base,
                    slices[0],
                    slices[1],
                    slices[2],
                )
            )
    if not out:
        return None
    return pd.DataFrame(
        out,
        columns=[
            "query_id", "k", "term", "df", "shard",
            "base_doc", "doc_gaps_vb", "tfs_vb", "dls_vb",
        ],
    )


def _score_shard(
    pdf: pd.DataFrame, lo: int, hi: int, k1: float, b: float, n_docs: int, avgdl: float
) -> pd.DataFrame:
    """Exhaustively score one (query, shard): decode every slice,
    keep docs in [lo, hi), fold in ascending-term order, shard top-k."""
    from bilies_go_spark.operators.codec import vbyte_decode

    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    terms = sorted(pdf["term"].unique())
    per_term, decoded = {}, {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {"idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5)))}
        parts = []
        for r in rows.itertuples(index=False):
            gaps = vbyte_decode(np.frombuffer(bytes(r.doc_gaps_vb), dtype=np.uint8))
            if gaps.size == 0:
                continue
            ids = int(r.base_doc) + np.cumsum(gaps.astype(np.int64))
            m = (ids >= lo) & (ids < hi)
            if not m.any():
                continue
            tfs = vbyte_decode(np.frombuffer(bytes(r.tfs_vb), dtype=np.uint8)).astype(np.int64)
            dls = vbyte_decode(np.frombuffer(bytes(r.dls_vb), dtype=np.uint8)).astype(np.int64)
            parts.append((ids[m], tfs[m], dls[m]))
        e = np.empty(0, dtype=np.int64)
        if not parts:
            decoded[term] = (e, e, e)
        elif len(parts) == 1:
            decoded[term] = parts[0]
        else:
            decoded[term] = tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b)
    if doc.size == 0:
        return empty
    sel = _topk_select(doc, acc, k)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": doc[sel],
            "score": acc[sel],
        }
    )


def _tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


@dataclass
class KernelStats:
    blocks_total: int = 0
    blocks_decoded: int = 0


def _decode_term_runs(runs: list, block_mask_per_run: list | None):
    """Decode (selected blocks of) a term's runs; concatenated, UNSORTED.

    Decoding is range-vectorized (codec.decode_masked): a full run is
    one VByte pass, a masked run one pass per consecutive-block range —
    never a per-block Python loop (at ~5k blocks per hot term that loop
    was the whole query latency).  No sort: salted runs partition a
    term's docs, so each (term, doc) appears once, and the aggregation
    (:func:`_merge_accumulate`) sorts globally exactly once."""
    ids_parts, tf_parts, dl_parts = [], [], []
    for ri, seg in enumerate(runs):
        mask = None if block_mask_per_run is None else block_mask_per_run[ri]
        d, t, ln = decode_masked(seg, mask)
        if d.size:
            ids_parts.append(d)
            tf_parts.append(t)
            dl_parts.append(ln)
    if not ids_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    if len(ids_parts) == 1:
        return ids_parts[0], tf_parts[0], dl_parts[0]
    return (
        np.concatenate(ids_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )


def _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=None):
    """Sum per-term BM25 contributions per doc in ONE sorted pass.

    Arrays concatenate in ascending-term order; the stable argsort
    keeps each doc's entries in that order, so ``np.add.reduceat``'s
    sequential per-segment fold reproduces the oracle's pinned
    ascending-term float64 summation exactly.  ``cand`` (sorted) keeps
    only complete candidates in the pruned path (docs decoded
    incidentally with partial sums are dropped).
    """
    ids_parts, sc_parts = [], []
    for t in terms:  # ascending — pinned order
        ids, tfs, dls = decoded[t]
        if ids.size == 0:
            continue
        ids_parts.append(ids)
        sc_parts.append(per_term[t]["idf"] * _tf_norm(tfs, dls, avgdl, k1, b))
    e = np.empty(0, dtype=np.int64)
    if not ids_parts:
        return e, np.empty(0, dtype=np.float64)
    ids_all = np.concatenate(ids_parts)
    sc_all = np.concatenate(sc_parts)
    if cand is not None and cand.size == 0:
        return e, np.empty(0, dtype=np.float64)

    max_id = int(ids_all.max())
    if max_id < max(1 << 22, 8 * ids_all.size):
        # dense path: one O(n) pass.  bincount scans the input
        # sequentially, so each doc's contributions still fold in
        # ascending-term order (same pinned float64 semantics).
        # Contributions are strictly positive (idf>0, tf>=1), so
        # nonzero bins == matched docs.
        bins = np.bincount(ids_all, weights=sc_all, minlength=max_id + 1)
        if cand is not None:
            mark = np.zeros(max_id + 1, dtype=bool)
            mark[cand[cand <= max_id]] = True
            bins = np.where(mark, bins, 0.0)
        doc = np.flatnonzero(bins)
        return doc, bins[doc]

    # sparse path (10^12-scale doc-id spaces): sort + segmented fold
    order = np.argsort(ids_all, kind="stable")
    ids_s = ids_all[order]
    sc_s = sc_all[order]
    bnd = np.flatnonzero(np.concatenate([[True], ids_s[1:] != ids_s[:-1]]))
    doc = ids_s[bnd]
    acc = np.add.reduceat(sc_s, bnd)
    if cand is not None:
        pos = np.searchsorted(cand, doc)
        pos_c = np.minimum(pos, cand.size - 1)
        keep = cand[pos_c] == doc
        doc, acc = doc[keep], acc[keep]
    return doc, acc


def _topk_select(doc: np.ndarray, acc: np.ndarray, k: int, tie_margin: float = 0.0):
    """Top-k indices by (score desc, doc_id asc) — partition first so
    the O(n log n) tie-break lexsort touches only ~k rows.

    ``tie_margin > 0`` returns ALL docs with score >= (kth raw score −
    tie_margin) instead of exactly k: with margin = 10^-d, any doc whose
    round(·, d) score could tie the kth doc's rounded score is included
    (two values rounding equal differ by < 10^-d), so a downstream
    rounded-score re-rank is exact without an arbitrary overfetch."""
    if doc.size > max(4 * k, 64) and tie_margin == 0.0:
        kth = np.partition(acc, doc.size - k)[doc.size - k]
        m = acc >= kth  # >= keeps boundary ties for exact tie-break
        doc, acc, idx = doc[m], acc[m], np.flatnonzero(m)
    elif doc.size > k and tie_margin > 0.0:
        kth = np.partition(acc, doc.size - k)[doc.size - k]
        m = acc >= kth - tie_margin
        doc, acc, idx = doc[m], acc[m], np.flatnonzero(m)
    else:
        idx = np.arange(doc.size)
    order = np.lexsort((doc, -acc))
    if tie_margin == 0.0:
        order = order[:k]
    return idx[order]


def score_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    prune: bool = True,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Score one query's segment rows -> top-k (exact).

    ``tie_margin``: see :func:`_topk_select` — when > 0 the result
    includes every doc within the margin of the kth raw score (and the
    pruning threshold is slackened by the same margin), so a rounded
    re-rank downstream is provably exact."""
    if pdf.empty or avgdl <= 0:
        return pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        idf = float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5)))
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        ubs = [
            idf
            * _tf_norm(
                seg.block_max_tf.astype(np.float64),
                seg.block_min_dl.astype(np.float64),
                avgdl,
                k1,
                b,
            )
            for seg in runs
        ]
        per_term[term] = {"idf": idf, "runs": runs, "ubs": ubs}
        stats.blocks_total += sum(len(u) for u in ubs)

    if prune and len(terms) > 1:
        cand, decoded = _pruned_candidates(
            per_term, terms, k, avgdl, k1, b, stats, tie_margin=tie_margin
        )
        doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=cand)
    else:
        stats.blocks_decoded += stats.blocks_total
        decoded = {t: _decode_term_runs(per_term[t]["runs"], None) for t in terms}
        doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b)
    if doc.size == 0:
        return pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})

    sel = _topk_select(doc, acc, k, tie_margin=tie_margin)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": doc[sel],
            "score": acc[sel],
        }
    )


def _seg_blocks_with_candidates(seg, cand: np.ndarray) -> np.ndarray:
    """Bool mask over a segment's blocks: block may contain one of the
    (sorted) candidate doc ids.  Two binary searches of the block
    bounds into the candidate array — O(n_blocks log n_cand)."""
    last = seg.block_last_doc_id
    starts = np.concatenate([[-1], last[:-1]]) + 1
    lo = np.searchsorted(cand, starts, side="left")
    hi = np.searchsorted(cand, last, side="right")
    return hi > lo


def conjunctive_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """AND-semantics top-k: only docs containing EVERY query term
    (BM25-scored, same formula/fold order as the OR kernel).

    Candidate-driven plan: the RAREST term decodes fully and seeds the
    candidate set; every other term — visited in ascending-df order —
    decodes only the blocks that can contain a surviving candidate and
    intersects.  Cost is O(df_min + n_blocks_other log df_min), never
    O(Σ df): conjunctive queries with one rare term stay cheap no
    matter how hot the other terms are.  Expects an ``n_terms`` column
    (the query's distinct-term count): if any term has no postings the
    group is missing rows and the result is empty by definition.
    """
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return empty  # a query term matches no document -> AND is empty
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": [row_to_segment(r) for _, r in rows.iterrows()],
        }
        stats.blocks_total += sum(
            len(seg.block_last_doc_id) for seg in per_term[term]["runs"]
        )

    by_df = sorted(terms, key=lambda t: (per_term[t]["df"], t))
    rare = by_df[0]
    decoded = {rare: _decode_term_runs(per_term[rare]["runs"], None)}
    stats.blocks_decoded += sum(
        len(seg.block_last_doc_id) for seg in per_term[rare]["runs"]
    )
    cand = np.sort(decoded[rare][0])
    e = np.empty(0, dtype=np.int64)
    for t in by_df[1:]:
        if cand.size == 0:
            return empty
        parts = []
        for seg in per_term[t]["runs"]:
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                parts.append(decode_masked(seg, mask))
                stats.blocks_decoded += int(mask.sum())
        if not parts:
            return empty
        triple = (
            parts[0]
            if len(parts) == 1
            else tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
        )
        decoded[t] = triple
        ids_sorted = np.sort(triple[0])
        pos = np.searchsorted(ids_sorted, cand)
        pos = np.minimum(pos, ids_sorted.size - 1)
        cand = cand[ids_sorted[pos] == cand]
    if cand.size == 0:
        return empty
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=cand)
    if doc.size == 0:
        return empty
    sel = _topk_select(doc, acc, k, tie_margin=tie_margin)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": doc[sel],
            "score": acc[sel],
        }
    )


class _RunIndex:
    """Block ranges + a sparse table for O(1) range-max over block ubs.

    Blocks within one run are doc-disjoint and sorted; runs of the same
    term interleave in doc space, so per-run RMQ + max over runs gives
    the exact per-range maximum upper bound.
    """

    def __init__(self, seg, ub: np.ndarray):
        last = seg.block_last_doc_id
        self.ends = last.astype(np.int64)
        self.starts = np.concatenate([[-1], last[:-1]]).astype(np.int64) + 1
        self.ub = ub
        # sparse table: tabs[j][i] = max ub over blocks [i, i + 2^j)
        tabs = [ub]
        j = 1
        while (1 << j) <= len(ub):
            prev = tabs[-1]
            half = 1 << (j - 1)
            tabs.append(np.maximum(prev[: len(prev) - half], prev[half:]))
            j += 1
        self.tabs = tabs

    def range_max(self, q_start: np.ndarray, q_end: np.ndarray) -> np.ndarray:
        """Max ub over blocks overlapping [q_start, q_end], per query."""
        i0 = np.searchsorted(self.ends, q_start, side="left")
        i1 = np.searchsorted(self.starts, q_end, side="right") - 1
        out = np.zeros(q_start.size, dtype=np.float64)
        valid = (i0 <= i1) & (i0 < len(self.ub))
        if not valid.any():
            return out
        a, c = i0[valid], i1[valid]
        length = c - a + 1
        j = np.frexp(length.astype(np.float64))[1] - 1  # floor(log2)
        res = np.empty(a.size, dtype=np.float64)
        for jj in np.unique(j):
            m = j == jj
            tab = self.tabs[int(jj)]
            span = 1 << int(jj)
            res[m] = np.maximum(tab[a[m]], tab[c[m] - span + 1])
        out[valid] = res
        return out

    def blocks_with_candidates(self, cand: np.ndarray) -> np.ndarray:
        """Bool mask: block i contains >=1 of the (sorted) candidates.

        Two searchsorted passes of the BLOCK bounds into the candidate
        array — O(n_blocks log n_cand) — instead of binary-searching
        every candidate into the block index (O(n_cand log n_blocks) +
        a unique sort, which at ~2M candidates x several runs was the
        dominant all-hot-query cost)."""
        lo = np.searchsorted(cand, self.starts, side="left")
        hi = np.searchsorted(cand, self.ends, side="right")
        return hi > lo


def _pruned_candidates(
    per_term, terms, k, avgdl, k1, b, stats: KernelStats, tie_margin: float = 0.0
):
    """Block-max candidate pruning + candidate-directed gather.

    1. Bootstrap θ = kth best *partial* score of the highest-impact
       term (partial scores lower-bound true scores, so θ lower-bounds
       the final kth score).
    2. A block of term t survives iff ub_t(block) + Σ_{u≠t}
       (max ub over u-blocks overlapping the block's doc range) ≥ θ.
       Any doc in no surviving block has total upper bound < θ — it
       cannot enter the top-k (rank-safe pruning).
    3. Candidates = docs of surviving blocks only.  Exactness: for each
       term, additionally decode the blocks that may CONTAIN a
       candidate (binary search of candidate ids against block ranges),
       so every candidate's score is complete.

    Returns (candidate doc_ids, {term: (ids, tfs, dls)} decoded arrays).
    """
    runidx = {
        t: [_RunIndex(seg, per_term[t]["ubs"][ri]) for ri, seg in enumerate(per_term[t]["runs"])]
        for t in terms
    }

    # 1. bootstrap θ (decode the dominant term once; arrays reused below)
    best_term = max(
        terms,
        key=lambda t: max((float(r.ub.max()) for r in runidx[t] if r.ub.size), default=0.0),
    )
    best_full = _decode_term_runs(per_term[best_term]["runs"], None)
    stats.blocks_decoded += sum(len(r.ub) for r in runidx[best_term])
    part = per_term[best_term]["idf"] * _tf_norm(best_full[1], best_full[2], avgdl, k1, b)
    theta = float(np.partition(part, -k)[-k]) if part.size >= k else 0.0

    # 2. survival masks (tight per-range bounds via RMQ)
    surviving: dict[str, list[np.ndarray]] = {}
    for t in terms:
        mask_per_run = []
        for r in runidx[t]:
            bound = r.ub.copy()
            for u in terms:
                if u == t:
                    continue
                ou = np.zeros(len(r.ub), dtype=np.float64)
                for ur in runidx[u]:
                    np.maximum(ou, ur.range_max(r.starts, r.ends), out=ou)
                bound += ou
            # keep true ties; tie_margin widens the window so rounded
            # near-ties of the kth score are never pruned
            mask_per_run.append(bound >= theta - tie_margin - 1e-12)
        surviving[t] = mask_per_run

    # 3. decode each surviving block ONCE, keeping full triples; the
    # candidate set is their doc union (plus all of best_term — already
    # decoded for θ; a candidate superset is always rank-safe)
    dec_surv: dict[str, list] = {}
    cand_parts = [best_full[0]]
    for t in terms:
        parts = []
        if t != best_term:
            for ri, seg in enumerate(per_term[t]["runs"]):
                m = surviving[t][ri]
                if not m.any():
                    continue
                triple = decode_masked(seg, m)
                parts.append(triple)
                cand_parts.append(triple[0])
        dec_surv[t] = parts
    cand_parts = [p for p in cand_parts if p.size]
    if not cand_parts:
        cand = np.empty(0, np.int64)
    else:
        tot = sum(p.size for p in cand_parts)
        mx = max(int(p.max()) for p in cand_parts)
        if mx < max(1 << 22, 8 * tot):  # dense union (O(n), no sort)
            pres = np.zeros(mx + 1, dtype=bool)
            for p in cand_parts:
                pres[p] = True
            cand = np.flatnonzero(pres)
        else:
            cand = np.unique(np.concatenate(cand_parts))
    if cand.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, {t: (e, e, e) for t in terms}

    # 4. gather: per term additionally decode ONLY the not-yet-decoded
    # blocks that may contain a candidate, so every candidate's score
    # is complete; concat order within a term is irrelevant (the
    # aggregation sorts globally)
    decoded = {}
    e = np.empty(0, dtype=np.int64)
    for t in terms:
        if t == best_term:
            decoded[t] = best_full  # already full — lookups complete
            continue
        parts = dec_surv[t]
        n_extra = 0
        for ri, r in enumerate(runidx[t]):
            surv = surviving[t][ri]
            if surv.all():
                continue  # nothing left to gather for this run
            extra = r.blocks_with_candidates(cand) & ~surv
            if extra.any():
                parts.append(decode_masked(per_term[t]["runs"][ri], extra))
                n_extra += int(extra.sum())
        stats.blocks_decoded += n_extra + int(
            sum(m.sum() for m in surviving[t])
        )
        if not parts:
            decoded[t] = (e, e, e)
        elif len(parts) == 1:
            decoded[t] = parts[0]
        else:
            decoded[t] = tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
    return cand, decoded


def load_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "_index_meta.json")) as f:
        return json.load(f)


class _SegmentCache:
    """Term-keyed LRU over fetched (segment ⋈ df) rows — the serving
    node's postings cache (the role Lucene delegates to the OS page
    cache and ES to its node query cache).  Hot terms ('the', 'of')
    recur across a query stream; caching their segment rows removes the
    per-query parquet fetch (the dominant fixed cost for hot queries).
    Byte-capped LRU: at 10^12 docs a node caches its working set, never
    the index."""

    def __init__(self, max_bytes: int):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self._d: "OrderedDict[str, tuple[pd.DataFrame, int]]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, term: str) -> pd.DataFrame | None:
        hit = self._d.get(term)
        if hit is None:
            self.misses += 1
            return None
        self._d.move_to_end(term)
        self.hits += 1
        return hit[0]

    def put(self, term: str, pdf: pd.DataFrame) -> None:
        nb = 256 * max(len(pdf), 1)
        for col in ("doc_gaps_vb", "tfs_vb", "dls_vb"):
            if col in pdf.columns and len(pdf):
                nb += int(pdf[col].str.len().sum())
        if term in self._d:
            self._bytes -= self._d.pop(term)[1]
        self._d[term] = (pdf, nb)
        self._bytes += nb
        while self._bytes > self.max_bytes and len(self._d) > 1:
            _, (_, old_nb) = self._d.popitem(last=False)
            self._bytes -= old_nb


class QueryEngine:
    """Reusable query handle over a built index.

    Loads the one-row corpus-stats table and index meta ONCE, and maps
    query terms to segment buckets driver-side with the pure-Python
    twin of the build's ``pmod(xxhash64(term), n_buckets)`` (verified
    bit-identical to the JVM hash, functions/xxhash.py) — so each
    ``topk`` call costs exactly one Spark job: the pruned
    partition-and-predicate-pushed segment scan + broadcast joins +
    per-query kernel.  This is the serving-path analogue of the
    reference keeping its queue/cursor state resident
    (/root/reference/queue.go:125-128) instead of re-opening per batch.
    """

    #: ``mode="auto"`` serves batches up to this size driver-locally
    LOCAL_MAX_QUERIES = 64

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        prune: bool = True,
        tie_margin: float = 0.0,
        cache_mb: int | None = None,
    ):
        import os as _os

        self.spark = spark
        self.paths = IndexPaths(index_dir)
        self.meta = load_index_meta(index_dir)
        srow = spark.read.parquet(self.paths.stats_table).collect()[0]
        self.n_docs, self.avgdl = int(srow["n_docs"]), float(srow["avgdl"])
        self.k1, self.b, self.prune = k1, b, prune
        self.tie_margin = tie_margin
        self._local_ds = None
        if cache_mb is None:
            cache_mb = int(_os.environ.get("BGS_SEGMENT_CACHE_MB", "256"))
        self.seg_cache = _SegmentCache(cache_mb << 20)
        # delta tiers from incremental compaction (streaming/ingest.
        # compact_tiered): unioned with the base segments on every path.
        # Tiers are doc-disjoint by the append-only id contract, so the
        # kernels' per-(term, doc) uniqueness assumption holds; global
        # df = sum over base + tiers.  Snapshot semantics: the tier list
        # is pinned at engine construction (rebuild the engine to see a
        # newer compaction).
        self.tiers = self.paths.read_tiers()
        # fault in the serving arena once so per-query numpy temporaries
        # never pay first-touch page faults (see prefault_heap)
        import bilies_go_spark

        bilies_go_spark.prefault_heap()

    # -- shared query-plan helpers -----------------------------------------

    def _seg_roots(self) -> list[str]:
        roots = [self.paths.segments] + [self.paths.tier_segments(t) for t in self.tiers]
        return [r for r in roots if os.path.isdir(r)]

    def _ts_roots(self) -> list[str]:
        roots = [self.paths.term_stats] + [
            self.paths.tier_term_stats(t) for t in self.tiers
        ]
        return [r for r in roots if os.path.isdir(r)]

    def _segments_df(self, terms: list[str], buckets: list[int]) -> DataFrame:
        """Pruned segment scan over base + tier roots (unionByName; the
        partition/predicate filters reach every root's parquet scan)."""
        from functools import reduce

        dfs = [
            self.spark.read.parquet(p).filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
            )
            for p in self._seg_roots()
        ]
        return reduce(DataFrame.unionByName, dfs)

    def _tstats_df(self, terms: list[str], buckets: list[int]) -> DataFrame:
        """(term, df) with df summed across base + tiers — the GLOBAL
        document frequency the BM25 idf needs."""
        from functools import reduce

        dfs = [
            self.spark.read.parquet(p)
            .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
            .select("term", "df")
            for p in self._ts_roots()
        ]
        u = reduce(DataFrame.unionByName, dfs)
        return u.groupBy("term").agg(F.sum("df").alias("df"))

    def _terms_and_buckets(self, queries: pd.DataFrame) -> tuple[list[str], list[int]]:
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(
            {t for q in queries.itertuples(index=False) for t in _tokenize_terms(q.text)}
        )
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        return terms, buckets

    # -- distributed path ----------------------------------------------------

    def topk_distributed(self, queries: pd.DataFrame, n_shards: int = 1) -> DataFrame:
        """Cluster path: pruned segment scan + broadcast joins + one
        kernel task per query.  Right for large query batches — the
        per-query work parallelizes across executors.

        ``n_shards > 1`` switches to the doc-range-sharded plan
        (:meth:`topk_sharded`), which parallelizes WITHIN a query —
        the right plan when single queries touch huge posting lists
        (hot terms at 10^12-doc scale)."""
        if n_shards > 1:
            return self.topk_sharded(queries, n_shards)
        qt = query_terms_df(self.spark, queries)
        terms, buckets = self._terms_and_buckets(queries)
        if not terms:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)

        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl, prune = self.k1, self.b, self.n_docs, self.avgdl, self.prune
        margin = self.tie_margin

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            import bilies_go_spark

            # fault in just enough arena for THIS task's decode (~64 B
            # per posting of transient numpy arrays, see prefault_heap);
            # page population is globally bottlenecked on this VM class,
            # so a flat large prefault in every worker costs more than
            # it saves — the watermark makes repeat tasks free
            need = 64 * int(pdf["n_docs"].sum()) + (32 << 20)
            bilies_go_spark.prefault_heap(min(need, 384 << 20))
            return score_query_kernel(
                pdf, k1, b, n_docs, avgdl, prune=prune, tie_margin=margin
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_conjunctive(self, queries: pd.DataFrame) -> DataFrame:
        """AND-semantics distributed top-k (one kernel task per query).

        Same pruned-scan + broadcast-join plan as
        :meth:`topk_distributed`; the kernel intersects instead of
        unioning (see :func:`conjunctive_query_kernel`)."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        rows = []
        for r in queries.itertuples(index=False):
            qts = sorted(set(tokenize_py(r.text)))
            for t in qts:
                rows.append((int(r.query_id), t, int(r.k), len(qts)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            pd.DataFrame(rows, columns=["query_id", "term", "k", "n_terms"]),
            schema="query_id bigint, term string, k int, n_terms int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            import bilies_go_spark

            need = 64 * int(pdf["n_docs"].sum()) + (32 << 20)
            bilies_go_spark.prefault_heap(min(need, 384 << 20))
            return conjunctive_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    # -- doc-range-sharded distributed path ------------------------------------

    def topk_sharded(self, queries: pd.DataFrame, n_shards: int) -> DataFrame:
        """Exact top-k with intra-query parallelism: doc-id-range shards.

        Doc ids are dense ranks (corpus.assign_doc_ids), so equal-width
        ranges [lo, hi) partition the docs.  A slicing ``mapInPandas``
        stage cuts each matching segment's VByte streams at block
        boundaries per shard (pure byte-offset arithmetic — each byte
        is shuffled once; a block straddling a boundary goes to both
        sides and the kernel's range filter dedups).  Each
        (query, shard) kernel task then scores its doc range completely
        and exactly (every posting of a doc lands in its shard), emits
        a shard-local top-k, and a final window takes the global top-k.
        Exact because shards partition docs; the pinned ascending-term
        fold happens entirely inside one shard per doc.

        This is the plan that survives 10^12 docs: no single task ever
        holds a full hot-term posting list, shard fan-out scales with
        the cluster, and the merge input is n_shards * k tiny rows.
        """
        qt = query_terms_df(self.spark, queries)
        terms, buckets = self._terms_and_buckets(queries)
        if not terms:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        slice_schema = (
            "query_id bigint, k int, term string, df bigint, shard int, "
            + SEGMENT_SLICE_FIELDS
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard(pdf, bounds)
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            import bilies_go_spark

            # slice rows carry no n_docs; size by compressed bytes
            # (~1 B/value VByte -> ~3 decoded int64 streams + temps)
            vb = int(
                pdf["doc_gaps_vb"].str.len().sum()
                + pdf["tfs_vb"].str.len().sum()
                + pdf["dls_vb"].str.len().sum()
            )
            bilies_go_spark.prefault_heap(min(24 * vb + (32 << 20), 384 << 20))
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _score_shard(pdf, lo, hi, k1, b, n_docs, avgdl)

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        kdf = F.broadcast(
            self.spark.createDataFrame(
                queries[["query_id", "k"]], schema="query_id bigint, k int"
            )
        )
        return (
            partial.drop("rank")
            .join(kdf, "query_id")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )

    # -- driver-local serving path -------------------------------------------

    def _datasets(self):
        import pyarrow.dataset as pads

        if self._local_ds is None:
            self._local_ds = (
                [pads.dataset(p, partitioning="hive") for p in self._seg_roots()],
                [pads.dataset(p, partitioning="hive") for p in self._ts_roots()],
            )
        return self._local_ds

    def _seg_rows(self, terms: list[str]) -> pd.DataFrame:
        """Segment rows (⋈ df) for the given terms, served from the
        byte-capped LRU term cache; only cache misses touch parquet
        (one pruned pyarrow read for all missing terms).  Absent terms
        are negative-cached as empty frames."""
        import pyarrow.dataset as pads

        from bilies_go_spark.functions.xxhash import term_bucket_py

        frames = []
        missing = []
        for t in terms:
            hit = self.seg_cache.get(t)
            if hit is None:
                missing.append(t)
            else:
                frames.append(hit)
        if missing:
            seg_dss, ts_dss = self._datasets()
            buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in missing})
            filt = pads.field("term_bucket").isin(buckets) & pads.field("term").isin(missing)
            seg_parts = [ds.to_table(filter=filt).to_pandas() for ds in seg_dss]
            ts_parts = [
                ds.to_table(filter=filt, columns=["term", "df"]).to_pandas()
                for ds in ts_dss
            ]
            seg_pdf = pd.concat(seg_parts, ignore_index=True)
            # global df = sum across base + tiers
            ts_pdf = (
                pd.concat(ts_parts, ignore_index=True)
                .groupby("term", as_index=False)["df"]
                .sum()
            )
            seg_pdf = seg_pdf.merge(ts_pdf, on="term")
            for t in missing:
                rows = seg_pdf[seg_pdf["term"] == t]
                self.seg_cache.put(t, rows)
                frames.append(rows)
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame()
        return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]

    def topk_pandas(self, queries: pd.DataFrame) -> pd.DataFrame:
        """Serving path: read only the query terms' segment rows via
        pyarrow (term_bucket partition pruning + term predicate + LRU
        term cache, no Spark job) and run the same block-max kernel
        driver-side.

        This is the low-latency point-query surface a search frontend
        hits; the distributed path is for bulk evaluation.  Both paths
        share ``score_query_kernel``, so rank identity between them is
        structural.  Latency is O(bytes of the query's posting lists),
        independent of cluster scheduling.
        """
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        terms, buckets = self._terms_and_buckets(queries)
        if not terms:
            return empty
        seg_pdf = self._seg_rows(terms)
        if seg_pdf.empty:
            return empty
        outs = []
        for q in queries.itertuples(index=False):
            qterms = sorted(_tokenize_terms(q.text))
            pdf = seg_pdf[seg_pdf["term"].isin(qterms)]
            if pdf.empty:
                continue
            pdf = pdf.assign(query_id=int(q.query_id), k=int(q.k))
            outs.append(
                score_query_kernel(
                    pdf,
                    self.k1,
                    self.b,
                    self.n_docs,
                    self.avgdl,
                    prune=self.prune,
                    tie_margin=self.tie_margin,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def topk(self, queries: pd.DataFrame, mode: str = "auto") -> DataFrame:
        """Batch top-k: one output row per (query, rank).

        mode: 'local' (driver serving path), 'distributed', or 'auto'
        (local for small batches)."""
        if mode == "auto":
            mode = "local" if len(queries) <= self.LOCAL_MAX_QUERIES else "distributed"
        if mode == "distributed":
            return self.topk_distributed(queries)
        pdf = self.topk_pandas(queries)
        if pdf.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self.spark.createDataFrame(pdf, schema=TOPK_SCHEMA)


def _tokenize_terms(text: str) -> set[str]:
    from bilies_go_spark.functions.tokenize import tokenize_py

    return set(tokenize_py(text))


def topk(
    spark: SparkSession,
    index_dir: str,
    queries: pd.DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    prune: bool = True,
    mode: str = "auto",
    tie_margin: float = 0.0,
) -> DataFrame:
    """One-shot batch top-k (constructs a throwaway :class:`QueryEngine`;
    use the class directly to amortize stats/meta loading)."""
    return QueryEngine(spark, index_dir, k1, b, prune, tie_margin=tie_margin).topk(
        queries, mode=mode
    )
