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
import re
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


def _slice_segments_by_shard(
    pdf: pd.DataFrame,
    bounds: np.ndarray,
    extra_cols: tuple[str, ...] = (),
) -> pd.DataFrame | None:
    """Cut each segment row's VByte streams at block boundaries into
    per-shard byte slices (offset arithmetic only — no decode).

    A block straddling a shard boundary is emitted to every shard it
    overlaps; the shard kernel's doc-range filter keeps each doc
    exactly once.  ``base_doc`` carries the previous block's last doc
    id so gap decoding restarts correctly mid-stream.  ``extra_cols``
    ride through per row (per-query kernel columns, e.g. dis_max's
    clauses/tie)."""
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
        extras = tuple(getattr(row, c) for c in extra_cols)
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
                    *extras,
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
            "query_id", "k", *extra_cols, "term", "df", "shard",
            "base_doc", "doc_gaps_vb", "tfs_vb", "dls_vb",
        ],
    )


def _score_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted: np.ndarray | DocSetFilter | None = None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Exhaustively score one (query, shard): decode every slice,
    keep docs in [lo, hi), fold in ascending-term order, shard top-k.

    With ``tie_margin > 0`` the shard emits every doc within the margin
    of its local kth raw score.  A shard's postings are a subset of the
    query's, so shard-kth <= global-kth: any doc within the margin of
    the GLOBAL kth is also within the margin of its own shard's kth —
    the margin extras always survive to the global merge."""
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
            parts.append(_alive_triple((ids[m], tfs[m], dls[m]), deleted))
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
    sel = _topk_select(doc, acc, k, tie_margin=tie_margin)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": doc[sel],
            "score": acc[sel],
        }
    )


def _dis_max_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Doc-range-sharded ``dis_max`` twin of :func:`_score_shard`:
    decode every slice, keep docs in [lo, hi), fold each clause in
    ascending-term order and combine clauses ascending — identical
    float semantics to :func:`dis_max_query_kernel` because a doc's
    postings all land in its shard.  Shard-kth <= global-kth, so the
    tie-margin extras survive the merge (same argument as
    :func:`_score_shard`)."""
    import json

    from bilies_go_spark.operators.codec import vbyte_decode

    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    tie = float(pdf["tie"].iloc[0])
    terms = sorted(pdf["term"].unique())
    per_term, decoded = {}, {}
    clause_terms: dict[int, list[str]] = {}
    for term in terms:  # ascending — pinned order within each clause
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
            parts.append(_alive_triple((ids[m], tfs[m], dls[m]), deleted))
        e = np.empty(0, dtype=np.int64)
        if not parts:
            decoded[term] = (e, e, e)
        elif len(parts) == 1:
            decoded[term] = parts[0]
        else:
            decoded[term] = tuple(np.concatenate([p[i] for p in parts]) for i in range(3))
        for cl in json.loads(rows["clauses"].iloc[0] or "[]"):
            if term not in clause_terms.setdefault(int(cl), []):
                clause_terms[int(cl)].append(term)
    clause_docs, clause_accs = [], []
    for cl in sorted(clause_terms):
        doc, acc = _merge_accumulate(
            decoded, per_term, sorted(clause_terms[cl]), avgdl, k1, b
        )
        if doc.size:
            clause_docs.append(doc)
            clause_accs.append(acc)
    if not clause_docs:
        return empty
    all_docs = np.unique(np.concatenate(clause_docs))
    total = np.zeros(all_docs.size, dtype=np.float64)
    best = np.zeros(all_docs.size, dtype=np.float64)
    for doc, acc in zip(clause_docs, clause_accs):  # ascending-clause fold
        idx = np.searchsorted(all_docs, doc)
        total[idx] += acc
        np.maximum.at(best, idx, acc)
    score = best + tie * (total - best)
    sel = _topk_select(all_docs, score, k, tie_margin=tie_margin)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": all_docs[sel],
            "score": score[sel],
        }
    )


def _slice_segments_by_shard_pos(
    pdf: pd.DataFrame,
    bounds: np.ndarray,
    extra_cols: tuple[str, ...] = ("n_terms", "slots"),
) -> pd.DataFrame | None:
    """Positional twin of :func:`_slice_segments_by_shard`: also cuts
    the positions stream at the same block boundaries (block_pos_off)
    and carries the per-query kernel columns (``extra_cols`` — phrase:
    n_terms+slots, proximity: n_terms+slop) through."""

    def _conv(v):
        if isinstance(v, str):
            return v
        if isinstance(v, (list, tuple, np.ndarray)):
            return [int(x) for x in v]
        if isinstance(v, (float, np.floating)):
            return float(v)  # fractional boosts must survive the slice
        return int(v)

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
            np.asarray(row.block_pos_off, dtype=np.int64),
        ]
        bufs = [
            bytes(row.doc_gaps_vb),
            bytes(row.tfs_vb),
            bytes(row.dls_vb),
            bytes(row.positions_vb),
        ]
        first_arr = np.searchsorted(last, bounds[:-1], side="left")
        last_arr = np.searchsorted(starts_doc, bounds[1:], side="left") - 1
        for sh in range(n_shards):
            first, last_i = int(first_arr[sh]), int(last_arr[sh])
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
                    *(_conv(getattr(row, c)) for c in extra_cols),
                    row.term,
                    int(row.df),
                    sh,
                    base,
                    slices[0],
                    slices[1],
                    slices[2],
                    slices[3],
                )
            )
    if not out:
        return None
    return pd.DataFrame(
        out,
        columns=[
            "query_id", "k", *extra_cols, "term", "df", "shard",
            "base_doc", "doc_gaps_vb", "tfs_vb", "dls_vb", "positions_vb",
        ],
    )


def _decode_slice_quad(rows: pd.DataFrame, lo: int, hi: int, deleted):
    """Decode ONE term's positional byte slices into a live
    (ids, tfs, dls, pos) quad restricted to [lo, hi); None when the
    term has no live postings inside the shard."""
    from bilies_go_spark.operators.codec import _restore_positions, vbyte_decode

    parts = []
    for r in rows.itertuples(index=False):
        gaps = vbyte_decode(np.frombuffer(bytes(r.doc_gaps_vb), dtype=np.uint8))
        if gaps.size == 0:
            continue
        ids = int(r.base_doc) + np.cumsum(gaps.astype(np.int64))
        tfs = vbyte_decode(np.frombuffer(bytes(r.tfs_vb), dtype=np.uint8)).astype(np.int64)
        dls = vbyte_decode(np.frombuffer(bytes(r.dls_vb), dtype=np.uint8)).astype(np.int64)
        deltas = vbyte_decode(np.frombuffer(bytes(r.positions_vb), dtype=np.uint8))
        pos = _restore_positions(deltas, tfs)
        m = (ids >= lo) & (ids < hi)
        if not m.any():
            continue
        quad = (ids[m], tfs[m], dls[m], pos[np.repeat(m, tfs)])
        parts.append(_alive_quad(quad, deleted))
    parts = [p for p in parts if p[0].size]
    if not parts:
        return None
    return (
        parts[0]
        if len(parts) == 1
        else tuple(np.concatenate([p[i] for p in parts]) for i in range(4))
    )


def _decode_pos_shard(pdf: pd.DataFrame, lo: int, hi: int, n_docs: int, deleted):
    """Decode every positional slice of one (query, shard) into
    per-term (ids, tfs, dls, pos) quads restricted to [lo, hi).
    Returns (terms, per_term, quads), or None when any expected query
    term has no live postings inside the shard — a doc of the shard
    then cannot contain all terms, so the caller emits nothing (exact:
    doc ranges partition the docs, so every posting AND position of a
    doc lands in exactly this shard)."""
    n_expected = int(pdf["n_terms"].iloc[0])
    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return None
    per_term, quads = {}, {}
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
        }
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is None:
            return None  # term absent in shard -> no match in this shard
        quads[term] = quad
    return terms, per_term, quads


def _composed_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Composed (bool) evaluation for one (query, shard): the whole
    clause pipeline — MUST_NOT exclusion, MUST-phrase verification,
    SHOULD scoring — is doc-local, so it runs shard-exactly on the
    sliced streams: a doc's postings, positions, and negated-term
    postings all land in its shard, and per-term df/idf arrive
    globally via the broadcast stats column."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    spec = json.loads(pdf["qspec"].iloc[0])
    phrases = [list(p) for p in spec.get("phrases", []) if p]
    neg_phrases = [list(p) for p in spec.get("neg_phrases", []) if p]

    per_term, quads, neg, vonly = {}, {}, set(), set()
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        bst = float(rows["boost"].iloc[0]) if "boost" in rows.columns else 1.0
        per_term[term] = {
            "idf": bst * float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
        }
        if "clauses" in rows.columns:
            per_term[term]["clauses"] = json.loads(rows["clauses"].iloc[0] or "[]")
        nval = int(rows["neg"].iloc[0])
        if nval == 1:
            neg.add(term)
        elif nval == 2:
            vonly.add(term)
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is not None:
            quads[term] = quad
    sterms = sorted(t for t in quads if t not in neg and t not in vonly)
    if not sterms:
        return empty

    # MUST_NOT: shard-local exclusion is exact (a doc's neg-term
    # postings AND positions live in this shard) — negated-term ids and
    # positionally verified negated-phrase matches union into one
    # exclusion set; order vs. the kernel's progressive fold is
    # irrelevant because exclusion is a union
    flt = deleted if isinstance(deleted, DocSetFilter) else DocSetFilter(deleted, None)
    excl_parts = [quads[t][0] for t in sorted(neg) if t in quads]
    for p in neg_phrases:
        pterms = sorted(set(p))
        if any(t not in quads for t in pterms):
            continue  # phrase term absent in shard -> no match to exclude
        slots_n: dict[str, list[int]] = {}
        for j, t in enumerate(p):
            slots_n.setdefault(t, []).append(j)
        slot_list = sorted(
            (per_term[t]["df"], off, t) for t, offs in slots_n.items() for off in offs
        )
        matched = _verify_phrase(quads, slot_list)
        if matched.size:
            excl_parts.append(matched)
    if excl_parts:
        excl = np.unique(np.concatenate(excl_parts))
        tomb = excl if flt.deleted is None else np.union1d(flt.deleted, excl)
        nflt = DocSetFilter(tomb, flt.allowed)
        quads = {t: _alive_quad(quads[t], nflt) for t in sterms}
        quads = {t: q for t, q in quads.items() if q[0].size}
        sterms = sorted(quads)
        if not sterms:
            return empty

    # minimum_should_match: DISTINCT matched clauses per doc — exact
    # per shard because a doc's postings for EVERY clause term land in
    # its shard; counted on the shard-sliced id arrays (never dense)
    msm = int(spec.get("msm", 0))
    msm_eligible: np.ndarray | None = None
    if msm > 0:
        cl_map: dict[int, list[str]] = {}
        for t in sterms:
            for c in per_term[t].get("clauses", ()):
                cl_map.setdefault(int(c), []).append(t)
        per_clause = [
            np.unique(np.concatenate([quads[t][0] for t in ts_]))
            for ts_ in cl_map.values()
            if any(quads[t][0].size for t in ts_)
        ]
        if len(per_clause) < msm:
            return empty
        u, cnt = np.unique(np.concatenate(per_clause), return_counts=True)
        msm_eligible = u[cnt >= msm].astype(np.int64)
        if msm_eligible.size == 0:
            return empty

    # MUST phrases, intersected
    cand: np.ndarray | None = None
    for p in phrases:
        pterms = sorted(set(p))
        if any(t not in quads for t in pterms):
            return empty  # phrase term absent in shard -> no match here
        slots: dict[str, list[int]] = {}
        for j, t in enumerate(p):
            slots.setdefault(t, []).append(j)
        slot_list = sorted(
            (per_term[t]["df"], off, t) for t, offs in slots.items() for off in offs
        )
        matched = _verify_phrase(quads, slot_list)
        if matched.size == 0:
            return empty
        cand = matched if cand is None else np.intersect1d(cand, matched, assume_unique=True)
        if cand.size == 0:
            return empty

    if msm_eligible is not None:
        cand = (
            msm_eligible
            if cand is None
            else np.intersect1d(cand, msm_eligible, assume_unique=True)
        )
        if cand.size == 0:
            return empty
    decoded = {t: quads[t][:3] for t in sterms}
    doc, acc = _merge_accumulate(decoded, per_term, sterms, avgdl, k1, b, cand=cand)
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


def _phrase_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Phrase scoring for one (query, shard): decode every slice with
    positions, keep docs in [lo, hi), verify adjacency, fold, shard
    top-k.  Exact under the doc-range partition: every posting (and
    position) of a doc lands in its shard, and a term with no postings
    in the shard means no doc of the shard can contain the phrase."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    dec = _decode_pos_shard(pdf, lo, hi, n_docs, deleted)
    if dec is None:
        return empty
    terms, per_term, quads = dec
    slots_map = {t: [int(x) for x in pdf[pdf["term"] == t]["slots"].iloc[0]] for t in terms}
    slot_list = sorted(
        (per_term[t]["df"], off, t) for t in terms for off in slots_map[t]
    )
    matched = _verify_phrase(quads, slot_list)
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _proximity_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Proximity scoring for one (query, shard): decode every slice
    with positions, keep docs in [lo, hi), run the minimal-covering-
    window sweep, fold, shard top-k.  Shard-exact for the same reason
    as :func:`_phrase_shard`: the sweep is doc-local and a doc's
    positions all live in its shard."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    dec = _decode_pos_shard(pdf, lo, hi, n_docs, deleted)
    if dec is None:
        return empty
    terms, per_term, quads = dec
    matched = _min_window_matched(quads, terms, slop)
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _span_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Ordered-span scoring for one (query, shard): decode every slice
    with positions, keep docs in [lo, hi), run the ordered-chain
    verification, fold, shard top-k.  Shard-exact for the same reason
    as :func:`_phrase_shard` — the chain is doc-local and a doc's
    positions all live in its shard."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    first = int(pdf["first"].iloc[0]) if "first" in pdf.columns else 0
    cseq = [str(t) for t in json.loads(pdf["cseq"].iloc[0])]
    dec = _decode_pos_shard(pdf, lo, hi, n_docs, deleted)
    if dec is None:
        return empty
    terms, per_term, quads = dec
    keys_by_term = {}
    for t in terms:
        ids, tfs, _dls, pos = quads[t]
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    matched = _verify_span_ordered(
        _first_mask_keys([keys_by_term[t] for t in cseq], first), slop
    )
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _mpp_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """``match_phrase_prefix`` scoring for one (query, shard): decode
    every slice with positions, keep docs in [lo, hi), verify the fixed
    run + prefix-expansion alt slot, fold over the fixed terms, shard
    top-k.  Shard-exact like :func:`_phrase_shard` — a doc's postings
    and positions all land in its shard; a FIXED term with no live
    postings in the shard empties the shard, while expansion terms
    union (partial presence is fine)."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    n_fixed = int(pdf["n_fixed"].iloc[0])

    per_term, quads, slots_map, alt_terms = {}, {}, {}, []
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        slots_map[term] = [int(s) for s in rows["slots"].iloc[0]]
        is_alt = bool(int(rows["is_alt"].iloc[0]))
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is None:
            if slots_map[term]:
                return empty  # fixed term absent in shard -> no match here
            continue  # expansion term absent: contributes nothing
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
        }
        quads[term] = quad
        if is_alt:
            alt_terms.append(term)
    fixed_terms = sorted(t for t in quads if slots_map[t])
    if len(fixed_terms) < n_expected or not alt_terms:
        return empty
    slot_list = sorted(
        (per_term[t]["df"], off, t) for t in fixed_terms for off in slots_map[t]
    )
    start_keys = _phrase_surviving_keys(quads, slot_list)
    alt_keys = _alt_slot_keys_quads({t: quads[t] for t in alt_terms}, n_fixed)
    matched_keys = _intersect_sorted_i64(start_keys, alt_keys)
    if matched_keys.size == 0:
        return empty
    matched = np.unique(matched_keys >> PHRASE_POS_SHIFT)
    decoded = {t: quads[t][:3] for t in fixed_terms}
    doc, acc = _merge_accumulate(
        decoded, per_term, fixed_terms, avgdl, k1, b, cand=matched
    )
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


def _highlight_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """Highlight scoring for one (query, shard): decode every slice
    with positions, keep docs in [lo, hi), take the per-doc best-window
    argmin, fold, shard top-k.  Shard-exact for the same reason as
    :func:`_proximity_shard` — the window argmin is doc-local, so each
    selected doc's (win_start, win_end) is identical to the one-task
    plan's regardless of which shard computed it."""
    empty = pd.DataFrame(
        {
            "query_id": [], "rank": [], "doc_id": [], "score": [],
            "win_start": [], "win_end": [],
        }
    ).astype(
        {
            "query_id": "int64", "rank": "int32", "doc_id": "int64",
            "score": "float64", "win_start": "int64", "win_end": "int64",
        }
    )
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    dec = _decode_pos_shard(pdf, lo, hi, n_docs, deleted)
    if dec is None:
        return empty
    terms, per_term, quads = dec
    docs_w, ws, we = _best_window(quads, terms)
    if docs_w.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=docs_w)
    if doc.size == 0:
        return empty
    sel = _topk_select(doc, acc, k, tie_margin=tie_margin)
    sel_docs = doc[sel]
    widx = np.searchsorted(docs_w, sel_docs)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": sel_docs,
            "score": acc[sel],
            "win_start": ws[widx],
            "win_end": we[widx],
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


class DocBitmap:
    """Dense packed bitmap over the doc-id space — 1 bit/id instead of
    the sorted array's 8 B/id.  Large allowed sets (a tenant with 10^9
    docs) convert to this form (:meth:`QueryEngine._doc_filter`) and
    ship to executors through a Spark broadcast (one torrent-
    distributed copy per executor) instead of riding in every task
    closure: 10^10 dense ids = 1.25 GB of bits vs 80 GB of int64s."""

    __slots__ = ("bits", "n_ids", "n_set")

    #: dense-window size for chunked construction — 16M ids = a 16 MB
    #: bool temporary per window (multiple of 8, so windows byte-align)
    _BUILD_CHUNK = 1 << 24

    def __init__(self, ids: np.ndarray, max_id: int | None = None):
        mx = int(ids.max()) if max_id is None else max_id
        if ids.size > 1 and not np.all(ids[1:] >= ids[:-1]):
            ids = np.sort(ids)  # the _doc_filter contract is sorted; be safe
        # packbits window-by-window: the obvious one-shot packbits
        # needs a dense bool temporary of max_id+1 bytes — 8x the
        # packed bitmap, a multi-GB transient at the 10^9-10^10-id
        # scale this class exists for — while the windowed build's
        # transient is a fixed 16 MB regardless of id-space size
        bits = np.zeros((mx >> 3) + 1, dtype=np.uint8)
        ch = self._BUILD_CHUNK
        for lo in range(0, mx + 1, ch):
            hi = min(lo + ch, mx + 1)
            a = np.searchsorted(ids, lo)
            b = np.searchsorted(ids, hi)
            if a == b:
                continue
            dense = np.zeros(hi - lo, dtype=bool)
            dense[ids[a:b] - lo] = True
            w = np.packbits(dense, bitorder="little")
            bits[lo >> 3 : (lo >> 3) + w.size] = w
        self.bits = bits
        self.n_ids = mx + 1
        self.n_set = int(ids.size)

    @property
    def size(self) -> int:  # the emptiness contract DocSetFilter checks
        return self.n_set

    def contains(self, ids: np.ndarray) -> np.ndarray:
        out = np.zeros(ids.size, dtype=bool)
        ok = (ids >= 0) & (ids < self.n_ids)
        sel = ids[ok]
        out[ok] = (self.bits[sel >> 3] >> (sel & 7).astype(np.uint8)) & 1 > 0
        return out


class DocSetFilter:
    """Combined doc-id mask shipped to kernels in place of the plain
    tombstone array: ``deleted`` (sorted, exclude) plus an optional
    ``allowed`` set (sorted array or :class:`DocBitmap`, include-only)
    — the Lucene filter-bitset analogue for metadata-filtered search
    (tenant / source / language restrictions).  Masking happens at
    decode time, exactly like tombstones, so block upper bounds only
    get looser and every pruning theta (bootstrapped from
    already-masked partials) stays rank-safe for the FILTERED ranking.
    Corpus stats (df, n_docs, avgdl) stay global — the filter
    restricts the result set, not the scoring model.  Small sets ride
    in the task closure; sets >= ALLOWED_BITMAP_MIN become a
    broadcast DocBitmap."""

    __slots__ = ("deleted", "allowed")

    def __init__(self, deleted: np.ndarray | None, allowed):
        self.deleted = deleted if deleted is not None and deleted.size else None
        self.allowed = allowed

    def keep_mask(self, ids: np.ndarray) -> np.ndarray | None:
        """Bool keep-mask over ``ids`` (None == keep everything)."""
        keep = None
        if self.deleted is not None:
            pos = np.minimum(np.searchsorted(self.deleted, ids), self.deleted.size - 1)
            keep = self.deleted[pos] != ids
        if self.allowed is not None:
            if self.allowed.size == 0:
                return np.zeros(ids.size, dtype=bool)
            if isinstance(self.allowed, DocBitmap):
                inall = self.allowed.contains(ids)
            else:
                pos = np.minimum(
                    np.searchsorted(self.allowed, ids), self.allowed.size - 1
                )
                inall = self.allowed[pos] == ids
            keep = inall if keep is None else (keep & inall)
        return keep


def _unwrap_filter(flt):
    """Resolve a filter that may have been shipped as a Spark
    broadcast (QueryEngine._ship_filter) back to the filter object."""
    return flt.value if hasattr(flt, "value") else flt


def _keep_mask(ids: np.ndarray, flt) -> np.ndarray | None:
    """Keep-mask for ``flt`` being None, a sorted tombstone ndarray
    (the historical contract), or a :class:`DocSetFilter`."""
    if flt is None or ids.size == 0:
        return None
    if isinstance(flt, DocSetFilter):
        return flt.keep_mask(ids)
    if flt.size == 0:
        return None
    pos = np.minimum(np.searchsorted(flt, ids), flt.size - 1)
    return flt[pos] != ids


def _alive_triple(triple, deleted):
    """Drop masked doc ids from a decoded (ids, tfs, dls) triple.

    ``deleted`` is the engine's sorted tombstone array
    (operators/deletes.py) or a :class:`DocSetFilter` (tombstones +
    allowed set): one searchsorted pass each, O(n log d).  Block upper
    bounds computed BEFORE masking stay valid (they can only be
    looser), so pruning remains rank-safe."""
    keep = _keep_mask(triple[0], deleted)
    if keep is None or keep.all():
        return triple
    return triple[0][keep], triple[1][keep], triple[2][keep]


def _decode_term_runs(runs: list, block_mask_per_run: list | None, deleted=None):
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
        d, t, ln = _alive_triple(decode_masked(seg, mask), deleted)
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


#: disjunctions wider than this skip block-max pruning and decode
#: exhaustively: the pruner's survival pass is O(terms^2 · runs) in
#: range-max probes (every block bounds against every other term), so a
#: wide prefix/fuzzy expansion ("to*" -> thousands of terms) would spend
#: far more on bounds than the decodes they could skip — and with
#: thousands of terms matching most docs, pruning can't skip much
#: anyway.  Lucene's answer is the same: multi-term queries REWRITE out
#: of scored-boolean evaluation instead of running per-clause maxima.
MAX_PRUNE_TERMS = 64


def score_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    prune: bool = True,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
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
        if "boost" in rows.columns:  # composed clause boost rides idf
            idf *= float(rows["boost"].iloc[0])
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

    if prune and 1 < len(terms) <= MAX_PRUNE_TERMS:
        cand, decoded = _pruned_candidates(
            per_term, terms, k, avgdl, k1, b, stats, tie_margin=tie_margin, deleted=deleted
        )
        doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=cand)
    else:
        stats.blocks_decoded += stats.blocks_total
        decoded = {
            t: _decode_term_runs(per_term[t]["runs"], None, deleted=deleted) for t in terms
        }
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


def boolean_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    prune: bool = True,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """OR-of-positive-terms top-k EXCLUDING docs that contain any
    negated term (the boolean MUST_NOT clause).

    Exclusion folds into the doc mask: the negated terms' posting ids
    decode once (Lucene walks the same lists for its exclusion
    iterator) and join the tombstone side of a :class:`DocSetFilter`,
    then the standard pruned kernel scores the positive rows — masking
    at decode keeps block-max pruning rank-safe exactly as for
    tombstones.  Expects a ``neg`` (0/1) column on every row."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    pos_pdf = pdf[pdf["neg"] == 0]
    if pos_pdf.empty:
        return empty
    neg_pdf = pdf[pdf["neg"] != 0]
    flt = deleted
    if not neg_pdf.empty:
        excl_parts = []
        for term in neg_pdf["term"].unique():
            runs = [
                row_to_segment(r) for _, r in neg_pdf[neg_pdf["term"] == term].iterrows()
            ]
            ids, _, _ = _decode_term_runs(runs, None, deleted=None)
            if ids.size:
                excl_parts.append(ids)
        if excl_parts:
            excl = np.unique(np.concatenate(excl_parts))
            base = deleted if isinstance(deleted, DocSetFilter) else DocSetFilter(deleted, None)
            tomb = (
                excl
                if base.deleted is None
                else np.union1d(base.deleted, excl)
            )
            flt = DocSetFilter(tomb, base.allowed)
    return score_query_kernel(
        pos_pdf,
        k1,
        b,
        n_docs,
        avgdl,
        prune=prune,
        stats=stats,
        tie_margin=tie_margin,
        deleted=flt,
    )


def dis_max_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    prune: bool = True,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Lucene/ES ``dis_max`` top-k: each clause is a bag of terms scored
    as an independent BM25 disjunction; a doc's query score is its BEST
    clause score plus ``tie_breaker`` x the sum of its OTHER clause
    scores (DisjunctionMaxQuery semantics — the reference's users get
    this from ES, see /root/reference/README.md:8-11).

    Expects per-term ``clauses`` (JSON int list — the clause ids the
    term occurs in; a term may sit in several) and a per-query ``tie``
    column.  Each term decodes ONCE; its contributions re-fold per
    clause in ascending-term order (the oracle's pinned float64 fold),
    and clauses combine in ascending-clause order.  Decode is
    exhaustive like the wide-expansion path of
    :func:`score_query_kernel` (``prune`` accepted for signature
    parity): the max-combine makes per-term block maxima rank-safe
    only with a (1 + tie·(n_clauses−1)) slack, and Lucene likewise
    evaluates DisMax without per-clause block maxima when clauses
    share terms."""
    import json

    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    tie = float(pdf["tie"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    per_term: dict[str, dict] = {}
    decoded: dict[str, tuple] = {}
    clause_terms: dict[int, list[str]] = {}
    for term in terms:  # ascending — pinned order within each clause
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5)))
        }
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)
        decoded[term] = _decode_term_runs(runs, None, deleted=deleted)
        for cl in json.loads(rows["clauses"].iloc[0] or "[]"):
            if term not in clause_terms.setdefault(int(cl), []):
                clause_terms[int(cl)].append(term)
    stats.blocks_decoded += stats.blocks_total

    clause_docs: list[np.ndarray] = []
    clause_accs: list[np.ndarray] = []
    for cl in sorted(clause_terms):
        doc, acc = _merge_accumulate(
            decoded, per_term, sorted(clause_terms[cl]), avgdl, k1, b
        )
        if doc.size:
            clause_docs.append(doc)
            clause_accs.append(acc)
    if not clause_docs:
        return empty
    all_docs = np.unique(np.concatenate(clause_docs))
    total = np.zeros(all_docs.size, dtype=np.float64)
    best = np.zeros(all_docs.size, dtype=np.float64)
    for doc, acc in zip(clause_docs, clause_accs):  # ascending-clause fold
        idx = np.searchsorted(all_docs, doc)
        total[idx] += acc  # each doc appears once per clause -> plain add
        np.maximum.at(best, idx, acc)
    score = best + tie * (total - best)

    sel = _topk_select(all_docs, score, k, tie_margin=tie_margin)
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": all_docs[sel],
            "score": score[sel],
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
    deleted: np.ndarray | DocSetFilter | None = None,
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
    decoded = {rare: _decode_term_runs(per_term[rare]["runs"], None, deleted=deleted)}
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
                parts.append(_alive_triple(decode_masked(seg, mask), deleted))
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


#: composite (doc, start-position) key stride for phrase verification —
#: positions must stay below this (docs longer than 2^21 ≈ 2M tokens are
#: rejected at query time).  Keys fit int64 up to ~4·10^12 docs.
PHRASE_POS_SHIFT = 21
PHRASE_POS_STRIDE = 1 << PHRASE_POS_SHIFT
PHRASE_POS_MASK = PHRASE_POS_STRIDE - 1


def _alive_quad(quad, deleted):
    """Positional twin of :func:`_alive_triple`: drops masked docs AND
    their position entries (positions align with repeat(ids, tfs))."""
    ids, tfs, dls, pos = quad
    keep = _keep_mask(ids, deleted)
    if keep is None or keep.all():
        return quad
    return ids[keep], tfs[keep], dls[keep], pos[np.repeat(keep, tfs)]


def build_pos_entry(runs, deleted=None):
    """(ids int64, tfs int32, dls int32, SORTED composite keys int64)
    for one term from its segment runs — the ``_PosCache`` entry
    payload, shared by the serving fill path and the build-time
    artifact writer (``index_build.build_pos_cache``).  ``deleted``
    masks tombstoned docs (None at build time — fresh generations have
    no tombstones; the loader masks at read instead)."""
    from bilies_go_spark.operators.codec import decode_masked_pos

    parts = [_alive_quad(decode_masked_pos(seg, None), deleted) for seg in runs]
    parts = [p for p in parts if p[0].size]
    e = np.empty(0, dtype=np.int64)
    if not parts:
        quad = (e, e, e, e)
    elif len(parts) == 1:
        quad = parts[0]
    else:
        quad = tuple(np.concatenate([p[i] for p in parts]) for i in range(4))
    ids, tfs, dls, pos = quad
    if pos.size and int(pos.max()) >= PHRASE_POS_STRIDE:
        raise ValueError("document longer than 2^21 tokens — position key overflow")
    keys = (np.repeat(ids, tfs) << PHRASE_POS_SHIFT) + pos
    keys.sort(kind="stable")  # LSB radix for int64 — ~1.7x quicksort here
    return (
        ids.astype(np.int64, copy=False),
        tfs.astype(np.int32),
        dls.astype(np.int32),
        keys,
    )


def _merge_sorted_i64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Linear merge of two sorted int64 arrays (no re-sort): the
    artifact loader splices small decoded tier key streams into the
    big persisted base stream.  O(|a| + |b|) scatter plus two
    searchsorteds on the smaller side."""
    if not b.size:
        return a
    if not a.size:
        return b
    out = np.empty(a.size + b.size, dtype=np.int64)
    # equal keys cannot collide: a's elements count b-keys strictly
    # before them, b's count a-keys at-or-before
    out[np.arange(a.size) + np.searchsorted(b, a, side="left")] = a
    out[np.arange(b.size) + np.searchsorted(a, b, side="right")] = b
    return out


def _restrict_triple(triple, cand: np.ndarray):
    """Keep only candidate docs (sorted ``cand``) in a decoded
    (ids, tfs, dls) triple — the position-free sibling of
    :func:`_restrict_quad` for the serving cache (whose entries carry
    composite keys instead of raw positions)."""
    ids, tfs, dls = triple
    if ids.size == 0 or cand.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    pidx = np.minimum(np.searchsorted(cand, ids), cand.size - 1)
    keep = cand[pidx] == ids
    if keep.all():
        return triple
    return ids[keep], tfs[keep], dls[keep]


def _restrict_quad(quad, cand: np.ndarray):
    """Keep only candidate docs (sorted ``cand``) in a decoded
    (ids, tfs, dls, pos) quad."""
    ids, tfs, dls, pos = quad
    if ids.size == 0 or cand.size == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e
    pidx = np.minimum(np.searchsorted(cand, ids), cand.size - 1)
    keep = cand[pidx] == ids
    if keep.all():
        return quad
    return ids[keep], tfs[keep], dls[keep], pos[np.repeat(keep, tfs)]


def _positional_candidates(per_term, terms, stats, deleted):
    """Conjunctive candidate intersection with positions riding along.

    Decodes the rarest term fully, every other term only for
    candidate-bearing blocks (positions live in the same block-aligned
    slices), intersects doc ids rarest-first, then restricts every
    term's decoded quad to the surviving candidates.  Returns
    (sorted candidate doc ids, {term: (ids, tfs, dls, pos)}).
    Shared by the phrase and proximity kernels."""
    from bilies_go_spark.operators.codec import decode_masked_pos

    e = np.empty(0, dtype=np.int64)
    by_df = sorted(terms, key=lambda t: (per_term[t]["df"], t))
    rare = by_df[0]
    quads: dict[str, tuple] = {}
    parts = [
        _alive_quad(decode_masked_pos(seg, None), deleted)
        for seg in per_term[rare]["runs"]
    ]
    stats.blocks_decoded += sum(
        len(seg.block_last_doc_id) for seg in per_term[rare]["runs"]
    )
    parts = [p for p in parts if p[0].size]
    if not parts:
        return e, quads
    quads[rare] = (
        parts[0]
        if len(parts) == 1
        else tuple(np.concatenate([p[i] for p in parts]) for i in range(4))
    )
    cand = np.sort(quads[rare][0])
    for t in by_df[1:]:
        if cand.size == 0:
            return e, quads
        tparts = []
        for seg in per_term[t]["runs"]:
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                tparts.append(_alive_quad(decode_masked_pos(seg, mask), deleted))
                stats.blocks_decoded += int(mask.sum())
        tparts = [p for p in tparts if p[0].size]
        if not tparts:
            return e, quads
        quad = (
            tparts[0]
            if len(tparts) == 1
            else tuple(np.concatenate([p[i] for p in tparts]) for i in range(4))
        )
        quads[t] = quad
        ids_sorted = np.sort(quad[0])
        pidx = np.minimum(np.searchsorted(ids_sorted, cand), ids_sorted.size - 1)
        cand = cand[ids_sorted[pidx] == cand]
    if cand.size == 0:
        return e, quads
    for t in terms:
        quads[t] = _restrict_quad(quads[t], cand)
        if quads[t][3].size and int(quads[t][3].max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
    return cand, quads


def _phrase_surviving_keys(quads, slot_list) -> np.ndarray:
    """Sorted composite (doc·2^21 + start-position) keys at which the
    phrase's fixed slots all match: intersect per-slot shifted keys
    slot by slot.  ``slot_list`` is (sort-key, offset, term) tuples,
    cheapest-first; ``quads`` maps term -> (ids, tfs, dls, pos).  The
    running key set stays sorted (the first slot's keys are sorted and
    intersection preserves order)."""
    keys: np.ndarray | None = None
    e = np.empty(0, dtype=np.int64)
    for _, off, t in slot_list:
        ids, tfs, _dls, pos = quads[t]
        if pos.size and int(pos.max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
        doc_rep = np.repeat(ids, tfs)
        valid = pos >= off
        skeys = doc_rep[valid] * PHRASE_POS_STRIDE + (pos[valid] - off)
        skeys.sort()
        if keys is None:
            keys = skeys
        else:
            if skeys.size == 0:
                return e
            pidx = np.minimum(np.searchsorted(skeys, keys), skeys.size - 1)
            keys = keys[skeys[pidx] == keys]
        if keys.size == 0:
            return e
    return keys if keys is not None else e


def _verify_phrase(quads, slot_list) -> np.ndarray:
    """Docs whose token stream contains the phrase — unique doc ids of
    :func:`_phrase_surviving_keys`."""
    keys = _phrase_surviving_keys(quads, slot_list)
    if keys.size == 0:
        return keys
    return np.unique(keys // PHRASE_POS_STRIDE)


def _intersect_sorted_i64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elements of sorted ``a`` also present in sorted ``b`` (the
    searchsorted membership gate used throughout the kernels).

    Both inputs must be unique-valued (every caller passes per-term
    composite keys or np.unique'd unions), so intersection is
    symmetric — probe with the SMALLER side: fewer binary searches on
    the hot stopword pairs (e.g. the 14M-key 'the' against the 7M-key
    'of' runs 7M lookups, not 14M)."""
    if a.size == 0 or b.size == 0:
        return np.empty(0, dtype=np.int64)
    if a.size > b.size:
        a, b = b, a
    pidx = np.minimum(np.searchsorted(b, a), b.size - 1)
    return a[b[pidx] == a]


def _alt_slot_keys_quads(alt_quads: dict, off: int) -> np.ndarray:
    """Sorted-unique composite start keys contributed by the expansion
    (alternative) terms of a ``match_phrase_prefix`` query: any doc
    position p >= off holding ANY expansion term admits phrase start
    p - off.  ``alt_quads`` maps term -> (ids, tfs, dls, pos)."""
    parts = []
    for _t, (ids, tfs, _dls, pos) in sorted(alt_quads.items()):
        if pos.size and int(pos.max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
        doc_rep = np.repeat(ids, tfs)
        valid = pos >= off
        parts.append(doc_rep[valid] * PHRASE_POS_STRIDE + (pos[valid] - off))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def _alt_slot_keys_cached(keys_by_term: dict, alt_terms: list, off: int) -> np.ndarray:
    """:func:`_alt_slot_keys_quads` over PRE-SORTED composite key
    arrays (the serving-cache twin): mask positions < off, shift, and
    union — each per-term array stays sorted under the mask/shift, so
    the union is one concat + unique."""
    parts = []
    for t in alt_terms:
        kt = keys_by_term[t]
        parts.append((kt[(kt & PHRASE_POS_MASK) >= off] - off) if off else kt)
    parts = [p for p in parts if p.size]
    if not parts:
        return np.empty(0, dtype=np.int64)
    if len(parts) == 1:
        return parts[0]
    return np.unique(np.concatenate(parts))


def phrase_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Exact phrase top-k over a POSITIONAL index: docs containing the
    query tokens as a contiguous run (in token space), BM25-scored over
    the phrase's distinct terms with the same pinned fold as every
    other kernel.

    Plan: conjunctive candidate intersection first (rarest term decodes
    fully, the rest decode only candidate-bearing blocks — positions
    ride along in the same block slices), then adjacency verification:
    for phrase slot j holding term t, the doc's admissible START
    positions are ``P_t − j``; the phrase matches where the
    intersection over slots is non-empty.  Slots intersect as composite
    ``doc * 2^21 + start`` int64 keys, rarest term first, so the
    running set only shrinks.  Repeated terms ("table table") are one
    decoded term with multiple slots.  Cost beyond the conjunctive
    kernel is O(candidate positions) — never O(Σ positions).

    Expects ``n_terms`` (distinct-term count) and ``slots`` (per-term
    int list of 0-based phrase offsets) columns on every row.
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
        return empty  # some phrase term matches no document
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "phrase query requires an index built with BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
            "slots": [int(s) for s in rows["slots"].iloc[0]],
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)

    cand, quads = _positional_candidates(per_term, terms, stats, deleted)
    if cand.size == 0:
        return empty

    # 2. adjacency verification over candidate docs only
    slot_list = sorted(
        (per_term[t]["df"], off, t) for t in terms for off in per_term[t]["slots"]
    )  # rarest term's slots first — running set shrinks fastest
    matched = _verify_phrase(quads, slot_list)
    if matched.size == 0:
        return empty

    # 3. BM25 over the phrase's distinct terms, matched docs only
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def match_phrase_prefix_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """ES ``match_phrase_prefix`` top-k over a POSITIONAL index: docs
    containing the query's FIXED tokens as a contiguous run immediately
    followed by a token that starts with the final (prefix) token —
    i.e. the last phrase slot matches ANY dictionary expansion of the
    prefix.  Scored as BM25 over the fixed distinct terms (the
    deterministic exact-scoring choice — ES's blended expansion idf is
    rewrite-dependent; documented divergence, oracle-matched).

    Plan: conjunctive candidates over the FIXED terms only (rarest
    decodes fully, the rest masked to candidate blocks), expansion
    terms decode masked to the surviving candidates' blocks, then the
    alt slot intersects as a UNION of shifted composite keys against
    the fixed slots' surviving start keys.  Cost beyond the phrase
    kernel is O(candidate-local expansion occurrences) — a hot
    expansion never decodes outside the fixed candidates' blocks.

    Expects ``n_terms`` (distinct FIXED-term count), ``n_fixed`` (the
    prefix slot offset = phrase length - 1), ``slots`` (per-term fixed
    offsets; empty for pure expansion terms) and ``is_alt`` columns.
    """
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    n_fixed = int(pdf["n_fixed"].iloc[0])
    stats = stats if stats is not None else KernelStats()
    from bilies_go_spark.operators.codec import decode_masked_pos

    per_term: dict[str, dict] = {}
    slots_map: dict[str, list[int]] = {}
    alt_terms: list[str] = []
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "match_phrase_prefix needs an index built with "
                "BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        slots_map[term] = [int(s) for s in rows["slots"].iloc[0]]
        if int(rows["is_alt"].iloc[0]):
            alt_terms.append(term)
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)
    fixed_terms = sorted(t for t in per_term if slots_map[t])
    if len(fixed_terms) < n_expected or not alt_terms:
        return empty  # a fixed term matches no doc / prefix matches no term

    cand, quads = _positional_candidates(
        {t: per_term[t] for t in fixed_terms}, fixed_terms, stats, deleted
    )
    if cand.size == 0:
        return empty

    # expansion terms: decode only candidate-bearing blocks, restrict
    # to candidates (union semantics — a term absent near candidates
    # simply contributes no start keys)
    alt_quads: dict[str, tuple] = {}
    for t in alt_terms:
        tparts = []
        for seg in per_term[t]["runs"]:
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                tparts.append(_alive_quad(decode_masked_pos(seg, mask), deleted))
                stats.blocks_decoded += int(mask.sum())
        tparts = [p for p in tparts if p[0].size]
        if not tparts:
            continue
        quad = (
            tparts[0]
            if len(tparts) == 1
            else tuple(np.concatenate([p[i] for p in tparts]) for i in range(4))
        )
        alt_quads[t] = _restrict_quad(quad, cand)
    if not alt_quads:
        return empty

    slot_list = sorted(
        (per_term[t]["df"], off, t) for t in fixed_terms for off in slots_map[t]
    )
    start_keys = _phrase_surviving_keys(quads, slot_list)
    alt_keys = _alt_slot_keys_quads(alt_quads, n_fixed)
    matched_keys = _intersect_sorted_i64(start_keys, alt_keys)
    if matched_keys.size == 0:
        return empty
    matched = np.unique(matched_keys >> PHRASE_POS_SHIFT)

    decoded = {t: quads[t][:3] for t in fixed_terms}
    doc, acc = _merge_accumulate(
        decoded, per_term, fixed_terms, avgdl, k1, b, cand=matched
    )
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


def _bigram_pair_counts(
    keys_by_term: dict, cand1: list, cand2: list
) -> "dict[tuple[str, str], int]":
    """Distinct-doc adjacency counts for every candidate pair: the
    number of docs where some occurrence of ``a`` is IMMEDIATELY
    followed by an occurrence of ``b``, computed as a sorted-key
    intersection of ``a``'s composite keys shifted +1 against ``b``'s.
    Each term's key array is built once and reused across all its
    pairs (the phrase-suggester hot loop is O(pairs · log occ), never
    a re-decode per pair).  Keys whose position is the stride maximum
    are masked before the +1 shift so a shift can never bleed into the
    next doc's position 0."""
    out: dict[tuple[str, str], int] = {}
    shifted: dict[str, np.ndarray] = {}
    for a in cand1:
        ka = keys_by_term.get(a)
        if ka is None or ka.size == 0:
            continue
        if a not in shifted:
            shifted[a] = ka[(ka & PHRASE_POS_MASK) < PHRASE_POS_MASK] + 1
        ka1 = shifted[a]
        for b in cand2:
            kb = keys_by_term.get(b)
            if kb is None or kb.size == 0:
                continue
            inter = _intersect_sorted_i64(ka1, kb)
            if inter.size:
                docs = inter >> PHRASE_POS_SHIFT
                out[(a, b)] = int(
                    np.count_nonzero(np.concatenate([[True], docs[1:] != docs[:-1]]))
                )
    return out


def _suggest_bigram_kernel(pdf: pd.DataFrame, deleted=None) -> pd.DataFrame:
    """Per-query phrase-suggester task: decode every candidate term
    ONCE into sorted composite keys, then count adjacency docs for
    every (first-slot, second-slot) candidate pair.  Expects ``role``
    (bitmask: 1 = first-slot candidate, 2 = second-slot) on every
    row.  ``deleted`` masks engine-pinned tombstones so adjacency
    counts never include deleted docs (parity with mode='local',
    whose cached keys bake tombstones in)."""
    empty = pd.DataFrame(
        {"query_id": [], "c1": [], "c2": [], "n_docs": []}
    ).astype({"query_id": "int64", "c1": "str", "c2": "str", "n_docs": "int64"})
    if pdf.empty:
        return empty
    from bilies_go_spark.operators.codec import decode_masked_pos

    qid = int(pdf["query_id"].iloc[0])
    keys_by_term: dict[str, np.ndarray] = {}
    cand1, cand2 = [], []
    for term, rows in pdf.groupby("term", sort=True):
        role = int(rows["role"].iloc[0])
        parts = []
        for _, r in rows.iterrows():
            seg = row_to_segment(r)
            ids, tfs, _dls, pos = _alive_quad(
                decode_masked_pos(seg, None), deleted
            )
            if ids.size:
                parts.append(np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos)
        if parts:
            kt = np.concatenate(parts) if len(parts) > 1 else parts[0]
            kt.sort()
            keys_by_term[term] = kt
        if role & 1:
            cand1.append(term)
        if role & 2:
            cand2.append(term)
    counts = _bigram_pair_counts(keys_by_term, sorted(cand1), sorted(cand2))
    if not counts:
        return empty
    rows = [(qid, a, b, n) for (a, b), n in sorted(counts.items())]
    return pd.DataFrame(rows, columns=["query_id", "c1", "c2", "n_docs"]).astype(
        {"query_id": "int64", "n_docs": "int64"}
    )


def _suggest_bigram_shard(
    pdf: pd.DataFrame, lo: int, hi: int, deleted=None
) -> pd.DataFrame:
    """Doc-range-sharded phrase-suggester twin: adjacency counts over
    one shard's byte slices.  Shard-exact AND additive — a doc's
    occurrences all land in its shard, so per-shard distinct-doc
    counts sum to the global count.  ``deleted`` masks tombstones
    (parity with the other two paths)."""
    empty = pd.DataFrame(
        {"query_id": [], "c1": [], "c2": [], "n_docs": []}
    ).astype({"query_id": "int64", "c1": "str", "c2": "str", "n_docs": "int64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    keys_by_term: dict[str, np.ndarray] = {}
    cand1, cand2 = [], []
    for term, rows in pdf.groupby("term", sort=True):
        role = int(rows["role"].iloc[0])
        if role & 1:
            cand1.append(term)
        if role & 2:
            cand2.append(term)
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is None:
            continue
        ids, tfs, _dls, pos = quad
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[term] = kt
    counts = _bigram_pair_counts(keys_by_term, sorted(cand1), sorted(cand2))
    if not counts:
        return empty
    rows = [(qid, a, b, n) for (a, b), n in sorted(counts.items())]
    return pd.DataFrame(rows, columns=["query_id", "c1", "c2", "n_docs"]).astype(
        {"query_id": "int64", "n_docs": "int64"}
    )


def _first_mask_keys(keys_list: "list[np.ndarray]", first: int) -> "list[np.ndarray]":
    """Apply the ``span_first`` end-limit — the Lucene ``end`` param:
    the whole match must lie within the doc's first ``first`` tokens,
    i.e. every occupied (0-based) position < ``first`` (span end
    exclusive ≤ ``first``; chain positions strictly increase, so
    bounding every clause equals bounding the last).  ``first <= 0``
    means unlimited.  The boolean compare preserves sort order."""
    if first <= 0:
        return keys_list
    return [kt[(kt & PHRASE_POS_MASK) < first] for kt in keys_list]


def _verify_span_ordered(keys_list: "list[np.ndarray]", slop: int) -> np.ndarray:
    """Docs containing an IN-ORDER occurrence chain of the clause terms
    (Lucene ``span_near(in_order=true)``): positions p1 < p2 < ... < pn,
    one per clause in clause order, with ``(pn - p1 + 1) - n <= slop``.

    ``keys_list`` is one pre-sorted composite (doc·2^21 + pos) int64
    key array PER CLAUSE, in clause order (duplicate clauses repeat the
    term's array; strict < makes the chain use distinct occurrences).

    Vectorized left-to-right DP over the sorted keys: for every
    occurrence q of clause i+1, its best predecessor is the LATEST
    clause-i chain end < q in the same doc (one searchsorted), carrying
    the maximal feasible chain start.  Exact because the carried start
    is monotone non-decreasing along a doc's chain ends (induction:
    start_1(p) = p is monotone; start_{i}(q) is a running prefix-max of
    a monotone sequence), so the latest predecessor always carries the
    doc's maximal start — the minimal window per end."""
    e = np.empty(0, dtype=np.int64)
    n = len(keys_list)
    cur = keys_list[0]
    if cur.size == 0:
        return e
    start = cur & PHRASE_POS_MASK
    for kb in keys_list[1:]:
        if kb.size == 0 or cur.size == 0:
            return e
        idx = np.searchsorted(cur, kb) - 1  # latest chain end < q
        pred_ok = idx >= 0
        safe = np.maximum(idx, 0)
        same = pred_ok & ((cur[safe] >> PHRASE_POS_SHIFT) == (kb >> PHRASE_POS_SHIFT))
        cur, start = kb[same], start[safe][same]  # kb ascending -> sorted
    if cur.size == 0:
        return e
    hit = (cur & PHRASE_POS_MASK) - start + 1 - n <= slop
    if not hit.any():
        return e
    d = (cur >> PHRASE_POS_SHIFT)[hit]
    return d[np.concatenate([[True], d[1:] != d[:-1]])]


def span_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Ordered span top-k (ES/Lucene ``span_near(in_order=true)``) over
    a POSITIONAL index: docs containing the clause terms at strictly
    increasing positions in clause order within ``slop`` total gap,
    BM25-scored over the distinct clause terms (pinned fold).

    Plan mirrors :func:`phrase_query_kernel`: conjunctive candidate
    intersection (rarest term full, others candidate-bearing blocks
    only), then the vectorized ordered-chain verification
    (:func:`_verify_span_ordered`) on candidate occurrences — cost
    beyond the conjunctive kernel is O(candidate positions).

    Expects constant ``slop`` and ``cseq`` (JSON list of clause terms
    in order) plus ``n_terms`` (distinct-term count) columns."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    first = int(pdf["first"].iloc[0]) if "first" in pdf.columns else 0
    cseq = [str(t) for t in json.loads(pdf["cseq"].iloc[0])]
    n_expected = int(pdf["n_terms"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return empty  # some clause term matches no document
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "span queries require an index built with BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)

    cand, quads = _positional_candidates(per_term, terms, stats, deleted)
    if cand.size == 0:
        return empty
    keys_by_term = {}
    for t in terms:
        ids, tfs, _dls, pos = quads[t]
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    matched = _verify_span_ordered(
        _first_mask_keys([keys_by_term[t] for t in cseq], first), slop
    )
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _phrase_surviving_keys_cached(keys_by_term: dict, slot_list) -> np.ndarray:
    """Sorted composite start keys at which every fixed slot matches,
    over PRE-SORTED composite (doc·2^21 + pos) key arrays — the
    serving-cache twin of :func:`_phrase_surviving_keys`.  Slot offset
    j shifts a term's keys by -j after dropping positions < j; the
    boolean mask preserves sort order, so no per-query sort (the
    cached arrays are sorted once at fill)."""
    keys: np.ndarray | None = None
    e = np.empty(0, dtype=np.int64)
    for _, off, t in slot_list:
        kt = keys_by_term[t]
        skeys = kt if off == 0 else (kt[(kt & PHRASE_POS_MASK) >= off] - off)
        if keys is None:
            keys = skeys
        else:
            if skeys.size == 0:
                return e
            pidx = np.minimum(np.searchsorted(skeys, keys), skeys.size - 1)
            keys = keys[skeys[pidx] == keys]
        if keys.size == 0:
            return e
    return keys if keys is not None else e


def _verify_phrase_keys(keys_by_term: dict, slot_list) -> np.ndarray:
    """Phrase verification over PRE-SORTED composite key arrays —
    unique doc ids of :func:`_phrase_surviving_keys_cached`."""
    keys = _phrase_surviving_keys_cached(keys_by_term, slot_list)
    if keys.size == 0:
        return keys
    docs = keys >> PHRASE_POS_SHIFT  # keys stayed sorted -> docs sorted
    return docs[np.concatenate([[True], docs[1:] != docs[:-1]])]


def _min_window_from_keys(keys_by_term: dict, slop: int) -> np.ndarray:
    """Minimal-covering-window sweep over pre-sorted composite key
    arrays (see :func:`_min_window_matched` for the algorithm).

    The anchor set is the union of the per-term key arrays, but it is
    never materialized in merged order (random scatter/gather on a
    union-sized array was measured 3-4x slower than everything else
    combined): anchors are swept PER SOURCE TERM — for term i's
    occurrences, each other term's latest-occurrence-<=-anchor comes
    from one sequential searchsorted into its sorted keys — and the
    per-term hit-doc sets union at the end.  The composite split uses
    shift/mask (the stride is 2^21)."""
    e = np.empty(0, dtype=np.int64)
    arrs = list(keys_by_term.values())
    if len(arrs) == 1:
        # degenerate single-term query: any occurrence is a zero-span
        # window, so the match set is just the term's docs — skip the
        # sweep (and its occurrence-sized temporaries) entirely
        ka = arrs[0]
        if ka.size == 0:
            return e
        d = ka >> PHRASE_POS_SHIFT
        return d[np.concatenate([[True], d[1:] != d[:-1]])]
    matched_parts = []
    for i, ka in enumerate(arrs):
        if ka.size == 0:
            return e
        a_doc = ka >> PHRASE_POS_SHIFT
        a_pos = ka & PHRASE_POS_MASK
        ok = np.ones(ka.size, dtype=bool)
        win = a_pos.copy()  # anchor's own term trivially <= a
        for j, kb in enumerate(arrs):
            if j == i:
                continue
            # keys are globally unique ((doc, pos) slots), so 'left'
            # and 'right' agree: idx = latest kb occurrence <= anchor
            idx = np.searchsorted(kb, ka) - 1
            valid = idx >= 0
            pred = kb[np.maximum(idx, 0)]
            same = valid & ((pred >> PHRASE_POS_SHIFT) == a_doc)
            ok &= same
            win = np.minimum(win, np.where(same, pred & PHRASE_POS_MASK, 0))
        hit = ok & (a_pos - win <= slop)
        if hit.any():
            d = a_doc[hit]  # ka ascends -> docs ascend
            matched_parts.append(d[np.concatenate([[True], d[1:] != d[:-1]])])
    if not matched_parts:
        return e
    if len(matched_parts) == 1:
        return matched_parts[0]
    from functools import reduce

    return reduce(np.union1d, matched_parts)


def _min_window_matched(quads: dict, terms: list[str], slop: int) -> np.ndarray:
    """Docs where ALL ``terms`` co-occur within a token window of span
    <= ``slop``: the vectorized minimal-covering-window sweep.  With
    per-term sorted (doc·2^21 + pos) key arrays, every term occurrence
    is an anchor; for anchor key a, each term's latest occurrence <= a
    in the same doc (one searchsorted per term) gives the minimal
    window ending at a — the doc matches iff some anchor's window span
    is <= slop.  Exact because the right edge of a minimal covering
    window is itself a term occurrence.  Shared by the per-query
    proximity kernel and the doc-range-sharded plan (the sweep is
    doc-local, so shard-exactness is free)."""
    keys_by_term = {}
    for t in terms:
        ids, tfs, _dls, pos = quads[t]
        if pos.size and int(pos.max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    return _min_window_from_keys(keys_by_term, slop)


def _best_window(quads: dict, terms: list[str]):
    """Per-doc BEST minimal covering window over all ``terms``:
    ``(docs, win_start, win_end)`` for every doc containing every term,
    where ``[win_start, win_end]`` (0-based token positions, inclusive)
    is the smallest-span window covering one occurrence of each term;
    equal spans tie-break to the leftmost (smallest ``win_end``).

    Same anchor sweep as :func:`_min_window_matched` — every term
    occurrence is an anchor, each term's latest occurrence <= anchor
    comes from one searchsorted — but keeping the per-doc argmin
    instead of testing a slop bound.  The highlight/snippet primitive."""
    e = np.empty(0, dtype=np.int64)
    keys_by_term = {}
    for t in terms:
        ids, tfs, _dls, pos = quads[t]
        if pos.size and int(pos.max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    arrs = list(keys_by_term.values())
    if any(a.size == 0 for a in arrs):
        return e, e, e
    anchors = np.concatenate(arrs)
    anchors.sort()
    a_doc = anchors >> PHRASE_POS_SHIFT
    a_pos = anchors & PHRASE_POS_MASK
    ok = np.ones(anchors.size, dtype=bool)
    win = a_pos.copy()  # anchor's own term trivially <= a
    for kt in arrs:
        # side='right': an anchor drawn from THIS term's array must
        # find itself as its own latest occurrence
        idx = np.searchsorted(kt, anchors, side="right") - 1
        valid = idx >= 0
        pred = kt[np.maximum(idx, 0)]
        same = valid & ((pred >> PHRASE_POS_SHIFT) == a_doc)
        ok &= same
        win = np.minimum(win, np.where(same, pred & PHRASE_POS_MASK, 0))
    if not ok.any():
        return e, e, e
    d, s, en = a_doc[ok], win[ok], a_pos[ok]
    order = np.lexsort((en, en - s, d))  # per doc: min span, then leftmost
    d, s, en = d[order], s[order], en[order]
    first = np.concatenate([[True], d[1:] != d[:-1]])
    return d[first], s[first], en[first]


HIGHLIGHT_SCHEMA = (
    "query_id bigint, rank int, doc_id bigint, score double, "
    "win_start bigint, win_end bigint"
)


from pyspark.sql import types as _T

_WIN_OFF_TYPE = _T.StructType(
    [
        _T.StructField("char_start", _T.LongType()),
        _T.StructField("char_end", _T.LongType()),
        _T.StructField("fragment_em", _T.StringType()),
    ]
)


# schema passed as a DataType object, NOT a DDL string: DDL parsing at
# decoration time needs an active SparkSession, which import must not
@F.pandas_udf(_WIN_OFF_TYPE)
def _win_char_offsets(
    text: pd.Series, win_start: pd.Series, win_end: pd.Series, terms: pd.Series
) -> pd.DataFrame:
    """Token window -> char span in the ORIGINAL text (0-based,
    end-exclusive) plus the ES-style ``<em>``-tagged fragment (every
    window token whose analyzed form is a query term wrapped, raw
    separators preserved), Arrow-batched.  Runs only on the
    broadcast-joined top-k rows (k·|queries| per batch), never the full
    docs scan — token spans are ``[a-z0-9]+`` match offsets on the
    lowercased text (length-preserving), the same arithmetic as
    :func:`bilies_go_spark.functions.tokenize.token_offsets_py` and the
    DuckDB oracle's cumulative-separator reconstruction."""
    import re

    pat = re.compile("[a-z0-9]+")
    cs = np.empty(len(text), dtype=np.int64)
    ce = np.empty(len(text), dtype=np.int64)
    frag = []
    ws = win_start.to_numpy(np.int64)
    we = win_end.to_numpy(np.int64)
    for i, t in enumerate(text):
        t = t or ""
        low = t.lower()
        spans = [(m.start(), m.end()) for m in pat.finditer(low)]
        if ws[i] >= len(spans) or we[i] >= len(spans):
            cs[i], ce[i] = 0, 0
            frag.append("")
            continue
        cs[i] = spans[ws[i]][0]
        ce[i] = spans[we[i]][1]
        tv = terms.iloc[i]  # arrives as np.ndarray via Arrow
        tset = set() if tv is None else set(tv)
        parts = []
        prev = spans[ws[i]][0]
        for j in range(ws[i], we[i] + 1):
            a, z = spans[j]
            parts.append(t[prev:a])  # raw separator ('' for the first)
            tok = t[a:z]
            parts.append(f"<em>{tok}</em>" if low[a:z] in tset else tok)
            prev = z
        frag.append("".join(parts))
    return pd.DataFrame({"char_start": cs, "char_end": ce, "fragment_em": frag})


def highlight_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Conjunctive (AND) top-k with highlight windows over a POSITIONAL
    index — the ES/Lucene highlighter surface: for each of the query's
    top-k matches, the minimal token window covering one occurrence of
    every query term ([win_start, win_end], 0-based inclusive; equal
    spans tie-break leftmost).

    Candidate generation and scoring are exactly the conjunctive
    pipeline (rarest-term candidates, O(df_min)); the window argmin is
    :func:`_best_window` over the candidate quads — cost bounded by
    candidate positions, never full posting lists.  Expects an
    ``n_terms`` column."""
    empty = pd.DataFrame(
        {
            "query_id": [], "rank": [], "doc_id": [], "score": [],
            "win_start": [], "win_end": [],
        }
    ).astype(
        {
            "query_id": "int64", "rank": "int32", "doc_id": "int64",
            "score": "float64", "win_start": "int64", "win_end": "int64",
        }
    )
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return empty
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "highlight query requires an index built with BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)

    cand, quads = _positional_candidates(per_term, terms, stats, deleted)
    if cand.size == 0:
        return empty
    docs_w, ws, we = _best_window(quads, terms)
    if docs_w.size == 0:
        return empty

    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=docs_w)
    if doc.size == 0:
        return empty
    sel = _topk_select(doc, acc, k, tie_margin=tie_margin)
    sel_docs = doc[sel]
    widx = np.searchsorted(docs_w, sel_docs)  # docs_w ascends by construction
    return pd.DataFrame(
        {
            "query_id": np.full(sel.size, qid, dtype=np.int64),
            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
            "doc_id": sel_docs,
            "score": acc[sel],
            "win_start": ws[widx],
            "win_end": we[widx],
        }
    )


def _clause_union_keys(keys_by_term: dict, clause: list) -> np.ndarray:
    """Sorted composite-key union of one span_or clause's alternative
    terms.  Keys are (doc, pos) slots, so arrays from distinct terms
    are disjoint — a concat + sort IS the union."""
    parts = [keys_by_term[t] for t in clause if t in keys_by_term]
    parts = [p for p in parts if p.size]
    if not parts:
        return np.empty(0, dtype=np.int64)
    if len(parts) == 1:
        return parts[0]
    out = np.concatenate(parts)
    out.sort()
    return out


def span_or_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Ordered span top-k with per-clause ALTERNATION — Lucene
    ``span_near(in_order=true)`` over ``span_or`` clauses: clause i
    matches any of its alternative terms, and the clauses must occur
    at strictly increasing positions in clause order within ``slop``
    total gap.  The chain DP (:func:`_verify_span_ordered`) is
    alternation-agnostic — it runs unchanged over per-clause KEY
    UNIONS.  BM25-scored over the distinct clause terms the doc
    contains (pinned fold, same rule as the span oracle's per-term
    joins).

    Candidates: per-clause doc-id UNIONS intersect across clauses
    (cheapest clause first — decoded fully; later clauses decode only
    candidate-bearing blocks).  A clause whose every alternative is
    vocabulary-absent empties the query; an absent alternative inside
    a surviving clause is fine.

    Expects constant ``slop``, ``first`` and ``cseq`` (JSON list of
    clause LISTS) columns."""
    from bilies_go_spark.operators.codec import decode_masked_pos

    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    first = int(pdf["first"].iloc[0]) if "first" in pdf.columns else 0
    clauses = [[str(t) for t in cl] for cl in json.loads(pdf["cseq"].iloc[0])]
    stats = stats if stats is not None else KernelStats()

    per_term: dict[str, dict] = {}
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "span queries require an index built with BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)

    cl_terms = [[t for t in cl if t in per_term] for cl in clauses]
    if any(not ct for ct in cl_terms):
        return empty  # a clause with no vocabulary alternative
    order = sorted(
        range(len(cl_terms)), key=lambda i: sum(per_term[t]["df"] for t in cl_terms[i])
    )
    quads: dict[str, tuple] = {}
    cand: np.ndarray | None = None
    for ci in order:
        for t in cl_terms[ci]:
            if t in quads:
                continue
            tparts = []
            for seg in per_term[t]["runs"]:
                mask = (
                    None if cand is None else _seg_blocks_with_candidates(seg, cand)
                )
                if mask is None or mask.any():
                    tparts.append(_alive_quad(decode_masked_pos(seg, mask), deleted))
                    stats.blocks_decoded += (
                        len(seg.block_last_doc_id) if mask is None else int(mask.sum())
                    )
            tparts = [p for p in tparts if p[0].size]
            if tparts:
                quads[t] = (
                    tparts[0]
                    if len(tparts) == 1
                    else tuple(np.concatenate([p[i] for p in tparts]) for i in range(4))
                )
        docs_u = [quads[t][0] for t in cl_terms[ci] if t in quads]
        if not docs_u:
            return empty
        u = np.unique(np.concatenate(docs_u)) if len(docs_u) > 1 else np.sort(docs_u[0])
        cand = u if cand is None else _intersect_sorted_i64(cand, u)
        if cand.size == 0:
            return empty
    for t in list(quads):
        quads[t] = _restrict_quad(quads[t], cand)
        if quads[t][3].size and int(quads[t][3].max()) >= PHRASE_POS_STRIDE:
            raise ValueError("document longer than 2^21 tokens — position key overflow")
    keys_by_term = {}
    for t, (ids, tfs, _dls, pos) in quads.items():
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    keys_cl = [_clause_union_keys(keys_by_term, cl) for cl in cl_terms]
    matched = _verify_span_ordered(_first_mask_keys(keys_cl, first), slop)
    if matched.size == 0:
        return empty
    terms = sorted(t for t in quads if quads[t][0].size)
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _span_or_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """span_or scoring for one (query, shard): decode every slice with
    positions, keep docs in [lo, hi), per-clause key unions, chain
    verification, fold, shard top-k.  Shard-exact like
    :func:`_span_shard`; a CLAUSE with no live alternative in the
    shard empties the shard (no doc there can complete the chain),
    while an absent single alternative is fine."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    first = int(pdf["first"].iloc[0]) if "first" in pdf.columns else 0
    clauses = [[str(t) for t in cl] for cl in json.loads(pdf["cseq"].iloc[0])]
    per_term, quads = {}, {}
    for term, rows in pdf.groupby("term", sort=True):
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
        }
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is not None:
            quads[term] = quad
    keys_by_term = {}
    for t, (ids, tfs, _dls, pos) in quads.items():
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    keys_cl = []
    for cl in clauses:
        u = _clause_union_keys(keys_by_term, cl)
        if u.size == 0:
            return empty
        keys_cl.append(u)
    matched = _verify_span_ordered(_first_mask_keys(keys_cl, first), slop)
    if matched.size == 0:
        return empty
    terms = sorted(quads)
    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def _span_not_matched(
    keys1: np.ndarray, keys2: np.ndarray, keysx: np.ndarray, slop: int
) -> np.ndarray:
    """Docs containing a CLEAN ordered pair (Lucene ``span_not``):
    positions p1 < p2 of the two include clauses with
    ``(p2 - p1 + 1) - 2 <= slop`` and NO exclude occurrence x with
    ``p1 <= x <= p2``.  All three arrays are pre-sorted composite
    (doc·2^21 + pos) keys.

    Exactness of the latest-predecessor rule: for a fixed chain end e,
    the LATEST valid start s* yields the minimal interval [s*, e]; any
    other valid start s < s* spans a superset [s, e] ⊇ [s*, e], so if
    [s*, e] contains an exclude occurrence every alternative does too
    — checking s* alone decides e.  One searchsorted per array, no
    per-pair loop."""
    e = np.empty(0, dtype=np.int64)
    if keys1.size == 0 or keys2.size == 0:
        return e
    idx = np.searchsorted(keys1, keys2, side="left") - 1
    ok = idx >= 0
    if not ok.any():
        return e
    s_key = keys1[np.maximum(idx, 0)]
    same_doc = (s_key >> PHRASE_POS_SHIFT) == (keys2 >> PHRASE_POS_SHIFT)
    within = (keys2 - s_key) <= (slop + 1)
    ok &= same_doc & within & (s_key < keys2)
    if not ok.any():
        return e
    starts = s_key[ok]
    ends = keys2[ok]
    if keysx.size:
        lo = np.searchsorted(keysx, starts, side="left")
        hi = np.searchsorted(keysx, ends, side="right")
        clean = hi == lo
        starts, ends = starts[clean], ends[clean]
    if ends.size == 0:
        return e
    docs = ends >> PHRASE_POS_SHIFT  # ends stayed sorted
    return docs[np.concatenate([[True], docs[1:] != docs[:-1]])]


def span_not_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Lucene ``span_not`` top-k: docs containing an ordered two-clause
    include span (within ``slop``) with NO occurrence of the exclude
    term inside the span (endpoints inclusive — Lucene overlap
    semantics).  BM25-scored over the distinct INCLUDE terms (the
    exclude term never scores).

    Plan: conjunctive candidates over the include terms, exclude
    postings decode only candidate-bearing blocks, then the
    latest-predecessor clean-pair rule (:func:`_span_not_matched`).
    A vocabulary-absent exclude term excludes nothing (every include
    span is clean).

    Expects constant ``slop``, ``cseq`` (JSON [t1, t2]) and ``xterm``
    columns plus ``is_excl`` per row and ``n_terms`` (distinct include
    count)."""
    from bilies_go_spark.operators.codec import decode_masked_pos

    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    cseq = [str(t) for t in json.loads(pdf["cseq"].iloc[0])]
    xterm = str(pdf["xterm"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    per_term: dict[str, dict] = {}
    excl_rows = None
    for term, rows in pdf.groupby("term", sort=True):
        if int(rows["is_excl"].iloc[0]) and term == xterm and term not in cseq:
            excl_rows = rows
            continue
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)
    inc_terms = sorted(set(cseq))
    if len([t for t in inc_terms if t in per_term]) < n_expected:
        return empty
    cand, quads = _positional_candidates(per_term, inc_terms, stats, deleted)
    if cand.size == 0:
        return empty
    keys_by_term = {}
    for t in inc_terms:
        ids, tfs, _dls, pos = quads[t]
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    keysx = np.empty(0, dtype=np.int64)
    src = excl_rows if excl_rows is not None else None
    if xterm in quads:  # exclude term is also an include term
        keysx = keys_by_term[xterm]
    elif src is not None:
        xparts = []
        for _, r in src.iterrows():
            seg = row_to_segment(r)
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                xparts.append(_alive_quad(decode_masked_pos(seg, mask), deleted))
                stats.blocks_decoded += int(mask.sum())
        xparts = [p for p in xparts if p[0].size]
        if xparts:
            xq = (
                xparts[0]
                if len(xparts) == 1
                else tuple(np.concatenate([p[i] for p in xparts]) for i in range(4))
            )
            kx = np.repeat(xq[0], xq[1]) * PHRASE_POS_STRIDE + xq[3]
            kx.sort()
            keysx = kx
    matched = _span_not_matched(
        keys_by_term[cseq[0]], keys_by_term[cseq[1]], keysx, slop
    )
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in inc_terms}
    doc, acc = _merge_accumulate(
        decoded, per_term, inc_terms, avgdl, k1, b, cand=matched
    )
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


def _span_not_shard(
    pdf: pd.DataFrame,
    lo: int,
    hi: int,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    deleted=None,
    tie_margin: float = 0.0,
) -> pd.DataFrame:
    """span_not scoring for one (query, shard): clean-pair rule over
    the sliced streams.  Shard-exact — the include chain AND the
    exclude occurrences of a doc all land in its shard, so per-shard
    verification equals global; a missing INCLUDE term empties the
    shard, a missing exclude term excludes nothing."""
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    cseq = [str(t) for t in json.loads(pdf["cseq"].iloc[0])]
    xterm = str(pdf["xterm"].iloc[0])
    inc_terms = sorted(set(cseq))
    per_term, quads = {}, {}
    keysx = np.empty(0, dtype=np.int64)
    for term, rows in pdf.groupby("term", sort=True):
        is_excl_only = bool(int(rows["is_excl"].iloc[0])) and term not in cseq
        quad = _decode_slice_quad(rows, lo, hi, deleted)
        if quad is None:
            if not is_excl_only:
                return empty  # include term absent in shard
            continue
        if is_excl_only:
            kx = np.repeat(quad[0], quad[1]) * PHRASE_POS_STRIDE + quad[3]
            kx.sort()
            keysx = kx
            continue
        dfreq = int(rows["df"].iloc[0])
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
        }
        quads[term] = quad
    if len(quads) < len(inc_terms):
        return empty
    keys_by_term = {}
    for t in inc_terms:
        ids, tfs, _dls, pos = quads[t]
        kt = np.repeat(ids, tfs) * PHRASE_POS_STRIDE + pos
        kt.sort()
        keys_by_term[t] = kt
    if xterm in quads:
        keysx = keys_by_term[xterm]
    matched = _span_not_matched(
        keys_by_term[cseq[0]], keys_by_term[cseq[1]], keysx, slop
    )
    if matched.size == 0:
        return empty
    decoded = {t: quads[t][:3] for t in inc_terms}
    doc, acc = _merge_accumulate(
        decoded, per_term, inc_terms, avgdl, k1, b, cand=matched
    )
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


def proximity_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """Unordered proximity top-k over a POSITIONAL index: docs where
    ALL query terms occur within a token window of span <= ``slop``
    (minimal covering window, any term order), BM25-scored over the
    distinct terms.

    Verification is the vectorized minimal-covering-window sweep: with
    per-term sorted (doc·2^21 + pos) key arrays, every term occurrence
    is an anchor; for anchor key a, each term's latest occurrence <= a
    in the same doc (one searchsorted per term) gives the minimal
    window ending at a — the doc matches iff some anchor's window span
    is <= slop.  Exact because the right edge of a minimal covering
    window is itself a term occurrence.  Cost is
    O(candidate positions · n_terms · log) — candidates only, never
    the full posting lists.

    Expects ``n_terms`` and ``slop`` columns on every row.
    """
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    slop = int(pdf["slop"].iloc[0])
    stats = stats if stats is not None else KernelStats()

    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return empty
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        dfreq = int(rows["df"].iloc[0])
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        if not all(seg.has_positions for seg in runs):
            raise ValueError(
                "proximity query requires an index built with BuildConfig(positions=True)"
            )
        per_term[term] = {
            "idf": float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": runs,
        }
        stats.blocks_total += sum(len(seg.block_last_doc_id) for seg in runs)

    cand, quads = _positional_candidates(per_term, terms, stats, deleted)
    if cand.size == 0:
        return empty

    # minimal-covering-window sweep over candidate docs only
    matched = _min_window_matched(quads, terms, slop)
    if matched.size == 0:
        return empty

    decoded = {t: quads[t][:3] for t in terms}
    doc, acc = _merge_accumulate(decoded, per_term, terms, avgdl, k1, b, cand=matched)
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


def composed_query_kernel(
    pdf: pd.DataFrame,
    k1: float,
    b: float,
    n_docs: int,
    avgdl: float,
    prune: bool = True,
    stats: KernelStats | None = None,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """The Lucene/ES ``bool``-query composition in ONE kernel — the
    request shape the reference's users actually send to Elasticsearch
    (/root/reference/README.md:8-11 delegates all querying to ES, whose
    bool query freely mixes clause types): MUST phrases + MUST_NOT
    terms + SHOULD scoring terms (prefix/fuzzy expansions arrive
    pre-expanded) + an optional allowed-set filter, evaluated on one
    candidate pipeline.

    Composition of the proven pieces, in filter-first order:

    1. MUST_NOT terms decode and fold into the :class:`DocSetFilter`
       tombstone side (the boolean kernel's move) — every later decode
       masks them, so pruning and candidacy stay rank-safe;
    2. each MUST phrase runs the conjunctive-candidate + slot-
       intersection verification (the phrase kernel's move) under that
       filter; multi-phrase queries intersect their match sets;
    3. scoring: BM25 over the DISTINCT scoring terms (phrase terms +
       SHOULD terms).  With phrases, only candidate-bearing blocks of
       the scoring terms decode (cost bounded by the candidate set);
       without phrases, the standard block-max pruned OR kernel runs
       with the exclusion-augmented filter.

    Eligibility: (all phrases) AND (no negated term) AND (no negated
    phrase — positionally verified matches fold into the exclusion
    filter exactly like negated terms; their terms ride as
    verification-only rows, ``neg == 2``, neither scored nor
    term-excluded) AND (in the allowed set) AND (>=1 scoring term —
    implied when phrases exist).
    Score: Σ over scoring terms present, same pinned ascending-term
    float64 fold as every other kernel.

    Expects per-row ``neg`` (0/1 — MUST_NOT terms) and a constant
    ``qspec`` JSON column ``{"phrases": [[tok,..], ..]}`` (phrases
    only: SHOULD expansions can run to thousands of terms, so roles
    ride per-row, never duplicated into every row's JSON); ``pdf``
    carries segment rows for every involved term that has postings.
    """
    empty = pd.DataFrame(
        {"query_id": [], "rank": [], "doc_id": [], "score": []}
    ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
    if pdf.empty or avgdl <= 0:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    spec = json.loads(pdf["qspec"].iloc[0])
    phrases = [list(p) for p in spec.get("phrases", []) if p]
    neg_phrases = [list(p) for p in spec.get("neg_phrases", []) if p]
    stats = stats if stats is not None else KernelStats()

    per_term: dict[str, dict] = {}
    neg: set[str] = set()
    vonly: set[str] = set()  # verification-only: negated-phrase terms
    # single groupby pass (wide expansions make per-term boolean
    # filtering quadratic in the term count)
    for term, rows in pdf.groupby("term", sort=False):
        dfreq = int(rows["df"].iloc[0])
        # clause boost scales the whole per-term contribution; folding
        # it into idf keeps every downstream consumer (block-max upper
        # bounds, accumulate) rank-safe for free
        bst = float(rows["boost"].iloc[0]) if "boost" in rows.columns else 1.0
        per_term[term] = {
            "idf": bst * float(np.log1p((n_docs - dfreq + 0.5) / (dfreq + 0.5))),
            "df": dfreq,
            "runs": [row_to_segment(r) for _, r in rows.iterrows()],
        }
        if "clauses" in rows.columns:
            per_term[term]["clauses"] = json.loads(rows["clauses"].iloc[0] or "[]")
        nval = int(rows["neg"].iloc[0])
        if nval == 1:
            neg.add(term)
        elif nval == 2:
            vonly.add(term)
        stats.blocks_total += sum(
            len(seg.block_last_doc_id) for seg in per_term[term]["runs"]
        )
    sterms = sorted(t for t in per_term if t not in neg and t not in vonly)
    if not sterms:
        return empty

    # 1. MUST_NOT -> exclusion ids on the filter's tombstone side
    flt = deleted if isinstance(deleted, DocSetFilter) else DocSetFilter(deleted, None)
    excl_parts = []
    for t in sorted(neg):
        if t in per_term:
            ids, _, _ = _decode_term_runs(per_term[t]["runs"], None, deleted=None)
            stats.blocks_decoded += sum(
                len(seg.block_last_doc_id) for seg in per_term[t]["runs"]
            )
            if ids.size:
                excl_parts.append(ids)
    if excl_parts:
        excl = np.unique(np.concatenate(excl_parts))
        tomb = excl if flt.deleted is None else np.union1d(flt.deleted, excl)
        flt = DocSetFilter(tomb, flt.allowed)

    # 1b. MUST_NOT phrases -> positionally verified matches join the
    # exclusion side (exclusion is a union, so evaluating each negated
    # phrase under the progressively augmented filter is order-safe)
    for p in neg_phrases:
        pterms = sorted(set(p))
        if any(t not in per_term for t in pterms):
            continue  # a phrase term matches no document -> nothing to exclude
        if not all(
            seg.has_positions for t in pterms for seg in per_term[t]["runs"]
        ):
            raise ValueError(
                "composed phrase clauses need an index built with "
                "BuildConfig(positions=True)"
            )
        c_p, quads = _positional_candidates(per_term, pterms, stats, flt)
        if c_p.size == 0:
            continue
        slots_n: dict[str, list[int]] = {}
        for j, t in enumerate(p):
            slots_n.setdefault(t, []).append(j)
        slot_list = sorted(
            (per_term[t]["df"], off, t) for t, offs in slots_n.items() for off in offs
        )
        matched = _verify_phrase(quads, slot_list)
        if matched.size:
            tomb = (
                matched
                if flt.deleted is None
                else np.union1d(flt.deleted, matched)
            )
            flt = DocSetFilter(tomb, flt.allowed)

    # 1c. minimum_should_match -> eligible docs fold into the filter's
    # allowed side (postings-proportional: unique doc set per clause,
    # multiplicity count across clauses — never an n_docs-dense array,
    # so the doc-range-sharded twin stays slice-sized at scale)
    msm = int(spec.get("msm", 0))
    if msm > 0:
        cl_map: dict[int, list[str]] = {}
        for t in sterms:
            for c in per_term[t].get("clauses", ()):
                cl_map.setdefault(int(c), []).append(t)
        if cl_map:
            per_clause = []
            for c in sorted(cl_map):
                parts = []
                for t in cl_map[c]:
                    ids, _, _ = _decode_term_runs(
                        per_term[t]["runs"], None, deleted=flt
                    )
                    stats.blocks_decoded += sum(
                        len(seg.block_last_doc_id) for seg in per_term[t]["runs"]
                    )
                    if ids.size:
                        parts.append(ids)
                if parts:
                    per_clause.append(
                        np.unique(np.concatenate(parts))
                        if len(parts) > 1
                        else np.sort(parts[0])
                    )
            if len(per_clause) < msm:
                return empty
            u, cnt = np.unique(np.concatenate(per_clause), return_counts=True)
            eligible = u[cnt >= msm].astype(np.int64)
            if eligible.size == 0:
                return empty
            allow = (
                eligible
                if flt.allowed is None
                else np.intersect1d(flt.allowed, eligible, assume_unique=True)
            )
            if allow.size == 0:
                return empty
            flt = DocSetFilter(flt.deleted, allow)

    # 2. MUST phrases -> intersected candidate set
    cand: np.ndarray | None = None
    reuse: dict[str, tuple] = {}
    for p in phrases:
        pterms = sorted(set(p))
        if any(t not in per_term for t in pterms):
            return empty  # a phrase term matches no document
        if not all(
            seg.has_positions for t in pterms for seg in per_term[t]["runs"]
        ):
            raise ValueError(
                "composed phrase clauses need an index built with "
                "BuildConfig(positions=True)"
            )
        c_p, quads = _positional_candidates(per_term, pterms, stats, flt)
        if c_p.size == 0:
            return empty
        slots: dict[str, list[int]] = {}
        for j, t in enumerate(p):
            slots.setdefault(t, []).append(j)
        slot_list = sorted(
            (per_term[t]["df"], off, t) for t, offs in slots.items() for off in offs
        )
        matched = _verify_phrase(quads, slot_list)
        if matched.size == 0:
            return empty
        if len(phrases) == 1:
            reuse = {t: quads[t] for t in pterms}  # decoded once, reused in 3
        cand = matched if cand is None else np.intersect1d(cand, matched, assume_unique=True)
        if cand.size == 0:
            return empty

    # 3. scoring
    if cand is None:  # no phrase clause: pruned OR kernel + the filter
        return score_query_kernel(
            pdf[pdf["neg"] == 0],
            k1, b, n_docs, avgdl,
            prune=prune, stats=stats, tie_margin=tie_margin, deleted=flt,
        )
    e = np.empty(0, dtype=np.int64)
    decoded = {}
    for t in sterms:
        if t in reuse:
            decoded[t] = _restrict_quad(reuse[t], cand)[:3]
            continue
        parts = []
        for seg in per_term[t]["runs"]:
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                parts.append(_alive_triple(decode_masked(seg, mask), flt))
                stats.blocks_decoded += int(mask.sum())
        parts = [x for x in parts if x[0].size]
        decoded[t] = (
            (e, e, e)
            if not parts
            else parts[0]
            if len(parts) == 1
            else tuple(np.concatenate([x[i] for x in parts]) for i in range(3))
        )
    doc, acc = _merge_accumulate(decoded, per_term, sterms, avgdl, k1, b, cand=cand)
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


MATCH_SCHEMA = "query_id bigint, doc_id bigint"


def conjunctive_match_kernel(
    pdf: pd.DataFrame,
    stats: KernelStats | None = None,
    deleted: np.ndarray | DocSetFilter | None = None,
) -> pd.DataFrame:
    """ALL docs containing EVERY query term (no scoring, no top-k) —
    the match-set surface faceting/analytics consume.  Same
    rarest-term candidate-driven intersection as
    :func:`conjunctive_query_kernel`: cost O(df_min +
    n_blocks_other log df_min), never O(Σ df)."""
    empty = pd.DataFrame({"query_id": [], "doc_id": []}).astype(
        {"query_id": "int64", "doc_id": "int64"}
    )
    if pdf.empty:
        return empty
    qid = int(pdf["query_id"].iloc[0])
    n_expected = int(pdf["n_terms"].iloc[0])
    stats = stats if stats is not None else KernelStats()
    terms = sorted(pdf["term"].unique())
    if len(terms) < n_expected:
        return empty
    per_term: dict[str, dict] = {}
    for term in terms:
        rows = pdf[pdf["term"] == term]
        per_term[term] = {
            "df": int(rows["df"].iloc[0]),
            "runs": [row_to_segment(r) for _, r in rows.iterrows()],
        }
    by_df = sorted(terms, key=lambda t: (per_term[t]["df"], t))
    rare = by_df[0]
    ids, _, _ = _decode_term_runs(per_term[rare]["runs"], None, deleted=deleted)
    cand = np.sort(ids)
    for t in by_df[1:]:
        if cand.size == 0:
            return empty
        parts = []
        for seg in per_term[t]["runs"]:
            mask = _seg_blocks_with_candidates(seg, cand)
            if mask.any():
                parts.append(_alive_triple(decode_masked(seg, mask), deleted))
        ids_t = (
            np.sort(np.concatenate([p[0] for p in parts if p[0].size]))
            if parts
            else np.empty(0, dtype=np.int64)
        )
        if ids_t.size == 0:
            return empty
        pidx = np.minimum(np.searchsorted(ids_t, cand), ids_t.size - 1)
        cand = cand[ids_t[pidx] == cand]
    if cand.size == 0:
        return empty
    return pd.DataFrame(
        {"query_id": np.full(cand.size, qid, dtype=np.int64), "doc_id": cand}
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
    per_term,
    terms,
    k,
    avgdl,
    k1,
    b,
    stats: KernelStats,
    tie_margin: float = 0.0,
    deleted: np.ndarray | DocSetFilter | None = None,
):
    """Block-max candidate pruning with exact-seed θ refinement and
    MaxScore essential-list filtering + candidate-directed gather.

    1. Bootstrap θ = kth best *partial* score of the highest-impact
       term (partial scores lower-bound true scores, so θ lower-bounds
       the final kth score).
    2. θ refinement: decode the OTHER terms' blocks containing just the
       top-k partial-score docs (≤ k blocks per run — block-targeted)
       and compute those docs' EXACT scores; θ rises to their kth best.
       Exact scores of any k docs lower-bound the true kth score, and
       on multi-term queries they sit far above the single-term partial
       bound — the decisive prune for all-hot (stopword-class) queries
       where partial-θ keeps every block alive.
    3. Essential terms (MaxScore): with terms sorted by max block ub
       ascending, the longest prefix whose CUMULATIVE max ub stays
       below θ is non-essential — a doc appearing only in those terms
       cannot reach θ — so their blocks skip survival scanning
       entirely (they are decoded only by the candidate gather in 5).
    4. A block of an essential term survives iff ub_t(block) + Σ_{u≠t}
       (max ub over u-blocks overlapping the block's doc range) ≥ θ.
       Any live doc above θ appears in some essential term, whose block
       bound dominates the doc's score — so it survives (rank-safe).
    5. Candidates = docs of surviving blocks (plus all of best_term).
       Exactness: per term, additionally decode the not-yet-decoded
       blocks that may CONTAIN a candidate, so every candidate's score
       is complete.  Every block decodes at most once (seed / survival
       / gather masks are kept disjoint).

    All θ comparisons respect ``tie_margin``, so the margin-widened
    top-k stays exact.  Returns (candidate doc_ids, {term: (ids, tfs,
    dls)} decoded arrays).
    """
    runidx = {
        t: [_RunIndex(seg, per_term[t]["ubs"][ri]) for ri, seg in enumerate(per_term[t]["runs"])]
        for t in terms
    }
    e = np.empty(0, dtype=np.int64)
    empty3 = (e, e, e)

    def _combine(parts):
        parts = [p for p in parts if p[0].size]
        if not parts:
            return empty3
        if len(parts) == 1:
            return parts[0]
        return tuple(np.concatenate([p[i] for p in parts]) for i in range(3))

    # 1. bootstrap θ (decode the dominant term once; arrays reused below)
    max_ub = {
        t: max((float(r.ub.max()) for r in runidx[t] if r.ub.size), default=0.0)
        for t in terms
    }
    best_term = max(terms, key=lambda t: max_ub[t])
    best_full = _decode_term_runs(per_term[best_term]["runs"], None, deleted=deleted)
    stats.blocks_decoded += sum(len(r.ub) for r in runidx[best_term])
    part = per_term[best_term]["idf"] * _tf_norm(best_full[1], best_full[2], avgdl, k1, b)
    theta = float(np.partition(part, -k)[-k]) if part.size >= k else 0.0

    # 2. θ refinement via exact scores of the best term's top partials.
    # seed_dec[t][ri] = (mask, triple) — reused verbatim downstream.
    seed_dec: dict[str, dict[int, tuple]] = {t: {} for t in terms}
    if part.size:
        m = min(k, part.size)
        seed = np.sort(best_full[0][np.argpartition(part, part.size - m)[part.size - m:]])
        sdec = {best_term: best_full}
        for t in terms:
            if t == best_term:
                continue
            tris = []
            for ri, r in enumerate(runidx[t]):
                mask = r.blocks_with_candidates(seed)
                if mask.any():
                    tri = _alive_triple(
                        decode_masked(per_term[t]["runs"][ri], mask), deleted
                    )
                    seed_dec[t][ri] = (mask, tri)
                    tris.append(tri)
                    stats.blocks_decoded += int(mask.sum())
            sdec[t] = _combine(tris)
        sdoc, sacc = _merge_accumulate(sdec, per_term, terms, avgdl, k1, b, cand=seed)
        if sacc.size >= k:
            theta = max(theta, float(np.partition(sacc, -k)[-k]))
    # keep true ties; tie_margin widens the window so rounded near-ties
    # of the kth score are never pruned
    theta_eff = theta - tie_margin - 1e-12

    # 3. essential-term split (MaxScore)
    nonessential: set[str] = set()
    cum = 0.0
    for t in sorted(terms, key=lambda u: max_ub[u]):
        if t == best_term:
            continue  # fully decoded already; always treated essential
        if cum + max_ub[t] < theta_eff:
            cum += max_ub[t]
            nonessential.add(t)
        else:
            break

    # 4. survival masks for essential terms (tight RMQ range bounds
    # against ALL other terms, essential or not)
    surviving: dict[str, list[np.ndarray]] = {}
    for t in terms:
        if t == best_term or t in nonessential:
            continue
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
            mask_per_run.append(bound >= theta_eff)
        surviving[t] = mask_per_run

    # 5a. decode surviving-not-yet-decoded blocks; candidate set = docs
    # of surviving blocks ∪ best_full (a candidate superset is always
    # rank-safe; seed-decoded docs are candidates only when their block
    # also survives — otherwise they were incidental)
    dec_parts: dict[str, list] = {}
    dec_mask: dict[str, list[np.ndarray]] = {}
    cand_parts = [best_full[0]]
    for t in terms:
        if t == best_term:
            continue
        parts, masks = [], []
        surv = surviving.get(t)
        for ri, r in enumerate(runidx[t]):
            nb = len(r.ub)
            dm = np.zeros(nb, dtype=bool)
            sm_tri = seed_dec[t].get(ri)
            if sm_tri is not None:
                dm |= sm_tri[0]
                parts.append(sm_tri[1])
            if surv is not None:
                sm = surv[ri]
                fresh = sm & ~dm
                if fresh.any():
                    tri = _alive_triple(
                        decode_masked(per_term[t]["runs"][ri], fresh), deleted
                    )
                    parts.append(tri)
                    cand_parts.append(tri[0])
                    stats.blocks_decoded += int(fresh.sum())
                    dm |= fresh
                if sm_tri is not None and sm_tri[1][0].size:
                    overlap = sm & sm_tri[0]
                    if overlap.any():
                        ids = sm_tri[1][0]
                        blk = np.minimum(
                            np.searchsorted(r.ends, ids, side="left"), nb - 1
                        )
                        sel = sm[blk]
                        if sel.any():
                            cand_parts.append(ids[sel])
            masks.append(dm)
        dec_parts[t] = parts
        dec_mask[t] = masks
    cand_parts = [p for p in cand_parts if p.size]
    if not cand_parts:
        return e, {t: empty3 for t in terms}
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
        return e, {t: empty3 for t in terms}

    # 5b. gather: per term decode ONLY the not-yet-decoded blocks that
    # may contain a candidate, so every candidate's score is complete;
    # concat order within a term is irrelevant (the aggregation sorts
    # globally)
    decoded = {}
    for t in terms:
        if t == best_term:
            decoded[t] = best_full  # already full — lookups complete
            continue
        parts = dec_parts[t]
        for ri, r in enumerate(runidx[t]):
            dm = dec_mask[t][ri]
            if dm.all():
                continue
            extra = r.blocks_with_candidates(cand) & ~dm
            if extra.any():
                parts.append(
                    _alive_triple(decode_masked(per_term[t]["runs"][ri], extra), deleted)
                )
                stats.blocks_decoded += int(extra.sum())
        decoded[t] = _combine(parts)
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


class _ContribCache:
    """Byte-capped LRU cache: term -> DENSE per-doc BM25 contribution
    array (``arr[doc_id] = idf(term) * tf_norm(tf, dl)``, float64).

    The serving-path answer to stopword-class queries, where block-max
    pruning is structurally useless (every 128-doc block of a uniform
    hot term contains a near-max-impact doc, so every block bound beats
    any θ) and the cost is raw decode+score volume: a hot term's
    contributions are computed ONCE per engine and summing k dense
    arrays + one top-k replaces k full VByte decodes per query.  Valid
    for the engine's lifetime because contributions depend only on the
    pinned (df, n_docs, avgdl, tombstones) view.  Dense is the
    single-node serving regime by definition (doc-id space fits one
    node); the 10^12-doc path is the sharded plan, which never builds
    these.

    Arrays live in a lazily-grown, ``MADV_POPULATE_WRITE``-prefaulted
    arena (bump allocation): on this VM class a first-touch scatter
    into a fresh 16 MB array costs ~1.5 s of page faults, while
    populate-prefault + memset costs ~0.1 s (see prefault_heap).  When
    the bump space is spent, least-recently-used entries are evicted
    and their slots recycled best-fit — hot terms' dense arrays all
    span nearly the full doc-id space, so slots are effectively
    interchangeable, and a recycled slot is already faulted (no
    repeat page-population cost).  Arena slots cannot merge, so an
    entry larger than every recyclable slot stays uncached (callers
    fall back to per-query decode).  Recycling is safe because serving
    is synchronous per engine AND the in-flight query pins its own
    terms (:meth:`pin`): a view handed out this query can never be
    recycled under the caller's feet by a later same-query alloc —
    without the pin, a multi-hot-term query whose arrays overflow the
    arena would evict its OWN earlier term and silently scatter the
    new term's contributions into the view the caller still holds."""

    def __init__(self, max_bytes: int):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        # term -> (float64 view, backing uint8 slot | None for tiny
        # external arrays); insertion order == recency order
        self._d: "OrderedDict[str, tuple[np.ndarray, np.ndarray | None]]" = (
            OrderedDict()
        )
        self._free: list[np.ndarray] = []  # recyclable uint8 slots
        self._arena: np.ndarray | None = None
        self._off = 0
        self._pinned: frozenset[str] = frozenset()

    def pin(self, terms) -> None:
        """Protect ``terms`` from eviction until :meth:`unpin` — the
        current query's terms, whose views outlive later allocs."""
        self._pinned = frozenset(terms)

    def unpin(self) -> None:
        self._pinned = frozenset()

    def get(self, term: str) -> np.ndarray | None:
        hit = self._d.get(term)
        if hit is None:
            return None
        self._d.move_to_end(term)
        return hit[0]

    @staticmethod
    def _populate(buf: np.ndarray, start: int, length: int) -> None:
        import ctypes

        try:
            libc = ctypes.CDLL("libc.so.6", use_errno=True)
            addr = buf.ctypes.data + start
            page = 4096
            aligned = (addr + page - 1) // page * page
            size = (length - (aligned - addr)) // page * page
            if size <= 0:
                return
            MADV_HUGEPAGE, MADV_POPULATE_WRITE = 14, 23
            libc.madvise(ctypes.c_void_p(aligned), ctypes.c_size_t(size), MADV_HUGEPAGE)
            rc = libc.madvise(
                ctypes.c_void_p(aligned), ctypes.c_size_t(size), MADV_POPULATE_WRITE
            )
            if rc != 0:  # pre-5.14 kernel: strided touch fallback
                buf[start : start + length : page] = 0
        except Exception:
            pass

    def _take_free(self, nb: int) -> "np.ndarray | None":
        """Smallest recyclable slot holding >= nb bytes (best fit)."""
        best = None
        for i, slot in enumerate(self._free):
            if slot.nbytes >= nb and (best is None or slot.nbytes < self._free[best].nbytes):
                best = i
        return self._free.pop(best) if best is not None else None

    def alloc_for(self, term: str, n: int) -> np.ndarray | None:
        """A zeroed float64[n] view registered to ``term``: carved from
        the bump arena while space remains, then recycled best-fit from
        LRU-evicted slots; None when no slot can hold it (stay on the
        kernel path)."""
        nb = 8 * n
        if nb > self.max_bytes:
            return None
        if self._arena is None:
            self._arena = np.empty(self.max_bytes, dtype=np.uint8)
        slot = None
        if self._off + nb <= self.max_bytes:
            slot = self._arena[self._off : self._off + nb]
            self._off += nb
            self._populate(self._arena, self._off - nb, nb)  # fault once, up front
        else:
            slot = self._take_free(nb)
            while slot is None:
                # evict LRU-first, skipping pinned entries (the live
                # query's terms — their views are still held)
                victim = next((t for t in self._d if t not in self._pinned), None)
                if victim is None:
                    return None
                _, old_slot = self._d.pop(victim)
                if old_slot is not None:
                    self._free.append(old_slot)
                slot = self._take_free(nb)
        v = slot[:nb].view(np.float64)
        v[:] = 0.0
        self._d[term] = (v, slot)
        return v

    def put(self, term: str, arr: np.ndarray) -> None:
        """Register a tiny external array (e.g. the empty-term marker);
        its storage is not arena-backed and never recycled."""
        self._d[term] = (arr, None)


class _PosCache:
    """Byte-capped FILL-ONCE cache for the positional serving path:
    term -> (ids, tfs, dls, pos, keys) where ``keys`` is the SORTED
    composite (doc·2^21 + pos) array phrase/proximity verification
    consumes directly.

    The positional twin of :class:`_ContribCache`, solving the same
    problem one level up: an all-hot phrase ("of the and") decodes
    millions of postings+positions and re-sorts millions of composite
    keys EVERY query — measured 2.5-12 s/query warm on a 2M-turn index
    — even though the arrays depend only on the engine-pinned
    (segments, tombstones) view.  Caching the decoded, alive-filtered,
    pre-sorted arrays once turns a hot positional query into pure
    searchsorted intersections.  Entries are immutable and plain numpy
    arrays, so eviction is just dropping the reference: the cache is a
    byte-capped LRU — when a new hot term would overflow the budget,
    least-recently-used entries are evicted until it fits (an entry
    larger than the whole budget stays uncached).  Unlike
    :class:`_ContribCache` there is no arena to fragment; the page-
    fault cost of a fresh decode is paid anyway on the decode path."""

    def __init__(self, max_bytes: int):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self._d: "OrderedDict[str, tuple]" = OrderedDict()
        self._bytes = 0

    def get(self, term: str):
        hit = self._d.get(term)
        if hit is not None:
            self._d.move_to_end(term)
        return hit

    def put(self, term: str, entry: tuple) -> bool:
        nb = sum(int(a.nbytes) for a in entry)
        if nb > self.max_bytes:
            return False
        while self._bytes + nb > self.max_bytes and self._d:
            _, old = self._d.popitem(last=False)  # evict LRU
            self._bytes -= sum(int(a.nbytes) for a in old)
        self._d[term] = entry
        self._bytes += nb
        return True


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
        # pin the committed serving view in ONE read of the atomically-
        # replaced pointer: base generation, tier list, and corpus stats
        # all come from the same snapshot, so an engine constructed at
        # any instant during compaction sees either the complete old or
        # the complete new view — never stale tiers over a new base or
        # stats out of step with the tier list (rebuild the engine to
        # see a newer compaction; retired generations survive one full
        # compaction cycle — gc_stale_generations' grace policy)
        cur = IndexPaths(index_dir).read_current()
        self.paths = IndexPaths(index_dir, gen=cur["gen"])
        self.meta = load_index_meta(index_dir)
        if cur.get("stats"):
            self.n_docs = int(cur["stats"]["n_docs"])
            self.avgdl = float(cur["stats"]["avgdl"])
        else:  # pre-pointer index (or mid-first-build): parquet fallback
            srow = spark.read.parquet(self.paths.stats_table).collect()[0]
            self.n_docs, self.avgdl = int(srow["n_docs"]), float(srow["avgdl"])
        self.k1, self.b, self.prune = k1, b, prune
        self.tie_margin = tie_margin
        self._local_ds = None
        if cache_mb is None:
            cache_mb = int(_os.environ.get("BGS_SEGMENT_CACHE_MB", "256"))
        self.seg_cache = _SegmentCache(cache_mb << 20)
        self.contrib_cache = _ContribCache(
            int(_os.environ.get("BGS_CONTRIB_CACHE_MB", "384")) << 20
        )
        self.pos_cache = _PosCache(
            int(_os.environ.get("BGS_POS_CACHE_MB", "1024")) << 20
        )
        # build-time positional artifact (index_build.build_pos_cache);
        # BGS_POS_ARTIFACT=0 forces the decode fill path (A/B lever)
        self._pos_artifact = _os.environ.get(
            "BGS_POS_ARTIFACT", "1"
        ) != "0" and os.path.isdir(self.paths.pos_cache)
        # delta tiers from incremental compaction (streaming/ingest.
        # compact_tiered): unioned with the base segments on every path.
        # Tiers are doc-disjoint by the append-only id contract, so the
        # kernels' per-(term, doc) uniqueness assumption holds; global
        # df = sum over base + tiers.
        self.tiers = [t["id"] for t in cur["tiers"]]
        # live tombstones (operators/deletes.py): kernels drop these doc
        # ids after decode; term-stats roots gain the NEGATIVE df-delta
        # dirs so summed global df stays exact.  Small by contract
        # (purged at every full compaction), shipped to executor kernels
        # inside the UDF closure.
        from bilies_go_spark.operators.deletes import read_deleted_ids

        self._delete_batches = [d["id"] for d in cur.get("deletes", [])]
        _del = read_deleted_ids(self.paths, cur)
        self.deleted = _del if _del.size else None
        # fault in the serving arena once so per-query numpy temporaries
        # never pay first-touch page faults (see prefault_heap)
        import bilies_go_spark

        bilies_go_spark.prefault_heap()

    # -- shared query-plan helpers -----------------------------------------

    def _seg_roots(self) -> list[str]:
        roots = [self.paths.segments] + [self.paths.tier_segments(t) for t in self.tiers]
        return [r for r in roots if os.path.isdir(r)]

    def _ts_roots(self) -> list[str]:
        from bilies_go_spark.operators.deletes import delete_term_deltas_dir

        roots = (
            [self.paths.term_stats]
            + [self.paths.tier_term_stats(t) for t in self.tiers]
            # negative deltas: the existing sum(df) nets out tombstones
            + [delete_term_deltas_dir(self.paths, b) for b in self._delete_batches]
        )
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
        """(term, df) with df summed across base + tiers + delete
        deltas — the GLOBAL document frequency the BM25 idf needs.

        Built as a LOCAL relation from the driver-side pruned pyarrow
        dictionary read (:meth:`term_dfs` — O(query terms) rows, the
        lookup every call already pays for auto-sharding): the
        broadcast side of the stats join then carries no parquet-scan
        + aggregation subtree, which removes one exchange + two scan
        stages from every per-query plan (measured ~0.2 s/call off the
        routed serving paths; same rows by construction)."""
        df_map = self.term_dfs(terms)
        pdf = pd.DataFrame(
            {
                "term": sorted(df_map),
                "df": [int(df_map[t]) for t in sorted(df_map)],
            }
        )
        return self.spark.createDataFrame(pdf, schema="term string, df bigint")

    def _terms_and_buckets(self, queries: pd.DataFrame) -> tuple[list[str], list[int]]:
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(
            {t for q in queries.itertuples(index=False) for t in _tokenize_terms(q.text)}
        )
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        return terms, buckets

    #: allowed sets at least this large (and dense enough that bits
    #: beat int64s — density > 1/64) convert to a packed DocBitmap
    ALLOWED_BITMAP_MIN = 1 << 23  # 8M ids = 64 MB as int64 array
    #: filters whose array payload exceeds this ship via Spark
    #: broadcast (one torrent copy per executor) instead of riding in
    #: every task closure
    FILTER_BROADCAST_MIN_BYTES = 4 << 20

    def _doc_filter(self, allowed: "np.ndarray | None"):
        """Kernel-side doc mask: the pinned tombstones, optionally
        combined with an allowed-id set (metadata-filtered search —
        see :class:`DocSetFilter`).  ``allowed`` must be sorted int64;
        large dense sets convert to a packed :class:`DocBitmap`."""
        if allowed is None:
            return self.deleted
        arr = np.ascontiguousarray(allowed, dtype=np.int64)
        if arr.size >= self.ALLOWED_BITMAP_MIN and (
            arr.size == 0 or int(arr[-1]) < 64 * arr.size
        ):
            return DocSetFilter(self.deleted, DocBitmap(arr))
        return DocSetFilter(self.deleted, arr)

    def _ship_filter(self, flt):
        """Large doc filters ride a Spark broadcast; kernels unwrap via
        :func:`_unwrap_filter`.  Small filters stay in the closure
        (broadcast setup isn't free for a few-KB tombstone array)."""
        nb = 0
        if isinstance(flt, DocSetFilter):
            if isinstance(flt.allowed, DocBitmap):
                nb += flt.allowed.bits.nbytes
            elif flt.allowed is not None:
                nb += flt.allowed.nbytes
            if flt.deleted is not None:
                nb += flt.deleted.nbytes
        elif flt is not None:
            nb = flt.nbytes
        if nb >= self.FILTER_BROADCAST_MIN_BYTES:
            return self.spark.sparkContext.broadcast(flt)
        return flt

    # -- distributed path ----------------------------------------------------

    #: posting volume past which a query ROUTES to the doc-range-sharded
    #: plan (the serving-latency boundary: below it the one-task /
    #: driver-local paths win)
    SHARD_TARGET_POSTINGS = 500_000
    #: once routed, never split below ~this many postings per shard
    #: task (tasks smaller than this are pure scheduling overhead —
    #: measured: a single routed stopword phrase is fastest at full
    #: fan-out, vol/100k shards)
    SHARD_MIN_POSTINGS = 100_000
    #: soft ceiling on postings per shard task (memory/straggler
    #: bound); a lone heavy query always fans out at least this far
    SHARD_MAX_POSTINGS = 4_000_000

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Global df per term (summed across base + tiers + delete
        deltas) via one pruned driver-side pyarrow read — the term
        dictionary lookup (no Spark job)."""
        import pyarrow.dataset as pads

        from bilies_go_spark.functions.xxhash import term_bucket_py

        if not terms:
            return {}
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        _, ts_dss = self._datasets()
        filt = pads.field("term_bucket").isin(buckets) & pads.field("term").isin(terms)
        df_map: dict[str, int] = {}
        for ds in ts_dss:
            t = ds.to_table(filter=filt, columns=["term", "df"])
            for term, dfreq in zip(t["term"].to_pylist(), t["df"].to_pylist()):
                df_map[term] = df_map.get(term, 0) + int(dfreq)
        return df_map

    def index_stats(self) -> DataFrame:
        """The ES ``_stats`` / ``_cat/indices`` analogue: corpus doc
        count, vocabulary size, and total postings — computed from the
        INDEX's own term dictionary (one Spark aggregation over the
        stats parquet, never the postings), so it doubles as an index
        integrity check against a corpus-side oracle.  Tier deltas and
        tombstone df corrections sum in naturally (distinct terms
        count once, df deltas add)."""
        ts = self.spark.read.parquet(*self._ts_roots())
        return (
            ts.groupBy()
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.sum("df").alias("n_postings"),
            )
            .select(
                F.lit(int(self.n_docs)).cast("bigint").alias("n_docs"),
                F.col("n_terms").cast("bigint"),
                F.col("n_postings").cast("bigint"),
            )
        )

    def _auto_shards(self, queries: pd.DataFrame) -> int:
        """Pick the shard count from the heaviest query's estimated
        posting volume (Σ df over its terms — one tiny driver-side
        pyarrow read of the pruned term-stats, no Spark job).  Light
        batches keep the one-task-per-query plan (n_shards=1); heavy
        queries get intra-query parallelism so no single task ever
        holds a full hot-term posting list — the plan that survives
        10^12 docs without a mode knob."""
        terms, buckets = self._terms_and_buckets(queries)
        if not terms:
            return 1
        df_map = self.term_dfs(terms)
        vols = [
            sum(df_map.get(t, 0) for t in _tokenize_terms(q.text))
            for q in queries.itertuples(index=False)
        ]
        vol = max(vols, default=0)
        n_heavy = sum(1 for v in vols if v > self.SHARD_TARGET_POSTINGS)
        return self._shards_for_volume(vol, n_heavy)

    def _shards_for_volume(self, vol: int, n_heavy: int = 1) -> int:
        """1 below the routing threshold (unchanged boundary); once
        routed, pick the fan-out from BOTH the heaviest query and how
        many heavy queries share the job (guide §2.6: fill the
        executors, do not oversubscribe them):

        - a lone routed query spreads to ~SHARD_MIN_POSTINGS tasks
          (serving latency: all cores attack one query — measured
          fastest for single stopword phrases),
        - a batch of n_heavy routed queries already has inter-query
          parallelism, so each gets ~parallelism/n_heavy shards
          (measured: the 53-query bench batch is ~25% faster at 3-4
          shards than at full fan-out — 1,700 tiny groups are pure
          per-task overhead),
        - tasks never exceed ~SHARD_MAX_POSTINGS postings (memory /
          straggler bound), and the fan-out never exceeds the executor
          parallelism (scales with the cluster)."""
        if vol <= self.SHARD_TARGET_POSTINGS:
            return 1
        par = max(self.spark.sparkContext.defaultParallelism, 1)
        upper = min(par, max(-(-vol // self.SHARD_MIN_POSTINGS), 2))
        lower = -(-vol // self.SHARD_MAX_POSTINGS)
        latency = -(-2 * par // max(n_heavy, 1))  # ~2 waves of tasks
        return int(min(max(2, lower, min(latency, upper)), par))

    def _auto_shards_qt(self, qt_pdf: pd.DataFrame) -> int:
        """:meth:`_auto_shards` over an already-expanded query-terms
        frame (phrase / proximity / composed — where the involved terms
        are exact, including expansions, rather than re-tokenized from
        the query text).  Same rule: heaviest query's Σ df picks the
        intra-query parallelism; light batches stay one-task-per-query."""
        terms = sorted(qt_pdf["term"].unique())
        if not terms:
            return 1
        df_map = self.term_dfs(terms)
        vols = [
            int(sum(df_map.get(t, 0) for t in set(g["term"])))
            for _, g in qt_pdf.groupby("query_id")
        ]
        vol = max(vols, default=0)
        n_heavy = sum(1 for v in vols if v > self.SHARD_TARGET_POSTINGS)
        return self._shards_for_volume(vol, n_heavy)

    def topk_distributed(
        self,
        queries: pd.DataFrame,
        n_shards: int | None = None,
        allowed: "np.ndarray | None" = None,
    ) -> DataFrame:
        """Cluster path: pruned segment scan + broadcast joins + one
        kernel task per query, or the doc-range-sharded plan
        (:meth:`topk_sharded`) which parallelizes WITHIN a query — the
        right plan when single queries touch huge posting lists (hot
        terms at 10^12-doc scale).  ``n_shards=None`` picks
        automatically from the estimated posting volume.  ``allowed``
        restricts results to a sorted doc-id set (filtered search;
        global scoring stats)."""
        if n_shards is None:
            n_shards = self._auto_shards(queries)
        if n_shards > 1:
            return self.topk_sharded(queries, n_shards, allowed=allowed)
        qt = query_terms_df(self.spark, queries)
        terms, buckets = self._terms_and_buckets(queries)
        if not terms:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)

        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl, prune = self.k1, self.b, self.n_docs, self.avgdl, self.prune
        margin = self.tie_margin
        deleted = self._ship_filter(self._doc_filter(allowed))

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_query_kernel(
                pdf, k1, b, n_docs, avgdl, prune=prune, tie_margin=margin,
                deleted=_unwrap_filter(deleted),
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
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return conjunctive_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def _phrase_qt_rows(self, queries: pd.DataFrame) -> pd.DataFrame:
        from bilies_go_spark.functions.tokenize import tokenize_py

        rows = []
        for r in queries.itertuples(index=False):
            toks = tokenize_py(r.text)
            if not toks:
                continue
            slots: dict[str, list[int]] = {}
            for j, t in enumerate(toks):
                slots.setdefault(t, []).append(j)
            for t, offs in sorted(slots.items()):
                rows.append((int(r.query_id), t, int(r.k), len(slots), offs))
        return pd.DataFrame(rows, columns=["query_id", "term", "k", "n_terms", "slots"])

    def _pos_entry(self, term: str, rows: pd.DataFrame):
        """(ids int64, tfs int32, dls int32, keys int64) for one term
        on the positional serving path — alive-filtered (engine-pinned
        tombstones baked in) with pre-sorted composite keys (the keys
        subsume the raw positions, so positions are not stored: a hot
        term's entry is ~20 B/posting + 8 B/occurrence).  Hot terms
        cache fill-once (:class:`_PosCache`), rare terms decode per
        query (cheap by definition).  Terms persisted by
        ``build_pos_cache`` load O(read) from the mmapped artifact
        (tiers merged, tombstones masked at load) instead of paying
        the O(decode + sort) fill."""
        hit = self.pos_cache.get(term)
        if hit is not None:
            return hit
        entry = self._pos_artifact_entry(term, rows)
        if entry is None:
            runs = [row_to_segment(r) for _, r in rows.iterrows()]
            entry = build_pos_entry(runs, self.deleted)
        dfreq = int(rows["df"].iloc[0]) if len(rows) else 0
        if dfreq >= max(1000, self.HOT_DF_FRAC * self.n_docs):
            self.pos_cache.put(term, entry)
        return entry

    def _pos_artifact_entry(self, term: str, rows: pd.DataFrame):
        """Load a term's serving entry from the build-time artifact
        (``index_build.build_pos_cache``): mmap the base generation's
        (ids, tfs, dls, keys) arrays, merge in live tier runs (decoded
        — tiers are small by construction), and mask the engine-pinned
        tombstones.  None on any miss (absent root/term, digest
        collision, artifact disabled) — the decode path is always a
        safe fallback."""
        if not self._pos_artifact:
            return None
        import json

        from bilies_go_spark.operators.index_build import pos_cache_term_dir

        d = pos_cache_term_dir(self.paths.pos_cache, term)
        try:
            with open(os.path.join(d, "meta.json")) as f:
                meta = json.load(f)
            if meta.get("term") != term:
                return None  # digest collision — treat as a miss
            ids = np.load(os.path.join(d, "ids.npy"), mmap_mode="r")
            tfs = np.load(os.path.join(d, "tfs.npy"), mmap_mode="r")
            dls = np.load(os.path.join(d, "dls.npy"), mmap_mode="r")
            keys = np.load(os.path.join(d, "keys.npy"), mmap_mode="r")
        except (OSError, ValueError):
            return None
        # the artifact is a pure function of the BASE segments; live
        # tier runs (doc-disjoint with the base) decode and merge here
        if "_src" in rows.columns and (rows["_src"] > 0).any():
            truns = [
                row_to_segment(r) for _, r in rows[rows["_src"] > 0].iterrows()
            ]
            t_ids, t_tfs, t_dls, t_keys = build_pos_entry(truns, None)
            if t_ids.size:
                ids = np.concatenate([np.asarray(ids), t_ids])
                tfs = np.concatenate([np.asarray(tfs), t_tfs])
                dls = np.concatenate([np.asarray(dls), t_dls])
                keys = _merge_sorted_i64(np.asarray(keys), t_keys)
        if self.deleted is not None and self.deleted.size:
            ids = np.asarray(ids)
            keep = _keep_mask(ids, self.deleted)
            if keep is not None and not keep.all():
                keys = np.asarray(keys)
                kkeep = _keep_mask(keys >> PHRASE_POS_SHIFT, self.deleted)
                keys = keys[kkeep]
                ids = ids[keep]
                tfs = np.asarray(tfs)[keep]
                dls = np.asarray(dls)[keep]
        return (
            np.asarray(ids, dtype=np.int64),
            np.asarray(tfs, dtype=np.int32),
            np.asarray(dls, dtype=np.int32),
            np.asarray(keys, dtype=np.int64),
        )

    def _pos_local(self, qt_pdf: pd.DataFrame, kind: str) -> pd.DataFrame:
        """Driver serving path for phrase / proximity over the
        positional quad+key cache: segment rows via the LRU term cache,
        hot terms' decoded+sorted arrays via :class:`_PosCache`, then
        pure searchsorted verification (:func:`_verify_phrase_keys` /
        :func:`_min_window_from_keys`) and candidate-restricted BM25 —
        no per-query decode or sort for hot terms.  Result-identical
        to the distributed kernels (pytest-pinned)."""
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        if qt_pdf.empty:
            return empty
        seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
        if seg_pdf.empty:
            return empty
        outs = []
        for qid, qrows in qt_pdf.groupby("query_id", sort=True):
            n_expected = int(qrows["n_terms"].iloc[0])
            terms = sorted(qrows["term"].unique())
            entries, df_map, ok = {}, {}, True
            for t in terms:
                rows = seg_pdf[seg_pdf["term"] == t]
                if rows.empty:
                    ok = False
                    break
                ent = self._pos_entry(t, rows)
                if ent[0].size == 0:
                    ok = False
                    break
                entries[t] = ent
                df_map[t] = int(rows["df"].iloc[0])
            if not ok or len(terms) < n_expected:
                continue  # some term matches nothing -> empty result
            # the merge/verify temporaries are occurrence-sized; fault
            # their pages in bulk (first-touch storms dominate on this
            # VM class — see prefault_heap)
            import bilies_go_spark as _bgs

            need = 2 * sum(
                sum(int(a.nbytes) for a in entries[t]) for t in terms
            ) + (64 << 20)
            _bgs.prefault_heap(min(need, 1 << 30))
            keys_by_term = {t: entries[t][3] for t in terms}
            if kind == "phrase":
                slots_map = dict(zip(qrows["term"], qrows["slots"]))
                slot_list = sorted(
                    (df_map[t], int(off), t) for t in terms for off in slots_map[t]
                )
                matched = _verify_phrase_keys(keys_by_term, slot_list)
            elif kind == "span":
                cseq = [str(t) for t in json.loads(qrows["cseq"].iloc[0])]
                first = (
                    int(qrows["first"].iloc[0]) if "first" in qrows.columns else 0
                )
                matched = _verify_span_ordered(
                    _first_mask_keys([keys_by_term[t] for t in cseq], first),
                    int(qrows["slop"].iloc[0]),
                )
            else:
                # conjunctive doc-candidate restriction (kernel parity)
                # before the O(Σ occurrences · T) window sweep.  The
                # intersection runs over the df-sized posting-id arrays
                # (never the occurrence-sized keys), and each term's key
                # array is shrunk by PER-CANDIDATE RANGE GATHER —
                # O(|cand| log n + |out|), no occurrence-sized temporary
                # — and only when the candidates actually shrink it
                # (>= 4x fewer docs); an all-common stopword query skips
                # the gather entirely and sweeps the cached arrays
                # as-is.  Mixed rare+hot queries drop from tens of
                # seconds to the rare term's own cost.
                sdocs = {t: np.sort(entries[t][0]) for t in terms}
                cand = None
                for t in sorted(terms, key=lambda x: sdocs[x].size):
                    d = sdocs[t]
                    if cand is None:
                        cand = d
                    else:
                        pidx = np.minimum(np.searchsorted(d, cand), d.size - 1)
                        cand = cand[d[pidx] == cand]
                    if cand.size == 0:
                        break
                if cand is None or cand.size == 0:
                    continue
                kbt = {}
                for t in terms:
                    kt = keys_by_term[t]
                    if cand.size * 4 >= sdocs[t].size:
                        kbt[t] = kt  # restriction would barely shrink it
                        continue
                    lo = np.searchsorted(kt, cand << PHRASE_POS_SHIFT)
                    hi = np.searchsorted(kt, (cand + 1) << PHRASE_POS_SHIFT)
                    lens = hi - lo
                    nz = lens > 0
                    lo, lens = lo[nz], lens[nz]
                    total = int(lens.sum())
                    idx = np.repeat(lo - (np.cumsum(lens) - lens), lens) + np.arange(
                        total
                    )
                    kbt[t] = kt[idx]
                matched = _min_window_from_keys(
                    kbt, int(qrows["slop"].iloc[0])
                )
            if matched.size == 0:
                continue
            per_term = {
                t: {
                    "idf": float(
                        np.log1p((self.n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
                    )
                }
                for t in terms
            }
            decoded = {t: _restrict_triple(entries[t][:3], matched) for t in terms}
            doc, acc = _merge_accumulate(
                decoded, per_term, terms, self.avgdl, self.k1, self.b, cand=matched
            )
            if doc.size == 0:
                continue
            k = int(qrows["k"].iloc[0])
            sel = _topk_select(doc, acc, k, tie_margin=self.tie_margin)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(sel.size, int(qid), dtype=np.int64),
                        "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                        "doc_id": doc[sel],
                        "score": acc[sel],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def _composed_local(self, qt_pdf: pd.DataFrame, flt) -> pd.DataFrame:
        """Driver serving path for composed (bool) queries over the
        positional key cache — the composed twin of :meth:`_pos_local`:
        MUST/MUST_NOT phrase verification runs on cached pre-sorted
        composite keys (:func:`_verify_phrase_keys`), term exclusions
        and the allowed set fold into one :class:`DocSetFilter` applied
        to the df-sized triples, and scoring is the pinned
        ascending-term fold restricted to the eligible docs.
        Result-identical to :func:`composed_query_kernel`
        (pytest-pinned): verification on unfiltered keys is safe
        because exclusion and the allowed set are doc-level — docs
        dropped by the filter lose every scoring posting and vanish
        exactly as the kernel's filter-first order drops them."""
        from functools import reduce

        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        if qt_pdf.empty:
            return empty
        seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
        if seg_pdf.empty:
            return empty

        def slot_list_of(p, df_map):
            slots: dict[str, list[int]] = {}
            for j, t in enumerate(p):
                slots.setdefault(t, []).append(j)
            return sorted(
                (df_map[t], off, t) for t, offs in slots.items() for off in offs
            )

        outs = []
        for qid, qrows in qt_pdf.groupby("query_id", sort=True):
            spec = json.loads(qrows["qspec"].iloc[0])
            phrases = [list(p) for p in spec.get("phrases", []) if p]
            neg_phrases = [list(p) for p in spec.get("neg_phrases", []) if p]
            k = int(qrows["k"].iloc[0])
            roles = dict(zip(qrows["term"], qrows["neg"]))
            entries, df_map = {}, {}
            for t in sorted(roles):
                rows = seg_pdf[seg_pdf["term"] == t]
                if rows.empty:
                    continue
                ent = self._pos_entry(t, rows)
                if ent[0].size:
                    entries[t] = ent
                    df_map[t] = int(rows["df"].iloc[0])
            neg = {t for t, r in roles.items() if int(r) == 1}
            vonly = {t for t, r in roles.items() if int(r) == 2}
            sterms = sorted(t for t in entries if t not in neg and t not in vonly)
            if not sterms:
                continue
            if any(any(t not in entries for t in set(p)) for p in phrases):
                continue  # a MUST-phrase term matches no document
            import bilies_go_spark as _bgs

            need = 2 * sum(
                sum(int(a.nbytes) for a in entries[t]) for t in entries
            ) + (64 << 20)
            _bgs.prefault_heap(min(need, 1 << 30))
            keys_by_term = {t: entries[t][3] for t in entries}

            # exclusions: MUST_NOT term docs + verified negated phrases
            excl_parts = [np.sort(entries[t][0]) for t in sorted(neg) if t in entries]
            for p in neg_phrases:
                if any(t not in entries for t in set(p)):
                    continue
                m = _verify_phrase_keys(keys_by_term, slot_list_of(p, df_map))
                if m.size:
                    excl_parts.append(m)
            excl = reduce(np.union1d, excl_parts) if excl_parts else None

            # MUST phrases, intersected
            cand: np.ndarray | None = None
            dead = False
            for p in phrases:
                m = _verify_phrase_keys(keys_by_term, slot_list_of(p, df_map))
                if m.size == 0:
                    dead = True
                    break
                cand = m if cand is None else np.intersect1d(cand, m, assume_unique=True)
                if cand.size == 0:
                    dead = True
                    break
            if dead:
                continue

            # _doc_filter returns None, a bare sorted tombstone array
            # (the historical contract), or a DocSetFilter
            if isinstance(flt, DocSetFilter):
                tomb, allow = flt.deleted, flt.allowed
            else:
                tomb, allow = flt, None
            if excl is not None:
                tomb = excl if tomb is None else np.union1d(tomb, excl)
            nflt = (
                DocSetFilter(tomb, allow)
                if tomb is not None or allow is not None
                else None
            )
            boost_map = (
                dict(zip(qrows["term"], qrows["boost"]))
                if "boost" in qrows.columns
                else {}
            )
            per_term = {
                t: {
                    "idf": float(boost_map.get(t, 1.0))
                    * float(
                        np.log1p((self.n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
                    )
                }
                for t in sterms
            }
            decoded = {t: _alive_triple(entries[t][:3], nflt) for t in sterms}
            # minimum_should_match: count DISTINCT matched clauses per
            # doc over the already-filtered triples, fold into cand
            msm = int(spec.get("msm", 0))
            if msm > 0 and "clauses" in qrows.columns:
                cl_of = dict(zip(qrows["term"], qrows["clauses"]))
                cl_map: dict[int, list[str]] = {}
                for t in sterms:
                    for c in json.loads(cl_of.get(t) or "[]"):
                        cl_map.setdefault(int(c), []).append(t)
                per_clause = [
                    np.unique(np.concatenate([decoded[t][0] for t in ts_]))
                    for ts_ in cl_map.values()
                    if any(decoded[t][0].size for t in ts_)
                ]
                if len(per_clause) < msm:
                    continue
                u, cnt = np.unique(
                    np.concatenate(per_clause), return_counts=True
                )
                eligible = u[cnt >= msm].astype(np.int64)
                if eligible.size == 0:
                    continue
                cand = (
                    eligible
                    if cand is None
                    else np.intersect1d(cand, eligible, assume_unique=True)
                )
                if cand.size == 0:
                    continue
            if cand is not None:
                decoded = {t: _restrict_triple(decoded[t], cand) for t in sterms}
            doc, acc = _merge_accumulate(
                decoded, per_term, sterms, self.avgdl, self.k1, self.b, cand=cand
            )
            if doc.size == 0:
                continue
            sel = _topk_select(doc, acc, k, tie_margin=self.tie_margin)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(sel.size, int(qid), dtype=np.int64),
                        "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                        "doc_id": doc[sel],
                        "score": acc[sel],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def _kernel_local(self, qt_pdf: pd.DataFrame, kernel_fn) -> pd.DataFrame:
        """Driver-local serving path for the pandas kernels: fetch
        the query terms' segment rows through the LRU term cache
        (:meth:`_seg_rows`, no Spark job) and run the pandas kernel per
        query — the millisecond point-query surface for phrase /
        proximity, mirroring :meth:`topk_pandas`."""
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        if qt_pdf.empty:
            return empty
        seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
        if seg_pdf.empty:
            return empty
        outs = []
        for qid, qrows in qt_pdf.groupby("query_id", sort=True):
            pdf = seg_pdf[seg_pdf["term"].isin(qrows["term"])]
            if pdf.empty:
                continue
            # attach the query's per-row columns: `slots` and `neg` are
            # per-TERM (mapped), everything else (k, n_terms, slop) is
            # constant per query
            per_term = qrows.set_index("term")
            extras = {}
            for c in qrows.columns:
                if c in ("query_id", "term"):
                    continue
                extras[c] = (
                    pdf["term"].map(per_term[c]).to_numpy()
                    if c in ("slots", "neg", "boost", "clauses")
                    else qrows[c].iloc[0]
                )
            pdf = pdf.assign(query_id=int(qid), **extras)
            outs.append(
                kernel_fn(
                    pdf,
                    self.k1,
                    self.b,
                    self.n_docs,
                    self.avgdl,
                    tie_margin=self.tie_margin,
                    deleted=self.deleted,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def topk_phrase(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """Exact phrase top-k (requires a positional index —
        ``BuildConfig(positions=True)``).

        ``mode='distributed'``: pruned-scan + broadcast-join plan, one
        kernel task per query — right whenever the phrase has a rare
        term (candidates bound the work).  ``n_shards > 1`` switches to
        the doc-range-sharded plan (:meth:`topk_phrase_sharded`) that
        parallelizes WITHIN a query — the plan for all-hot phrases at
        10^12 docs, where even the rarest term's full posting list is
        too big for one task; ``n_shards=None`` picks automatically
        from the heaviest query's estimated posting volume
        (:meth:`_auto_shards_qt`), so the all-hot case never needs a
        mode knob.  ``mode='local'``: the driver-side serving path
        (pyarrow fetch + LRU term cache, no Spark job).  All paths are
        result-identical."""
        if not self.meta.get("positions", False):
            raise ValueError(
                "phrase queries need an index built with BuildConfig(positions=True)"
            )
        qt_pdf = self._phrase_qt_rows(queries)
        if qt_pdf.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        if n_shards is None:
            # consulted in EVERY mode: a heavy query (Σ df past one
            # shard's worth) in mode='local' would otherwise sweep the
            # full occurrence stream in one driver thread — a measured
            # 9-31 s stall on an all-stopword phrase at 2M turns, and a
            # 100x stall at 100x data.  Routing to the doc-range-
            # sharded plan is result-identical (pytest-pinned); pass
            # n_shards=1 explicitly to force the driver-side path.
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            return self.topk_phrase_sharded(queries, qt_pdf, n_shards)
        if mode == "local":
            out = self._pos_local(qt_pdf, "phrase")
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slots array<int>",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return phrase_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_phrase_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded phrase plan: slice every matching
        segment's FOUR VByte streams (gaps/tfs/dls/positions) at block
        boundaries per shard — byte-offset arithmetic only, each byte
        shuffles once — then verify adjacency and score completely
        inside each (query, shard) and window-merge the shard top-ks.
        Exact because doc ranges partition the docs (a doc's postings
        AND positions land in one shard) and a term missing from a
        shard excludes every doc of that shard.  No task ever holds a
        full hot-term posting list — the 10^12-doc phrase plan."""
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slots array<int>",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        slice_schema = (
            "query_id bigint, k int, n_terms int, slots array<int>, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(pdf, bounds)
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _phrase_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    def _mpp_qt_rows(
        self, queries: pd.DataFrame, max_expansions: int = 0
    ) -> pd.DataFrame:
        """(query_id, term, k, n_terms, n_fixed, slots, is_alt) rows
        for ``match_phrase_prefix``: the query text analyzes as usual,
        the LAST token is the prefix (ES semantics — no ``*`` marker
        needed) and expands against the term dictionary via the pushed-
        down range scan; every other token is a fixed phrase slot.  A
        term can be both (fixed slot AND expansion) — one row carrying
        both roles."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        parsed = {}
        prefixes = set()
        for r in queries.itertuples(index=False):
            toks = tokenize_py(r.text)
            if len(toks) < 2:
                raise ValueError(
                    "match_phrase_prefix needs at least one fixed token "
                    f"before the prefix: {r.text!r}"
                )
            parsed[int(r.query_id)] = (toks[:-1], toks[-1], int(r.k))
            prefixes.add(toks[-1])
        expansion = self.expand_prefixes(sorted(prefixes)) if prefixes else {}
        if max_expansions > 0:
            # ES max_expansions semantics: keep the highest-df terms
            # (deterministic df desc, term asc) — a recall cut for
            # degenerate short prefixes whose dictionary range is a
            # large vocabulary fraction.  0 = uncapped (exact).
            all_exp = sorted({t for v in expansion.values() for t in v})
            dfs = self.term_dfs(all_exp)
            expansion = {
                p: [
                    t
                    for _, t in sorted(
                        ((-dfs.get(t, 0), t) for t in v)
                    )[:max_expansions]
                ]
                for p, v in expansion.items()
            }
        rows = []
        for qid, (fixed, prefix, k) in parsed.items():
            exp = expansion.get(prefix, [])
            slots: dict[str, list[int]] = {}
            for j, t in enumerate(fixed):
                slots.setdefault(t, []).append(j)
            alts = set(exp)
            for t in sorted(set(slots) | alts):
                rows.append(
                    (qid, t, k, len(slots), len(fixed), slots.get(t, []), int(t in alts))
                )
        return pd.DataFrame(
            rows,
            columns=["query_id", "term", "k", "n_terms", "n_fixed", "slots", "is_alt"],
        )

    _MPP_QT_SCHEMA = (
        "query_id bigint, term string, k int, n_terms int, n_fixed int, "
        "slots array<int>, is_alt int"
    )

    def topk_match_phrase_prefix(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
        max_expansions: int = 0,
    ) -> DataFrame:
        """ES ``match_phrase_prefix`` top-k (positional index): the
        fixed tokens as a contiguous run immediately followed by a
        token starting with the final (prefix) token, BM25-scored over
        the fixed distinct terms (deterministic exact scoring — see
        :func:`match_phrase_prefix_kernel`; ES's rewrite-dependent
        blended idf is a documented divergence).  Expansion is
        UNCAPPED by default (exact — ES's ``max_expansions=50`` is a
        recall cut); pass ``max_expansions`` to apply the ES cap
        (highest-df terms kept, deterministic) for degenerate short
        prefixes whose dictionary range is a large vocabulary
        fraction.  The range scan bounds expansion cost by the
        prefix's selectivity, and expansion postings only ever decode
        inside the fixed run's candidate blocks.  Same three result-identical
        paths as :meth:`topk_phrase`: one-task-per-query distributed,
        doc-range-sharded (auto-picked from Σ df in EVERY mode — a
        heavy query never sweeps one driver thread), and the
        driver-side serving path (``mode='local'``)."""
        if not self.meta.get("positions", False):
            raise ValueError(
                "match_phrase_prefix needs an index built with "
                "BuildConfig(positions=True)"
            )
        qt_pdf = self._mpp_qt_rows(queries, max_expansions=max_expansions)
        if qt_pdf.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            return self.topk_match_phrase_prefix_sharded(queries, qt_pdf, n_shards)
        if mode == "local":
            out = self._mpp_local(qt_pdf)
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(qt_pdf, schema=self._MPP_QT_SCHEMA)
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return match_phrase_prefix_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_match_phrase_prefix_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded ``match_phrase_prefix`` plan — the
        :meth:`topk_phrase_sharded` slicer with the fixed/alt columns
        riding through; shard-exact per :func:`_mpp_shard`."""
        from bilies_go_spark.functions.xxhash import term_bucket_py

        qt = self.spark.createDataFrame(qt_pdf, schema=self._MPP_QT_SCHEMA)
        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        extra = ("n_terms", "n_fixed", "slots", "is_alt")
        slice_schema = (
            "query_id bigint, k int, n_terms int, n_fixed int, slots array<int>, "
            "is_alt int, term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(pdf, bounds, extra_cols=extra)
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _mpp_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    def _mpp_local(self, qt_pdf: pd.DataFrame) -> pd.DataFrame:
        """Driver serving path for ``match_phrase_prefix`` over the
        positional key cache — the mpp twin of :meth:`_pos_local`:
        fixed-slot verification on cached pre-sorted composite keys
        (:func:`_phrase_surviving_keys_cached`), the prefix-expansion
        alt slot as a shifted-key union, scoring over the fixed terms
        only.  Result-identical to the distributed kernels
        (pytest-pinned)."""
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        if qt_pdf.empty:
            return empty
        seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
        if seg_pdf.empty:
            return empty
        outs = []
        for qid, qrows in qt_pdf.groupby("query_id", sort=True):
            n_expected = int(qrows["n_terms"].iloc[0])
            n_fixed = int(qrows["n_fixed"].iloc[0])
            slots_map = dict(zip(qrows["term"], qrows["slots"]))
            alt_flag = dict(zip(qrows["term"], qrows["is_alt"]))
            terms = sorted(qrows["term"].unique())
            entries, df_map = {}, {}
            for t in terms:
                rows = seg_pdf[seg_pdf["term"] == t]
                if rows.empty:
                    continue
                ent = self._pos_entry(t, rows)
                if ent[0].size == 0:
                    continue
                entries[t] = ent
                df_map[t] = int(rows["df"].iloc[0])
            fixed_terms = sorted(
                t for t in entries if len(slots_map.get(t, []))
            )
            alt_terms = sorted(t for t in entries if int(alt_flag.get(t, 0)))
            if len(fixed_terms) < n_expected or not alt_terms:
                continue
            import bilies_go_spark as _bgs

            need = 2 * sum(
                sum(int(a.nbytes) for a in entries[t]) for t in entries
            ) + (64 << 20)
            _bgs.prefault_heap(min(need, 1 << 30))
            keys_by_term = {t: entries[t][3] for t in entries}
            slot_list = sorted(
                (df_map[t], int(off), t)
                for t in fixed_terms
                for off in slots_map[t]
            )
            start_keys = _phrase_surviving_keys_cached(keys_by_term, slot_list)
            alt_keys = _alt_slot_keys_cached(keys_by_term, alt_terms, n_fixed)
            matched_keys = _intersect_sorted_i64(start_keys, alt_keys)
            if matched_keys.size == 0:
                continue
            docs = matched_keys >> PHRASE_POS_SHIFT  # sorted
            matched = docs[np.concatenate([[True], docs[1:] != docs[:-1]])]
            per_term = {
                t: {
                    "idf": float(
                        np.log1p((self.n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
                    )
                }
                for t in fixed_terms
            }
            decoded = {
                t: _restrict_triple(entries[t][:3], matched) for t in fixed_terms
            }
            doc, acc = _merge_accumulate(
                decoded, per_term, fixed_terms, self.avgdl, self.k1, self.b,
                cand=matched,
            )
            if doc.size == 0:
                continue
            k = int(qrows["k"].iloc[0])
            sel = _topk_select(doc, acc, k, tie_margin=self.tie_margin)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(sel.size, int(qid), dtype=np.int64),
                        "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                        "doc_id": doc[sel],
                        "score": acc[sel],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def topk_span_near(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """Ordered span top-k — ES/Lucene ``span_near(in_order=true)``:
        docs containing the query's analyzed tokens at strictly
        increasing positions IN QUERY ORDER with total gap
        ``(last - first + 1) - n <= slop`` (per-query ``slop`` column,
        default 0 — which makes it the phrase query).  The unordered
        variant is :meth:`topk_proximity` (minimal covering window).
        BM25-scored over the distinct clause terms; positional index
        required.  Modes/auto-sharding exactly as :meth:`topk_phrase`;
        all paths result-identical (pytest-pinned)."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "span queries need an index built with BuildConfig(positions=True)"
            )
        has_slop = "slop" in queries.columns
        has_first = "first" in queries.columns
        rows = []
        for r in queries.itertuples(index=False):
            cseq = tokenize_py(r.text)
            if not cseq:
                continue
            slop = int(getattr(r, "slop", 0) or 0) if has_slop else 0
            first = int(getattr(r, "first", 0) or 0) if has_first else 0
            spec = json.dumps(cseq)
            for t in sorted(set(cseq)):
                rows.append(
                    (int(r.query_id), t, int(r.k), len(set(cseq)), slop, spec, first)
                )
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(
            rows,
            columns=["query_id", "term", "k", "n_terms", "slop", "cseq", "first"],
        )
        if n_shards is None:
            # heavy queries route off the driver path in every mode,
            # exactly like topk_phrase (see the comment there)
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            return self.topk_span_sharded(queries, qt_pdf, n_shards)
        if mode == "local":
            out = self._pos_local(qt_pdf, "span")
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, "
            "slop int, cseq string, first int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return span_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_span_first(
        self, queries: pd.DataFrame, mode: str = "distributed"
    ) -> DataFrame:
        """Lucene ``span_first``: the ordered span (term sequence within
        ``slop``) must lie entirely within the doc's first ``first``
        tokens — exclusive span end ≤ ``first``, exactly the Lucene
        ``end`` parameter over 0-based positions.  A single-token text
        makes it the classic "term near the start of the document"
        query.
        Thin wrapper: :meth:`topk_span_near` with the per-query
        ``first`` column, which every span path (one-task kernel,
        driver-local, doc-range-sharded) applies as a position mask on
        the occurrence keys before chain verification — the mask is a
        branch-free compare on the composite key array, so the cost is
        below the chain DP it precedes."""
        if "first" not in queries.columns:
            raise ValueError("span_first queries need a 'first' column")
        return self.topk_span_near(queries, mode=mode)

    def topk_span_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded ordered-span plan — the span twin of
        :meth:`topk_phrase_sharded` (chain verification is doc-local,
        so each shard is exact on its doc range)."""
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, "
            "slop int, cseq string, first int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        slice_schema = (
            "query_id bigint, k int, n_terms int, slop int, cseq string, "
            "first int, term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(
                    pdf, bounds, extra_cols=("n_terms", "slop", "cseq", "first")
                )
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _span_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    def topk_span_or(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """Ordered span top-k with per-clause ALTERNATION — Lucene
        ``span_near(in_order=true)`` whose clauses are ``span_or``s of
        terms.  Query text: whitespace-separated clauses, alternatives
        joined by ``|`` (``\"hash|table join\"`` = (hash OR table) then
        join).  Per-query ``slop`` (default 0) and optional ``first``
        (span_first end limit) columns as in :meth:`topk_span_near`.
        The chain DP runs unchanged over per-clause key unions; BM25
        over the distinct clause terms the doc contains.  Same three
        result-identical paths as every positional surface."""
        from bilies_go_spark.functions.tokenize import tokenize_py
        from bilies_go_spark.functions.xxhash import term_bucket_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "span queries need an index built with BuildConfig(positions=True)"
            )
        has_slop = "slop" in queries.columns
        has_first = "first" in queries.columns
        rows = []
        cl_map: dict[int, list[list[str]]] = {}
        for r in queries.itertuples(index=False):
            clauses: list[list[str]] = []
            for piece in str(r.text).split():
                alts = []
                for alt in piece.split("|"):
                    toks = tokenize_py(alt)
                    if len(toks) != 1:
                        raise ValueError(
                            f"span_or alternative {alt!r} is not a single term"
                        )
                    alts.append(toks[0])
                clauses.append(sorted(set(alts)))
            if not clauses:
                continue
            cl_map[int(r.query_id)] = clauses
            slop = int(getattr(r, "slop", 0) or 0) if has_slop else 0
            first = int(getattr(r, "first", 0) or 0) if has_first else 0
            spec = json.dumps(clauses)
            for t in sorted({t for cl in clauses for t in cl}):
                rows.append((int(r.query_id), t, int(r.k), slop, spec, first))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(
            rows, columns=["query_id", "term", "k", "slop", "cseq", "first"]
        )
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1 or (mode != "local" and n_shards == 1):
            qt = self.spark.createDataFrame(
                qt_pdf,
                schema="query_id bigint, term string, k int, slop int, "
                "cseq string, first int",
            )
            terms = sorted(qt_pdf["term"].unique())
            buckets = sorted(
                {term_bucket_py(t, self.meta["n_buckets"]) for t in terms}
            )
            segs = self._segments_df(terms, buckets)
            tstats = self._tstats_df(terms, buckets)
            joined = segs.join(F.broadcast(qt), "term").join(
                F.broadcast(tstats), "term"
            )
            k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
            margin = self.tie_margin
            deleted = self.deleted
            if n_shards > 1:
                bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
                bounds[-1] = np.iinfo(np.int64).max
                slice_schema = (
                    "query_id bigint, k int, slop int, cseq string, first int, "
                    "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
                    + ", positions_vb binary"
                )

                def slicer(batches):
                    for pdf in batches:
                        out = _slice_segments_by_shard_pos(
                            pdf, bounds, extra_cols=("slop", "cseq", "first")
                        )
                        if out is not None:
                            yield out

                sliced = joined.mapInPandas(slicer, schema=slice_schema)

                def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                    lo = int(bounds[key[1]])
                    hi = int(bounds[key[1] + 1])
                    return _span_or_shard(
                        pdf, lo, hi, k1, b, n_docs, avgdl,
                        deleted=deleted, tie_margin=margin,
                    )

                partial = sliced.groupBy("query_id", "shard").applyInPandas(
                    shard_kernel, schema=TOPK_SCHEMA
                )
                return self._merge_shard_topk(partial, queries)

            def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
                return span_or_query_kernel(
                    pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
                )

            return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)
        # -- driver serving path ------------------------------------------------
        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        ).astype({"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"})
        seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
        outs = []
        for qid, qrows in qt_pdf.groupby("query_id", sort=True):
            clauses = cl_map[int(qid)]
            entries, df_map = {}, {}
            for t in sorted({t for cl in clauses for t in cl}):
                rws = seg_pdf[seg_pdf["term"] == t] if not seg_pdf.empty else seg_pdf
                if rws is None or len(rws) == 0:
                    continue
                ent = self._pos_entry(t, rws)
                if ent[0].size == 0:
                    continue
                entries[t] = ent
                df_map[t] = int(rws["df"].iloc[0])
            keys_by_term = {t: entries[t][3] for t in entries}
            keys_cl = []
            ok = True
            for cl in clauses:
                u = _clause_union_keys(keys_by_term, cl)
                if u.size == 0:
                    ok = False
                    break
                keys_cl.append(u)
            if not ok:
                continue
            first = int(qrows["first"].iloc[0])
            matched = _verify_span_ordered(
                _first_mask_keys(keys_cl, first), int(qrows["slop"].iloc[0])
            )
            if matched.size == 0:
                continue
            terms = sorted(entries)
            per_term = {
                t: {
                    "idf": float(
                        np.log1p((self.n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5))
                    )
                }
                for t in terms
            }
            decoded = {t: _restrict_triple(entries[t][:3], matched) for t in terms}
            doc, acc = _merge_accumulate(
                decoded, per_term, terms, self.avgdl, self.k1, self.b, cand=matched
            )
            if doc.size == 0:
                continue
            sel = _topk_select(doc, acc, int(qrows["k"].iloc[0]), tie_margin=self.tie_margin)
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(sel.size, int(qid), dtype=np.int64),
                        "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                        "doc_id": doc[sel],
                        "score": acc[sel],
                    }
                )
            )
        out = pd.concat(outs, ignore_index=True) if outs else empty
        if out.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)

    def topk_span_not(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """Lucene ``span_not`` top-k: an ordered TWO-clause include span
        (``text`` analyzes to exactly two tokens; per-query ``slop``,
        default 0) minus matches whose span contains an occurrence of
        the ``exclude`` term (endpoints inclusive — Lucene overlap
        semantics, pre/post = 0).  BM25 over the include terms only; a
        vocabulary-absent exclude term excludes nothing.  Three
        result-identical paths as every positional surface; the
        verification is ONE shared helper (:func:`_span_not_matched`)
        on all of them."""
        from bilies_go_spark.functions.tokenize import tokenize_py
        from bilies_go_spark.functions.xxhash import term_bucket_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "span queries need an index built with BuildConfig(positions=True)"
            )
        has_slop = "slop" in queries.columns
        rows = []
        specs: dict[int, tuple[list[str], str, int]] = {}
        for r in queries.itertuples(index=False):
            cseq = tokenize_py(r.text)
            if len(cseq) != 2:
                raise ValueError(
                    f"span_not include span must be exactly two tokens: {r.text!r}"
                )
            xtoks = tokenize_py(r.exclude)
            if len(xtoks) != 1:
                raise ValueError(
                    f"span_not exclude must be a single term: {r.exclude!r}"
                )
            xterm = xtoks[0]
            slop = int(getattr(r, "slop", 0) or 0) if has_slop else 0
            specs[int(r.query_id)] = (cseq, xterm, slop)
            spec = json.dumps(cseq)
            n_inc = len(set(cseq))
            for t in sorted(set(cseq) | {xterm}):
                rows.append(
                    (
                        int(r.query_id), t, int(r.k), n_inc, slop, spec, xterm,
                        int(t == xterm),
                    )
                )
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(
            rows,
            columns=[
                "query_id", "term", "k", "n_terms", "slop", "cseq", "xterm",
                "is_excl",
            ],
        )
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        if mode == "local" and n_shards == 1:
            empty = pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            ).astype(
                {"query_id": "int64", "rank": "int32", "doc_id": "int64", "score": "float64"}
            )
            seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
            outs = []
            for qid, (cseq, xterm, slop) in sorted(specs.items()):
                inc_terms = sorted(set(cseq))
                entries, df_map, ok = {}, {}, True
                for t in sorted(set(inc_terms) | {xterm}):
                    rws = (
                        seg_pdf[seg_pdf["term"] == t] if not seg_pdf.empty else seg_pdf
                    )
                    if rws is None or len(rws) == 0:
                        if t in inc_terms:
                            ok = False
                            break
                        continue
                    ent = self._pos_entry(t, rws)
                    if ent[0].size == 0 and t in inc_terms:
                        ok = False
                        break
                    entries[t] = ent
                    df_map[t] = int(rws["df"].iloc[0])
                if not ok:
                    continue
                keysx = entries[xterm][3] if xterm in entries else np.empty(
                    0, dtype=np.int64
                )
                matched = _span_not_matched(
                    entries[cseq[0]][3], entries[cseq[1]][3], keysx, slop
                )
                if matched.size == 0:
                    continue
                per_term = {
                    t: {
                        "idf": float(
                            np.log1p(
                                (self.n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5)
                            )
                        )
                    }
                    for t in inc_terms
                }
                decoded = {
                    t: _restrict_triple(entries[t][:3], matched) for t in inc_terms
                }
                doc, acc = _merge_accumulate(
                    decoded, per_term, inc_terms, self.avgdl, self.k1, self.b,
                    cand=matched,
                )
                if doc.size == 0:
                    continue
                kq = int(qt_pdf[qt_pdf["query_id"] == qid]["k"].iloc[0])
                sel = _topk_select(doc, acc, kq, tie_margin=self.tie_margin)
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(sel.size, qid, dtype=np.int64),
                            "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                            "doc_id": doc[sel],
                            "score": acc[sel],
                        }
                    )
                )
            out = pd.concat(outs, ignore_index=True) if outs else empty
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slop int, "
            "cseq string, xterm string, is_excl int",
        )
        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted
        if n_shards > 1:
            bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
            bounds[-1] = np.iinfo(np.int64).max
            slice_schema = (
                "query_id bigint, k int, n_terms int, slop int, cseq string, "
                "xterm string, is_excl int, term string, df bigint, shard int, "
                + SEGMENT_SLICE_FIELDS + ", positions_vb binary"
            )

            def slicer(batches):
                for pdf in batches:
                    out = _slice_segments_by_shard_pos(
                        pdf,
                        bounds,
                        extra_cols=("n_terms", "slop", "cseq", "xterm", "is_excl"),
                    )
                    if out is not None:
                        yield out

            sliced = joined.mapInPandas(slicer, schema=slice_schema)

            def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                lo = int(bounds[key[1]])
                hi = int(bounds[key[1] + 1])
                return _span_not_shard(
                    pdf, lo, hi, k1, b, n_docs, avgdl,
                    deleted=deleted, tie_margin=margin,
                )

            partial = sliced.groupBy("query_id", "shard").applyInPandas(
                shard_kernel, schema=TOPK_SCHEMA
            )
            return self._merge_shard_topk(partial, queries)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return span_not_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_proximity(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """Unordered proximity top-k (positional index): docs where all
        query terms occur within a token window of span <= ``slop``
        (per-query column).  Same plan/modes as :meth:`topk_phrase`;
        the kernel sweeps minimal covering windows over the candidate
        positions (:func:`proximity_query_kernel`).  ``n_shards > 1``
        switches to the doc-range-sharded plan
        (:meth:`topk_proximity_sharded`) — the plan for all-hot
        proximity at 10^12 docs, where even the rarest term's full
        posting list is too big for one task; ``n_shards=None`` picks
        automatically from the estimated posting volume."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "proximity queries need an index built with BuildConfig(positions=True)"
            )
        rows = []
        for r in queries.itertuples(index=False):
            qts = sorted(set(tokenize_py(r.text)))
            for t in qts:
                rows.append((int(r.query_id), t, int(r.k), len(qts), int(r.slop)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(rows, columns=["query_id", "term", "k", "n_terms", "slop"])
        if n_shards is None:
            # every mode — heavy local queries route to the sharded
            # plan (see topk_phrase); n_shards=1 forces driver-side
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            return self.topk_proximity_sharded(queries, qt_pdf, n_shards)
        if mode == "local":
            out = self._pos_local(qt_pdf, "proximity")
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slop int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return proximity_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_proximity_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded proximity plan: slice every matching
        segment's FOUR VByte streams (gaps/tfs/dls/positions) at block
        boundaries per shard — byte-offset arithmetic only, each byte
        shuffles once — then run the minimal-covering-window sweep and
        score completely inside each (query, shard) and window-merge
        the shard top-ks.  Exact because doc ranges partition the docs
        (a doc's postings AND positions land in one shard) and the
        sweep is doc-local.  No task ever holds a full hot-term posting
        list — closing the one scale gap phrase's sharded plan already
        closed (an all-hot proximity query at 10^12 docs no longer
        funnels the rarest term's full posting list into one task)."""
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, n_terms int, slop int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        slice_schema = (
            "query_id bigint, k int, n_terms int, slop int, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(
                    pdf, bounds, extra_cols=("n_terms", "slop")
                )
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _proximity_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    def topk_highlight_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded highlight plan: the same four-stream
        block-boundary slicing as phrase/proximity, with the per-doc
        best-window argmin run inside each (query, shard).  Exact
        because the argmin is doc-local — a doc's postings AND
        positions land in one shard, so its (win_start, win_end) is
        identical to the one-task plan's and rides through the window
        merge untouched.  No task ever holds a full hot-term posting
        list."""
        qt = self.spark.createDataFrame(
            qt_pdf, schema="query_id bigint, term string, k int, n_terms int"
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        slice_schema = (
            "query_id bigint, k int, n_terms int, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(pdf, bounds, extra_cols=("n_terms",))
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _highlight_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=HIGHLIGHT_SCHEMA
        )
        return self._merge_shard_topk(
            partial, queries, extra_cols=("win_start", "win_end")
        )

    def search_highlight(
        self,
        queries: pd.DataFrame,
        docs_df: "DataFrame | None" = None,
        n_shards: int | None = None,
    ) -> DataFrame:
        """Conjunctive top-k with highlight windows — the ES/Lucene
        highlighter surface: for each of a query's top-k AND-matches,
        the minimal token window covering one occurrence of every query
        term (0-based inclusive ``[win_start, win_end]``; equal spans
        tie-break leftmost), via :func:`highlight_query_kernel`.

        With ``docs_df`` (``doc_id, text``) the analyzed-token snippet
        for the window rides along as a ``snippet`` column: the top-k
        result (k·|queries| rows) broadcasts into a join against the
        docs scan, so the text side never shuffles.  Positional index
        required.  ``n_shards=None`` picks the doc-range-sharded plan
        (:meth:`topk_highlight_sharded`) automatically from the
        estimated posting volume, like phrase/proximity/composed —
        windows are doc-local, so they ride through the shard merge
        exactly."""
        from bilies_go_spark.functions.tokenize import tokenize_col, tokenize_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "highlight queries need an index built with BuildConfig(positions=True)"
            )
        rows = []
        for r in queries.itertuples(index=False):
            qts = sorted(set(tokenize_py(r.text)))
            for t in qts:
                rows.append((int(r.query_id), t, int(r.k), len(qts)))
        if not rows:
            return self.spark.createDataFrame([], schema=HIGHLIGHT_SCHEMA)
        qt_pdf = pd.DataFrame(rows, columns=["query_id", "term", "k", "n_terms"])
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            out = self.topk_highlight_sharded(queries, qt_pdf, n_shards)
        else:
            qt = self.spark.createDataFrame(
                qt_pdf, schema="query_id bigint, term string, k int, n_terms int"
            )
            terms, buckets = self._terms_and_buckets(queries)
            segs = self._segments_df(terms, buckets)
            tstats = self._tstats_df(terms, buckets)
            joined = segs.join(F.broadcast(qt), "term").join(
                F.broadcast(tstats), "term"
            )
            k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
            margin = self.tie_margin
            deleted = self.deleted

            def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
                return highlight_query_kernel(
                    pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
                )

            out = joined.groupBy("query_id").applyInPandas(
                kernel, schema=HIGHLIGHT_SCHEMA
            )
        if docs_df is None:
            return out
        toks = docs_df.select(
            "doc_id", "text", tokenize_col("text").alias("tk")
        )
        # tiny (query_id -> analyzed term set) side for <em> tagging;
        # broadcast like the top-k rows themselves
        qterms = self.spark.createDataFrame(
            [
                (int(r.query_id), sorted(set(tokenize_py(r.text))))
                for r in queries.itertuples(index=False)
            ],
            schema="query_id bigint, _qterms array<string>",
        )
        return (
            F.broadcast(out)
            .join(toks, "doc_id")
            .join(F.broadcast(qterms), "query_id")
            .withColumn(
                "_off",
                _win_char_offsets("text", "win_start", "win_end", "_qterms"),
            )
            .select(
                "query_id",
                "rank",
                "doc_id",
                "score",
                "win_start",
                "win_end",
                F.array_join(
                    F.slice(
                        F.col("tk"),
                        F.col("win_start").cast("int") + F.lit(1),
                        (F.col("win_end") - F.col("win_start")).cast("int")
                        + F.lit(1),
                    ),
                    " ",
                ).alias("snippet"),
                F.col("_off.char_start").alias("char_start"),
                F.col("_off.char_end").alias("char_end"),
                # ES-style fragment: the RAW text slice under the window
                # (char offsets index the original string — tags are a
                # presentation concern layered on these offsets)
                F.expr(
                    "substring(text, _off.char_start + 1, "
                    "_off.char_end - _off.char_start)"
                ).alias("fragment"),
                # ES highlighter presentation: window tokens matching a
                # query term wrapped in <em>..</em>, raw separators kept
                F.col("_off.fragment_em").alias("fragment_em"),
            )
        )

    def match_ids(
        self, queries: pd.DataFrame, allowed: "np.ndarray | None" = None
    ) -> DataFrame:
        """(query_id, doc_id) for EVERY doc containing all of a query's
        terms (AND semantics, no ranking) — the match-set surface that
        faceting, analytics joins, and export pipelines consume.

        Same pruned-scan + broadcast-join plan as the ranked paths; the
        kernel intersects without scoring, so the output is the full
        match set, distributed (one task per query) and join-ready —
        downstream facet joins shuffle on doc_id like any fact join."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        rows = []
        for r in queries.itertuples(index=False):
            qts = sorted(set(tokenize_py(r.text)))
            for t in qts:
                rows.append((int(r.query_id), t, len(qts)))
        if not rows:
            return self.spark.createDataFrame([], schema=MATCH_SCHEMA)
        qt = self.spark.createDataFrame(
            pd.DataFrame(rows, columns=["query_id", "term", "n_terms"]),
            schema="query_id bigint, term string, n_terms int",
        )
        terms, buckets = self._terms_and_buckets(queries)
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        deleted = self._ship_filter(self._doc_filter(allowed))

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return conjunctive_match_kernel(pdf, deleted=_unwrap_filter(deleted))

        return joined.groupBy("query_id").applyInPandas(kernel, schema=MATCH_SCHEMA)

    def significant_terms(
        self,
        queries: pd.DataFrame,
        docs_df: DataFrame,
        n_top: int = 15,
        round_digits: int | None = None,
    ) -> DataFrame:
        """ES ``significant_terms`` aggregation over conjunctive match
        sets, JLH heuristic: for each query, terms whose foreground
        document frequency (within matching docs) is significantly
        above their background frequency (the whole index) —
        ``score = (fg% - bg%) * fg%/bg%`` when fg% > bg%, else 0.
        Top ``n_top`` terms per query by (score desc, term asc).

        Plan: :meth:`match_ids` gives the foreground (the index, not a
        corpus scan); the matched ids prune the docs scan for
        re-analysis (`queries` are tiny vs the corpus, so AQE
        broadcasts the match side); foreground df is a distinct-count
        on (query_id, term, doc_id); background df joins Spark-side
        against the term-stats roots (base + tiers + delete deltas,
        summed — tombstones net out), shuffled on term like any
        dictionary join.  Nothing collects: at 10^12 docs the only
        full-table touch is the stats dictionary, which is vocabulary-
        sized, and the foreground side is match-set-sized."""
        from functools import reduce

        from bilies_go_spark.functions.tokenize import tokenize_col

        matches = self.match_ids(queries)
        fg_tot = matches.groupBy("query_id").agg(F.count("*").alias("fg_total"))
        toks = (
            matches.join(docs_df, "doc_id")
            .select("query_id", "doc_id", F.explode(tokenize_col("text")).alias("term"))
            .distinct()
        )
        fg = toks.groupBy("query_id", "term").agg(
            F.count("*").alias("fg_count")
        )
        bg = reduce(
            DataFrame.unionByName,
            [
                self.spark.read.parquet(p).select("term", "df")
                for p in self._ts_roots()
            ],
        ).groupBy("term").agg(F.sum("df").alias("bg_count"))
        j = fg.join(bg, "term").join(F.broadcast(fg_tot), "query_id")
        fg_pct = F.col("fg_count") / F.col("fg_total")
        bg_pct = F.col("bg_count") / F.lit(float(self.n_docs))
        score = F.when(
            fg_pct > bg_pct, (fg_pct - bg_pct) * fg_pct / bg_pct
        ).otherwise(F.lit(0.0))
        j = j.withColumn("score", score)
        if round_digits is not None:
            j = j.withColumn("score", F.round("score", round_digits))
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("term"))
        return (
            j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_top)
            .select("query_id", "rank", "term", "fg_count", "bg_count", "score")
        )

    def suggest_terms(self, queries: pd.DataFrame, n_top: int = 5) -> DataFrame:
        """ES term suggester (did-you-mean): per input token, the top
        dictionary terms within ES ``AUTO`` edit distance (0/1/2 by
        token length, :func:`_auto_fuzzy_dist`), ranked by (distance
        asc, df desc, term asc) — the ES default ``sort: score`` order
        for the term suggester, where score is edit proximity and
        frequency breaks ties.  The input token itself is never
        suggested.  ``queries`` = (query_id, token).

        Candidates come from the same SymSpell deletion-variant
        dictionary as fuzzy search (O(token variants) pruned pyarrow
        lookup, no vocabulary scan, no Spark job); the exact distance
        and dictionary df order the verified few.  At 10^12 docs the
        dictionary is vocabulary-sized and the variant table is its
        ~50× explode — both partition-pruned point lookups here."""
        toks = sorted(set(queries["token"]))
        exp = self.expand_fuzzy(toks, auto=True)
        cands = sorted({c for v in exp.values() for c in v})
        dfs = self.term_dfs(cands)
        rows = []
        for r in queries.itertuples(index=False):
            cs = [c for c in exp.get(r.token, []) if c != r.token]
            ranked = sorted(
                (_lev_exact(r.token, c), -int(dfs.get(c, 0)), c) for c in cs
            )
            for rank, (d, ndf, c) in enumerate(ranked[:n_top], 1):
                rows.append((int(r.query_id), r.token, rank, c, int(d), -ndf))
        schema = (
            "query_id bigint, token string, rank int, suggestion string, "
            "dist int, df bigint"
        )
        if not rows:
            return self.spark.createDataFrame([], schema=schema)
        return self.spark.createDataFrame(
            pd.DataFrame(
                rows,
                columns=["query_id", "token", "rank", "suggestion", "dist", "df"],
            ),
            schema=schema,
        )

    def suggest_completions(
        self, queries: pd.DataFrame, n_top: int = 5
    ) -> DataFrame:
        """ES completion suggester (search-as-you-type): per input
        prefix, the top dictionary terms STARTING WITH it, ranked by
        (df desc, term asc) — document frequency standing in for the
        ES completion weight (the natural corpus-derived popularity).
        ``queries`` = (query_id, prefix).

        Candidates come from the same pushed-down dictionary range
        scan as prefix search (:meth:`expand_prefixes` — parquet
        row-group stats prune, no vocabulary scan, no Spark job); at
        10^12 docs both the range scan and the df point reads are
        partition-pruned metadata lookups, O(matching terms)."""
        prefixes = sorted(set(queries["prefix"]))
        exp = self.expand_prefixes(prefixes)
        cands = sorted({c for v in exp.values() for c in v})
        dfs = self.term_dfs(cands)
        rows = []
        for r in queries.itertuples(index=False):
            # net df <= 0 means every posting is tombstoned (base df
            # plus negative delete deltas): a fully-deleted term must
            # not be suggested
            ranked = sorted(
                (-int(dfs.get(c, 0)), c)
                for c in exp.get(r.prefix, [])
                if int(dfs.get(c, 0)) > 0
            )
            for rank, (ndf, c) in enumerate(ranked[:n_top], 1):
                rows.append((int(r.query_id), r.prefix, rank, c, -ndf))
        schema = (
            "query_id bigint, prefix string, rank int, suggestion string, df bigint"
        )
        if not rows:
            return self.spark.createDataFrame([], schema=schema)
        return self.spark.createDataFrame(
            pd.DataFrame(
                rows, columns=["query_id", "prefix", "rank", "suggestion", "df"]
            ),
            schema=schema,
        )

    SUGGEST_PHRASE_SCHEMA = (
        "query_id bigint, rank int, suggestion string, n_docs bigint"
    )

    def suggest_phrases(
        self,
        queries: pd.DataFrame,
        n_top: int = 5,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """ES phrase suggester (whole-query did-you-mean) for two-token
        inputs: candidates per slot are the ES ``AUTO``-distance
        dictionary neighbors (including the token itself when in
        vocabulary — distance 0), and candidate PAIRS rank by the
        number of docs where the pair occurs ADJACENTLY (the corpus
        bigram frequency — the real-text collation signal ES draws
        from its shard-local bigram field), ties broken by pair text.
        The input pair itself is never suggested; pairs never seen
        adjacent are dropped.

        Plan: SymSpell candidate expansion (pruned dictionary lookup),
        then ONE decode per candidate term per task — pair counts are
        sorted-key intersections (``_bigram_pair_counts``), never a
        re-decode per pair.  Three paths: one-task-per-query
        distributed, doc-range-sharded (counts are shard-additive —
        auto-picked from Σ df in every mode), and ``mode='local'``
        over the positional serving cache.  The final ranking touches
        O(candidate pairs) rows — driver-metadata-sized."""
        from bilies_go_spark.functions.tokenize import tokenize_py
        from bilies_go_spark.functions.xxhash import term_bucket_py

        if not self.meta.get("positions", False):
            raise ValueError(
                "the phrase suggester needs an index built with "
                "BuildConfig(positions=True)"
            )
        parsed: dict[int, tuple[str, str]] = {}
        for r in queries.itertuples(index=False):
            toks = tokenize_py(r.text)
            if len(toks) != 2:
                raise ValueError(
                    f"phrase suggester expects exactly two tokens: {r.text!r}"
                )
            parsed[int(r.query_id)] = (toks[0], toks[1])
        all_toks = sorted({t for p in parsed.values() for t in p})
        exp = self.expand_fuzzy(all_toks, auto=True)
        qt_rows = []
        cands: dict[int, tuple[list[str], list[str]]] = {}
        for qid, (t1, t2) in parsed.items():
            c1 = exp.get(t1, [])
            c2 = exp.get(t2, [])
            if not c1 or not c2:
                continue
            cands[qid] = (c1, c2)
            role: dict[str, int] = {}
            for t in c1:
                role[t] = role.get(t, 0) | 1
            for t in c2:
                role[t] = role.get(t, 0) | 2
            for t in sorted(role):
                qt_rows.append((qid, t, 0, role[t]))
        if not qt_rows:
            return self.spark.createDataFrame([], schema=self.SUGGEST_PHRASE_SCHEMA)
        qt_pdf = pd.DataFrame(qt_rows, columns=["query_id", "term", "k", "role"])
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        counts: dict[int, dict[tuple[str, str], int]] = {}
        if mode == "local" and n_shards == 1:
            seg_pdf = self._seg_rows(sorted(qt_pdf["term"].unique()))
            for qid, (c1, c2) in sorted(cands.items()):
                keys_by_term = {}
                for t in sorted(set(c1) | set(c2)):
                    rows = seg_pdf[seg_pdf["term"] == t]
                    if rows.empty:
                        continue
                    ent = self._pos_entry(t, rows)
                    if ent[0].size:
                        keys_by_term[t] = ent[3]
                got = _bigram_pair_counts(keys_by_term, c1, c2)
                if got:
                    counts[qid] = got
        else:
            qt = self.spark.createDataFrame(
                qt_pdf, schema="query_id bigint, term string, k int, role int"
            )
            terms = sorted(qt_pdf["term"].unique())
            buckets = sorted(
                {term_bucket_py(t, self.meta["n_buckets"]) for t in terms}
            )
            segs = self._segments_df(terms, buckets)
            joined = segs.join(F.broadcast(qt), "term")
            pair_schema = "query_id bigint, c1 string, c2 string, n_docs bigint"
            if n_shards > 1:
                bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
                bounds[-1] = np.iinfo(np.int64).max
                slice_schema = (
                    "query_id bigint, k int, role int, term string, df bigint, "
                    "shard int, " + SEGMENT_SLICE_FIELDS + ", positions_vb binary"
                )

                def slicer(batches):
                    for pdf in batches:
                        out = _slice_segments_by_shard_pos(
                            pdf, bounds, extra_cols=("role",)
                        )
                        if out is not None:
                            yield out

                # the slicer needs a df column (ordering only) — ride
                # the broadcast stats in
                tstats = self._tstats_df(terms, buckets)
                sliced = joined.join(F.broadcast(tstats), "term").mapInPandas(
                    slicer, schema=slice_schema
                )

                deleted = self.deleted

                def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                    lo = int(bounds[key[1]])
                    hi = int(bounds[key[1] + 1])
                    return _suggest_bigram_shard(pdf, lo, hi, deleted=deleted)

                partial = sliced.groupBy("query_id", "shard").applyInPandas(
                    shard_kernel, schema=pair_schema
                )
                pair_df = partial.groupBy("query_id", "c1", "c2").agg(
                    F.sum("n_docs").alias("n_docs")
                )
            else:
                deleted = self.deleted

                def one_task_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
                    return _suggest_bigram_kernel(pdf, deleted=deleted)

                pair_df = joined.groupBy("query_id").applyInPandas(
                    one_task_kernel, schema=pair_schema
                )
            got = pair_df.toPandas()  # O(candidate pairs) — tiny
            for r in got.itertuples(index=False):
                counts.setdefault(int(r.query_id), {})[(r.c1, r.c2)] = int(r.n_docs)
        out_rows = []
        for qid, got in sorted(counts.items()):
            t1, t2 = parsed[qid]
            ranked = sorted(
                ((-n, a, b) for (a, b), n in got.items() if (a, b) != (t1, t2)),
            )
            for rank, (nn, a, b) in enumerate(ranked[:n_top], 1):
                out_rows.append((qid, rank, f"{a} {b}", -nn))
        if not out_rows:
            return self.spark.createDataFrame([], schema=self.SUGGEST_PHRASE_SCHEMA)
        return self.spark.createDataFrame(
            pd.DataFrame(
                out_rows, columns=["query_id", "rank", "suggestion", "n_docs"]
            ),
            schema=self.SUGGEST_PHRASE_SCHEMA,
        )

    # -- prefix (wildcard) expansion -------------------------------------------

    @staticmethod
    def _parse_prefix_query(text: str) -> list[tuple[str, bool]]:
        """Whitespace-split a prefix query into (token, is_prefix)
        pairs: a trailing ``*`` marks a prefix pattern; everything else
        normalizes through the standard analyzer.  Pieces that
        normalize to != 1 token are rejected (the analyzer would never
        produce them as single terms)."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        out = []
        for piece in text.split():
            is_prefix = piece.endswith("*")
            toks = tokenize_py(piece[:-1] if is_prefix else piece)
            if len(toks) != 1:
                raise ValueError(f"prefix-query piece {piece!r} is not a single term")
            out.append((toks[0], is_prefix))
        return out

    def expand_prefixes(self, prefixes: list[str]) -> dict[str, list[str]]:
        """Vocabulary terms matching each prefix, from the term-stats
        dictionary via a pushed-down range scan (``term >= p AND
        term < p+1``, the classic dictionary-range trick — parquet
        row-group stats prune, no full vocabulary read)."""
        import pyarrow.dataset as pads

        _, ts_dss = self._datasets()
        out: dict[str, set[str]] = {p: set() for p in prefixes}
        for p in sorted(set(prefixes)):
            upper = p[:-1] + chr(ord(p[-1]) + 1)
            filt = (pads.field("term") >= p) & (pads.field("term") < upper)
            for ds in ts_dss:
                t = ds.to_table(filter=filt, columns=["term"])
                out[p].update(t["term"].to_pylist())
        return {p: sorted(v) for p, v in out.items()}

    def topk_prefix(self, queries: pd.DataFrame, mode: str = "distributed") -> DataFrame:
        """Disjunctive top-k with Lucene-style trailing-``*`` prefix
        terms: each prefix expands against the term dictionary and the
        query scores as the OR of all expanded terms (plain BM25 sum —
        the exact-scoring MultiTermQuery rewrite).  Works on any index
        (no positions needed).  ``mode='local'`` serves driver-side
        through the term cache (no Spark job)."""
        parsed = {
            int(r.query_id): self._parse_prefix_query(r.text)
            for r in queries.itertuples(index=False)
        }
        prefixes = sorted(
            {tok for ps in parsed.values() for tok, isp in ps if isp}
        )
        expansion = self.expand_prefixes(prefixes) if prefixes else {}
        rows = []
        for r in queries.itertuples(index=False):
            terms: set[str] = set()
            for tok, isp in parsed[int(r.query_id)]:
                terms.update(expansion.get(tok, []) if isp else [tok])
            for t in sorted(terms):
                rows.append((int(r.query_id), t, int(r.k)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self._topk_expanded(
            pd.DataFrame(rows, columns=["query_id", "term", "k"]), mode
        )

    def _topk_expanded(self, qt_pdf: pd.DataFrame, mode: str) -> DataFrame:
        """Disjunctive top-k from an already-expanded (query_id, term,
        k) row set — the shared tail of prefix and fuzzy expansion."""
        if mode == "local":
            out = self._kernel_local(qt_pdf, score_query_kernel)
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf, schema="query_id bigint, term string, k int"
        )
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl, prune = self.k1, self.b, self.n_docs, self.avgdl, self.prune
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_query_kernel(
                pdf, k1, b, n_docs, avgdl, prune=prune, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    # -- wildcard expansion ----------------------------------------------------

    @staticmethod
    def _parse_wildcard_query(text: str) -> list[tuple[str, bool]]:
        """Whitespace-split a wildcard query into (piece, is_wild)
        pairs: a piece containing ``*`` (any run, incl. empty) or ``?``
        (exactly one char) anywhere is a Lucene wildcard pattern;
        everything else normalizes through the standard analyzer.
        Patterns are lowercased and must stay within the analyzer's
        term alphabet plus the two metacharacters — a pattern that
        could never match a vocabulary term is rejected loudly rather
        than silently matching nothing."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        out = []
        for piece in text.split():
            if "*" in piece or "?" in piece:
                patt = piece.lower()
                if not re.fullmatch(r"[a-z0-9*?]+", patt):
                    raise ValueError(
                        f"wildcard pattern {piece!r} leaves the term alphabet"
                    )
                out.append((patt, True))
            else:
                toks = tokenize_py(piece)
                if len(toks) != 1:
                    raise ValueError(
                        f"wildcard-query piece {piece!r} is not a single term"
                    )
                out.append((toks[0], False))
        return out

    def expand_wildcards(self, patterns: list[str]) -> dict[str, list[str]]:
        """Vocabulary terms matching each ``*``/``?`` pattern.  The
        literal prefix before the first metacharacter drives the same
        pushed-down dictionary range scan as :meth:`expand_prefixes`
        (parquet row-group stats prune the vocabulary read); the fetched
        slice then filters through the compiled pattern regex.  A
        pattern with no literal prefix (``*tion``) degrades to a full
        dictionary column scan — the identical cost Lucene pays for a
        leading wildcard, and still only the ``term`` column of the
        stats table, never the postings."""
        import pyarrow.dataset as pads

        _, ts_dss = self._datasets()
        out: dict[str, list[str]] = {}
        for patt in sorted(set(patterns)):
            lit = re.split(r"[*?]", patt, maxsplit=1)[0]
            rx = re.compile(
                "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in patt
                )
            )
            filt = None
            if lit:
                upper = lit[:-1] + chr(ord(lit[-1]) + 1)
                filt = (pads.field("term") >= lit) & (pads.field("term") < upper)
            hits: set[str] = set()
            for ds in ts_dss:
                t = ds.to_table(filter=filt, columns=["term"])
                hits.update(s for s in t["term"].to_pylist() if rx.fullmatch(s))
            out[patt] = sorted(hits)
        return out

    def topk_wildcard(self, queries: pd.DataFrame, mode: str = "distributed") -> DataFrame:
        """Disjunctive top-k with Lucene wildcard pieces (``*`` = any
        run, ``?`` = one char, anywhere in the piece): each pattern
        expands against the term dictionary and the query scores as the
        OR of all expanded terms plus the literal pieces — the same
        exact-scoring MultiTermQuery rewrite as :meth:`topk_prefix`,
        which this strictly generalizes.  Works on any index (no
        positions needed).  Reference analogue: the ES ``wildcard``
        query bilies-go ingests for (the engine delegates search to ES
        wholesale, cf. reference README); here the expansion is a
        dictionary-pruned scan, never a postings read."""
        parsed = {
            int(r.query_id): self._parse_wildcard_query(r.text)
            for r in queries.itertuples(index=False)
        }
        patterns = sorted(
            {tok for ps in parsed.values() for tok, isw in ps if isw}
        )
        expansion = self.expand_wildcards(patterns) if patterns else {}
        rows = []
        for r in queries.itertuples(index=False):
            terms: set[str] = set()
            for tok, isw in parsed[int(r.query_id)]:
                terms.update(expansion.get(tok, []) if isw else [tok])
            for t in sorted(terms):
                rows.append((int(r.query_id), t, int(r.k)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self._topk_expanded(
            pd.DataFrame(rows, columns=["query_id", "term", "k"]), mode
        )

    # -- regexp expansion --------------------------------------------------------

    _REGEXP_META = set(".?*+()[]{}|\\^$")

    def expand_regexps(self, patterns: list[str]) -> dict[str, list[str]]:
        """Vocabulary terms FULLY matching each regular expression (the
        ES/Lucene ``regexp`` query is implicitly anchored).  The
        literal prefix before the first metacharacter drives the same
        pushed-down dictionary range scan as :meth:`expand_prefixes`;
        the fetched slice filters through the compiled regex.  A
        pattern with no literal prefix degrades to a dictionary column
        scan — the cost Lucene pays for an unanchorable automaton, and
        still only the ``term`` column of the stats table."""
        import pyarrow.dataset as pads

        _, ts_dss = self._datasets()
        out: dict[str, list[str]] = {}
        for patt in sorted(set(patterns)):
            lit = ""
            stopper = ""
            for c in patt:
                if c in self._REGEXP_META:
                    stopper = c
                    break
                lit += c
            # The prefix filter is only sound when every full match
            # actually starts with ``lit``:
            # - a top-level '|' makes the prefix apply to the first
            #   branch only ('hash|join' would drop every 'join'
            #   match); any '|' bails to the full dictionary scan
            #   (conservative: a class-escaped '|' also bails)
            # - a quantifier after the last literal char can erase it
            #   ('jobs?' matches 'job', 'ab*' matches 'a'); drop that
            #   char from the range filter ('+' kept too — cheap and
            #   uniformly safe)
            if "|" in patt:
                lit = ""
            elif stopper in "?*+{":
                lit = lit[:-1]
            try:
                rx = re.compile(patt)
            except re.error as exc:
                raise ValueError(f"invalid regexp pattern {patt!r}: {exc}") from exc
            filt = None
            if lit:
                upper = lit[:-1] + chr(ord(lit[-1]) + 1)
                filt = (pads.field("term") >= lit) & (pads.field("term") < upper)
            terms: set[str] = set()
            for ds in ts_dss:
                t = ds.to_table(filter=filt, columns=["term"])
                terms.update(
                    v for v in t["term"].to_pylist() if rx.fullmatch(v)
                )
            out[patt] = sorted(terms)
        return out

    def topk_regexp(self, queries: pd.DataFrame, mode: str = "distributed") -> DataFrame:
        """Disjunctive top-k for the ES ``regexp`` query: each query's
        ``pattern`` expands against the term dictionary (full-match,
        implicitly anchored — Lucene semantics) and the query scores as
        the OR of all expanded terms, the same exact-scoring
        MultiTermQuery rewrite as :meth:`topk_prefix` /
        :meth:`topk_wildcard`.  Works on any index (no positions).
        ``queries`` = (query_id, pattern, k)."""
        pats = sorted(set(queries["pattern"]))
        expansion = self.expand_regexps(pats)
        rows = []
        for r in queries.itertuples(index=False):
            for t in expansion.get(r.pattern, []):
                rows.append((int(r.query_id), t, int(r.k)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self._topk_expanded(
            pd.DataFrame(rows, columns=["query_id", "term", "k"]), mode
        )

    def topk_synonyms(
        self,
        queries: pd.DataFrame,
        synonyms: "dict[str, list[str]]",
        mode: str = "distributed",
    ) -> DataFrame:
        """Query-time synonym expansion — the ES ``synonym`` token
        filter applied at search time (the operationally sane side:
        index-time synonyms bake the dictionary into 10^12 docs and
        need a full rebuild to change; query-time expansion is a
        per-query rewrite against the same index).  Each analyzed
        token unions with its synonym set and the query scores as the
        exact OR of the expansion — the same exact-scoring rewrite as
        prefix/wildcard/fuzzy (Lucene's blended-df SynonymQuery is a
        documented divergence, deterministically avoided).  Synonym
        keys and values analyze through the standard tokenizer;
        vocabulary-absent synonyms simply contribute no postings."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        syn_norm: dict[str, list[str]] = {}
        for key, vals in synonyms.items():
            kt = tokenize_py(key)
            if len(kt) != 1:
                raise ValueError(f"synonym key {key!r} is not a single term")
            out = []
            for v in vals:
                vt = tokenize_py(v)
                if len(vt) != 1:
                    raise ValueError(f"synonym value {v!r} is not a single term")
                out.append(vt[0])
            syn_norm[kt[0]] = out
        rows = []
        for r in queries.itertuples(index=False):
            terms: set[str] = set()
            for tok in tokenize_py(r.text):
                terms.add(tok)
                terms.update(syn_norm.get(tok, []))
            for t in sorted(terms):
                rows.append((int(r.query_id), t, int(r.k)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self._topk_expanded(
            pd.DataFrame(rows, columns=["query_id", "term", "k"]), mode
        )

    # -- field collapsing ------------------------------------------------------

    def topk_collapse(
        self,
        queries: pd.DataFrame,
        groups_df: DataFrame,
        round_digits: int | None = None,
    ) -> DataFrame:
        """ES field collapsing (the ``collapse`` request body option):
        rank the disjunctive match set normally, keep only the single
        best hit per distinct collapse-field value, re-rank the
        survivors, return the top k *groups* per query.  ``groups_df``
        is ``(doc_id, grp)`` — the collapse field projected from the
        docs table (nulls collapse into one group, ES missing-field
        semantics).

        Plan: the full match set scores through the identical pruned
        segment scan + per-query kernel as :meth:`topk_distributed`
        (k lifted to n_docs, so the heap never cuts), then joins the
        collapse column as a fact join — AQE converts it to broadcast
        when the match set is selective — and two windows do
        best-per-group and the final ranking.  Scale note: at 10^12
        docs the doc-range-sharded plan applies unchanged — each shard
        returns its top-k *groups* (best hit per group), and per-shard
        top-k groups provably suffice for the exact global merge: if a
        group is in the global top k, the shard holding its best hit
        cannot have k groups whose shard-bests all beat it, because
        each of those would also be a globally-better group.
        ``round_digits`` pins the ordering the selection uses to the
        driver-parity rounding so best-per-group and the final rank
        agree with a rounded-score oracle."""
        big = queries.copy()
        big["k"] = int(self.n_docs)
        scored = self.topk_distributed(big, n_shards=1).drop("rank")
        if round_digits is not None:
            scored = scored.withColumn("score", F.round("score", round_digits))
        j = scored.join(groups_df, "doc_id")
        w_grp = Window.partitionBy("query_id", "grp").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        best = (
            j.withColumn("_rn", F.row_number().over(w_grp))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        w_q = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        kdf = F.broadcast(
            self.spark.createDataFrame(
                queries[["query_id", "k"]], schema="query_id bigint, k int"
            )
        )
        return (
            best.join(kdf, "query_id")
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score", "grp")
        )

    def topk_top_hits(
        self,
        queries: pd.DataFrame,
        groups_df: DataFrame,
        n_buckets: int = 5,
        n_hits: int = 3,
        round_digits: int | None = None,
    ) -> DataFrame:
        """The ES ``terms`` aggregation with a ``top_hits`` sub-agg:
        bucket the match set by a field, keep the top ``n_buckets``
        buckets by doc count (ties: grp asc — the ES ``_key`` order
        fallback), and inside each bucket the top ``n_hits`` hits by
        score (rounded, doc_id tiebreak).  ``groups_df`` =
        ``(doc_id, grp)``.

        Plan: the full match set scores through the standard kernel
        (k lifted), the bucket column joins as a fact join, a count
        window sizes buckets and two row_numbers cut — all JVM-side
        window work over the match set, nothing collects.  Scale: the
        same doc-range-sharded merge as :meth:`topk_collapse` applies —
        per-shard bucket counts sum, per-shard per-bucket top hits
        merge by the standard top-k argument."""
        big = queries.copy()
        big["k"] = int(self.n_docs)
        scored = self.topk_distributed(big, n_shards=1).drop("rank")
        if round_digits is not None:
            scored = scored.withColumn("score", F.round("score", round_digits))
        j = scored.join(groups_df, "doc_id")
        w_cnt = Window.partitionBy("query_id", "grp")
        j = j.withColumn("bucket_count", F.count("*").over(w_cnt))
        w_hit = Window.partitionBy("query_id", "grp").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        j = j.withColumn("hit_rank", F.row_number().over(w_hit)).filter(
            F.col("hit_rank") <= n_hits
        )
        w_bkt = Window.partitionBy("query_id").orderBy(
            F.desc("bucket_count"), F.asc("grp")
        )
        ranked_buckets = (
            j.select("query_id", "grp", "bucket_count")
            .distinct()
            .withColumn("bucket_rank", F.row_number().over(w_bkt))
            .filter(F.col("bucket_rank") <= n_buckets)
        )
        return j.join(ranked_buckets, ["query_id", "grp", "bucket_count"]).select(
            "query_id",
            "bucket_rank",
            "grp",
            "bucket_count",
            "hit_rank",
            "doc_id",
            "score",
        )

    def topk_function_score(
        self,
        queries: pd.DataFrame,
        factors_df: DataFrame,
        round_digits: int | None = None,
    ) -> DataFrame:
        """ES ``function_score`` with ``boost_mode: multiply``: the
        final score is BM25 × a per-doc factor computed from doc
        metadata (decay functions, ``field_value_factor``, …— the
        caller composes the functions into ``factors_df`` =
        ``(doc_id, factor)``; ``score_mode`` across functions is folded
        there too).  Docs absent from ``factors_df`` keep factor 1
        (the ES ``missing`` default).

        Because the factor re-orders hits, top-k must rank the
        MODIFIED scores: the full match set scores through the same
        pruned-scan kernel as :meth:`topk_distributed` (k lifted to
        n_docs), the factor joins as a fact join (AQE broadcasts when
        selective), and one window ranks.  Scale note: the factor is a
        pure per-doc column — at 10^12 docs it lives as a doc-range-
        sliced artifact next to the dl stats, each shard task reads
        only its range, and the sharded merge is the standard top-k
        merge (factors don't couple docs).  Block-max pruning over
        modified scores stays exact when blocks carry
        ub(bm25) × max-factor per doc range — not implemented here;
        the uncut kernel is the exactness baseline."""
        big = queries.copy()
        big["k"] = int(self.n_docs)
        scored = self.topk_distributed(big, n_shards=1).drop("rank")
        j = scored.join(factors_df, "doc_id", "left").withColumn(
            "score",
            F.col("score") * F.coalesce(F.col("factor"), F.lit(1.0)),
        )
        if round_digits is not None:
            j = j.withColumn("score", F.round("score", round_digits))
        w_q = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        kdf = F.broadcast(
            self.spark.createDataFrame(
                queries[["query_id", "k"]], schema="query_id bigint, k int"
            )
        )
        return (
            j.join(kdf, "query_id")
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )

    def topk_boosting(
        self,
        queries: pd.DataFrame,
        negative_boost: float = 0.5,
        round_digits: int | None = None,
    ) -> DataFrame:
        """The ES ``boosting`` query: hits of the positive query rank
        normally, but any hit ALSO matching the negative query (OR over
        its terms) is demoted — score × ``negative_boost`` — instead of
        excluded (the difference from MUST_NOT).  ``queries`` carries
        ``text`` (positive) and ``neg_text`` (negative) columns.

        Plan: the positive side scores its full match set through the
        standard kernel (k lifted — demotion re-orders, so the cut must
        happen after); the negative OR match set comes from the same
        kernel on the negative terms (score > 0 ⇔ contains any term),
        ids only; a left join marks demoted docs and one window ranks.
        Both sides are index scans — no corpus touch; the join is
        match-set × match-set, AQE-broadcast when selective."""
        big = queries[["query_id", "text", "k"]].copy()
        big["k"] = int(self.n_docs)
        pos = self.topk_distributed(big, n_shards=1).drop("rank")
        negq = queries[["query_id", "neg_text", "k"]].rename(
            columns={"neg_text": "text"}
        )
        negq = negq[negq["text"].str.strip().astype(bool)].copy()
        negq["k"] = int(self.n_docs)
        if len(negq):
            neg = (
                self.topk_distributed(negq, n_shards=1)
                .select("query_id", "doc_id")
                .withColumn("_neg", F.lit(True))
            )
        else:
            neg = self.spark.createDataFrame(
                [], schema="query_id bigint, doc_id bigint, _neg boolean"
            )
        j = pos.join(neg, ["query_id", "doc_id"], "left").withColumn(
            "score",
            F.when(F.col("_neg"), F.col("score") * F.lit(float(negative_boost)))
            .otherwise(F.col("score")),
        )
        if round_digits is not None:
            j = j.withColumn("score", F.round("score", round_digits))
        w_q = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        kdf = F.broadcast(
            self.spark.createDataFrame(
                queries[["query_id", "k"]], schema="query_id bigint, k int"
            )
        )
        return (
            j.join(kdf, "query_id")
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )

    def topk_rescore(
        self,
        queries: pd.DataFrame,
        window: int = 50,
        query_weight: float = 1.0,
        rescore_weight: float = 1.0,
        round_digits: int | None = None,
    ) -> DataFrame:
        """The ES ``rescore`` API: the base query's top ``window`` hits
        re-score as ``query_weight × base + rescore_weight × phrase``
        (``score_mode: total``), where the phrase score is the BM25 sum
        over the rescore phrase's terms for docs containing the exact
        phrase — hits in the window that don't match the phrase keep
        the weighted base score.  ``queries`` = (query_id, text,
        phrase, k); k ≤ window.

        Plan: the cheap disjunctive kernel retrieves the window (this
        is the point of rescore — the expensive positional check runs
        on ``window`` docs per query, not the match set); the phrase
        side reuses :meth:`topk_phrase` uncut and joins back on
        (query_id, doc_id).  The window cut uses the rounded-score
        ordering (doc_id tiebreak) so a rounded-rank oracle can state
        it exactly.  At 10^12 docs the window is constant-sized per
        query, so rescore cost is independent of corpus size."""
        rd = round_digits if round_digits is not None else 6
        big = queries[["query_id", "text", "k"]].copy()
        big["k"] = int(window)
        base = self.topk_distributed(big, n_shards=1).drop("rank")
        w_cut = Window.partitionBy("query_id").orderBy(
            F.desc(F.round("score", rd)), F.asc("doc_id")
        )
        win = (
            base.withColumn("_wr", F.row_number().over(w_cut))
            .filter(F.col("_wr") <= int(window))
            .drop("_wr")
        )
        phq = queries[["query_id", "phrase", "k"]].rename(columns={"phrase": "text"})
        phq = phq[phq["text"].str.strip().astype(bool)].copy()
        phq["k"] = int(self.n_docs)
        if len(phq):
            phr = (
                self.topk_phrase(phq)
                .select("query_id", "doc_id", F.col("score").alias("_psc"))
            )
        else:
            phr = self.spark.createDataFrame(
                [], schema="query_id bigint, doc_id bigint, _psc double"
            )
        j = win.join(phr, ["query_id", "doc_id"], "left").withColumn(
            "score",
            F.lit(float(query_weight)) * F.col("score")
            + F.lit(float(rescore_weight)) * F.coalesce(F.col("_psc"), F.lit(0.0)),
        )
        if round_digits is not None:
            j = j.withColumn("score", F.round("score", round_digits))
        w_q = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        kdf = F.broadcast(
            self.spark.createDataFrame(
                queries[["query_id", "k"]], schema="query_id bigint, k int"
            )
        )
        return (
            j.join(kdf, "query_id")
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )

    @staticmethod
    def _parse_boolean_query(text: str) -> list[tuple[str, bool]]:
        """(token, is_negated) pairs: a leading ``-`` (the Lucene
        MUST_NOT marker) excludes docs containing the term."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        out = []
        for piece in text.split():
            neg = piece.startswith("-")
            toks = tokenize_py(piece[1:] if neg else piece)
            if len(toks) != 1:
                raise ValueError(f"boolean-query piece {piece!r} is not a single term")
            out.append((toks[0], neg))
        return out

    def topk_boolean(self, queries: pd.DataFrame, mode: str = "distributed") -> DataFrame:
        """Top-k with Lucene-style leading-``-`` negated terms: score =
        OR of the positive terms, docs containing ANY negated term
        excluded (:func:`boolean_query_kernel`).  Works on any index."""
        rows = []
        for r in queries.itertuples(index=False):
            seen: dict[str, bool] = {}
            for tok, neg in self._parse_boolean_query(r.text):
                # a term both required and negated -> negation wins
                seen[tok] = seen.get(tok, False) or neg
            for t, neg in sorted(seen.items()):
                rows.append((int(r.query_id), t, int(r.k), int(neg)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(rows, columns=["query_id", "term", "k", "neg"])
        if mode == "local":
            out = self._kernel_local(qt_pdf, boolean_query_kernel)
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf, schema="query_id bigint, term string, k int, neg int"
        )
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl, prune = self.k1, self.b, self.n_docs, self.avgdl, self.prune
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return boolean_query_kernel(
                pdf, k1, b, n_docs, avgdl, prune=prune, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    @staticmethod
    def _parse_dis_max_query(text: str) -> list[list[str]]:
        """``|``-separated clauses, each a bag of terms (ES ``dis_max``
        over ``match`` sub-queries); empty clauses drop; duplicate
        terms within a clause fold (BM25 scores the distinct term)."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        out = []
        for piece in text.split("|"):
            toks = sorted(set(tokenize_py(piece)))
            if toks:
                out.append(toks)
        return out

    def topk_dis_max(
        self,
        queries: pd.DataFrame,
        tie_breaker: float = 0.3,
        mode: str = "distributed",
        n_shards: int | None = None,
    ) -> DataFrame:
        """ES ``dis_max`` query — clauses separated by ``|`` in the
        query text; score = best clause + tie_breaker x Σ(other
        clauses) (:func:`dis_max_query_kernel`).  Same pruned-scan +
        broadcast-join plan as :meth:`topk_distributed`, one kernel
        task per query; ``mode='local'`` serves through the LRU term
        cache.  Works on any index.  ``n_shards=None`` consults the
        posting-volume estimator in EVERY mode (ADVICE r5: an all-hot
        dis_max previously decoded full posting lists in one task /
        one driver thread — the exact stall the r5 routing fix removed
        from the positional surfaces) and routes heavy queries to the
        doc-range-sharded twin (:meth:`topk_dis_max_sharded`,
        result-identical); ``n_shards=1`` forces the one-task paths."""
        import json as _json

        rows = []
        for r in queries.itertuples(index=False):
            t2c: dict[str, list[int]] = {}
            for ci, toks in enumerate(self._parse_dis_max_query(r.text)):
                for t in toks:
                    t2c.setdefault(t, []).append(ci)
            for t, cls in sorted(t2c.items()):
                rows.append(
                    (int(r.query_id), t, int(r.k), _json.dumps(cls), float(tie_breaker))
                )
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(
            rows, columns=["query_id", "term", "k", "clauses", "tie"]
        )
        if n_shards is None:
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards > 1:
            return self.topk_dis_max_sharded(queries, qt_pdf, n_shards)
        if mode == "local":
            out = self._kernel_local(qt_pdf, dis_max_query_kernel)
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, clauses string, tie double",
        )
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        deleted = self.deleted

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return dis_max_query_kernel(
                pdf, k1, b, n_docs, avgdl, tie_margin=margin, deleted=deleted
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_dis_max_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int
    ) -> DataFrame:
        """Doc-range-sharded ``dis_max`` plan: the :meth:`topk_sharded`
        slicer with the per-term clause list and tie_breaker riding
        through; shard-exact per :func:`_dis_max_shard` (doc ranges
        partition the docs, so each clause fold happens entirely
        inside one shard per doc)."""
        from bilies_go_spark.functions.xxhash import term_bucket_py

        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, clauses string, tie double",
        )
        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        extra = ("clauses", "tie")
        slice_schema = (
            "query_id bigint, k int, clauses string, tie double, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard(pdf, bounds, extra_cols=extra)
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        deleted = self.deleted
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _dis_max_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl, deleted=deleted, tie_margin=margin
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    # -- fuzzy (edit-distance) expansion ---------------------------------------

    @staticmethod
    def _parse_fuzzy_query(text: str) -> list[tuple[str, bool]]:
        """(token, is_fuzzy) pairs: a trailing ``~`` (the Lucene fuzzy
        marker) requests Levenshtein-distance-<=1 dictionary expansion;
        everything else matches exactly."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        out = []
        for piece in text.split():
            is_fuzzy = piece.endswith("~")
            toks = tokenize_py(piece[:-1] if is_fuzzy else piece)
            if len(toks) != 1:
                raise ValueError(f"fuzzy-query piece {piece!r} is not a single term")
            out.append((toks[0], is_fuzzy))
        return out

    @staticmethod
    def _deletion_variants(tok: str) -> list[str]:
        return [tok] + [tok[:i] + tok[i + 1 :] for i in range(len(tok))]

    @staticmethod
    def _deletion_variants_d(tok: str, depth: int) -> set[str]:
        """All distinct strings reachable by deleting up to ``depth``
        characters from ``tok`` (depth is 0..2 in practice — ES AUTO
        never goes beyond distance 2)."""
        out = {tok}
        frontier = {tok}
        for _ in range(depth):
            frontier = {
                v[:i] + v[i + 1 :] for v in frontier for i in range(len(v))
            }
            out |= frontier
        return out

    def _tv_depth2(self, tv_roots: list[str]) -> bool:
        """True iff EVERY variant root was built with depth-2 deletions
        (the ``_symspell.json`` marker, index_build.build_term_variants)
        — required before AUTO expansion may use the dictionary path;
        a depth-1-only table would silently miss distance-2 matches."""
        import json

        for root in tv_roots:
            try:
                with open(os.path.join(root, "_symspell.json")) as f:
                    if int(json.load(f).get("max_depth", 1)) < 2:
                        return False
            except (OSError, ValueError):
                return False
        return True

    def _tv_roots(self) -> list[str]:
        """Variant-dictionary roots, one per vocabulary (stats) root.
        Returns [] — routing expansion to the legacy vocabulary scan —
        unless EVERY vocabulary root has its variants twin: an index
        whose base generation predates term_variants but that gained a
        tier via compact_tiered (which builds tier_term_variants) would
        otherwise take the dictionary path and silently miss the entire
        base vocabulary."""
        pairs = [(self.paths.term_stats, self.paths.term_variants)] + [
            (self.paths.tier_term_stats(t), self.paths.tier_term_variants(t))
            for t in self.tiers
        ]
        out = []
        for ts, tv in pairs:
            if not os.path.isdir(ts):
                continue  # no vocabulary there -> no variants expected
            if not os.path.isdir(tv):
                return []
            out.append(tv)
        return out

    def expand_fuzzy(
        self, toks: list[str], auto: bool = False, dist: int | None = None
    ) -> dict[str, list[str]]:
        """Dictionary terms within edit distance of each token, via the
        PRE-BUILT SymSpell deletion-variant dictionary
        (index_build.build_term_variants): any distance-<=d pair shares
        a <=d-char-deletion variant, so expansion is a variant_bucket-
        pruned pyarrow equality lookup over the query's own variants
        (O(query variants), no Spark job, never a vocabulary scan) +
        an exact edit-distance verify on the handful of candidates.

        ``auto=False``: Levenshtein <= 1 for every token (the legacy
        trailing-``~`` surface).  ``auto=True``: ES ``AUTO`` fuzziness
        — per-token distance 0/1/2 by length (:func:`_auto_fuzzy_dist`),
        requiring a depth-2 variant table (``_symspell.json`` marker)
        when any token reaches distance 2.  Indexes whose variant
        tables are missing or too shallow fall back to the legacy
        per-batch vocabulary-scan join."""
        if not toks:
            return {}
        dists = {
            t: (dist if dist is not None else (_auto_fuzzy_dist(t) if auto else 1))
            for t in set(toks)
        }
        tv_roots = self._tv_roots()
        if not tv_roots or (
            max(dists.values()) > 1 and not self._tv_depth2(tv_roots)
        ):
            return self._expand_fuzzy_scan(toks, auto=auto, dist=dist)
        import pyarrow.dataset as pads

        from bilies_go_spark.functions.xxhash import term_bucket_py

        qvar: dict[str, set[str]] = {}
        for t in sorted(set(toks)):
            for v in self._deletion_variants_d(t, dists[t]):
                qvar.setdefault(v, set()).add(t)
        vs = sorted(qvar)
        buckets = sorted({term_bucket_py(v, self.meta["n_buckets"]) for v in vs})
        filt = pads.field("variant_bucket").isin(buckets) & pads.field("variant").isin(vs)
        out: dict[str, set[str]] = {t: set() for t in set(toks)}
        for root in tv_roots:
            tb = pads.dataset(root, partitioning="hive").to_table(
                filter=filt, columns=["variant", "term"]
            )
            for v, term in zip(tb["variant"].to_pylist(), tb["term"].to_pylist()):
                for qt in qvar[v]:
                    if _lev_bounded(qt, term, dists[qt]):
                        out[qt].add(term)
        return {t: sorted(v) for t, v in out.items()}

    def _expand_fuzzy_scan(
        self, toks: list[str], auto: bool = False, dist: int | None = None
    ) -> dict[str, list[str]]:
        """Legacy expansion for variant-table-less indexes: the same
        SymSpell join as DataFrame ops — the vocabulary side streams
        through explode + broadcast-join (never collected, linear in
        dictionary size), and only the tiny verified expansion
        returns.  Correct but pays a full vocabulary scan per batch.
        ``auto=True`` applies ES AUTO per-token distances (vocabulary
        side explodes depth-2 variants for >= 6-char terms)."""
        from bilies_go_spark.operators.index_build import (
            DELETION_VARIANTS2_EXPR,
            DELETION_VARIANTS_EXPR,
        )

        dists = {
            t: (dist if dist is not None else (_auto_fuzzy_dist(t) if auto else 1))
            for t in set(toks)
        }
        qrows = [
            (t, v, dists[t])
            for t in sorted(set(toks))
            for v in sorted(self._deletion_variants_d(t, dists[t]))
        ]
        qv = self.spark.createDataFrame(
            pd.DataFrame(qrows, columns=["qtok", "variant", "dist"]),
            schema="qtok string, variant string, dist int",
        )
        from functools import reduce

        vocab = reduce(
            DataFrame.unionByName,
            [
                self.spark.read.parquet(p).select("term")
                for p in self._ts_roots()
            ],
        ).distinct()
        deep = auto or (dist is not None and dist > 1)
        vexpr = DELETION_VARIANTS2_EXPR if deep else DELETION_VARIANTS_EXPR
        cand = (
            vocab.select("term", F.explode(F.expr(vexpr)).alias("variant"))
            .join(F.broadcast(qv), "variant")
            .select("qtok", "term", "dist")
            .distinct()
            .filter(F.levenshtein(F.col("qtok"), F.col("term")) <= F.col("dist"))
        )
        out: dict[str, list[str]] = {t: [] for t in set(toks)}
        for r in cand.select("qtok", "term").distinct().collect():
            out[r["qtok"]].append(r["term"])
        return {t: sorted(v) for t, v in out.items()}

    def topk_fuzzy(
        self,
        queries: pd.DataFrame,
        mode: str = "distributed",
        fuzziness: str = "1",
    ) -> DataFrame:
        """Disjunctive top-k with Lucene-style trailing-``~`` fuzzy
        terms: each fuzzy token expands to the dictionary terms within
        edit distance (:meth:`expand_fuzzy`) and the query scores as
        the OR of all expanded terms — same exact-scoring rewrite as
        :meth:`topk_prefix`.  Works on any index.

        ``fuzziness='1'``: Levenshtein <= 1 for every fuzzy token.
        ``fuzziness='auto'``: ES AUTO — distance 0 for 1-2 char
        tokens, 1 for 3-5, 2 for >= 6."""
        if fuzziness not in ("1", "auto"):
            raise ValueError(f"fuzziness must be '1' or 'auto', got {fuzziness!r}")
        parsed = {
            int(r.query_id): self._parse_fuzzy_query(r.text)
            for r in queries.itertuples(index=False)
        }
        fuzzy_toks = sorted({tok for ps in parsed.values() for tok, isf in ps if isf})
        expansion = self.expand_fuzzy(fuzzy_toks, auto=fuzziness == "auto")
        rows = []
        for r in queries.itertuples(index=False):
            terms: set[str] = set()
            for tok, isf in parsed[int(r.query_id)]:
                terms.update(expansion.get(tok, []) if isf else [tok])
            for t in sorted(terms):
                rows.append((int(r.query_id), t, int(r.k)))
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self._topk_expanded(
            pd.DataFrame(rows, columns=["query_id", "term", "k"]), mode
        )

    # -- composed (bool) queries -----------------------------------------------

    _PHRASE_RE = re.compile(r'"([^"]*)"(\^\d+(?:\.\d+)?)?')
    _NEG_PHRASE_RE = re.compile(r'-\s*"([^"]*)"(\^\d+(?:\.\d+)?)?')
    _BOOST_RE = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$")
    # field-scoped clause: role:assistant / -lang:zh.  The field name
    # must look like an identifier, so times ("12:30") and URLs stay
    # ordinary analyzed text.
    _FIELD_RE = re.compile(r"^(-?)([a-z_][a-z0-9_]*):(\S+)$")
    # Lucene range clause: field:[lo TO hi] (inclusive), {lo TO hi}
    # (exclusive), mixed brackets allowed, * = open end; extracted
    # before the whitespace split because the bounds are TO-separated.
    # field:[* TO *] is the ES `exists` query (field IS NOT NULL).
    _RANGE_RE = re.compile(
        r"(-?)([a-z_][a-z0-9_]*):([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])"
    )

    @staticmethod
    def _parse_composed_query(text: str) -> dict:
        """Lucene-bool-style mini-language, one string:

        * ``"quoted tokens"``  -> MUST phrase clause (positional)
        * ``-"quoted tokens"`` -> MUST_NOT phrase clause (positional)
        * ``-tok``             -> MUST_NOT term
        * ``tok*``             -> prefix expansion (SHOULD)
        * ``tok~``             -> fuzzy (Levenshtein<=1) expansion (SHOULD)
        * ``field:value``      -> metadata filter (MUST; ``-field:value``
          excludes) — values are NOT analyzed, they compare as-is
          against the doc-metadata column (see ``topk_composed``'s
          ``fields_df``)
        * ``field:[lo TO hi]`` -> metadata RANGE filter (Lucene syntax:
          ``[`` / ``]`` inclusive, ``{`` / ``}`` exclusive, ``*`` = open
          end; ``field:[* TO *]`` is the ES ``exists`` query).  Bounds
          that parse as numbers compare numerically, everything else
          lexicographically; ``-field:[...]`` excludes, null-safe the
          ES way (a doc MISSING the field matches the negation)
        * bare tokens          -> SHOULD terms (scoring)
        * ``clause^B``         -> boost: scales the clause's scoring
          contribution by ``B`` (``tok^2``, ``"a b"^1.5``, ``to*^3``,
          ``tok~^2``); a term reached by several boosted clauses takes
          the max.  Boosts on scoreless clauses (``-tok``, fields) are
          stripped and ignored, like ES.

        Returns ``{"phrases", "should", "prefix", "fuzzy", "neg",
        "neg_phrases", "fields", "neg_fields", "ranges", "neg_ranges",
        "boosts"}`` of analyzer-normalized
        tokens (field names/values verbatim).  A negated phrase that
        normalizes to a single token folds into ``neg`` (identical
        semantics, no positional work)."""
        from bilies_go_spark.functions.tokenize import tokenize_py

        phrases: list[list[str]] = []
        neg_phrases: list[list[str]] = []
        neg: list[str] = []
        fields: list[tuple[str, str]] = []
        neg_fields: list[tuple[str, str]] = []
        boosts: dict[str, float] = {}

        def _put_boost(key: str, val: float):
            boosts[key] = max(boosts.get(key, 0.0), val)

        def _grab_neg(m):
            # boost on a MUST_NOT clause is scoreless in ES too: strip+ignore
            toks = tokenize_py(m.group(1))
            if len(toks) == 1:
                neg.append(toks[0])
            elif toks:
                neg_phrases.append(toks)
            return " "

        rest = QueryEngine._NEG_PHRASE_RE.sub(_grab_neg, text)

        def _grab(m):
            toks = tokenize_py(m.group(1))
            if toks:
                phrases.append(toks)
                if m.group(2):
                    _put_boost(" ".join(toks), float(m.group(2)[1:]))
            return " "

        rest = QueryEngine._PHRASE_RE.sub(_grab, rest)

        ranges: list[tuple] = []
        neg_ranges: list[tuple] = []

        def _grab_range(m):
            lo = None if m.group(4) == "*" else m.group(4)
            hi = None if m.group(5) == "*" else m.group(5)
            (neg_ranges if m.group(1) else ranges).append(
                (m.group(2), lo, hi, m.group(3) == "[", m.group(6) == "]")
            )
            return " "

        # after the phrase passes, so quoted text can never parse as a range
        rest = QueryEngine._RANGE_RE.sub(_grab_range, rest)
        should: list[str] = []
        prefix: list[str] = []
        fuzzy: list[str] = []
        for piece in rest.split():
            boost = None
            bm = QueryEngine._BOOST_RE.match(piece)
            if bm:
                piece, boost = bm.group(1), float(bm.group(2))
                if boost <= 0.0:
                    raise ValueError(f"boost must be positive: {piece!r}^{boost}")
            fm = QueryEngine._FIELD_RE.match(piece)
            if fm:
                # boost on a filter clause is scoreless: strip+ignore
                pair = (fm.group(2), fm.group(3))
                (neg_fields if fm.group(1) else fields).append(pair)
            elif piece.startswith("-"):
                toks = tokenize_py(piece[1:])
                if len(toks) != 1:
                    raise ValueError(f"negated piece {piece!r} is not a single term")
                neg.append(toks[0])
            elif piece.endswith("*"):
                toks = tokenize_py(piece[:-1])
                if len(toks) != 1:
                    raise ValueError(f"prefix piece {piece!r} is not a single term")
                prefix.append(toks[0])
                if boost is not None:
                    _put_boost(toks[0] + "*", boost)
            elif piece.endswith("~"):
                toks = tokenize_py(piece[:-1])
                if len(toks) != 1:
                    raise ValueError(f"fuzzy piece {piece!r} is not a single term")
                fuzzy.append(toks[0])
                if boost is not None:
                    _put_boost(toks[0] + "~", boost)
            else:
                btoks = tokenize_py(piece)
                should.extend(btoks)
                if boost is not None:
                    for t in btoks:
                        _put_boost(t, boost)
        return {
            "phrases": phrases,
            "should": should,
            "prefix": prefix,
            "fuzzy": fuzzy,
            "neg": neg,
            "neg_phrases": neg_phrases,
            "fields": fields,
            "neg_fields": neg_fields,
            "ranges": ranges,
            "neg_ranges": neg_ranges,
            "boosts": boosts,
        }

    @staticmethod
    def _range_lit(v: str):
        """Range-bound literal: numeric when it parses (so ``n_chars``
        compares numerically, '9' < '10'), string otherwise
        (lexicographic — correct for ISO dates and keyword fields)."""
        try:
            return F.lit(int(v))
        except ValueError:
            try:
                return F.lit(float(v))
            except ValueError:
                return F.lit(v)

    @classmethod
    def _range_cond(cls, rng: tuple):
        """Column predicate for one parsed range tuple
        ``(field, lo, hi, lo_inc, hi_inc)``; both-ends-open is the ES
        ``exists`` query."""
        fname, lo, hi, lo_inc, hi_inc = rng
        if lo is None and hi is None:
            return F.col(fname).isNotNull()
        c = F.lit(True)
        if lo is not None:
            lit = cls._range_lit(lo)
            c = c & (F.col(fname) >= lit if lo_inc else F.col(fname) > lit)
        if hi is not None:
            lit = cls._range_lit(hi)
            c = c & (F.col(fname) <= lit if hi_inc else F.col(fname) < lit)
        return c

    def _resolve_field_filter(
        self,
        fields: tuple,
        neg_fields: tuple,
        fields_df: DataFrame,
        allowed: "np.ndarray | None",
        ranges: tuple = (),
        neg_ranges: tuple = (),
    ) -> np.ndarray:
        """Resolve one field-clause set to a sorted allowed-id array:
        a pruned scan of the metadata table (predicates push down to
        the parquet reader), intersected with any caller-supplied
        tenant set.  Negation is null-safe the ES way — a doc MISSING
        the field still matches ``-field:value`` / ``-field:[lo TO
        hi]``.  The resulting set rides the normal filter path
        (:class:`DocBitmap` + broadcast when large), so a billion-doc
        ``lang:en`` scope ships as packed bits, not an id list."""
        cond = F.lit(True)
        for fname, val in fields:
            cond = cond & F.col(fname).cast("string").eqNullSafe(F.lit(val))
        for fname, val in neg_fields:
            cond = cond & ~F.col(fname).cast("string").eqNullSafe(F.lit(val))
        for rng in ranges:
            cond = cond & self._range_cond(rng)
        for rng in neg_ranges:
            # null-safe: a null comparison is NULL -> coalesce(FALSE)
            # so the doc MATCHES the negation, like -field:value
            cond = cond & ~F.coalesce(self._range_cond(rng), F.lit(False))
        ids = (
            fields_df.where(cond)
            .select("doc_id")
            .toPandas()["doc_id"]
            .to_numpy(np.int64)
        )
        ids = np.unique(ids)  # sorts too
        if allowed is not None:
            ids = np.intersect1d(
                ids, np.ascontiguousarray(allowed, dtype=np.int64)
            )
        return ids

    def topk_composed(
        self,
        queries: pd.DataFrame,
        allowed: "np.ndarray | None" = None,
        mode: str = "distributed",
        n_shards: int | None = None,
        fields_df: "DataFrame | None" = None,
        _fields_resolved: bool = False,
    ) -> DataFrame:
        """Composed search: ONE query string mixing phrase + negated
        phrase (``-"..."``) + MUST_NOT term + prefix + fuzzy + bare
        terms + metadata scopes (``field:value`` / ``-field:value``,
        resolved against ``fields_df``), optionally under an
        allowed-set filter — the ES ``bool`` request surface the
        reference's users write, served by
        :func:`composed_query_kernel`.  An optional ``msm`` column on
        ``queries`` is ES ``minimum_should_match``: a doc is eligible
        only if it matches >= msm DISTINCT SHOULD clauses (bare term /
        prefix / fuzzy each count once however many expansion terms
        hit); ignored for queries with no SHOULD clauses.

        Expansion (prefix dictionary range scan, fuzzy SymSpell join)
        happens once per batch up front; the plan is then the standard
        pruned-scan + broadcast-join with one kernel task per query
        (``mode='local'``: the driver-side serving path through the LRU
        term cache).  ``n_shards=None`` on a positional index picks the
        doc-range-sharded plan automatically from the estimated posting
        volume, like the other kernels.  Phrase clauses (positive or
        negated) need a positional index."""
        parsed = {
            int(r.query_id): self._parse_composed_query(r.text)
            for r in queries.itertuples(index=False)
        }
        if not _fields_resolved and any(
            s["fields"] or s["neg_fields"] or s["ranges"] or s["neg_ranges"]
            for s in parsed.values()
        ):
            # field-scoped clauses: group queries by their clause set,
            # resolve each set to an allowed-id array ONCE, and run the
            # normal batch machinery per group.  Group count is the
            # number of DISTINCT clause sets in the batch (small), not
            # the query count.
            if fields_df is None:
                raise ValueError(
                    "field-scoped clauses (field:value) need fields_df — a "
                    "DataFrame of doc_id + the metadata columns they name"
                )
            groups: dict[tuple, list[int]] = {}
            for qid, s in parsed.items():
                key = (
                    tuple(sorted(set(s["fields"]))),
                    tuple(sorted(set(s["neg_fields"]))),
                    # range bounds may be None (open end): sort by repr
                    tuple(sorted(set(s["ranges"]), key=repr)),
                    tuple(sorted(set(s["neg_ranges"]), key=repr)),
                )
                groups.setdefault(key, []).append(qid)
            out = None
            for (fpos, fneg, frng, fnrng), qids in sorted(
                groups.items(), key=repr
            ):
                sub_allowed = (
                    self._resolve_field_filter(
                        fpos, fneg, fields_df, allowed,
                        ranges=frng, neg_ranges=fnrng,
                    )
                    if (fpos or fneg or frng or fnrng)
                    else allowed
                )
                part = self.topk_composed(
                    queries[queries["query_id"].isin(qids)],
                    allowed=sub_allowed,
                    mode=mode,
                    n_shards=n_shards,
                    _fields_resolved=True,
                )
                out = part if out is None else out.unionByName(part)
            return out
        all_prefix = sorted({p for s in parsed.values() for p in s["prefix"]})
        all_fuzzy = sorted({f for s in parsed.values() for f in s["fuzzy"]})
        pre_exp = self.expand_prefixes(all_prefix) if all_prefix else {}
        fuz_exp = self.expand_fuzzy(all_fuzzy) if all_fuzzy else {}
        rows = []
        any_phrase = False
        has_msm = "msm" in queries.columns
        for r in queries.itertuples(index=False):
            s = parsed[int(r.query_id)]
            negs = sorted(set(s["neg"]))
            negp = [list(p) for p in s["neg_phrases"]]
            should = set(s["should"])
            clause_boosts = s.get("boosts", {})
            # minimum_should_match: SHOULD clause keys (bare term /
            # prefix root / fuzzy root, negation-pruned like the
            # oracle's pattern rows); a doc must match >= msm DISTINCT
            # clauses to be eligible.  Ignored when the query has no
            # SHOULD clauses (ES semantics).
            msm_q = int(getattr(r, "msm", 0) or 0) if has_msm else 0
            clause_keys = (
                sorted(set(s["should"]) - set(negs))
                + sorted(p + "*" for p in set(s["prefix"]) - set(negs))
                + sorted(f + "~" for f in set(s["fuzzy"]))
            )
            if not clause_keys:
                msm_q = 0
            cid_of = {ck: i for i, ck in enumerate(clause_keys)}
            term_clauses: dict[str, set[int]] = {}

            def _tc(t: str, ck: str):
                if msm_q > 0 and ck in cid_of:
                    term_clauses.setdefault(t, set()).add(cid_of[ck])
            # per-term boost = max over the clauses that reach the term
            # (bare term / prefix expansion / fuzzy expansion / phrase
            # membership), 1.0 when unboosted
            tboost: dict[str, float] = {}

            def _tb(t: str, v: float | None):
                if v is not None:
                    tboost[t] = max(tboost.get(t, 0.0), v)

            for t in s["should"]:
                _tb(t, clause_boosts.get(t))
                _tc(t, t)
            for p in s["prefix"]:
                should.update(pre_exp.get(p, []))
                for t in pre_exp.get(p, []):
                    _tb(t, clause_boosts.get(p + "*"))
                    _tc(t, p + "*")
            for f_ in s["fuzzy"]:
                should.update(fuz_exp.get(f_, []))
                for t in fuz_exp.get(f_, []):
                    _tb(t, clause_boosts.get(f_ + "~"))
                    _tc(t, f_ + "~")
            for p in s["phrases"]:
                pb = clause_boosts.get(" ".join(p))
                for t in p:
                    _tb(t, pb)
            should -= set(negs)  # a term both scored and negated: negation wins
            # qspec carries ONLY the phrases: SHOULD expansions can run
            # to thousands of terms, and a per-row JSON copy of them
            # would blow the broadcast up quadratically
            spec_d: dict = {"phrases": s["phrases"], "neg_phrases": negp}
            if msm_q > 0:
                spec_d["msm"] = msm_q
            spec = json.dumps(spec_d, sort_keys=True)
            if s["phrases"] or negp:
                any_phrase = True
            pos_terms = {t for p in s["phrases"] for t in p}
            vterms = {t for p in negp for t in p}
            involved = sorted(should | set(negs) | pos_terms | vterms)
            negset = set(negs)
            # role 2 = verification-only: the term appears ONLY inside a
            # negated phrase, so its postings are decoded for positional
            # exclusion but it is neither scored nor term-excluded
            for t in involved:
                role = (
                    1
                    if t in negset
                    else 2
                    if t in vterms and t not in should and t not in pos_terms
                    else 0
                )
                bst = tboost.get(t, 1.0) if role == 0 else 1.0
                cl = (
                    json.dumps(sorted(term_clauses.get(t, ())))
                    if role == 0
                    else "[]"
                )
                rows.append(
                    (int(r.query_id), t, int(r.k), role, spec, float(bst), cl)
                )
        if any_phrase and not self.meta.get("positions", False):
            raise ValueError(
                "composed queries with phrase clauses need an index built "
                "with BuildConfig(positions=True)"
            )
        if not rows:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        qt_pdf = pd.DataFrame(
            rows, columns=["query_id", "term", "k", "neg", "qspec", "boost", "clauses"]
        )
        flt = self._doc_filter(
            None if allowed is None else np.ascontiguousarray(allowed, dtype=np.int64)
        )
        if n_shards is None and self.meta.get("positions", False):
            # every mode — heavy local queries route to the sharded
            # plan (see topk_phrase); n_shards=1 forces driver-side
            n_shards = self._auto_shards_qt(qt_pdf)
        if n_shards is not None and n_shards > 1:
            return self.topk_composed_sharded(queries, qt_pdf, n_shards, flt)
        if mode == "local":
            if self.meta.get("positions", False):
                # positional index: serve from the shared key cache —
                # hot composed queries never re-decode or re-sort
                out = self._composed_local(qt_pdf, flt)
            else:
                def kfn(pdf, k1, b, n_docs, avgdl, tie_margin=0.0, deleted=None):
                    # the combined (tombstones + allowed) filter replaces
                    # the plain tombstone array _kernel_local passes
                    return composed_query_kernel(
                        pdf, k1, b, n_docs, avgdl, tie_margin=tie_margin, deleted=flt
                    )

                out = self._kernel_local(qt_pdf, kfn)
            if out.empty:
                return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
            return self.spark.createDataFrame(out, schema=TOPK_SCHEMA)
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, neg int, qspec string, "
            "boost double, clauses string",
        )
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        k1, b, n_docs, avgdl, prune = self.k1, self.b, self.n_docs, self.avgdl, self.prune
        margin = self.tie_margin
        shipped = self._ship_filter(flt)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return composed_query_kernel(
                pdf, k1, b, n_docs, avgdl, prune=prune, tie_margin=margin,
                deleted=_unwrap_filter(shipped),
            )

        return joined.groupBy("query_id").applyInPandas(kernel, schema=TOPK_SCHEMA)

    def topk_composed_sharded(
        self, queries: pd.DataFrame, qt_pdf: pd.DataFrame, n_shards: int, flt
    ) -> DataFrame:
        """Doc-range-sharded composed plan: the entire bool pipeline
        (MUST_NOT exclusion, MUST-phrase verification, SHOULD scoring)
        is doc-local, so each (query, shard) evaluates its doc range
        completely on block-boundary byte slices of all four streams
        and the shard top-ks window-merge — an all-hot composed query
        at 10^12 docs never funnels a full posting list into one task,
        same as the phrase/proximity sharded plans.  Requires a
        positional index (the slicer cuts the positions stream)."""
        if not self.meta.get("positions", False):
            raise ValueError(
                "sharded composed queries need an index built with "
                "BuildConfig(positions=True)"
            )
        qt = self.spark.createDataFrame(
            qt_pdf,
            schema="query_id bigint, term string, k int, neg int, qspec string, "
            "boost double, clauses string",
        )
        from bilies_go_spark.functions.xxhash import term_bucket_py

        terms = sorted(qt_pdf["term"].unique())
        buckets = sorted({term_bucket_py(t, self.meta["n_buckets"]) for t in terms})
        segs = self._segments_df(terms, buckets)
        tstats = self._tstats_df(terms, buckets)
        joined = segs.join(F.broadcast(qt), "term").join(F.broadcast(tstats), "term")
        bounds = np.linspace(0, self.n_docs, n_shards + 1).astype(np.int64)
        bounds[-1] = np.iinfo(np.int64).max  # open-ended last shard
        slice_schema = (
            "query_id bigint, k int, neg int, qspec string, boost double, "
            "clauses string, "
            "term string, df bigint, shard int, " + SEGMENT_SLICE_FIELDS
            + ", positions_vb binary"
        )

        def slicer(batches):
            for pdf in batches:
                out = _slice_segments_by_shard_pos(
                    pdf, bounds, extra_cols=("neg", "qspec", "boost", "clauses")
                )
                if out is not None:
                    yield out

        sliced = joined.mapInPandas(slicer, schema=slice_schema)
        k1, b, n_docs, avgdl = self.k1, self.b, self.n_docs, self.avgdl
        margin = self.tie_margin
        shipped = self._ship_filter(flt)

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _composed_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl,
                deleted=_unwrap_filter(shipped), tie_margin=margin,
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    # -- doc-range-sharded distributed path ------------------------------------

    def topk_sharded(
        self, queries: pd.DataFrame, n_shards: int, allowed: "np.ndarray | None" = None
    ) -> DataFrame:
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
        # the id space is only *approximately* [0, n_docs): tombstones
        # shrink n_docs below the max live id, and upserted docs carry
        # fresh ids above it — the LAST shard must be unbounded so no
        # doc falls outside every shard (exactness, not balance)
        bounds[-1] = np.iinfo(np.int64).max
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
        deleted = self._ship_filter(self._doc_filter(allowed))
        margin = self.tie_margin

        def shard_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            lo = int(bounds[key[1]])
            hi = int(bounds[key[1] + 1])
            return _score_shard(
                pdf, lo, hi, k1, b, n_docs, avgdl,
                deleted=_unwrap_filter(deleted), tie_margin=margin,
            )

        partial = sliced.groupBy("query_id", "shard").applyInPandas(
            shard_kernel, schema=TOPK_SCHEMA
        )
        return self._merge_shard_topk(partial, queries)

    def _merge_shard_topk(
        self,
        partial: DataFrame,
        queries: pd.DataFrame,
        extra_cols: tuple = (),
    ) -> DataFrame:
        """Global top-k from per-(query, shard) partials: one window
        over n_shards * k tiny rows, honoring the tie margin (shard-kth
        <= global kth, so margin extras always survive the merge).
        ``extra_cols`` ride through unchanged — valid for doc-local
        payloads (e.g. highlight windows), where every shard computes
        the same value for a given doc.

        The merge runs DRIVER-SIDE: the partials are n_shards * k rows
        per query at ANY corpus scale (driver-metadata-sized by
        construction, like the explain/page collects), and collecting
        them replaces a window stage + an extra broadcast join + one
        exchange with a pandas sort — measured ~0.5 s/call off every
        routed heavy query at local[32]."""
        from pyspark.sql import types as T

        margin = self.tie_margin
        cols = ["query_id", "rank", "doc_id", "score", *extra_cols]
        out_schema = T.StructType([partial.schema[c] for c in cols])
        pdf = partial.drop("rank").toPandas()
        k_of = dict(
            zip(queries["query_id"].astype(int), queries["k"].astype(int))
        )
        outs = []
        for qid, g in pdf.groupby("query_id", sort=True):
            # shards partition the doc space, so (query_id, doc_id) is
            # unique and (score desc, doc_id asc) is a total order
            g = g.sort_values(
                ["score", "doc_id"], ascending=[False, True], kind="stable"
            ).reset_index(drop=True)
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
            k = int(k_of.get(int(qid), 0))
            if margin > 0.0 and k > 0:
                # margin semantics (see _topk_select): keep every doc
                # within the margin of the kth raw score, so a
                # downstream rounded re-rank is exact.  kth score =
                # min over the raw top-k.
                kth = float(g.loc[g["rank"] <= k, "score"].min())
                g = g[(g["rank"] <= k) | (g["score"] >= kth - margin)]
            else:
                g = g[g["rank"] <= k]
            outs.append(g)
        if not outs:
            return self.spark.createDataFrame([], schema=out_schema)
        out = pd.concat(outs, ignore_index=True)[cols]
        return self.spark.createDataFrame(out, schema=out_schema)

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
            seg_parts = []
            for si, ds in enumerate(seg_dss):
                p = ds.to_table(filter=filt).to_pandas()
                # provenance: 0 = base generation, >0 = tier index —
                # the positional artifact loader decodes only tier rows
                p["_src"] = si
                seg_parts.append(p)
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

    #: df/n_docs above this -> the term takes the dense-contribution path
    HOT_DF_FRAC = 0.01
    #: dense arrays only while the id space fits a serving node's RAM
    DENSE_MAX_ID = 1 << 23  # 8M ids = 64 MB float64 per term

    def _dense_contrib(self, term: str, rows: pd.DataFrame) -> np.ndarray | None:
        """Dense per-doc contribution array for a hot term (cached).
        None when the term's id space exceeds the dense bound."""
        arr = self.contrib_cache.get(term)
        if arr is not None:
            return arr
        runs = [row_to_segment(r) for _, r in rows.iterrows()]
        ids, tfs, dls = _decode_term_runs(runs, None, deleted=self.deleted)
        if ids.size == 0:
            arr = np.zeros(1, dtype=np.float64)
            self.contrib_cache.put(term, arr)
            return arr
        mx = int(ids.max())
        if mx >= self.DENSE_MAX_ID:
            return None
        dfreq = int(rows["df"].iloc[0])
        idf = float(np.log1p((self.n_docs - dfreq + 0.5) / (dfreq + 0.5)))
        arr = self.contrib_cache.alloc_for(term, mx + 1)
        if arr is None:
            return None  # no slot can hold it — stay on the kernel path
        # one posting per (term, doc) — salted runs and tiers partition
        # the doc space — so plain assignment is the exact scatter
        arr[ids] = idf * _tf_norm(tfs, dls, self.avgdl, self.k1, self.b)
        return arr

    def _topk_dense(self, qterms: list[str], pdf: pd.DataFrame, qid: int, k: int):
        """Dense exhaustive evaluation: one accumulator over the doc-id
        space; HOT terms add their cached dense contribution arrays,
        rare terms decode (cheap — they are rare) and scatter-add.
        Terms fold in ascending order, and adding a float64 to 0.0 or
        skipping an absent term is bit-neutral, so every doc's sum is
        the same pinned ascending-term float64 fold as the kernel's
        bincount and the SQL oracle.  Exact by construction (no bounds,
        no pruning) — the win over the kernel is that hot terms never
        decode after their first query (_ContribCache).

        Returns None when any term's id space exceeds the dense bound
        (fall back to the block-max kernel)."""
        lo_df = max(1000, self.HOT_DF_FRAC * self.n_docs)
        parts = []  # ascending-term order: ("dense", arr) | ("sparse", ids, contrib)
        size = 1
        # pin this query's terms against cache eviction: the views in
        # `parts` outlive later terms' alloc_for calls, and an unpinned
        # LRU recycle would silently overwrite an earlier term's
        # contributions with the new term's (wrong scores, no error)
        self.contrib_cache.pin(qterms)
        try:
            for t in qterms:  # sorted by caller — pinned fold order
                rows = pdf[pdf["term"] == t]
                dfreq = int(rows["df"].iloc[0])
                if dfreq >= lo_df:
                    a = self._dense_contrib(t, rows)
                    if a is None:
                        return None
                    parts.append(("dense", a, None))
                    size = max(size, a.size)
                else:
                    runs = [row_to_segment(r) for _, r in rows.iterrows()]
                    ids, tfs, dls = _decode_term_runs(runs, None, deleted=self.deleted)
                    if ids.size == 0:
                        continue
                    mx = int(ids.max())
                    if mx >= self.DENSE_MAX_ID:
                        return None
                    idf = float(np.log1p((self.n_docs - dfreq + 0.5) / (dfreq + 0.5)))
                    parts.append(
                        ("sparse", ids, idf * _tf_norm(tfs, dls, self.avgdl, self.k1, self.b))
                    )
                    size = max(size, mx + 1)
            if not parts:
                return None
            acc = np.zeros(size, dtype=np.float64)
            for kind, a, contrib in parts:
                if kind == "dense":
                    acc[: a.size] += a
                else:
                    acc[a] += contrib  # ids unique per (term, doc) — exact scatter
        finally:
            self.contrib_cache.unpin()
        doc = np.flatnonzero(acc)  # contributions are strictly positive
        if doc.size == 0:
            return None
        sel = _topk_select(doc, acc[doc], k, tie_margin=self.tie_margin)
        return pd.DataFrame(
            {
                "query_id": np.full(sel.size, qid, dtype=np.int64),
                "rank": np.arange(1, sel.size + 1, dtype=np.int32),
                "doc_id": doc[sel],
                "score": acc[doc][sel],
            }
        )

    def topk_pandas(
        self, queries: pd.DataFrame, allowed: "np.ndarray | None" = None
    ) -> pd.DataFrame:
        """Serving path: read only the query terms' segment rows via
        pyarrow (term_bucket partition pruning + term predicate + LRU
        term cache, no Spark job) and score driver-side.

        Two regimes, both exact: queries whose terms are ALL hot take
        the dense-contribution path (block-max pruning cannot skip any
        block of a uniform hot list, so the win is amortizing the
        decode+score across the query stream — see _ContribCache);
        everything else runs the block-max pruned kernel, which is
        already cheap when at least one term is rare.  This is the
        low-latency point-query surface a search frontend hits; the
        distributed path is for bulk evaluation.
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
        flt = self._doc_filter(allowed)
        outs = []
        for q in queries.itertuples(index=False):
            qterms = sorted(_tokenize_terms(q.text))
            pdf = seg_pdf[seg_pdf["term"].isin(qterms)]
            if pdf.empty:
                continue
            present = sorted(pdf["term"].unique())
            if allowed is None:
                # the dense-contribution cache holds UNFILTERED arrays;
                # filtered queries take the kernel path (masking at
                # decode, exact) instead of invalidating the cache
                dense = self._topk_dense(present, pdf, int(q.query_id), int(q.k))
                if dense is not None:
                    outs.append(dense)
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
                    deleted=flt,
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def topk_page(
        self,
        queries: pd.DataFrame,
        kind: str = "or",
        round_digits: int = 6,
        **run_kwargs,
    ) -> DataFrame:
        """ES ``search_after`` pagination over any top-k surface.

        ``queries`` carries the usual (query_id, text, k) plus the
        cursor columns ``after_score`` (the ROUNDED score of the last
        hit the client saw — exactly what this surface emits) and
        ``after_doc_id``; NaN/None cursor means page 1.  Returns the
        next k hits STRICTLY after the cursor in
        (round(score, round_digits) DESC, doc_id ASC) order — the
        pinned display order — with page-relative ranks 1..k and
        rounded scores (absolute rank is client-side state, as in ES).

        Exact at any depth via geometric overfetch: run the underlying
        surface at k_eff, emit only if >= k complete hits lie after the
        cursor, else re-run with k_eff x4 (each re-run is still one
        top-k_eff query — no full sort, no full scan; the typical
        page-2 call resolves in the first iteration).  Rounded-order
        exactness needs the engine's tie_margin to cover a rounding
        ulp, so the boundary tie group is never silently split —
        construct the engine with ``tie_margin=10**-round_digits``.

        ``kind``: 'or' (disjunctive :meth:`topk`), 'conjunctive', or
        'phrase'; ``run_kwargs`` (e.g. ``mode=``, ``n_shards=``) pass
        through to the underlying surface, so pagination is
        path-agnostic (serving local / distributed / sharded)."""
        if self.tie_margin < 10.0 ** (-round_digits):
            raise ValueError(
                "topk_page needs tie_margin >= 10**-round_digits for exact "
                "rounded-order pages; construct QueryEngine(tie_margin=...)"
            )
        runners = {
            "or": self.topk,
            "conjunctive": lambda q, **kw: self.topk_conjunctive(q),
            "phrase": self.topk_phrase,
        }
        if kind not in runners:
            raise ValueError(f"unknown kind {kind!r}")
        run = runners[kind]
        out = []
        pend = queries.copy()
        pend["mult"] = 2
        while len(pend):
            run_q = pend.assign(k=(pend["k"] * pend["mult"]).astype("int64"))[
                ["query_id", "text", "k"]
            ]
            res = run(run_q, **run_kwargs).toPandas()
            still = []
            for r in pend.itertuples(index=False):
                k, k_eff = int(r.k), int(r.k) * int(r.mult)
                sub = res[res["query_id"] == int(r.query_id)].copy()
                sub["score"] = sub["score"].round(round_digits)
                sub = sub.sort_values(
                    ["score", "doc_id"], ascending=[False, True]
                )
                exhausted = len(sub) < k_eff
                if not exhausted and len(sub):
                    # the lowest rounded-score group may be split by the
                    # raw-order cut; drop it unless the result set is
                    # already the whole match set
                    sub = sub[sub["score"] > sub["score"].min()]
                a_s = getattr(r, "after_score", None)
                if a_s is not None and not pd.isna(a_s):
                    a_s, a_d = float(a_s), int(r.after_doc_id)
                    sub = sub[
                        (sub["score"] < a_s)
                        | ((sub["score"] == a_s) & (sub["doc_id"] > a_d))
                    ]
                if len(sub) >= k or exhausted:
                    page = sub.head(k)
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": int(r.query_id),
                                "rank": np.arange(1, len(page) + 1, dtype="int32"),
                                "doc_id": page["doc_id"].to_numpy(),
                                "score": page["score"].to_numpy(),
                            }
                        )
                    )
                else:
                    still.append(r)
            pend = (
                pd.DataFrame(still).assign(mult=lambda d: d["mult"] * 4)
                if still
                else pd.DataFrame()
            )
        pdf = (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                {"query_id": [], "rank": [], "doc_id": [], "score": []}
            )
        )
        if pdf.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self.spark.createDataFrame(pdf, schema=TOPK_SCHEMA)

    def topk(
        self,
        queries: pd.DataFrame,
        mode: str = "auto",
        allowed: "np.ndarray | None" = None,
    ) -> DataFrame:
        """Batch top-k: one output row per (query, rank).

        mode: 'local' (driver serving path), 'distributed', or 'auto'
        (local for small batches).  ``allowed`` restricts results to a
        sorted doc-id set (filtered search; global scoring stats)."""
        if mode == "auto":
            mode = "local" if len(queries) <= self.LOCAL_MAX_QUERIES else "distributed"
        if mode == "distributed":
            return self.topk_distributed(queries, allowed=allowed)
        pdf = self.topk_pandas(queries, allowed=allowed)
        if pdf.empty:
            return self.spark.createDataFrame([], schema=TOPK_SCHEMA)
        return self.spark.createDataFrame(pdf, schema=TOPK_SCHEMA)


def _lev_le1(a: str, b: str) -> bool:
    """Levenshtein(a, b) <= 1, O(len) — the exact verify on SymSpell
    variant-join candidates (a shared deletion variant admits a few
    distance-2 pairs, e.g. 'abc'/'ac'+'x')."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _auto_fuzzy_dist(tok: str) -> int:
    """ES ``AUTO`` fuzziness: edit distance 0 for 1-2 char terms, 1
    for 3-5, 2 for >= 6 — what the reference's users get from the ES
    query DSL (/root/reference/README.md:8-11)."""
    n = len(tok)
    return 0 if n < 3 else (1 if n < 6 else 2)


def _lev_bounded(a: str, b: str, k: int) -> bool:
    """Levenshtein(a, b) <= k for small k — the exact verify on
    SymSpell variant-join candidates (a shared deletion variant admits
    pairs beyond the target distance).  O(len) for k <= 1, banded DP
    with row-min early exit for k == 2 (tokens are short; the band is
    5 cells wide)."""
    if k <= 1:
        return a == b if k == 0 else _lev_le1(a, b)
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        lo, hi = max(1, j - k), min(la, j + k)
        if lo > 1:
            cur[lo - 1] = k + 1  # outside the band
        for i in range(lo, hi + 1):
            cur[i] = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (a[i - 1] != bj),
            )
        if hi < la:
            cur[hi + 1 :] = [k + 1] * (la - hi)
        if min(cur[lo - 1 : hi + 1]) > k:
            return False
        prev = cur
    return prev[la] <= k


def _lev_exact(a: str, b: str) -> int:
    """Exact Levenshtein distance — classic O(|a||b|) DP.  Used to
    ORDER the handful of verified suggester candidates (the bounded
    check only answers <= k); tokens are short, candidate sets tiny."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        bj = b[j - 1]
        for i in range(1, la + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (a[i - 1] != bj))
        prev = cur
    return prev[la]


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
