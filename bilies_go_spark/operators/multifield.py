"""Multi-field search (ES ``multi_match``) over per-field inverted
indexes.

The reference delegates all querying to Elasticsearch
(/root/reference/README.md:8-11), whose users write ``multi_match``
requests over several document fields (title/body/...).  Here each
field gets its OWN index (own postings, df, dl, avgdl — exactly
Lucene's per-field statistics), built by the ordinary
:func:`~bilies_go_spark.operators.index_build.build_index` over a
``(doc_id, text)`` projection of that field, and a batch of queries is
evaluated EXACTLY with a threshold-algorithm loop:

1. each field serves its top-k' (rank-safe block-max kernels);
2. the candidate union is re-scored exactly per field via an id-pruned
   re-analysis of the field corpus (parquet stats skip everything
   else) + driver-side dictionary point reads — the same direction
   the ``_explain`` surface uses, never a full-index scan;
3. Fagin-style bound: any doc outside every field's top-k' scores
   below ``max_f(kth_f) + tb * (sum_f - max_f)`` (``best_fields``) or
   ``sum_f(kth_f)`` (``most_fields``); if the exact k-th candidate
   beats the bound the batch is final, otherwise k' quadruples (the
   loop terminates at field exhaustion).

Scoring combine: ``best_fields`` = ``max_f(boost_f * s_f) + tb *
(sum - max)``; ``most_fields`` = ``sum_f(boost_f * s_f)``.  Per-doc
per-field sums fold in ascending-term order (the repo's pinned float
contract), so results are hash-identical to the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bilies_go_spark import B_DEFAULT, K1_DEFAULT

from .query import TOPK_SCHEMA, QueryEngine


def field_text(col: str, n_tokens: int):
    """First-``n_tokens`` analyzed slice of a text column, re-joined —
    the deterministic 'title' field derivation used by the gates."""
    from bilies_go_spark.functions.tokenize import tokenize_col

    return F.array_join(F.slice(tokenize_col(col), 1, n_tokens), " ")


def _exact_field_scores(
    spark: SparkSession,
    eng: QueryEngine,
    corpus_df: DataFrame,
    cand_pdf: pd.DataFrame,
    qterms: pd.DataFrame,
    k1: float,
    b: float,
) -> pd.DataFrame:
    """Exact per-(query, doc) BM25 score of ONE field for the candidate
    set: id-pruned re-analysis for tf/dl, index dictionary df, pinned
    ascending-term fold.  Returns (query_id, doc_id, s)."""
    from bilies_go_spark.functions.tokenize import tokenize_col

    ids = sorted({int(i) for i in cand_pdf["doc_id"]})
    docs = corpus_df.filter(F.col("doc_id").isin(ids))
    toks = docs.select("doc_id", F.explode(tokenize_col("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    qt = F.broadcast(
        spark.createDataFrame(qterms, schema="query_id bigint, term string, df bigint")
    )
    cand = F.broadcast(
        spark.createDataFrame(
            cand_pdf[["query_id", "doc_id"]], schema="query_id bigint, doc_id bigint"
        )
    )
    rows = (
        cand.join(qt, "query_id")
        .join(tf, ["doc_id", "term"])
        .join(dl, "doc_id")
        .select("query_id", "doc_id", "term", "tf", "dl")
        .toPandas()
    )
    if rows.empty:
        return pd.DataFrame({"query_id": [], "doc_id": [], "s": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "s": "float64"}
        )
    df_map = dict(zip(qterms["term"], qterms["df"].astype(np.int64)))
    n_docs, avgdl = float(eng.n_docs), float(eng.avgdl)
    rows = rows.sort_values(["query_id", "doc_id", "term"], kind="mergesort")
    dfv = rows["term"].map(df_map).to_numpy(np.float64)
    tfv = rows["tf"].to_numpy(np.float64)
    dlv = rows["dl"].to_numpy(np.float64)
    idf = np.log1p((n_docs - dfv + 0.5) / (dfv + 0.5))
    contrib = idf * (tfv * (k1 + 1.0)) / (tfv + k1 * (1.0 - b + b * (dlv / avgdl)))
    rows = rows.assign(contrib=contrib)
    # groupby(sort=False) + ordered rows == ascending-term fold per doc
    out = (
        rows.groupby(["query_id", "doc_id"], sort=False)["contrib"]
        .sum()
        .reset_index()
        .rename(columns={"contrib": "s"})
    )
    return out


def multi_match(
    spark: SparkSession,
    fields: "list[tuple[str, str, float]]",
    corpus_by_field: "dict[str, DataFrame]",
    queries: pd.DataFrame,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    max_rounds: int = 8,
) -> DataFrame:
    """ES ``multi_match`` batch: ``fields`` is ``(name, index_dir,
    boost)``; ``queries`` carries ``query_id, text, k`` plus optional
    ``mtype`` (``'best'``/``'most'``, default best) and ``tie_breaker``
    columns.  Exact (threshold-algorithm candidates + exact re-score,
    never heuristic overfetch); returns raw-score TOPK rows."""
    from bilies_go_spark.functions.tokenize import tokenize_py

    engines = {name: QueryEngine(spark, d) for name, d, _ in fields}
    boosts = {name: float(bst) for name, _, bst in fields}
    qinfo: dict[int, dict] = {}
    for r in queries.itertuples(index=False):
        qinfo[int(r.query_id)] = {
            "k": int(r.k),
            "mtype": str(getattr(r, "mtype", "best") or "best"),
            "tb": float(getattr(r, "tie_breaker", 0.0) or 0.0),
            "terms": sorted(set(tokenize_py(r.text))),
        }
    qterms_by_field = {}
    for name, eng in engines.items():
        terms = sorted({t for qi in qinfo.values() for t in qi["terms"]})
        df_map = eng.term_dfs(terms)
        qterms_by_field[name] = pd.DataFrame(
            [
                (qid, t, int(df_map.get(t, 0)))
                for qid, qi in qinfo.items()
                for t in qi["terms"]
            ],
            columns=["query_id", "term", "df"],
        )

    active = {qid: qi["k"] for qid, qi in qinfo.items()}  # qid -> k'
    final: dict[int, pd.DataFrame] = {}
    rounds = 0
    while active and rounds < max_rounds:
        rounds += 1
        sub = queries[queries["query_id"].isin(list(active))].copy()
        per_field_top: dict[str, pd.DataFrame] = {}
        for name, eng in engines.items():
            qk = sub.assign(k=[active[int(q)] for q in sub["query_id"]])
            per_field_top[name] = (
                eng.topk(qk).toPandas().sort_values(["query_id", "rank"])
            )
        # candidate union per query, then ONE exact re-score per field
        cand = (
            pd.concat(
                [t[["query_id", "doc_id"]] for t in per_field_top.values()],
                ignore_index=True,
            )
            .drop_duplicates()
            .reset_index(drop=True)
        )
        scores: dict[str, pd.DataFrame] = {}
        for name, eng in engines.items():
            if cand.empty:
                scores[name] = pd.DataFrame(
                    {"query_id": [], "doc_id": [], "s": []}
                ).astype({"query_id": "int64", "doc_id": "int64", "s": "float64"})
                continue
            qt = qterms_by_field[name]
            scores[name] = _exact_field_scores(
                spark,
                eng,
                corpus_by_field[name],
                cand,
                qt[qt["query_id"].isin(list(active))],
                k1,
                b,
            )
        still = {}
        for qid in list(active):
            kprime = active[qid]
            k = qinfo[qid]["k"]
            mtype, tb = qinfo[qid]["mtype"], qinfo[qid]["tb"]
            # exact combined scores over this query's candidates
            per_doc: dict[int, dict[str, float]] = {}
            for name in engines:
                sq = scores[name]
                sq = sq[sq["query_id"] == qid]
                for d, s in zip(sq["doc_id"], sq["s"]):
                    per_doc.setdefault(int(d), {})[name] = boosts[name] * float(s)
            if not per_doc:
                final[qid] = pd.DataFrame(
                    {"doc_id": [], "score": []}
                ).astype({"doc_id": "int64", "score": "float64"})
                continue
            docs = np.array(sorted(per_doc), dtype=np.int64)
            bs = np.array(
                [[per_doc[d].get(n, 0.0) for n, _, _ in fields] for d in docs]
            )
            mx, sm = bs.max(axis=1), bs.sum(axis=1)
            comb = sm if mtype == "most" else mx + tb * (sm - mx)
            order = np.lexsort((docs, -comb))
            # Fagin bound on any doc outside every field's top-k'
            kth, exhausted = [], True
            for name in engines:
                t = per_field_top[name]
                t = t[t["query_id"] == qid]
                if len(t) >= kprime:
                    exhausted = False
                kth.append(
                    boosts[name] * float(t["score"].iloc[kprime - 1])
                    if len(t) >= kprime
                    else 0.0
                )
            kth = np.array(kth)
            bound = (
                kth.sum()
                if mtype == "most"
                else kth.max() + tb * (kth.sum() - kth.max())
            )
            settled = exhausted or (
                len(order) >= k and comb[order[k - 1]] > bound
            )
            if settled:
                sel = order[:k]
                final[qid] = pd.DataFrame(
                    {"doc_id": docs[sel], "score": comb[sel]}
                )
            else:
                still[qid] = kprime * 4
        active = still
    if active:
        raise RuntimeError(
            f"multi_match did not converge in {max_rounds} rounds for "
            f"queries {sorted(active)}"
        )
    out_rows = []
    for qid in sorted(final):
        f_ = final[qid]
        for rank, (d, s) in enumerate(zip(f_["doc_id"], f_["score"]), 1):
            out_rows.append((int(qid), int(rank), int(d), float(s)))
    if not out_rows:
        return spark.createDataFrame([], schema=TOPK_SCHEMA)
    return spark.createDataFrame(
        pd.DataFrame(out_rows, columns=["query_id", "rank", "doc_id", "score"]),
        schema=TOPK_SCHEMA,
    )
