"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data table carries media as ``binary`` columns with
typed metadata; the engine's job is the Spark-side plumbing — schema,
partition-friendly layout, Arrow-batched UDF signatures — while the
actual codecs (PIL/ffmpeg/torchaudio) plug into one seam.  This module
makes that plumbing real and tested:

* :func:`with_blob` — pack a source column into ``(payload: binary,
  media_type, n_bytes, digest)`` rows (here the payload is the UTF-8
  text bytes standing in for an image; a real table reads bytes from
  object storage).
* :func:`extract_features` — ``mapInPandas`` over Arrow batches:
  per-blob feature vectors (byte histogram + moments), the exact shape
  a CLIP/encoder stage has.  Pure numpy on zero-copy Arrow buffers —
  no per-row Python.
* :func:`decode_image` — the REAL-decoder seam.  Deliberately stubbed:
  the sandbox has no image libs, so it raises ``NotImplementedError``
  unless ``fake=True``, where it emits a deterministic fake decode
  (width/height/channels derived from the digest) so the downstream
  plumbing — schema, batch shapes, null handling — is testable today.

Reference analogue: bilies-go treats its `log` payload as opaque
passthrough bytes (/root/reference/data/inputRecord.go:27-31) — the
same contract: the engine moves and accounts for bytes it does not
interpret, and interpretation is an explicit, pluggable stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16

# Scalar features one row per blob; the histogram is a SEPARATE exploded
# (doc_id, bin, frac) relation — flat columns only, so results are
# canonicalizable (sortable/hashable) by any downstream comparator, and
# both shapes are DuckDB-oracle-expressible (bytes recovered in SQL via
# hex(encode(text))).
FEATURE_SCHEMA = "doc_id bigint, n_bytes int, mean_byte double, std_byte double, entropy double"
HISTOGRAM_SCHEMA = "doc_id bigint, bin int, frac double"
DECODE_SCHEMA = "doc_id bigint, width int, height int, channels int, ok boolean"


def with_blob(docs: DataFrame, source_col: str = "text") -> DataFrame:
    """(doc_id, payload, media_type, n_bytes, digest) — the canonical
    media-table projection."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain;fake-image").alias("media_type"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


def _feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-blob scalar features.  Float op order is pinned for oracle
    parity: mean = int_sum/n, var = int_sqsum/n - mean*mean (exact
    integer sums -> identical IEEE divisions in Spark and DuckDB),
    entropy folds nonzero bins in ascending-bin order."""
    rows = []
    for doc_id, buf in zip(pdf["doc_id"].to_numpy(), pdf["payload"]):
        a = np.frombuffer(buf, dtype=np.uint8)
        if a.size == 0:
            rows.append((int(doc_id), 0, 0.0, 0.0, 0.0))
            continue
        n = int(a.size)
        a64 = a.astype(np.int64)
        s = int(a64.sum())
        ss = int((a64 * a64).sum())
        mean = s / n
        var = max(ss / n - mean * mean, 0.0)
        hist = np.bincount(a >> 4, minlength=N_HIST_BINS)
        p = hist[hist > 0] / n  # ascending-bin order preserved
        rows.append(
            (int(doc_id), n, mean, float(np.sqrt(var)), float(-(p * np.log2(p)).sum()))
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_bytes", "mean_byte", "std_byte", "entropy"]
    )


def _histogram_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exploded nibble histogram: N_HIST_BINS rows per blob (zero bins
    included), frac = count/n_bytes raw (callers round)."""
    n_blobs = len(pdf)
    hists = np.zeros((n_blobs, N_HIST_BINS), dtype=np.float64)
    for i, buf in enumerate(pdf["payload"]):
        a = np.frombuffer(buf, dtype=np.uint8)
        if a.size:
            hists[i] = np.bincount(a >> 4, minlength=N_HIST_BINS) / int(a.size)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(pdf["doc_id"].to_numpy(np.int64), N_HIST_BINS),
            "bin": np.tile(np.arange(N_HIST_BINS, dtype=np.int32), n_blobs),
            "frac": hists.ravel(),
        }
    )


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched per-blob feature extraction (mapInPandas).

    The numpy loop is per-BLOB (not per element): each iteration is a
    vectorized pass over one payload's bytes — the same granularity a
    real image encoder batch has.  Emits RAW doubles; queries round."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _feature_batch(pdf[["doc_id", "payload"]])

    return blobs.mapInPandas(gen, schema=FEATURE_SCHEMA)


def byte_histogram(blobs: DataFrame) -> DataFrame:
    """(doc_id, bin, frac) — exploded per-blob nibble histogram, the
    canonical flat shape for a per-channel/per-bin feature table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _histogram_batch(pdf[["doc_id", "payload"]])

    return blobs.mapInPandas(gen, schema=HISTOGRAM_SCHEMA)


def decode_image(blobs: DataFrame, fake: bool = False) -> DataFrame:
    """Decode seam.  ``fake=False`` raises: no image codecs in this
    environment (STUB — plug PIL/torchvision here).  ``fake=True``
    derives deterministic dimensions from the digest so batch shape,
    schema, and null handling are exercised end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/torchvision (not in sandbox); "
            "use fake=True for the deterministic stub"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["digest"].str
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": (h.slice(0, 2).map(lambda s: int(s, 16)) + 1).astype("int32"),
                    "height": (h.slice(2, 4).map(lambda s: int(s, 16)) + 1).astype("int32"),
                    "channels": np.int32(3),
                    "ok": pdf["n_bytes"] > 0,
                }
            )
            yield out

    return blobs.mapInPandas(gen, schema=DECODE_SCHEMA)
