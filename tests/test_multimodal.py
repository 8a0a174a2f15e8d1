"""Multimodal plumbing: blob schema, Arrow-batched features, decode stub."""

from __future__ import annotations

import numpy as np
import pytest

from bilies_go_spark.operators.multimodal import (
    N_HIST_BINS,
    byte_histogram,
    decode_image,
    extract_features,
    with_blob,
)


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_blob(docs).persist()


def test_blob_schema_and_counts(spark, sf_dir, blobs):
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert blobs.count() == n
    row = blobs.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert len(row["digest"]) == 32


def test_features_deterministic_and_sane(blobs):
    f = extract_features(blobs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert len(f) == blobs.count()
    assert (f["n_bytes"] > 0).all()
    assert (f["entropy"] >= 0).all() and (f["entropy"] <= 4.0 + 1e-9).all()
    assert (f["mean_byte"] > 0).all() and (f["std_byte"] >= 0).all()
    g = extract_features(blobs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert f.equals(g)  # deterministic across runs


def test_histogram_exploded_shape(blobs):
    h = byte_histogram(blobs).toPandas()
    n = blobs.count()
    assert len(h) == n * N_HIST_BINS
    sums = h.groupby("doc_id")["frac"].sum()
    np.testing.assert_allclose(sums.to_numpy(), 1.0, atol=1e-9)
    assert set(h["bin"].unique()) == set(range(N_HIST_BINS))


def test_decode_stub_contract(blobs):
    with pytest.raises(NotImplementedError):
        decode_image(blobs).count()
    d = decode_image(blobs, fake=True).toPandas()
    assert len(d) == blobs.count()
    assert (d["width"] >= 1).all() and (d["height"] >= 1).all()
    assert (d["channels"] == 3).all()
    assert d["ok"].all()
