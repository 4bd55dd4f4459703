"""Multimodal plumbing tests: binary payload convention, mapInPandas
feature extraction (deterministic fake decoder), frame-sample plan, and
the stub contract for real codecs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.multimodal import (
    EMBED_DIM,
    attach_media_columns,
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    blobs = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("blob"),
    )
    df = attach_media_columns(blobs, "blob", "image")
    return df.withColumn(
        "media",
        F.struct(
            F.col("media.media_type"),
            F.col("media.mime"),
            F.col("media.width"),
            F.col("media.height"),
            F.lit(3000).alias("duration_ms"),
        ),
    )


def test_feature_extraction(spark, media_df):
    feats = extract_media_features(media_df).collect()
    assert len(feats) == 500
    row = next(r for r in feats if r["media_id"] == 0)
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    text = src.filter(F.col("doc_id") == 0).collect()[0]["text"]
    assert row["n_bytes"] == len(text.encode())
    assert row["digest"] == hashlib.sha256(text.encode()).hexdigest()
    assert len(row["embedding"]) == EMBED_DIM
    norm = sum(x * x for x in row["embedding"]) ** 0.5
    assert abs(norm - 1.0) < 1e-3


def test_deterministic(media_df):
    a = {r["media_id"]: r["embedding"] for r in extract_media_features(media_df).collect()}
    b = {r["media_id"]: r["embedding"] for r in extract_media_features(media_df).collect()}
    assert a == b


def test_real_decoder_is_stubbed(media_df):
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media_df, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_plan(media_df):
    frames = frame_sample_plan(media_df, every_ms=1000)
    per_media = frames.groupBy("media_id").count().collect()
    # duration 3000ms @ 1000ms → ts 0,1000,2000,3000 → 4 frames
    assert all(r["count"] == 4 for r in per_media)


def test_q67_fingerprint_matches_embedding_words(spark):
    """q67's emb_fingerprint (JVM conv() over the digest hex) must equal
    the pre-normalization uint16 words the fake decoder actually seeds
    the float embedding with — the consistency link that lets the
    DuckDB oracle certify the embedding's information content without a
    cross-engine-stable float text form."""
    import numpy as np

    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    sf = "/root/testdata/sf0.001"
    out = {
        r["media_id"]: (r["digest"], r["emb_fingerprint"])
        for r in catalog.REGISTRY["q67_multimodal_features"]
        .builder(spark, sf)
        .collect()
    }
    assert len(out) == 500
    for mid in (0, 7, 499):
        digest, fp = out[mid]
        words = np.frombuffer(
            bytes.fromhex(digest)[: EMBED_DIM * 2], dtype="<u2"
        )
        assert fp == ",".join(str(int(w)) for w in words), mid


def test_pq_adc_semantics_match_numpy(spark):
    """q126's adc_micros must equal an independent numpy re-derivation
    of PQ-ADC: encode each corpus vector to per-subspace argmax codes
    against the deterministic codebook, then score = sum over subspaces
    of floor(1e6 * dot(query_sub, codebook[code])). Certifies the query
    implements asymmetric distance computation, not merely a
    self-consistent formula. (Measured recall@5 vs exact q60 is 5/25 on
    sf0.001 — the expected regime for an untrained 16-entry codebook on
    structure-free synthetic vectors; production seeds the codebook from
    q106's k-means centroids without changing this plan.)"""
    import math

    import numpy as np

    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    sf = "/root/testdata/sf0.001"
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    }
    M, DSUB, K = 8, 8, 16
    cb = [emb[i].astype(np.float64) for i in range(K)]

    def codes(v):
        v = v.astype(np.float64)
        out = []
        for m in range(M):
            s = slice(m * DSUB, (m + 1) * DSUB)
            # left-fold float64 dot == Spark/DuckDB order-exact fold
            dots = [float(np.sum(v[s] * c[s])) for c in cb]
            out.append(int(np.argmax(dots)))
        return out

    def adc(q, v):
        q = q.astype(np.float64)
        cs = codes(v)
        tot = 0
        for m in range(M):
            s = slice(m * DSUB, (m + 1) * DSUB)
            tot += math.floor(float(np.sum(q[s] * cb[cs[m]][s])) * 1e6)
        return tot

    rows = (
        catalog.REGISTRY["q126_pq_adc_search"].builder(spark, sf).collect()
    )
    assert {r["query_id"] for r in rows} == set(range(5))
    for r in rows:
        assert r["rn"] <= 5
        assert r["adc_micros"] == adc(emb[r["query_id"]], emb[r["neighbor_id"]]), (
            r["query_id"], r["neighbor_id"],
        )
