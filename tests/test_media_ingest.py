"""binaryFile media ingest: real files on disk → opaque payload rows →
manifest arithmetic (q95's logic) and the fake-decoder feature extractor,
with content pruned off the scan when unrequested."""

from __future__ import annotations

import contextlib
import hashlib
import io
import os

import numpy as np

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.multimodal import (
    EMBED_DIM,
    extract_media_features,
)
from etl_pipeline_candy_store_spark.sources.readers import read_media_dir

_FILES = {
    "a.png": b"\x89PNG\r\n\x1a\n" + b"pixels" * 40,
    "b.png": b"\x89PNG\r\n\x1a\n" + b"\x00" * 7,
    "nested/c.png": b"\x89PNG\r\n\x1a\nZ",
    "skip.txt": b"not media",
}


def _write_tree(root) -> str:
    base = str(root / "media")
    for rel, payload in _FILES.items():
        p = os.path.join(base, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(payload)
    return base


def test_read_media_dir_payloads_and_metadata(spark, tmp_path):
    base = _write_tree(tmp_path)
    rows = {
        os.path.basename(r["path"]): r
        for r in read_media_dir(spark, base, "image", glob="*.png").collect()
    }
    assert set(rows) == {"a.png", "b.png", "c.png"}  # glob drops skip.txt
    for name, r in rows.items():
        want = _FILES[name if name != "c.png" else "nested/c.png"]
        assert bytes(r["payload"]) == want
        assert r["n_bytes"] == len(want)
        assert r["media"]["media_type"] == "image"
        assert r["media_id"] is not None


def test_manifest_only_scan_prunes_content(spark, tmp_path):
    base = _write_tree(tmp_path)
    manifest = read_media_dir(spark, base, "image", with_content=False)
    assert "payload" not in manifest.columns
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        manifest.explain("formatted")
    plan = buf.getvalue()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("content" not in ln for ln in read_schema), plan


def test_q95_digest_logic_over_ingested_files(spark, tmp_path):
    # the q95 manifest arithmetic (length / md5 / 64-byte chunk count)
    # applied to real ingested bytes, checked against hashlib
    base = _write_tree(tmp_path)
    df = read_media_dir(spark, base, "image", glob="*.png").select(
        "path",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        F.expr("(length(payload) + 63) div 64").cast("long").alias("n_chunks"),
    )
    for r in df.collect():
        name = os.path.basename(r["path"])
        want = _FILES[name if name != "c.png" else "nested/c.png"]
        assert r["digest"] == hashlib.md5(want).hexdigest()
        assert r["n_bytes"] == len(want)
        assert r["n_chunks"] == (len(want) + 63) // 64


def test_extract_media_features_over_ingested_files(spark, tmp_path):
    base = _write_tree(tmp_path)
    feats = extract_media_features(
        read_media_dir(spark, base, "image", glob="*.png")
    ).collect()
    assert len(feats) == 3
    for r in feats:
        assert r["media_type"] == "image"
        assert len(r["embedding"]) == EMBED_DIM
        assert abs(np.linalg.norm(r["embedding"]) - 1.0) < 1e-5


def test_phash_neardup_over_ingested_files(spark, tmp_path):
    """read_media_dir -> media_phash -> banded pairs over REAL files:
    a lightly-edited copy (same length, localized byte patch) must pair
    with its original at low hamming; unrelated files must not pair."""
    import random

    from etl_pipeline_candy_store_spark.operators.multimodal import (
        media_phash,
        phash_neardup_pairs,
    )

    rng = random.Random(3)
    base_bytes = bytes(
        rng.choice(b"abcdefghijklmnopqrstuvwxyz ") for _ in range(2048)
    )
    # same-length localized edit: the re-encoded-copy stand-in
    edited = base_bytes[:100] + b"Q" * 12 + base_bytes[112:]
    other = bytes(
        rng.choice(b"abcdefghijklmnopqrstuvwxyz ") for _ in range(2048)
    )
    d = tmp_path / "media"
    d.mkdir()
    (d / "orig.bin").write_bytes(base_bytes)
    (d / "edited.bin").write_bytes(edited)
    (d / "other.bin").write_bytes(other)

    media = read_media_dir(spark, str(d), "image", glob="*.bin")
    by_id = {
        r["media_id"]: os.path.basename(r["path"])
        for r in media.select("media_id", "path").collect()
    }
    pairs = phash_neardup_pairs(media_phash(media)).collect()
    got = {
        frozenset((by_id[r["media_a"]], by_id[r["media_b"]])): r["hamming"]
        for r in pairs
    }
    assert frozenset(("orig.bin", "edited.bin")) in got
    assert got[frozenset(("orig.bin", "edited.bin"))] <= 6
    assert all(
        "other.bin" not in pair for pair in got
    ), got  # white noise never pairs


def test_phash_deterministic_and_media_keyed(spark, tmp_path):
    """Same payload -> same signature regardless of partitioning, and
    payloads under 64 bytes are dropped (no full profile)."""
    from etl_pipeline_candy_store_spark.operators.multimodal import (
        media_phash,
    )

    rows = [
        (1, b"x" * 63),  # too short: dropped
        (2, bytes(range(32, 96)) * 4),
        (3, bytes(range(32, 96)) * 4),  # identical content, other id
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["phash"]
        for r in media_phash(df.repartition(7)).collect()
    }
    assert set(got) == {2, 3}
    assert got[2] == got[3]
