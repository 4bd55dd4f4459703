"""Training-shard export: stable membership, exhaustive coverage, and a
footer-derived manifest that agrees with what Spark reads back."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.sources.writers import write_training_shards

SF = "/root/testdata/sf0.001"


def test_shards_cover_and_manifest_agrees(spark, tmp_path):
    docs = load(spark, SF, "documents")
    total = docs.count()
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        docs, path, key_cols=["doc_id"], n_shards=4, order_cols=["source", "doc_id"]
    )
    assert manifest["total_rows"] == total
    assert set(manifest["shards"]) == {0, 1, 2, 3}
    assert all(s["n_rows"] > 0 and s["n_bytes"] > 0 for s in manifest["shards"].values())
    # the manifest on disk matches the returned one (keys stringified by json)
    with open(os.path.join(path, "_manifest.json")) as fh:
        on_disk = json.load(fh)
    assert on_disk["total_rows"] == total
    # Spark reads back every row exactly once, with the shard column
    back = spark.read.parquet(path)
    assert back.count() == total
    assert back.select("doc_id").distinct().count() == total
    per_shard = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_shard == {k: v["n_rows"] for k, v in manifest["shards"].items()}


def test_shard_assignment_is_content_stable(spark, tmp_path):
    docs = load(spark, SF, "documents")
    m1 = write_training_shards(
        docs, str(tmp_path / "a"), key_cols=["doc_id"], n_shards=8
    )
    # re-export from a differently-partitioned frame: same membership
    m2 = write_training_shards(
        docs.repartition(13), str(tmp_path / "b"), key_cols=["doc_id"], n_shards=8
    )
    assert {k: v["n_rows"] for k, v in m1["shards"].items()} == {
        k: v["n_rows"] for k, v in m2["shards"].items()
    }
    a = spark.read.parquet(str(tmp_path / "a")).select("doc_id", "shard")
    b = spark.read.parquet(str(tmp_path / "b")).select("doc_id", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ordered_export_keeps_write_parallelism(spark, tmp_path):
    """order_cols must not collapse a shard to one task: the range
    repartition on (shard, order_cols) splits a big shard across many
    partitions, so a single hot shard still gets parallel writers."""
    docs = load(spark, SF, "documents")
    out = docs.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(2)).cast("int")
    ).repartitionByRange(8, F.col("shard"), F.col("source"), F.col("doc_id"))
    n_parts_per_shard = (
        out.withColumn("part", F.spark_partition_id())
        .groupBy("shard")
        .agg(F.countDistinct("part").alias("n"))
        .collect()
    )
    assert all(r["n"] > 1 for r in n_parts_per_shard), n_parts_per_shard
    # and the real writer produces multiple files per shard directory
    # (AQE rightly coalesces this tiny shuffle to one partition, which
    # would mask the old one-task-per-shard bug — hold it off here)
    path = str(tmp_path / "shards")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        man = write_training_shards(
            docs, path, key_cols=["doc_id"], n_shards=2, order_cols=["source", "doc_id"]
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert all(s["n_files"] > 1 for s in man["shards"].values()), man["shards"]


def test_jsonl_shards_match_parquet_membership(spark, tmp_path):
    """jsonl export: same content-derived shard membership as parquet,
    manifest row counts agree, and rows round-trip through json."""
    docs = load(spark, SF, "documents").select("doc_id", "source", "text")
    total = docs.count()
    ppath = str(tmp_path / "shards_parquet")
    jpath = str(tmp_path / "shards_jsonl")
    pman = write_training_shards(docs, ppath, key_cols=["doc_id"], n_shards=4)
    jman = write_training_shards(
        docs, jpath, key_cols=["doc_id"], n_shards=4, fmt="jsonl"
    )
    assert jman["total_rows"] == total
    assert {k: v["n_rows"] for k, v in jman["shards"].items()} == {
        k: v["n_rows"] for k, v in pman["shards"].items()
    }
    back = spark.read.json(jpath)
    assert back.count() == total
    assert back.select("doc_id").distinct().count() == total
    # identical membership row-by-row, not just counts
    pq_pairs = spark.read.parquet(ppath).select("doc_id", "shard")
    j_pairs = back.select("doc_id", "shard")
    assert pq_pairs.exceptAll(j_pairs).count() == 0
