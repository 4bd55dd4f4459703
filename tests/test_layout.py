"""Z-order key: known bit patterns and the locality property the
layout exists for (tight per-file ranges on BOTH dimensions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.layout import (
    cluster_by_zorder,
    zorder_key,
)


def test_zorder_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 0), (0, 3), (3, 3)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    }
    # x bits -> even positions, y bits -> odd positions
    assert got == {
        (0, 0): 0,
        (1, 0): 1,
        (0, 1): 2,
        (1, 1): 3,
        (3, 0): 0b0101,
        (0, 3): 0b1010,
        (3, 3): 0b1111,
    }


def test_zorder_clustering_bounds_both_dims(spark):
    """After Z-order layout, each partition must span a bounded window
    of BOTH x and y; a lexicographic (x, y) sort would leave y spanning
    the full domain in every partition."""
    n, parts = 4096, 16
    grid = spark.range(n).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
    )
    clustered = cluster_by_zorder(grid, "x", "y", parts, n_bits=6)
    spans = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == parts
    # perfect square decomposition would give span 16; allow 2x slack for
    # range-partition boundaries cutting across quads
    assert all(r["sx"] <= 32 and r["sy"] <= 32 for r in spans)
