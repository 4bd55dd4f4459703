"""Dynamic partition overwrite: an incremental day-load must replace
only the day it carries, never truncate the sibling partitions."""

from __future__ import annotations

import os

from etl_pipeline_candy_store_spark.sources.writers import save_partitioned_parquet


def _mk(spark, rows):
    return spark.createDataFrame(rows, "day string, k int, v string")


def test_dynamic_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    full = _mk(
        spark,
        [("d1", 1, "a"), ("d2", 2, "b"), ("d3", 3, "c")],
    )
    save_partitioned_parquet(full, path, partition_by=["day"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    ) == ["day=d1", "day=d2", "day=d3"]

    # incremental load: a corrected d2 arrives alone
    save_partitioned_parquet(
        _mk(spark, [("d2", 2, "b2")]), path, partition_by=["day"], dynamic=True
    )
    got = {
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {("d1", 1, "a"), ("d2", 2, "b2"), ("d3", 3, "c")}


def test_static_overwrite_truncates_the_table(spark, tmp_path):
    """The default documents WHY dynamic exists: static overwrite of a
    one-day frame deletes every other partition."""
    path = str(tmp_path / "t")
    save_partitioned_parquet(
        _mk(spark, [("d1", 1, "a"), ("d2", 2, "b")]), path, partition_by=["day"]
    )
    save_partitioned_parquet(
        _mk(spark, [("d2", 2, "b2")]), path, partition_by=["day"]
    )
    got = {(r["day"], r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("d2", "b2")}
