"""AQE-interplay guard for the allocation colocation contract (ST1).

allocate_sequential's correctness rests on "every key's rows are in
exactly ONE task" — via its own repartition(keys) or a bucketed scan.
Two AQE mechanisms could in principle re-split partitions at runtime:
skew-join splitting (OptimizeSkewedJoin) and partition coalescing /
rebalance skew-splitting. Spark exempts both paths this operator uses:

- a user repartition(cols) has shuffle origin REPARTITION_BY_COL, which
  AQE's coalescing and skew rules leave alone (they only touch
  ENSURE_REQUIREMENTS and REBALANCE_* shuffles);
- skew-JOIN splitting rewrites SortMergeJoin/ShuffledHashJoin reads,
  and the allocation stage is mapInPandas, not a join;
- the bucketed-input path has NO exchange for AQE to rewrite at all
  (and autoBucketedScan is forced off so the scan stays bucketed).

These tests force the most aggressive skew/coalesce settings and assert
the one-task-per-key invariant and result equality anyway — so a Spark
upgrade that changes the exemptions fails HERE, not as silent stock
corruption at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.allocation import (
    allocate_sequential,
)
from etl_pipeline_candy_store_spark.sources.writers import write_bucketed_table

_KW = dict(key_col="key", seq_cols=["seq"], qty_col="qty", stock_col="stock")

_AGGRESSIVE = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled": "true",
}


def _skewed(spark, total=200_000, hot=120_000):
    # one hot key holds most rows — several MB in one shuffle partition,
    # far above the 16KB thresholds forced below
    return spark.range(total).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise((F.col("id") % 50) + 1)
        .cast("int")
        .alias("key"),
        F.col("id").cast("long").alias("seq"),
        (F.col("id") % 3 + 1).cast("int").alias("qty"),
        F.lit(100_000).cast("long").alias("stock"),
    )


@pytest.fixture()
def aggressive_aqe(spark):
    saved = {k: spark.conf.get(k, None) for k in _AGGRESSIVE}
    for k, v in _AGGRESSIVE.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_repartition_by_col_not_split_by_aqe(spark, aggressive_aqe):
    # the invariant itself, measured: after repartition(key) every key
    # observes exactly one spark_partition_id at execution time — even
    # with skew thresholds set low enough that the hot key's partition
    # would be split many times over if the exemption didn't hold
    pids = (
        _skewed(spark)
        .repartition("key")
        .select("key", F.spark_partition_id().alias("pid"))
        .groupBy("key")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .where(F.col("n_pids") > 1)
        .count()
    )
    assert pids == 0


def test_allocation_identical_under_aggressive_aqe(spark, aggressive_aqe):
    got = sorted(
        map(tuple, allocate_sequential(_skewed(spark), **_KW).collect())
    )
    # reference run without AQE interference (plain confs restored by
    # fixture ordering is not enough — compute it with AQE fully off)
    for k in _AGGRESSIVE:
        spark.conf.unset(k)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        want = sorted(
            map(tuple, allocate_sequential(_skewed(spark), **_KW).collect())
        )
    finally:
        spark.conf.unset("spark.sql.adaptive.enabled")
    assert got == want
    assert any(r[-2] == 1 for r in got)  # cancellations exercised


def test_bucketed_path_identical_under_aggressive_aqe(spark, aggressive_aqe):
    tbl = "b_aqe_skew_alloc"
    try:
        write_bucketed_table(
            _skewed(spark), tbl, ["key"], 4, sort_cols=["key", "seq"]
        )
        got = sorted(
            map(
                tuple,
                allocate_sequential(
                    spark.table(tbl), input_partitioned=True, **_KW
                ).collect(),
            )
        )
        want = sorted(
            map(tuple, allocate_sequential(_skewed(spark), **_KW).collect())
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
