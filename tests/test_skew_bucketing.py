"""Skew helpers must be result-identical to their naive forms, and
bucketed tables must join without a shuffle (the co-located join path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.skew import salted_agg, salted_join


def test_salted_agg_equals_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    plain = {
        r["l_partkey"]: (r["s"], r["n"])
        for r in li.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        r["l_partkey"]: (r["s"], r["n"])
        for r in salted_agg(
            li,
            ["l_partkey"],
            aggs=[F.sum("part_s").alias("s"), F.sum("part_n").alias("n")],
            partial_aggs=[
                F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("part_s"),
                F.count(F.lit(1)).alias("part_n"),
            ],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet").select(
        "p_partkey", "p_brand"
    ).withColumnRenamed("p_partkey", "l_partkey")
    plain = sorted(
        map(tuple, li.join(part, "l_partkey").select(
            "l_orderkey", "l_linenumber", "p_brand").collect())
    )
    salted = sorted(
        map(tuple, salted_join(li, part, "l_partkey", n_salts=4).select(
            "l_orderkey", "l_linenumber", "p_brand").collect())
    )
    assert salted == plain


def test_with_salt_is_content_deterministic(spark):
    """Salts must derive from row content so a recomputed (retried) task
    re-salts identically: same rows -> same salts, independent of
    partition layout."""
    from etl_pipeline_candy_store_spark.operators.skew import with_salt

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    # key on full row content ((orderkey, linenumber) is not unique in the
    # synthetic data); multiset compare via sorted (row, salt) tuples
    a = sorted(map(tuple, with_salt(li, 8).collect()))
    # different partition layout, same rows -> identical salt per row
    b = sorted(map(tuple, with_salt(li.repartition(3, "l_quantity"), 8).collect()))
    assert a == b
    assert {t[-1] for t in a} == set(range(8))  # spreads across the range


def test_salted_join_rejects_outer(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(li, li, "l_partkey", how="full")


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-co-locates rows: the join
    plan must contain no Exchange (shuffle) above either scan — the
    physical contract that makes repeated big-big joins cheap at scale."""
    # spark.sql.warehouse.dir is static; tables land in the session's
    # default warehouse and are dropped in the finally block.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_hll_estimate_accuracy(spark):
    """The sketch must land within ~20% of the exact distinct count at
    m=256 hex-granularity (and be deterministic)."""
    from etl_pipeline_candy_store_spark.operators.sketch import hll_distinct
    import pyspark.sql.functions as F

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    est = hll_distinct(o, F.col("o_custkey")).collect()[0]["distinct_estimate"]
    exact = o.select("o_custkey").distinct().count()
    assert abs(est - exact) / exact < 0.20, (est, exact)
    est2 = hll_distinct(o, F.col("o_custkey")).collect()[0]["distinct_estimate"]
    assert est == est2


def test_aqe_splits_skewed_join_partition(spark):
    # the session claims AQE skew-join posture; prove the runtime
    # actually splits a skewed partition. Thresholds are shrunk so the
    # local fixture trips the same code path a 100 TB hot key would.
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% on key 0
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's plan (count() builds a separate one),
        # then read the adaptive final plan off the same queryExecution
        assert len(joined.collect()) == n
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
