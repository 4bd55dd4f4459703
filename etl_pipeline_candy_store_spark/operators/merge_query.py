"""Conformance queries for MERGE-upsert and SCD2 (emulated MERGE INTO)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.merge import (
    merge_upsert,
    scd2_from_events,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register


@register(
    "q38_merge_upsert",
    oracle="""
WITH updates AS (
  SELECT c_custkey, 'relabeled' AS c_name, c_nationkey,
         CAST(0.0 AS DOUBLE) AS c_acctbal, 'MACHINERY' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
UNION ALL
SELECT * FROM updates
""",
    doc="MERGE/upsert emulation: anti-join + union (MERGE INTO on a "
    "lakehouse table; one key shuffle here).",
)
def q38_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("relabeled").alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("MACHINERY").alias("c_mktsegment"),
    )
    return merge_upsert(c, updates, keys=["c_custkey"])


@register(
    "q39_scd2_history",
    oracle="""
WITH marked AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                   OR o_orderpriority <> lag(o_orderpriority) OVER w
              THEN 1 ELSE 0 END AS is_change
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
versions AS (SELECT * FROM marked WHERE is_change = 1)
SELECT o_custkey, o_orderpriority,
       CAST(o_orderdate AS DATE) AS valid_from,
       COALESCE(CAST(lead(o_orderdate) OVER w2 AS DATE), DATE '9999-12-31') AS valid_to,
       CASE WHEN lead(o_orderdate) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
FROM versions
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="SCD2 dimension history from a change stream: each customer's "
    "priority changes become versioned rows with validity ranges.",
)
def q39_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    # deterministic change order: orderdate then orderkey (ties broken the
    # same way in the oracle's first window)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    marked = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.col("o_orderpriority") != F.lag("o_orderpriority").over(w)),
            1,
        )
        .otherwise(0)
        .alias("_is_change"),
    )
    versions = marked.filter(F.col("_is_change") == 1)
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return versions.select(
        "o_custkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("valid_from"),
        # sentinel instead of NULL: open-ended validity hashes identically
        # across engines (null date renderings differ)
        F.coalesce(
            F.to_date(F.lead("o_orderdate").over(w2)),
            F.lit("9999-12-31").cast("date"),
        ).alias("valid_to"),
        F.when(F.lead("o_orderdate").over(w2).isNull(), 1)
        .otherwise(0)
        .alias("is_current"),
    )
