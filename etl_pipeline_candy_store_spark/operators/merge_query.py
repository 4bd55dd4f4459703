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


_SCD2_SQL = """
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
"""


@register(
    "q39_scd2_history",
    oracle=_SCD2_SQL,
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


@register(
    "q155_point_in_time_join",
    oracle=f"""
WITH hist AS ({_SCD2_SQL})
SELECT o.o_orderkey, o.o_custkey,
       h.o_orderpriority AS version_priority,
       h.valid_from,
       CAST(date_diff('day', h.valid_from, CAST(o.o_orderdate AS DATE))
            AS BIGINT) AS age_days
FROM orders o
JOIN hist h ON h.o_custkey = o.o_custkey
  AND CAST(o.o_orderdate AS DATE) >= h.valid_from
  AND CAST(o.o_orderdate AS DATE) < h.valid_to
""",
    doc="Point-in-time (temporal) join: every order matched to the SCD2 "
    "dimension version (q39's history) valid AT its order date — the "
    "bitemporal-correctness pattern that prevents training/reporting "
    "on future attribute values (feature leakage). Each fact matches "
    "EXACTLY one version: the validity intervals partition each key's "
    "timeline (new version effective ON its change date, half-open "
    "[from, to)). Plan shape: equi-join on the customer key carries "
    "the selectivity, the range predicate prunes to the single valid "
    "version — never a blind interval cross-product; version_age_days "
    "is the staleness readout. Composes q39's registered SQL (single "
    "copy of the SCD2 semantics).",
)
def q155_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("od")
    )
    h = q39_scd2_history(spark, sf_dir).select(
        "o_custkey",
        F.col("o_orderpriority").alias("version_priority"),
        "valid_from",
        "valid_to",
    )
    return (
        o.join(
            h,
            (o["o_custkey"] == h["o_custkey"])
            & (o["od"] >= h["valid_from"])
            & (o["od"] < h["valid_to"]),
        )
        .select(
            "o_orderkey",
            o["o_custkey"].alias("o_custkey"),
            "version_priority",
            "valid_from",
            F.datediff(F.col("od"), F.col("valid_from"))
            .cast("long")
            .alias("age_days"),
        )
    )
