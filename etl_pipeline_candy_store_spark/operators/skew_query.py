"""Catalog entry proving the skew-mitigation join (operators/skew.py)
is semantically invisible.

q138 runs the orders↔lineitem join through :func:`salted_join` — fact
rows get a content-derived salt, the dim side replicates across all
salts, the join key widens to (key, salt) — and aggregates revenue per
order priority. Its oracle is the PLAIN unsalted SQL join: the hash
compare is the proof that salting changes the shuffle layout and
nothing else. This is the escape hatch for the hot-key join AQE cannot
fix (AQE only splits the probe side of a sort-merge partition; a
build-side hot key still lands in one task), profiled by q135's skew
diagnostic.

The reference joins its fact rows to dimensions driver-side one row at
a time (/root/reference/src/data_processor.py:389-465) and has no skew
story; this is the Spark-first scale path for the same join capability
(SURVEY §2 J1/J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.skew import salted_join
from etl_pipeline_candy_store_spark.plans.catalog import load, register


@register(
    "q138_salted_join_revenue",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Skew-safe fact↔dim equi-join: lineitem rows take a "
    "content-derived salt (stable under task retry — hash of the row, "
    "never rand()/partition-id), orders replicate across the 8 salts, "
    "and the join runs on (orderkey, salt) so a hot order key spreads "
    "over 8 tasks instead of one. The oracle is the PLAIN unsalted "
    "join — the hash compare proves salting is semantically invisible. "
    "Revenue sums in DECIMAL then casts to double, so the result is "
    "independent of accumulation order (and therefore of the salt "
    "fan-out). Use when the dim is too big to broadcast and a key is "
    "hot enough to defeat AQE's probe-side-only skew split.",
)
def q138_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(15,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
        )
        .cast("double")
        .alias("revenue"),
    )
