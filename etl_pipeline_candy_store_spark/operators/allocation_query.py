"""Conformance queries for the ST1 allocation operator on the synthetic
star schema: lineitem rows are allocation requests against a synthetic
per-part opening stock (floor(p_retailprice) — deterministic, and sized so
a realistic fraction of parts exhausts mid-stream).

The exact operator (cancellation feedback) gets a FULL DuckDB oracle via a
recursive CTE that replays the greedy loop per key — so even the engine's
one non-relational operator is hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.allocation import (
    allocate_sequential,
    allocate_windowed,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register

_OUT_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "requested_qty",
    "quantity",
    "cancelled",
    "stock_after",
]


def _requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select(
        "p_partkey", F.floor("p_retailprice").cast("long").alias("stock")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_shipdate",
        F.col("l_quantity").cast("int").alias("requested_qty"),
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "inner")


_ORACLE_BASE = """
WITH RECURSIVE req AS (
  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
         CAST(l.l_quantity AS INTEGER) AS requested_qty,
         CAST(floor(p.p_retailprice) AS BIGINT) AS stock,
         CAST(ROW_NUMBER() OVER (PARTITION BY l.l_partkey
              ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber) AS BIGINT) AS idx
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
alloc AS (
  SELECT l_orderkey, l_linenumber, l_partkey, requested_qty, idx,
         CASE WHEN requested_qty <= stock THEN requested_qty ELSE 0 END AS quantity,
         CASE WHEN requested_qty <= stock THEN 0 ELSE 1 END AS cancelled,
         CASE WHEN requested_qty <= stock THEN stock - requested_qty ELSE stock END AS stock_after
  FROM req WHERE idx = 1
  UNION ALL
  SELECT r.l_orderkey, r.l_linenumber, r.l_partkey, r.requested_qty, r.idx,
         CASE WHEN r.requested_qty <= a.stock_after THEN r.requested_qty ELSE 0 END,
         CASE WHEN r.requested_qty <= a.stock_after THEN 0 ELSE 1 END,
         CASE WHEN r.requested_qty <= a.stock_after
              THEN a.stock_after - r.requested_qty ELSE a.stock_after END
  FROM req r JOIN alloc a ON r.l_partkey = a.l_partkey AND r.idx = a.idx + 1
)
SELECT l_orderkey, l_linenumber, l_partkey, requested_qty,
       CAST(quantity AS INTEGER) AS quantity,
       CAST(cancelled AS INTEGER) AS cancelled,
       CAST(stock_after AS BIGINT) AS stock_after
FROM alloc
"""


@register(
    "q30_allocation_sequential",
    oracle=_ORACLE_BASE,
    doc="ST1 exact greedy allocation (cancellation feedback) — "
    "applyInPandas per part key; oracle replays the loop via recursive CTE.",
)
def q30_allocation_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    alloc = allocate_sequential(
        _requests(spark, sf_dir),
        key_col="l_partkey",
        seq_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        qty_col="requested_qty",
        stock_col="stock",
    )
    return alloc.select(*_OUT_COLS)


@register(
    "q31_allocation_windowed",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, requested_qty,
       CAST(CASE WHEN cum <= stock THEN requested_qty ELSE 0 END AS INTEGER) AS quantity,
       CAST(CASE WHEN cum <= stock THEN 0 ELSE 1 END AS INTEGER) AS cancelled,
       CAST(greatest(stock - cum, 0) AS BIGINT) AS stock_after
FROM (
  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
         CAST(l.l_quantity AS INTEGER) AS requested_qty,
         CAST(floor(p.p_retailprice) AS BIGINT) AS stock,
         SUM(CAST(l.l_quantity AS BIGINT)) OVER (PARTITION BY l.l_partkey
             ORDER BY l.l_shipdate, l.l_orderkey, l.l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
""",
    doc="W2 window-based allocation approximation (no feedback) — fully "
    "declarative contrast case from SURVEY §4.3.",
)
def q31_allocation_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    alloc = allocate_windowed(
        _requests(spark, sf_dir),
        key_col="l_partkey",
        seq_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        qty_col="requested_qty",
        stock_col="stock",
    )
    return alloc.select(*_OUT_COLS)


@register(
    "q32_allocation_rollup",
    oracle=f"""
WITH alloc AS ({_ORACLE_BASE})
SELECT l_partkey,
       COUNT(*) AS n_lines,
       CAST(SUM(quantity) AS BIGINT) AS fulfilled_qty,
       CAST(SUM(cancelled) AS BIGINT) AS n_cancelled,
       CAST(MIN(stock_after) AS BIGINT) AS final_stock
FROM alloc GROUP BY l_partkey
""",
    doc="products_updated analog: per-key fulfilled totals, cancelled "
    "count (A3) and final stock (src/data_processor.py:553-568).",
)
def q32_allocation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    alloc = q30_allocation_sequential(spark, sf_dir)
    return alloc.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("quantity").alias("fulfilled_qty"),
        F.sum("cancelled").alias("n_cancelled"),
        F.min("stock_after").alias("final_stock"),
    )


@register(
    "q127_allocation_auto",
    oracle=_ORACLE_BASE,
    doc="ST1 allocation through the skew-aware front door: allocate() "
    "probes the request relation's skew shape (one map-side-combinable "
    "aggregate: per-key rows, requested-qty sum, stock) and dispatches "
    "to the partition-sorted sequential operator or the bucketed "
    "hot-key escape — on this TPC-H-shaped instance the probe finds "
    "ordinary skew and routes sequential. Same recursive-CTE oracle as "
    "q30: WHICHEVER strategy the probe picks must replay the greedy "
    "cancellation-feedback loop exactly, so the dispatcher itself is "
    "hash-checked, not just its two strategies separately "
    "(tests force both dispatch outcomes; SCALE_NOTES records the "
    "measured crossovers the thresholds encode).",
)
def q127_allocation_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.allocation import allocate

    alloc = allocate(
        _requests(spark, sf_dir),
        key_col="l_partkey",
        seq_cols=["l_shipdate", "l_orderkey", "l_linenumber"],
        qty_col="requested_qty",
        stock_col="stock",
    )
    return alloc.select(*_OUT_COLS)
