"""Interval sweep-line analytics: peak concurrency over an interval
relation.

"How many orders are open at once, and when does load peak?" is the
interval-overlap question a naive engine answers with an
interval-to-interval self-join (quadratic in overlap density) or a
per-event global sort. The sweep-line form used here turns each
interval into a +1 delta at its start and a -1 delta the day after its
end, aggregates deltas per day, and takes a running sum over the
per-day totals. The crucial scale property: after the per-day
aggregation the windowed relation is bounded by the CALENDAR (one row
per distinct day), not by the row count — 100 TB of orders still
collapses to a few thousand daily delta rows, so the single
unpartitioned running-sum window is over a provably tiny relation
(same documented pattern as the q119/q137 bucket-totals windows; at
finer sweep granularities, swap in the bucketed two-level prefix sum
from operators/corpus_curation.py).

Extends the reference's per-day aggregation family
(/root/reference/src/data_processor.py daily summaries, SURVEY §2 A2)
from "events that happen on a day" to "intervals that span days".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.plans.catalog import load, register


def interval_deltas(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Row-local sweep-line decomposition: each closed day-granularity
    interval [start, end] becomes (+1 at start day, -1 the day after
    end) — the integer-additive partials both the batch operator and
    the streaming maintenance sink aggregate."""
    return intervals.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).cast("date").alias("d"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.date_add(F.col(end_col).cast("date"), 1).alias("d"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e")
    ).select("e.d", "e.delta")


def concurrency_from_byday(byday: DataFrame) -> DataFrame:
    """(d, open_count) from an aggregated (d, delta) per-day relation —
    the cheap windowed half of the sweep, over a calendar-bounded
    input (maintained incrementally by
    streaming/concurrency_stream.py, or built in-query by
    :func:`interval_concurrency`)."""
    run = byday.withColumn(
        "open_count",
        F.sum("delta").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return run.select("d", "open_count")


def interval_concurrency(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Per-day open-interval counts (d, open_count) for a relation of
    closed day-granularity intervals [start, end]. One shuffle (the
    per-day delta aggregation); the running sum windows over the
    calendar-bounded per-day relation."""
    byday = (
        interval_deltas(intervals, start_col, end_col)
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    return concurrency_from_byday(byday)


@register(
    "q190_peak_concurrency",
    oracle="""
WITH ends AS (
  SELECT l_orderkey, MAX(l_shipdate) AS close_ts
  FROM lineitem GROUP BY l_orderkey
),
iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS start_d,
         CAST(e.close_ts AS DATE) AS end_d
  FROM orders o JOIN ends e ON e.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT start_d AS d, 1 AS delta FROM iv
  UNION ALL
  SELECT end_d + 1, -1 FROM iv
),
byday AS (SELECT d, SUM(delta) AS delta FROM deltas GROUP BY d),
run AS (
  SELECT d, SUM(delta) OVER (ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_count
  FROM byday
),
peak AS (
  SELECT CAST(year(d) AS INTEGER) AS year,
         CAST(MAX(open_count) AS BIGINT) AS peak_open_orders
  FROM run GROUP BY 1
)
SELECT p.year, p.peak_open_orders, MIN(r.d) AS peak_date
FROM peak p
JOIN run r ON CAST(year(r.d) AS INTEGER) = p.year
          AND r.open_count = p.peak_open_orders
GROUP BY 1, 2
""",
    doc="Sweep-line peak concurrency: treat each order as an interval "
    "[o_orderdate, max lineitem ship date] and report, per year, the "
    "maximum number of simultaneously open orders and the first day "
    "it is reached. No interval self-join and no per-event global "
    "sort: intervals become +1/-1 day deltas, ONE per-day aggregation "
    "shuffle collapses 100 TB of orders to a calendar-bounded delta "
    "relation, and the running sum windows over that tiny relation "
    "(the documented bucket-totals window category). Peak-day "
    "selection is an argmax per year (min_by on (-count, day)).",
)
def q190_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    iv = o.join(ends, ends["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderdate").alias("start_ts"), "close_ts"
    )
    run = interval_concurrency(iv, "start_ts", "close_ts")
    return run.groupBy(F.year("d").cast("int").alias("year")).agg(
        F.max("open_count").cast("long").alias("peak_open_orders"),
        F.expr("min_by(d, struct(-open_count, d))").alias("peak_date"),
    )
