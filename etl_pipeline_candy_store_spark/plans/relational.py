"""Core relational conformance queries (SURVEY.md §2.1-§2.8).

Each query maps one or more reference operators (cited per query) onto the
declarative DataFrame API and registers a DuckDB oracle. Money math runs
through DECIMAL on both engines so results are bit-identical regardless of
accumulation order (the testdata doubles are clean 2-decimal values, so
double→decimal casts agree between Spark's shortest-repr rounding and
DuckDB's binary rounding).

Scale notes are inline: every join states its expected physical strategy
(broadcast vs shuffle) and every aggregation is partial-aggregatable
(map-side combine) because it is expressed with built-in functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.plans.catalog import load, register

# Decimal helpers: price-like columns (clean 2-decimal doubles) and
# rate-like columns (discount/tax in [0,1]).
_PRICE = "decimal(15,2)"
_RATE = "decimal(5,2)"


def _dec(col: str, t: str = _PRICE):
    return F.col(col).cast(t)


def _dsum(col, alias: str):
    """Exact decimal sum surfaced as double (engine-order independent)."""
    return F.sum(col).cast("double").alias(alias)


# --------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape). Reference ops: P2 filter,
# A1/A2 aggregation (src/data_processor.py:401-403,467-484), F1 rounding.
# Scale: single scan → partial agg → 6-group final agg; no join, one
# shuffle on (l_returnflag, l_linestatus); shipdate predicate pushed to
# parquet.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(_dec("l_quantity"), "sum_qty"),
            _dsum(_dec("l_extendedprice"), "sum_base_price"),
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE)),
                "sum_disc_price",
            ),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount", _RATE)).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02 — filter + project + computed columns (P1/P2/F8/P5-style CASE;
# src/data_processor.py:520-528, src/main.py:110). Pushdown check: both
# predicates and the 4-column projection reach the parquet scan.
# --------------------------------------------------------------------------
@register(
    "q02_filter_project",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS price_cents,
       CASE WHEN o_totalprice >= 100000 THEN 'high'
            WHEN o_totalprice >= 10000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 1000
""",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 1000)).select(
        "o_orderkey",
        "o_custkey",
        (_dec("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.when(F.col("o_totalprice") >= 100000, "high")
        .when(F.col("o_totalprice") >= 10000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


# --------------------------------------------------------------------------
# q03 — broadcast hash join to a dimension + aggregate (J1:
# src/data_processor.py:364-371,413-422 — items→products lookup).
# Scale: part is the small side → explicit broadcast hint; lineitem never
# shuffles for the join, only for the final group-by on p_brand.
# --------------------------------------------------------------------------
@register(
    "q03_broadcast_join_agg",
    oracle="""
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(15,2))) AS BIGINT) AS total_qty,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def q03_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_quantity")).cast("long").alias("total_qty"),
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE)),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q04 — multi-way join through the star schema (TPC-H Q5 shape; exercises
# the full join surface the reference only gestures at with J1/J2).
# Scale: region/nation broadcast; customer⋈orders⋈lineitem shuffle on
# keys; AQE handles skew.
# --------------------------------------------------------------------------
@register(
    "q04_multi_join_region",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
GROUP BY n.n_name
""",
)
def q04_multi_join_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("n_name")
        .agg(
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE)),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q05 — left outer join + null-aware aggregate (J2, the reference's
# declared-but-unimplemented customer join, src/data_processor.py:519).
# --------------------------------------------------------------------------
@register(
    "q05_left_join_orders",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(15,2))), 0) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""",
)
def q05_left_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(_PRICE))
            .cast("double")
            .alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# q06/q07 — semi and anti joins (the relational forms of the reference's
# membership predicates, P4 src/data_processor.py:413-416).
# --------------------------------------------------------------------------
@register(
    "q06_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
)
def q06_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q07_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
)
def q07_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# q08 — top-k with deterministic tiebreak (O1/O2 sorts,
# src/data_processor.py:514-539 + limit). Scale: TakeOrderedAndProject —
# per-partition top-k then driver merge of k·partitions rows; never a
# full sort.
# --------------------------------------------------------------------------
@register(
    "q08_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def q08_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q09 — running total window (W2: the reference's implicit per-product
# running inventory sum, src/data_processor.py:427-440, as a window).
# Explicit ROWS frame; unique (custkey, orderdate, orderkey) ordering.
# --------------------------------------------------------------------------
@register(
    "q09_window_running_sum",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
""",
)
def q09_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# --------------------------------------------------------------------------
# q10 — ranking window + filter (top-3 orders per customer).
# --------------------------------------------------------------------------
@register(
    "q10_window_rank",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def q10_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# q11 — exact distinct / dedup (dropDuplicates; SURVEY §2.4 "distinct").
# --------------------------------------------------------------------------
@register(
    "q11_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# --------------------------------------------------------------------------
# q12 — set operations: UNION (U1, src/data_processor.py:490-500 — there a
# quadratic per-day union fold; here one n-way unionByName), INTERSECT,
# EXCEPT.
# --------------------------------------------------------------------------
@register(
    "q12_set_ops",
    oracle="""
(SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(op).exceptAll(p.distinct())


@register(
    "q13_union_fold",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n FROM (
  SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'F'
  UNION ALL SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'O'
  UNION ALL SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'P'
) GROUP BY o_orderstatus
""",
)
def q13_union_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    o = load(spark, sf_dir, "orders")
    parts = [o.filter(F.col("o_orderstatus") == s).select("o_orderstatus") for s in "FOP"]
    return reduce(DataFrame.unionByName, parts).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# q14/q15 — rollup & cube (grouping-set surface; SURVEY §2.4 row "—").
# --------------------------------------------------------------------------
@register(
    "q14_rollup",
    oracle="""
SELECT r.r_name, n.n_name,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS acct_sum,
       COUNT(*) AS n_cust
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            _dsum(_dec("c_acctbal"), "acct_sum"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@register(
    "q15_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(_dec("o_totalprice"), "total"),
    )


# --------------------------------------------------------------------------
# q16 — datetime scalar functions (F4/F5/F6: ISO parse, date arithmetic,
# truncation; src/data_processor.py:478-479,205-207, src/main.py:26-37).
# --------------------------------------------------------------------------
@register(
    "q16_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS due_date,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch_start,
       strftime(o_orderdate, '%Y%m%d') AS yyyymmdd
FROM orders WHERE o_orderkey % 10 = 0
""",
)
def q16_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_add(d, 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("yyyymmdd"),
    )


# --------------------------------------------------------------------------
# q17 — string scalar functions (F9-adjacent display surface).
# --------------------------------------------------------------------------
@register(
    "q17_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       substr(p_name, 1, 5) AS name_prefix,
       CAST(length(p_name) AS INTEGER) AS name_len,
       replace(p_name, ' ', '_') AS name_snake,
       p_brand || ':' || p_type AS brand_type,
       CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget
FROM part
""",
)
def q17_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").contains("widget"), 1).otherwise(0).alias("is_widget"),
    )


# --------------------------------------------------------------------------
# q18 — JSON extraction (the reference's nested-JSON facts arrive via the
# Mongo connector, src/data_processor.py:322-338; the engine exposes JSON
# scalar functions).
# --------------------------------------------------------------------------
@register(
    "q18_json_extract",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
       COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# q19 — daily event rollup (A2: per-day aggregation,
# src/data_processor.py:467-484, on the events stream table).
# --------------------------------------------------------------------------
@register(
    "q19_events_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS event_date,
       event_type,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
)
def q19_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.to_date("ts").alias("event_date"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum(_dec("value"), "value_sum"),
        )
    )


# --------------------------------------------------------------------------
# q20 — HAVING + conditional aggregation (A3 cancelled-items counter
# shape, src/data_processor.py:47,439).
# --------------------------------------------------------------------------
@register(
    "q20_having_conditional",
    oracle="""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 5
""",
)
def q20_having_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big"),
        )
        .filter(F.col("n_orders") >= 5)
    )


# --------------------------------------------------------------------------
# q21 — scalar subquery / global aggregate reuse (orders above the global
# mean price). Spark side: broadcast a 1-row aggregate — no driver
# collect(), unlike the reference's everything-on-driver style.
# --------------------------------------------------------------------------
@register(
    "q21_above_avg_orders",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(*) FROM orders)
""",
)
def q21_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    avg_df = o.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_price")
    )
    return (
        o.join(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# q22 — first-event-per-key via window (A2's "date of first transaction",
# src/data_processor.py:478-479, done relationally instead of collect()).
# --------------------------------------------------------------------------
@register(
    "q22_first_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey AS first_orderkey,
       CAST(o_orderdate AS DATE) AS first_order_date, o_orderpriority
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders) t
WHERE rn = 1
""",
)
def q22_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.to_date("o_orderdate").alias("first_order_date"),
            "o_orderpriority",
        )
    )


# --------------------------------------------------------------------------
# q23 — the candy flagship reshaped onto the star schema: per-order totals
# (A1) rolled into a per-day business summary (A2) — the reference's
# daily_summary built with two hash aggregations instead of a driver loop
# (src/data_processor.py:389-484).
# --------------------------------------------------------------------------
@register(
    "q23_daily_summary",
    oracle="""
WITH order_totals AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS business_date,
         SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS order_total
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)
SELECT business_date,
       COUNT(*) AS num_orders,
       CAST(SUM(order_total) AS DOUBLE) AS total_sales
FROM order_totals
GROUP BY business_date
""",
)
def q23_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    order_totals = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("business_date"))
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE))
            ).alias("order_total")
        )
    )
    return order_totals.groupBy("business_date").agg(
        F.count(F.lit(1)).alias("num_orders"),
        F.sum("order_total").cast("double").alias("total_sales"),
    )


# --------------------------------------------------------------------------
# q24 — analytic window functions: lag/lead/ntile/first_value with an
# explicit frame (beyond W2's running sum).
# --------------------------------------------------------------------------
@register(
    "q24_window_lag_ntile",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(date_diff('day',
            CAST(lag(o_orderdate) OVER w AS DATE),
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
       lead(o_orderkey) OVER w AS next_orderkey,
       CAST(ntile(4) OVER w AS INTEGER) AS order_quartile,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q24_window_lag_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        ).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.ntile(4).over(w).alias("order_quartile"),
        F.first("o_orderkey").over(wf).alias("first_orderkey"),
    )


# --------------------------------------------------------------------------
# q25 — statistical aggregates with engine-order-independent exactness:
# stddev/variance via decimal power sums (the numerator is exact integer
# arithmetic; only the final division/sqrt run in IEEE doubles).
# --------------------------------------------------------------------------
@register(
    "q25_stats_agg",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS sx2,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, min_price, max_price,
       CAST(sx AS DOUBLE) / n AS avg_price,
       sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
         AS stddev_price
FROM s
""",
)
def q25_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = _dec("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("sx"),
        F.sum(dec * dec).alias("sx2"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    return s.select(
        "l_returnflag",
        "n",
        "min_price",
        "max_price",
        (F.col("sx").cast("double") / F.col("n")).alias("avg_price"),
        F.sqrt(
            (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("stddev_price"),
    )


# --------------------------------------------------------------------------
# q26 — pivot (wide aggregation; Spark .pivot ≡ SQL conditional agg).
# --------------------------------------------------------------------------
@register(
    "q26_pivot_status",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
""",
)
def q26_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["F", "O", "P"])
    )


# --------------------------------------------------------------------------
# q27 — array functions over tokenized text (F7 surface beyond explode).
# --------------------------------------------------------------------------
@register(
    "q27_array_funcs",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_toks,
       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
       CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END AS has_spark,
       list_sort(list_distinct(toks))[1] AS first_token,
       array_to_string(list_sort(list_distinct(toks)), '|') AS vocab
FROM t
""",
)
def q27_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    vocab = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.element_at(vocab, 1).alias("first_token"),
        F.array_join(vocab, "|").alias("vocab"),
    )


# --------------------------------------------------------------------------
# q28 — GROUPING SETS (the general grouping-set surface; rollup/cube are
# q14/q15). Spark side goes through SQL — the DataFrame API exposes only
# rollup/cube, SQL exposes the full clause.
# --------------------------------------------------------------------------
@register(
    "q28_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------------
# q29 — exact percentiles (linear interpolation agrees bit-for-bit across
# engines on identical input sets) + money display formatting: Spark's
# format_number vs an integer-cents reconstruction (DuckDB cannot
# thousands-format floats directly).
# --------------------------------------------------------------------------
@register(
    "q29_percentile_format",
    oracle="""
WITH s AS (
  SELECT o_orderstatus,
         quantile_cont(o_totalprice, 0.5) AS p50,
         quantile_cont(o_totalprice, 0.9) AS p90,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, p50, p90,
       format('{:,}', cents // 100) || '.' ||
         lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS total_fmt
FROM s
""",
)
def q29_percentile_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.format_number(F.sum(_dec("o_totalprice")), 2).alias("total_fmt"),
    )


# --------------------------------------------------------------------------
# q46 — unpivot / melt (stack): wide per-status counts back to long form.
# The forecast operator uses the same stack() to melt daily_summary.
# --------------------------------------------------------------------------
@register(
    "q46_unpivot",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f_cnt,
         SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o_cnt,
         SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p_cnt
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, status, CAST(cnt AS BIGINT) AS cnt FROM (
  SELECT o_orderpriority, 'F' AS status, f_cnt AS cnt FROM wide
  UNION ALL SELECT o_orderpriority, 'O', o_cnt FROM wide
  UNION ALL SELECT o_orderpriority, 'P', p_cnt FROM wide
)
""",
)
def q46_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("f_cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("o_cnt"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("p_cnt"),
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'F', f_cnt, 'O', o_cnt, 'P', p_cnt) AS (status, cnt)"
        ),
    )


# --------------------------------------------------------------------------
# q70-q72 — correlated subqueries (Catalyst decorrelates these to
# joins/windows; SURVEY §4.3 "join reordering / subquery decorrelation").
# Expressed through spark.sql so the decorrelation rewrite itself is
# exercised, not hand-rewritten.
# --------------------------------------------------------------------------
def _view(spark: SparkSession, sf_dir: str, table: str, name: str) -> None:
    load(spark, sf_dir, table).createOrReplaceTempView(name)


@register(
    "q70_max_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
""",
)
def q70_max_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders", "orders_cs")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders_cs o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders_cs o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "q71_above_nation_avg",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def q71_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "customer_cs")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer_cs c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer_cs c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "q72_rich_inactive_customers",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
)
def q72_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer", "customer_cs2")
    _view(spark, sf_dir, "orders", "orders_cs2")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer_cs2 c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_cs2 WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_cs2 o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
        """
    )


# --------------------------------------------------------------------------
# q73 — data-quality audit: per-column null/blank/min/max profile (the
# pipeline-audit op every large ingest runs before training).
# --------------------------------------------------------------------------
@register(
    "q73_data_quality_audit",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
       CAST(SUM(CASE WHEN event_type = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_type,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS distinct_types,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS negative_values,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(min(ts) AS DATE) AS first_day,
       CAST(max(ts) AS DATE) AS last_day
FROM events
""",
)
def q73_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("null_props"),
        F.sum(F.when(F.col("event_type") == "", 1).otherwise(0)).alias("blank_type"),
        F.countDistinct("event_type").alias("distinct_types"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("negative_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.to_date(F.min("ts")).alias("first_day"),
        F.to_date(F.max("ts")).alias("last_day"),
    )


# --------------------------------------------------------------------------
# q74-q76 — TPC-H Q3/Q10/Q12 shapes on the available star schema.
# --------------------------------------------------------------------------
@register(
    "q74_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS order_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q74_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE)),
                "revenue",
            )
        )
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q75_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
HAVING COUNT(*) >= 5
""",
)
def q75_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _dsum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE)),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 5)
    )


@register(
    "q76_priority_bands_by_year",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
GROUP BY 1
""",
)
def q76_priority_bands_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
    )


# --------------------------------------------------------------------------
# q146 — market share (TPC-H Q8 shape): the deepest join tree in the
# catalog — 7 relations (part, lineitem, supplier, orders, customer,
# nation x2 roles, region). Scale: Catalyst broadcast-joins every
# dimension (part/supplier/customer/nation/region are all tiny vs
# lineitem), so the only shuffle is the orders<->lineitem fact join plus
# the 7-group final agg; the nation table enters TWICE under different
# roles (customer's nation for the region filter, supplier's nation for
# the share test) — the multi-role dimension pattern. Volumes are exact
# scale-4 integer units (the decimal product's full scale — the BIGINT
# cast truncates nothing, unlike a cents cast which straddles engines'
# decimal->int rounding), and the ppm share divides staged (both sides
# pre-shrunk by 1000) to stay inside int64 with ~100x headroom.
@register(
    "q146_market_share",
    oracle="""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         CAST(SUM(CASE WHEN n2.n_name = (SELECT n_name FROM nation
                                         WHERE n_nationkey = 0)
                  THEN CAST(l.l_extendedprice AS DECIMAL(15,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                  ELSE CAST(0 AS DECIMAL(15,2)) END) * 10000 AS BIGINT)
           AS nation_u,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) * 10000
              AS BIGINT) AS total_u
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'MEDIUM'
  GROUP BY o_year
)
SELECT o_year, nation_u, total_u,
       CAST((nation_u // 1000) * 1000000 // NULLIF(total_u // 1000, 0)
            AS BIGINT) AS share_ppm
FROM vol
""",
    doc="TPC-H Q8 market-share shape: nation-0 suppliers' revenue share "
    "of MEDIUM-type parts sold into ASIA, by order year. The deepest "
    "join tree in the catalog (7 relations, nation joined twice under "
    "different roles); every dimension broadcasts, so the single "
    "shuffle is the fact join + year-keyed agg. Integer-ppm share over "
    "exact scale-4 volume units (see header comment for the rounding "
    "and overflow discipline).",
)
def q146_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "MEDIUM")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    target = (
        n.where(F.col("n_nationkey") == 0)
        .select(F.col("n_name").alias("_target"))
    )
    vol = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n.alias("n1")),
            F.col("c_nationkey") == F.col("n1.n_nationkey"),
        )
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r["r_regionkey"])
        .join(
            F.broadcast(n.alias("n2")),
            F.col("s_nationkey") == F.col("n2.n_nationkey"),
        )
        .crossJoin(F.broadcast(target))
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE))
    agg = vol.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (
            F.sum(
                F.when(F.col("n2.n_name") == F.col("_target"), volume).otherwise(
                    F.lit(0).cast("decimal(15,2)")
                )
            )
            * 10000
        )
        .cast("long")
        .alias("nation_u"),
        (F.sum(volume) * 10000).cast("long").alias("total_u"),
    )
    return agg.select(
        "o_year",
        "nation_u",
        "total_u",
        F.expr(
            "(nation_u div 1000) * 1000000 div NULLIF(total_u div 1000, 0)"
        )
        .cast("long")
        .alias("share_ppm"),
    )


# --------------------------------------------------------------------------
# q147 — small-quantity revenue (TPC-H Q17 shape): the correlated-
# aggregate-subquery pattern. Catalyst rewrites the correlated
# "l_quantity < 0.2 * avg(per part)" into a per-part aggregate joined
# back to the fact — the avg side is part-cardinality (broadcastable),
# so the threshold test costs one broadcast join, not a per-row
# subquery execution. Threshold in exact integer: qty*10 < 2*sum/cnt
# avoids the 0.2 float entirely (both sides integer under the
# whole-number l_quantity domain).
@register(
    "q147_small_qty_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2)) * 10) AS BIGINT)
           AS qty10_sum,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))) * 100 AS BIGINT)
         AS revenue_cents,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))) * 100
            AS BIGINT) // 7 AS BIGINT) AS yearly_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND CAST(CAST(l.l_quantity AS DECIMAL(15,2)) * 10 AS BIGINT) * pa.cnt * 10
      < 2 * pa.qty10_sum
""",
    doc="TPC-H Q17 shape: revenue from quantities below 20% of the "
    "part's average — the correlated-aggregate threshold every 'flag "
    "anomalously small orders' report uses. The per-part average is "
    "ONE part-keyed aggregate broadcast back onto the fact (the "
    "decorrelated plan); the 0.2 factor is exact integer arithmetic "
    "(qty*10*cnt*10 < 2*sum(qty*10)), no float thresholds. Single "
    "fact scan + one broadcast join + a global count/sum.",
)
def q147_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    pa = l.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity") * 10)).cast("long").alias("qty10_sum"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(pa), "l_partkey")
        .where(
            (_dec("l_quantity") * 10).cast("long") * F.col("cnt") * 10
            < 2 * F.col("qty10_sum")
        )
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small"),
        (F.sum(_dec("l_extendedprice")) * 100).cast("long").alias(
            "revenue_cents"
        ),
        F.expr(
            "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,2))) * 100"
            " AS BIGINT) div 7 AS BIGINT)"
        ).alias("yearly_cents"),
    )


_Q156_SQL = """
WITH ranked AS (
  SELECT c.c_nationkey, o.o_custkey, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
             ORDER BY CAST(o.o_totalprice AS DECIMAL(15,2)) DESC,
                      o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
SELECT c_nationkey, o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= 3
"""


@register(
    "q156_sql_surface",
    oracle=_Q156_SQL,
    doc="The raw-SQL entry path: top-3 orders per nation executed via "
    "spark.sql() over registered temp views — the SAME SQL text both "
    "engines run (the oracle IS the Spark query), proving a user can "
    "drive this engine through ANSI SQL and get hash-identical results "
    "to the DataFrame API. Catalyst plans the text identically to the "
    "equivalent DataFrame chain: nation-partitioned rank (never a "
    "global sort), customer dim broadcast. DECIMAL ordering key with "
    "an orderkey tiebreak keeps the top-3 deterministic.",
)
def q156_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_Q156_SQL)


# --------------------------------------------------------------------------
# q157 — disjunctive predicate revenue (TPC-H Q19 shape): an OR of three
# conjunctive (brand, size-range, qty-range) clauses across the join.
# The Catalyst behavior under test: the OR-of-ANDs SPLITS — the
# lineitem-only qty disjunction and the part-only brand/size disjunction
# each push to their own scan (PushedFilters shows the per-side OR),
# while the cross-table residual evaluates post-join. A naive engine
# evaluates the whole disjunction post-join and scans both tables fully.
@register(
    "q157_disjunctive_revenue",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) * 10000
            AS BIGINT) AS revenue_u
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 shape: revenue under an OR of three conjunctive "
    "(brand, size, quantity) clauses spanning the join. Catalyst "
    "factors the disjunction per side — the quantity-only OR pushes to "
    "the lineitem scan and the brand/size OR to the part scan "
    "(plan-locked) — so both scans prune before the join instead of "
    "evaluating the whole predicate post-join. Exact scale-4 integer "
    "revenue units.",
)
def q157_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(cond).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        (
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
            )
            * 10000
        )
        .cast("long")
        .alias("revenue_u"),
    )


# --------------------------------------------------------------------------
# q158 — sole-supplier orders (TPC-H Q21 family, adapted to this schema:
# no commit/receipt dates): for each supplier, how many multi-line
# orders they serve ALONE. The semi+anti composition: EXISTS another
# lineitem on the same order (multi-line) AND NOT EXISTS a lineitem
# from a different supplier. Both subqueries decorrelate to order-level
# aggregates — never per-row subquery execution.
@register(
    "q158_sole_supplier_orders",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(*) AS n_lines,
         MIN(l_suppkey) AS smin,
         MAX(l_suppkey) AS smax
  FROM lineitem GROUP BY l_orderkey
),
sole AS (
  SELECT l_orderkey, smin AS l_suppkey, n_lines
  FROM per_order WHERE n_lines > 1 AND smin = smax
)
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_sole_orders,
       CAST(SUM(sole.n_lines) AS BIGINT) AS n_lines
FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
GROUP BY s.s_name
""",
    doc="TPC-H Q21 family (sole-supplier orders): multi-line orders "
    "served by exactly one supplier, counted per supplier. The "
    "EXISTS/NOT-EXISTS pair decorrelates to ONE order-keyed aggregate "
    "(count + min/max supplier; min=max tests single-supplier without "
    "a distinct count), then a broadcast join to supplier names — one "
    "fact shuffle total, no correlated execution.",
)
def q158_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    per = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    sole = per.where(
        (F.col("n_lines") > 1) & (F.col("smin") == F.col("smax"))
    ).select(F.col("smin").alias("s_suppkey"), "n_lines")
    return (
        sole.join(F.broadcast(s.select("s_suppkey", "s_name")), "s_suppkey")
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sole_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q159 — supplier diversity per part class (TPC-H Q16 shape): distinct
# suppliers per (brand, size band) excluding a blacklist, via anti-join
# + countDistinct. The anti side is a tiny broadcast; the distinct
# aggregation is the one shuffle.
@register(
    "q159_supplier_diversity",
    oracle="""
WITH bad AS (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
SELECT p.p_brand, CAST(p.p_size // 10 AS BIGINT) AS size_band,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY p.p_brand, size_band
""",
    doc="TPC-H Q16 shape: how many DISTINCT suppliers serve each "
    "(brand, size-band) part class, excluding blacklisted suppliers "
    "(negative balance) — the supplier-diversity / single-source-risk "
    "report. The NOT IN decorrelates to a broadcast anti-join (the "
    "blacklist is dimension-sized); countDistinct plans as the "
    "standard two-phase expand-aggregate on the group key.",
)
def q159_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    bad = load(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        l.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", F.expr("p_size div 10").cast("long").alias("size_band"))
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "q164_incremental_rollup",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) * 100 AS BIGINT)
         AS revenue_cents
FROM orders
GROUP BY 1, 2
""",
    doc="Incremental materialized-rollup maintenance: the per-(month, "
    "status) order rollup is maintained by MERGING PARTIAL AGGREGATES "
    "— the historical base (orders before 1997-01-01) is aggregated "
    "once into (count, sum) partials, the delta batch is aggregated "
    "separately, and the published rollup is a re-aggregation of the "
    "two partial sets (count+count, sum+sum). The oracle recomputes "
    "from scratch over the full table; hash-equality proves the merge "
    "of partials is exact, which is the property that lets a 100 TB "
    "deployment refresh a daily rollup by scanning ONLY the new "
    "partition instead of the whole fact. Sums are decimal-routed so "
    "the split accumulation order cannot drift from the oracle's.",
)
def q164_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderstatus",
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).alias("rev"),
        )

    base = partial(o.where(F.col("o_orderdate") < cutoff))
    delta = partial(o.where(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("month", "o_orderstatus")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            (F.sum("rev") * 100).cast("long").alias("revenue_cents"),
        )
    )


@register(
    "q165_robust_outliers",
    oracle="""
WITH c AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
med AS (
  SELECT o_orderpriority,
         CAST(2 * MEDIAN(cents) AS BIGINT) AS med2
  FROM c GROUP BY o_orderpriority
),
dev AS (
  SELECT c.o_orderpriority, c.cents, m.med2,
         ABS(2 * c.cents - m.med2) AS dev
  FROM c JOIN med m USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority,
         CAST(2 * MEDIAN(dev) AS BIGINT) AS mad4
  FROM dev GROUP BY o_orderpriority
)
SELECT d.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(d.med2) AS med2_cents,
       MAX(a.mad4) AS mad4_cents,
       CAST(SUM(CASE WHEN 2 * d.dev > 3 * a.mad4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad a USING (o_orderpriority)
GROUP BY d.o_orderpriority
""",
    doc="Robust (median/MAD) outlier gate per priority class — the "
    "heavy-tail-safe alternative to q85's mean/stddev z-score for "
    "flagging anomalous order values. All thresholds are exact "
    "integers: prices become cents, medians are doubled before the "
    "BIGINT cast (an even-count median is (a+b)/2, so 2*median of "
    "integers is integral — no float threshold can drift between "
    "engines), and the 3-MAD test is 2*dev > 3*mad4. Plan: two "
    "priority-keyed exact-percentile aggregates (5 groups — tiny "
    "state) with the per-group constants broadcast back onto the "
    "fact; no window over the fact, no sort.",
)
def q165_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # c feeds the median agg AND the dev relation; dev feeds the MAD
    # agg AND the final gate — two lazy checkpoints make this ONE
    # orders scan + one dev materialization instead of four fact scans
    # (the q103/q137 shared-leaf discipline)
    c = o.select(
        "o_orderpriority",
        (_dec("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    med = c.groupBy("o_orderpriority").agg(
        (2 * F.expr("percentile(cents, 0.5)")).cast("long").alias("med2")
    )
    dev = c.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "cents",
        "med2",
        F.abs(2 * F.col("cents") - F.col("med2")).alias("dev"),
    ).localCheckpoint(eager=False)
    mad = dev.groupBy("o_orderpriority").agg(
        (2 * F.expr("percentile(dev, 0.5)")).cast("long").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("med2").alias("med2_cents"),
            F.max("mad4").alias("mad4_cents"),
            F.sum(
                (2 * F.col("dev") > 3 * F.col("mad4")).cast("long")
            ).cast("long").alias("n_outliers"),
        )
    )


@register(
    "q167_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY n_orders
""",
    doc="TPC-H Q13 shape: the distribution of customers by how many "
    "(non-urgent) orders they placed — the agg-of-agg double "
    "aggregation, with the LEFT join keeping zero-order customers in "
    "the n_orders=0 bucket (the row an inner join silently drops; "
    "same trap as J2). The join filter sits on the ORDERS side of the "
    "left join, not in WHERE (where it would turn the join inner). "
    "Plan: one custkey-keyed shuffle join + per-customer count, then "
    "a second tiny aggregation over the count domain (dozens of "
    "distinct values) — the second shuffle moves customer-count rows, "
    "not facts.",
)
def q167_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )


# --------------------------------------------------------------------------
# q192 — semi-structured VARIANT shredding (extends the q18 JSON-scalar
# family, src/mongo_connect.py document payloads: SURVEY §2 JSON fns).
# Spark 4's VARIANT type parses the JSON ONCE into a binary encoding;
# every subsequent typed access (`try_variant_get`) is a cheap path walk
# instead of a re-parse, and unparseable rows surface as NULL variants
# rather than killing the job — the right ingestion posture for 100 TB
# of crawl metadata where get_json_object would re-tokenize the string
# per extraction.
# --------------------------------------------------------------------------
@register(
    "q192_variant_extract",
    oracle="""
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) // 10 AS INTEGER)
         AS k_decade,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY 1, 2
""",
    doc="VARIANT-typed semi-structured access: `try_parse_json(props)` once "
    "into Spark 4's binary VARIANT encoding, then a typed "
    "`try_variant_get(..., 'int')` path walk feeds the (event_type, "
    "k-decade) rollup — malformed documents would become NULL variants "
    "(try_ semantics), not job failures. The oracle re-derives the "
    "same rollup from the raw JSON text; `tests/test_variant.py` locks "
    "the parquet round-trip of the VARIANT column and the "
    "null-on-malformed contract.",
)
def q192_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy(
            "event_type",
            F.expr("k div 10").cast("int").alias("k_decade"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )
