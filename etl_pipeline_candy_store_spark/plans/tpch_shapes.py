"""The remaining canonical TPC-H join shapes (SURVEY §2 widening,
round 6): Q2, Q4, Q5, Q6, Q7, Q9, Q10, Q11, Q12, Q14, Q15, Q18, Q20,
Q22 analogues on the available star schema — with these, every one of
the 22 canonical TPC-H query shapes has a catalog entry (Q1 q01,
Q3 q74, Q8 q146, Q13 q167, Q16 q159, Q17 q147, Q19 q157, Q21 q158
live in plans/relational.py) — the query shapes a user migrating from
the reference's relational surface (src/data_processor.py aggregation
pipeline) reaches for first.

Schema adaptations (testdata lacks partsupp, l_shipmode,
l_commitdate/l_receiptdate, c_phone):
- Q2's partsupp min-cost offer → min historical shipped unit price;
- Q4's late-commit EXISTS → shipped >90 days after order;
- Q11's stock value → shipped value per part through one nation;
- Q9's ps_supplycost → a deterministic 60% - of - retail cost model on
  ``part`` (exact decimal math, so both engines agree bit-for-bit);
- Q12's shipmode bands → shipping-delay bands derived from
  datediff(l_shipdate, o_orderdate) (same two-band CASE aggregation);
- Q20's partsupp availability chain → shipped-quantity share per
  (supplier, part) against the part's total (same semi-join chain);
- Q22's phone country code → c_nationkey (same anti-join + global
  average-threshold shape with exact integer cross-multiplication).

Money discipline matches plans/relational.py: DECIMAL throughout the
aggregation, surfaced as double (exact sums → order-independent) or as
scaled BIGINT units where a ratio is involved (integer division only).
Every dimension join is broadcast; every aggregate is partial-
aggregatable; date predicates sit directly on the scan so parquet
row-group pruning sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load, register
from etl_pipeline_candy_store_spark.plans.relational import (
    _RATE,
    _dec,
    _dsum,
)

_REV = "CAST(l_extendedprice AS DECIMAL(15,2)) * (1 - CAST(l_discount AS DECIMAL(5,2)))"


def _rev():
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", _RATE))


# --------------------------------------------------------------------------
# q173 — TPC-H Q5: regional join cycle. The distinguishing feature is the
# CYCLE customer→orders→lineitem→supplier→nation←customer: supplier and
# customer must share a nation, so the nation key reaches the fact join
# from two directions. All dimensions broadcast; the only shuffles are
# the two fact-fact joins (orders⋈lineitem on orderkey) and the final
# nation-keyed agg.
# --------------------------------------------------------------------------
@register(
    "q173_regional_revenue_cycle",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5 shape: local-supplier revenue by nation within one "
    "region and order year. The join graph is a cycle (customer and "
    "supplier constrained to the same nation), which Catalyst plans as "
    "an extra equality on the already-joined fact row — no extra "
    "shuffle beyond the orderkey join.",
)
def q173_regional_revenue_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(_dsum(_rev(), "revenue"))
    )


# --------------------------------------------------------------------------
# q174 — TPC-H Q7: two-nation trade volume, both directions, by ship
# year. The nation pair predicate is a disjunction over two broadcast
# nation roles.
# --------------------------------------------------------------------------
@register(
    "q174_nation_trade_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 shape: shipped revenue between two named nations in "
    "both directions, by ship year. nation joins twice under supplier "
    "and customer roles (both broadcast); the pair disjunction is a "
    "post-join filter Catalyst can't push below either role alone.",
)
def q174_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    df = (
        s.join(l, s["s_suppkey"] == l["l_suppkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(
            F.broadcast(n.alias("n1")),
            F.col("s_nationkey") == F.col("n1.n_nationkey"),
        )
        .join(
            F.broadcast(n.alias("n2")),
            F.col("c_nationkey") == F.col("n2.n_nationkey"),
        )
        .where(
            (
                (F.col("n1.n_name") == "NATION_1")
                & (F.col("n2.n_name") == "NATION_2")
            )
            | (
                (F.col("n1.n_name") == "NATION_2")
                & (F.col("n2.n_name") == "NATION_1")
            )
        )
    )
    return df.groupBy(
        F.col("n1.n_name").alias("supp_nation"),
        F.col("n2.n_name").alias("cust_nation"),
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(_dsum(_rev(), "revenue"))


# --------------------------------------------------------------------------
# q175 — TPC-H Q9: profit by nation and year for a part-name family.
# The schema has no partsupp, so supply cost is modeled as an exact
# 60%-of-retail decimal (0.60, scale 2): profit stays pure decimal
# arithmetic — product scales add, no rounding — so both engines agree
# regardless of accumulation order.
# --------------------------------------------------------------------------
@register(
    "q175_profit_by_nation_year",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM({_REV}
            - CAST(p.p_retailprice AS DECIMAL(15,2)) * CAST(0.60 AS DECIMAL(5,2))
              * CAST(l.l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape: profit (revenue minus modeled supply cost) by "
    "supplier nation and order year for the 'widget' part family. The "
    "LIKE filter prunes part BEFORE its broadcast, so the fact join "
    "fans in only matching parts.",
)
def q175_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    cost = (
        _dec("p_retailprice")
        * F.lit("0.60").cast(_RATE)
        * _dec("l_quantity")
    )
    return (
        l.join(F.broadcast(p), p["p_partkey"] == l["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(_dsum(_rev() - cost, "profit"))
    )


# --------------------------------------------------------------------------
# q176 — TPC-H Q10: returned-revenue customer ranking in one quarter.
# Distinct from q75 (all-time + HAVING): the canonical shape is a date
# window and a global top-20 — TakeOrderedAndProject, never a full sort.
# --------------------------------------------------------------------------
@register(
    "q176_returns_ranking",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: top 20 customers by revenue they returned in "
    "one quarter. The limit plans as TakeOrderedAndProject (per-"
    "partition top-k merged on the driver), not a global sort.",
)
def q176_returns_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q177 — TPC-H Q12: two-band CASE aggregation over the orders⋈lineitem
# join. The schema has no l_shipmode/l_commitdate, so the band is the
# shipping DELAY (days between order and ship date) — same shape: a
# derived low-cardinality band column, high/low priority line counts.
# --------------------------------------------------------------------------
@register(
    "q177_ship_delay_bands",
    oracle="""
SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE)) > 60
            THEN 'LATE' ELSE 'ONTIME' END AS ship_band,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
""",
    doc="TPC-H Q12 shape (shipmode → ship-delay bands): count urgent vs "
    "other order lines per delay band for one ship year. One fact-fact "
    "join on orderkey, then a 2-group partial-aggregatable rollup.",
)
def q177_ship_delay_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = F.when(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 60,
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(band.alias("ship_band"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q178 — TPC-H Q14: promo revenue share for one month, as integer ppm
# over exact scale-4 units (the q146 rounding discipline: a double
# division would tie both engines' float rounding together).
# --------------------------------------------------------------------------
@register(
    "q178_promo_share",
    oracle=f"""
WITH v AS (
  SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV}
               ELSE CAST(0 AS DECIMAL(15,2)) END) * 10000 AS BIGINT) AS promo_u,
         CAST(SUM({_REV}) * 10000 AS BIGINT) AS total_u
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
    AND l.l_shipdate <  TIMESTAMP '1996-10-01'
)
SELECT promo_u, total_u,
       CAST((promo_u // 1000) * 1000000 // NULLIF(total_u // 1000, 0)
            AS BIGINT) AS promo_ppm
FROM v
""",
    doc="TPC-H Q14 shape: PROMO-type revenue share of one ship month. "
    "part broadcasts into the pruned lineitem scan; the share is "
    "integer ppm over exact decimal micro-units.",
)
def q178_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    v = (
        l.join(F.broadcast(p), p["p_partkey"] == l["l_partkey"])
        .agg(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
                        F.lit(0).cast("decimal(15,2)")
                    )
                )
                * 10000
            )
            .cast("long")
            .alias("promo_u"),
            (F.sum(_rev()) * 10000).cast("long").alias("total_u"),
        )
    )
    return v.select(
        "promo_u",
        "total_u",
        F.expr("(promo_u div 1000) * 1000000 div NULLIF(total_u div 1000, 0)")
        .cast("long")
        .alias("promo_ppm"),
    )


# --------------------------------------------------------------------------
# q179 — TPC-H Q15: the top supplier by revenue in one quarter — the
# view + scalar-max-subquery shape. The revenue relation is supplier-
# cardinality, so its max broadcasts as a one-row join; ties all
# surface (canonical Q15 semantics), deterministic because revenue is
# an exact integer (cents).
# --------------------------------------------------------------------------
@register(
    "q179_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM({_REV}) * 10000 AS BIGINT) AS total_u
  FROM lineitem l
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_u
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_u = (SELECT MAX(total_u) FROM rev)
""",
    doc="TPC-H Q15 shape: supplier(s) with the maximum quarterly "
    "revenue (exact scale-4 integer units — the discounted revenue "
    "has scale 4, so x10000 leaves nothing for the engines' different "
    "decimal->int rounding to disagree on). The max is a one-row "
    "broadcast joined back to the supplier-cardinality revenue view — "
    "two passes over the pruned scan, never a whole-relation window.",
)
def q179_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy("l_suppkey").agg(
        (F.sum(_rev()) * 10000).cast("long").alias("total_u")
    )
    mx = rev.agg(F.max("total_u").alias("_mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .join(F.broadcast(mx), F.col("total_u") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_u")
    )


# --------------------------------------------------------------------------
# q180 — TPC-H Q18: large-order semi-aggregation. The HAVING aggregate
# keys the fact to itself: only orders whose line quantities sum past
# the threshold survive, then rank by order value.
# --------------------------------------------------------------------------
@register(
    "q180_large_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS BIGINT) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(15,2))) > 120
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date,
       CAST(CAST(o.o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS total_price,
       b.sum_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
""",
    doc="TPC-H Q18 shape: the 20 most valuable orders whose total line "
    "quantity exceeds the threshold. The quantity rollup shuffles on "
    "orderkey (same key as the orders join, so AQE can reuse the "
    "exchange); customer broadcasts; the limit is TakeOrderedAndProject.",
)
def q180_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .where(F.col("_sq") > 120)
        .select("l_orderkey", F.col("_sq").cast("long").alias("sum_qty"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            _dec("o_totalprice").cast("double").alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.col("total_price").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q181 — TPC-H Q20: the nested-EXISTS semi-join chain. Without
# partsupp, the availability test becomes a shipped-share test:
# suppliers who shipped MORE THAN HALF of some 'bolt'-family part's
# total shipped quantity in the window. Two aggregates over the same
# pruned scan, a broadcast part filter, then a semi-join into supplier.
# --------------------------------------------------------------------------
@register(
    "q181_dominant_part_suppliers",
    oracle="""
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS BIGINT) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS part_qty
  FROM sq GROUP BY 1
),
dom AS (
  SELECT DISTINCT sq.l_suppkey
  FROM sq
  JOIN tot  ON tot.l_partkey = sq.l_partkey
  JOIN part p ON p.p_partkey = sq.l_partkey
  WHERE p.p_name LIKE '%bolt%'
    AND sq.supp_qty * 2 > tot.part_qty
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN dom ON dom.l_suppkey = s.s_suppkey
""",
    doc="TPC-H Q20 shape: suppliers dominating (>half of) the shipped "
    "volume of some 'bolt'-family part in one year — a semi-join chain "
    "(per-(part,supplier) agg → per-part agg → part-name filter → "
    "DISTINCT supplier keys → left-semi into supplier). Exact integer "
    "quantities, integer cross-multiplication for the half test.",
)
def q181_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    sq = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).cast("long").alias("supp_qty")
    )
    tot = sq.groupBy("l_partkey").agg(
        F.sum("supp_qty").cast("long").alias("part_qty")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    dom = (
        sq.join(tot, "l_partkey")
        .join(F.broadcast(p), p["p_partkey"] == sq["l_partkey"])
        .where(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    return s.join(
        dom, s["s_suppkey"] == dom["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


# --------------------------------------------------------------------------
# q182 — TPC-H Q22: anti-join + global-average threshold. The phone
# country code becomes c_nationkey. The average test is exact integer
# cross-multiplication (bal_cents * n > sum_cents ⟺ bal > avg), so no
# engine ever divides — the one place Q22 usually drifts between
# engines is the float average, eliminated here.
# --------------------------------------------------------------------------
@register(
    "q182_idle_rich_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2)) * 100) AS BIGINT) AS sum_cents,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey AS cust_code,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(15,2)) * 100) AS BIGINT)
         AS total_acctbal_cents
FROM customer c, pos
WHERE CAST(CAST(c.c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) * pos.n
      > pos.sum_cents
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
""",
    doc="TPC-H Q22 shape: richer-than-average customers with no RECENT "
    "orders (none since 2000 — every testdata customer has some order, "
    "so the canonical never-ordered form would be vacuously empty), "
    "grouped by country code (c_nationkey here). The global average is "
    "a one-row broadcast; the lapsed test is a left-anti join on "
    "custkey against the date-pruned orders scan; the threshold is "
    "exact integer cross-multiplication, no division anywhere.",
)
def q182_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cents = (_dec("c_acctbal") * 100).cast("long")
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal") * 100).cast("long").alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(pos))
        .where(cents * F.col("n") > F.col("sum_cents"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cust_code"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(cents).alias("total_acctbal_cents"),
        )
    )


# --------------------------------------------------------------------------
# q183 — TPC-H Q2: the correlated-min subquery. Without partsupp, the
# supplier-part cost relation is derived from shipping history: a
# supplier's offer price for a part is the MIN unit price they ever
# shipped it at; the query keeps, per part of one size class, the
# supplier(s) matching the part's global minimum offer. Exact integer
# cents, no division (unit price = extendedprice/quantity is avoided by
# comparing extendedprice * other_qty cross-products? No — unit cents
# are exact because extendedprice = qty * unit price in the generator;
# min() needs no arithmetic at all).
# --------------------------------------------------------------------------
@register(
    "q183_min_cost_supplier",
    oracle="""
WITH offer AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(MIN(CAST(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)
                  // CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS unit_cents
  FROM lineitem l
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, MIN(unit_cents) AS best_cents
  FROM offer GROUP BY 1
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, o.unit_cents
FROM part p
JOIN offer o ON o.l_partkey = p.p_partkey
JOIN best b  ON b.l_partkey = p.p_partkey AND o.unit_cents = b.best_cents
JOIN supplier s ON s.s_suppkey = o.l_suppkey
WHERE p.p_size = 10
""",
    doc="TPC-H Q2 shape: per part of one size class, the supplier(s) "
    "offering the global-minimum unit price (offer = min historical "
    "shipped unit price, exact integer cents — generator prices are "
    "whole multiples of quantity). The correlated MIN becomes a "
    "per-part aggregate joined back, the canonical decorrelation; "
    "part and supplier broadcast.",
)
def q183_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    unit_cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    offer = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cents).alias("unit_cents")
    )
    best = offer.groupBy("l_partkey").agg(
        F.min("unit_cents").alias("best_cents")
    )
    p = load(spark, sf_dir, "part").where(F.col("p_size") == 10)
    s = load(spark, sf_dir, "supplier")
    return (
        offer.join(best, "l_partkey")
        .where(F.col("unit_cents") == F.col("best_cents"))
        .join(F.broadcast(p), p["p_partkey"] == offer["l_partkey"])
        .join(F.broadcast(s), s["s_suppkey"] == offer["l_suppkey"])
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cents")
    )


# --------------------------------------------------------------------------
# q184 — TPC-H Q4: EXISTS semi-join — orders (by priority) having at
# least one slow line. No l_commitdate, so "slow" is shipped >90 days
# after the order date.
# --------------------------------------------------------------------------
@register(
    "q184_priority_order_check",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND date_diff('day', CAST(o.o_orderdate AS DATE),
                    CAST(l.l_shipdate AS DATE)) > 90
  )
GROUP BY 1
""",
    doc="TPC-H Q4 shape: per-priority count of one quarter's orders "
    "with at least one slow-shipping line (>90 days after order). The "
    "EXISTS plans as a left-semi join on orderkey — each order counted "
    "once however many lines are slow.",
)
def q184_priority_order_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"])
        & (
            F.datediff(F.to_date(l["l_shipdate"]), F.to_date(o["o_orderdate"]))
            > 90
        ),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# q185 — TPC-H Q6: the pure scan-filter-aggregate revenue-change probe.
# Every predicate reaches the parquet scan; the whole query is one
# pruned scan plus a one-row partial-aggregated sum.
# --------------------------------------------------------------------------
@register(
    "q185_forecast_revenue_change",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
               * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: revenue impact of discounted small-quantity "
    "lines in one year — scan, three pushed predicates, one exact "
    "decimal sum. The reference's whole aggregation engine is this "
    "shape on its orders frame (src/data_processor.py:467-484).",
)
def q185_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        _dsum(_dec("l_extendedprice") * _dec("l_discount", _RATE), "revenue")
    )


# --------------------------------------------------------------------------
# q186 — TPC-H Q11: group HAVING against a global-total scalar. Without
# partsupp, "stock value" is each part's total shipped value for one
# supplier nation; parts above 1/1000 of the nation's total survive.
# Exact integer cents; threshold by integer cross-multiplication.
# --------------------------------------------------------------------------
@register(
    "q186_important_part_value",
    oracle="""
WITH pv AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1
),
tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total_cents FROM pv)
SELECT pv.l_partkey AS p_partkey, pv.value_cents
FROM pv, tot
WHERE pv.value_cents * 1000 > tot.total_cents
""",
    doc="TPC-H Q11 shape: parts whose shipped value through one "
    "nation's suppliers exceeds 1/1000 of that nation's total — a "
    "keyed aggregate HAVING'd against a one-row global scalar "
    "(broadcast), threshold as integer cross-multiplication.",
)
def q186_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    pv = (
        l.join(F.broadcast(s), s["s_suppkey"] == l["l_suppkey"])
        .join(F.broadcast(n), n["n_nationkey"] == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(_dec("l_extendedprice") * 100).cast("long").alias("value_cents")
        )
    )
    tot = pv.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        pv.join(F.broadcast(tot))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )
