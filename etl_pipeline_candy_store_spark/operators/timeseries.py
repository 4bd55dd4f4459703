"""Time-series operators: dense-spine gap fill with forward fill, and
windowed anomaly flagging — the hypertable-style surface a metrics
pipeline needs on top of the relational core.

Spark-first shape: the per-key date spine is generated with
``F.sequence`` + ``explode`` (a narrow fan-out, no shuffle), densified
by ONE left join on (key, day), and forward-filled with
``last(ignorenulls=True)`` over a bounded window — all JVM-side, no
Python in the path. At 100 TB the join shuffles on (key, day) which is
near-unique (no skew) and the window partitions by key only; spine
fan-out is bounded by the key's own date range so no key explodes
beyond its real span.

Money-typed sums route through DECIMAL before the final double cast so
both engines agree bit-exactly (same rule as plans/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.plans.catalog import load, register


@register(
    "q84_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(15,2))) AS DOUBLE) AS value_sum
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id, CAST(u.d AS DATE) AS day
  FROM bounds, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
),
j AS (
  SELECT s.user_id, s.day, COALESCE(d.n_events, 0) AS n_events, d.value_sum
  FROM spine s LEFT JOIN daily d USING (user_id, day)
)
SELECT user_id, day,
       CAST(n_events AS BIGINT) AS n_events,
       value_sum,
       LAST_VALUE(value_sum IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value_sum,
       value_sum IS NULL AS is_gap
FROM j
""",
    doc="Dense-calendar gap fill: per-user daily purchase totals on a "
    "generated date spine (per-user min..max), missing days zero-counted "
    "and forward-filled from the last observed day. The hypertable "
    "densify/locf primitive, expressed as sequence-explode + one left "
    "join + last(ignorenulls) window.",
)
def q84_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(15,2)")).cast("double").alias("value_sum"),
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    j = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "value_sum",
        F.last("value_sum", ignorenulls=True).over(w).alias("ff_value_sum"),
        F.col("value_sum").isNull().alias("is_gap"),
    )


@register(
    "q85_window_anomaly",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         CAST(SUM(CAST(value AS DECIMAL(15,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT day, event_type, cents,
         COUNT(*) OVER w AS n,
         SUM(cents) OVER w AS s1,
         SUM(cents * cents) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, event_type, cents,
       n >= 7 AND (n * cents - s1) * (n * cents - s1) > 9 * (n * s2 - s1 * s1)
         AS is_anomaly
FROM stats
""",
    doc="Trailing-window anomaly flag on the daily per-type series: "
    "|x - mean| > 3*stddev over a 7-day trailing window, evaluated as "
    "the cross-multiplied integer inequality "
    "(n*x - s1)^2 > 9*(n*s2 - s1^2) on exact cent sums — no float "
    "division, so both engines agree bit-exactly. Sliding sums are "
    "single-pass window aggregates (one shuffle on event_type).",
)
def q85_window_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        (F.sum(F.col("value").cast("decimal(15,2)")) * 100)
        .cast("long")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    stats = daily.select(
        "day",
        "event_type",
        "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("s2"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s1")
    var9 = F.lit(9) * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return stats.select(
        "day",
        "event_type",
        "cents",
        ((F.col("n") >= 7) & (dev * dev > var9)).alias("is_anomaly"),
    )


def _funnel_user_times(ev: DataFrame) -> DataFrame:
    """Per-user strict-order funnel times ``(user_id, t1, t2, t3)`` in
    ONE fact-side shuffle.

    Each stage's first timestamp must be STRICTLY after the previous
    stage's first occurrence.  The naive relational form (three
    filtered groupBys chained by user_id joins) re-shuffles the events
    relation per stage — 12 exchanges at sf0.001 per PLANS.md r8, and
    at 100 TB the per-stage exchanges ARE the cost.  Instead the three
    dependent stage mins stack as unbounded window aggregates over the
    SAME ``hashpartitioning(user_id)``: Catalyst plans one Exchange +
    one Sort feeding three Window ops, and the closing per-user
    aggregate's clustering requirement is already satisfied by the
    window partitioning, so no second shuffle appears.  The dependency
    chain (t2's predicate reads t1, t3's reads t2) is exactly what the
    window form expresses for free and the join form had to re-shuffle
    for.  Locked by ``tests/test_plans.py::test_funnel_single_exchange``.
    """
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    return (
        ev.withColumn("t1", t1)
        .withColumn("t2", t2)
        .withColumn("t3", t3)
        # t1/t2/t3 are constant within a user; max() just collapses the
        # per-event rows to one per user without another exchange
        .groupBy("user_id")
        .agg(F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3"))
    )


# strict-order funnel stage CTEs — one copy of the stage semantics,
# shared by the q103 and q115 oracles (the SQL twin of _funnel_user_times;
# the join form stays in the ORACLE so the single-shuffle window form is
# verified against independently-derived semantics, not itself)
_FUNNEL_CTES = """s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)"""


@register(
    "q103_event_funnel",
    oracle=f"""
WITH {_FUNNEL_CTES},
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 WHEN s1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INTEGER) AS stage
FROM u
LEFT JOIN s1 ON s1.user_id = u.user_id
LEFT JOIN s2 ON s2.user_id = u.user_id
LEFT JOIN s3 ON s3.user_id = u.user_id
""",
    doc="Ordered conversion funnel (view -> click -> purchase): each "
    "stage's timestamp must be STRICTLY after the previous stage's "
    "first occurrence — the semantics product-analytics engines "
    "implement natively (windowFunnel) and plain SQL gets wrong with "
    "independent per-type mins. One events scan, one user_id shuffle: "
    "three stacked window mins share the partitioning and the per-user "
    "collapse reuses it (plan-locked single Exchange, join-free).",
)
def q103_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    stage = (
        F.when(F.col("t3").isNotNull(), F.lit(3))
        .when(F.col("t2").isNotNull(), F.lit(2))
        .when(F.col("t1").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    # every user appears in the per-user frame (stage 0 when no view),
    # so the old DISTINCT user spine + three left joins are gone
    return _funnel_user_times(ev).select("user_id", stage.cast("int").alias("stage"))


@register(
    "q104_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT f.cohort_week,
       CAST((a.week - f.cohort_week) / 7 AS INTEGER) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM active a JOIN firsts f ON f.user_id = a.user_id
GROUP BY f.cohort_week, week_offset
""",
    doc="Retention cohort matrix: users cohorted by the ISO week of "
    "their first event; each cell counts cohort members active N weeks "
    "later. One events scan, one user_id shuffle: the cohort week is a "
    "window min over the same partitioning the (user, week) distinct "
    "then reuses (hashpartitioning(user_id) satisfies the wider "
    "clustering), so the old firsts/active self-join is gone; the only "
    "other exchange is over the cohort-sized cell frame. The report "
    "behind every growth dashboard, here as a first-class distributed "
    "op.",
)
def q104_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    cohorted = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.date_trunc("week", F.min("ts").over(w)).cast("date").alias("cohort_week"),
    ).distinct()  # cohort_week is user-constant, so this is per (user, week)
    return (
        cohorted.select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q105_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY from_type, to_type
""",
    doc="Event-type transition matrix (user path analysis): consecutive "
    "event pairs per user via one LEAD window (single shuffle on "
    "user_id, in-partition sort by (ts, event_id) — the unique id "
    "breaks timestamp ties so the sequence is deterministic), then a "
    "map-side-combinable count on the 25-cell pair key. The Markov "
    "first-order input behind next-action models and funnel discovery; "
    "composes with q103 (a funnel is a path through this matrix).",
)
def q105_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "q108_rolling_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day,
       COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau,
       COUNT(DISTINCT u.user_id) AS wau_7d
FROM days d
JOIN ud u ON u.day <= d.day AND u.day >= d.day - 6
GROUP BY d.day
""",
    doc="Rolling active users: per calendar day, distinct users that "
    "day (DAU) and in the trailing 7 days (7-day WAU) — the growth "
    "metric pair behind every engagement dashboard. Raw events first "
    "COLLAPSE to distinct (user, day) — the only corpus-wide shuffle — "
    "then a tiny broadcast day spine joins each (user, day) to at most "
    "7 report days (bounded fan-out, no re-scan of raw events per "
    "window, unlike a naive per-day subquery), and one distinct "
    "aggregate per day cell finishes it. Rolling DISTINCT cannot fold "
    "from daily counts (users overlap days), which is exactly why the "
    "collapse-then-bounded-fanout shape matters at scale; the HLL "
    "register-merge (q37/stream rollup) is the approximate alternative "
    "when exactness is negotiable.",
)
def q108_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    ud = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    joined = F.broadcast(days.select(F.col("day").alias("rday"))).join(
        ud,
        (F.col("day") <= F.col("rday")) & (F.col("day") >= F.date_sub(F.col("rday"), 6)),
    )
    return (
        joined.groupBy("rday")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("rday"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau_7d"),
        )
        .select(F.col("rday").alias("day"), "dau", "wau_7d")
    )


@register(
    "q112_trailing_window_sum",
    oracle="""
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS v_cents
  FROM events
)
SELECT event_id,
       CAST(SUM(v_cents) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS sum_3d_cents
FROM v
""",
    doc="Per-user trailing-3-day value sum with a time-RANGE window "
    "frame — the frame variant ROWS-based windows cannot express when "
    "events are irregularly spaced (the lookback is wall-clock time, "
    "not row count). Ordering key is integer epoch microseconds and "
    "the frame bound is an integer offset, so Spark's rangeBetween and "
    "the SQL RANGE INTERVAL agree exactly (timestamp peers are frame "
    "peers in both engines); values are floored to integer cents so "
    "the frame sum is order-independent. One shuffle on user_id, "
    "in-partition sort — the same single partitioning the other event "
    "analytics reuse.",
)
def q112_trailing_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100).cast("long").alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-259200000000, 0)
    )
    return ev.select("event_id", F.sum("v_cents").over(w).alias("sum_3d_cents"))


@register(
    "q114_trend_slope",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
xy AS (
  SELECT event_type,
         CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT) AS x,
         CAST(y AS BIGINT) AS y
  FROM daily
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM xy GROUP BY event_type
),
nd AS (
  SELECT event_type, CAST(n AS BIGINT) AS n_days,
         CAST(n AS BIGINT) * CAST(sxy AS BIGINT)
           - CAST(sx AS BIGINT) * CAST(sy AS BIGINT) AS num,
         CAST(n AS BIGINT) * CAST(sxx AS BIGINT)
           - CAST(sx AS BIGINT) * CAST(sx AS BIGINT) AS den
  FROM s WHERE n >= 2
)
SELECT event_type, n_days,
       (num // den) * 1000000 + ((num % den) * 1000000) // den
         AS slope_micros_per_day
FROM nd
""",
    doc="Per-key linear trend: the OLS slope of daily event counts over "
    "time, in integer micro-units per day — trend detection / "
    "drift-alerting over grouped time series without fitting loops. "
    "slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) evaluated entirely in "
    "int64: x is offset to each key's own first day (slope is shift-"
    "invariant; raw epoch days would push n*Sxy past 2^63 on year-"
    "scale series with 1e9-row days), and the micro-unit scaling uses "
    "the split form (num div den)*1e6 + ((num mod den)*1e6) div den — "
    "exact for truncating division, and the remainder term is bounded "
    "by den*1e6 so the scale-up can't overflow either. Associative, "
    "retry-stable, cross-engine exact. Two map-side-combinable "
    "aggregates — events collapse to (key, day) counts, then to five "
    "sums per key — and nothing wider than the key cardinality ever "
    "shuffles.",
)
def q114_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w_min = Window.partitionBy("event_type")
    xy = daily.select(
        "event_type",
        F.datediff("day", F.min("day").over(w_min)).cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = s.filter(F.col("n") >= 2).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr("n * sxy - sx * sy").alias("num"),
        F.expr("n * sxx - sx * sx").alias("den"),
    )
    return nd.select(
        "event_type",
        "n_days",
        F.expr("(num div den) * 1000000 + ((num % den) * 1000000) div den").alias(
            "slope_micros_per_day"
        ),
    )


@register(
    "q115_funnel_time_to_convert",
    oracle=f"""
WITH {_FUNNEL_CTES},
d12 AS (
  SELECT epoch_us(s2.t2) - epoch_us(s1.t1) AS gap
  FROM s2 JOIN s1 ON s1.user_id = s2.user_id
),
d23 AS (
  SELECT epoch_us(s3.t3) - epoch_us(s2.t2) AS gap
  FROM s3 JOIN s2 ON s2.user_id = s3.user_id
)
SELECT 'view->click' AS stage_pair, COUNT(*) AS n_users,
       CAST(SUM(gap) AS BIGINT) // COUNT(*) AS avg_gap_us
FROM d12 HAVING COUNT(*) > 0
UNION ALL
SELECT 'click->purchase' AS stage_pair, COUNT(*) AS n_users,
       CAST(SUM(gap) AS BIGINT) // COUNT(*) AS avg_gap_us
FROM d23 HAVING COUNT(*) > 0
""",
    doc="Funnel time-to-convert: mean wall-clock gap between each "
    "adjacent funnel stage pair, over users who reached the later "
    "stage — the latency half of the conversion report (q103 is the "
    "breadth half; both compose the same strict-order stage relation, "
    "one copy of the semantics). Gaps are integer epoch-microsecond "
    "differences and the mean is one truncating division, so the "
    "result is associative and cross-engine exact; everything after "
    "the stage aggregates touches frames no wider than converted "
    "users.",
)
def q115_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # a null later-stage time nulls the whole gap expression, so sum/
    # count skip exactly the users who never reached that stage — both
    # pairs fold in ONE global aggregate over the single-shuffle
    # per-user frame, and stack() unpivots the 1-row result into the
    # report rows (no second events scan, no union of two agg chains)
    gap12 = F.unix_micros(F.col("t2")) - F.unix_micros(F.col("t1"))
    gap23 = F.unix_micros(F.col("t3")) - F.unix_micros(F.col("t2"))
    agg = _funnel_user_times(ev).agg(
        F.count("t2").alias("n12"),
        F.sum(gap12).alias("g12"),
        F.count("t3").alias("n23"),
        F.sum(gap23).alias("g23"),
    )
    return (
        agg.select(
            F.expr(
                "stack(2, 'view->click', n12, g12,"
                " 'click->purchase', n23, g23) AS (stage_pair, n_users, sg)"
            )
        )
        .filter(F.col("n_users") > 0)
        .select(
            "stage_pair", "n_users", F.expr("sg div n_users").alias("avg_gap_us")
        )
    )


@register(
    "q117_dow_seasonality",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
dw AS (SELECT event_type, isodow(day) - 1 AS dow, n FROM daily),
per_dow AS (
  SELECT event_type, dow, SUM(n) AS s_dow, COUNT(*) AS d_dow
  FROM dw GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(n) AS s_all, COUNT(*) AS d_all
  FROM dw GROUP BY 1
)
SELECT p.event_type, CAST(p.dow AS INTEGER) AS dow,
       CAST(p.d_dow AS BIGINT) AS n_days,
       (CAST(p.s_dow AS BIGINT) * CAST(t.d_all AS BIGINT) * 1000000)
         // (CAST(p.d_dow AS BIGINT) * CAST(t.s_all AS BIGINT)) AS index_micros
FROM per_dow p JOIN tot t ON t.event_type = p.event_type
""",
    doc="Day-of-week seasonality index per event type: mean daily "
    "volume on each weekday relative to the type's overall daily mean, "
    "as the exact integer ratio (s_dow * d_all * 1e6) div "
    "(d_dow * s_all) — the seasonal profile dashboards and forecast "
    "de-seasonalizers consume. Weekday is Monday-based 0-6 on both "
    "engines (Spark weekday() ≡ DuckDB isodow()-1 — the Sunday-based "
    "builtins disagree between engines and are avoided). Events "
    "collapse to (type, day) once; everything after is key-cardinality "
    "sized.",
)
def q117_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    dw = daily.select("event_type", F.weekday("day").alias("dow"), "n")
    per_dow = dw.groupBy("event_type", "dow").agg(
        F.sum("n").alias("s_dow"), F.count(F.lit(1)).alias("d_dow")
    )
    tot = dw.groupBy("event_type").agg(
        F.sum("n").alias("s_all"), F.count(F.lit(1)).alias("d_all")
    )
    return per_dow.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        F.col("d_dow").alias("n_days"),
        F.expr("(s_dow * d_all * 1000000) div (d_dow * s_all)").alias("index_micros"),
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top: int = 20
) -> DataFrame:
    """Shuffle-planning diagnostic: per-key row shares for the hottest
    keys, plus how far the hottest key sits above a perfectly even
    spread. This is the probe every skew-aware strategy needs BEFORE it
    picks a plan (the allocation dispatcher runs exactly this shape
    over its request keys): one map-side-combinable count per key, a
    top-k tail, and a broadcast of the two global scalars — no sort,
    no second scan of the fact table. share/skew in integer micros so
    the report hashes identically everywhere. skew_x_mean_micros =
    key_rows / (total_rows / n_keys) — 1,000,000 means perfectly even;
    a key at 50x mean is the signal to salt or bucket it."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        counts.orderBy(F.col("n_rows").desc(), "key")
        .limit(top)
        .crossJoin(F.broadcast(totals))
        .select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("CAST((n_rows * 1000000) div total_rows AS BIGINT)").alias(
                "share_micros"
            ),
            F.expr(
                "CAST((n_rows * n_keys * 1000000) div total_rows AS BIGINT)"
            ).alias("skew_x_mean_micros"),
        )
    )


@register(
    "q135_key_skew_profile",
    oracle="""
WITH counts AS (
  SELECT user_id AS key, COUNT(*) AS n_rows FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys FROM counts
)
SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
       CAST((n_rows * 1000000) // total_rows AS BIGINT) AS share_micros,
       CAST((n_rows * n_keys * 1000000) // total_rows AS BIGINT)
         AS skew_x_mean_micros
FROM (SELECT * FROM counts ORDER BY n_rows DESC, key LIMIT 20) c, tot
""",
    doc="Key-skew profile over the event stream's user_id — the "
    "diagnostic a 100 TB engine runs BEFORE choosing a shuffle "
    "strategy (the allocation dispatcher's probe, generalized): top-20 "
    "hottest keys with row share and multiple-of-even-spread in "
    "integer micros. One combinable count per key + TakeOrderedAndProject "
    "+ a 1-row broadcast of the global totals; the fact table is "
    "scanned once and never sorted.",
)
def q135_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_profile(load(spark, sf_dir, "events"), "user_id")


# --- Per-series integer recursions as array folds ---------------------
#
# Sequential state appears in this engine three ways, by state shape:
# unbounded cross-row feedback -> mapInPandas (allocation, q30);
# linear-in-prefix state -> window functions (q09/q112); and BOUNDED
# per-series recursions -> the pattern here: collect each series into
# an array (bounded by series length, never corpus size), run the
# recursion as a row-local higher-order `aggregate` fold entirely
# JVM-side, and explode the trajectory back out. No Python, no state
# store, one shuffle on the series key. Integer state with explicit
# `div` keeps the trajectory bit-identical to the oracle's recursive
# CTE replay.

_EWMA_FOLD = """
posexplode(aggregate(
  xs,
  struct(CAST(0 AS BIGINT) AS s,
         CAST(array() AS ARRAY<STRUCT<d: DATE, n: BIGINT, e: BIGINT>>) AS o),
  (acc, x) -> struct(
     (acc.s + x.n) div 2 AS s,
     array_append(acc.o, named_struct(
       'd', x.d, 'n', x.n, 'e', (acc.s + x.n) div 2)) AS o),
  acc -> acc.o))
"""


@register(
    "q162_ewma_daily_orders",
    oracle="""
WITH RECURSIVE
daily AS (
  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT pri, d, n,
         ROW_NUMBER() OVER (PARTITION BY pri ORDER BY d) AS r
  FROM daily
),
ew(pri, d, n, r, e) AS (
  SELECT pri, d, n, r, n // 2 FROM seq WHERE r = 1
  UNION ALL
  SELECT s.pri, s.d, s.n, s.r, (ew.e + s.n) // 2
  FROM seq s JOIN ew ON ew.pri = s.pri AND s.r = ew.r + 1
)
SELECT pri, d, n, CAST(e AS BIGINT) AS ewma
FROM ew
""",
    doc="Integer EWMA (alpha = 1/2) of daily order counts per priority: "
    "s_t = (s_{t-1} + n_t) div 2 from s_0 = 0 — the smoothing "
    "recursion no window frame can express (each state depends on the "
    "FOLDED previous state, not a prefix aggregate). Runs as a "
    "row-local JVM `aggregate` fold over the collected per-series "
    "array (bounded by #days, never corpus-sized), one shuffle on the "
    "series key; the oracle replays the identical recursion with a "
    "recursive CTE. The third sequential-state strategy beside "
    "mapInPandas (unbounded feedback, q30) and windows (prefix "
    "aggregates, q09).",
)
def q162_ewma_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    per = daily.groupBy("pri").agg(
        F.array_sort(F.collect_list(F.struct("d", "n"))).alias("xs")
    )
    return per.select("pri", F.expr(_EWMA_FOLD).alias("pos", "t")).select(
        "pri",
        F.col("t.d").alias("d"),
        F.col("t.n").alias("n"),
        F.col("t.e").alias("ewma"),
    )


_CUSUM_K = 2    # per-day drift allowance
_CUSUM_H = 4    # alarm threshold

_CUSUM_FOLD = f"""
posexplode(aggregate(
  xs,
  struct(CAST(0 AS BIGINT) AS s,
         CAST(array() AS ARRAY<STRUCT<d: DATE, n: BIGINT, c: BIGINT>>) AS o),
  (acc, x) -> struct(
     greatest(CAST(0 AS BIGINT), acc.s + x.n - {_CUSUM_K}) AS s,
     array_append(acc.o, named_struct(
       'd', x.d, 'n', x.n,
       'c', greatest(CAST(0 AS BIGINT), acc.s + x.n - {_CUSUM_K}))) AS o),
  acc -> acc.o))
"""


@register(
    "q163_cusum_alarm",
    oracle=f"""
WITH RECURSIVE
daily AS (
  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
seq AS (
  SELECT pri, d, n,
         ROW_NUMBER() OVER (PARTITION BY pri ORDER BY d) AS r
  FROM daily
),
cu(pri, d, n, r, c) AS (
  SELECT pri, d, n, r, greatest(0, n - {_CUSUM_K}) FROM seq WHERE r = 1
  UNION ALL
  SELECT s.pri, s.d, s.n, s.r, greatest(0, cu.c + s.n - {_CUSUM_K})
  FROM seq s JOIN cu ON cu.pri = s.pri AND s.r = cu.r + 1
)
SELECT pri, d, n, CAST(c AS BIGINT) AS cusum, c > {_CUSUM_H} AS alarm
FROM cu
""",
    doc="One-sided CUSUM change detection on daily order counts per "
    "priority: c_t = max(0, c_{{t-1}} + n_t - k), alarm when c exceeds "
    "h — the classic sequential shift detector (detects sustained "
    "upward drift a threshold-per-day check misses), again an order-"
    "dependent recursion with a max clamp that no window expresses. "
    "Same bounded-series array-fold execution and recursive-CTE oracle "
    "as q162; all integer.",
)
def q163_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    per = daily.groupBy("pri").agg(
        F.array_sort(F.collect_list(F.struct("d", "n"))).alias("xs")
    )
    return per.select("pri", F.expr(_CUSUM_FOLD).alias("pos", "t")).select(
        "pri",
        F.col("t.d").alias("d"),
        F.col("t.n").alias("n"),
        F.col("t.c").alias("cusum"),
        (F.col("t.c") > _CUSUM_H).alias("alarm"),
    )


@register(
    "q166_click_attribution",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       v.ts AS view_ts,
       c.ts AS click_ts
FROM events v
JOIN events c
  ON c.user_id = v.user_id
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL 60 MINUTE
WHERE v.event_type = 'view' AND c.event_type = 'click'
""",
    doc="Click-to-view attribution: each click joined to every "
    "same-user view at most 60 minutes earlier — the bounded-horizon "
    "event-time interval join (q35's range-join family applied to the "
    "attribution shape). This is the oracle-anchored batch twin of the "
    "streaming surface's watermarked stream-stream join "
    "(streaming/interval_join_stream.py) — the equivalence test proves "
    "stream==batch on the same events, and this entry proves the batch "
    "semantics against DuckDB. Plan: user-keyed equi-join (one "
    "exchange per side) with the time bound as a post-join filter; "
    "candidate pairs are bounded per user by rate x horizon, never "
    "the cross of the event timeline.",
)
def q166_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.streaming.interval_join_stream import (
        attribution_pairs,
    )

    ev = load(spark, sf_dir, "events")
    return attribution_pairs(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "click"),
        horizon_min=60,
    )


@register(
    "q168_hopping_window_traffic",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS w0
  FROM events
),
x AS (
  SELECT user_id, event_type, unnest([w0, w0 - 1800]) AS win_epoch
  FROM e
)
SELECT CAST(to_timestamp(win_epoch) AS TIMESTAMP) AS win_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM x
GROUP BY win_epoch
""",
    doc="Hopping-window traffic: 60-minute windows sliding every 30 "
    "minutes over the event stream (each event lands in exactly "
    "duration/slide = 2 windows) — the overlapping-window load curve "
    "every monitoring dashboard draws, and the batch twin of "
    "Structured Streaming's F.window(ts, '60 minutes', '30 minutes') "
    "windowed aggregation (the tumbling form runs in "
    "streaming/allocation_stream.py). Spark expands each row to its "
    "covering windows row-locally (a Generate, no join against a "
    "window spine) then runs ONE window-keyed aggregate; the oracle "
    "replays the same 2-window expansion with epoch arithmetic. "
    "distinct-user counts go through the standard two-phase expand.",
)
def q168_hopping_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("n_purchases"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "n_events",
            "n_users",
            "n_purchases",
        )
    )


@register(
    "q171_trailing_median_value",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS pri,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT pri, month, cents,
         list(cents) OVER (PARTITION BY pri ORDER BY month
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS win
  FROM m
)
SELECT pri, month, cents,
       CAST(2 * MEDIAN(u.c) AS BIGINT) AS med2_trailing
FROM w, unnest(w.win) AS u(c)
GROUP BY pri, month, cents
""",
    doc="Trailing-3-month exact median of monthly revenue per priority "
    "— the robust trend line a mean-based rolling average can't give "
    "(one promotional month doesn't drag the median). Technique: the "
    "window is BOUNDED (3 rows), so the exact percentile runs as "
    "collect_list over the frame + a row-local sorted-array pick — "
    "O(frame) per row with frame=3, no per-group re-sort, usable "
    "wherever the frame is a small constant (contrast q165, where the "
    "whole-group median goes through the percentile aggregate). The "
    "2x-median BIGINT staging keeps even-count interpolation integral "
    "across engines. Window partitioned by priority over ~84 months — "
    "bounded state, never a fact-sized window.",
)
def q171_trailing_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100))
        .cast("long")
        .alias("cents")
    )
    w = (
        Window.partitionBy("pri")
        .orderBy("month")
        .rowsBetween(-2, Window.currentRow)
    )
    win = F.sort_array(F.collect_list("cents").over(w))
    n = F.size(win)
    lo = F.element_at(win, ((n + 1) / 2).cast("int"))
    hi = F.element_at(win, (n / 2 + 1).cast("int"))
    return m.select(
        "pri", "month", "cents", (lo + hi).cast("long").alias("med2_trailing")
    )


@register(
    "q172_revenue_gini",
    oracle="""
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2)) * 100) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rk
  FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST((2 * CAST(SUM(rk * cents) AS HUGEINT)
             - (COUNT(*) + 1) * CAST(SUM(cents) AS HUGEINT)) * 1000000
            // (CAST(COUNT(*) AS HUGEINT) * CAST(SUM(cents) AS HUGEINT))
            AS BIGINT) AS gini_ppm
FROM r
""",
    doc="Gini concentration of per-customer revenue — the inequality "
    "metric that tells a curation pipeline whether a source's token "
    "mass (or a market's revenue) is dominated by a few heavy keys "
    "(gini->1) or spread evenly (gini->0); the same computation over "
    "per-source token counts flags corpus concentration before "
    "training. Formula: G = (2*sum(rank*x) - (n+1)*sum(x)) / "
    "(n*sum(x)) over ascending ranks — all-integer with cents and a "
    "final ppm division, so cross-engine exact. The global rank "
    "runs as the q119-style two-level bucketed prefix sum: rows land "
    "in 32 VALUE-RANGE buckets (monotone in the sort key, so global "
    "order = bucket order + within-bucket order), within-bucket "
    "row_numbers are bucket-partitioned windows, and the cross-bucket "
    "rank base is a 32-row bucket-totals window; sum(rank*x) "
    "decomposes per bucket as base*sum(x) + sum(rn*x). No "
    "whole-relation window at any cardinality.",
)
def q172_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(15,2)") * 100))
        .cast("long")
        .alias("cents")
    )
    nb = 32
    bounds = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    # the range bucket is monotone in cents, so ordering by
    # (bkt, cents, o_custkey) equals the global (cents, o_custkey) order
    b = c.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "cents",
        F.expr(f"CAST((cents - lo) * {nb} div (hi - lo + 1) AS INT)").alias(
            "bkt"
        ),
    )
    w_in = Window.partitionBy("bkt").orderBy("cents", "o_custkey")
    rn = b.select("bkt", "cents", F.row_number().over(w_in).alias("rn"))
    per_bkt = rn.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("cents").alias("sum_b"),
        F.sum(F.col("rn") * F.col("cents")).alias("rnx_b"),
    )
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    merged = per_bkt.select(
        "n_b",
        "sum_b",
        "rnx_b",
        F.coalesce(F.sum("n_b").over(w_bkt), F.lit(0)).alias("base"),
    )
    # per bucket: sum(rk*x) = base*sum(x) + sum(rn*x); buckets then merge
    r = merged.select(
        "n_b",
        "sum_b",
        (F.col("base") * F.col("sum_b") + F.col("rnx_b")).alias("rkx"),
    )
    return r.agg(
        F.sum("n_b").cast("long").alias("n_customers"),
        F.sum("sum_b").cast("long").alias("total_cents"),
        F.expr(
            "CAST((2 * CAST(sum(rkx) AS DECIMAL(38,0))"
            " - (sum(n_b) + 1) * CAST(sum(sum_b) AS DECIMAL(38,0)))"
            " * 1000000 div (CAST(sum(n_b) AS DECIMAL(38,0))"
            " * CAST(sum(sum_b) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("gini_ppm"),
    )
