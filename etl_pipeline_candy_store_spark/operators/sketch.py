"""Distributed sketches built from portable primitives.

``hll_distinct`` is a HyperLogLog-style distinct-count estimator whose
every step is exact integer arithmetic over md5 — so the Spark plan and
the DuckDB oracle agree bit-for-bit (no RNG, no float accumulation:
per-bucket ranks are maxed, 16^-rank terms are summed as scaled
integers, and only the final constant division runs in doubles).

Why it matters at 100 TB: the per-bucket ``max(rank)`` is algebraic —
map-side combinable, mergeable across partitions/days — so distinct
counts over billions of rows cost one tiny shuffle of ≤256 rows, versus
a full shuffle for exact countDistinct. This is the sketch pattern
(HLL / theta) expressed in pure relational algebra.

Ranks are true bit-level leading zeros, recovered from hex digits with
CASE arithmetic (4 bits per leading '0' digit + 0-3 bits from the first
non-zero digit) — the textbook HLL estimator, fully portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 256  # buckets (2 hex digits)
_MAX_RANK = 40
_SCALE = 2**_MAX_RANK  # exact integer scale for 2^-rank sums
_ALPHA = 0.7213 / (1 + 1.079 / _M)  # standard HLL bias constant


def hll_project(df: DataFrame, value: Column, keep: list[str] | None = None) -> DataFrame:
    """Project each row to its HLL (bucket, rank) contribution, keeping
    ``keep`` columns alongside — the shared front half of the batch
    estimator and the streaming windowed estimator (register merge is
    max(rank), so any grouping downstream yields a mergeable sketch)."""
    keep = list(keep or [])
    h = F.md5(value.cast("string").cast("binary"))
    bucket = (
        (F.expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1) * 16
        + F.expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1
    )
    # bit-level rank from hex digits: 4 bits per leading '0' digit plus
    # 0-3 bits from the first non-zero digit (8-f:0, 4-7:1, 2-3:2, 1:3)
    zeros = F.length(F.expr("substr(h, 3)")) - F.length(
        F.expr("trim(LEADING '0' FROM substr(h, 3))")
    )
    first_nz = F.expr(
        "instr('0123456789abcdef', substr(trim(LEADING '0' FROM substr(h, 3)), 1, 1))"
    ) - 1
    extra = (
        F.when(first_nz >= 8, 0)
        .when(first_nz >= 4, 1)
        .when(first_nz >= 2, 2)
        .otherwise(3)
    )
    rank = F.least(zeros * 4 + extra + 1, F.lit(_MAX_RANK))
    return df.select(*keep, h.alias("h")).select(
        *keep, bucket.alias("bucket"), rank.alias("rank")
    )


_SMALL_RANGE = int(2.5 * _M)  # below this, raw HLL is biased high


def hll_estimate(per_bucket: DataFrame, keys: list[str]) -> DataFrame:
    """Finish an HLL estimate from a (keys..., bucket, max_rank) register
    relation — the shared back half of every estimator here (plain q37,
    the rolling-window merge, the streaming rollup's batch twin).

    Applies the standard small-range correction: when the raw estimate
    is <= 2.5m and empty registers remain, switch to linear counting
    (m * ln(m / empty)) — raw HLL overestimates badly in that regime.
    Cross-engine floor safety: m*ln(m/V) for V in 1..255 is never
    closer than 3.8e-4 to an integer, so a last-ulp ln() difference
    between engines cannot flip the floor."""
    agg = per_bucket.groupBy(*keys).agg(
        F.sum(F.expr(f"CAST({_SCALE} / power(2, max_rank) AS BIGINT)")).alias(
            "present_sum"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    sum_scaled = F.col("present_sum") + (F.lit(_M) - F.col("n_present")) * F.lit(_SCALE)
    raw = F.floor(
        F.lit(_ALPHA * _M * _M * float(_SCALE)) / sum_scaled.cast("double")
    ).cast("long")
    n_empty = F.lit(_M) - F.col("n_present")
    small = F.floor(
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / n_empty.cast("double"))
    ).cast("long")
    est = F.when((raw <= _SMALL_RANGE) & (n_empty > 0), small).otherwise(raw)
    return agg.select(*keys, est.alias("distinct_estimate"))


def hll_distinct(df: DataFrame, value: Column, group_by: list[str] | None = None) -> DataFrame:
    """Estimate COUNT(DISTINCT value), optionally per group."""
    keys = list(group_by or [])
    hashed = hll_project(df, value, keep=keys)
    per_bucket = hashed.groupBy(*keys, "bucket").agg(F.max("rank").alias("max_rank"))
    return hll_estimate(per_bucket, keys)


def hll_estimate_sql(keys: str, from_cte: str) -> str:
    """DuckDB twin of :func:`hll_estimate`: the agg + final-projection
    SQL over a (keys..., bucket, max_rank) CTE named ``from_cte``."""
    keysel = f"{keys}," if keys else ""
    grp = f"GROUP BY {keys}" if keys else ""
    raw = (
        f"CAST(floor({_ALPHA * _M * _M * float(_SCALE)!r}"
        f" / CAST(present_sum + ({_M} - n_present) * {_SCALE} AS DOUBLE)) AS BIGINT)"
    )
    small = (
        f"CAST(floor({float(_M)!r}"
        f" * ln({float(_M)!r} / CAST({_M} - n_present AS DOUBLE))) AS BIGINT)"
    )
    return f"""agg AS (
  SELECT {keysel}
         SUM(CAST({_SCALE} / power(2, max_rank) AS BIGINT)) AS present_sum,
         COUNT(*) AS n_present
  FROM {from_cte} {grp}
)
SELECT {keysel}
       CASE WHEN {raw} <= {_SMALL_RANGE} AND {_M} - n_present > 0
            THEN {small} ELSE {raw} END AS distinct_estimate
FROM agg"""


def hll_ranked_sql(
    value_expr: str, table: str, keysel: str = "", keysel_inner: str | None = None
) -> str:
    """DuckDB twin of :func:`hll_project`: the hashed + ranked CTE pair
    (bucket and bit-level rank per row), keeping ``keysel`` columns.
    When ``keysel`` computes an aliased expression (e.g. ``CAST(ts AS
    DATE) AS day,``), pass the bare output names as ``keysel_inner``."""
    if keysel_inner is None:
        keysel_inner = keysel
    return f"""hashed AS (
  SELECT {keysel} md5(CAST({value_expr} AS VARCHAR)) AS h FROM {table}
),
ranked AS (
  SELECT {keysel_inner}
         (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
           + instr('0123456789abcdef', substr(h, 2, 1)) - 1 AS bucket,
         least((length(substr(h, 3))
               - length(trim(LEADING '0' FROM substr(h, 3)))) * 4
               + (CASE WHEN instr('0123456789abcdef',
                        substr(trim(LEADING '0' FROM substr(h, 3)), 1, 1)) - 1 >= 8 THEN 0
                       WHEN instr('0123456789abcdef',
                        substr(trim(LEADING '0' FROM substr(h, 3)), 1, 1)) - 1 >= 4 THEN 1
                       WHEN instr('0123456789abcdef',
                        substr(trim(LEADING '0' FROM substr(h, 3)), 1, 1)) - 1 >= 2 THEN 2
                       ELSE 3 END) + 1, {_MAX_RANK}) AS rank
  FROM hashed
)"""


def hll_sql(value_expr: str, table: str, group_by: str | None = None) -> str:
    """The DuckDB-dialect twin of :func:`hll_distinct` — composed from
    the shared ranked-projection and estimate fragments."""
    keys = group_by or ""
    keysel = f"{keys}," if keys else ""
    grp1 = f"GROUP BY {keys}, bucket" if keys else "GROUP BY bucket"
    return f"""
WITH {hll_ranked_sql(value_expr, table, keysel)},
per_bucket AS (
  SELECT {keysel} bucket, MAX(rank) AS max_rank FROM ranked {grp1}
),
{hll_estimate_sql(keys, "per_bucket")}
"""


# --- conformance registration ---------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from etl_pipeline_candy_store_spark.plans.catalog import load, register  # noqa: E402


@register(
    "q37_hll_distinct",
    oracle=hll_sql("o_custkey", "orders", group_by="o_orderstatus"),
    doc="HLL-style distinct-customer estimate per order status — the "
    "mergeable-sketch pattern, bit-exact across engines.",
)
def q37_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return hll_distinct(o, F.col("o_custkey"), group_by=["o_orderstatus"])


# --- Count-Min sketch ------------------------------------------------------

_CMS_D = 4  # independent hash rows
_CMS_W = 512  # counters per row


def _hex_digit(h: str, i: int) -> str:
    """SQL for the value of hex digit ``i`` (1-based) of column ``h`` —
    identical text works in Spark SQL and DuckDB."""
    return f"(instr('0123456789abcdef', substr({h}, {i}, 1)) - 1)"


def _cms_col(h: str, j: int) -> str:
    """SQL for CMS hash row ``j``: hex digits 4j+1..4j+4 of md5 → 16-bit
    int → mod width. The four rows read disjoint md5 slices, giving the
    d pairwise-independent-ish hashes CMS needs."""
    i = 4 * j + 1
    return (
        f"((({_hex_digit(h, i)} * 16 + {_hex_digit(h, i + 1)}) * 16"
        f" + {_hex_digit(h, i + 2)}) * 16 + {_hex_digit(h, i + 3)}) % {_CMS_W}"
    )


def _cms_sql() -> str:
    cols = ", ".join(f"{_cms_col('h', j)} AS c{j}" for j in range(_CMS_D))
    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, c{j} AS col FROM keyed" for j in range(_CMS_D)
    )
    est_joins = "\n".join(
        f"JOIN sketch s{j} ON s{j}.j = {j} AND s{j}.col = t.c{j}"
        for j in range(_CMS_D)
    )
    least = "least(" + ", ".join(f"s{j}.cnt" for j in range(_CMS_D)) + ")"
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
keyed AS (
  SELECT tok, {cols} FROM (SELECT tok, md5(tok) AS h FROM toks) x
),
sketch AS (
  SELECT j, col, COUNT(*) AS cnt FROM ({sketch_rows}) r GROUP BY j, col
),
truth AS (
  SELECT tok, c0, c1, c2, c3, COUNT(*) AS true_count
  FROM keyed GROUP BY tok, c0, c1, c2, c3
)
SELECT tok, est_count, true_count, est_count - true_count AS overcount
FROM (
  SELECT t.tok, CAST({least} AS BIGINT) AS est_count, t.true_count
  FROM truth t
  {est_joins}
) z
ORDER BY est_count DESC, tok
LIMIT 50
"""


@register(
    "q86_count_min_topk",
    oracle=_cms_sql(),
    doc="Count-Min sketch heavy hitters: token frequencies estimated "
    f"from a fixed {_CMS_D}x{_CMS_W} counter grid (md5-slice hashes), "
    "top-50 by estimate with the exact count joined alongside — the "
    "CMS guarantee est >= true is visible in the overcount column. "
    "The sketch build is one map-side-combinable groupBy of a 4x "
    "fan-out (<= 2048 result rows regardless of corpus size — the "
    "mergeable fixed-size state that makes frequency estimation free "
    "at 100 TB); estimates come from four broadcast joins against the "
    "tiny sketch, no extra shuffle.",
)
def q86_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    keyed = toks.select(
        "tok",
        F.md5(F.col("tok").cast("binary")).alias("h"),
    ).select(
        "tok",
        *[F.expr(_cms_col("h", j)).alias(f"c{j}") for j in range(_CMS_D)],
    )
    # ONE pass over the corpus: the token-frequency relation (map-side
    # combinable groupBy, <= vocab rows) is checkpointed, and the sketch
    # is DERIVED from it — each cell's count is the sum of true_count
    # over tokens hashing there. The 4x fan-out and the cell aggregation
    # run over vocab-sized rows, never over the corpus again.
    truth = (
        keyed.groupBy("tok", "c0", "c1", "c2", "c3")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .localCheckpoint(eager=False)
    )
    cells = truth.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), F.col(f"c{j}").alias("col")
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("s"),
        "true_count",
    ).select("s.j", "s.col", "true_count")
    sketch = cells.groupBy("j", "col").agg(F.sum("true_count").alias("cnt"))
    est = truth
    for j in range(_CMS_D):
        sj = sketch.filter(F.col("j") == j).select(
            F.col("col").alias(f"col{j}"), F.col("cnt").alias(f"cnt{j}")
        )
        est = est.join(F.broadcast(sj), F.col(f"c{j}") == F.col(f"col{j}"))
    least = F.least(*[F.col(f"cnt{j}") for j in range(_CMS_D)])
    return (
        est.select(
            "tok",
            least.cast("long").alias("est_count"),
            "true_count",
            (least.cast("long") - F.col("true_count")).alias("overcount"),
        )
        .orderBy(F.col("est_count").desc(), "tok")
        .limit(50)
    )


# --- fixed-bin histogram quantile sketch -----------------------------------

_HQ_BINS = 256
_HQ_PCTS = (25, 50, 75, 90, 99)


@register(
    "q88_histogram_quantile",
    oracle=f"""
WITH c AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
stats AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx, COUNT(*) AS n FROM c),
hist AS (
  SELECT ((cents - mn) * {_HQ_BINS}) // (mx - mn + 1) AS bin, COUNT(*) AS cnt
  FROM c, stats GROUP BY 1
),
cum AS (
  SELECT bin, SUM(cnt) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
ps AS (SELECT unnest(ARRAY[{", ".join(map(str, _HQ_PCTS))}]) AS p),
hit AS (
  SELECT p, MIN(bin) AS bin
  FROM ps JOIN cum ON cum >= (SELECT (n * p + 99) // 100 FROM stats)
  GROUP BY p
)
SELECT CAST(p AS INTEGER) AS p, CAST(bin AS BIGINT) AS bin,
       CAST(mn + ((bin + 1) * (mx - mn + 1)) // {_HQ_BINS} AS BIGINT)
         AS est_upper_cents
FROM hit, stats
""",
    doc=f"Histogram quantile sketch: prices binned into {_HQ_BINS} fixed "
    "buckets between the global min/max (integer arithmetic in cents), "
    "quantile p estimated as the upper edge of the first bin whose "
    "cumulative count reaches ceil(n*p/100) — the mergeable "
    "fixed-size-state pattern (t-digest/KLL role) in pure relational "
    "algebra. Error is bounded by bin width; exact percentiles (q29) "
    "are the correctness foil. Scale shape: one stats agg broadcast "
    "back, one map-side-combinable groupBy to <= 256 rows; the "
    "cumulative window runs on the 256-row histogram, never the data.",
)
def q88_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(15,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    stats = li.agg(
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = li.join(F.broadcast(stats)).select(
        F.expr(f"((cents - mn) * {_HQ_BINS}) div (mx - mn + 1)").alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window

    cum = hist.select(
        "bin",
        F.sum("cnt")
        .over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    ps = stats.select(
        "mn",
        "mx",
        "n",
        F.explode(F.array(*[F.lit(p) for p in _HQ_PCTS])).alias("p"),
    ).withColumn("target", F.expr("(n * p + 99) div 100"))
    return (
        cum.join(F.broadcast(ps), F.col("cum") >= F.col("target"))
        .groupBy("p", "mn", "mx")
        .agg(F.min("bin").alias("bin"))
        .select(
            F.col("p").cast("int").alias("p"),
            F.col("bin").cast("long").alias("bin"),
            F.expr(f"mn + ((bin + 1) * (mx - mn + 1)) div {_HQ_BINS}")
            .cast("long")
            .alias("est_upper_cents"),
        )
    )


@register(
    "q113_rolling_hll_actives",
    oracle=f"""
WITH {hll_ranked_sql("user_id", "events", "CAST(ts AS DATE) AS day,", "day,")},
daily AS (
  SELECT day, bucket, MAX(rank) AS max_rank FROM ranked GROUP BY day, bucket
),
days AS (SELECT DISTINCT day FROM daily),
merged AS (
  SELECT d.day, r.bucket, MAX(r.max_rank) AS max_rank
  FROM days d JOIN daily r ON r.day <= d.day AND r.day >= d.day - 6
  GROUP BY d.day, r.bucket
),
{hll_estimate_sql("day", "merged")}
""",
    doc="Trailing-7-day distinct-actives ESTIMATE via register-merged "
    "HLL — the approximate counterpart of exact q108, and the shape "
    "that wins at 100 TB: raw events collapse ONCE to daily 256-"
    "register sketches (map-side combinable, <=256 rows/day forever), "
    "and every rolling window is a max-merge of 7 tiny register sets — "
    "no per-window rescan of events, no (user, day) state at all. "
    "Exact rolling distinct (q108) must carry every (user, day) pair "
    "through the window; the sketch carries 256 integers per day at a "
    "~6% relative-error price. Same bit-exact estimator arithmetic as "
    "q37/the streaming rollup (shared fragments), so Spark and DuckDB "
    "agree to the bit.",
)
def q113_rolling_hll_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    daily = (
        hll_project(ev, F.col("user_id"), keep=["day"])
        .groupBy("day", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )
    days = daily.select("day").distinct()
    merged = (
        F.broadcast(days.select(F.col("day").alias("rday")))
        .join(
            daily,
            (F.col("day") <= F.col("rday"))
            & (F.col("day") >= F.date_sub(F.col("rday"), 6)),
        )
        .groupBy("rday", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    return hll_estimate(
        merged.select(F.col("rday").alias("day"), "bucket", "max_rank"), ["day"]
    )
