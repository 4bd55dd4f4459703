"""2-D skyline (Pareto frontier) without a global sort or an all-pairs
dominance join.

The dominance query — "rows not beaten on BOTH criteria by any other
row" — is quadratic if expressed as the textbook NOT EXISTS self-join
(which is exactly what the DuckDB oracle runs, as the independently
derived spec). The Spark operator instead exploits the 2-D structure:
a row (x, y) is on the frontier iff

    y == min_y(its exact x)      (not beaten at equal x), and
    y <  min_y over all x' < x   (not beaten by anything strictly
                                  cheaper; vacuous at the global min x)

so the whole computation reduces to a per-x minimum plus a PREFIX
minimum over x — an associative scan, not a join. The prefix min runs
as the engine's standard two-level decomposition (the q119/q141
bucket-totals pattern): x is range-bucketed monotonically, per-bucket
minima (a few dozen rows) take an unpartitioned running min, and each
bucket's interior scans independently in parallel — no single task
ever orders more than one bucket's worth of distinct x values. Equal
(x, y) duplicate points do not dominate each other (no strict
inequality) and all survive, which the equality-based formulation gets
for free.

At 100 TB: two fact-side shuffles total (the per-x aggregation and the
bucket repartition), one broadcast of a ~32-row relation, and the
final frontier join back to the fact relation on x — the frontier
relation is tiny, so AQE turns that into a broadcast probe.

Beyond-reference extension operator (the reference's query surface has
no multi-criteria dominance query; its closest shape is the
single-criterion min/max aggregation family, SURVEY §2 A1/A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.plans.catalog import load, register


def skyline2d(
    df: DataFrame, x: str, y: str, n_buckets: int = 32
) -> DataFrame:
    """Rows of ``df`` minimal under (``x``, ``y``) Pareto dominance:
    no other row has x' <= x and y' <= y with at least one strict.
    Returns the input rows (all columns) on the frontier; identical
    duplicated points all survive."""
    ext = df.agg(
        F.min(x).alias("_xmin"), F.max(x).alias("_xmax")
    )
    g = (
        df.groupBy(x)
        .agg(F.min(y).alias("_miny"))
        .crossJoin(F.broadcast(ext))
        .withColumn(
            "_b",
            F.when(
                F.col("_xmax") > F.col("_xmin"),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col(x) - F.col("_xmin"))
                        / ((F.col("_xmax") - F.col("_xmin")) / n_buckets)
                    ),
                ),
            ).otherwise(F.lit(0)),
        )
        .select(x, "_miny", "_b")
        # g feeds BOTH the bucket-minimum relation and the per-x filter;
        # materialize it once so the fact scan + per-x aggregation +
        # extent cross-join aren't evaluated twice (the static plan
        # showed the whole subtree duplicated — 11 exchanges / 2
        # cartesians collapses to one evaluation)
        .localCheckpoint(eager=True)
    )
    # level 1: per-bucket minima (≤ n_buckets rows) and their exclusive
    # prefix min — the only unpartitioned window, over a relation whose
    # size is fixed by n_buckets, not the data
    bmin = g.groupBy("_b").agg(F.min("_miny").alias("_bmin"))
    bpref = bmin.withColumn(
        "_bpref",
        F.min("_bmin").over(
            Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    # level 2: within-bucket exclusive running min over distinct x
    # (one row per x, so ROWS ... 1 PRECEDING == "all strictly smaller
    # x in this bucket"); combine with the carried-in cross-bucket min.
    # least() skips nulls, so the global-min x (both levels null) keeps
    # a null _strict == "nothing strictly cheaper".
    inb = Window.partitionBy("_b").orderBy(x).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_x = (
        g.join(F.broadcast(bpref.select("_b", "_bpref")), "_b")
        .withColumn("_strict", F.least(F.min("_miny").over(inb), F.col("_bpref")))
        .filter(F.col("_strict").isNull() | (F.col("_miny") < F.col("_strict")))
        .select(x, "_miny")
    )
    return (
        df.join(frontier_x, x)
        .filter(F.col(y) == F.col("_miny"))
        .drop("_miny")
    )


@register(
    "q191_pareto_frontier",
    oracle="""
SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS INTEGER) AS p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part o
  WHERE o.p_retailprice <= p.p_retailprice
    AND o.p_size <= p.p_size
    AND (o.p_retailprice < p.p_retailprice OR o.p_size < p.p_size)
)
""",
    doc="Skyline / Pareto frontier over part on (p_retailprice, "
    "p_size): the parts for which no other part is both at-most-as-"
    "expensive and at-most-as-large with one strict improvement — the "
    "multi-criteria shortlist query. The oracle runs the quadratic "
    "NOT-EXISTS dominance self-join as the independent spec; the "
    "Spark side computes the identical set as a per-price minimum "
    "plus a bucketed two-level prefix minimum over price (an "
    "associative scan — two fact shuffles, one ~32-row broadcast, no "
    "self-join), which is the formulation that survives 100 TB.",
)
def q191_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    return skyline2d(p, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("int").alias("p_size")
    )
