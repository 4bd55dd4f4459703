"""Dynamic partition pruning (DPP): the scan-side star-join lever at
100 TB — the dimension's selective predicate prunes the PARTITIONS of a
hive-partitioned fact at runtime, before the join, via a
dynamicpruningexpression injected into the scan's PartitionFilters.
Static pruning needs the partition values in the query text; DPP derives
them from the joined dimension, which is how real calendars/dim filters
reach a date-partitioned fact.

Gotcha locked here because it cost an afternoon: Spark only inserts the
pruning subquery when the dimension predicate `isLikelySelective` — a
comparison/IN/LIKE against literals. A bare boolean column filter
(`.where(col("is_weekend"))`, or `== True`, which BooleanSimplification
collapses to the bare attribute) does NOT qualify and DPP silently
stays off. Model selective dim attributes as comparisons, not bare
boolean flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.sources.writers import (
    save_partitioned_parquet,
)

_DAYS = 20
_ROWS = 200_000
_WEEKEND_DAYS = [d for d in range(_DAYS) if d % 7 in (5, 6)]


@pytest.fixture(scope="module")
def dpp_paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dpp")
    fact_path = str(root / "fact")
    dim_path = str(root / "dim")
    save_partitioned_parquet(
        spark.range(_ROWS).select(
            (F.col("id") % _DAYS).cast("int").alias("day"),
            F.col("id").alias("v"),
        ),
        fact_path,
        partition_by=["day"],
    )
    spark.createDataFrame(
        [
            (d, "weekend" if d % 7 in (5, 6) else "weekday", d % 7 in (5, 6))
            for d in range(_DAYS)
        ],
        "day int, kind string, is_weekend boolean",
    ).write.parquet(dim_path)
    return fact_path, dim_path


def _join(spark, fact_path, dim_path):
    f = spark.read.parquet(fact_path)
    d = spark.read.parquet(dim_path).where(F.col("kind") == "weekend")
    return f.join(d, "day").agg(
        F.sum("v").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def _scan_rows_total(df) -> int:
    """Sum of numOutputRows over all scan leaves (call under AQE-off so
    the physical plan exposes its leaves directly)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


@pytest.fixture()
def no_aqe(spark):
    saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_dpp_injected_into_partition_filters(spark, dpp_paths):
    import contextlib
    import io

    j = _join(spark, *dpp_paths)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan, plan
    # the boolean-flag trap: filtering on a STORED boolean column is a
    # bare-attribute predicate after BooleanSimplification and fails
    # isLikelySelective, so DPP silently stays off. (A DERIVED flag —
    # withColumn(kind == 'weekend') then where(flag) — collapses back to
    # the literal comparison and still fires.) Locked so the failure
    # mode stays documented: model selective dim attributes as
    # comparisons against literals, not stored booleans.
    f = spark.read.parquet(dpp_paths[0])
    d2 = spark.read.parquet(dpp_paths[1]).where(F.col("is_weekend"))
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        f.join(d2, "day").agg(F.count(F.lit(1)).alias("n")).explain("formatted")
    assert "dynamicpruningexpression" not in buf2.getvalue()


def test_dpp_scans_fewer_rows_same_answer(spark, dpp_paths, no_aqe):
    fact_path, dim_path = dpp_paths
    conf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    saved = spark.conf.get(conf, "true")
    try:
        spark.conf.set(conf, "true")
        on_rows = _join(spark, fact_path, dim_path).collect()
        on_scanned = _scan_rows_total(_join(spark, fact_path, dim_path))
        spark.conf.set(conf, "false")
        off_rows = _join(spark, fact_path, dim_path).collect()
        off_scanned = _scan_rows_total(_join(spark, fact_path, dim_path))
    finally:
        spark.conf.set(conf, saved)
    assert [tuple(r) for r in on_rows] == [tuple(r) for r in off_rows]
    # 6 weekend days of 20: DPP reads ~30% of fact rows, off reads all
    expected_on = _ROWS * len(_WEEKEND_DAYS) // _DAYS
    assert off_scanned >= _ROWS
    assert on_scanned < expected_on + _DAYS + 1000, (on_scanned, off_scanned)
    assert on_scanned * 2 < off_scanned
