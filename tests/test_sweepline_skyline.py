"""Hand-computed cases for the interval sweep-line (operators/
sweepline.py) and the 2-D skyline (operators/skyline.py), plus the
skyline's equivalence to the quadratic dominance self-join on a case
dense enough to exercise every bucket path."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.skyline import skyline2d
from etl_pipeline_candy_store_spark.operators.sweepline import (
    interval_concurrency,
)


def _d(day):
    return datetime.date(2024, 1, day)


def test_interval_concurrency_hand_computed(spark):
    # [1,3], [2,2], [2,5], [7,7] ->
    # d1:1  d2:3  d3:2(after [2,2] closes)  d4-5:1  d6:0  d7:1  d8:0
    iv = spark.createDataFrame(
        [(_d(1), _d(3)), (_d(2), _d(2)), (_d(2), _d(5)), (_d(7), _d(7))],
        "s date, e date",
    )
    out = {
        r["d"].day: r["open_count"]
        for r in interval_concurrency(iv, "s", "e").collect()
    }
    assert out == {1: 1, 2: 3, 3: 2, 4: 1, 6: 0, 7: 1, 8: 0}


def test_interval_concurrency_single_day_intervals(spark):
    iv = spark.createDataFrame([(_d(5), _d(5))] * 3, "s date, e date")
    out = {
        r["d"].day: r["open_count"]
        for r in interval_concurrency(iv, "s", "e").collect()
    }
    assert out == {5: 3, 6: 0}


def _skyline_ids(spark, rows):
    df = spark.createDataFrame(rows, "id long, x double, y int")
    return {r["id"] for r in skyline2d(df, "x", "y").collect()}


def test_skyline_hand_computed(spark):
    # frontier: (1.0, 5), (2.0, 3), (4.0, 1); id 4 dominated at equal
    # x by smaller y; id 5 dominated diagonally; id 6 equal-x equal-y
    # twin of id 2 survives (no strict improvement either way)
    rows = [
        (1, 1.0, 5),
        (2, 2.0, 3),
        (3, 4.0, 1),
        (4, 2.0, 4),
        (5, 3.0, 3),
        (6, 2.0, 3),
    ]
    assert _skyline_ids(spark, rows) == {1, 2, 3, 6}


def test_skyline_degenerate_single_x(spark):
    # all rows share one x: the _xmax == _xmin bucket guard path;
    # frontier = the min-y rows only (both duplicates of y=1)
    rows = [(1, 7.0, 3), (2, 7.0, 1), (3, 7.0, 1)]
    assert _skyline_ids(spark, rows) == {2, 3}


def test_skyline_monotone_chain_keeps_all(spark):
    rows = [(i, float(i), 100 - i) for i in range(1, 50)]
    assert _skyline_ids(spark, rows) == set(range(1, 50))


def test_skyline_matches_quadratic_dominance_join(spark):
    # pseudo-random-but-deterministic cloud (hash-derived, no RNG),
    # enough distinct x to populate many buckets
    rows = [
        (i, float((i * 2654435761) % 997), ((i * 40503) % 89) + 1)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    df.createOrReplaceTempView("sky_test")
    naive = spark.sql(
        """
        SELECT id FROM sky_test p
        WHERE NOT EXISTS (
          SELECT 1 FROM sky_test o
          WHERE o.x <= p.x AND o.y <= p.y AND (o.x < p.x OR o.y < p.y)
        )
        """
    )
    assert _skyline_ids(spark, rows) == {r["id"] for r in naive.collect()}
