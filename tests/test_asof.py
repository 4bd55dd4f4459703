"""Unit tests for the as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.asof import asof_join, sessionize


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(20)), (2, _ts(5))], "k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(15), "b"), (2, _ts(6), "c")],
        "k int, rts timestamp, v string",
    )
    out = {
        (r["k"], r["lts"].minute): r["asof_v"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts", payload_cols=["v"]
        ).collect()
    }
    # tie at 10:10 matches ("a"); 10:20 takes latest ("b"); right at 10:06
    # is AFTER left 10:05 → no match
    assert out == {(1, 10): "a", (1, 20): "b", (2, 5): None}


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(40))], "k int, lts timestamp")
    right = spark.createDataFrame([(1, _ts(0), "old")], "k int, rts timestamp, v string")
    no_tol = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", payload_cols=["v"]
    ).collect()[0]["asof_v"]
    with_tol = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        payload_cols=["v"], tolerance="30 minutes",
    ).collect()[0]["asof_v"]
    assert no_tol == "old" and with_tol is None


def test_asof_right_right_tie_deterministic(spark):
    """Two right rows sharing (key, ts): the match must be deterministic —
    caller's right_seq wins when given, else the highest payload tuple."""
    left = spark.createDataFrame([(1, _ts(10))], "k int, lts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), "x", 2), (1, _ts(5), "y", 1)],
        "k int, rts timestamp, v string, seq int",
    )
    # default tiebreak: payload order → "y" (max payload) wins, every run
    for _ in range(3):
        got = asof_join(
            left.repartition(4), right.repartition(3),
            on=["k"], left_ts="lts", right_ts="rts", payload_cols=["v"],
        ).collect()[0]["asof_v"]
        assert got == "y"
    # caller-supplied sequence: seq=2 ("x") wins
    got = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        payload_cols=["v"], right_seq="seq",
    ).collect()[0]["asof_v"]
    assert got == "x"


def test_sessionize_gaps(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0)), (1, _ts(10)), (1, _ts(50)),  # gap 40min → new session
            (2, _ts(0)),
        ],
        "user int, ts timestamp",
    )
    out = {
        (r["user"], r["ts"].minute): r["session_id"]
        for r in sessionize(ev, key_cols=["user"], ts_col="ts", gap="30 minutes").collect()
    }
    assert out == {(1, 0): 1, (1, 10): 1, (1, 50): 2, (2, 0): 1}
