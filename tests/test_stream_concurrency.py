"""Streaming sweep-line maintenance (streaming/concurrency_stream.py):
micro-batches of interval rows merge per-day delta partials into a
parquet byday relation; the derived concurrency equals the from-scratch
batch sweep, and replays don't double-count."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.sweepline import (
    concurrency_from_byday,
    interval_concurrency,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.streaming.concurrency_stream import (


    stream_interval_deltas,
)

SF = "/root/testdata/sf0.001"


def _intervals(spark):
    li = load(spark, SF, "lineitem")
    o = load(spark, SF, "orders")
    ends = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    return o.join(ends, ends["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderdate").alias("start_ts"), "close_ts"
    )


def _run(spark, src: str, target: str, ckpt: str) -> None:
    schema = "start_ts timestamp, close_ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_interval_deltas(
            stream,
            start_col="start_ts",
            end_col="close_ts",
            target_path=target,
            checkpoint_path=ckpt,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _concurrency(spark, target: str) -> list[tuple]:
    byday = spark.read.parquet(target)
    return sorted(map(tuple, concurrency_from_byday(byday).collect()))


def test_stream_concurrency_matches_batch_sweep(spark, tmp_path):
    """Streaming the real sf0.001 intervals in micro-batches yields the
    identical per-day open counts to the one-shot batch sweep."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    iv = _intervals(spark)
    iv.repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))

    expected = sorted(
        map(tuple, interval_concurrency(iv, "start_ts", "close_ts").collect())
    )
    assert _concurrency(spark, target) == expected


def test_stream_concurrency_replay_does_not_double_count(spark, tmp_path):
    """Integer-delta merge is not idempotent, so the applied-batch
    ledger must skip redelivered batches: rerunning the whole stream
    from a FRESH checkpoint leaves the byday relation unchanged."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    _intervals(spark).repartition(2).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    first = _concurrency(spark, target)
    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert _concurrency(spark, target) == first
