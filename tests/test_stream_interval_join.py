"""Stream-stream event-time interval join: watermarked symmetric hash
join over two file streams reproduces the batch range join exactly."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.streaming.interval_join_stream import (


    attribution_pairs,
    stream_click_attribution,
)

SF = "/root/testdata/sf0.001"


def _split_events(spark, tmp_path):
    """Real sf0.001 events rewritten as micros-timestamp parquet (the
    file stream source can't take the nanos legacy conf path), views
    and clicks in separate dirs, two files each so the join state
    carries across micro-batches."""
    ev = load(spark, SF, "events").select("event_id", "ts", "user_id", "event_type")
    views_dir = str(tmp_path / "views")
    clicks_dir = str(tmp_path / "clicks")
    ev.where("event_type = 'view'").repartition(2).write.parquet(views_dir)
    ev.where("event_type = 'click'").repartition(2).write.parquet(clicks_dir)
    return ev, views_dir, clicks_dir


def test_stream_interval_join_matches_batch(spark, tmp_path):
    ev, views_dir, clicks_dir = _split_events(spark, tmp_path)
    schema = spark.read.parquet(views_dir).schema

    vs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(views_dir)
    )
    cs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(clicks_dir)
    )
    out = str(tmp_path / "out")
    q = (
        stream_click_attribution(vs, cs, horizon_min=60)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        map(tuple, spark.read.parquet(out).select(
            "user_id", "view_id", "click_id"
        ).collect())
    )
    expected_df = attribution_pairs(
        ev.where("event_type = 'view'"),
        ev.where("event_type = 'click'"),
        horizon_min=60,
    )
    expected = sorted(
        map(tuple, expected_df.select("user_id", "view_id", "click_id").collect())
    )
    assert len(expected) > 0  # the fixture must actually exercise matches
    assert got == expected


def test_stream_outer_interval_join_requires_bounded_state(spark, tmp_path):
    """The scale property Spark enforces by construction: a
    stream-stream OUTER join without watermarks + a time-range bound
    has no point at which an unmatched row can be finalized (state
    would grow forever), so the engine refuses to start it. (Inner
    joins are permitted unbounded — they merely buffer; the module's
    watermarked interval shape is what makes state evictable there.)"""
    import pytest
    from pyspark.sql import functions as F

    _, views_dir, clicks_dir = _split_events(spark, tmp_path)
    schema = spark.read.parquet(views_dir).schema
    vs = spark.readStream.schema(schema).parquet(views_dir)
    cs = spark.readStream.schema(schema).parquet(clicks_dir)
    unbounded = vs.alias("v").join(
        cs.select(
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("c_ts"),
            F.col("user_id").alias("c_user_id"),
            F.col("event_type").alias("c_event_type"),
        ),
        F.expr("v.user_id = c_user_id"),
        "left_outer",
    )
    with pytest.raises(Exception) as exc:
        (
            unbounded.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
    assert "watermark" in str(exc.value).lower()
