"""Stream-stream event-time interval join: click-to-view attribution
where both sides arrive as streams — the last Structured Streaming join
mode in the surface (the others: stream-static broadcast joins in the
curation gates, foreachBatch keyed merges in the CDC/rollup sinks).

Semantics: a click is attributed to every view by the same user whose
timestamp precedes it by at most ``horizon`` (half-open on neither end:
``view_ts <= click_ts <= view_ts + horizon``), the standard
last-touch-window attribution primitive. Batch twin: the identical
predicate as a plain range join (q35's family).

Scale posture: Spark executes this as a watermarked symmetric hash
join — each side buffers only rows younger than (watermark + horizon)
PER KEY, so state is bounded by arrival rate x window, never by stream
history. The time-range condition is what lets the state store evict:
an unwatermarked inner join runs but buffers both streams forever, and
an unwatermarked OUTER join is refused outright (no point at which an
unmatched row could be finalized). Keys co-partition both sides on
user_id — one exchange per side, same as the batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_pairs(views: DataFrame, clicks: DataFrame, horizon_min: int = 5) -> DataFrame:
    """Batch twin: the exact join the streaming side must reproduce."""
    v = views.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return v.join(
        c,
        (v["user_id"] == c["c_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {horizon_min} MINUTES")),
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")


def stream_click_attribution(
    view_stream: DataFrame,
    click_stream: DataFrame,
    *,
    horizon_min: int = 5,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner interval join; append-mode
    result rows are (user_id, view_id, click_id, view_ts, click_ts)."""
    v = view_stream.select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    c = click_stream.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        (v["user_id"] == c["c_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {horizon_min} MINUTES")),
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")
