"""As-of join + sessionization — stream-analytics operators Spark lacks
as built-ins, composed from declarative primitives (SURVEY §2.3 "engine
exposes the full join surface"; no counterpart in the reference).

As-of join strategy: instead of a non-equi join (which Spark plans as a
broadcast nested loop — quadratic per key), tag and UNION both sides,
then one window pass per key ordered by time carries the most recent
right-side payload forward (``last(..., ignorenulls=True)``). Cost: one
shuffle + one sort — the same complexity as any keyed window, and
linear in rows at 100 TB where a nested-loop would be unusable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tolerance: str | None = None,
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` per ``on`` key (ties: the right row matches).

    ``payload_cols`` are the right-side columns to carry. ``tolerance``
    (an INTERVAL literal like ``'30 minutes'``) drops matches older than
    ``left_ts - tolerance``.

    When two RIGHT rows share a key and timestamp, ``right_seq`` (a
    right-side column, e.g. an ingest sequence/id) breaks the tie: the
    highest value wins. Without it the tie is broken on the payload
    values themselves — still deterministic across runs, just not
    caller-chosen.
    """
    on = list(on)
    payload_cols = list(payload_cols)
    lt = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
        F.col(right_ts).alias("_r_ts"),
        *([F.col(right_seq).alias("_r_seq")] if right_seq is not None else []),
    )
    if right_seq is not None:
        lt = lt.withColumn("_r_seq", F.lit(None).cast(right.schema[right_seq].dataType))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(zip(lt.columns, [f.dataType for f in lt.schema.fields]))[c]))
    rt = rt.select(*lt.columns)
    # right rows sort BEFORE left rows at equal _ts (_is_left 0 < 1), so
    # a right row at exactly left_ts is visible to that left row. A final
    # tiebreaker (caller's right_seq, else the payload values) fixes which
    # of two same-key same-ts right rows wins, so runs are deterministic.
    tiebreak = (
        [F.col("_r_seq")]
        if right_seq is not None
        else [F.col(f"_r_{c}") for c in payload_cols]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_is_left"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_asof_ts"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        within = F.col("_asof_ts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            "*",
            *[
                F.when(within, F.col(f"_asof_{c}")).otherwise(F.lit(None)).alias(f"_tol_{c}")
                for c in payload_cols
            ],
        )
        for c in payload_cols:
            out = out.drop(f"_asof_{c}").withColumnRenamed(f"_tol_{c}", f"_asof_{c}")
    drop = ["_ts", "_is_left", "_r_ts", "_asof_ts", "_r_seq"] + [
        f"_r_{c}" for c in payload_cols
    ]
    for c in drop:
        out = out.drop(c)
    for c in payload_cols:
        out = out.withColumnRenamed(f"_asof_{c}", f"asof_{c}")
    return out


def sessionize(
    events: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from
    the previous event exceeds ``gap``. Classic lag + conditional cumsum —
    two window passes over one shuffle, no state store needed in batch."""
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        F.col(ts_col).cast("timestamp")
        > (F.lag(F.col(ts_col).cast("timestamp")).over(w) + gap_expr)
    )
    return events.select(
        "*",
        F.when(F.lag(ts_col).over(w).isNull() | new_session, 1)
        .otherwise(0)
        .alias("_session_start"),
    ).select(
        *events.columns,
        F.sum("_session_start").over(wrun).cast("int").alias("session_id"),
    )
