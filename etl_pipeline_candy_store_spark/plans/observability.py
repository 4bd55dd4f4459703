"""Pipeline observability via ``Dataset.observe``: quality accounting
(row counts, null counts, value totals) collected DURING the normal
action, not by a second scan.

Why this matters at 100 TB: the naive way to answer "how many rows did
validation drop this batch" is a separate ``count()`` per gate — each
one a full re-scan (or a cached copy held hot). ``observe`` attaches
aggregate expressions to a point IN the plan; Spark accumulates them on
the executors while the real action runs and delivers them to the
driver afterwards — zero extra passes, zero caching. Batch queries read
them from an ``Observation`` handle; streaming queries surface them per
micro-batch in ``StreamingQueryProgress.observedMetrics`` (the hook a
monitoring agent tails).

The expressions must be aggregates over the observed point's rows
(count/sum/min/max/...); per-row results are not available — this is an
accounting channel, not a side output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _gate_metrics(required_cols: Sequence[str]) -> list:
    """n_total plus a null count per required column — enough to derive
    exactly how many rows the null gate will drop and why."""
    exprs = [F.count(F.lit(1)).alias("n_total")]
    for c in required_cols:
        exprs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return exprs


def observed_null_gate(
    df: DataFrame, required_cols: Sequence[str]
) -> tuple[DataFrame, Observation]:
    """The validation gate with free drop accounting: returns
    ``(clean, obs)`` where ``clean`` keeps rows with every required
    column present, and ``obs.get`` (valid after any action on
    ``clean``) reports the pre-gate totals and per-column null counts —
    measured on the SAME pass that computed the action."""
    required_cols = list(required_cols)
    obs = Observation("null_gate")
    observed = df.observe(obs, *_gate_metrics(required_cols))
    clean = observed.dropna(subset=required_cols)
    return clean, obs


def observe_stream_gate(
    stream_df: DataFrame, name: str, required_cols: Sequence[str]
) -> DataFrame:
    """Streaming form: attach the same gate metrics under ``name``;
    each micro-batch's values appear in that batch's
    ``StreamingQueryProgress.observedMetrics[name]``. Returns the
    stream with the null gate applied."""
    required_cols = list(required_cols)
    observed = stream_df.observe(name, *_gate_metrics(required_cols))
    return observed.dropna(subset=required_cols)
