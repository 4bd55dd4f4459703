"""Table/column statistics for cost-based optimization (CBO).

At 100 TB the optimizer's size estimates decide shuffles: without
statistics, Spark costs a Filter at its CHILD's size (no selectivity
reduction), so a 5 TB dimension filtered to 50 MB still plans as a
sort-merge join — the fact table shuffles for nothing. With table +
column stats (`ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS]`)
and `spark.sql.cbo.enabled`, the estimate becomes rowCount/ndv-based:
the filtered dim costs ~|rows|/ndv rows, drops under the broadcast
threshold, and the join plans broadcast with zero fact-side shuffle
(`tests/test_cbo_stats.py` locks the SMJ→BHJ flip and the estimate).

This is the maintenance pass that keeps join planning honest on catalog
tables; it complements AQE, which can only re-plan at runtime stage
boundaries AFTER a shuffle was already emitted, while CBO removes the
shuffle from the plan up front. Statistics live in the metastore, so
they apply only to catalog tables (`saveAsTable` /
`write_bucketed_table`), not bare-path reads.

The reference has no optimizer at all (driver-side Python loops); this
file exists for the engine's own scale posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def analyze_table(
    spark: SparkSession,
    table: str,
    columns: list[str] | str | None = "all",
) -> None:
    """Compute and persist optimizer statistics for a catalog table.

    ``columns``: ``"all"`` (default) computes table stats + min/max/ndv/
    null-count for every column — run this on DIMENSION tables, whose
    filters gate join strategy; a list restricts to named columns (the
    ones that appear in filters/joins — cheaper on wide tables); ``None``
    computes table-level stats only (sizeInBytes/rowCount — enough for
    unfiltered broadcast decisions, useless for selectivity).

    Cost: one scan of the table (ndv via HyperLogLog++, no exact
    distinct). Re-run after significant appends; stale stats mislead
    the optimizer exactly as confidently as fresh ones guide it.
    """
    if columns == "all":
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")
    elif columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


def estimated_stats(df: DataFrame) -> dict:
    """The optimizer's own cost estimate for ``df``'s plan:
    ``{"size_in_bytes": int, "row_count": int | None}``. row_count is
    populated only under CBO with analyzed inputs — exactly the signal
    that distinguishes "the optimizer knows" from "the optimizer is
    guessing from file sizes"; use it in tests and capacity checks."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    # py4j may hand back scala.math.BigInt or an already-converted int
    return {
        "size_in_bytes": int(str(stats.sizeInBytes())),
        "row_count": int(str(rc.get())) if rc.isDefined() else None,
    }
