"""CBO statistics surface (sources/stats.py): ANALYZE'd column stats +
spark.sql.cbo.enabled turn a filtered-dimension join from sort-merge
(both sides shuffle) into broadcast (zero fact-side shuffle) — because
the optimizer can finally cost the Filter at ~rows/ndv instead of at
its child's full size. The up-front complement to AQE, which only
re-plans after a shuffle already exists."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.sources.stats import (
    analyze_table,
    estimated_stats,
)

_BIG = "cbo_t_big"
_FACT = "cbo_t_fact"
_GROUPS = 200
_BIG_ROWS = 300_000


@pytest.fixture(scope="module")
def cbo_tables(spark):
    # big: ~5MB parquet (over the 1MB broadcast threshold forced below),
    # 200-way selective filter column; fact: joins big on k
    spark.range(_BIG_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % _GROUPS).cast("int").alias("grp"),
        F.concat(F.lit("x" * 30), F.col("id").cast("string")).alias("pad"),
    ).write.mode("overwrite").saveAsTable(_BIG)
    spark.range(1_000_000).select(
        (F.col("id") % _BIG_ROWS).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").saveAsTable(_FACT)
    yield
    spark.sql(f"DROP TABLE IF EXISTS {_BIG}")
    spark.sql(f"DROP TABLE IF EXISTS {_FACT}")


@pytest.fixture()
def cbo_confs(spark):
    keys = ("spark.sql.cbo.enabled", "spark.sql.autoBroadcastJoinThreshold")
    saved = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _join_plan(spark) -> str:
    j = spark.table(_FACT).join(
        spark.table(_BIG).where(F.col("grp") == 7), "k"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    return buf.getvalue()


def test_column_stats_flip_smj_to_broadcast(spark, cbo_tables, cbo_confs):
    # without stats the Filter is costed at the table's full ~5MB (no
    # selectivity reduction) -> sort-merge join
    before = _join_plan(spark)
    assert "SortMergeJoin" in before and "BroadcastHashJoin" not in before
    analyze_table(spark, _BIG)  # FOR ALL COLUMNS
    analyze_table(spark, _FACT, columns=None)  # table-level only
    after = _join_plan(spark)
    assert "BroadcastHashJoin" in after and "SortMergeJoin" not in after
    # and the answer is strategy-independent
    got = (
        spark.table(_FACT)
        .join(spark.table(_BIG).where(F.col("grp") == 7), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]["n"]
    )
    # fact holds k in [0, BIG_ROWS) repeated; BIG_ROWS/GROUPS keys match
    # grp==7, each appearing 1_000_000/BIG_ROWS times... compute directly:
    want = sum(
        (1_000_000 + (_BIG_ROWS - 1 - k)) // _BIG_ROWS
        for k in range(7, _BIG_ROWS, _GROUPS)
    )
    assert got == want


def test_estimated_rowcount_tracks_ndv(spark, cbo_tables, cbo_confs):
    # after FOR ALL COLUMNS, the filter estimate is ~rows/ndv — the
    # number that made the broadcast decision above; without CBO the
    # estimate has no row count at all (size-only guessing)
    analyze_table(spark, _BIG)
    est = estimated_stats(spark.table(_BIG).where(F.col("grp") == 7))
    truth = _BIG_ROWS // _GROUPS
    assert est["row_count"] is not None
    assert truth // 2 <= est["row_count"] <= truth * 2, est
    spark.conf.set("spark.sql.cbo.enabled", "false")
    est_off = estimated_stats(spark.table(_BIG).where(F.col("grp") == 7))
    assert est_off["row_count"] is None
