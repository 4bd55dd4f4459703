"""Bucketed co-located joins: the write-once-shuffle-never primitive.

Two fact tables bucketed on the same key with the same bucket count
must join WITHOUT an Exchange on either side — the bucket layout
replaces the runtime shuffle, which at 100 TB turns every recurring
fact-fact join from a full network redistribution into a local merge.
"""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.sources.writers import write_bucketed_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8,
                         sort_cols=["o_orderkey"])
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8,
                         sort_cols=["l_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_elides_all_exchanges(spark, bucketed_tables):
    # the merge hint models the 100 TB shape — BOTH sides too large to
    # broadcast (at sf0.001 the optimizer would broadcast the small
    # side, hiding exactly the shuffle this layout exists to kill)
    j = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # the bucket layout IS the shuffle


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_tables):
    bucketed = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    plain = (
        load(spark, SF, "lineitem")
        .join(
            load(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    got = {(r["l_orderkey"], r["n"], r["qty"]) for r in bucketed.collect()}
    want = {(r["l_orderkey"], r["n"], r["qty"]) for r in plain.collect()}
    assert got == want


def test_bucketed_aggregation_also_shuffle_free(spark, bucketed_tables):
    # a groupBy on the bucket key needs no Exchange either — bucketing
    # pre-distributes exactly the hash partitioning the aggregate wants
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty")
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
