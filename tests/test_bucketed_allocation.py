"""Bucketed-input allocation: facts bucketed on the allocation key run
the ST1 operator with ZERO Exchange — the bucket layout (paid once at
write) replaces the operator's keyed repartition, composing round 5's
write_bucketed_table with the allocation family."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.allocation import (
    allocate_sequential,
    restore_auto_bucketed_scan,
)
from etl_pipeline_candy_store_spark.sources.writers import write_bucketed_table

_KW = dict(
    key_col="product_id",
    seq_cols=["seq"],
    qty_col="qty",
    stock_col="stock",
)


def _requests(spark):
    # 40 products x 50 requests, stocks low enough to exhaust mid-stream
    rows = [
        {
            "product_id": p,
            "seq": i,
            "qty": (p * 31 + i * 7) % 5 + 1,
            "stock": 60 + (p % 7) * 10,
        }
        for p in range(40)
        for i in range(50)
    ]
    return spark.createDataFrame(
        rows, "product_id int, seq int, qty int, stock int"
    )


@pytest.fixture(scope="module")
def bucketed_requests(spark):
    write_bucketed_table(
        _requests(spark),
        "b_alloc_requests",
        ["product_id"],
        8,
        sort_cols=["product_id", "seq"],
    )
    yield spark.table("b_alloc_requests")
    spark.sql("DROP TABLE IF EXISTS b_alloc_requests")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_allocation_plans_zero_exchange(spark, bucketed_requests):
    out = allocate_sequential(bucketed_requests, input_partitioned=True, **_KW)
    plan = _plan(out)
    assert "Exchange" not in plan, plan  # the bucket layout IS the shuffle
    assert "MapInPandas" in plan
    # The scan must be GENUINELY bucketed — "no Exchange" alone is also
    # true when DisableUnnecessaryBucketedScan de-buckets the scan, and
    # that variant splits keys across tasks once bucket files exceed
    # maxPartitionBytes (silent corruption at scale).
    assert "Bucketed: true" in plan, plan
    assert (
        spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        ).lower()
        == "false"
    )


def test_non_colocated_input_partitioned_rejected(spark, tmp_path):
    # A plain parquet read is NOT co-located per key: the flag's layout
    # contract is violated and the operator must refuse at build time
    # rather than allocate each key from several independent counters.
    p = str(tmp_path / "plain_requests")
    _requests(spark).write.parquet(p)
    plain = spark.read.parquet(p)
    with pytest.raises(ValueError, match="not provably co-located"):
        allocate_sequential(plain, input_partitioned=True, **_KW)


def test_broadcast_join_does_not_satisfy_contract(spark, tmp_path):
    # Regression: the guard once matched the bare substring "Exchange",
    # which "BroadcastExchange" contains — so an unbucketed fact table
    # broadcast-joined to a dim (the candy pipeline's exact shape)
    # passed the layout check and silently allocated each key from
    # several independent stock counters. A broadcast exchange moves the
    # DIM, not the fact rows; it proves nothing about key co-location
    # and must NOT satisfy the contract.
    p = str(tmp_path / "plain_requests_bj")
    _requests(spark).write.parquet(p)
    dim = spark.createDataFrame(
        [(i, f"p{i}") for i in range(40)], "product_id int, name string"
    )
    joined = spark.read.parquet(p).join(F.broadcast(dim), "product_id")
    assert "BroadcastExchange" in _plan(joined)  # precondition of the bug
    with pytest.raises(ValueError, match="not provably co-located"):
        allocate_sequential(joined, input_partitioned=True, **_KW)


def test_upstream_repartition_satisfies_contract(spark):
    # Co-location via an explicit upstream repartition (no bucketing)
    # is the other legitimate layout; results match the plain path.
    pre = _requests(spark).repartition("product_id")
    got = sorted(
        map(
            tuple,
            allocate_sequential(pre, input_partitioned=True, **_KW).collect(),
        )
    )
    want = sorted(
        map(tuple, allocate_sequential(_requests(spark), **_KW).collect())
    )
    assert got == want


def test_restore_auto_bucketed_scan(spark, bucketed_requests):
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    # building an input_partitioned frame flips the conf off for the
    # session (and consuming it fully is the precondition for restore)
    out = allocate_sequential(bucketed_requests, input_partitioned=True, **_KW)
    out.write.format("noop").mode("overwrite").save()
    assert spark.conf.get(conf).lower() == "false"
    restore_auto_bucketed_scan(spark)
    assert spark.conf.get(conf).lower() == "true"
    # accepts a DataFrame too; leave the module's expected state behind
    spark.conf.set(conf, "false")
    restore_auto_bucketed_scan(out)
    assert spark.conf.get(conf).lower() == "true"
    spark.conf.set(conf, "false")


def test_unbucketed_allocation_still_shuffles(spark):
    out = allocate_sequential(_requests(spark), **_KW)
    assert "Exchange" in _plan(out)


def test_bucketed_allocation_identical_to_unbucketed(spark, bucketed_requests):
    bucketed = sorted(
        map(
            tuple,
            allocate_sequential(
                bucketed_requests, input_partitioned=True, **_KW
            ).collect(),
        )
    )
    plain = sorted(
        map(tuple, allocate_sequential(_requests(spark), **_KW).collect())
    )
    assert bucketed == plain
    # cancellation feedback actually exercised (stocks exhaust)
    assert any(r[-2] == 1 for r in bucketed)
