"""foreachBatch incremental-rollup sink: micro-batches of orders merge
partial aggregates into a parquet rollup; the final target equals the
from-scratch batch recompute (q164), and replays don't double-count."""

from __future__ import annotations

import os
import shutil

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded, load
from etl_pipeline_candy_store_spark.streaming.rollup_stream import (
    stream_incremental_rollup,
)

SF = "/root/testdata/sf0.001"


def _run(spark, src: str, target: str, ckpt: str) -> None:
    schema = load(spark, SF, "orders").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_incremental_rollup(
            stream, target_path=target, checkpoint_path=ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _rollup_rows(spark, target: str) -> list[tuple]:
    df = spark.read.parquet(target).select(
        "month", "o_orderstatus", "n_orders", "revenue_cents"
    )
    return sorted(map(tuple, df.collect()))


def test_stream_rollup_matches_batch_q164(spark, tmp_path):
    """Streaming the real sf0.001 orders in two micro-batches yields
    byte-identical rollup rows to the batch partial-merge query."""
    _ensure_loaded()
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")

    load(spark, SF, "orders").repartition(2).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))

    batch = REGISTRY["q164_incremental_rollup"].builder(spark, SF)
    expected = sorted(map(tuple, batch.collect()))
    assert _rollup_rows(spark, target) == expected


def test_stream_rollup_replay_does_not_double_count(spark, tmp_path):
    """A sum-merge is not idempotent, so the sink's applied-batch ledger
    must skip redelivered batches: rerunning the whole stream from a
    FRESH checkpoint (every batch id redelivered) leaves the rollup
    unchanged."""
    _ensure_loaded()
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")

    load(spark, SF, "orders").repartition(2).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    first = _rollup_rows(spark, target)

    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert _rollup_rows(spark, target) == first


def test_stream_rollup_recovers_mid_swap_crash(spark, tmp_path):
    """A crash between the swap's renames leaves ``._old`` and no
    target; the next apply restores it and merges only the new batch,
    so no committed counts are lost or double-applied."""
    _ensure_loaded()
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    orders = load(spark, SF, "orders")

    half1 = str(tmp_path / "h1")
    orders.where("o_orderkey % 2 = 0").coalesce(1).write.parquet(half1)
    for f in os.listdir(half1):
        if f.endswith(".parquet"):
            os.makedirs(src, exist_ok=True)
            shutil.copy(os.path.join(half1, f), os.path.join(src, "a.parquet"))
    _run(spark, src, target, str(tmp_path / "ckpt"))

    shutil.move(target, target + "._old")
    assert not os.path.exists(target)

    half2 = str(tmp_path / "h2")
    orders.where("o_orderkey % 2 = 1").coalesce(1).write.parquet(half2)
    for f in os.listdir(half2):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(half2, f), os.path.join(src, "b.parquet"))
    _run(spark, src, target, str(tmp_path / "ckpt"))  # same checkpoint

    batch = REGISTRY["q164_incremental_rollup"].builder(spark, SF)
    expected = sorted(map(tuple, batch.collect()))
    assert _rollup_rows(spark, target) == expected
    assert not os.path.exists(target + "._old")


def test_stream_rollup_bootstrapped_target_without_ledger(spark, tmp_path):
    """A target seeded by an external batch writer has no ``_applied``
    ledger; the sink must treat that as 'no batches applied' and merge
    into it instead of raising on the missing ledger path."""
    _ensure_loaded()
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    orders = load(spark, SF, "orders")

    # externally-seeded rollup: even keys, batch-written, NO ledger
    from etl_pipeline_candy_store_spark.streaming.rollup_stream import (
        _batch_partials,
    )

    _batch_partials(orders.where("o_orderkey % 2 = 0")).write.parquet(target)
    assert not os.path.exists(os.path.join(target, "_applied"))

    # stream the odd keys on top
    orders.where("o_orderkey % 2 = 1").coalesce(1).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))

    batch = REGISTRY["q164_incremental_rollup"].builder(spark, SF)
    expected = sorted(map(tuple, batch.collect()))
    assert _rollup_rows(spark, target) == expected
