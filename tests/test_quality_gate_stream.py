"""foreachBatch quality-gate histogram sink: micro-batches of documents
merge per-(source, score) counts into a parquet state; the gate derived
from the state equals the batch q232 histogram gate exactly — for ANY
arrival order — and replays don't double-count."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from etl_pipeline_candy_store_spark.plans.catalog import (
    REGISTRY,
    _ensure_loaded,
    load,
)
from etl_pipeline_candy_store_spark.streaming.quality_gate_stream import (


    read_gated,
    stream_quality_histogram,
)

SF = "/root/testdata/sf0.001"


def _run(spark, src: str, target: str, ckpt: str) -> None:
    schema = load(spark, SF, "documents").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_quality_histogram(
            stream, target_path=target, checkpoint_path=ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _gated_rows(spark, target: str) -> set[tuple]:
    docs = load(spark, SF, "documents").select("doc_id", "source", "text")
    return {
        (r["doc_id"], r["source"], r["bin"])
        for r in read_gated(spark, target, docs).collect()
    }


def _batch_rows(spark) -> set[tuple]:
    _ensure_loaded()
    df = REGISTRY["q232_quality_histogram_gate"].builder(spark, SF)
    return {(r["doc_id"], r["source"], r["bin"]) for r in df.collect()}


def test_stream_gate_matches_batch_q232(spark, tmp_path):
    """Streaming the sf0.001 documents in micro-batches yields a state
    whose derived gate equals the batch histogram gate exactly."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    assert _gated_rows(spark, target) == _batch_rows(spark)


def test_stream_gate_arrival_order_independent(spark, tmp_path):
    """The same corpus fed in a deliberately adversarial order — sorted
    so early batches see only the LOW-score docs (thresholds derived
    mid-stream would differ wildly) — converges to the identical final
    gate, because the state is a pure mergeable count relation."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    d = load(spark, SF, "documents").withColumn(
        "score", F.size(F.split("text", " "))
    )
    # 4 files, ascending score: batch 1 is all bottom-quartile docs
    d.orderBy("score", "doc_id").drop("score").coalesce(1).write.parquet(
        str(tmp_path / "sorted")
    )
    sorted_df = spark.read.parquet(str(tmp_path / "sorted"))
    sorted_df.withColumn(
        "b", F.monotonically_increasing_id() % 4
    ).repartitionByRange(4, "b").drop("b").write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    assert _gated_rows(spark, target) == _batch_rows(spark)


def test_stream_gate_replay_does_not_double_count(spark, tmp_path):
    """Count-merge is not idempotent; the applied-batch ledger must skip
    redelivered batches: rerunning the whole stream from a fresh
    checkpoint leaves the state (and the derived gate) unchanged."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    state1 = sorted(
        map(tuple, spark.read.parquet(target).collect())
    )
    first = _gated_rows(spark, target)
    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == state1
    assert _gated_rows(spark, target) == first


def test_stream_gate_state_is_exact_histogram(spark, tmp_path):
    """The state equals the from-scratch per-(source, score) counts —
    the invariant everything else derives from."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    d = load(spark, SF, "documents")
    d.repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    expected = sorted(
        map(
            tuple,
            d.select(
                "source",
                F.size(F.split("text", " ")).cast("long").alias("score"),
            )
            .groupBy("source", "score")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(target)
            .select("source", "score", "cnt")
            .collect(),
        )
    )
    assert got == expected
