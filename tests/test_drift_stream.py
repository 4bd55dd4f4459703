"""foreachBatch drift-monitor sink: micro-batches of documents merge
per-(source, token) counts into a parquet state; the TVD report derived
from the state equals batch q231 exactly — for any arrival order — and
replays don't double-count."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from etl_pipeline_candy_store_spark.plans.catalog import (
    REGISTRY,
    _ensure_loaded,
    load,
)
from etl_pipeline_candy_store_spark.streaming.drift_stream import (


    read_divergence,
    stream_token_counts,
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
        stream_token_counts(stream, target_path=target, checkpoint_path=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _report(spark, target: str) -> dict[str, int]:
    return {
        r["source"]: r["tvd_ppm"]
        for r in read_divergence(spark, target).collect()
    }


def _batch_report(spark) -> dict[str, int]:
    _ensure_loaded()
    df = REGISTRY["q231_source_divergence"].builder(spark, SF)
    return {r["source"]: r["tvd_ppm"] for r in df.collect()}


def test_stream_drift_matches_batch_q231(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    assert _report(spark, target) == _batch_report(spark)


def test_stream_drift_arrival_order_independent(spark, tmp_path):
    """Feeding the corpus grouped BY SOURCE (each early batch is one
    source's docs — the worst case for any mid-stream judgment) still
    converges to the identical final report."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    d = load(spark, SF, "documents")
    d.repartition(4, "source").write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    assert _report(spark, target) == _batch_report(spark)


def test_stream_drift_replay_does_not_double_count(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    state1 = sorted(map(tuple, spark.read.parquet(target).collect()))
    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == state1
