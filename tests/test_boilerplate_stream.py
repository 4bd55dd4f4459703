"""foreachBatch boilerplate sink: micro-batches of documents merge
per-segment-digest document frequencies into a parquet state; the
scrub derived from the state equals the batch scrub_boilerplate exactly
— for any batch split — and replays don't double-count."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
    scrub_boilerplate,
)
from etl_pipeline_candy_store_spark.streaming.boilerplate_stream import (


    read_scrubbed,
    stream_segment_counts,
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
        stream_segment_counts(stream, target_path=target, checkpoint_path=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _scrub_result(spark, target: str) -> set[tuple]:
    docs = load(spark, SF, "documents")
    return {
        (r["doc_id"], r["text"], r["n_chars"])
        for r in read_scrubbed(spark, target, docs).collect()
    }


def test_stream_scrub_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    docs = load(spark, SF, "documents")
    docs.repartition(4).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    want = {
        (r["doc_id"], r["text"], r["n_chars"])
        for r in scrub_boilerplate(docs).collect()
    }
    assert _scrub_result(spark, target) == want
    # the corpus HAS boilerplate at sf0.001 or the equality is vacuous:
    # at least one doc must have been rewritten or dropped
    original = {
        (r["doc_id"], r["text"], r["n_chars"]) for r in docs.collect()
    }
    assert _scrub_result(spark, target) != original


def test_stream_scrub_state_is_exact_df(spark, tmp_path):
    """State equals the from-scratch per-segment-digest doc frequency
    (the invariant the scrub derives from) — safe to SUM per-batch
    partials because a doc's segments all arrive in one batch."""
    import pyspark.sql.functions as F

    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _segments,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    docs = load(spark, SF, "documents")
    docs.repartition(4).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    want = sorted(
        map(
            tuple,
            _segments(docs.select("doc_id", "text"))
            .select(
                F.unhex(F.md5(F.col("seg_text").cast("binary"))).alias("sh"),
                "doc_id",
            )
            .groupBy("sh")
            .agg(F.countDistinct("doc_id").cast("long").alias("df"))
            .collect(),
        )
    )
    got = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert got == want


def test_stream_scrub_replay_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    state1 = sorted(map(tuple, spark.read.parquet(target).collect()))
    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == state1
