"""curate(neardup_strategy=...) routes the funnel's near-dedup stage
through the neardup() dispatcher, and the streaming twin mirrors it at
READ time: the same ingested digest-keyed state, re-read under any
detector family, must reproduce the batch funnel's survivors exactly.
The default (None) path stays hash-equal to the historical exact-
Jaccard funnel — covered by the existing stream/batch conformance
tests — so everything here exercises the NON-default routes."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.curation import quality_gate
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.plans.curation_pipeline import (


    assign_split,
    curate,
    dedup_exact,
    dedup_near,
    drop_contaminated,
    drop_repetitive,
)

SF = "/root/testdata/sf0.001"

FAMILIES = [
    "minhash",
    "simhash",
    "winnow",
    "containment_bounded",
    "containment",
    "edit",
    "edit_bounded",
]


def _batch_survivors(spark, family: str) -> set[tuple]:
    """The funnel's stage functions composed directly (curate() minus
    export/governance), with the near-dedup stage on ``family``."""
    docs = load(spark, SF, "documents")
    d1 = dedup_exact(docs)
    d2 = dedup_near(d1, strategy=family)
    gated = quality_gate(d2).filter(F.col("passed") == 1).select("doc_id")
    d3 = d2.join(gated, "doc_id", "left_semi")
    d4 = drop_contaminated(drop_repetitive(d3))
    return {
        (r["doc_id"], r["split"])
        for r in assign_split(d4).select("doc_id", "split").collect()
    }


@pytest.fixture(scope="module")
def curate_state(spark, tmp_path_factory):
    """One ingested stream state shared by every family's read: ingest
    is family-agnostic (texts stored per digest), so choosing the
    detector is a read-time decision over the SAME state."""
    import time

    tmp = tmp_path_factory.mktemp("neardup_strategy")
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        stream_curate,
    )

    docs = load(spark, SF, "documents")
    src = str(tmp / "src")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    for lo, hi in [(0, n_max // 3), (n_max // 3, 2 * n_max // 3), (2 * n_max // 3, n_max)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
    state = str(tmp / "state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_curate(stream, state)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return state


@pytest.mark.parametrize("family", FAMILIES)
def test_stream_read_matches_batch_funnel_per_family(
    spark, curate_state, family
):
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        read_curated,
    )

    got = {
        (r["doc_id"], r["split"])
        for r in read_curated(
            spark, curate_state, neardup_strategy=family
        ).collect()
    }
    want = _batch_survivors(spark, family)
    assert want, f"{family}: batch funnel produced no survivors"
    assert got == want


def test_stream_read_auto_matches_batch_auto(spark, curate_state):
    """auto resolves over the keeper corpus on both sides (long clean
    synthetic docs -> minhash) and the survivor sets agree."""
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        read_curated,
    )

    got = {
        (r["doc_id"], r["split"])
        for r in read_curated(
            spark, curate_state, neardup_strategy="auto"
        ).collect()
    }
    assert got == _batch_survivors(spark, "minhash")


def test_curate_records_resolved_family(spark, tmp_path):
    """Full curate() end-to-end with a forced family and with auto:
    the report carries the RESOLVED family (auto -> minhash on this
    corpus), the funnels agree, and the export matches the stage
    composition."""
    r_forced = curate(
        spark, SF, str(tmp_path / "forced"), n_shards=2,
        neardup_strategy="minhash",
    )
    assert r_forced["near_dup_family"] == "minhash"
    r_auto = curate(
        spark, SF, str(tmp_path / "auto"), n_shards=2,
        neardup_strategy="auto",
    )
    assert r_auto["near_dup_family"] == "minhash"
    assert r_auto["funnel"] == r_forced["funnel"]
    exported = sum(s["n_docs"] for s in r_forced["splits"].values())
    assert exported == len(_batch_survivors(spark, "minhash"))


def test_default_family_recorded_as_jaccard(spark, tmp_path):
    report = curate(spark, SF, str(tmp_path / "default"), n_shards=2)
    assert report["near_dup_family"] == "jaccard"


def test_state_dir_conflicts_with_strategy(spark, tmp_path):
    with pytest.raises(ValueError, match="Jaccard family only"):
        curate(
            spark,
            SF,
            str(tmp_path / "x"),
            corpus_state_dir=str(tmp_path / "st"),
            neardup_strategy="minhash",
        )
