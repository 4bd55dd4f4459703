"""foreachBatch SimHash signature sink: micro-batches of documents
merge per-doc signatures into a parquet state; the bounded pair
relation derived from the state equals batch q245 exactly — for EVERY
arrival order — and replays don't duplicate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded, load
from etl_pipeline_candy_store_spark.streaming.simhash_stream import (


    read_simhash_pairs,
    stream_simhash_signatures,
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
        stream_simhash_signatures(
            stream, target_path=target, checkpoint_path=ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _batch_pairs(spark) -> set[tuple]:
    _ensure_loaded()
    return {
        tuple(r)
        for r in REGISTRY["q245_simhash_neardup_bounded"]
        .builder(spark, SF)
        .collect()
    }


def test_stream_pairs_match_batch_q245(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(4).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    want = _batch_pairs(spark)
    assert want  # non-vacuous: the template-dense corpus HAS pairs
    got = {tuple(r) for r in read_simhash_pairs(spark, target).collect()}
    assert got == want


def test_stream_state_arrival_order_independent(spark, tmp_path):
    """Adversarial arrival permutation: ascending vs descending vs
    single-batch — identical final state and identical derived pairs.
    Order matters MORE here than for count twins: the bucket cap keeps
    the cap-smallest doc_ids, so a late batch carrying SMALL doc_ids
    must still displace larger ones at read time."""
    import pyspark.sql.functions as F

    docs = load(spark, SF, "documents")
    states, pairs = [], []
    for tag, frame in (
        ("asc", docs.repartitionByRange(5, F.col("doc_id"))),
        ("desc", docs.repartitionByRange(5, F.col("doc_id").desc())),
        ("one", docs.coalesce(1)),
    ):
        src = str(tmp_path / f"src_{tag}")
        target = str(tmp_path / f"target_{tag}")
        frame.write.parquet(src)
        _run(spark, src, target, str(tmp_path / f"ckpt_{tag}"))
        states.append(sorted(map(tuple, spark.read.parquet(target).collect())))
        pairs.append(
            sorted(map(tuple, read_simhash_pairs(spark, target).collect()))
        )
    assert states[0] == states[1] == states[2]
    assert pairs[0] == pairs[1] == pairs[2]
    assert set(map(tuple, pairs[0])) == set(map(tuple, _batch_pairs(spark)))


def test_stream_state_is_exact_signatures(spark, tmp_path):
    """State equals the from-scratch per-doc signature relation — the
    append-only invariant every derivation rests on."""
    from etl_pipeline_candy_store_spark.operators.dedup import _simhash_df

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    docs = load(spark, SF, "documents")
    docs.repartition(4).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))
    want = sorted(
        map(tuple, _simhash_df(docs.select("doc_id", "text"), 32).collect())
    )
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == want


def test_stream_replay_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    load(spark, SF, "documents").repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt1"))
    state1 = sorted(map(tuple, spark.read.parquet(target).collect()))
    _run(spark, src, target, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == state1


def test_purge_docs_physical_forget(spark, tmp_path):
    """doc_id-keyed signature state purges by id: state and derived
    pairs equal a from-scratch run over the remaining docs; re-purge is
    a no-op."""
    import pyspark.sql.functions as F

    from etl_pipeline_candy_store_spark.operators.dedup import (
        simhash_pairs_bounded,
    )
    from etl_pipeline_candy_store_spark.streaming.simhash_stream import (
        purge_docs,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    docs = load(spark, SF, "documents")
    docs.repartition(3).write.parquet(src)
    _run(spark, src, target, str(tmp_path / "ckpt"))

    victims = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    assert purge_docs(spark, target, victims) == victims.count()
    remaining = docs.filter(F.col("doc_id") % 2 == 1)
    got = {tuple(r) for r in read_simhash_pairs(spark, target).collect()}
    want = {
        tuple(r)
        for r in simhash_pairs_bounded(
            remaining.select("doc_id", "text")
        ).collect()
    }
    assert got == want
    assert purge_docs(spark, target, victims) == 0


def test_purge_survives_redelivery(spark, tmp_path):
    """ADVICE r15: an at-least-once redelivery of PURGED documents must
    not re-insert their signatures through the min-merge (the purge
    removed the rows, so the state alone cannot recognize them). The
    _purged_docs tombstones make the purge durable: after redelivery
    the state and derived pairs still equal a from-scratch run over
    the remaining corpus."""
    import pyspark.sql.functions as F

    from etl_pipeline_candy_store_spark.operators.dedup import (
        simhash_pairs_bounded,
    )
    from etl_pipeline_candy_store_spark.streaming.simhash_stream import (
        purge_docs,
    )

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    docs = load(spark, SF, "documents")
    docs.coalesce(2).write.parquet(src)
    _run(spark, src, target, ckpt)

    victims = docs.filter(F.col("doc_id") % 2 == 0)
    assert purge_docs(spark, target, victims.select("doc_id")) > 0
    victims.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, target, ckpt)

    state = spark.read.parquet(target)
    assert (
        state.join(victims.select("doc_id"), "doc_id", "left_semi").count()
        == 0
    )
    remaining = docs.filter(F.col("doc_id") % 2 == 1)
    got = {tuple(r) for r in read_simhash_pairs(spark, target).collect()}
    want = {
        tuple(r)
        for r in simhash_pairs_bounded(
            remaining.select("doc_id", "text")
        ).collect()
    }
    assert got == want
