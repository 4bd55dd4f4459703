"""foreachBatch CDC-apply sink: micro-batches of keyed updates upsert
into a parquet target; latest seq wins within and across batches."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

import json
import os

from etl_pipeline_candy_store_spark.streaming.upsert_sink import stream_upsert_sink
from pyspark.sql.types import (


    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("k", IntegerType(), False),
        StructField("v", StringType(), True),
        StructField("seq", LongType(), False),
    ]
)


def _write_batch(src_dir: str, name: str, rows: list[dict]) -> None:
    # one json-lines file per micro-batch (maxFilesPerTrigger=1)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_upsert_latest_wins(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: initial keys; k=2 updated twice inside the SAME batch
    _write_batch(
        str(src),
        "b1.json",
        [
            {"k": 1, "v": "a", "seq": 10},
            {"k": 2, "v": "b", "seq": 10},
            {"k": 2, "v": "b2", "seq": 11},
        ],
    )
    # batch 2 (lexicographically later file): k=1 updated, k=3 inserted,
    # and a STALE replay of k=2 (seq 5) that must NOT clobber seq 11
    _write_batch(
        str(src),
        "b2.json",
        [
            {"k": 1, "v": "a2", "seq": 20},
            {"k": 3, "v": "c", "seq": 20},
            {"k": 2, "v": "stale", "seq": 5},
        ],
    )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_upsert_sink(
            stream,
            target_path=target,
            checkpoint_path=ckpt,
            keys=["k"],
            seq_col="seq",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["k"]: (r["v"], r["seq"])
        for r in spark.read.parquet(target).collect()
    }
    assert got == {1: ("a2", 20), 2: ("b2", 11), 3: ("c", 20)}


def test_stream_upsert_idempotent_reapply(spark, tmp_path):
    """Replaying the same batch (crash-recovery at-least-once) leaves
    the target unchanged — the foreachBatch idempotence contract."""
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")

    _write_batch(
        str(src), "b1.json", [{"k": 1, "v": "a", "seq": 10}, {"k": 2, "v": "b", "seq": 10}]
    )

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            stream_upsert_sink(
                stream,
                target_path=target,
                checkpoint_path=ckpt,
                keys=["k"],
                seq_col="seq",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))
    first = sorted(map(tuple, spark.read.parquet(target).collect()))
    # fresh checkpoint => the same file is delivered again as a new batch
    run(str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == first


def test_stream_upsert_recovers_mid_swap_crash(spark, tmp_path):
    """A crash between the swap's two renames leaves ``<target>._old``
    and no ``target``; the next batch apply must restore the previous
    version before merging, so no previously-committed key is lost."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")

    _write_batch(
        str(src), "b1.json", [{"k": 1, "v": "a", "seq": 10}, {"k": 2, "v": "b", "seq": 10}]
    )

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            stream_upsert_sink(
                stream,
                target_path=target,
                checkpoint_path=ckpt,
                keys=["k"],
                seq_col="seq",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt1"))

    # simulate the crash window: target renamed aside, new version never
    # arrived (the batch that was mid-apply will be redelivered)
    shutil.move(target, target + "._old")
    assert not os.path.exists(target)

    _write_batch(str(src), "b2.json", [{"k": 3, "v": "c", "seq": 20}])
    run(str(tmp_path / "ckpt1"))  # SAME checkpoint: only b2 is new

    got = {
        r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(target).collect()
    }
    # k=1/k=2 came back via recovery, k=3 merged on top
    assert got == {1: ("a", 10), 2: ("b", 10), 3: ("c", 20)}
    assert not os.path.exists(target + "._old")
