"""Dead-letter VARIANT ingestion (streaming/ingest_stream.py):
malformed JSON routes to quarantine with its raw payload, good rows
shred typed fields, the union loses nothing, and replays are
idempotent via batch-scoped overwrites."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.streaming.ingest_stream import (


    read_route,
    stream_variant_ingest,
)

ROWS = [
    (1, '{"k": 5, "lang": "en"}'),
    (2, '{"k": "12"}'),            # string-coded int still shreds
    (3, "\x00not json"),           # -> quarantine
    (4, '{"other": true}'),        # parses; k is NULL (absence != failure)
    (5, "{broken"),                # -> quarantine
    (6, '{"k": -3, "lang": "fr"}'),
]

FIELDS = {"k": ("$.k", "int"), "lang": ("$.lang", "string")}


def _run(spark, src: str, state: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("id long, props string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_variant_ingest(stream, state, text_col="props", fields=FIELDS)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(120)


def test_ingest_routes_and_loses_nothing(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    spark.createDataFrame(ROWS, "id long, props string").repartition(
        2
    ).write.parquet(src)
    _run(spark, src, state, str(tmp_path / "ckpt"))

    good = {
        r["id"]: (r["k"], r["lang"])
        for r in read_route(spark, state, "good").collect()
    }
    assert good == {1: (5, "en"), 2: (12, None), 4: (None, None), 6: (-3, "fr")}

    bad = {
        r["id"]: (r["raw_payload"], r["reason"])
        for r in read_route(spark, state, "quarantine").collect()
    }
    assert set(bad) == {3, 5}
    assert bad[5] == ("{broken", "unparseable_json")  # re-processable

    n_good = read_route(spark, state, "good").count()
    n_bad = read_route(spark, state, "quarantine").count()
    assert n_good + n_bad == len(ROWS)


def test_ingest_replay_idempotent(spark, tmp_path):
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    spark.createDataFrame(ROWS, "id long, props string").repartition(
        2
    ).write.parquet(src)
    _run(spark, src, state, str(tmp_path / "ckpt1"))
    first = sorted(
        map(tuple, read_route(spark, state, "good").collect())
    ), sorted(map(tuple, read_route(spark, state, "quarantine").collect()))
    # fresh checkpoint redelivers every batch; batch-scoped overwrites
    # must leave both routes unchanged
    _run(spark, src, state, str(tmp_path / "ckpt2"))
    second = sorted(
        map(tuple, read_route(spark, state, "good").collect())
    ), sorted(map(tuple, read_route(spark, state, "quarantine").collect()))
    assert first == second


def test_ingest_null_payload_is_absence_not_malformation(spark, tmp_path):
    """A NULL payload passes to the good route with NULL shredded fields
    (absence is data); only a NON-NULL unparseable payload quarantines.
    try_parse_json(NULL) is NULL, so a _v-only filter would wrongly
    quarantine rows that never had a payload."""
    from etl_pipeline_candy_store_spark.streaming.ingest_stream import (
        apply_variant_ingest_batch,
    )

    batch = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, None), (3, "{broken")],
        "id long, props string",
    )
    out = str(tmp_path / "ingest")
    apply_variant_ingest_batch(
        batch, out, 0, fields={"k": ("$.k", "int")}
    )
    good = {r["id"]: r["k"] for r in spark.read.parquet(f"{out}/good").collect()}
    bad = [r["id"] for r in spark.read.parquet(f"{out}/quarantine").collect()]
    assert good == {1: 7, 2: None}
    assert bad == [3]
