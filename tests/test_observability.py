"""observe()-based quality accounting: gate drop counts measured on the
same pass as the action, batch and per-micro-batch."""

from __future__ import annotations

from etl_pipeline_candy_store_spark.plans.observability import (
    observe_stream_gate,
    observed_null_gate,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, None, 20.0),
            (3, "c", None),
            (4, None, None),
            (5, "e", 50.0),
        ],
        "id int, name string, qty double",
    )


def test_batch_observation_accounts_for_gate_drops(spark):
    df = _frame(spark)
    clean, obs = observed_null_gate(df, ["name", "qty"])
    n_clean = clean.count()  # the ONLY action — metrics ride along
    assert n_clean == 2
    got = obs.get
    assert got["n_total"] == 5
    assert got["n_null_name"] == 2
    assert got["n_null_qty"] == 2
    # derived drop count: total - clean, explained by the null columns
    assert got["n_total"] - n_clean == 3


def test_stream_observed_metrics_per_batch(spark, tmp_path):
    df = _frame(spark)
    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    gated = observe_stream_gate(stream, "gate", ["name", "qty"])
    q = (
        gated.writeStream.format("memory")
        .queryName("gate_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    progresses = [p for p in q.recentProgress if p["numInputRows"] > 0]
    metrics = [p["observedMetrics"]["gate"] for p in progresses]
    assert len(metrics) == 2  # one per micro-batch file
    assert sum(m["n_total"] for m in metrics) == 5
    assert sum(m["n_null_name"] for m in metrics) == 2
    assert sum(m["n_null_qty"] for m in metrics) == 2
    # and the gated output really dropped those rows
    assert spark.sql("select count(*) n from gate_stream").collect()[0]["n"] == 2
