"""State-partition pinning: a stateful stream's partition count is fixed
by ``spark.sql.shuffle.partitions`` AT FIRST START and recorded in the
checkpoint's offset log; restarting with a different conf silently keeps
the original. This is a 100 TB ops trap worth pinning in a test: you
cannot re-size streaming state by editing the conf — scaling state
parallelism requires a new checkpoint (replay/backfill) or an offline
state-repartition tool. Size the conf for TARGET scale before the first
production start.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_CONF = "spark.sql.shuffle.partitions"


def _state_partition_dirs(ckpt: str) -> list[str]:
    root = os.path.join(ckpt, "state", "0")
    return sorted(
        d
        for d in os.listdir(root)
        if d.isdigit() and os.path.isdir(os.path.join(root, d))
    )


def _run_counts(spark, src: str, ckpt: str, schema) -> dict[str, int]:
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName("pinned_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        r["k"]: r["n"] for r in spark.sql("select * from pinned_counts").collect()
    }


def test_restart_keeps_first_run_state_partitioning(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    batch1 = spark.createDataFrame(
        [(f"k{i % 5}", i) for i in range(40)], "k string, v int"
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    saved = spark.conf.get(_CONF)
    try:
        spark.conf.set(_CONF, "3")
        counts1 = _run_counts(spark, src, ckpt, batch1.schema)
        assert counts1 == {f"k{i}": 8 for i in range(5)}
        assert _state_partition_dirs(ckpt) == ["0", "1", "2"], (
            "first start must lay out one state dir per shuffle partition"
        )

        # "scale up" by conf alone — the restart must silently keep 3
        spark.conf.set(_CONF, "7")
        spark.createDataFrame(
            [(f"k{i % 5}", i) for i in range(20)], "k string, v int"
        ).coalesce(1).write.mode("append").parquet(src)
        counts2 = _run_counts(spark, src, ckpt, batch1.schema)
        assert counts2 == {f"k{i}": 12 for i in range(5)}, (
            "results stay correct across the restart"
        )
        assert _state_partition_dirs(ckpt) == ["0", "1", "2"], (
            "restart with a larger conf must NOT re-partition existing state"
        )
    finally:
        spark.conf.set(_CONF, saved)
