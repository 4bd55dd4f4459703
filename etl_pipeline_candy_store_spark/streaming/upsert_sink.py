"""Streaming CDC apply: a ``foreachBatch`` sink that upserts each
micro-batch into a parquet target — the incremental counterpart of the
batch MERGE operator (operators/merge.py, oracle q38).

Shape: per micro-batch, (1) collapse the batch to its LAST update per
key (deterministic: max ``seq_col``, ties impossible when seq is a
true version column), (2) ``merge_upsert`` against the current target
(one left-anti shuffle on the keys + union), (3) rewrite the target via
write-temp-then-rename using the Hadoop FileSystem API, so the swap is
a metadata operation on HDFS-like stores rather than a copy.

Exactly-once posture: Structured Streaming's checkpoint gives
at-least-once delivery of each micro-batch to ``foreachBatch``; the
apply is idempotent per batch (re-merging the same updates yields the
same target), so replays after a crash converge — the standard
foreachBatch contract. On a real cluster you would point this at a
transactional table format (Delta/Iceberg MERGE) to get concurrent
readers; the micro-batch mechanics — batch-local dedup, key-join merge,
atomic swap — are identical, and this implementation keeps the whole
path on the builtin parquet source so it has zero extra dependencies.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.operators.merge import merge_upsert


def _fs_swap(spark, tmp: str, target: str) -> None:
    """Replace ``target`` with ``tmp`` through the Hadoop FileSystem API
    (FS-agnostic: local, HDFS, s3a all honor delete+rename)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI.create(target)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
    target_p = jvm.org.apache.hadoop.fs.Path(target)
    if fs.exists(target_p):
        fs.delete(target_p, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), target_p)


def _last_per_key(batch: DataFrame, keys: Sequence[str], seq_col: str) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_upsert_sink(
    update_stream: DataFrame,
    *,
    target_path: str,
    checkpoint_path: str,
    keys: Sequence[str],
    seq_col: str,
):
    """Attach a foreachBatch upsert sink to ``update_stream``; returns
    the (unstarted) ``DataStreamWriter``. The target parquet dir holds
    exactly one row per key — the latest by ``seq_col`` — after every
    processed batch."""
    keys = list(keys)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        updates = _last_per_key(batch, keys, seq_col)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI.create(target_path), conf
        )
        if fs.exists(jvm.org.apache.hadoop.fs.Path(target_path)):
            target = spark.read.parquet(target_path)
            # cross-batch "latest wins" needs the target's own seq too:
            # an out-of-order replayed batch must not clobber newer rows
            older = target.join(
                updates.select(*keys, F.col(seq_col).alias("_new_seq")), keys, "inner"
            ).filter(F.col(seq_col) >= F.col("_new_seq"))
            effective = updates.join(older.select(*keys), keys, "left_anti")
            merged = merge_upsert(target, effective, keys)
        else:
            merged = updates
        tmp = target_path.rstrip("/") + f"._tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        _fs_swap(spark, tmp, target_path)

    return (
        update_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
