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
- band/set state and emitted pairs land in parquet partitioned by
  ``batch=N``, so state is bounded by corpus size (not stream length)
  and every write is scoped to its micro-batch.

Exactly-once emission, including under crash replay: a pair is produced
only in the micro-batch where its LATER endpoint arrives (the probe
side is strictly new docs), in-batch mirror candidates are normalized
with least/greatest + distinct, and because each batch OVERWRITES its
own ``batch=N`` partition (never appends to a shared dir), Structured
Streaming's re-delivery of a batch after a crash rewrites the same
deterministic content instead of duplicating it. State reads filter to
``batch < current`` so a half-written replay partition is never probed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    minhash_band_table,
    minhash_per_doc,
    verify_jaccard_pairs,
)

_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint, n_common bigint, n_union bigint"


# the batch-scoped state reader now lives in the shared ledger module
# (operators/ledger.py) with the rest of the protocol family; this
# alias keeps the established import path for the streaming twins
from etl_pipeline_candy_store_spark.operators.ledger import (  # noqa: E402
    read_batch_state as _read_state,
)


def apply_neardup_batch(batch: DataFrame, state_dir: str, batch_id: int) -> None:
    """Process one micro-batch of (doc_id, text) rows: probe accumulated
    LSH state, emit verified pairs, extend state. Idempotent per
    (batch content, batch_id) — safe under foreachBatch replay."""
    spark = batch.sparkSession
    per_doc = minhash_per_doc(batch).localCheckpoint(eager=True)
    if not per_doc.take(1):
        return
    bands_new = minhash_band_table(per_doc)
    sets_new = per_doc.select("doc_id", "n", "S")

    bands_old = _read_state(
        spark, f"{state_dir}/bands", "doc_id bigint, band_idx int, band_key string",
        before_batch=batch_id,
    ).drop("batch")
    sets_old = _read_state(
        spark, f"{state_dir}/sets", "doc_id bigint, n bigint, S array<string>",
        before_batch=batch_id,
    ).drop("batch")
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
    verify_jaccard_pairs(cand, sets_all).write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    bands_new.write.mode("overwrite").parquet(f"{state_dir}/bands/batch={batch_id}")
    sets_new.write.mode("overwrite").parquet(f"{state_dir}/sets/batch={batch_id}")


def stream_minhash_neardup(doc_stream: DataFrame, state_dir: str):
    """Wire ``doc_stream`` (doc_id, text) into the incremental LSH
    pipeline. Returns a ``DataStreamWriter``; the caller adds its
    checkpoint/trigger and ``.start()``s. Near-dup pairs land under
    ``{state_dir}/pairs`` as batch-partitioned parquet."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_neardup_batch(batch, state_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_neardup_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated near-dup pair table the stream has emitted."""
    return _read_state(spark, f"{state_dir}/pairs", _PAIRS_SCHEMA).drop("batch")


# --- Streaming perceptual-hash media near-dup (q205's ingest twin) ------

_PHASH_PAIRS_SCHEMA = "media_a bigint, media_b bigint, hamming int"
_PHASH_BANDS_SCHEMA = "media_id bigint, phash bigint, band_idx int, band_val bigint"


def apply_phash_batch(batch: DataFrame, state_dir: str, batch_id: int) -> None:
    """Media near-dup ON ARRIVAL: signature one micro-batch of
    (media_id, payload) rows, probe the accumulated corpus band state,
    emit verified pairs, extend state — the ingest twin of batch q205.

    Candidates come from (a) the batch's own band self-join (q205's
    exact machinery via :func:`phash_neardup_pairs`) and (b) the batch
    bands equi-joined to the STATE bands — one band-keyed probe, never
    a pair scan over the corpus. The first-agreeing-band filter is a
    pure function of pa ^ pb (see verify_banded_candidates), so a pair
    matched by several bands across the probe still emits exactly once.
    Cross pairs are emitted id-ordered (least, greatest), so under
    monotone media_id arrival the accumulated pair table equals batch
    q205 exactly. State grows with DISTINCT media items (7 band rows
    each), the exact-dedup state envelope; per-batch cost is
    O(batch + candidates). Batch-scoped overwrites keep replays
    idempotent (a replayed batch re-reads only EARLIER state)."""
    from etl_pipeline_candy_store_spark.operators.multimodal import (
        media_phash,
        phash_bands,
        phash_neardup_pairs,
        verify_banded_candidates,
    )

    spark = batch.sparkSession
    ph_new = media_phash(batch).localCheckpoint(eager=True)
    bands_new = phash_bands(ph_new)
    bands_old = _read_state(
        spark, f"{state_dir}/bands", _PHASH_BANDS_SCHEMA, before_batch=batch_id
    )

    intra = phash_neardup_pairs(ph_new)
    cross = verify_banded_candidates(
        bands_new.select(
            F.col("media_id").alias("m_new"),
            F.col("phash").alias("p_new"),
            "band_idx",
            "band_val",
        )
        .join(
            bands_old.select(
                F.col("media_id").alias("m_old"),
                F.col("phash").alias("p_old"),
                "band_idx",
                "band_val",
            ),
            ["band_idx", "band_val"],
        )
        # redelivered media_id would self-pair at hamming 0; the batch
        # twin (phash_neardup_pairs) only emits a < b, so guard here too
        .filter(F.col("m_new") != F.col("m_old"))
        .select(
            F.least("m_old", "m_new").alias("media_a"),
            F.greatest("m_old", "m_new").alias("media_b"),
            F.when(F.col("m_old") < F.col("m_new"), F.col("p_old"))
            .otherwise(F.col("p_new"))
            .alias("pa"),
            F.when(F.col("m_old") < F.col("m_new"), F.col("p_new"))
            .otherwise(F.col("p_old"))
            .alias("pb"),
            "band_idx",
        )
    )
    intra.unionByName(cross).write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    bands_new.write.mode("overwrite").parquet(
        f"{state_dir}/bands/batch={batch_id}"
    )


def stream_phash_neardup(media_stream: DataFrame, state_dir: str):
    """Wire a (media_id, payload) stream through incremental perceptual
    near-dup. Returns a ``DataStreamWriter``; caller adds
    checkpoint/trigger. Pairs accumulate under ``{state_dir}/pairs``."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_phash_batch(batch, state_dir, batch_id)

    return media_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_phash_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated media near-dup pair table the stream has emitted."""
    return _read_state(spark, f"{state_dir}/pairs", _PHASH_PAIRS_SCHEMA).drop(
        "batch"
    )
