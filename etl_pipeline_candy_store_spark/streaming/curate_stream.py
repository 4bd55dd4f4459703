"""Composed streaming curation: the batch ``curate()`` funnel as ONE
stream against ONE state dir.

Every individual curation gate already has a streaming twin
(``curation_stream.py``: exact-dup, quality, drift, token-budget,
span-scrub, semantic-decon; ``neardup_stream.py``: MinHash near-dup),
each with its own state dir. This module is the missing composition: a
single ``foreachBatch`` that runs the batch funnel's stages (exact
dedup -> EXACT near-dup pair accumulation -> quality gate -> repetition
gate -> lexical decontamination) against one state directory with the
one ledger protocol all the twins share — ``batch=N``-scoped overwrites,
reads filtered to ``batch < current`` — so crash replay rewrites
deterministic content instead of duplicating (exactly-once without a
transaction log).

Equality contract (tested): on MONOTONE doc_id arrival — the ingest
order a crawl feed actually has, and the order under which exact-dedup's
keep-min-doc_id is first-arrival — ``read_curated`` returns exactly the
(doc_id, split) survivor set of batch ``curate()`` over the union of all
batches. Near-dup keeper status is NOT monotone even then (a late doc
can bridge two clusters and re-label one keeper), so match pairs are
accumulated append-only and survivors are derived ON READ via connected
components — the ``entity_stream`` discipline; the quality and
repetition gates are genuinely per-doc and stored as batch-local flags.

Near-dup state is the EXACT shingle-intersection semantics of
``operators/neardup_state.py`` (q216), not the LSH approximation: each
batch pays within-batch ``jaccard_pairs`` plus one scan of the shingle
state probed by the broadcast batch shingle table — no corpus self-join
ever again. Decontamination is derived ON READ as well, because batch
``curate()`` scopes the eval shingle set to eval docs that SURVIVED the
earlier gates — and near-dup survival can change as later batches
bridge clusters; the read uses only the stored shingle state, never a
text rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.curation import (
    _CONTAM_MIN_OVERLAP,
    _EVAL_MAX_DOC,
    _h256,
    quality_gate,
)
from etl_pipeline_candy_store_spark.operators.dedup import (
    _shingles,
    connected_components,
    jaccard_pairs,
)
from etl_pipeline_candy_store_spark.streaming.neardup_stream import _read_state

_REP_TOP_BIGRAM_MAX = 600_000  # drop_repetitive's documented defaults
_REP_DUP_TRIGRAM_MAX = 400_000
_BROADCAST_MAX_SHINGLES = 2_000_000  # neardup_state's guard, same basis

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint,"
    " q_pass int, rep_drop int"
)
_DIGEST_SCHEMA = "fp string"
_SH_SCHEMA = "doc_id bigint, shingle string"
_CARD_SCHEMA = "doc_id bigint, n bigint"
_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint"


def apply_curate_batch(batch: DataFrame, state_dir: str, batch_id: int) -> None:
    """Run one micro-batch through the composed funnel's stateful
    stages; every write is scoped to ``batch={batch_id}``."""
    spark = batch.sparkSession
    keyed = batch.withColumn(
        "fp", F.md5(F.col("text").cast("binary"))
    ).localCheckpoint(eager=True)

    # -- stage 1: exact dedup (first-arrival == min doc_id under
    # monotone arrival; within the batch, explicit min per digest)
    seen_fp = _read_state(
        spark, f"{state_dir}/digests", _DIGEST_SCHEMA, before_batch=batch_id
    ).drop("batch")
    inbatch_keep = (
        keyed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    )
    d1 = (
        keyed.join(inbatch_keep, ["fp", "doc_id"], "left_semi")
        .join(seen_fp, "fp", "left_anti")
        .localCheckpoint(eager=True)
    )
    keyed.select("fp").distinct().join(seen_fp, "fp", "left_anti").write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/digests/batch={batch_id}")

    # -- stage 2: EXACT near-dup pairs, append-only (q216 semantics):
    # within-batch jaccard + broadcast probe of the accumulated shingle
    # state; survivors derived on read via connected components
    sh_new = _shingles(d1.select("doc_id", "text")).localCheckpoint(
        eager=True
    )
    card_new = sh_new.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    within = jaccard_pairs(d1.select("doc_id", "text")).select(
        "doc_a", "doc_b"
    )
    sh_st = _read_state(
        spark, f"{state_dir}/shingles", _SH_SCHEMA, before_batch=batch_id
    ).drop("batch")
    card_st = _read_state(
        spark, f"{state_dir}/cards", _CARD_SCHEMA, before_batch=batch_id
    ).drop("batch")
    # broadcast gated on the BATCH SHINGLE row count (the relation being
    # shipped), not the doc count — a fat micro-batch falls back to a
    # shuffle join instead of a multi-hundred-MB broadcast
    probe = sh_new.select(F.col("doc_id").alias("doc_new"), "shingle")
    if sh_new.count() <= _BROADCAST_MAX_SHINGLES:
        probe = F.broadcast(probe)
    inter = (
        sh_st.select(F.col("doc_id").alias("doc_seen"), "shingle")
        .join(probe, "shingle")
        .groupBy("doc_seen", "doc_new")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cross = (
        inter.join(
            card_st.select(
                F.col("doc_id").alias("doc_seen"), F.col("n").alias("n_a")
            ),
            "doc_seen",
        )
        .join(
            card_new.select(
                F.col("doc_id").alias("doc_new"), F.col("n").alias("n_b")
            ),
            "doc_new",
        )
        .withColumn(
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("long"),
        )
        .filter(F.col("n_common").cast("double") / F.col("n_union") >= 0.05)
        .select(
            F.least("doc_seen", "doc_new").alias("doc_a"),
            F.greatest("doc_seen", "doc_new").alias("doc_b"),
        )
    )
    within.unionByName(cross).write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    sh_new.write.mode("overwrite").parquet(
        f"{state_dir}/shingles/batch={batch_id}"
    )
    card_new.write.mode("overwrite").parquet(
        f"{state_dir}/cards/batch={batch_id}"
    )

    # -- stage 3+4: per-doc gate flags (batch-local decisions)
    qflag = quality_gate(d1).select("doc_id", F.col("passed").alias("q_pass"))
    from etl_pipeline_candy_store_spark.operators.text import (
        repetition_signals,
    )

    rep = repetition_signals(d1).select(
        "doc_id",
        (
            (F.col("top_bigram_frac_micros") > _REP_TOP_BIGRAM_MAX)
            | (F.col("dup_trigram_frac_micros") > _REP_DUP_TRIGRAM_MAX)
        )
        .cast("int")
        .alias("rep_drop"),
    )

    # -- stage 5 (decontamination) is NOT flagged here: batch curate()
    # scopes the eval shingle set to eval docs surviving stages 2-4, and
    # near-dup survival is read-time state — read_curated derives it
    # from the shingle/card state this batch just appended.

    d1.drop("fp").join(qflag, "doc_id", "left").join(
        rep, "doc_id", "left"
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        F.coalesce("q_pass", F.lit(0)).cast("int").alias("q_pass"),
        F.coalesce("rep_drop", F.lit(0)).cast("int").alias("rep_drop"),
    ).write.mode("overwrite").parquet(f"{state_dir}/docs/batch={batch_id}")


def stream_curate(doc_stream: DataFrame, state_dir: str):
    """Wire a documents stream (doc_id, text, lang, source, n_chars)
    through the composed curation funnel. Returns a
    ``DataStreamWriter``; the caller adds checkpoint/trigger."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_curate_batch(batch, state_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_curated(
    spark: SparkSession, state_dir: str, *, with_docs: bool = False
) -> DataFrame:
    """(doc_id, split) survivors over everything ingested so far —
    equal to batch ``curate()``'s export over the same docs under
    monotone arrival. Near-dup drops are derived here (connected
    components over the accumulated pair state, drop non-min members);
    the other gates are the stored per-doc flags. ``with_docs`` keeps
    the full document columns (the export shape)."""
    docs = _read_state(spark, f"{state_dir}/docs", _DOCS_SCHEMA).drop("batch")
    pairs = _read_state(spark, f"{state_dir}/pairs", _PAIRS_SCHEMA).drop(
        "batch"
    )
    # gates 3+4 from stored flags; near-dup drop derived from pair state
    d3r = docs.filter((F.col("q_pass") == 1) & (F.col("rep_drop") == 0))
    if not pairs.isEmpty():
        drop = connected_components(pairs, "doc_a", "doc_b").filter(
            F.col("node") != F.col("label")
        )
        d3r = d3r.join(
            drop.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
        )
    d3r = d3r.localCheckpoint(eager=True)
    # decontamination exactly as batch curate() scopes it: eval shingles
    # from eval docs STILL IN d3r, overlap counted over the stored
    # (distinct) shingle state — no text rescan
    sh = _read_state(spark, f"{state_dir}/shingles", _SH_SCHEMA).drop("batch")
    eval_sh = (
        sh.join(
            d3r.filter(F.col("doc_id") < _EVAL_MAX_DOC).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .select("shingle")
        .distinct()
    )
    contaminated = (
        sh.join(
            d3r.filter(F.col("doc_id") >= _EVAL_MAX_DOC).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("doc_id")
    )
    survivors = d3r.filter(F.col("doc_id") >= _EVAL_MAX_DOC).join(
        contaminated, "doc_id", "left_anti"
    )
    h = _h256()
    split = (
        F.when(h < 230, F.lit("train"))
        .when(h < 243, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split")
    )
    if with_docs:
        return survivors.select(
            "doc_id", "text", "lang", "source", "n_chars", split
        )
    return survivors.select("doc_id", split)


def export_curated(
    spark: SparkSession, state_dir: str, out_dir: str, n_shards: int = 4
) -> dict:
    """Ship the stream-curated survivors through the SAME shard writer
    as batch ``curate()`` (content-stable hash shards + manifest per
    split) — the handoff that lets a team run the stream online and
    still export byte-identical training shards. Manifests match the
    batch run's (modulo output path) because the survivor rows and the
    shard key/order columns are identical."""
    import os as _os

    from etl_pipeline_candy_store_spark.sources.writers import (
        write_training_shards,
    )

    d = read_curated(spark, state_dir, with_docs=True)
    report: dict = {}
    for split in ("train", "val", "test"):
        part = d.filter(F.col("split") == split).drop("split")
        manifest = write_training_shards(
            part,
            _os.path.join(out_dir, f"split={split}"),
            key_cols=["doc_id"],
            n_shards=n_shards,
            order_cols=["source", "doc_id"],
        )
        report[split] = {"n_docs": manifest["total_rows"], "manifest": manifest}
    return report


def read_curated_materialized(
    spark: SparkSession,
    state_dir: str,
    store_dir: str | None = None,
    *,
    with_docs: bool = False,
) -> DataFrame:
    """``read_curated`` memoized per STATE GENERATION through the
    durable store (the ER twin's ``read_resolved_entities_materialized``
    pattern): the read-side derivation (connected components over the
    pair state + the decontamination join) runs once per generation;
    repeat reads between micro-batches are a parquet scan, a new batch
    changes the fingerprint and the next read rebuilds once, and
    ``prune_materialized("stream_curated*", store_dir=...)`` is the
    retention knob with the store's pinned-reader guarantee."""
    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_relation,
    )

    name = "stream_curated_docs" if with_docs else "stream_curated"
    return materialized_relation(
        spark,
        name,
        state_dir,
        build=lambda: read_curated(spark, state_dir, with_docs=with_docs),
        tables=("docs", "pairs", "shingles"),
        store_dir=store_dir,
    )
