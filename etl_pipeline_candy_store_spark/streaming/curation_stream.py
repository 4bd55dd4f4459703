"""Streaming curation gate: curate a crawl ON ARRIVAL.

The batch curation funnel's non-dedup stages — quality gate (q59
metrics), repetition gate (q122 signals), decontamination (q58 overlap
vs a held-out eval set) — are per-document stateless filters or joins
against a STATIC broadcast side, so they need no cross-batch state at
all: each micro-batch can be gated independently and the union of
survivors provably equals the batch pipeline run over the full corpus
(``tests/test_streaming.py::test_stream_curation_gate_matches_batch``).
That is the 100 TB posture: a crawler's output is quality-filtered and
decontaminated the moment it lands, and only survivors ever reach the
(stateful) dedup stages — :mod:`neardup_stream` for near-dup, and
:func:`stream_exact_dedup` below for exact content dedup (digest-state
probing, first-seen-wins; equals batch q50's keeper set under
monotone doc_id arrival).

Mechanics mirror :mod:`neardup_stream`'s idempotent-replay contract:
each micro-batch OVERWRITES its own ``batch=N`` parquet partition, so
Structured Streaming re-delivering a batch after a crash rewrites the
same deterministic content instead of duplicating survivors.

The gates are THE SAME functions the batch pipeline runs
(:func:`~etl_pipeline_candy_store_spark.operators.curation.quality_gate`,
:func:`~etl_pipeline_candy_store_spark.plans.curation_pipeline.drop_repetitive`)
— not reimplementations — so a threshold change lands in both modes.
Decontamination takes the eval shingle set as a static DataFrame
(broadcast into the per-batch join): a held-out benchmark is fixed
before the crawl starts, unlike the batch helper which re-derives it
from the corpus frame it is filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from etl_pipeline_candy_store_spark.operators.curation import (
    _CONTAM_MIN_OVERLAP,
    quality_gate,
)
from etl_pipeline_candy_store_spark.operators.dedup import _shingles


def eval_shingle_set(eval_docs: DataFrame) -> DataFrame:
    """Distinct shingles of the held-out eval set — build once, pass to
    :func:`stream_curation_gate`. Small by construction (an eval
    benchmark, not a corpus) — it travels as a broadcast."""
    return _shingles(eval_docs).select("shingle").distinct()


def apply_curation_gate_batch(
    batch: DataFrame,
    eval_shingles: DataFrame,
    out_dir: str,
    batch_id: int,
    *,
    top_bigram_max_micros: int = 600_000,
    dup_trigram_max_micros: int = 400_000,
    contam_min_overlap: int = _CONTAM_MIN_OVERLAP,
) -> None:
    """Gate one micro-batch of (doc_id, text, ...) rows and write the
    survivors to ``{out_dir}/batch={batch_id}`` (overwrite — idempotent
    under foreachBatch replay). Stages and thresholds are identical to
    the batch pipeline's quality/repetition/decontamination stages."""
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        drop_repetitive,
    )

    gated = quality_gate(batch).filter(F.col("passed") == 1).select("doc_id")
    d = batch.join(gated, "doc_id", "left_semi")
    d = drop_repetitive(
        d,
        top_bigram_max_micros=top_bigram_max_micros,
        dup_trigram_max_micros=dup_trigram_max_micros,
    )
    contaminated = (
        _shingles(d)
        .join(F.broadcast(eval_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= contam_min_overlap)
        .select("doc_id")
    )
    d.join(contaminated, "doc_id", "left_anti").write.mode("overwrite").parquet(
        f"{out_dir}/batch={batch_id}"
    )


def stream_curation_gate(
    doc_stream: DataFrame,
    eval_shingles: DataFrame,
    out_dir: str,
    **gate_kwargs,
):
    """Wire a (doc_id, text, ...) stream through the curation gates.
    Returns a ``DataStreamWriter``; the caller adds checkpoint/trigger
    and ``.start()``s. Survivors land under ``{out_dir}/batch=N``."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_curation_gate_batch(
            batch, eval_shingles, out_dir, batch_id, **gate_kwargs
        )

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_curated_docs(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated survivor table the stream has emitted."""
    try:
        return spark.read.parquet(out_dir).drop("batch")
    except AnalysisException:
        return spark.createDataFrame([], "doc_id bigint, text string")


# --- Streaming exact dedup (digest-state probing) ---------------------


def apply_exact_dedup_batch(
    batch: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Exact content dedup on arrival: drop any arriving doc whose md5
    digest was already seen in an EARLIER batch (cross-batch anti-join
    against the accumulated digest table), keep the lowest doc_id per
    digest within the batch (the same keeper rule as the batch
    pipeline's ``dedup_exact``), and extend the digest state. Batch-
    scoped ``batch=N`` overwrites — idempotent under replay. State is
    one (digest, doc_id) row per UNIQUE content ever seen: bounded by
    distinct corpus content, not stream length, and the probe is an
    equi-join on the digest — the dedup key IS the shuffle key, exactly
    like batch q50."""
    spark = batch.sparkSession
    with_fp = batch.withColumn(
        "_fp", F.md5(F.col("text").cast("binary"))
    ).localCheckpoint(eager=True)
    if not with_fp.take(1):
        return
    seen = _read_digest_state(spark, state_dir, before_batch=batch_id)
    keep_in_batch = (
        with_fp.groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("_fp", "doc_id")
    )
    survivors = (
        with_fp.join(keep_in_batch, ["_fp", "doc_id"], "left_semi")
        .join(seen.select("_fp"), "_fp", "left_anti")
        .localCheckpoint(eager=True)
    )
    survivors.drop("_fp").write.mode("overwrite").parquet(
        f"{state_dir}/docs/batch={batch_id}"
    )
    survivors.select("_fp", "doc_id").write.mode("overwrite").parquet(
        f"{state_dir}/digests/batch={batch_id}"
    )


def _read_digest_state(
    spark: SparkSession, state_dir: str, before_batch: int
) -> DataFrame:
    try:
        return (
            spark.read.parquet(f"{state_dir}/digests")
            .filter(F.col("batch") < before_batch)
            .drop("batch")
        )
    except AnalysisException:
        return spark.createDataFrame([], "_fp string, doc_id bigint")


def stream_exact_dedup(doc_stream: DataFrame, state_dir: str):
    """Wire a (doc_id, text, ...) stream through exact content dedup.
    Returns a ``DataStreamWriter``; unique-content docs land under
    ``{state_dir}/docs`` as batch-partitioned parquet."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_exact_dedup_batch(batch, state_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_deduped_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated unique-content document table."""
    try:
        return spark.read.parquet(f"{state_dir}/docs").drop("batch")
    except AnalysisException:
        return spark.createDataFrame([], "doc_id bigint, text string")


# --- Streaming token-budget admission (the q141 quota, on arrival) ----


def apply_token_budget_batch(
    batch: DataFrame, state_dir: str, batch_id: int, budget: int = 800
) -> None:
    """Admit arriving docs while their source's cumulative token count
    (in arrival = doc_id order) stays within ``budget`` — the streaming
    form of q141's greedy-prefix quota.

    State is ONE row per source per batch: the source's TOTAL arriving
    tokens (admitted or not). Tracking arrived-not-admitted mass makes
    the cross-batch rule exactly the global prefix rule: a doc admits
    iff the cumulative tokens of every doc arrived before it (plus
    itself) fit the budget — identical to running the batch cumsum over
    the concatenated stream, so stream≡batch holds with no
    closed-source flag or per-doc state. Bounded by n_sources ×
    n_batches, not stream length. ``batch=N`` overwrites keep replay
    idempotent (the delta is derived from the batch content alone)."""
    spark = batch.sparkSession
    from pyspark.sql.window import Window

    lens = batch.withColumn(
        "_n", F.size(F.split("text", " ")).cast("long")
    ).localCheckpoint(eager=True)
    if not lens.take(1):
        return
    try:
        spent = (
            spark.read.parquet(f"{state_dir}/spent")
            .filter(F.col("batch") < batch_id)
            .groupBy("source")
            .agg(F.sum("arrived").alias("_spent"))
        )
    except AnalysisException:
        spent = spark.createDataFrame([], "source string, _spent bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = lens.withColumn("_cum", F.sum("_n").over(w)).join(
        spent, "source", "left"
    )
    admitted = cum.where(
        F.coalesce(F.col("_spent"), F.lit(0)) + F.col("_cum") <= budget
    )
    admitted.drop("_n", "_cum", "_spent").write.mode("overwrite").parquet(
        f"{state_dir}/docs/batch={batch_id}"
    )
    lens.groupBy("source").agg(F.sum("_n").alias("arrived")).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/spent/batch={batch_id}")


def stream_token_budget(doc_stream: DataFrame, state_dir: str, budget: int = 800):
    """Wire a (doc_id, text, source, ...) stream through per-source
    token-budget admission. Returns a ``DataStreamWriter``."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_token_budget_batch(batch, state_dir, batch_id, budget)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_admitted_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated budget-admitted document table."""
    try:
        return spark.read.parquet(f"{state_dir}/docs").drop("batch")
    except AnalysisException:
        return spark.createDataFrame(
            [], "doc_id bigint, text string, source string"
        )


# --- Streaming drift monitor (the q145 statistic, on arrival) ---------


def length_histogram(docs: DataFrame) -> DataFrame:
    """(bin, n) token-length histogram — the shared binning of q145."""
    return (
        docs.select(
            F.expr("CAST(size(split(text, ' ')) AS BIGINT) div 8").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def drift_stat(batch_hist: DataFrame, ref_hist: DataFrame) -> DataFrame:
    """One-row two-sample chi-square (integer micros) between a batch
    histogram and the reference histogram — q145's algebraic form with
    the same staged integer division, so the statistic is deterministic
    and engine-independent. Inputs are bin-level relations (tiny); the
    full-outer join aligns bins present in only one side."""
    m = (
        batch_hist.withColumnRenamed("n", "o1")
        .join(ref_hist.withColumnRenamed("n", "o2"), "bin", "full_outer")
        .select(
            F.coalesce("o1", F.lit(0)).alias("o1"),
            F.coalesce("o2", F.lit(0)).alias("o2"),
        )
    )
    t = m.agg(
        F.sum("o1").alias("n1"), F.sum("o2").alias("n2")
    )
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            F.expr(
                "CAST(((o1 * n2 - o2 * n1) * (o1 * n2 - o2 * n1))"
                " div (n1 * n2) * 1000000 div (o1 + o2) AS BIGINT)"
            ).alias("c"),
            "n1",
        )
        .agg(
            F.max("n1").cast("long").alias("n_docs"),
            F.sum("c").cast("long").alias("chi2_micros"),
        )
    )


def apply_drift_batch(
    batch: DataFrame, ref_hist: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Emit one drift row per micro-batch: the arriving batch's length
    histogram tested against the (broadcast) reference histogram. Pure
    per-batch computation — no cross-batch state at all — so replay
    rewrites the identical row (batch=N overwrite)."""
    row = drift_stat(length_histogram(batch), ref_hist).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    )
    row.write.mode("overwrite").parquet(f"{state_dir}/drift/batch={batch_id}")


def stream_drift_monitor(doc_stream: DataFrame, ref_hist: DataFrame, state_dir: str):
    """Wire a documents stream into the per-batch drift monitor.
    ``ref_hist`` is the fixed reference histogram (e.g. the vetted
    corpus the model was trained on); each arriving batch gets a
    chi-square drift score against it — the alarm that a crawler or
    upstream format change shifted the data BEFORE it pollutes the mix."""
    ref = ref_hist.localCheckpoint(eager=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_drift_batch(batch, ref, state_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


# --- Streaming semantic decontamination (q199's ingest twin) ----------


def apply_semantic_decon_batch(
    batch: DataFrame,
    panel: DataFrame,
    out_dir: str,
    batch_id: int,
    *,
    min_cos_micros: int | None = None,
) -> None:
    """Screen one micro-batch of (vec_id, embedding) rows against the
    STATIC held-out benchmark panel (q199's exact scoring): rows whose
    cosine to any panel vector reaches the threshold land under
    ``{out_dir}/flagged/batch=N`` with attribution (n_eval_hits,
    max_cos_micros); the rest pass to ``{out_dir}/clean/batch=N``.
    Re-arriving PANEL members (a published benchmark gets re-crawled)
    are excluded by the gate itself — they reach neither partition, so
    feeding the raw stream reproduces q199 exactly with no caller-side
    pre-filter. Like the lexical gate this is per-row stateless — the
    panel is fixed before the crawl starts — so batching cannot change
    any verdict and both partitions are overwrite-idempotent under
    foreachBatch replay."""
    from etl_pipeline_candy_store_spark.operators.curation import _SEM_TAU
    from etl_pipeline_candy_store_spark.operators.similarity import (
        _cos_micros,
        _dot,
        with_norm,
    )

    tau = _SEM_TAU if min_cos_micros is None else min_cos_micros
    # panel members may re-arrive in a raw stream (the benchmark is
    # published, crawlers pick it up) — they are never screened against
    # themselves, exactly as batch q199 excludes them from the corpus
    # side; the anti-join is against the tiny broadcast panel
    corpus = batch.select("vec_id", "embedding").join(
        F.broadcast(panel.select(F.col("eval_id").alias("vec_id"))),
        "vec_id",
        "left_anti",
    )
    scored = (
        with_norm(corpus)
        .crossJoin(F.broadcast(panel))
        .select(
            "vec_id",
            _cos_micros(
                _dot(F.col("p_emb"), F.col("embedding")),
                F.col("p_nrm"),
                F.col("nrm"),
            ).alias("cos_micros"),
        )
        .filter(F.col("cos_micros") >= tau)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.max("cos_micros").cast("long").alias("max_cos_micros"),
        )
        .localCheckpoint(eager=True)
    )
    scored.write.mode("overwrite").parquet(f"{out_dir}/flagged/batch={batch_id}")
    # clean = corpus minus flagged; re-arrived panel members are in
    # NEITHER partition (eval docs never ship as training data)
    corpus.join(scored, "vec_id", "left_anti").write.mode("overwrite").parquet(
        f"{out_dir}/clean/batch={batch_id}"
    )


def decon_panel(embeddings: DataFrame, panel_max_vec: int) -> DataFrame:
    """The broadcast-ready benchmark panel (pre-normed, renamed to the
    probe-side contract). Build once before the stream starts."""
    from etl_pipeline_candy_store_spark.operators.similarity import with_norm

    return (
        with_norm(embeddings.filter(F.col("vec_id") < panel_max_vec))
        .select(
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("p_emb"),
            F.col("nrm").alias("p_nrm"),
        )
    )


def stream_semantic_decon(
    vec_stream: DataFrame, panel: DataFrame, out_dir: str, **kwargs
):
    """Wire a (vec_id, embedding) stream through the semantic screen.
    Returns a ``DataStreamWriter``; caller adds checkpoint/trigger."""
    p = panel.localCheckpoint(eager=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_semantic_decon_batch(batch, p, out_dir, batch_id, **kwargs)

    return vec_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_semantic_flags(spark: SparkSession, out_dir: str) -> DataFrame:
    """Accumulated contamination flags the stream has emitted."""
    try:
        return spark.read.parquet(f"{out_dir}/flagged").drop("batch")
    except AnalysisException:
        return spark.createDataFrame(
            [], "vec_id bigint, n_eval_hits bigint, max_cos_micros bigint"
        )


# --- Streaming importance scoring (q202's ingest twin) -----------------


def apply_importance_batch(
    batch: DataFrame,
    bins: DataFrame,
    out_dir: str,
    batch_id: int,
) -> None:
    """Score one micro-batch of (doc_id, text, ...) rows against the
    FROZEN importance table (q202's log2-binned likelihood ratios,
    built once at calibration — the CCNet discipline: the scorer does
    not drift while the crawl streams). Per-row stateless, so any
    batching produces identical weights; ``{out_dir}/batch=N`` is a
    batch-scoped overwrite (replay-idempotent). Tokens outside the
    calibration vocabulary contribute the neutral bin 0 and are not
    counted in n_toks (exactly :func:`score_importance`)."""
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        score_importance,
    )

    toks = batch.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    score_importance(toks, bins).write.mode("overwrite").parquet(
        f"{out_dir}/batch={batch_id}"
    )


def stream_importance_scores(doc_stream: DataFrame, bins: DataFrame, out_dir: str):
    """Wire a documents stream through the frozen importance scorer.
    Returns a ``DataStreamWriter``; caller adds checkpoint/trigger."""
    b = bins.localCheckpoint(eager=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_importance_batch(batch, b, out_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_importance_scores(spark: SparkSession, out_dir: str) -> DataFrame:
    """Accumulated per-doc weights the stream has emitted."""
    try:
        return spark.read.parquet(out_dir).drop("batch")
    except AnalysisException:
        return spark.createDataFrame(
            [], "doc_id bigint, n_toks bigint, log2_weight bigint"
        )

# --- Streaming duplicated-span scrub (q203's ingest twin) --------------


def apply_span_scrub_batch(
    batch: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Scrub one micro-batch of (doc_id, text, ...) rows against the
    accumulated corpus shingle state and extend that state — the
    ingest twin of batch q203 (single-pass duplicated-span removal).

    A position of an arriving doc is removed iff its covering
    3-shingle was already introduced by an EARLIER-arrived doc (state
    probe — equi-join on the shingle, the dedup key IS the shuffle
    key) or is shared with a lower-doc_id doc INSIDE the same batch
    (the q203 min-doc_id canonical rule, batch-locally). Under
    monotone doc_id arrival this is EXACTLY batch q203: q203 removes a
    position iff some doc with a smaller doc_id contains the covering
    shingle ("exists another owner AND not the min owner" collapses to
    "exists a smaller owner"), and with monotone arrival "smaller
    doc_id" == "arrived earlier (or earlier in this batch)".

    State is the doc's ORIGINAL positional shingles (one row per
    distinct shingle ever seen, with its first owner) — original, not
    post-scrub, because q203's removal condition is defined over
    original texts; it is bounded by distinct corpus shingles, the
    same O(unique content) envelope as the exact-dedup digest state.
    Batch-scoped ``batch=N`` overwrites keep replay idempotent: the
    state probe reads strictly earlier batches, so a re-delivered
    batch recomputes byte-identical output."""
    from pyspark.sql.window import Window

    from etl_pipeline_candy_store_spark.operators.dedup import (
        apply_span_removals,
        covered_positions,
        positional_shingles,
    )

    spark = batch.sparkSession
    b = batch.select("doc_id", "text").localCheckpoint(eager=True)
    if not b.take(1):
        return
    ps = positional_shingles(b)
    seen = _read_shingle_state(spark, state_dir, before_batch=batch_id)
    w_sh = Window.partitionBy("shingle")
    flagged = ps.join(
        seen.select("shingle").withColumn("_seen", F.lit(1)),
        "shingle",
        "left",
    ).select(
        "doc_id",
        "pos",
        "shingle",
        F.col("_seen").isNotNull().alias("in_state"),
        (F.min("doc_id").over(w_sh) != F.max("doc_id").over(w_sh)).alias(
            "batch_dup"
        ),
        (F.col("doc_id") != F.min("doc_id").over(w_sh)).alias(
            "not_batch_canon"
        ),
    )
    rem = covered_positions(
        flagged.where(
            F.col("in_state")
            | (F.col("batch_dup") & F.col("not_batch_canon"))
        )
    )
    out = apply_span_removals(b, rem).localCheckpoint(eager=True)
    out.write.mode("overwrite").parquet(f"{state_dir}/docs/batch={batch_id}")
    new_shingles = (
        ps.groupBy("shingle")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(seen.select("shingle"), "shingle", "left_anti")
    )
    new_shingles.write.mode("overwrite").parquet(
        f"{state_dir}/shingles/batch={batch_id}"
    )


def _read_shingle_state(
    spark: SparkSession, state_dir: str, before_batch: int
) -> DataFrame:
    try:
        return (
            spark.read.parquet(f"{state_dir}/shingles")
            .filter(F.col("batch") < before_batch)
            .drop("batch")
        )
    except AnalysisException:
        return spark.createDataFrame([], "shingle string, doc_id bigint")


def stream_span_scrub(doc_stream: DataFrame, state_dir: str):
    """Wire a (doc_id, text, ...) stream through duplicated-span
    removal on arrival. Returns a ``DataStreamWriter``; scrubbed docs
    land under ``{state_dir}/docs`` as batch-partitioned parquet."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_span_scrub_batch(batch, state_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_scrubbed_docs(spark: SparkSession, state_dir: str) -> DataFrame:
    """The accumulated scrubbed-document table (q203's output shape)."""
    try:
        return spark.read.parquet(f"{state_dir}/docs").drop("batch")
    except AnalysisException:
        return spark.createDataFrame(
            [],
            "doc_id bigint, n_tokens bigint, n_removed bigint,"
            " clean_text string",
        )


# --- Streaming unigram tokenization (q206's ingest twin) ----------------


def apply_unigram_encode_batch(
    batch: DataFrame, enc: DataFrame, out_dir: str, batch_id: int
) -> None:
    """Tokenize one micro-batch of (doc_id, text, ...) rows against the
    FROZEN per-word encoding table (q206's Viterbi result, built once
    at calibration — the frozen-scorer discipline of the q202 twin: a
    tokenizer must not drift while the crawl streams). Per-row
    stateless, so any batching produces identical counts;
    ``{out_dir}/batch=N`` is a batch-scoped overwrite
    (replay-idempotent).

    Words outside the calibration vocabulary are counted in ``n_oov``
    rather than silently dropped (the q58/q122 NULL lesson): batch q206
    has no OOV by construction (its corpus defines the vocab), so on
    the calibration corpus n_oov = 0 and the remaining columns equal
    q206 exactly; on fresh crawl data n_oov is the retrain signal."""
    corpus = batch.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    scored = corpus.join(F.broadcast(enc), "word", "left")
    (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.col("k")).cast("long").alias("n_words"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce(F.sum("v"), F.lit(0)).cast("long").alias("ll_bits"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_oov"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/batch={batch_id}")
    )


def stream_unigram_encode(doc_stream: DataFrame, enc: DataFrame, out_dir: str):
    """Wire a documents stream through the frozen unigram tokenizer.
    ``enc`` is the (word, v, k) relation from
    :func:`~etl_pipeline_candy_store_spark.operators.unigram.unigram_encodings`
    over the calibration corpus. Returns a ``DataStreamWriter``; caller
    adds checkpoint/trigger."""
    e = enc.select("word", "v", "k").localCheckpoint(eager=True)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_unigram_encode_batch(batch, e, out_dir, batch_id)

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_unigram_encodings(spark: SparkSession, out_dir: str) -> DataFrame:
    """Accumulated per-doc tokenization counts the stream has emitted."""
    try:
        return spark.read.parquet(out_dir).drop("batch")
    except AnalysisException:
        return spark.createDataFrame(
            [],
            "doc_id bigint, n_words bigint, n_pieces bigint,"
            " ll_bits bigint, n_oov bigint",
        )
