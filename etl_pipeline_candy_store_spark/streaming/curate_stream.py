"""Composed streaming curation: the batch ``curate()`` funnel as ONE
stream against ONE state dir — ARRIVAL-ORDER INDEPENDENT.

Every individual curation gate already has a streaming twin
(``curation_stream.py``: exact-dup, quality, drift, token-budget,
span-scrub, semantic-decon; ``neardup_stream.py``: MinHash near-dup),
each with its own state dir. This module is the missing composition: a
single ``foreachBatch`` that runs the batch funnel's stages against one
state directory with the one ledger protocol all the twins share —
``batch=N``-scoped overwrites, reads filtered to ``batch < current`` —
so crash replay rewrites deterministic content instead of duplicating
(exactly-once without a transaction log).

Design: ALL state is keyed by the CONTENT DIGEST (fp), not by doc_id,
and every doc_id-dependent decision is derived ON READ.

The round-11 version keyed state by doc_id and could only equal batch
``curate()`` under monotone doc_id arrival: exact-dedup's keeper is the
MIN doc_id per digest, and a late-arriving smaller doc_id re-elects the
keeper — per-batch materialized keepers are wrong the moment a real
crawl feed reorders. The fix is the same discipline the ER twin
(``entity_stream.py``) uses for bridging records: state stores only
order-independent SETS, and anything order-sensitive is a read-time
derivation over them. Since a digest determines the text, every
content-derived relation (shingles, cardinalities, quality/repetition
flags, near-dup pairs, the split hash) is a function of fp alone —
computed ONCE when an fp first arrives, whatever doc carried it:

- ``fps``      (fp)                 — digests first seen in this batch
  (fp is the 16-byte binary unhex(md5(text)) everywhere below)
- ``texts``    (fp, text)           — one stored copy per digest
- ``ids``      (fp, doc_id, lang, source, n_chars) — per batch, the
  MIN-doc_id arrival row per digest: the keeper per fp is the min over
  these rows across ALL batches, and min is commutative/associative —
  the read-side election is arrival-order independent by construction
- ``shingles`` (fp, sh), ``cards`` (fp, n) — the q51 relations with
  each shingle stored as its 16-byte digest (the neardup_state v3
  narrow-state discipline: fixed-width binary keys, md5-grade equality
  — the contract exact-dedup itself rests on)
- ``pairs``    (fp_a, fp_b)         — EXACT near-dup pairs between
  digests, append-only: within-batch jaccard over new fps + one probe
  of the accumulated shingle state; a pair is discovered exactly once,
  in the batch where its LATER fp first arrives
- ``flags``    (fp, q_pass, rep_drop, h) — content-determined gate
  flags plus the stored split byte, so the plain (doc_id, split) read
  is state-only (no text rejoin)

``read_curated`` derives (doc_id, split): elect keepers (min-doc_id
row per fp), map fp-pairs to keeper doc_ids, connected components,
drop non-min members, apply flags, then run decontamination exactly as
batch ``curate()`` scopes it (eval shingles from eval-side SURVIVORS
only) over the stored shingle state — no text rescan. Equality with
batch ``curate()`` over the union of all batches holds for ANY
arrival order and ANY batch boundaries (tested with a shuffled
interleaving, including a late batch that re-elects keepers and
bridges two already-emitted near-dup clusters).

Scale posture: per-batch work is one digest groupBy over the batch,
within-batch jaccard over NEW content only, and one scan of the
shingle state probed by the (broadcast-gated) batch shingle table —
no corpus self-join ever again. Read-side derivation is keeper
election (one groupBy over ids), components over the true-duplicate
pair relation (tiny vs corpus), and the decon overlap join; memoize
repeat reads per state generation with ``read_curated_materialized``.
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
from etl_pipeline_candy_store_spark.operators.neardup_state import (
    _sh_digest,
)
from etl_pipeline_candy_store_spark.operators.ledger import (
    read_batch_state as _read_state,
)

from etl_pipeline_candy_store_spark.operators.text import (
    REP_DUP_TRIGRAM_MAX_MICROS as _REP_DUP_TRIGRAM_MAX,
    REP_TOP_BIGRAM_MAX_MICROS as _REP_TOP_BIGRAM_MAX,
)

_BROADCAST_MAX_SHINGLES = 2_000_000  # neardup_state's guard, same basis

# fp is the 16-byte binary content digest (unhex(md5(text))) and sh the
# 16-byte binary shingle digest — the same narrow-state discipline as
# operators/neardup_state.py: joins and groupBys key on fixed-width
# binaries, the state never materializes text-derived strings outside
# the single texts relation, and every scan is ~half the string layout.
_FPS_SCHEMA = "fp binary"
_TEXTS_SCHEMA = "fp binary, text string"
_IDS_SCHEMA = (
    "fp binary, doc_id bigint, lang string, source string, n_chars bigint"
)
_SH_SCHEMA = "fp binary, sh binary"
_CARD_SCHEMA = "fp binary, n bigint"
_PAIRS_SCHEMA = "fp_a binary, fp_b binary"
# h is the content-hash split byte (q80's rule), stored once per digest
# so the plain (doc_id, split) read never rejoins document text
_FLAGS_SCHEMA = "fp binary, q_pass int, rep_drop int, h int"


# scrub-first mode only: per-batch segment-frequency partials (segment
# digest, distinct-doc count) — the boilerplate_stream state carried in
# THIS module's batch-scoped ledger layout so one protocol covers all
# relations; partials SUM to the corpus df (docs are atomic per batch)
_SEGDF_SCHEMA = "sh binary, df bigint"


def _seg_digest():
    return F.unhex(F.md5(F.col("seg_text").cast("binary")))


def apply_curate_batch(
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    *,
    scrub_boilerplate_first: bool = False,
) -> None:
    """Run one micro-batch through the composed funnel's stateful
    stages; every write is scoped to ``batch={batch_id}`` and keyed by
    content digest — see the module contract.

    With ``scrub_boilerplate_first`` the funnel mirrors batch
    ``curate(scrub_boilerplate_first=True)`` (the CCNet order: template
    removal BEFORE doc-level dedup). The scrub verdict is a function of
    CORPUS-WIDE segment frequencies that later batches keep raising, so
    a segment's boilerplate status — and with it every scrubbed text,
    digest, shingle set, and gate flag — can flip after arrival:
    nothing content-derived is stable enough to precompute at ingest.
    The arrival-order-independent composition is therefore the
    boilerplate-stream twin's exactly: ingest stores only the raw rows
    (ids/texts per raw digest) plus MERGEABLE per-batch segment-
    frequency partials (``segdf`` — the stream_segment_counts state in
    this module's ledger layout), and the ENTIRE funnel is derived on
    read against the accumulated counts (:func:`read_curated` with the
    same flag). Ingest gets cheaper (one segment aggregate per batch,
    no shingle/pair work); reads pay the funnel once per state
    generation — amortized by :func:`read_curated_materialized`."""
    spark = batch.sparkSession
    keyed = batch.withColumn(
        "fp", F.unhex(F.md5(F.col("text").cast("binary")))
    )
    if scrub_boilerplate_first:
        from etl_pipeline_candy_store_spark.operators.corpus_curation import (
            _segments,
        )

        batch_min = (
            keyed.groupBy("fp")
            .agg(
                F.min(
                    F.struct("doc_id", "lang", "source", "n_chars", "text")
                ).alias("s")
            )
            .select(
                "fp",
                F.col("s.doc_id").alias("doc_id"),
                F.col("s.lang").alias("lang"),
                F.col("s.source").alias("source"),
                F.col("s.n_chars").alias("n_chars"),
                F.col("s.text").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        batch_min.select(
            "fp", "doc_id", "lang", "source", "n_chars"
        ).write.mode("overwrite").parquet(f"{state_dir}/ids/batch={batch_id}")
        seen_fp = _read_state(
            spark, f"{state_dir}/fps", _FPS_SCHEMA, before_batch=batch_id
        ).drop("batch")
        new_rows = batch_min.join(seen_fp, "fp", "left_anti")
        new_rows.select("fp").write.mode("overwrite").parquet(
            f"{state_dir}/fps/batch={batch_id}"
        )
        new_rows.select("fp", "text").write.mode("overwrite").parquet(
            f"{state_dir}/texts/batch={batch_id}"
        )
        # segment-frequency partials over the FULL batch (not the
        # per-digest minima): batch curate() scrubs the raw corpus
        # including exact copies, so every doc_id must count
        _segments(batch.select("doc_id", "text")).select(
            "doc_id", _seg_digest().alias("sh")
        ).groupBy("sh").agg(
            F.countDistinct("doc_id").cast("long").alias("df")
        ).write.mode("overwrite").parquet(
            f"{state_dir}/segdf/batch={batch_id}"
        )
        return

    # -- per-batch keeper CANDIDATES: the min-doc_id arrival row per
    # digest in THIS batch (struct-min orders by the leading doc_id;
    # doc_ids are unique so the election is deterministic). Appended
    # every batch — even for digests already in state — because a later
    # batch can carry a smaller doc_id and re-elect the keeper on read.
    batch_min = (
        keyed.groupBy("fp")
        .agg(
            F.min(
                F.struct("doc_id", "lang", "source", "n_chars", "text")
            ).alias("s")
        )
        .select(
            "fp",
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.lang").alias("lang"),
            F.col("s.source").alias("source"),
            F.col("s.n_chars").alias("n_chars"),
            F.col("s.text").alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    batch_min.select("fp", "doc_id", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/ids/batch={batch_id}")

    # -- digests not seen by any earlier batch: the only rows that pay
    # content-derived work (shingles, flags, pair probes)
    seen_fp = _read_state(
        spark, f"{state_dir}/fps", _FPS_SCHEMA, before_batch=batch_id
    ).drop("batch")
    new_rows = batch_min.join(seen_fp, "fp", "left_anti").localCheckpoint(
        eager=True
    )
    new_rows.select("fp").write.mode("overwrite").parquet(
        f"{state_dir}/fps/batch={batch_id}"
    )
    new_rows.select("fp", "text").write.mode("overwrite").parquet(
        f"{state_dir}/texts/batch={batch_id}"
    )

    # content-keyed frame for the q51/gate operators (they take
    # (doc_id, text); the digest string rides in the doc_id slot — the
    # operators only group/join on it, never do arithmetic)
    d_new = new_rows.select(F.col("fp").alias("doc_id"), "text")

    # -- EXACT near-dup pairs between digests, append-only: within-new
    # jaccard + broadcast probe of the accumulated shingle state;
    # survivors derived on read via connected components over keepers
    sh_new = _shingles(d_new).localCheckpoint(eager=True)
    card_new = sh_new.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    within = jaccard_pairs(d_new).select(
        F.col("doc_a").alias("fp_a"), F.col("doc_b").alias("fp_b")
    )
    sh_st = _read_state(
        spark, f"{state_dir}/shingles", _SH_SCHEMA, before_batch=batch_id
    ).drop("batch")
    card_st = _read_state(
        spark, f"{state_dir}/cards", _CARD_SCHEMA, before_batch=batch_id
    ).drop("batch")
    # broadcast gated on the BATCH SHINGLE row count (the relation being
    # shipped), not the doc count — a fat micro-batch falls back to a
    # shuffle join instead of a multi-hundred-MB broadcast. The probe
    # and the stored state both carry the 16-byte shingle DIGEST, so
    # the state scan and the join key are fixed-width binaries.
    probe = sh_new.select(
        F.col("doc_id").alias("fp_new"), _sh_digest().alias("sh")
    )
    if sh_new.count() <= _BROADCAST_MAX_SHINGLES:
        probe = F.broadcast(probe)
    inter = (
        sh_st.join(probe, "sh")
        .groupBy(F.col("fp").alias("fp_seen"), "fp_new")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    cross = (
        inter.join(
            card_st.select(
                F.col("fp").alias("fp_seen"), F.col("n").alias("n_a")
            ),
            "fp_seen",
        )
        .join(
            card_new.select(
                F.col("doc_id").alias("fp_new"), F.col("n").alias("n_b")
            ),
            "fp_new",
        )
        .withColumn(
            "n_union",
            (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("long"),
        )
        .filter(F.col("n_common").cast("double") / F.col("n_union") >= 0.05)
        .select(
            F.least("fp_seen", "fp_new").alias("fp_a"),
            F.greatest("fp_seen", "fp_new").alias("fp_b"),
        )
    )
    within.unionByName(cross).write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    sh_new.select(
        F.col("doc_id").alias("fp"), _sh_digest().alias("sh")
    ).write.mode("overwrite").parquet(
        f"{state_dir}/shingles/batch={batch_id}"
    )
    card_new.select(F.col("doc_id").alias("fp"), "n").write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/cards/batch={batch_id}")

    # -- per-digest gate flags (content-determined, computed once)
    qflag = quality_gate(d_new).select(
        F.col("doc_id").alias("fp"), F.col("passed").alias("q_pass")
    )
    from etl_pipeline_candy_store_spark.operators.text import (
        repetition_signals,
    )

    rep = repetition_signals(d_new).select(
        F.col("doc_id").alias("fp"),
        (
            (F.col("top_bigram_frac_micros") > _REP_TOP_BIGRAM_MAX)
            | (F.col("dup_trigram_frac_micros") > _REP_DUP_TRIGRAM_MAX)
        )
        .cast("int")
        .alias("rep_drop"),
    )
    # the split byte is content-determined too — stored here so the
    # plain (doc_id, split) read never has to rejoin document text
    new_rows.select(
        "fp", _h256().cast("int").alias("h")
    ).join(qflag, "fp", "left").join(rep, "fp", "left").select(
        "fp",
        F.coalesce("q_pass", F.lit(0)).cast("int").alias("q_pass"),
        F.coalesce("rep_drop", F.lit(0)).cast("int").alias("rep_drop"),
        "h",
    ).write.mode("overwrite").parquet(f"{state_dir}/flags/batch={batch_id}")

    # -- decontamination is NOT flagged here: batch curate() scopes the
    # eval shingle set to eval docs surviving the earlier gates, eval
    # membership depends on the ELECTED keeper doc_id, and both change
    # as later batches arrive — read_curated derives it from the
    # shingle/card state this batch just appended.


def stream_curate(
    doc_stream: DataFrame,
    state_dir: str,
    *,
    scrub_boilerplate_first: bool = False,
):
    """Wire a documents stream (doc_id, text, lang, source, n_chars)
    through the composed curation funnel. Returns a
    ``DataStreamWriter``; the caller adds checkpoint/trigger.
    ``scrub_boilerplate_first`` selects the CCNet-order funnel — see
    :func:`apply_curate_batch`; read back with the SAME flag."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_curate_batch(
            batch,
            state_dir,
            batch_id,
            scrub_boilerplate_first=scrub_boilerplate_first,
        )

    return doc_stream.writeStream.foreachBatch(_apply).outputMode("update")


def _keepers(spark: SparkSession, state_dir: str) -> DataFrame:
    """Read-time keeper election: the min-doc_id arrival row per digest
    across all batches (min over per-batch minima — commutative, so the
    result is the same for any arrival order)."""
    ids = _read_state(spark, f"{state_dir}/ids", _IDS_SCHEMA).drop("batch")
    return (
        ids.groupBy("fp")
        .agg(
            F.min(F.struct("doc_id", "lang", "source", "n_chars")).alias("s")
        )
        .select(
            "fp",
            F.col("s.doc_id").alias("doc_id"),
            F.col("s.lang").alias("lang"),
            F.col("s.source").alias("source"),
            F.col("s.n_chars").alias("n_chars"),
        )
    )


def _read_curated_scrub_first(
    spark: SparkSession,
    state_dir: str,
    *,
    with_docs: bool,
    neardup_strategy: str | None = None,
) -> DataFrame:
    """The scrub-first read path: rebuild the raw corpus from the
    ids/texts state (keeper rows carry the texts — exact raw copies
    share a digest and scrub identically, so the min-per-raw-digest
    rows preserve every scrubbed-digest minimum), scrub it against the
    ACCUMULATED segment-frequency state, then run the batch funnel's
    own stage functions on the scrubbed frame. Reusing
    plans/curation_pipeline's stages verbatim is what makes
    stream ≡ batch structural rather than re-implemented: the only
    difference from ``curate(scrub_boilerplate_first=True)`` is where
    the docs and the segment frequencies come from."""
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _BOILER_DF,
        _segments,
    )
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        assign_split,
        dedup_exact,
        dedup_near,
        drop_contaminated,
        drop_repetitive,
    )

    texts = _read_state(spark, f"{state_dir}/texts", _TEXTS_SCHEMA).drop(
        "batch"
    )
    raw = (
        _keepers(spark, state_dir)
        .join(texts, "fp")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .localCheckpoint(eager=True)
    )
    segdf = (
        _read_state(spark, f"{state_dir}/segdf", _SEGDF_SCHEMA)
        .drop("batch")
        .groupBy("sh")
        .agg(F.sum("df").cast("long").alias("df"))
    )
    boiler = segdf.filter(F.col("df") >= _BOILER_DF).select("sh")
    segs = _segments(raw.select("doc_id", "text")).withColumn(
        "sh", _seg_digest()
    )
    rebuilt = (
        segs.join(F.broadcast(boiler), "sh", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "seg_text"))),
                    lambda s: s["seg_text"],
                ),
                " ",
            ).alias("_scrubbed")
        )
    )
    scrubbed = raw.join(rebuilt, "doc_id").select(
        "doc_id",
        F.col("_scrubbed").alias("text"),
        "lang",
        "source",
        F.length("_scrubbed").cast("long").alias("n_chars"),
    ).localCheckpoint(eager=True)
    d1 = dedup_exact(scrubbed)
    d2 = dedup_near(d1, strategy=neardup_strategy).localCheckpoint(
        eager=True
    )
    from etl_pipeline_candy_store_spark.operators.curation import quality_gate

    gated = quality_gate(d2).filter(F.col("passed") == 1).select("doc_id")
    d3 = d2.join(gated, "doc_id", "left_semi")
    d4 = drop_contaminated(drop_repetitive(d3)).localCheckpoint(eager=True)
    d5 = assign_split(d4)
    if with_docs:
        return d5.select(
            "doc_id", "text", "lang", "source", "n_chars", "split"
        )
    return d5.select("doc_id", "split")


def read_curated(
    spark: SparkSession,
    state_dir: str,
    *,
    with_docs: bool = False,
    scrub_boilerplate_first: bool = False,
    neardup_strategy: str | None = None,
) -> DataFrame:
    """(doc_id, split) survivors over everything ingested so far —
    equal to batch ``curate()``'s export over the same docs under ANY
    arrival order. Keepers, near-dup drops, and decontamination are all
    derived here from the digest-keyed state; ``with_docs`` keeps the
    full document columns (the export shape).
    ``scrub_boilerplate_first`` must match the flag the stream was run
    with — it selects the scrub-first state layout and derivation.

    ``neardup_strategy`` mirrors batch ``curate(neardup_strategy=...)``:
    ``None`` (default) consumes the incrementally maintained exact-
    Jaccard pair state (no text rescan — the amortized path); a family
    name or ``"auto"`` derives that detector's pairs ON READ over the
    elected keeper texts via the neardup() dispatcher. Ingest is
    family-agnostic (it stores one text copy per digest regardless), so
    the SAME accumulated state can be re-read under any detector —
    choosing a family is a read-time decision, not a re-ingest. The
    derive-on-read arrival-order independence argument is the
    scrub-first mode's: pairs are a pure function of the keeper set,
    which is itself order-independent (min-election over per-batch
    minima). Cost: one keeper-text scan per read, amortized by
    :func:`read_curated_materialized`."""
    if scrub_boilerplate_first:
        return _read_curated_scrub_first(
            spark,
            state_dir,
            with_docs=with_docs,
            neardup_strategy=neardup_strategy,
        )
    keep = _keepers(spark, state_dir).localCheckpoint(eager=True)
    flags = _read_state(spark, f"{state_dir}/flags", _FLAGS_SCHEMA).drop(
        "batch"
    )
    if neardup_strategy is not None:
        # family pairs derived on read over keeper texts (batch
        # curate() runs the dispatcher over d1 = post-exact-dedup
        # keepers — the same relation)
        from etl_pipeline_candy_store_spark.operators.neardup import (
            neardup,
        )

        texts = _read_state(spark, f"{state_dir}/texts", _TEXTS_SCHEMA).drop(
            "batch"
        )
        keeper_docs = keep.join(texts, "fp").select("doc_id", "text")
        id_pairs = neardup(keeper_docs, strategy=neardup_strategy).select(
            "doc_a", "doc_b"
        )
        drop = connected_components(id_pairs, "doc_a", "doc_b").filter(
            F.col("node") != F.col("label")
        )
        d2 = keep.join(
            drop.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
        )
        pairs = None
    else:
        pairs = _read_state(spark, f"{state_dir}/pairs", _PAIRS_SCHEMA).drop(
            "batch"
        )
        # near-dup drop: map digest pairs to elected keeper doc_ids, then
        # min-label components — exactly batch curate()'s q51-over-keepers
        d2 = keep
    if pairs is not None and not pairs.isEmpty():
        kid = keep.select("fp", "doc_id")
        id_pairs = (
            pairs.join(
                kid.select(
                    F.col("fp").alias("fp_a"), F.col("doc_id").alias("doc_a")
                ),
                "fp_a",
            )
            .join(
                kid.select(
                    F.col("fp").alias("fp_b"), F.col("doc_id").alias("doc_b")
                ),
                "fp_b",
            )
            .select("doc_a", "doc_b")
        )
        drop = connected_components(id_pairs, "doc_a", "doc_b").filter(
            F.col("node") != F.col("label")
        )
        d2 = keep.join(
            drop.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
        )
    # gates 3+4 from the content-determined flags
    d3r = (
        d2.join(flags, "fp")
        .filter((F.col("q_pass") == 1) & (F.col("rep_drop") == 0))
        .localCheckpoint(eager=True)
    )
    # decontamination exactly as batch curate() scopes it: eval shingles
    # from eval-side docs STILL IN d3r (eval membership = ELECTED keeper
    # doc_id), overlap counted over the stored shingle state — no text
    # rescan
    sh = _read_state(spark, f"{state_dir}/shingles", _SH_SCHEMA).drop("batch")
    eval_sh = (
        sh.join(
            d3r.filter(F.col("doc_id") < _EVAL_MAX_DOC).select("fp"),
            "fp",
            "left_semi",
        )
        .select("sh")
        .distinct()
    )
    contaminated = (
        sh.join(
            d3r.filter(F.col("doc_id") >= _EVAL_MAX_DOC).select("fp"),
            "fp",
            "left_semi",
        )
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("fp")
    )
    survivors = d3r.filter(F.col("doc_id") >= _EVAL_MAX_DOC).join(
        contaminated, "fp", "left_anti"
    )
    # the split byte was stored per digest at ingest (content-
    # determined), so the plain read is state-only; with_docs joins the
    # once-per-digest texts relation back, survivor-sized
    split = (
        F.when(F.col("h") < 230, F.lit("train"))
        .when(F.col("h") < 243, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split")
    )
    if with_docs:
        texts = _read_state(spark, f"{state_dir}/texts", _TEXTS_SCHEMA).drop(
            "batch"
        )
        return survivors.join(texts, "fp").select(
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
    scrub_boilerplate_first: bool = False,
    neardup_strategy: str | None = None,
) -> DataFrame:
    """``read_curated`` memoized per STATE GENERATION through the
    durable store (the ER twin's ``read_resolved_entities_materialized``
    pattern): the read-side derivation (keeper election + connected
    components over the pair state + the decontamination join — or, in
    scrub-first mode, the whole derived funnel) runs once per
    generation; repeat reads between micro-batches are a parquet scan,
    a new batch changes the fingerprint and the next read rebuilds
    once, and ``prune_materialized("stream_curated*", store_dir=...)``
    is the retention knob with the store's pinned-reader guarantee.
    Memoization is what amortizes the scrub-first mode's heavier read
    path (its ingest stores no derived state at all)."""
    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_relation,
    )

    if scrub_boilerplate_first:
        name = "stream_curated_scrub" + ("_docs" if with_docs else "")
        tables = ("ids", "fps", "texts", "segdf")
    else:
        name = "stream_curated" + ("_docs" if with_docs else "")
        tables = ("ids", "fps", "pairs", "flags", "shingles", "texts")
    if neardup_strategy is not None:
        # each detector family is its own derived relation — a minhash
        # read must never serve a cached winnow read (and vice versa)
        name += f"_{neardup_strategy}"
    return materialized_relation(
        spark,
        name,
        state_dir,
        build=lambda: read_curated(
            spark,
            state_dir,
            with_docs=with_docs,
            scrub_boilerplate_first=scrub_boilerplate_first,
            neardup_strategy=neardup_strategy,
        ),
        tables=tables,
        store_dir=store_dir,
    )
