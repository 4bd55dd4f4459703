"""End-to-end training-data curation pipeline.

Chains the catalog's curation operators into the flow a pretraining
data team actually runs, documents -> shards:

  1. exact dedup        (md5 digest groupBy, keep min doc_id)
  2. near-dup dedup     (Jaccard pairs -> connected components ->
                         keep one doc per duplicate cluster)
  3. quality gate       (Gopher-style integer metrics filter)
  4. repetition gate    (q122's within-doc signals: drop boilerplate /
                         generation-loop docs by bigram/trigram shares)
  5. decontamination    (drop docs overlapping the held-out eval set)
  6. governance report  (license clearance through the reused near-dup
                         clusters + temperature mixture weights, q201/
                         q200 — source-count-sized, carried in-report)
  7. split assignment   (deterministic content-hash train/val/test)
  8. shard export       (content-stable hash shards + manifest per split)

Every stage is the SAME logic as its oracle-verified catalog query
(q50/q51+q54/q59/q122/q58/q201/q200/q80) applied to the shrinking
survivor frame, so the pipeline inherits their verified semantics; the
funnel report makes each stage's cost/yield visible.

Scale posture: stages 1-2 and 4-5 are shuffles on content digests /
shingles / gram keys / cluster keys only — the full text rides along in
at most one shuffle per stage; 3 and 7 are stateless row-local filters;
6 adds one cluster-keyed window plus two source-count-sized collects
(20-row relations — counts, not data). Nothing ever collects documents
to the driver (the report carries counts, not rows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.curation import (
    _CONTAM_MIN_OVERLAP,
    _EVAL_MAX_DOC,
    _h256,
    quality_gate,
)
from etl_pipeline_candy_store_spark.operators.text import (
    REP_DUP_TRIGRAM_MAX_MICROS,
    REP_TOP_BIGRAM_MAX_MICROS,
)
from etl_pipeline_candy_store_spark.operators.dedup import (
    _shingles,
    connected_components,
    jaccard_pairs,
)
from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, load, register
from etl_pipeline_candy_store_spark.sources.writers import write_training_shards


def scrub_boilerplate(docs: DataFrame) -> DataFrame:
    """q229's frequency-based segment scrub as a REWRITE stage: drop
    every segment whose corpus-wide document frequency reaches the
    boilerplate threshold, rebuild each doc's text from the surviving
    segments in original order, and drop docs left empty (pure
    boilerplate). Runs BEFORE exact dedup when enabled — scrubbing
    changes content digests, and (as in CCNet) removing nav bars /
    footers first is exactly what lets doc-level dedup see through
    per-site templating. ``n_chars`` is refreshed to the rewritten
    text so downstream metric stages stay consistent.

    Scale posture: the q229 plan (one explode, one segment-keyed agg,
    one equi-join back) plus one per-doc ordered re-aggregation — the
    q203 rewrite discipline; nothing pairwise, one shuffle per step,
    all keys doc- or segment-bounded."""
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _BOILER_DF,
        _segments,
    )

    segs = _segments(docs.select("doc_id", "text"))
    df = segs.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = df.filter(F.col("df") >= _BOILER_DF).select(
        "seg_text", F.lit(True).alias("is_boiler")
    )
    rebuilt = (
        segs.join(F.broadcast(boiler), "seg_text", "left")
        .filter(F.col("is_boiler").isNull())
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
    other = [c for c in docs.columns if c not in ("text", "n_chars")]
    out = docs.join(rebuilt, "doc_id").select(
        *other, F.col("_scrubbed").alias("text")
    )
    if "n_chars" in docs.columns:
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    return out.select(docs.columns)


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact content digest."""
    keep = (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def near_dup_labels(
    docs: DataFrame, strategy: str | None = None
) -> DataFrame:
    """Near-dup component labels (node, label): detector pairs ->
    connected components. Nodes absent are singletons (their own
    keeper). The single copy both :func:`dedup_near` and the pipeline's
    governance report consume.

    ``strategy=None`` (default) is the funnel's historical exact
    Jaccard path (q51 — hash-equal to every prior round's funnel and
    to the stateful/stateless conformance oracle). Any other value is
    handed to the :func:`~..operators.neardup.neardup` dispatcher:
    a forced family (``"minhash"``/``"simhash"``/``"winnow"``/
    ``"containment_bounded"``/``"containment"``/``"edit_bounded"``/
    ``"edit"``) or
    ``"auto"`` (probe-dispatched). Every family emits (doc_a, doc_b)
    pair columns, so the component/keeper mechanics downstream are
    family-agnostic."""
    if strategy is None:
        pairs = jaccard_pairs(docs).select("doc_a", "doc_b")
    else:
        from etl_pipeline_candy_store_spark.operators.neardup import (
            neardup,
        )

        pairs = neardup(
            docs.select("doc_id", "text"), strategy=strategy
        ).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b")


def dedup_near(
    docs: DataFrame,
    cc: DataFrame | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """Keep one doc per near-duplicate cluster (min doc_id per
    component). Pass precomputed :func:`near_dup_labels` to reuse them
    across stages; ``strategy`` selects the detector family when labels
    are computed here (see :func:`near_dup_labels`)."""
    if cc is None:
        cc = near_dup_labels(docs, strategy=strategy)
    drop = cc.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def drop_repetitive(
    docs: DataFrame,
    *,
    top_bigram_max_micros: int = REP_TOP_BIGRAM_MAX_MICROS,
    dup_trigram_max_micros: int = REP_DUP_TRIGRAM_MAX_MICROS,
) -> DataFrame:
    """q122's repetition gate as a pipeline stage: drop documents whose
    most-frequent-bigram share or duplicated-trigram share exceeds the
    thresholds (boilerplate and generation-loop catchers; the defaults
    are permissive on prose and aggressive on templated spam).

    Anti-joins against the exceeders rather than semi-joining the
    passers: a doc with NULL/empty text emits no gram rows at all, so a
    semi-join would silently drop it even though it is not repetitive —
    signal-less docs must pass through a gate that only targets
    repetition."""
    from etl_pipeline_candy_store_spark.operators.text import repetition_signals

    drop = repetition_signals(docs).filter(
        (F.col("top_bigram_frac_micros") > top_bigram_max_micros)
        | (F.col("dup_trigram_frac_micros") > dup_trigram_max_micros)
    ).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


def drop_contaminated(docs: DataFrame) -> DataFrame:
    """Drop training docs sharing >= _CONTAM_MIN_OVERLAP distinct
    shingles with the held-out eval set (doc_id < _EVAL_MAX_DOC), and
    the eval docs themselves."""
    sh = _shingles(docs)
    eval_sh = (
        sh.filter(F.col("doc_id") < _EVAL_MAX_DOC).select("shingle").distinct()
    )
    contaminated = (
        sh.filter(F.col("doc_id") >= _EVAL_MAX_DOC)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("doc_id")
    )
    return docs.filter(F.col("doc_id") >= _EVAL_MAX_DOC).join(
        contaminated, "doc_id", "left_anti"
    )


def assign_split(docs: DataFrame) -> DataFrame:
    """Deterministic content-hash train/val/test (~90/5/5) — q80's rule,
    carried as a column."""
    h = _h256()
    return docs.withColumn(
        "split",
        F.when(h < 230, F.lit("train")).when(h < 243, F.lit("val")).otherwise("test"),
    )


def governance_report(
    docs: DataFrame, d1: DataFrame, cc: DataFrame, survivors: DataFrame
) -> dict:
    """Stage-6 governance + mixing over the FINAL survivor set (both
    relations are source-count-sized — tiny, so carrying them in the
    report dict is counts, not data):

    - license clearance audits the survivors against the strictest
      license anywhere in their duplicate closure — q201's semantics at
      the pipeline boundary. A keeper's EFFECTIVE rank first folds in
      copies dropped at the exact-dedup stage (identical text means
      identical near-dup relations, so the strictest rank within a
      doc's content-digest group over the ORIGINAL corpus stands in for
      every dropped exact copy); the cluster-window max then covers the
      full exact+near closure even though jaccard ran on
      post-exact-dedup survivors only.
    - temperature mixture weights (q200) give the epoch's per-source
      sampling rates over what actually ships.

    ``docs`` is the original corpus, ``d1`` the post-exact-dedup
    keepers, ``cc`` their near-dup labels, ``survivors`` the final
    frame."""
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        temperature_weights,
    )
    from etl_pipeline_candy_store_spark.operators.scrub import (
        _LIC_RANK_SQL,
        license_rollup,
        with_cluster_rank,
    )

    fp_rank = (
        docs.select(
            F.md5(F.col("text").cast("binary")).alias("fp"),
            F.expr(_LIC_RANK_SQL).alias("r"),
        )
        .groupBy("fp")
        .agg(F.max("r").alias("rank_exact"))
    )
    lic_all = (
        d1.select(
            "doc_id",
            "source",
            F.expr(_LIC_RANK_SQL).alias("lic_rank"),
            F.md5(F.col("text").cast("binary")).alias("fp"),
        )
        .join(fp_rank, "fp")
        .join(cc, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            "source",
            "lic_rank",
            "rank_exact",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    marked = with_cluster_rank(lic_all, rank_col="rank_exact").join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    )
    return {
        "license": {
            r["source"]: {
                "n_docs": r["n_docs"],
                "n_restricted_own": r["n_restricted_own"],
                "n_blocked_by_copy": r["n_blocked_by_copy"],
                "n_cleared": r["n_cleared"],
            }
            for r in license_rollup(marked).collect()
        },
        "mixture": {
            r["source"]: {
                "n_tokens": r["n_tokens"],
                "weight_ppm": r["weight_ppm"],
                "boost_ppm": r["boost_ppm"],
            }
            for r in temperature_weights(survivors).collect()
        },
    }


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 4,
    stage_seconds: dict | None = None,
    corpus_state_dir: str | None = None,
    scrub_boilerplate_first: bool = False,
    neardup_strategy: str | None = None,
) -> dict:
    """Run the full curation funnel and export per-split shards.

    ``neardup_strategy`` routes the near-dedup stage through the
    :func:`~..operators.neardup.neardup` dispatcher: a forced family or
    ``"auto"`` (one probe aggregate over the post-exact-dedup keepers
    picks the family; the decision is resolved HERE and recorded in
    the report as ``near_dup_family``, so a run is auditable and the
    probe pays once). The default ``None`` keeps the funnel's
    historical exact-Jaccard pairs — hash-equal to every prior round
    and to the stateful conformance oracle. Incompatible with
    ``corpus_state_dir``: the incremental pair state implements the
    Jaccard family only (its q216 oracle locks it to plain q51), so
    combining them raises rather than silently switching semantics.

    With ``corpus_state_dir`` the near-dedup stage runs STATEFULLY
    (:mod:`..operators.neardup_state`): pairs among docs already in
    state are read back instead of recomputed, only the new slice pays
    shingle-join cost, and the state is extended for the next run. The
    pair semantics are exact (q216's oracle locks them to plain q51),
    so the funnel is hash-equal to the stateless mode — the only
    difference is that a replayed or grown corpus stops paying the
    pipeline's dominant stage (66-75% of wall time) per run.

    Returns a report: per-stage survivor counts plus each split's shard
    manifest. The input and every stage output are cached (each stage
    consumes its input more than once — e.g. exact dedup scans docs for
    the digest groupBy AND the semi-join back — so the source parquet
    would otherwise be rescanned per consumer); stage counts are
    aggregates, never collects.

    Pass ``stage_seconds`` (any dict) to receive per-stage wall-time
    attribution — each stage's count materializes that stage's cached
    frame, so the lap around it is that stage's real cost. This is what
    ``tools/pipeline_probe.py`` gates the composed pipeline's scale
    posture on (the per-query probes gate each stage's standalone twin;
    this hook makes the COMPOSITION measurable).
    """
    import time as _time

    if corpus_state_dir is not None and neardup_strategy is not None:
        raise ValueError(
            "corpus_state_dir implements the exact-Jaccard family only "
            "(q216 oracle); pass neardup_strategy=None with it, or drop "
            "the state dir to choose a detector family"
        )

    _last = [_time.time()]

    def lap(stage: str) -> None:
        now = _time.time()
        if stage_seconds is not None:
            stage_seconds[stage] = round(now - _last[0], 2)
        _last[0] = now

    docs = load(spark, sf_dir, "documents").cache()
    report: dict = {"funnel": {"input": docs.count()}}
    lap("load")

    if scrub_boilerplate_first:
        # CCNet-order: template removal BEFORE doc-level dedup, so
        # per-site boilerplate can't mask otherwise-identical bodies.
        # Changes content digests, so it is opt-in — the default funnel
        # stays hash-equal to the stateless/stateful conformance oracle.
        scrubbed = scrub_boilerplate(docs).cache()
        report["funnel"]["after_boilerplate_scrub"] = scrubbed.count()
        lap("boilerplate_scrub")
        docs_in = scrubbed
    else:
        docs_in = docs

    d1 = dedup_exact(docs_in).cache()
    report["funnel"]["after_exact_dedup"] = d1.count()
    lap("exact_dedup")

    # near-dup labels are computed ONCE and reused twice: the dedup drop
    # here, and the license-clearance governance report below (survivors
    # inherit the strictest license of cluster-mates the funnel dropped)
    if neardup_strategy == "auto":
        # resolve the dispatch OUTSIDE neardup() so the decision lands
        # in the report and the probe runs once, not per consumer
        from etl_pipeline_candy_store_spark.operators.neardup import (
            neardup_signals,
            pick_strategy,
        )

        neardup_strategy = pick_strategy(neardup_signals(d1))
    report["near_dup_family"] = neardup_strategy or "jaccard"
    if corpus_state_dir is None:
        cc = near_dup_labels(d1, strategy=neardup_strategy).cache()
    else:
        from etl_pipeline_candy_store_spark.operators.neardup_state import (
            neardup_labels_incremental,
        )

        cc = neardup_labels_incremental(d1, corpus_state_dir).cache()
    d2 = dedup_near(d1, cc).cache()
    report["funnel"]["after_near_dedup"] = d2.count()
    lap("near_dedup")

    gated = quality_gate(d2).filter(F.col("passed") == 1).select("doc_id")
    d3 = d2.join(gated, "doc_id", "left_semi").cache()
    report["funnel"]["after_quality_gate"] = d3.count()
    lap("quality_gate")

    d3r = drop_repetitive(d3).cache()
    report["funnel"]["after_repetition_gate"] = d3r.count()
    lap("repetition_gate")

    d4 = drop_contaminated(d3r).cache()
    report["funnel"]["after_decontamination"] = d4.count()
    lap("decontamination")

    # governance folds exact-dedup copies back in via content digests,
    # so it must see the SAME text generation the dedup stages keyed on
    # (the scrubbed corpus when the scrub stage ran)
    report["governance"] = governance_report(docs_in, d1, cc, d4)
    cc.unpersist()
    lap("governance")

    d5 = assign_split(d4)
    report["splits"] = {}
    for split in ("train", "val", "test"):
        part = d5.filter(F.col("split") == split).drop("split")
        manifest = write_training_shards(
            part,
            os.path.join(out_dir, f"split={split}"),
            key_cols=["doc_id"],
            n_shards=n_shards,
            order_cols=["source", "doc_id"],
        )
        report["splits"][split] = {
            "n_docs": manifest["total_rows"],
            "manifest": manifest,
        }
    lap("shard_export")
    if docs_in is not docs:
        docs_in.unpersist()
    for df in (docs, d1, d2, d3, d3r, d4):
        df.unpersist()
    return report


@register(
    "q160_curation_ledger",
    oracle=None,  # composed below from the gates' registered SQL
    doc="Auditable per-document curation decision record: every gate's "
    "verdict as an independent boolean (exact dup, near dup, quality "
    "fail, repetition, lexical AND semantic eval-set contamination, "
    "license block through the duplicate closure, eval membership) "
    "plus the conjunction keep flag — the ledger a compliance review "
    "reads to answer WHY a document was dropped, where the funnel "
    "(:func:`curate`) only reports stage counts. Each verdict composes "
    "the SAME registered semantics as the standalone gate queries "
    "(q50/q54/q59/q122/q58/q199/q201 — single copy, from the registry), "
    "evaluated INDEPENDENTLY on the full corpus (documented difference "
    "from the staged funnel, where later gates see only survivors). "
    "Gate relations that only emit flagged/signal rows join back LEFT "
    "with NULL→false, so signal-less docs are never silently dropped "
    "(the q58/q122 NULL-handling lesson).",
)
def q160_curation_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from etl_pipeline_candy_store_spark.operators.curation import (
        _EVAL_MAX_DOC,
        q58_decontamination,
        quality_gate,
    )
    from etl_pipeline_candy_store_spark.operators.dedup import (
        dedup_clusters_checkpointed,
    )
    from etl_pipeline_candy_store_spark.operators.text import (
        repetition_signals,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, load, register

    d = load(spark, sf_dir, "documents")
    w_fp = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    ex = d.select(
        "doc_id",
        (F.col("doc_id") != F.min("doc_id").over(w_fp)).alias("is_exact_dup"),
    )
    near = dedup_clusters_checkpointed(spark, sf_dir).select(
        "doc_id", (F.col("cluster_id") != F.col("doc_id")).alias("is_near_dup")
    )
    qual = quality_gate(d).select(
        "doc_id", (F.col("passed") == 0).alias("fails_quality")
    )
    rep = repetition_signals(d).select(
        "doc_id",
        (
            (F.col("top_bigram_frac_micros") > REP_TOP_BIGRAM_MAX_MICROS)
            | (F.col("dup_trigram_frac_micros") > REP_DUP_TRIGRAM_MAX_MICROS)
        ).alias("rep_hit"),
    )
    contam = q58_decontamination(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("contam_hit")
    )
    # round-9 governance verdicts, same single-copy composition:
    # semantic contamination (q199, vec_id ≡ doc_id in the synthetic
    # tables) and license block (own license clears but a q54/q125
    # cluster-mate is restricted — q201's per-doc flag)
    from etl_pipeline_candy_store_spark.operators.curation import (
        q199_semantic_decontamination,
    )
    from etl_pipeline_candy_store_spark.operators.scrub import (
        _LIC_RANK_SQL,
        with_cluster_rank,
    )

    sem = q199_semantic_decontamination(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("sem_hit")
    )
    licm = with_cluster_rank(
        dedup_clusters_checkpointed(spark, sf_dir).join(
            d.select("doc_id", F.expr(_LIC_RANK_SQL).alias("lic_rank")),
            "doc_id",
        )
    ).select(
        "doc_id",
        ((F.col("lic_rank") < 2) & (F.col("cluster_rank") == 2)).alias(
            "lic_blocked"
        ),
    )
    out = (
        ex.join(near, "doc_id")
        .join(qual, "doc_id")
        .join(rep, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .join(licm, "doc_id")
        .select(
            "doc_id",
            "is_exact_dup",
            "is_near_dup",
            "fails_quality",
            F.coalesce("rep_hit", F.lit(False)).alias("is_repetitive"),
            F.coalesce("contam_hit", F.lit(False)).alias("is_contaminated"),
            F.coalesce("sem_hit", F.lit(False)).alias(
                "is_semantic_contaminated"
            ),
            F.col("lic_blocked").alias("is_license_blocked"),
            (F.col("doc_id") < _EVAL_MAX_DOC).alias("is_eval"),
        )
    )
    return out.withColumn(
        "keep",
        ~(
            F.col("is_exact_dup")
            | F.col("is_near_dup")
            | F.col("fails_quality")
            | F.col("is_repetitive")
            | F.col("is_contaminated")
            | F.col("is_semantic_contaminated")
            | F.col("is_license_blocked")
            | F.col("is_eval")
        ),
    )


def _q160_oracle() -> str:
    from etl_pipeline_candy_store_spark.operators.curation import (
        _EVAL_MAX_DOC,
    )
    from etl_pipeline_candy_store_spark.operators import text  # noqa: F401
    from etl_pipeline_candy_store_spark.operators.dedup import _CLUSTERS_SQL
    from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY

    q59 = REGISTRY["q59_quality_filter"].oracle
    q122 = REGISTRY["q122_repetition_signals"].oracle
    q58 = REGISTRY["q58_decontamination"].oracle
    q199 = REGISTRY["q199_semantic_decontamination"].oracle
    from etl_pipeline_candy_store_spark.operators.scrub import _LIC_RANK_SQL

    return f"""
WITH cl AS ({_CLUSTERS_SQL}),
q59 AS ({q59}),
q122 AS ({q122}),
contam AS ({q58}),
sem AS ({q199}),
licm AS (
  SELECT cl.doc_id,
         {_LIC_RANK_SQL} AS lic_rank,
         MAX({_LIC_RANK_SQL})
           OVER (PARTITION BY cl.cluster_id) AS cluster_rank
  FROM cl JOIN documents USING (doc_id)
),
ex AS (
  SELECT doc_id,
         doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_exact_dup
  FROM documents
),
led AS (
  SELECT d.doc_id,
         ex.is_exact_dup,
         cl.cluster_id <> d.doc_id AS is_near_dup,
         q59.passed = 0 AS fails_quality,
         COALESCE(q122.top_bigram_frac_micros > {REP_TOP_BIGRAM_MAX_MICROS}
                  OR q122.dup_trigram_frac_micros > {REP_DUP_TRIGRAM_MAX_MICROS}, FALSE)
           AS is_repetitive,
         contam.doc_id IS NOT NULL AS is_contaminated,
         sem.vec_id IS NOT NULL AS is_semantic_contaminated,
         licm.lic_rank < 2 AND licm.cluster_rank = 2 AS is_license_blocked,
         d.doc_id < {_EVAL_MAX_DOC} AS is_eval
  FROM documents d
  JOIN ex ON ex.doc_id = d.doc_id
  JOIN cl ON cl.doc_id = d.doc_id
  JOIN q59 ON q59.doc_id = d.doc_id
  LEFT JOIN q122 ON q122.doc_id = d.doc_id
  LEFT JOIN contam ON contam.doc_id = d.doc_id
  LEFT JOIN sem ON sem.vec_id = d.doc_id
  JOIN licm ON licm.doc_id = d.doc_id
)
SELECT *,
       NOT (is_exact_dup OR is_near_dup OR fails_quality OR is_repetitive
            OR is_contaminated OR is_semantic_contaminated
            OR is_license_blocked OR is_eval) AS keep
FROM led
"""


import dataclasses as _dc_led

REGISTRY["q160_curation_ledger"] = _dc_led.replace(
    REGISTRY["q160_curation_ledger"], oracle=_q160_oracle()
)
