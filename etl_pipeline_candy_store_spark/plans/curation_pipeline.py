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
  6. split assignment   (deterministic content-hash train/val/test)
  7. shard export       (content-stable hash shards + manifest per split)

Every stage is the SAME logic as its oracle-verified catalog query
(q50/q51+q54/q59/q122/q58/q80) applied to the shrinking survivor frame,
so the pipeline inherits their verified semantics; the funnel report
makes each stage's cost/yield visible.

Scale posture: stages 1-6 are shuffles on content digests / shingles /
gram keys / cluster keys only — the full text rides along in at most one
shuffle per stage; 3 and 6 are stateless row-local filters. Nothing ever
collects documents to the driver (the report carries counts, not rows).
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
from etl_pipeline_candy_store_spark.operators.dedup import (
    _shingles,
    connected_components,
    jaccard_pairs,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.sources.writers import write_training_shards


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact content digest."""
    keep = (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


def dedup_near(docs: DataFrame) -> DataFrame:
    """Keep one doc per near-duplicate cluster (Jaccard pairs ->
    connected components -> min doc_id per component)."""
    pairs = jaccard_pairs(docs).select("doc_a", "doc_b")
    cc = connected_components(pairs, "doc_a", "doc_b")
    # nodes absent from cc are singletons (their own keeper)
    drop = cc.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def drop_repetitive(
    docs: DataFrame,
    *,
    top_bigram_max_micros: int = 600_000,
    dup_trigram_max_micros: int = 400_000,
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


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 4,
) -> dict:
    """Run the full curation funnel and export per-split shards.

    Returns a report: per-stage survivor counts plus each split's shard
    manifest. The input and every stage output are cached (each stage
    consumes its input more than once — e.g. exact dedup scans docs for
    the digest groupBy AND the semi-join back — so the source parquet
    would otherwise be rescanned per consumer); stage counts are
    aggregates, never collects.
    """
    docs = load(spark, sf_dir, "documents").cache()
    report: dict = {"funnel": {"input": docs.count()}}

    d1 = dedup_exact(docs).cache()
    report["funnel"]["after_exact_dedup"] = d1.count()

    d2 = dedup_near(d1).cache()
    report["funnel"]["after_near_dedup"] = d2.count()

    gated = quality_gate(d2).filter(F.col("passed") == 1).select("doc_id")
    d3 = d2.join(gated, "doc_id", "left_semi").cache()
    report["funnel"]["after_quality_gate"] = d3.count()

    d3r = drop_repetitive(d3).cache()
    report["funnel"]["after_repetition_gate"] = d3r.count()

    d4 = drop_contaminated(d3r).cache()
    report["funnel"]["after_decontamination"] = d4.count()

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
    for df in (docs, d1, d2, d3, d3r, d4):
        df.unpersist()
    return report
