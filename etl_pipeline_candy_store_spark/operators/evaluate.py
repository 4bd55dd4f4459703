"""Distributed classifier evaluation.

Exact tie-corrected ROC AUC over the linear-probe scores (q134's model)
— the evaluation half of the train/score/evaluate loop a 100 TB
curation stack runs continuously. The algorithm is the score-level
aggregation form Spark's own ``BinaryClassificationMetrics`` uses:
collapse the corpus to per-distinct-score (positives, negatives)
counts, then accumulate the Mann-Whitney pair count

    AUC * 2*P*N = sum over scores s of pos_at(s) * (2*neg_below(s) + neg_at(s))

(ties between a positive and a negative contribute 1 of 2 — the
standard trapezoidal tie correction). Everything is integer, so the
result is bit-identical cross-engine.

The reference has no evaluation surface (its quality signals are
unvalidated heuristics — /root/reference/src/data_processor.py); this
extends the classifier operators (q130/q134) the way SURVEY §2's
training-data extensions demand: no model goes into the curation gate
without a measured AUC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.text import (
    _PROBE_CTES,
    probe_doc_scores,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register

#: score-range bucket width for the two-level prefix sum (q119 pattern)
_AUC_BUCKET = 65536


def binary_auc(scored: DataFrame, score_col: str = "score", label_col: str = "y") -> DataFrame:
    """Exact tie-corrected AUC from a (score, y∈{0,1}) relation.

    One row out: (n_pos, n_neg, n_scores, auc_ppm). Scale shape: the
    corpus collapses to ONE map-side-combinable aggregation on the
    distinct score key; the cumulative negatives-below count then runs
    as a two-level prefix sum over that score-level relation — an
    in-bucket window PARTITIONED by a score-range bucket plus one
    unpartitioned window over per-bucket totals (a relation 2^16x
    smaller) — so no window ever serializes the full score distribution
    through a single task, matching the q119 prefix-sum discipline.
    Truncating `div` bucketing is order-preserving (nondecreasing in
    score, negatives included), so (bkt, score) order equals global
    score order and the prefix sum is exactly the oracle's window.
    """
    from pyspark.sql.window import Window

    per = (
        scored.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.sum(label_col).cast("long").alias("pos_at"),
            F.sum(1 - F.col(label_col)).cast("long").alias("neg_at"),
        )
    )
    per = per.withColumn("bkt", F.expr(f"score div {_AUC_BUCKET}"))
    # `per` (score-level, far smaller than the input) feeds the local
    # window, the bucket totals, AND the final join — checkpoint it so
    # the upstream corpus aggregation runs once, not three times
    per = per.localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy("bkt")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = per.withColumn(
        "loc", F.coalesce(F.sum("neg_at").over(w_local), F.lit(0))
    )
    btot = per.groupBy("bkt").agg(F.sum("neg_at").alias("bn"))
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "bkt", F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("boff")
    )
    c = local.join(F.broadcast(boff), "bkt").select(
        "pos_at",
        "neg_at",
        (F.col("boff") + F.col("loc")).alias("neg_below"),
    )
    return c.agg(
        F.sum("pos_at").cast("long").alias("n_pos"),
        F.sum("neg_at").cast("long").alias("n_neg"),
        F.count(F.lit(1)).cast("long").alias("n_scores"),
        F.sum(
            F.col("pos_at") * (2 * F.col("neg_below") + F.col("neg_at"))
        ).alias("num"),
    ).select(
        "n_pos",
        "n_neg",
        "n_scores",
        # NULLIF on both sides: a single-class input (P or N = 0) yields
        # NULL AUC in both engines instead of Spark-NULL vs DuckDB-error
        F.expr("(num * 1000000) div NULLIF(2 * n_pos * n_neg, 0)")
        .cast("long")
        .alias("auc_ppm"),
    )


@register(
    "q137_probe_auc",
    oracle=f"""
WITH {_PROBE_CTES},
s AS (
  SELECT lab.y, COALESCE(sc.score, 0) AS score
  FROM lab LEFT JOIN scores sc USING (doc_id)
),
per AS (
  SELECT score, CAST(SUM(y) AS BIGINT) AS pos_at,
         CAST(SUM(1 - y) AS BIGINT) AS neg_at
  FROM s GROUP BY score
),
c AS (
  SELECT pos_at, neg_at,
         COALESCE(SUM(neg_at) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS neg_below
  FROM per
)
SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos,
       CAST(SUM(neg_at) AS BIGINT) AS n_neg,
       CAST(COUNT(*) AS BIGINT) AS n_scores,
       CAST(SUM(pos_at * (2 * neg_below + neg_at)) * 1000000
            // NULLIF(2 * SUM(pos_at) * SUM(neg_at), 0) AS BIGINT) AS auc_ppm
FROM c
""",
    doc="Exact tie-corrected ROC AUC of the one-pass linear probe "
    "(q134's model) against the lang='en' label — the distributed "
    "Mann-Whitney statistic in integer ppm. The corpus collapses to "
    "per-distinct-score (pos, neg) counts in ONE combinable agg; the "
    "cumulative term is a two-level prefix sum over that score-level "
    "relation (q119 discipline — no full-distribution single-task "
    "window); ties get the standard 1/2 credit via the all-integer "
    "2*P*N denominator. Composes q134's probe CTEs verbatim (single "
    "copy of the scoring semantics). On this synthetic corpus the "
    "label is independent of text, so AUC lands near 500000 ppm — the "
    "catalog checks the distributed evaluation computation, and the "
    "near-chance value is itself the honest readout.",
)
def q137_probe_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = probe_doc_scores(load(spark, sf_dir, "documents"))
    return binary_auc(scored)


@register(
    "q143_calibration_bins",
    oracle=f"""
WITH {_PROBE_CTES},
s AS (
  SELECT lab.y, COALESCE(sc.score, 0) AS score
  FROM lab LEFT JOIN scores sc USING (doc_id)
)
SELECT CAST(CASE WHEN score >= 0 THEN score // 4096
            ELSE -((-score + 4095) // 4096) END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(SUM(y) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       CAST(SUM(score) AS BIGINT) AS sum_score
FROM s GROUP BY bin
""",
    doc="Classifier calibration table (reliability-diagram input) for "
    "the q134 probe: fixed-width score bins (floor division by 4096, "
    "negatives floored explicitly so both engines agree regardless of "
    "their native div semantics), per-bin count / positives / positive "
    "rate in ppm / score mass. ONE map-side-combinable aggregation on "
    "the bin key — the whole-corpus eval that says WHERE the "
    "classifier's confidence is miscalibrated, complementing q137's "
    "single-number AUC. All integer.",
)
def q143_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = probe_doc_scores(load(spark, sf_dir, "documents"))
    # explicit floor for negatives: Spark `div` truncates toward zero,
    # DuckDB `//` floors — spelling the floor out keeps both identical
    bin_col = F.expr(
        "CASE WHEN score >= 0 THEN score div 4096"
        " ELSE -((-score + 4095) div 4096) END"
    ).cast("long")
    return (
        s.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.expr("sum(y) * 1000000 div count(1)").cast("long").alias(
                "pos_rate_ppm"
            ),
            F.sum("score").cast("long").alias("sum_score"),
        )
    )


# --- Bootstrap confidence intervals -------------------------------------

_BOOT_B = 32  # replicates; lo/hi = 2nd smallest / 2nd largest ≈ 5%/95%

#: portable per-(doc, replicate) multiplier weight in {0, 1, 2}: two md5
#: hex chars of "doc_id:b" -> 0..255, mod 3. E[w] = 255/256 (documented
#: 1/256 bias from 256 % 3 = 1), Var ≈ 2/3 — the multiplier-bootstrap
#: weight family (Poisson(1)-like), deterministic in BOTH engines via
#: the _h256 hex-char arithmetic (no hex->int casts, which differ).
_BOOT_KEY_SQL = "md5(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))"
_BOOT_W_SQL = (
    f"((instr('0123456789abcdef', substr({_BOOT_KEY_SQL}, 1, 1)) - 1) * 16"
    f" + (instr('0123456789abcdef', substr({_BOOT_KEY_SQL}, 2, 1)) - 1)) % 3"
)


def _boot_w_spark() -> "F.Column":
    key = F.md5(
        F.concat(
            F.col("doc_id").cast("string"), F.lit(":"), F.col("b").cast("string")
        ).cast("binary")
    )
    hexpos = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(key, i, 1)
    ) - 1
    return ((hexpos(1) * 16 + hexpos(2)) % 3).cast("long")


def bootstrap_rate_ci(flags: DataFrame, b_reps: int = _BOOT_B) -> DataFrame:
    """Deterministic multiplier-bootstrap CI for a pass RATE over a
    (doc_id, passed∈{0,1}) relation: B replicate rates, each reweighting
    every doc by a hash-derived {0,1,2} multiplier (resampling the
    corpus WITHOUT materializing B resamples — the only bootstrap that
    scales: the fan-out is B× of a two-integer-column relation, never
    the text), then order statistics over the B-row replicate relation.

    Returns ONE row: (n_docs, pass_rate_ppm, boot_lo_ppm, boot_hi_ppm,
    n_replicates) with lo/hi the 2nd smallest / 2nd largest replicate
    (≈ 5th/95th percentile at B=32)."""
    q = flags.select("doc_id", F.col("passed").cast("long").alias("passed"))
    point = q.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST(SUM(passed) * 1000000 div COUNT(*) AS BIGINT)").alias(
            "pass_rate_ppm"
        ),
    )
    fan = q.select(
        "doc_id", "passed", F.explode(F.expr(f"sequence(0, {b_reps - 1})")).alias("b")
    ).withColumn("w", _boot_w_spark())
    # an all-zero-weight replicate (possible only on tiny corpora) yields
    # NULL; coalesce to 0 BEFORE the order statistics — Spark collect_list
    # drops NULLs while DuckDB list() sorts them first, so a NULL here
    # would silently shift the 2nd-smallest/2nd-largest cross-engine
    rep = fan.groupBy("b").agg(
        F.expr(
            "COALESCE(CAST(SUM(w * passed) * 1000000"
            " div NULLIF(SUM(w), 0) AS BIGINT), 0)"
        ).alias("rate_ppm")
    )
    ci = rep.agg(
        F.expr("element_at(array_sort(collect_list(rate_ppm)), 2)")
        .cast("long")
        .alias("boot_lo_ppm"),
        F.expr(
            f"element_at(array_sort(collect_list(rate_ppm)), {b_reps - 1})"
        )
        .cast("long")
        .alias("boot_hi_ppm"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_docs",
        "pass_rate_ppm",
        "boot_lo_ppm",
        "boot_hi_ppm",
        F.lit(b_reps).cast("long").alias("n_replicates"),
    )


@register(
    "q211_bootstrap_pass_rate",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
),
q AS (
  SELECT doc_id,
         CAST(CASE WHEN n_tokens BETWEEN 10 AND 1000
                    AND n_alpha * 2 >= n_chars
                    AND n_chars BETWEEN n_tokens * 2 AND n_tokens * 12
               THEN 1 ELSE 0 END AS BIGINT) AS passed
  FROM m
),
fan AS (
  SELECT doc_id, passed, bb.b, {_BOOT_W_SQL} AS w
  FROM q, (SELECT unnest(range(0, {_BOOT_B})) AS b) bb
),
rep AS (
  SELECT b, COALESCE(CAST(SUM(w * passed) * 1000000 // NULLIF(SUM(w), 0)
                     AS BIGINT), 0) AS rate_ppm
  FROM fan GROUP BY b
),
arr AS (SELECT list_sort(list(rate_ppm)) AS a FROM rep)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n_docs,
       (SELECT CAST(SUM(passed) * 1000000 // COUNT(*) AS BIGINT) FROM q)
         AS pass_rate_ppm,
       CAST(a[2] AS BIGINT) AS boot_lo_ppm,
       CAST(a[{_BOOT_B - 1}] AS BIGINT) AS boot_hi_ppm,
       CAST({_BOOT_B} AS BIGINT) AS n_replicates
FROM arr
""",
    doc="Deterministic multiplier-bootstrap confidence interval for the "
    "q59 quality-gate pass rate — the funnel yield a data team reports "
    "WITH error bars instead of a bare point estimate. 32 replicate "
    "rates, each reweighting every doc by a portable hash-derived "
    "{0,1,2} multiplier (md5 hex-char arithmetic, identical in both "
    "engines; E[w]=255/256, Var≈2/3 — the Poisson-bootstrap family), "
    "lo/hi = 2nd smallest/largest replicate ≈ 5%/95%. Scales because "
    "the corpus is NEVER resampled: one text scan computes the flags, "
    "the 32× fan-out rides a two-integer-column relation, and the "
    "replicate agg is map-side combinable into 32 groups. All integer "
    "ppm — both engines hash-identical.",
)
def q211_bootstrap_pass_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.curation import quality_gate

    flags = quality_gate(load(spark, sf_dir, "documents")).select(
        "doc_id", "passed"
    )
    return bootstrap_rate_ci(flags)


# --- round 12: per-source contingency test -------------------------------


@register(
    "q236_quality_rate_chi2",
    oracle="""
WITH m AS (
  SELECT source,
         CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000
               AND length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 2
                   >= length(text)
               AND length(text)
                   BETWEEN len(string_split(text, ' ')) * 2
                       AND len(string_split(text, ' ')) * 12
          THEN 1 ELSE 0 END AS passed
  FROM documents
),
per AS (
  SELECT source,
         CAST(SUM(passed) AS BIGINT) AS a,
         CAST(COUNT(*) - SUM(passed) AS BIGINT) AS b
  FROM m GROUP BY source
),
tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM per),
cells AS (
  SELECT source, a, b, ta - a AS c, tb - b AS d FROM per CROSS JOIN tot
)
SELECT source, a AS n_pass, b AS n_fail,
       CAST(COALESCE(
         ((a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000000)
            // NULLIF((a + b) * (c + d) * (a + c) * (b + d), 0),
         0) AS BIGINT) AS chi2_micros
FROM cells
""",
    doc="Per-source quality-rate drift test: the 2x2 chi-square statistic "
    "(integer micros) of each source's Gopher-gate pass rate against "
    "the REST of the corpus — the significance companion to q231's "
    "TVD (effect size) and q211's bootstrap (CI on a single rate): a "
    "large chi2 flags a source whose quality genuinely moved, small "
    "sources with noisy rates stay quiet. Closed-form N(ad-bc)^2/"
    "((a+b)(c+d)(a+c)(b+d)), all integer cross-multiplications — no "
    "sqrt, no float. Scale posture: one corpus scan to per-source "
    "(pass, fail) counts (map-side combinable, source-domain-sized), "
    "a 2-cell broadcast total, a stateless per-row formula; the "
    "products are staged DECIMAL(38,0)/HUGEINT (exact to ~1e9-count "
    "cells; beyond that, swap the statistic to the q217-style integer "
    "log2 ladder — the verdict only needs the ORDER of magnitude). "
    "Degenerate margins (a corpus with no passes or no fails, or a "
    "single-source corpus) make the test undefined; both engines "
    "COALESCE that to 0 — 'no evidence of drift'.",
)
def q236_quality_rate_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.curation import quality_gate

    d = load(spark, sf_dir, "documents")
    flags = quality_gate(d).select("doc_id", "passed").join(
        d.select("doc_id", "source"), "doc_id"
    )
    per = flags.groupBy("source").agg(
        F.sum("passed").cast("long").alias("a"),
        (F.count(F.lit(1)) - F.sum("passed")).cast("long").alias("b"),
    )
    tot = per.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    cells = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
        (F.col("ta") - F.col("a")).cast("decimal(38,0)").alias("c"),
        (F.col("tb") - F.col("b")).cast("decimal(38,0)").alias("d"),
    )
    return cells.select(
        "source",
        F.col("a").cast("long").alias("n_pass"),
        F.col("b").cast("long").alias("n_fail"),
        F.expr(
            "cast(coalesce(((a + b + c + d) * (a * d - b * c)"
            " * (a * d - b * c) * 1000000)"
            " div nullif((a + b) * (c + d) * (a + c) * (b + d), 0),"
            " 0) as bigint)"
        ).alias("chi2_micros"),
    )
