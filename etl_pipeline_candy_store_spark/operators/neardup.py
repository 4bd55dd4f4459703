"""Unified near-duplicate detection entry point.

Five oracle-verified detector families coexist in this engine, each
built for a different duplication *mechanism*:

===================  ================================  ====================
strategy             catalog query (hash-identical)    catches
===================  ================================  ====================
minhash              q52_minhash_lsh_pairs             global set similarity
                                                       (rewrites, resampled
                                                       text)
simhash              q245_simhash_neardup_bounded      bit-signature
                                                       proximity (template
                                                       variants), bounded
                                                       band buckets
winnow               q239_winnow_neardup               LOCAL verbatim
                                                       overlap (quotes,
                                                       plagiarism)
containment_bounded  q248_containment_pairs_bounded    asymmetric subset/
                                                       quote (short doc
                                                       inside long), df-
                                                       banded join
containment          q226_containment_pairs            exact containment
                                                       baseline (unbanded
                                                       join — force only
                                                       when the shingle df
                                                       profile is known
                                                       benign)
edit_bounded         q249_edit_distance_bounded        character noise
                                                       (OCR, mojibake,
                                                       truncation),
                                                       block-capped join
edit                 q169_edit_distance_neardup        exact edit baseline
                                                       (uncapped blocks —
                                                       force-only)
===================  ================================  ====================

:func:`neardup` is the one front door: callers either force a family
(``strategy="minhash"`` … — the result is hash-identical to the catalog
query, tested) or pass ``strategy="auto"`` and let the dispatcher pick
from two DOCUMENTED signal sources, mirroring the ``allocate()``
probe-then-pick pattern (operators/allocation.py):

1. **Caller-declared overlap locality** (``overlap=``). Whether the
   expected duplication is whole-document or a shared span is knowledge
   about the *workload*, not the data — no probe can measure it before
   pairs exist, so it is an input, not a measurement:
   ``overlap="local"`` -> winnow, ``overlap="subset"`` ->
   containment_bounded (every auto-dispatched leg is fan-out-bounded;
   the exact q226 join is force-only), ``overlap="global"`` (default)
   -> continue to the measured signals.

2. **One probe aggregate over the corpus** (optionally sampled via
   ``sample_fraction``, same contract as ``allocate()``) measuring
   median token count and character noise:

   - char-noise regime (``noise_ppm >= NOISE_PPM_MIN`` and median doc
     short enough that O(len^2) verify is affordable,
     ``median_tokens <= EDIT_MAX_MEDIAN_TOKENS``) -> **edit_bounded**:
     tokenization smears OCR/mojibake variants across shingles, so the
     set-similarity families under-merge exactly when noise is high.
   - short docs (``median_tokens < SHORT_DOC_TOKENS``) -> **simhash**:
     3-token shingles are too sparse below ~a dozen tokens for
     MinHash signatures to be stable (a 5-token doc has 3 shingles;
     one differing shingle swings Jaccard by 1/3), while the
     per-token simhash votes still fill 32 bits.
   - otherwise -> **minhash**: the default global-scale path
     (shingle -> signature -> band join; pair space never
     materializes).

The probe is ONE map-side-combinable aggregate (a median sketch + two
long sums) over a projection of the corpus — the same order of work as
the tokenize pass every family is about to do anyway. Thresholds are
module constants, re-measurable like ``tools/hotkey_probe.py``'s.

Each forced family keeps its native, oracle-verified output schema
(scores mean different things per family — flattening them into one
column would erase exactly the information the agreement matrix q241/
q246 exists to compare), so ``neardup(docs, strategy=s)`` is
substitutable anywhere the catalog query was.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    containment_pairs,
    containment_pairs_bounded,
    edit_distance_pairs,
    edit_distance_pairs_bounded,
    minhash_lsh_pairs,
    simhash_pairs_bounded,
    winnow_pairs,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register

STRATEGIES = (
    "minhash",
    "simhash",
    "winnow",
    "containment",
    "containment_bounded",
    "edit",
    "edit_bounded",
)

#: >= 2% of lowercase characters outside [a-z0-9 ] reads as a noisy
#: extraction (clean English prose measures ~0.2-1% — punctuation only;
#: OCR/mojibake corpora measure 5%+).
NOISE_PPM_MIN = 20_000

#: Levenshtein verify is O(len_a * len_b) per blocked candidate; above
#: ~64 median tokens the verify dominates the join and the token-level
#: families win even on noisy text.
EDIT_MAX_MEDIAN_TOKENS = 64

#: Below ~12 tokens a doc has <= 10 3-token shingles; MinHash signature
#: variance on so few shingles makes band collisions noise-driven.
SHORT_DOC_TOKENS = 12

#: token-count bucket width for the median's two-level prefix sum
#: (q119/q137 discipline). n_tok is an integer, so a bucket holds at
#: most this many DISTINCT values — every in-bucket window partition is
#: <= 1024 rows by construction, whatever the corpus size.
_MEDIAN_BUCKET = 1024


def signals_frame(docs: DataFrame) -> DataFrame:
    """The probe as a 1-row frame (n_docs, median_tokens, noise_ppm,
    strategy) — EXACT arithmetic (the k-th order statistic for the
    median, integer ppm for the noise share), so the dispatch decision
    is cross-engine verifiable: q247 registers exactly this over the
    documents table with a DuckDB oracle. The k-th order statistic's
    VALUE is deterministic whatever tie order the sort picks, which is
    what makes the median hash-exact where percentile sketches are
    not.

    Scale shape (round 14 — the r13 version funnelled one integer per
    DOC through a single-partition ``row_number`` window): the corpus
    first collapses to a map-side-combinable (n_tok, count) relation —
    value-cardinality-sized, not doc-count-sized — and the k-th order
    statistic is then a q119-style two-level prefix sum over it: an
    in-bucket cumulative count PARTITIONED by ``n_tok div 1024``
    (<= 1024 rows per partition, because a width-1024 integer bucket
    holds at most 1024 distinct values) plus one unpartitioned window
    over per-bucket totals, a relation 1024x smaller (the q88/q119
    tiny-relation exemption). The median is the unique n_tok whose
    inclusive cumulative count first reaches k = (n+1) div 2 —
    identical to the old row_number pick for every input, so q247's
    oracle hash is unchanged. No window on the default dispatch path
    ever sees more than max(1024, max_tokens/1024) rows in one task;
    ``sample_fraction`` remains available but is no longer load-bearing
    for the probe's own scalability."""
    from pyspark.sql.window import Window

    base = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.length(F.lower("text")).cast("long").alias("n_chars"),
        F.length(
            F.regexp_replace(F.lower("text"), "[a-z0-9 ]", "")
        ).cast("long").alias("n_noise"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
        F.sum("n_noise").cast("long").alias("noise"),
    )
    # (n_tok, count) feeds the in-bucket window, the bucket totals, AND
    # the k threshold — checkpoint so the corpus aggregation runs once
    counts = (
        base.groupBy("n_tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("bkt", F.expr(f"n_tok div {_MEDIAN_BUCKET}"))
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("bkt")
        .orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = counts.withColumn("cum_loc", F.sum("c").over(w_local))
    btot = counts.groupBy("bkt").agg(F.sum("c").alias("bc"))
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select(
        "bkt", F.coalesce(F.sum("bc").over(w_bkt), F.lit(0)).alias("boff")
    )
    tot = counts.agg(F.sum("c").cast("long").alias("n"))
    med = (
        local.join(F.broadcast(boff), "bkt")
        .withColumn("cum", F.col("boff") + F.col("cum_loc"))
        .join(F.broadcast(tot), F.lit(True), "left")
        .filter(
            (F.col("cum") >= F.expr("(n + 1) div 2"))
            & (F.col("cum") - F.col("c") < F.expr("(n + 1) div 2"))
        )
        .select(F.col("n_tok").alias("median_tokens"))
    )
    return stats.join(med, F.lit(True), "left").select(
        "n_docs",
        F.coalesce("median_tokens", F.lit(0)).cast("long").alias(
            "median_tokens"
        ),
        F.expr(
            "cast(coalesce((noise * 1000000) div nullif(chars, 0), 0)"
            " as bigint)"
        ).alias("noise_ppm"),
    ).select(
        "n_docs",
        "median_tokens",
        "noise_ppm",
        F.expr(
            f"case when noise_ppm >= {NOISE_PPM_MIN}"
            f" and median_tokens <= {EDIT_MAX_MEDIAN_TOKENS} then 'edit_bounded'"
            f" when median_tokens < {SHORT_DOC_TOKENS} then 'simhash'"
            f" else 'minhash' end"
        ).alias("strategy"),
    )


@register(
    "q247_neardup_dispatch_signals",
    oracle=f"""
WITH base AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(length(lower(text)) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
              AS BIGINT) AS n_noise
  FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars,
         CAST(SUM(n_noise) AS BIGINT) AS noise
  FROM base
),
med AS (
  SELECT CAST(n_tok AS BIGINT) AS median_tokens FROM (
    SELECT n_tok,
           ROW_NUMBER() OVER (ORDER BY n_tok) AS rn,
           COUNT(*) OVER () AS n
    FROM base
  )
  WHERE rn = (n + 1) // 2
),
sig AS (
  SELECT s.n_docs,
         COALESCE(m.median_tokens, 0) AS median_tokens,
         CAST(COALESCE((noise * 1000000) // NULLIF(chars, 0), 0) AS BIGINT)
           AS noise_ppm
  FROM stats s LEFT JOIN med m ON TRUE
)
SELECT n_docs, median_tokens, noise_ppm,
       CASE WHEN noise_ppm >= {NOISE_PPM_MIN}
             AND median_tokens <= {EDIT_MAX_MEDIAN_TOKENS} THEN 'edit_bounded'
            WHEN median_tokens < {SHORT_DOC_TOKENS} THEN 'simhash'
            ELSE 'minhash' END AS strategy
FROM sig
""",
    doc="The neardup() dispatcher's measured signals as an auditable "
    "1-row report: corpus size, EXACT median token count (the k-th "
    "order statistic — deterministic whatever tie order the sort "
    "picks, unlike a percentile sketch), char-noise ppm (non-[a-z0-9 ] "
    "share of lowercased chars, integer division), and the family the "
    "auto rule would pick for overlap='global'. This is the probe "
    "operators/neardup.py dispatches on, registered so the dispatch "
    "decision itself is cross-engine hash-verified, not just "
    "unit-tested. Scale posture: one stateless projection to three "
    "integers per doc, one combinable aggregate, and the median as a "
    "two-level bucketed prefix sum over the value-cardinality-sized "
    "(n_tok, count) relation — in-bucket windows capped at 1024 rows "
    "by integer-bucket construction, the only unpartitioned window "
    "over the 1024x-smaller bucket totals (q119 discipline; "
    "plan-locked in tests/test_neardup_dispatch.py). sample_fraction "
    "remains for callers who want a cheaper scan, not for the probe's "
    "own survival.",
)
def q247_neardup_dispatch_signals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return signals_frame(load(spark, sf_dir, "documents"))


def neardup_signals(
    docs: DataFrame, *, sample_fraction: Optional[float] = None
) -> dict:
    """The probe: median token count and char-noise ppm over ``docs``
    (one aggregate + one order statistic; Bernoulli-sampled when
    ``sample_fraction`` is set — both signals are distribution shape,
    not totals, so sampling needs no scale correction). Returns plain
    Python values so the dispatch decision is driver-side and
    testable; :func:`signals_frame` is the same computation as an
    auditable, oracle-verified frame (q247)."""
    probe = docs
    if sample_fraction is not None:
        probe = docs.sample(fraction=sample_fraction, seed=7)
    row = signals_frame(probe).collect()
    r = row[0] if row else None
    if r is None or not r["n_docs"]:
        return {"n_docs": 0, "median_tokens": 0, "noise_ppm": 0}
    return {
        "n_docs": int(r["n_docs"]),
        "median_tokens": int(r["median_tokens"]),
        "noise_ppm": int(r["noise_ppm"]),
    }


def pick_strategy(signals: dict, overlap: str = "global") -> str:
    """Pure dispatch rule (no Spark) — documented in the module
    docstring, unit-testable without building any pair relation."""
    if overlap == "local":
        return "winnow"
    if overlap == "subset":
        # the df-banded q248 join — the exact q226 fan-out is unbounded
        # on high-df shingles, so auto never dispatches to it
        return "containment_bounded"
    if overlap != "global":
        raise ValueError(
            f"overlap must be 'global', 'local' or 'subset', got {overlap!r}"
        )
    if (
        signals["noise_ppm"] >= NOISE_PPM_MIN
        and signals["median_tokens"] <= EDIT_MAX_MEDIAN_TOKENS
    ):
        # the block-capped q249 join — exact q169's per-block fan-out
        # is unbounded, so auto never dispatches to it
        return "edit_bounded"
    if signals["median_tokens"] < SHORT_DOC_TOKENS:
        return "simhash"
    return "minhash"


def neardup(
    docs: DataFrame,
    *,
    strategy: str = "auto",
    overlap: str = "global",
    sample_fraction: Optional[float] = None,
) -> DataFrame:
    """Near-duplicate pairs over a (doc_id, text) frame.

    ``strategy`` forces a family (``"minhash"``, ``"simhash"``,
    ``"winnow"``, ``"containment"``, ``"edit"`` — each hash-identical
    to its catalog query) or ``"auto"`` dispatches on the documented
    signals; ``overlap`` declares the expected duplication locality
    for the auto path; ``sample_fraction`` probes a Bernoulli sample
    at extreme corpus scale (the decision needs shape, not totals)."""
    if strategy == "auto":
        strategy = pick_strategy(
            neardup_signals(docs, sample_fraction=sample_fraction), overlap
        )
    if strategy == "minhash":
        return minhash_lsh_pairs(docs)
    if strategy == "simhash":
        return simhash_pairs_bounded(docs)
    if strategy == "winnow":
        return winnow_pairs(docs)
    if strategy == "containment":
        return containment_pairs(docs)
    if strategy == "containment_bounded":
        return containment_pairs_bounded(docs)
    if strategy == "edit":
        return edit_distance_pairs(docs)
    if strategy == "edit_bounded":
        return edit_distance_pairs_bounded(docs)
    raise ValueError(
        f"unknown strategy {strategy!r}; expected 'auto' or one of {STRATEGIES}"
    )
