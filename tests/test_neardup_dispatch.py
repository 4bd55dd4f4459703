"""neardup() dispatcher: forced families are hash-identical to their
catalog queries, the auto rule picks the documented family per signal
regime, and the dispatcher outputs compose into q246's agreement matrix
unchanged."""

from __future__ import annotations

import pytest

from etl_pipeline_candy_store_spark.operators.neardup import (
    EDIT_MAX_MEDIAN_TOKENS,
    NOISE_PPM_MIN,
    SHORT_DOC_TOKENS,
    neardup,
    neardup_signals,
    pick_strategy,
)
from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"

FAMILY_QUERY = {
    "minhash": "q52_minhash_lsh_pairs",
    "simhash": "q245_simhash_neardup_bounded",
    "winnow": "q239_winnow_neardup",
    "containment": "q226_containment_pairs",
    "containment_bounded": "q248_containment_pairs_bounded",
    "edit": "q169_edit_distance_neardup",
    "edit_bounded": "q249_edit_distance_bounded",
}


def _docs(spark):
    _ensure_loaded()
    from etl_pipeline_candy_store_spark.plans.catalog import load

    return load(spark, SF, "documents")


@pytest.mark.parametrize("strategy", sorted(FAMILY_QUERY))
def test_forced_family_hash_identical_to_catalog_query(spark, strategy):
    _ensure_loaded()
    got = neardup(_docs(spark), strategy=strategy)
    want = REGISTRY[FAMILY_QUERY[strategy]].builder(spark, SF)
    assert got.columns == want.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_agreement_matrix_from_dispatcher_legs(spark):
    """Reuses q246's matrix over dispatcher outputs: each column's
    marginal equals the forced family's own pair count — the dispatcher
    legs ARE the matrix legs."""
    from pyspark.sql import functions as F

    d = _docs(spark)
    legs = {
        "in_jaccard": neardup(d, strategy="minhash"),
        "in_simhash": neardup(d, strategy="simhash"),
        "in_winnow": neardup(d, strategy="winnow"),
    }
    tagged = None
    for col, df in legs.items():
        t = df.select(
            "doc_a",
            "doc_b",
            *[F.lit(1 if c == col else 0).alias(c) for c in legs],
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    flags = tagged.groupBy("doc_a", "doc_b").agg(
        *[F.max(c).alias(c) for c in legs]
    )
    rows = flags.collect()
    for col, df in legs.items():
        assert sum(1 for r in rows if r[col] == 1) == df.count()


def test_pick_strategy_rules():
    clean_long = {"n_docs": 100, "median_tokens": 200, "noise_ppm": 800}
    noisy_short = {"n_docs": 100, "median_tokens": 30, "noise_ppm": 60_000}
    noisy_long = {
        "n_docs": 100,
        "median_tokens": EDIT_MAX_MEDIAN_TOKENS + 1,
        "noise_ppm": 60_000,
    }
    clean_tiny = {
        "n_docs": 100,
        "median_tokens": SHORT_DOC_TOKENS - 1,
        "noise_ppm": 800,
    }
    assert pick_strategy(clean_long) == "minhash"
    assert pick_strategy(noisy_short) == "edit_bounded"
    # too long for O(len^2) verify even when noisy -> token families
    assert pick_strategy(noisy_long) == "minhash"
    assert pick_strategy(clean_tiny) == "simhash"
    # declared locality wins over every measured signal; subset routes
    # to the df-BANDED containment join — auto never dispatches to the
    # unbounded q226 fan-out (force strategy="containment" for it)
    assert pick_strategy(noisy_short, overlap="local") == "winnow"
    assert pick_strategy(clean_long, overlap="subset") == "containment_bounded"
    with pytest.raises(ValueError, match="overlap"):
        pick_strategy(clean_long, overlap="typo")
    with pytest.raises(ValueError, match="strategy"):
        neardup(None, strategy="typo")


def test_signals_measure_engineered_fixtures(spark):
    noisy = spark.createDataFrame(
        [(i, "wörd$ 0cr' n0i$e## t3xt§ he%re @@") for i in range(1, 9)],
        "doc_id long, text string",
    )
    s = neardup_signals(noisy)
    assert s["noise_ppm"] >= NOISE_PPM_MIN
    assert s["median_tokens"] <= EDIT_MAX_MEDIAN_TOKENS
    assert pick_strategy(s) == "edit_bounded"

    clean = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range(50))) for i in range(1, 9)],
        "doc_id long, text string",
    )
    s = neardup_signals(clean)
    assert s["noise_ppm"] < NOISE_PPM_MIN
    assert pick_strategy(s) == "minhash"

    tiny = spark.createDataFrame(
        [(i, "just five tiny clean tokens") for i in range(1, 9)],
        "doc_id long, text string",
    )
    assert pick_strategy(neardup_signals(tiny)) == "simhash"


def test_auto_dispatch_runs_end_to_end(spark):
    """auto on the synthetic corpus lands on minhash (long-ish clean
    docs) and returns that family's frame; the sampled probe reaches
    the same decision."""
    d = _docs(spark)
    s = neardup_signals(d)
    assert pick_strategy(s) == "minhash"
    out = neardup(d, strategy="auto")
    assert out.columns == ["doc_a", "doc_b", "n_common", "n_union"]
    assert out.count() == neardup(d, strategy="minhash").count()
    s_sampled = neardup_signals(d, sample_fraction=0.5)
    assert pick_strategy(s_sampled) == "minhash"


def test_empty_corpus_probe(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    s = neardup_signals(empty)
    assert s["n_docs"] == 0
    # empty corpus: any family returns an empty pair frame; auto must
    # not crash on degenerate signals
    assert neardup(empty, strategy="auto").count() == 0


def test_bounded_containment_recall_contract(spark):
    """The df band's two halves, each on an engineered corpus:
    (a) where no shingle exceeds the cap, bounded == exact (the lower
    bound df>=2 is exact-neutral: df-1 shingles can never join a pair);
    (b) a quote carried ONLY by boilerplate-frequency shingles (df >
    cap) is found by exact containment but dropped by the bounded
    join — the documented recall loss, pinned so it stays a contract
    rather than drifting silently."""
    from etl_pipeline_candy_store_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_bounded,
    )

    # (a) small distinct corpus with one real subset pair, all dfs <= 2
    uniq = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "completely different words in this one here"),
    ]
    d = spark.createDataFrame(uniq, "doc_id long, text string")
    exact = sorted(map(tuple, containment_pairs(d).collect()))
    bounded = sorted(map(tuple, containment_pairs_bounded(d).collect()))
    assert exact == bounded and len(exact) == 1

    # (b) the same subset pair, but the shared text now appears in 80
    # other docs (df > 64 on every shared shingle): exact still pairs
    # doc 1 with doc 2; the bounded join drops those shingles
    boiler = [(i, "alpha beta gamma delta epsilon zeta") for i in range(10, 90)]
    d2 = spark.createDataFrame(uniq + boiler, "doc_id long, text string")
    exact2 = containment_pairs(d2)
    bounded2 = containment_pairs_bounded(d2)
    assert exact2.filter("doc_a = 1 AND doc_b = 2").count() == 1
    assert bounded2.count() == 0
    assert exact2.count() > 0


def test_bounded_edit_recall_contract(spark):
    """The block cap's two halves: (a) blocks under the cap -> bounded
    == exact (the length pre-filter is exact-neutral: |len_a - len_b|
    <= radius is necessary for dist <= radius); (b) a 40-member block
    (cap 32) loses the pairs whose member the cap truncated, exact
    keeps them — the documented recall loss."""
    from etl_pipeline_candy_store_spark.operators.dedup import (
        edit_distance_pairs,
        edit_distance_pairs_bounded,
    )

    # (a) two noisy variants sharing a 16-char prefix + one unrelated
    small = [
        (1, "the quick brown f0x jumps over the lazy dog"),
        (2, "the quick brown fox jumps 0ver the lazy dog!"),
        (3, "completely unrelated text body here with words"),
    ]
    d = spark.createDataFrame(small, "doc_id long, text string")
    exact = sorted(map(tuple, edit_distance_pairs(d).collect()))
    bounded = sorted(map(tuple, edit_distance_pairs_bounded(d).collect()))
    assert exact == bounded and len(exact) == 1

    # (b) 40 docs in ONE prefix block (a shared boilerplate header):
    # the cap keeps doc_ids 0..31, so any pair involving 32..39 is
    # bounded-lost; candidate count is capped at 32*31/2 where exact
    # pays 40*39/2
    hub = [
        (i, f"BOILERPLATE HDR variant number {i:02d} trailing text")
        for i in range(40)
    ]
    d2 = spark.createDataFrame(hub, "doc_id long, text string")
    exact2 = edit_distance_pairs(d2)
    bounded2 = edit_distance_pairs_bounded(d2)
    assert exact2.filter("doc_b >= 32").count() > 0
    assert bounded2.filter("doc_b >= 32").count() == 0
    # within the kept members the pairs agree exactly
    assert sorted(map(tuple, exact2.filter("doc_b < 32").collect())) == sorted(
        map(tuple, bounded2.collect())
    )


def test_bounded_recall_audit_invariants(spark):
    """q250: every bounded pair set is a subset of its exact baseline
    (n_lost >= 0 per family, all three families reported), and the
    guard refuses production-scale input naming the bounded
    alternatives (the q241 pattern)."""
    from pyspark.sql import functions as F

    from etl_pipeline_candy_store_spark.operators.guards import (
        AllPairsGuardError,
    )

    _ensure_loaded()
    rows = {
        r["family"]: r
        for r in REGISTRY["q250_bounded_detector_recall"]
        .builder(spark, SF)
        .collect()
    }
    assert set(rows) == {"containment", "edit", "simhash"}
    for fam, r in rows.items():
        assert r["n_bounded"] <= r["n_exact"], fam
        assert r["n_lost"] == r["n_exact"] - r["n_bounded"], fam

    big = spark.range(60_000).select(
        F.col("id").alias("doc_id"), F.lit("text body").alias("text")
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        big.write.parquet(tmp + "/documents.parquet")
        with pytest.raises(AllPairsGuardError, match="q245/q248/q249"):
            REGISTRY["q250_bounded_detector_recall"].builder(
                spark, tmp
            ).collect()


def test_probe_median_plan_is_bucketed(spark):
    """Plan lock (round 14): the probe's exact median must run as the
    q119-style two-level prefix sum — the in-bucket cumulative window
    partitioned by the token-count bucket, and NO doc-count-sized
    relation through a single-partition row_number sort (the r13 shape
    this replaces). The only remaining unpartitioned window is over the
    per-bucket totals, a relation 1024x smaller than the distinct
    token counts (the q88/q119 tiny-relation exemption)."""
    import contextlib
    import io

    from etl_pipeline_candy_store_spark.operators.neardup import (
        signals_frame,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load

    df = signals_frame(load(spark, SF, "documents"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the doc-level order-statistic window is gone
    assert "row_number" not in plan, plan
    # exactly two windows: in-bucket cumulative (partitioned by bkt)
    # and the bucket-totals offset (tiny); tree rows render as
    # ":- Window (n)" / "+- Window (n)" depending on branch side
    import re

    assert len(re.findall(r"[:+]- Window \(", plan)) == 2, plan
    assert "hashpartitioning(bkt" in plan, plan


def test_probe_dispatches_on_large_corpus_unsampled(spark):
    """The default (unsampled) dispatch path on a corpus large enough
    that the r13 single-partition sort would dominate: 1.1M docs, token
    counts uniform over 5..15 (100k each), so the k-th order statistic
    k = 550_000 falls in the value-10 run (cum 500k at 9, 600k at 10).
    Exact expected signals, computed by hand — and the probe completes
    through the bucketed plan without ever materializing the doc-level
    relation in one task."""
    from pyspark.sql import functions as F

    docs = spark.range(1_100_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.col("id") % 11 + 5).cast("int"))
        ).alias("text"),
    )
    s = neardup_signals(docs)
    assert s["n_docs"] == 1_100_000
    assert s["median_tokens"] == 10
    assert s["noise_ppm"] == 0
    # clean + short docs -> the documented simhash regime
    assert pick_strategy(s) == "simhash"
