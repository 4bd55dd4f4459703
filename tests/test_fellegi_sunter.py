"""Fellegi-Sunter multi-attribute ER scoring (q217) + multi-pass
blocking audit (q218)."""

from __future__ import annotations

from itertools import product

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.entity import (
    _ER_V1_MOD,
    _ER_V1_OFFSET,
    _ER_V2_MOD,
    _ER_V2_OFFSET,
    _FS_ATTRS,
    _FS_THRESHOLD,
    fs_candidates,
    fs_gamma,
    fs_random_pair_gamma,
    fs_scores,
    fs_weights,
    q218_blocking_quality_multi,
    registrations_full,
)

SF = "/root/testdata/sf0.001"


def _customers(spark):
    return spark.read.parquet(f"{SF}/customer.parquet")


def _truth(spark):
    c = _customers(spark)
    v1 = c.filter(F.col("c_custkey") % _ER_V1_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("rb"),
    )
    v2 = c.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("rb"),
    )
    return v1.unionByName(v2)


def test_weights_monotone_in_agreement(spark):
    """Every attribute's agree weight strictly exceeds its disagree
    weight (m > u_k), which makes the score monotone: flipping any
    gamma bit 0->1 never decreases it. Verified both on the weight
    relation and by enumerating all 16 agreement patterns."""
    regsf = registrations_full(_customers(spark))
    w = fs_weights(fs_random_pair_gamma(regsf)).collect()[0].asDict()
    for k in _FS_ATTRS:
        assert w[f"wa_{k}"] > w[f"wd_{k}"], k

    def score(bits):
        return sum(
            w[f"wa_{k}"] if bit else w[f"wd_{k}"]
            for k, bit in zip(_FS_ATTRS, bits)
        )

    for bits in product((0, 1), repeat=len(_FS_ATTRS)):
        for i, bit in enumerate(bits):
            if bit == 0:
                flipped = list(bits)
                flipped[i] = 1
                assert score(tuple(flipped)) >= score(bits)


def test_scores_separate_matches_from_nonmatches(spark):
    """Every synthetic-truth pair is classified a match; every other
    blocked candidate is rejected — at this corpus the threshold
    achieves perfect precision AND recall over the candidate set."""
    scored = fs_scores(registrations_full(_customers(spark)))
    truth = _truth(spark)
    n_true = truth.count()
    assert n_true > 0
    hit = scored.join(truth, ["ra", "rb"], "left_semi")
    assert hit.filter(F.col("is_match") == 1).count() == n_true
    fp = scored.join(truth, ["ra", "rb"], "left_anti").filter(
        F.col("is_match") == 1
    )
    assert fp.count() == 0
    # and the score gap is real, not a threshold artifact: max non-match
    # score stays strictly under min match score
    mx = (
        scored.join(truth, ["ra", "rb"], "left_anti")
        .agg(F.max("score"))
        .collect()[0][0]
    )
    mn = hit.agg(F.min("score")).collect()[0][0]
    assert mx < _FS_THRESHOLD <= mn


def test_candidates_contain_nonmatches(spark):
    """The u-estimation pitfall guard: the blocked candidate set must
    contain non-matches (otherwise score separation is vacuous), and
    the weights must come from the random pairing, NOT the candidates."""
    regsf = registrations_full(_customers(spark))
    cand = fs_gamma(fs_candidates(regsf))
    truth = _truth(spark)
    assert cand.join(truth, ["ra", "rb"], "left_anti").count() > 0
    # the random pairing is match-free by construction (stride 17 never
    # lands on an offset variant)
    ug = fs_random_pair_gamma(regsf)
    assert ug.filter(F.col("g_phone") == 1).count() == 0
    assert ug.filter(F.col("g_addr") == 1).count() == 0


def test_blocked_gamma_fused_equals_unfused(spark):
    """The r16 fused path (flags before the pair dedup, max-dedup on
    ints) must reproduce fs_gamma over the first-pass-wins attribute
    dedup row for row — the q217/q220 internals rewrite's equivalence
    pin."""
    from etl_pipeline_candy_store_spark.operators.entity import (
        fs_blocked_gamma,
    )

    regsf = registrations_full(_customers(spark))
    fused = sorted(
        tuple(r) for r in fs_blocked_gamma(regsf).collect()
    )
    unfused = sorted(
        tuple(r) for r in fs_gamma(fs_candidates(regsf)).collect()
    )
    assert fused == unfused and len(fused) > 0


def test_multiblock_audit_union_complete(spark):
    """Each single blocking pass misses the variant that corrupts its
    key (name pass ~750000 ppm, phone pass ~250000 ppm); the union is
    complete. This is q218's whole story."""
    rows = {
        r["scheme"]: r
        for r in q218_blocking_quality_multi(spark, SF).collect()
    }
    assert rows["union"]["pair_completeness_ppm"] == 1_000_000
    assert rows["name_sfx"]["pair_completeness_ppm"] < 1_000_000
    assert rows["phone_sfx"]["pair_completeness_ppm"] < 1_000_000
    assert (
        rows["name_sfx"]["n_true_covered"]
        + rows["phone_sfx"]["n_true_covered"]
        == rows["union"]["n_true_covered"]
    )
    # blocking must actually block: >99% of the pair space never built
    for r in rows.values():
        assert r["reduction_ratio_ppm"] > 990_000


def test_em_converges_and_recovers_truth(spark):
    """Open-ended fs_em_train reaches a (weights, threshold) fixpoint;
    classifying with the LEARNED parameters recovers the synthetic
    truth pairs exactly; and EM learns what the bootstrap cannot see —
    name agreement is common among blocked non-matches, so its learned
    agree-weight collapses below the strong attributes'."""
    from etl_pipeline_candy_store_spark.operators.entity import fs_em_train

    # sf0.01: the sf0.001 candidate set is 14 pairs (11 true), far too
    # match-heavy for the learned u to show structure; at sf0.01 the
    # blocks contribute ~500 non-matches and EM has a population
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    regsf = registrations_full(c)
    final, traj = fs_em_train(regsf, max_iters=10)
    assert len(traj) >= 2
    assert final["wa_name"] < final["wa_phone"]
    assert final["wa_name"] < final["wa_addr"]

    gamma = fs_gamma(fs_candidates(regsf))
    score = None
    for k in _FS_ATTRS:
        term = F.when(
            F.col(f"g_{k}") == 1, F.lit(final[f"wa_{k}"])
        ).otherwise(F.lit(final[f"wd_{k}"]))
        score = term if score is None else score + term
    matched = gamma.filter(score >= F.lit(final["threshold"])).select(
        "ra", "rb"
    )
    v1 = c.filter(F.col("c_custkey") % _ER_V1_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V1_OFFSET).alias("rb"),
    )
    v2 = c.filter(F.col("c_custkey") % _ER_V2_MOD == 0).select(
        F.col("c_custkey").alias("ra"),
        (F.col("c_custkey") + _ER_V2_OFFSET).alias("rb"),
    )
    truth = v1.unionByName(v2)
    n_true = truth.count()
    assert matched.count() == n_true
    assert matched.join(truth, ["ra", "rb"], "left_semi").count() == n_true


def test_em_max_iters_raises(spark):
    import pytest as _pytest

    from etl_pipeline_candy_store_spark.operators.entity import fs_em_train

    with _pytest.raises(RuntimeError, match="did not converge"):
        fs_em_train(registrations_full(_customers(spark)), max_iters=1)


def test_em_trajectory_matches_query(spark):
    """The registered q220 (exact_iters=3) must be the same loop."""
    from etl_pipeline_candy_store_spark.operators.entity import (
        fs_em_train,
        q220_fellegi_sunter_em,
    )

    _, traj = fs_em_train(
        registrations_full(_customers(spark)), exact_iters=3
    )
    got = sorted(
        (r.asDict() for r in q220_fellegi_sunter_em(spark, SF).collect()),
        key=lambda r: r["iter"],
    )
    assert [dict(t) for t in traj] == got
