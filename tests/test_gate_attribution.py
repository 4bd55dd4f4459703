"""Structural invariants for the round-12 diagnostics: gate attribution
(q233), Simpson diversity (q234), Zipf fit (q235), and the quality-rate
chi-square (q236). The oracle proves value equality; these pin the
properties a data team actually reads off the reports."""

from __future__ import annotations

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    _ensure_loaded()
    return REGISTRY[name].builder(spark, SF).collect()


def test_gate_attribution_consistency(spark):
    rows = {r["gate"]: r for r in _rows(spark, "q233_gate_attribution")}
    assert set(rows) == {
        "exact_dup",
        "quality",
        "repetition",
        "contamination",
        "any",
    }
    gates = [rows[g] for g in ("exact_dup", "quality", "repetition", "contamination")]
    for r in rows.values():
        assert 0 <= r["n_unique"] <= r["n_rejected"]
    # inclusion-exclusion sanity: 'any' is bounded by the per-gate sums
    any_r = rows["any"]
    assert any_r["n_rejected"] <= sum(g["n_rejected"] for g in gates)
    assert any_r["n_rejected"] >= max(g["n_rejected"] for g in gates)
    # single-cause rejections partition across gates exactly
    assert any_r["n_unique"] == sum(g["n_unique"] for g in gates)
    # the eval panel itself (doc_id < 10) is contamination-rejected
    assert rows["contamination"]["n_rejected"] >= 10


def test_gate_attribution_matches_funnel_first_stage(spark):
    """The exact_dup gate counts the same docs the funnel's first stage
    drops (later funnel stages see fewer docs, so only stage 1 is
    directly comparable)."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import dedup_exact

    docs = load(spark, SF, "documents")
    dropped = docs.count() - dedup_exact(docs).count()
    rows = {r["gate"]: r for r in _rows(spark, "q233_gate_attribution")}
    assert rows["exact_dup"]["n_rejected"] == dropped


def test_simpson_diversity_bounds_and_degenerate_source(spark):
    rows = _rows(spark, "q234_simpson_diversity")
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["simpson_ppm"] < 1_000_000
        assert r["n_types"] >= 1
    # directed: a one-token source has diversity 0; a uniform two-token
    # source has 1/2
    import pyspark.sql.functions as F

    d = spark.createDataFrame(
        [
            (1, "mono", "x x x x"),
            (2, "duo", "x y x y"),
        ],
        "doc_id long, source string, text string",
    )
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    c = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    per = c.groupBy("source").agg(
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")
        ).alias("sq"),
    )
    out = {
        r["source"]: r["p"]
        for r in per.select(
            "source",
            F.expr("cast(((s * s - sq) * 1000000) div (s * s) as bigint)").alias("p"),
        ).collect()
    }
    assert out["mono"] == 0
    assert out["duo"] == 500_000


def test_zipf_slope_negative_on_real_sources(spark):
    rows = _rows(spark, "q235_zipf_fit")
    assert len(rows) == 20
    # token frequencies are Zipf-ish: no source's slope is positive
    # (a tiny sf0.001 source whose types are all hapaxes fits exactly
    # flat — slope 0 — so <= 0, not < 0), none steeper than a
    # pathological -4, and the corpus isn't degenerate: most sources
    # show a genuinely falling rank-frequency curve
    for r in rows:
        assert -4_000_000 < r["slope_micros"] <= 0, r
    assert sum(1 for r in rows if r["slope_micros"] < 0) >= 10


def test_chi2_zero_for_identical_rates(spark):
    """Two sources with identical pass layouts give chi2 exactly 0, and
    a source with inverted rates dominates."""
    import pyspark.sql.functions as F

    # same = identical rates; diff = all-fail
    per = spark.createDataFrame(
        [("s1", 8, 2), ("s2", 8, 2), ("s3", 0, 10)],
        "source string, a long, b long",
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
    out = {
        r["source"]: r["chi2"]
        for r in cells.select(
            "source",
            F.expr(
                "cast(((a + b + c + d) * (a * d - b * c) * (a * d - b * c)"
                " * 1000000)"
                " div nullif((a + b) * (c + d) * (a + c) * (b + d), 0)"
                " as bigint)"
            ).alias("chi2"),
        ).collect()
    }
    assert out["s3"] > out["s1"] >= 0
    assert out["s1"] == out["s2"]


def test_chi2_catalog_shape(spark):
    rows = _rows(spark, "q236_quality_rate_chi2")
    assert len(rows) == 20
    for r in rows:
        assert r["chi2_micros"] >= 0
        assert r["n_pass"] + r["n_fail"] >= 1


def test_dup_cluster_profile_partitions_corpus(spark):
    rows = _rows(spark, "q237_dup_cluster_profile")
    from etl_pipeline_candy_store_spark.plans.catalog import load

    n = load(spark, SF, "documents").count()
    # every doc is in exactly one cluster; sizes partition the corpus
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
    # the synthetic corpus has near-dups: some cluster of size >= 2
    assert any(r["cluster_size"] >= 2 for r in rows)
    assert any(r["cluster_size"] == 1 for r in rows)


def test_contamination_by_source_consistency(spark):
    rows = _rows(spark, "q238_contamination_by_source")
    assert len(rows) == 20
    q58 = _rows(spark, "q58_decontamination")
    assert sum(r["n_contaminated"] for r in rows) == len(q58)
    assert sum(r["total_overlap"] for r in rows) == sum(
        r["n_overlap"] for r in q58
    )
    for r in rows:
        assert 0 <= r["contaminated_ppm"] <= 1_000_000
        assert r["n_contaminated"] <= r["n_docs"]


try:
    from hypothesis import given, settings, strategies as st

    @given(
        wts=st.lists(st.integers(1, 500), min_size=5, max_size=60),
        k=st.integers(2, 20),
    )
    @settings(max_examples=15, deadline=None)
    def test_systematic_sample_property(spark, wts, k):
        """For ANY weight vector: total picks lands within 1 of the
        target k, multiplicities are >= 1, and each doc's multiplicity
        equals the count of step multiples inside its weight span —
        verified against an independent python sweep."""
        import pyspark.sql.functions as F

        total = sum(wts)
        step = total // k
        if step == 0:
            return  # degenerate: fewer tokens than samples
        rows = [(i, w) for i, w in enumerate(wts)]
        d = spark.createDataFrame(rows, "doc_id long, wt long")
        from pyspark.sql import Window

        cum = d.select(
            "doc_id",
            "wt",
            F.sum("wt")
            .over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cum"),
        )
        got = {
            r["doc_id"]: r["picks"]
            for r in cum.withColumn("step", F.lit(step))
            .filter(F.expr("cum div step > (cum - wt) div step"))
            .select(
                "doc_id",
                F.expr("cum div step - (cum - wt) div step").alias("picks"),
            )
            .collect()
        }
        # independent python reference
        want = {}
        c = 0
        for i, w in rows:
            picks = (c + w) // step - c // step
            c += w
            if picks:
                want[i] = picks
        assert got == want
        assert sum(got.values()) == total // step  # every multiple lands

    @given(
        cells=st.lists(
            st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
            min_size=2,
            max_size=8,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_chi2_property_nonneg_and_python_exact(spark, cells):
        """chi2 is non-negative for any contingency layout and equals
        an independent integer-python evaluation."""
        import pyspark.sql.functions as F

        per = spark.createDataFrame(
            [(f"s{i}", a, b) for i, (a, b) in enumerate(cells)],
            "source string, a long, b long",
        )
        tot = per.agg(
            F.sum("a").cast("long").alias("ta"),
            F.sum("b").cast("long").alias("tb"),
        )
        out = {
            r["source"]: r["chi2"]
            for r in per.crossJoin(F.broadcast(tot))
            .select(
                "source",
                F.col("a").cast("decimal(38,0)").alias("a"),
                F.col("b").cast("decimal(38,0)").alias("b"),
                (F.col("ta") - F.col("a")).cast("decimal(38,0)").alias("c"),
                (F.col("tb") - F.col("b")).cast("decimal(38,0)").alias("d"),
            )
            .select(
                "source",
                F.expr(
                    "cast(coalesce(((a + b + c + d) * (a * d - b * c)"
                    " * (a * d - b * c) * 1000000)"
                    " div nullif((a + b) * (c + d) * (a + c) * (b + d), 0),"
                    " 0) as bigint)"
                ).alias("chi2"),
            )
            .collect()
        }
        ta = sum(a for a, _ in cells)
        tb = sum(b for _, b in cells)
        for i, (a, b) in enumerate(cells):
            c, d = ta - a, tb - b
            den = (a + b) * (c + d) * (a + c) * (b + d)
            want = (
                ((a + b + c + d) * (a * d - b * c) ** 2 * 1_000_000) // den
                if den
                else 0
            )
            assert out[f"s{i}"] == want
            assert out[f"s{i}"] >= 0
except ImportError:  # pragma: no cover
    pass


def test_winnow_neardup_pairs(spark):
    """Winnow pairs point at genuinely overlapping docs: every reported
    pair shares >= 5 distinct fingerprints, ppm is consistent with the
    per-doc fingerprint counts, and a directed verbatim-overlap pair is
    always found (winnowing's guarantee: any shared token run of
    >= w + k - 1 tokens yields a shared fingerprint)."""
    rows = _rows(spark, "q239_winnow_neardup")
    for r in rows:
        assert r["shared"] >= 5
        assert 0 < r["overlap_ppm"] <= 1_000_000
        assert r["doc_a"] < r["doc_b"]

    # directed: two docs sharing a long verbatim block + one unrelated
    from etl_pipeline_candy_store_spark.operators.text import (
        winnow_fingerprints,
    )

    block = " ".join(f"s{i}" for i in range(30))
    d = spark.createDataFrame(
        [
            (1, block + " tail1a tail1b tail1c"),
            (2, "head2a head2b head2c " + block),
            (3, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(d)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["wmin"])
    assert len(by_doc[1] & by_doc[2]) >= 5  # the block dominates
    assert not (by_doc[1] & by_doc[3])


def test_neardup_family_agreement_consistency(spark):
    rows = _rows(spark, "q241_neardup_family_agreement")
    # membership flags are 0/1 and never all-zero
    for r in rows:
        assert {r["in_jaccard"], r["in_simhash"], r["in_winnow"]} <= {0, 1}
        assert r["in_jaccard"] + r["in_simhash"] + r["in_winnow"] >= 1
    # marginals match each family's own pair count
    def marginal(flag):
        return sum(r["n_pairs"] for r in rows if r[flag] == 1)

    assert marginal("in_jaccard") == len(_rows(spark, "q51_ngram_jaccard_pairs"))
    assert marginal("in_simhash") == len(_rows(spark, "q68_simhash_neardup"))
    assert marginal("in_winnow") == len(_rows(spark, "q239_winnow_neardup"))


def test_split_balance_audit_consistency(spark):
    rows = _rows(spark, "q242_split_balance_audit")
    assert len(rows) == 20
    q80 = {r["split"]: r["n_docs"] for r in _rows(spark, "q80_hash_split")}
    assert sum(r["n_train"] for r in rows) == q80["train"]
    assert sum(r["n_val"] for r in rows) == q80.get("val", 0)
    assert sum(r["n_test"] for r in rows) == q80.get("test", 0)
    for r in rows:
        assert r["n_train"] + r["n_val"] + r["n_test"] == r["n_docs"]
        assert r["chi2_micros"] >= 0


def test_intra_source_drift_bounds(spark):
    rows = _rows(spark, "q243_intra_source_drift")
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["drift_ppm"] <= 1_000_000


def test_intra_source_drift_detects_cohort_shift(spark):
    """A source whose late half switches vocabulary shows near-total
    drift; a stationary source stays low."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = []
    for i in range(20):  # stationary: same unigram mix throughout
        rows.append((i, "stat", "a b c a b c"))
    for i in range(10):  # shifted: first half a/b/c, second half x/y/z
        rows.append((100 + i, "shift", "a b c a b c"))
    for i in range(10):
        rows.append((200 + i, "shift", "x y z x y z"))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = d.select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    halves = d.join(ranked, "doc_id").select(
        "source",
        F.when(F.col("rn") * 2 <= F.col("n"), 0).otherwise(1).alias("late"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    c = halves.groupBy("source", "late", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    st = c.groupBy("source", "late").agg(F.sum("c").cast("long").alias("s"))
    toks = c.select("source", "tok").distinct()
    se = st.filter(F.col("late") == 0).select("source", F.col("s").alias("stot_e"))
    sl = st.filter(F.col("late") == 1).select("source", F.col("s").alias("stot_l"))
    ce = c.filter(F.col("late") == 0).select("source", "tok", F.col("c").alias("ce"))
    cl = c.filter(F.col("late") == 1).select("source", "tok", F.col("c").alias("cl"))
    grid = (
        toks.join(F.broadcast(se), "source")
        .join(F.broadcast(sl), "source")
        .join(ce, ["source", "tok"], "left")
        .join(cl, ["source", "tok"], "left")
        .select(
            "source",
            "stot_e",
            "stot_l",
            F.coalesce(F.col("ce"), F.lit(0)).alias("ce"),
            F.coalesce(F.col("cl"), F.lit(0)).alias("cl"),
        )
    )
    out = {
        r["source"]: r["p"]
        for r in grid.groupBy("source")
        .agg(
            F.expr(
                "cast(sum(abs((ce * 1000000) div stot_e"
                " - (cl * 1000000) div stot_l)) div 2 as bigint)"
            ).alias("p")
        )
        .collect()
    }
    assert out["shift"] >= 999_000
    assert out["stat"] <= 2  # integer-division crumbs only


def test_embedding_outliers_shape(spark):
    rows = _rows(spark, "q244_embedding_outliers")
    # bottom-5 per centroid: ranks are 1..k per cell, cosines
    # non-decreasing within a cell's ranks
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["centroid_id"], []).append(r)
    q62 = _rows(spark, "q62_ivf_assign")
    worst = {}
    for r in q62:
        worst.setdefault(r["centroid_id"], []).append(r["cos_micros"])
    for cell, rs in by_cell.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        cos = [r["cos_micros"] for r in rs]
        assert cos == sorted(cos)
        # they really are the cell's minima
        assert cos[0] == min(worst[cell])


def test_simhash_bounded_is_subset_of_unbounded(spark):
    """q245's capped result is a subset of q68's exact-radius result
    (capping can only remove pairs, never invent them), every kept pair
    still satisfies the hamming radius, and on a template-dense corpus
    the cap genuinely binds (strictly fewer pairs than q68)."""
    full = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _rows(spark, "q68_simhash_neardup")
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _rows(spark, "q245_simhash_neardup_bounded")
    }
    assert set(capped) <= set(full)
    assert all(h <= 3 for h in capped.values())
    assert all(capped[p] == full[p] for p in capped)
    assert 0 < len(capped) < len(full)  # the synthetic corpus is template-dense


def test_simhash_bounded_bucket_cap_binds_deterministically(spark):
    """Directed: a band bucket keeps exactly its cap-smallest doc_ids.
    With every doc sharing one text (identical simhash -> every bucket
    is the same doc set), the capped pair count is C(cap, 2) and only
    the cap lowest doc_ids appear."""
    from etl_pipeline_candy_store_spark.operators.dedup import (
        _SIMHASH_BAND_CAP,
        q245_simhash_neardup_bounded,
    )
    import tempfile, os

    n = _SIMHASH_BAND_CAP + 9
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, "alpha beta gamma delta", "s") for i in range(1, n + 1)],
            "doc_id long, text string, source string",
        ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = q245_simhash_neardup_bounded(spark, tmp).collect()
    cap = _SIMHASH_BAND_CAP
    assert len(rows) == cap * (cap - 1) // 2
    seen = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert seen == set(range(1, cap + 1))  # cap-smallest ids, nothing else
    assert all(r["hamming"] == 0 for r in rows)


def test_neardup_family_agreement_bounded_consistency(spark):
    """q246 mirrors q241's matrix invariants with the bounded simhash
    leg: flags are 0/1, never all-zero, and each column's marginal
    equals its own family's pair count (in_simhash now counts q245)."""
    rows = _rows(spark, "q246_neardup_family_agreement_bounded")
    for r in rows:
        assert {r["in_jaccard"], r["in_simhash"], r["in_winnow"]} <= {0, 1}
        assert r["in_jaccard"] + r["in_simhash"] + r["in_winnow"] >= 1

    def marginal(flag):
        return sum(r["n_pairs"] for r in rows if r[flag] == 1)

    assert marginal("in_jaccard") == len(_rows(spark, "q51_ngram_jaccard_pairs"))
    assert marginal("in_simhash") == len(_rows(spark, "q245_simhash_neardup_bounded"))
    assert marginal("in_winnow") == len(_rows(spark, "q239_winnow_neardup"))


def test_unbounded_agreement_matrix_is_guarded(spark):
    """q241 is a guarded baseline (r13): production-scale input must be
    refused with an error naming the bounded alternative."""
    import pytest
    from etl_pipeline_candy_store_spark.operators import dedup
    from etl_pipeline_candy_store_spark.operators.guards import (
        ALL_PAIRS_MAX_ROWS,
        AllPairsGuardError,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        spark.range(ALL_PAIRS_MAX_ROWS + 1).selectExpr(
            "id as doc_id", "'x' as text", "'s' as source"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        with pytest.raises(
            AllPairsGuardError, match="q246_neardup_family_agreement_bounded"
        ):
            dedup.q241_neardup_family_agreement(spark, tmp)
