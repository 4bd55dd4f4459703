"""End-to-end curation funnel: stage invariants on real test data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.curation import _EVAL_MAX_DOC
from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate

SF = "/root/testdata/sf0.001"


def test_curate_funnel_and_export(spark, tmp_path):
    out = str(tmp_path / "curated")
    report = curate(spark, SF, out, n_shards=2)

    f = report["funnel"]
    # the funnel only ever shrinks
    assert (
        f["input"]
        >= f["after_exact_dedup"]
        >= f["after_near_dedup"]
        >= f["after_quality_gate"]
        >= f["after_repetition_gate"]
        >= f["after_decontamination"]
        > 0
    )
    # the synthetic corpus has no exact dups but does have near-dups ->
    # the near-dedup stage must actually drop cluster members
    assert f["after_near_dedup"] < f["after_exact_dedup"]

    # exported docs = decontaminated survivors, partitioned by split
    exported = sum(s["n_docs"] for s in report["splits"].values())
    assert exported == f["after_decontamination"]

    back = spark.read.parquet(out + "/split=train")
    # no exact duplicates survive in the export
    n = back.count()
    assert back.select(F.md5(F.col("text").cast("binary"))).distinct().count() == n
    # eval docs never leak into training output
    assert back.filter(F.col("doc_id") < _EVAL_MAX_DOC).count() == 0


def test_curate_is_deterministic(spark, tmp_path):
    r1 = curate(spark, SF, str(tmp_path / "a"), n_shards=2)
    r2 = curate(spark, SF, str(tmp_path / "b"), n_shards=2)
    assert r1["funnel"] == r2["funnel"]
    assert {k: v["n_docs"] for k, v in r1["splits"].items()} == {
        k: v["n_docs"] for k, v in r2["splits"].items()
    }


def test_drop_repetitive_passes_signal_less_docs(spark):
    """A doc whose text yields no gram rows (NULL/empty) emits no
    repetition signals; the gate must pass it through unchanged, not
    silently drop it (it gates repetition, nothing else)."""
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        drop_repetitive,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b " * 50),          # top bigram share ~1.0 -> dropped
            (2, "the quick brown fox jumps over the lazy dog and then "
                "runs far away into green hills beyond the old river"),
            (3, None),                  # no grams -> no signal row
            (4, ""),                    # no grams -> no signal row
        ],
        "doc_id INT, text STRING",
    )
    kept = sorted(
        r.doc_id for r in drop_repetitive(docs).select("doc_id").collect()
    )
    assert kept == [2, 3, 4]


def test_curate_governance_report(spark, tmp_path):
    """Stage 6: license totals partition the survivor set; blocked
    survivors really have a restricted cluster-mate among the ORIGINAL
    post-exact-dedup docs; mixture weights form a distribution over the
    surviving sources."""
    report = curate(spark, SF, str(tmp_path / "gov"), n_shards=2)
    lic = report["governance"]["license"]
    survivors = report["funnel"]["after_decontamination"]
    assert sum(s["n_docs"] for s in lic.values()) == survivors
    for src, s in lic.items():
        assert (
            s["n_restricted_own"] + s["n_blocked_by_copy"] + s["n_cleared"]
            == s["n_docs"]
        ), src
        rank = int(src[3:]) % 3
        if rank == 2:  # a restricted source's own docs are never "own-clear"
            assert s["n_restricted_own"] == s["n_docs"]
            assert s["n_blocked_by_copy"] == 0

    mix = report["governance"]["mixture"]
    assert set(mix) <= set(lic)
    total_w = sum(s["weight_ppm"] for s in mix.values())
    assert 1000000 - len(mix) <= total_w <= 1000000
    # alpha=0.5 up-samples at least one tail source on this corpus
    assert any(s["boost_ppm"] > 1000000 for s in mix.values())


def test_governance_folds_exact_dup_licenses(spark):
    """A restricted exact copy dropped at the exact-dedup stage must
    still block its permissively-sourced keeper: the effective rank
    folds the strictest license of the doc's content-digest group over
    the ORIGINAL corpus, so the audit covers exact+near closure even
    though jaccard runs on post-exact-dedup survivors only."""
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        dedup_exact,
        governance_report,
        near_dup_labels,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon", "src0"),  # permissive keeper
            (4, "alpha beta gamma delta epsilon", "src2"),  # restricted copy
            (2, "totally different unique words here", "src0"),  # clean
        ],
        "doc_id long, text string, source string",
    )
    d1 = dedup_exact(docs)
    assert d1.count() == 2  # the restricted copy was dropped at stage 1
    cc = near_dup_labels(d1)
    gov = governance_report(docs, d1, cc, d1)
    lic = gov["license"]
    assert lic["src0"]["n_blocked_by_copy"] == 1  # doc 1, poisoned by doc 4
    assert lic["src0"]["n_cleared"] == 1  # doc 2
    assert lic["src0"]["n_restricted_own"] == 0
    assert "src2" not in lic  # its only doc never reached the survivor set
