"""Randomized python-reference test for q172's Gini: the two-level
bucketed prefix-sum rank must reproduce the naive global-rank formula
on arbitrary value distributions — ties, duplicates across keys,
degenerate all-equal and single-customer corpora included."""

from __future__ import annotations

import random

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded


def _reference_gini_ppm(cents_by_cust: dict[int, int]) -> tuple[int, int, int]:
    """The naive formula: ascending global ranks (ties broken by
    custkey, matching the engine's ordering), all-integer, final ppm
    floor-division."""
    ordered = sorted(cents_by_cust.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    total = sum(c for _, c in ordered)
    rkx = sum((i + 1) * c for i, (_, c) in enumerate(ordered))
    gini_ppm = (2 * rkx - (n + 1) * total) * 1000000 // (n * total)
    return n, total, gini_ppm


def _run_q172(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir(exist_ok=True)
    spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(sf_dir + "/orders.parquet")
    _ensure_loaded()
    out = REGISTRY["q172_revenue_gini"].builder(spark, sf_dir).collect()[0]
    return out["n_customers"], out["total_cents"], out["gini_ppm"]


def test_gini_matches_python_reference_randomized(spark, tmp_path):
    rng = random.Random(7)
    for trial in range(4):
        n_cust = rng.choice([1, 2, 17, 200])
        # duplicate order values on purpose: rank ties must resolve by
        # custkey identically in both formulations
        rows = []
        per_cust: dict[int, int] = {}
        for ck in range(1, n_cust + 1):
            cents = 0
            for _ in range(rng.randint(1, 4)):
                p = rng.choice([10.0, 25.5, 99.99, 1000.0, 12345.67])
                rows.append((ck, p))
                cents += round(p * 100)
            per_cust[ck] = cents
        want = _reference_gini_ppm(per_cust)
        got = _run_q172(spark, tmp_path, rows)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_gini_degenerate_all_equal_is_zero(spark, tmp_path):
    rows = [(ck, 100.0) for ck in range(1, 33)]
    n, total, gini = _run_q172(spark, tmp_path, rows)
    assert (n, total) == (32, 32 * 10000)
    assert gini == 0


def test_bootstrap_pass_rate_matches_python_reference(spark):
    """The multiplier-bootstrap CI must equal an independent Python
    replay of the weight hashing and replicate order statistics, and
    behave like a CI (lo <= point <= hi, lo < hi on a 500-doc corpus)."""
    import hashlib

    from etl_pipeline_candy_store_spark.operators.curation import quality_gate
    from etl_pipeline_candy_store_spark.operators.evaluate import (
        _BOOT_B,
        q211_bootstrap_pass_rate,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load

    sf = "/root/testdata/sf0.001"
    flags = {
        r["doc_id"]: r["passed"]
        for r in quality_gate(load(spark, sf, "documents"))
        .select("doc_id", "passed")
        .collect()
    }

    def w(doc_id: int, b: int) -> int:
        h = hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % 3

    rates = []
    for b in range(_BOOT_B):
        num = sum(w(d, b) * p for d, p in flags.items())
        den = sum(w(d, b) for d in flags)
        rates.append(num * 1_000_000 // den)
    rates.sort()
    point = sum(flags.values()) * 1_000_000 // len(flags)

    row = q211_bootstrap_pass_rate(spark, sf).collect()[0]
    assert row["n_docs"] == len(flags)
    assert row["pass_rate_ppm"] == point
    assert row["boot_lo_ppm"] == rates[1]
    assert row["boot_hi_ppm"] == rates[_BOOT_B - 2]
    assert row["boot_lo_ppm"] <= row["pass_rate_ppm"] <= row["boot_hi_ppm"]
    # the synthetic corpus passes the gate wholesale (rate = 1.0), so the
    # zero-width CI here is CORRECT; the width behavior is exercised on a
    # mixed-flag relation below.


def test_bootstrap_ci_has_width_on_mixed_flags(spark):
    """On a corpus where the gate actually rejects documents the CI must
    have width, bracket the point estimate, and match the Python replay."""
    import hashlib

    from etl_pipeline_candy_store_spark.operators.evaluate import (
        _BOOT_B,
        bootstrap_rate_ci,
    )

    flags = {d: (1 if d % 10 < 7 else 0) for d in range(200)}  # 70% pass
    df = spark.createDataFrame(
        list(flags.items()), "doc_id bigint, passed bigint"
    )

    def w(doc_id: int, b: int) -> int:
        h = hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()
        return (int(h[0], 16) * 16 + int(h[1], 16)) % 3

    rates = sorted(
        sum(w(d, b) * p for d, p in flags.items())
        * 1_000_000
        // sum(w(d, b) for d in flags)
        for b in range(_BOOT_B)
    )
    row = bootstrap_rate_ci(df).collect()[0]
    assert row["pass_rate_ppm"] == 700_000
    assert row["boot_lo_ppm"] == rates[1]
    assert row["boot_hi_ppm"] == rates[_BOOT_B - 2]
    assert row["boot_lo_ppm"] < 700_000 < row["boot_hi_ppm"]
