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
