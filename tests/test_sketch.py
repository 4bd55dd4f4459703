"""Sketch estimator accuracy: the approximate operators must track
their exact counterparts within stated error bounds."""

from __future__ import annotations


def test_rolling_hll_tracks_exact_wau(spark):
    """q113's register-merged rolling estimate must stay within HLL
    error bounds of q108's exact rolling WAU on every report day
    (m=256 registers -> ~6.5% typical relative error; assert 15%)."""
    from etl_pipeline_candy_store_spark.operators.sketch import (
        q113_rolling_hll_actives,
    )
    from etl_pipeline_candy_store_spark.operators.timeseries import (
        q108_rolling_active_users,
    )

    sf = "/root/testdata/sf0.01"
    est = {
        str(r["day"]): r["distinct_estimate"]
        for r in q113_rolling_hll_actives(spark, sf).collect()
    }
    exact = {
        str(r["day"]): r["wau_7d"]
        for r in q108_rolling_active_users(spark, sf).collect()
    }
    assert set(est) == set(exact)
    for day, wau in exact.items():
        rel = abs(est[day] - wau) / wau
        assert rel < 0.15, (day, est[day], wau, rel)
