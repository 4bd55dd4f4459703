"""Runtime Bloom-filter join pruning (semi-join reduction): when a
selective filter sits on one join side, Catalyst can build a Bloom
filter over its join keys at runtime and apply it to the other side's
scan — rows that cannot match are dropped BEFORE the shuffle. At 100 TB
this is the difference between shuffling the full fact table and
shuffling only the ~selectivity slice; it composes with AQE and needs
no query rewrite, only the optimizer flags."""

from __future__ import annotations

import contextlib
import io


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _build(spark):
    l = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").where(
        "o_orderpriority = '1-URGENT'"
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .count()
    )


def test_bloom_filter_prunes_probe_side_and_preserves_result(spark):
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        baseline = sorted(map(tuple, _build(spark).collect()))

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # local-mode thresholds: the defaults target multi-GB scans
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        # a broadcast join would supersede the bloom path at this SF
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        df = _build(spark)
        plan = _explain(df)
        assert "might_contain" in plan.lower(), plan  # probe-side pruning
        assert plan.lower().count("bloom") >= 1, plan  # filter creation
        assert sorted(map(tuple, df.collect())) == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
