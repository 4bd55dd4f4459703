"""Bucketed-facts pipeline path: CandyConfig.transactions_bucketed_table
loads the exploded request lines from a product-bucketed catalog table
and the allocation plans with ZERO fact-side Exchange (only the dim
BroadcastExchange), output-identical to the per-day-JSON path."""

from __future__ import annotations

import contextlib
import glob
import io
import os

import pytest

from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
    CandyConfig,
    CandyPipeline,
)
from tests.candy_fixtures import write_fixture

_TABLE = "b_candy_request_lines"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("candy_bucketed"))
    write_fixture(root)
    return root


def _cfg(fixture_dir, **kw) -> CandyConfig:
    return CandyConfig(
        products_csv=os.path.join(fixture_dir, "products.csv"),
        customers_csv=os.path.join(fixture_dir, "customers.csv"),
        transactions_paths=sorted(
            glob.glob(os.path.join(fixture_dir, "transactions_*.json"))
        ),
        output_dir=os.path.join(fixture_dir, "output"),
        **kw,
    )


@pytest.fixture(scope="module")
def bucketed_pipeline(spark, fixture_dir):
    cfg = _cfg(fixture_dir, transactions_bucketed_table=_TABLE)
    pipe = CandyPipeline(spark, cfg)
    pipe.prepare_bucketed_transactions(n_buckets=4)
    yield pipe
    spark.sql(f"DROP TABLE IF EXISTS {_TABLE}")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_facts_plan_shuffle_free(spark, bucketed_pipeline):
    plan = _plan(bucketed_pipeline.allocated_lines())
    # the only Exchange is the product-dim broadcast; the fact side rides
    # the bucket layout (genuinely bucketed scan, not just Exchange-free)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_facts_outputs_match_json_path(spark, fixture_dir, bucketed_pipeline):
    plain = CandyPipeline(spark, _cfg(fixture_dir))

    def _norm(df):
        return sorted(map(tuple, df.select(sorted(df.columns)).collect()))

    got = bucketed_pipeline.allocated_lines()
    want = plain.allocated_lines()
    assert sorted(got.columns) == sorted(want.columns)
    assert _norm(got) == _norm(want)
    # downstream aggregates derive identically
    assert _norm(bucketed_pipeline.daily_summary()) == _norm(plain.daily_summary())


def test_daily_append_equals_full_rebuild(spark, fixture_dir):
    # The 100 TB ingest shape: day files land incrementally and are
    # APPENDED into the bucketed facts (config pointed at just the new
    # files, mode="append"). The accreted table must be row-identical to
    # a one-shot rebuild over all days, and stay genuinely bucketed
    # (Spark validates the bucket spec on append), so the shuffle-free
    # allocation path keeps its layout contract as days accrete.
    inc_tbl = "b_candy_incremental"
    days = sorted(glob.glob(os.path.join(fixture_dir, "transactions_*.json")))
    assert len(days) >= 2
    try:
        cfg0 = _cfg(fixture_dir, transactions_bucketed_table=inc_tbl)
        cfg0.transactions_paths = days[:1]
        CandyPipeline(spark, cfg0).prepare_bucketed_transactions(n_buckets=4)
        for day in days[1:]:
            cfg_d = _cfg(fixture_dir, transactions_bucketed_table=inc_tbl)
            cfg_d.transactions_paths = [day]
            CandyPipeline(spark, cfg_d).prepare_bucketed_transactions(
                n_buckets=4, mode="append"
            )
        # file_seq is monotonically_increasing_id: partition-dependent in
        # absolute value (only the within-day ORDER is contractual), so
        # compare rows modulo file_seq...
        full = CandyPipeline(spark, _cfg(fixture_dir))._request_items()
        cols = [c for c in full.columns if c != "file_seq"]
        got = sorted(map(tuple, spark.table(inc_tbl).select(*cols).collect()))
        want = sorted(map(tuple, full.select(*cols).collect()))
        assert got == want
        # ...and prove the ordering semantics survived the append path by
        # the order-SENSITIVE operator: allocation results must match the
        # one-shot pipeline exactly (also re-checks the layout contract).
        inc_pipe = CandyPipeline(
            spark, _cfg(fixture_dir, transactions_bucketed_table=inc_tbl)
        )
        plain = CandyPipeline(spark, _cfg(fixture_dir))

        def _norm(df):
            keep = sorted(c for c in df.columns if c != "file_seq")
            return sorted(map(tuple, df.select(keep).collect()))

        assert _norm(inc_pipe.allocated_lines()) == _norm(plain.allocated_lines())
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {inc_tbl}")


def test_prepare_refreshes_table_stats(spark, bucketed_pipeline):
    # the prepare pass analyzes the table it just wrote: rowCount lands
    # in the metastore and matches the actual table size, so downstream
    # join planning costs the facts accurately as days accrete
    row = spark.sql(f"DESCRIBE TABLE EXTENDED {_TABLE}").collect()
    stats = {r["col_name"]: r["data_type"] for r in row}
    assert "Statistics" in stats, stats.keys()
    n = spark.table(_TABLE).count()
    assert f"{n} rows" in stats["Statistics"], stats["Statistics"]


def test_misconfigured_unbucketed_table_rejected(spark, fixture_dir):
    # transactions_bucketed_table pointing at a PLAIN (unbucketed) saved
    # table violates the layout contract; the pipeline's broadcast
    # product join must not mask that (regression: the colocation guard
    # once accepted any plan containing "BroadcastExchange"). Build must
    # fail rather than run a key-split allocation.
    plain_tbl = "plain_candy_request_lines"
    src = CandyPipeline(spark, _cfg(fixture_dir))
    src._request_items().write.mode("overwrite").saveAsTable(plain_tbl)
    try:
        bad = CandyPipeline(
            spark, _cfg(fixture_dir, transactions_bucketed_table=plain_tbl)
        )
        with pytest.raises(ValueError, match="not provably co-located"):
            bad.allocated_lines()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {plain_tbl}")


def test_bucketed_facts_respects_reload_inventory(spark, fixture_dir, bucketed_pipeline):
    # composite (product_id, business_date) key rides the product_id
    # bucketing: each product's rows — hence each of its dates — are in
    # one partition, so the input_partitioned contract still holds
    b = CandyPipeline(
        spark,
        _cfg(
            fixture_dir,
            transactions_bucketed_table=_TABLE,
            reload_inventory_daily=True,
        ),
    )
    p = CandyPipeline(spark, _cfg(fixture_dir, reload_inventory_daily=True))

    def _norm(df):
        return sorted(map(tuple, df.select(sorted(df.columns)).collect()))

    assert _norm(b.allocated_lines()) == _norm(p.allocated_lines())


def test_prepare_stats_feed_cbo_join_costing(spark, bucketed_pipeline):
    # with CBO on, the optimizer's row-count estimate for a join over
    # the ENGINE's own facts table comes from the prepare-pass ANALYZE
    # (not file-size guessing): the estimate is defined and exact for
    # the scan, and defined (stats-derived) for the filtered aggregate
    # above it — the signal that downstream join costing on engine
    # tables is running on real statistics as days accrete
    from etl_pipeline_candy_store_spark.sources.stats import estimated_stats

    saved = spark.conf.get("spark.sql.cbo.enabled", None)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        facts = spark.table(_TABLE)
        assert estimated_stats(facts)["row_count"] == facts.count()
        import pyspark.sql.functions as F

        joined = facts.groupBy("product_id").agg(
            F.sum("requested_qty").alias("q")
        )
        assert estimated_stats(joined)["row_count"] is not None
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", saved)
