"""Schema evolution x bucketed tables: at 100 TB both happen together —
a bucketed facts table accretes daily appends for months, and somewhere
along the way the ingest generation adds a column. The layout contract
(hash co-location on the bucket key) and the schema contract (old files
read the new column as null) must survive each other.

Catalog-table flow: ``ALTER TABLE ... ADD COLUMNS`` widens the table
schema (the catalog schema governs the read — no per-file mergeSchema
race), the next ``write_bucketed_table(mode="append")`` writes the new
generation with the column populated (Spark validates the bucket AND
sort spec against the existing table, so co-location is preserved by
construction), and old-generation files decode the added column as
null. The order-sensitive allocation then proves the semantics: results
over the two-generation table must equal the one-shot JSON path."""

from __future__ import annotations

import contextlib
import glob
import io
import os

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
    CandyConfig,
    CandyPipeline,
)
from etl_pipeline_candy_store_spark.sources.writers import write_bucketed_table
from tests.candy_fixtures import write_fixture

_TABLE = "evo_candy_request_lines"
_SORT = ["product_id", "business_date", "file_seq", "item_pos"]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("candy_evo"))
    write_fixture(root)
    return root


def _cfg(fixture_dir, paths=None, **kw) -> CandyConfig:
    return CandyConfig(
        products_csv=os.path.join(fixture_dir, "products.csv"),
        customers_csv=os.path.join(fixture_dir, "customers.csv"),
        transactions_paths=paths
        or sorted(glob.glob(os.path.join(fixture_dir, "transactions_*.json"))),
        output_dir=os.path.join(fixture_dir, "output"),
        **kw,
    )


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def evolved_table(spark, fixture_dir):
    """Two-generation bucketed facts: gen-1 days written without, gen-2
    days appended WITH an ``ingest_region`` column added in between."""
    days = sorted(glob.glob(os.path.join(fixture_dir, "transactions_*.json")))
    assert len(days) >= 2
    split = max(1, len(days) // 2)

    gen1 = CandyPipeline(
        spark, _cfg(fixture_dir, paths=days[:split], transactions_bucketed_table=_TABLE)
    )
    gen1.prepare_bucketed_transactions(n_buckets=4)

    spark.sql(f"ALTER TABLE {_TABLE} ADD COLUMNS (ingest_region STRING)")

    gen2_items = (
        CandyPipeline(spark, _cfg(fixture_dir, paths=days[split:]))
        ._request_items()
        .withColumn("ingest_region", F.lit("eu-west-1"))
    )
    write_bucketed_table(
        gen2_items, _TABLE, ["product_id"], 4, sort_cols=_SORT, mode="append"
    )
    yield _TABLE
    spark.sql(f"DROP TABLE IF EXISTS {_TABLE}")


def test_old_generation_reads_added_column_as_null(spark, evolved_table):
    t = spark.table(evolved_table)
    assert "ingest_region" in t.columns
    per_gen = {
        r["ingest_region"]: r["n"]
        for r in t.groupBy("ingest_region").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # both generations present: gen-1 rows null, gen-2 rows tagged
    assert per_gen.get(None, 0) > 0, per_gen
    assert per_gen.get("eu-west-1", 0) > 0, per_gen


def test_evolved_table_scan_stays_bucketed(spark, evolved_table):
    # the added column must not de-bucket the scan: a product_id
    # aggregate over the mixed-generation table still rides the bucket
    # layout with no fact-side Exchange
    agg = (
        spark.table(evolved_table)
        .groupBy("product_id")
        .agg(F.sum("requested_qty").alias("q"), F.count("ingest_region").alias("tagged"))
    )
    plan = _plan(agg)
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_allocation_unchanged_across_generations(spark, fixture_dir, evolved_table):
    # the order-sensitive operator is the semantic proof: allocation on
    # the two-generation bucketed table (shuffle-free path, colocation
    # guard active) equals the one-shot per-day-JSON pipeline, the new
    # column riding along inert
    evo = CandyPipeline(
        spark, _cfg(fixture_dir, transactions_bucketed_table=evolved_table)
    )
    plain = CandyPipeline(spark, _cfg(fixture_dir))

    got_df = evo.allocated_lines()
    plan = _plan(got_df)
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan

    drop = {"file_seq", "ingest_region"}

    def _norm(df):
        keep = sorted(c for c in df.columns if c not in drop)
        return sorted(map(tuple, df.select(keep).collect()))

    assert _norm(got_df) == _norm(plain.allocated_lines())
