"""Generic format surface: ORC/parquet/json/csv round-trips through
read_table/write_table, with schema preservation on columnar formats and
scan-side pushdown visible in the ORC plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.sources.readers import read_table
from etl_pipeline_candy_store_spark.sources.writers import write_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_roundtrip_preserves_schema(spark, tmp_path, fmt):
    src = load(spark, SF, "orders")
    path = str(tmp_path / fmt)
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_text_roundtrip_with_explicit_schema(spark, tmp_path):
    src = load(spark, SF, "region")
    for fmt, opts in [("csv", {"header": True}), ("json", {})]:
        path = str(tmp_path / fmt)
        write_table(src, path, fmt=fmt, **opts)
        back = read_table(spark, path, fmt=fmt, schema=src.schema, **opts)
        assert back.count() == src.count()
        assert back.exceptAll(src).count() == 0


def test_orc_scan_pushes_filters(spark, tmp_path):
    src = load(spark, SF, "orders")
    path = str(tmp_path / "orc_pushdown")
    write_table(src, path, fmt="orc")
    plan = (
        read_table(spark, path, fmt="orc")
        .filter(F.col("o_custkey") == 7)
        .select("o_orderkey", "o_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_custkey" in plan.split("PushedFilters")[1][:120]
    # column pruning: the scan reads only the projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema


def test_write_table_rejects_unknown_format(spark, tmp_path):
    src = load(spark, SF, "region")
    with pytest.raises(ValueError):
        write_table(src, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), fmt="avro")
