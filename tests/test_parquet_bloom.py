"""Write-side parquet Bloom filters: row-group skipping for selective
point probes on high-cardinality UNSORTED keys — the case min/max
statistics cannot prune (every row group's range spans the domain) and
dictionary filtering cannot serve (the dictionary overflows to plain
encoding). The scan-side lever for the reference's per-id dimension
lookups (/root/reference/src/data_processor.py:294-306) at 100 TB: a
`k = ?` probe reads the row groups the filter cannot rule out, not the
whole table, with no layout change and no engine lock-in (any parquet
reader sees the same footers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.sources.writers import (
    parquet_tuning_options,
    save_partitioned_parquet,
    write_bucketed_table,
)

# multiplicative-hash key: interleaved across the id range so EVERY row
# group's (min, max) spans ~the full domain — min/max stats prune nothing
_A = 2654435761
_MOD = 2**31
_N = 300_000
_PROBE_ID = 12_345
_PROBE = _A * _PROBE_ID % _MOD


def _df(spark):
    return spark.range(_N).select(
        ((F.col("id") * F.lit(_A)) % F.lit(_MOD)).alias("k"),
        # padding fattens rows so block.size=1MB yields dozens of groups
        F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
    )


def _scan_rows(spark, path) -> tuple[list, int]:
    """(result rows, scan numOutputRows) for the point probe. With
    record-level parquet filtering off (Spark default), the scan metric
    counts every row of every row group the reader could NOT skip — the
    direct measurement of pruning effectiveness."""
    d = spark.read.parquet(path).where(F.col("k") == _PROBE)
    rows = d.collect()
    leaves = d._jdf.queryExecution().executedPlan().collectLeaves()
    n_out = leaves.apply(0).metrics().apply("numOutputRows").value()
    return rows, n_out


@pytest.fixture(scope="module")
def bloom_paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pq_bloom")
    # dictionary off on both sides: keeps the A/B fair and makes Bloom
    # the ONLY possible row-group pruning mechanism for this column
    common = {"parquet.enable.dictionary": "false"}
    with_bloom = str(root / "with_bloom")
    no_bloom = str(root / "no_bloom")
    save_partitioned_parquet(
        _df(spark).repartition(1),
        with_bloom,
        parquet_options={
            **parquet_tuning_options(
                bloom_filter_cols=["k"],
                bloom_filter_ndv=50_000,
                row_group_bytes=1_000_000,
            ),
            **common,
        },
    )
    save_partitioned_parquet(
        _df(spark).repartition(1),
        no_bloom,
        parquet_options={
            **parquet_tuning_options(row_group_bytes=1_000_000),
            **common,
        },
    )
    return with_bloom, no_bloom


def test_tuning_options_shape():
    opts = parquet_tuning_options(
        bloom_filter_cols=["a", "b"], bloom_filter_ndv=1000, row_group_bytes=42
    )
    assert opts == {
        "parquet.bloom.filter.enabled#a": "true",
        "parquet.bloom.filter.expected.ndv#a": "1000",
        "parquet.bloom.filter.enabled#b": "true",
        "parquet.bloom.filter.expected.ndv#b": "1000",
        "parquet.block.size": "42",
    }
    assert parquet_tuning_options() == {}


def test_bloom_filter_skips_row_groups(spark, bloom_paths):
    with_bloom, no_bloom = bloom_paths
    rows_b, scanned_b = _scan_rows(spark, with_bloom)
    rows_p, scanned_p = _scan_rows(spark, no_bloom)
    # same answer either way
    assert sorted(map(tuple, rows_b)) == sorted(map(tuple, rows_p))
    assert len(rows_b) >= 1
    # without the filter the reader visits every row group (stats can't
    # prune the interleaved key); with it, all but the group(s) actually
    # holding the value are skipped. Measured: 8.6k vs 300k (36 groups,
    # 35 skipped); assert a loose 5× so encoder drift can't flake it.
    assert scanned_p == _N
    assert scanned_b * 5 < scanned_p, (scanned_b, scanned_p)


def test_bucketed_table_bloom_on_secondary_column(spark, bloom_paths):
    # bucketing co-locates the JOIN key; the Bloom filter serves point
    # probes on a DIFFERENT high-cardinality column — the two compose
    # (options flow through saveAsTable to the same parquet writer).
    tbl = "b_bloom_secondary"
    try:
        write_bucketed_table(
            _df(spark).withColumn("bucket_key", F.col("k") % 7),
            tbl,
            ["bucket_key"],
            n_buckets=2,
            parquet_options={
                **parquet_tuning_options(
                    bloom_filter_cols=["k"],
                    bloom_filter_ndv=50_000,
                    row_group_bytes=1_000_000,
                ),
                "parquet.enable.dictionary": "false",
            },
        )
        d = spark.table(tbl).where(F.col("k") == _PROBE)
        rows = d.collect()
        assert len(rows) >= 1
        leaves = d._jdf.queryExecution().executedPlan().collectLeaves()
        scanned = leaves.apply(0).metrics().apply("numOutputRows").value()
        assert scanned * 5 < _N, scanned
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
