"""Data-layout operators: multi-dimensional clustering keys.

A Z-order (Morton) key interleaves the bits of two columns so that
sorting by the single key co-locates rows that are close in EITHER
dimension — parquet row-group min/max stats then prune scans for
predicates on either column, which a lexicographic sort only gives the
leading column. This is the layout trick behind Delta/Iceberg Z-order
clustering, expressed as a pure column expression: at 100 TB you
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` before the
write and data-skipping does the rest.

The key is built from integer shift/mask terms only — bit-identical in
any engine, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import load, register

_Z_BITS = 16  # bits interleaved per dimension -> 32-bit key


def _zorder_terms(x: str, y: str, n_bits: int, one: str) -> str:
    """Shared term generator: ``one`` is the literal 1 in the target
    dialect ('1L' Spark, '1::BIGINT' DuckDB)."""
    terms = []
    for i in range(n_bits):
        terms.append(f"((({x} >> {i}) & 1) * ({one} << {2 * i}))")
        terms.append(f"((({y} >> {i}) & 1) * ({one} << {2 * i + 1}))")
    return " + ".join(terms)


def zorder_key(x: str, y: str, n_bits: int = _Z_BITS) -> Column:
    """Morton key column: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1."""
    return F.expr(_zorder_terms(x, y, n_bits, "1L")).cast("long")


def zorder_sql(x: str, y: str, n_bits: int = _Z_BITS) -> str:
    return f"CAST({_zorder_terms(x, y, n_bits, '1::BIGINT')} AS BIGINT)"


def cluster_by_zorder(
    df: DataFrame, x: str, y: str, n_partitions: int, n_bits: int = _Z_BITS
) -> DataFrame:
    """Layout pass before a big write: range-partition + sort by the
    Morton key so parquet row-group stats stay tight on BOTH columns."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, n_bits))
    return keyed.repartitionByRange(n_partitions, "_zkey").sortWithinPartitions(
        "_zkey"
    )


@register(
    "q83_zorder_key",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {zorder_sql('l_suppkey', 'l_partkey')} AS zkey
FROM lineitem
""",
    doc="Z-order (Morton) clustering key over (l_suppkey, l_partkey): "
    "the multi-dimensional sort key for data-skipping layouts. Pure "
    "row-local bit arithmetic — zero shuffle; the layout pass itself "
    "(cluster_by_zorder) adds exactly one range-partitioning exchange.",
)
def q83_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zorder_key("l_suppkey", "l_partkey").alias("zkey"),
    )
