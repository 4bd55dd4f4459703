"""Registry of conformance queries.

Every operator the engine claims (SURVEY.md §2 + the training-data
extension operators) registers one named query here: a Spark builder
``(spark, sf_dir) -> DataFrame`` and, when the semantics are
SQL-expressible, a DuckDB oracle SQL string over the same parquet tables.
The driver's verify harness runs both sides at sf0.01 and hash-compares.

Hash-stability rules every registered query follows:
- deterministic row *set* (order-insensitive compare): top-k always breaks
  ties on a unique key;
- no raw double aggregation across engines: sums of doubles go through
  ``DECIMAL`` so Spark and DuckDB produce bit-identical results regardless
  of accumulation order, then cast back to double;
- every computed column aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → non-SQL-expressible (rows-only)
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a conformance query to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one synthetic table. Parquet supplies the schema; we avoid
    forcing ours on read so timestamp physical types stay as written.

    ``events.ts`` has shipped under multiple physical layouts across data
    generations (TIMESTAMP(NANOS), TIMESTAMP(MICROS)/NTZ, plain MICROS).
    At 100 TB scale a table accumulates files from different writers, so
    the loader dispatches on the *observed* post-read dtype instead of
    hard-coding one layout:

    - ``bigint`` → the nanos-as-long legacy read (Spark's vectorized
      reader rejects TIMESTAMP(NANOS); the legacy conf surfaces raw
      nanos, which we floor-divide to micros — epoch nanos exceed 2^53,
      so integer division is required to avoid float corruption);
    - ``timestamp_ntz`` → cast to session-local TimestampType (a no-op
      instant-wise under the UTC session pin below, but keeps downstream
      date/window semantics uniform with the DuckDB oracle);
    - ``timestamp`` → already the canonical type, pass through.
    """
    # Harness sessions may not pin a timezone; date/timestamp semantics in
    # the catalog (and the DuckDB oracles) assume UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.builder for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their registration side effects.
    from etl_pipeline_candy_store_spark.plans import (  # noqa: F401
        curation_pipeline,
        relational,
        tpch_shapes,
    )
    from etl_pipeline_candy_store_spark.operators import (  # noqa: F401
        allocation_query,
        asof_query,
        corpus_curation,
        curation,
        dedup,
        entity,
        evaluate,
        graph,
        layout,
        merge_query,
        multimodal,
        neardup,
        neardup_state,
        retrieval,
        scrub,
        similarity,
        sketch,
        skew_query,
        skyline,
        sweepline,
        text,
        timeseries,
        unigram,
    )

    _LOADED = True
