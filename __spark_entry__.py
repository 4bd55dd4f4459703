"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship daily-summary query at sf0.001;
``queries``/``oracle_sql`` expose the full conformance catalog from
``etl_pipeline_candy_store_spark.plans.catalog`` (one entry per
implemented operator from SURVEY.md §2 plus the training-data extension
operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_pipeline_candy_store_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _catalog._ensure_loaded()
    return _catalog.REGISTRY["q23_daily_summary"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _catalog.all_oracles()
