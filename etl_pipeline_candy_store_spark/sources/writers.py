"""Sinks (SURVEY §2.1 S6-S8).

The single-file CSV sink reproduces the reference's output contract
(src/data_processor.py:572-600: coalesce(1) → temp dir → move part file)
— kept ONLY for the small golden outputs. The scale path is partitioned
parquet; never coalesce(1) a large result (SURVEY §4.2).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def save_single_csv(df: DataFrame, output_dir: str, filename: str) -> str:
    """S7 — write ``df`` as ONE csv file with header at
    ``output_dir/filename``. Single-task write: only for small outputs."""
    os.makedirs(output_dir, exist_ok=True)
    tmp = os.path.join(output_dir, f"_tmp_{filename.replace('.', '_')}")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    final = os.path.join(output_dir, filename)
    if os.path.exists(final):
        os.remove(final)
    shutil.move(part, final)
    shutil.rmtree(tmp)
    return final


def save_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """The 100 TB sink: multi-part parquet, optionally hive-partitioned
    (e.g. by business_date so downstream scans prune days)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "overwrite",
) -> None:
    """S6 — JDBC sink (reference: src/data_processor.py:237-269).
    Runtime-verified against embedded Derby in ``tests/test_jdbc.py``
    (overwrite replaces, append accumulates, values round-trip)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .mode(mode)
        .save()
    )
