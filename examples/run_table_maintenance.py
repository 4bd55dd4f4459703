"""Example: the table-maintenance lifecycle an incremental deployment
runs every day — incremental day-load with dynamic partition overwrite,
rollup refresh by partial-aggregate merge, then small-files compaction
with an atomic swap.

    python examples/run_table_maintenance.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded, load
from etl_pipeline_candy_store_spark.session import get_spark
from etl_pipeline_candy_store_spark.sources.writers import (
    compact_partitioned_parquet,
    save_partitioned_parquet,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("maintenance-example")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()

work = tempfile.mkdtemp(prefix="maintenance-")
table = os.path.join(work, "orders_by_month")
try:
    orders = load(spark, sf_dir, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    months = sorted(r["month"] for r in orders.select("month").distinct().collect())
    history, today = months[:-1], months[-1]

    # 1. Historical load, hive-partitioned by month.
    save_partitioned_parquet(
        orders.where(F.col("month").isin(history)), table, partition_by=["month"]
    )
    n_parts = len([d for d in os.listdir(table) if d.startswith("month=")])
    print(f"history load: {n_parts} month partitions")

    # 2. Incremental day: ONLY the newest month is (re)written — dynamic
    #    overwrite leaves every sibling partition untouched.
    save_partitioned_parquet(
        orders.where(F.col("month") == today),
        table,
        partition_by=["month"],
        dynamic=True,
    )
    total = spark.read.parquet(table).count()
    print(f"after incremental load of {today}: {total} rows "
          f"(source {orders.count()})")

    # 3. Rollup refresh: the registered partial-merge query (q164) —
    #    in a deployment the base partials are stored and only the new
    #    partition is scanned.
    rollup = REGISTRY["q164_incremental_rollup"].builder(spark, sf_dir)
    print(f"rollup rows: {rollup.count()}")

    # 4. Compaction: the incremental writes left small files; merge
    #    each month's files into scan-sized ones — one independent
    #    atomic swap per partition, so a crash mid-table leaves every
    #    month either old or new, never mixed.
    report = compact_partitioned_parquet(spark, table, target_mb=128)
    t = report["_total"]
    print(f"compacted {len(report) - 1} partitions: "
          f"{t['files_before']} -> {t['files_after']} files, {t['rows']} rows")

    # 5. Point-probe layout: rewrite the orders key column with a
    #    per-row-group Bloom filter — the row groups the filter rules
    #    out are skipped on `o_orderkey = ?` probes (min/max stats can't
    #    prune an unsorted key).
    from etl_pipeline_candy_store_spark.sources.writers import (
        parquet_tuning_options,
    )

    probed = os.path.join(work, "orders_bloom")
    save_partitioned_parquet(
        # scramble the key order: a key-sorted file is pruned by plain
        # min/max stats; Bloom filters earn their bytes on UNSORTED keys
        orders.repartition(1).sortWithinPartitions(F.xxhash64("o_orderkey")),
        probed,
        parquet_options={
            **parquet_tuning_options(
                bloom_filter_cols=["o_orderkey"],
                bloom_filter_ndv=10_000,
                row_group_bytes=100_000,
            ),
            "parquet.enable.dictionary": "false",
        },
    )
    key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    probe = spark.read.parquet(probed).where(F.col("o_orderkey") == key)
    probe.collect()
    leaves = probe._jdf.queryExecution().executedPlan().collectLeaves()
    scanned = leaves.apply(0).metrics().apply("numOutputRows").value()
    print(f"bloom probe: scanned {scanned} of {orders.count()} rows "
          f"for one key")

    # 6. Optimizer statistics: ANALYZE the catalog copy so the next
    #    filtered join costs at ~rows/ndv instead of full table size
    #    (CBO flips sort-merge joins to broadcast — see
    #    tests/test_cbo_stats.py).
    from etl_pipeline_candy_store_spark.sources.stats import (
        analyze_table,
        estimated_stats,
    )

    spark.conf.set("spark.sql.cbo.enabled", "true")
    orders.write.mode("overwrite").saveAsTable("maint_orders")
    analyze_table(spark, "maint_orders")
    est = estimated_stats(
        spark.table("maint_orders").where(F.col("o_orderpriority") == "1-URGENT")
    )
    print(f"post-ANALYZE filter estimate: {est}")
    spark.sql("DROP TABLE IF EXISTS maint_orders")
finally:
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
