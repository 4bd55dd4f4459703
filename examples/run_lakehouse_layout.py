"""Example: ONE end-to-end 100 TB table layout, all levers composed.

The engine ships each layout lever with its own plan-locked test
(partitioning+DPP, bucketed zero-Exchange joins, parquet Bloom filters,
Z-order clustering, CBO statistics, small-file compaction); this script
composes them over the sf tables into the layout a 100 TB deployment
would actually write, and PRINTS the before/after scan metrics each
lever is bought for — numbers, not claims:

    python examples/run_lakehouse_layout.py [sf_dir]   # default sf0.1

Levers, in the order a lakehouse build applies them:

1. hive-partition the fact by month  -> partition pruning, and dynamic
   partition pruning (DPP) when the filter arrives through a dim join
2. bucket fact+fact on the join key  -> the shuffle is paid once at
   write; every later join plans with ZERO Exchange
3. ANALYZE the tables (CBO)          -> filtered-dim joins re-cost to
   broadcast, eliding even the bucketed sort-merge
4. Z-order cluster on two probe keys -> row-group min/max stats prune
   2-D range scans that a 1-D sort can only serve on its own key
5. Bloom filters on a point-probe key-> row-group skipping for point
   lookups the sort/bucket keys don't serve
6. compact small files               -> task-per-file overhead and
   footer reads drop; the layout survives incremental appends

Every metric below is the scan's own `numOutputRows` (rows the reader
could not skip), an Exchange count from the physical plan, or a file
count — the observables the per-lever tests lock, measured here on the
composed layout.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.layout import cluster_by_zorder
from etl_pipeline_candy_store_spark.plans.catalog import _ensure_loaded, load
from etl_pipeline_candy_store_spark.session import get_spark
from etl_pipeline_candy_store_spark.sources.stats import (
    analyze_table,
    estimated_stats,
)
from etl_pipeline_candy_store_spark.sources.writers import (
    compact_parquet,
    parquet_tuning_options,
    save_partitioned_parquet,
    write_bucketed_table,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("lakehouse-layout")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()


def scan_rows(df) -> int:
    """Sum of numOutputRows over the scan leaves — rows the parquet
    reader could NOT skip (AQE off so leaves are directly visible)."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_files(path: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


work = tempfile.mkdtemp(prefix="lakehouse-")
tables = []
saved_confs = {
    k: spark.conf.get(k, None)
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.cbo.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
}
try:
    orders = load(spark, sf_dir, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    lineitem = load(spark, sf_dir, "lineitem")
    print(
        f"== lakehouse layout over {sf_dir} "
        f"(orders {orders.count()}, lineitem {lineitem.count()} rows) =="
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    # ---- 1. hive partitioning + DPP ------------------------------------
    plain = os.path.join(work, "orders_plain")
    bymonth = os.path.join(work, "orders_by_month")
    orders.write.parquet(plain)
    save_partitioned_parquet(orders, bymonth, partition_by=["month"])
    months = [r["month"] for r in orders.select("month").distinct().collect()]
    # the dim carries the filter (a quarter label); its literal predicate
    # is what makes DPP fire (isLikelySelective needs a comparison, not a
    # bare boolean — the trap test_dynamic_partition_pruning locks), and
    # the dim must be a SOURCE relation (parquet), not an in-memory
    # LocalRelation — the planner demotes the pruning subquery to
    # dynamicpruningexpression(true) when the build side can't be reused
    dim_path = os.path.join(work, "month_dim")
    spark.createDataFrame(
        [(m, f"Q{(int(m[5:7]) - 1) // 3 + 1}") for m in months],
        "month string, quarter string",
    ).write.parquet(dim_path)
    dim_f = spark.read.parquet(dim_path).where(F.col("quarter") == "Q1")

    def star(path):
        return (
            spark.read.parquet(path)
            .join(dim_f, "month")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    rows_plain = scan_rows(star(plain))
    q_part = star(bymonth)
    rows_part = scan_rows(q_part)
    dpp = "dynamicpruningexpression" in plan_text(q_part)
    print(
        f"[1] partition+DPP: fact rows scanned {rows_plain} -> {rows_part} "
        f"({len(months)} month partitions, dim-derived filter, "
        f"DPP injected: {dpp})"
    )

    # ---- 2. bucketed join: zero Exchange -------------------------------
    write_bucketed_table(
        lineitem, "lake_lineitem_b", ["l_orderkey"], n_buckets=16,
        sort_cols=["l_orderkey"],
    )
    write_bucketed_table(
        orders, "lake_orders_b", ["o_orderkey"], n_buckets=16,
        sort_cols=["o_orderkey"],
    )
    tables += ["lake_lineitem_b", "lake_orders_b"]
    # merge hints model the 100 TB shape: both sides too large to
    # broadcast (at sf0.1 the optimizer would broadcast orders and hide
    # exactly the shuffle the bucket layout exists to kill). Exchange
    # counting is on the bare join — the terminal agg adds its own
    # reduction exchange in any layout.
    plain_join = spark.read.parquet(plain).hint("merge").join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    )
    bucket_join = spark.table("lake_orders_b").hint("merge").join(
        spark.table("lake_lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    ex_plain = plan_text(plain_join).count("Exchange")
    ex_bucket = plan_text(bucket_join).count("Exchange")
    agg = F.sum("l_quantity").cast("decimal(38,2)").alias("q")
    t0 = time.time()
    plain_join.agg(agg).collect()
    t_plain = time.time() - t0
    t0 = time.time()
    bucket_join.agg(agg).collect()
    t_bucket = time.time() - t0
    print(
        f"[2] bucketed join: Exchanges {ex_plain} -> {ex_bucket} "
        f"(wall {t_plain:.2f}s -> {t_bucket:.2f}s; the shuffle was paid "
        f"once at write and is amortized over every later join)"
    )

    # ---- 3. CBO statistics: filtered dim re-costs to broadcast ---------
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")

    # equality predicate: CBO's selectivity estimate is ndv-based, so
    # `month = literal` re-costs the filtered table at ~rows/80 — under
    # the forced 1MB threshold; a range predicate would keep the default
    # 30%-ish guess and never flip the join (the test_cbo_stats lesson)
    def dim_join():
        return spark.table("lake_lineitem_b").join(
            spark.table("lake_orders_b").where(F.col("month") == "1992-03"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )

    def _est():
        return estimated_stats(
            spark.table("lake_orders_b").where(F.col("month") == "1992-03")
        )

    est_before = _est()
    before = plan_text(dim_join())
    analyze_table(spark, "lake_orders_b")  # FOR ALL COLUMNS
    analyze_table(spark, "lake_lineitem_b", columns=None)
    est_after = _est()
    after = plan_text(dim_join())

    def _strategy(plan):
        if "BroadcastHashJoin" in plan:
            return "BroadcastHashJoin"
        if "SortMergeJoin" in plan:
            return "SortMergeJoin"
        return "?"

    print(
        f"[3] CBO: filtered-dim size estimate "
        f"{est_before['size_in_bytes']}B -> {est_after['size_in_bytes']}B "
        f"(rowCount {est_before['row_count']} -> {est_after['row_count']}); "
        f"join {_strategy(before)} -> {_strategy(after)}"
    )

    # ---- 4. Z-order clustering: 2-D range scan pruning -----------------
    # small row groups so a 600k-row table yields enough groups for
    # min/max skipping to be visible (at 100 TB the default 128MB
    # groups play the same role)
    zopts = {
        **parquet_tuning_options(row_group_bytes=256 * 1024),
        "parquet.enable.dictionary": "false",
    }
    zrand = os.path.join(work, "lineitem_random")
    zclust = os.path.join(work, "lineitem_zorder")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity")
    save_partitioned_parquet(
        li.repartition(8), zrand, parquet_options=zopts
    )
    save_partitioned_parquet(
        cluster_by_zorder(li, "l_suppkey", "l_partkey", 8).drop("_zkey"),
        zclust,
        parquet_options=zopts,
    )
    smax = li.agg(F.max("l_suppkey")).collect()[0][0]
    pmax = li.agg(F.max("l_partkey")).collect()[0][0]

    def box(path):
        return spark.read.parquet(path).where(
            (F.col("l_suppkey") < smax // 10) & (F.col("l_partkey") < pmax // 10)
        )

    rows_rand = scan_rows(box(zrand))
    rows_z = scan_rows(box(zclust))
    print(
        f"[4] z-order: 2-D box probe scans {rows_rand} -> {rows_z} rows "
        f"(row-group min/max tight on BOTH keys after Morton clustering)"
    )

    # ---- 5. Bloom filter: point probe on a non-sort key -----------------
    bopts = {
        **parquet_tuning_options(
            bloom_filter_cols=["l_partkey"],
            bloom_filter_ndv=pmax,
            row_group_bytes=256 * 1024,
        ),
        "parquet.enable.dictionary": "false",
    }
    bpath = os.path.join(work, "lineitem_bloom")
    save_partitioned_parquet(li.repartition(1), bpath, parquet_options=bopts)
    nobloom = os.path.join(work, "lineitem_nobloom")
    save_partitioned_parquet(
        li.repartition(1),
        nobloom,
        parquet_options={
            **parquet_tuning_options(row_group_bytes=256 * 1024),
            "parquet.enable.dictionary": "false",
        },
    )
    probe_key = li.limit(1).collect()[0]["l_partkey"]
    rows_nb = scan_rows(
        spark.read.parquet(nobloom).where(F.col("l_partkey") == probe_key)
    )
    rows_b = scan_rows(
        spark.read.parquet(bpath).where(F.col("l_partkey") == probe_key)
    )
    print(
        f"[5] bloom: point probe l_partkey={probe_key} scans "
        f"{rows_nb} -> {rows_b} rows (split-block Bloom per row group "
        f"on a key neither sorted nor bucketed)"
    )

    # ---- 6. compaction: incremental appends re-consolidated ------------
    frag = os.path.join(work, "orders_fragmented")
    orders.repartition(200).write.parquet(frag)
    files_before = n_files(frag)
    t0 = time.time()
    spark.read.parquet(frag).agg(F.count(F.lit(1))).collect()
    t_frag = time.time() - t0
    compact_parquet(spark, frag, target_mb=64)
    files_after = n_files(frag)
    t0 = time.time()
    spark.read.parquet(frag).agg(F.count(F.lit(1))).collect()
    t_comp = time.time() - t0
    print(
        f"[6] compaction: {files_before} files -> {files_after} "
        f"(full-scan wall {t_frag:.2f}s -> {t_comp:.2f}s; footer+task "
        f"overhead, the silent killer of incrementally-appended tables)"
    )
    print("== layout complete ==")
finally:
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for k, v in saved_confs.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
