"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {"q01_pricing_summary": <sec>, ...}, "sf": 0.1}

Each query is fully executed via the noop sink (forces the whole plan —
joins, aggregations, pandas operators — without write-side cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",      # scan-heavy agg
    "q03_broadcast_join_agg",   # broadcast join
    "q04_multi_join_region",    # multi-way shuffle join
    "q09_window_running_sum",   # window
    "q23_daily_summary",        # two-level agg (flagship)
    "q30_allocation_sequential",  # applyInPandas stateful op
    "q52_minhash_lsh_pairs",    # dedup pipeline
    "q60_cosine_topk",          # similarity search
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from etl_pipeline_candy_store_spark.session import get_spark
    from etl_pipeline_candy_store_spark.plans import catalog

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._ensure_loaded()

    # Warm the JVM/parquet footers so the first query doesn't pay session
    # startup; excluded from timings.
    catalog.load(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        builder = catalog.REGISTRY[name].builder
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
