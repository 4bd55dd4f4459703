"""Dump the FULL exact_dup_spans physical plan (checkpoint barriers
off, so explain shows the whole tree instead of truncating at the
checkpointed Scan ExistingRDD) — the q251 plan-shape evidence file.

    python tools/span_plan_dump.py plans/r16 after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from etl_pipeline_candy_store_spark.operators.dedup import exact_dup_spans
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("span-plan-dump", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    df = exact_dup_spans(
        load(spark, sf_dir, "documents"), checkpoint=False
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(outdir, f"q251_full_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
