"""Dump .explain("formatted") for named catalog queries into plans/<tag>/.

    python tools/plan_dump.py <outdir> <before|after> q251_exact_dup_spans [more...]

Writes plans/<outdir>/<query>_<tag>.txt — the optimization-round evidence
files (the judge checks plan claims in OPTIMIZATION_r*.md against these).
Uses sf0.1 (the bench scale) so plan shapes match the benched plans; AQE
plans print isFinalPlan=false (pre-execution), which is the comparable
form for a plan-shape diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from etl_pipeline_candy_store_spark.session import get_spark
    from etl_pipeline_candy_store_spark.plans import catalog

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-dump", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._ensure_loaded()

    for name in names:
        df = catalog.REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
