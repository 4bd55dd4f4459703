"""Isolated per-query timing: fresh session, noop sink, N reps, median.

    python tools/qtime.py [--reps N] q220_fellegi_sunter_em [more...]

The fresh-session discipline from SCALE_NOTES: bench-tail readings of a
long session can be 2-3x inflated by GC/memory churn, so cross-change
A/Bs are taken here — one session per invocation, every query timed
with the same noop-sink methodology as bench.py, medians printed as one
JSON line. Session memos (the pair chain) start cold; the first rep of
a memo consumer pays the build, the median reports steady state, same
as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.session import get_spark

    spark = get_spark("qtime", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._ensure_loaded()
    catalog.load(spark, sf_dir, "lineitem").count()  # untimed warm-up

    out: dict[str, list[float]] = {}
    for name in names:
        builder = catalog.REGISTRY[name].builder
        ts: list[float] = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
    med = {n: sorted(t)[len(t) // 2] for n, t in out.items()}
    print(json.dumps({"cpus": cpus, "reps": out, "median": med}))
    spark.stop()


if __name__ == "__main__":
    main()
