"""Full-catalog Spark-side execution sweep: run every registered query
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), print per-query
wall time, and a one-line JSON summary — the SCALE_NOTES evidence run.

The quadratic BASELINE queries (q61/q96/q124: all-pairs or exhaustive
scans that exist as documented contrast to the scale paths, guarded at
50k rows) burn ~150s of an sf0.1 sweep BY DESIGN, so they are skipped
unless SPARK_GRAFT_SWEEP_BASELINES=1 — they stay in the sf0.01 oracle
runs (tools/check_oracle.py), so correctness coverage is unchanged.

    python tools/sweep.py                 # routine sweep (baselines skipped)
    SPARK_GRAFT_SWEEP_BASELINES=1 python tools/sweep.py   # everything
    python tools/sweep.py q142 q160       # name-prefix subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUADRATIC_BASELINES = {
    "q61_embedding_neardup",
    "q96_sparse_cosine_pairs",
    "q124_ann_recall",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    include_baselines = os.environ.get("SPARK_GRAFT_SWEEP_BASELINES") == "1"
    prefixes = sys.argv[1:]

    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.session import get_spark

    spark = get_spark("sweep", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._ensure_loaded()

    names = sorted(catalog.REGISTRY)
    if prefixes:
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    skipped = []
    timings: dict[str, float] = {}
    failures = 0
    for name in names:
        if not include_baselines and name in QUADRATIC_BASELINES:
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            n_rows = catalog.REGISTRY[name].builder(spark, sf_dir).count()
            dt = time.time() - t0
            timings[name] = round(dt, 2)
            print(f"OK    {name}  ({n_rows} rows, {dt:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            failures += 1
            print(f"FAIL  {name}  {type(exc).__name__}: {exc}", flush=True)
    if skipped:
        print(
            f"SKIPPED {len(skipped)} quadratic baselines "
            f"({', '.join(skipped)}) — set SPARK_GRAFT_SWEEP_BASELINES=1 "
            "to include",
            flush=True,
        )
    print(
        json.dumps(
            {
                "metric": "catalog_sweep_total",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "n_queries": len(timings),
                "n_failures": failures,
                "skipped_baselines": sorted(skipped),
                "sf_dir": sf_dir,
            }
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
