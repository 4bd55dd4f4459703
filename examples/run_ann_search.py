"""Example: approximate-nearest-neighbor search over the embeddings
table — the IVF probe-1 vs probe-2 recall/cost trade on a shared query
set, plus the brute-force baseline (its own labeled query set).

    python examples/run_ann_search.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("ann-example")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()


def pairs(name):
    df = REGISTRY[name].builder(spark, sf_dir)
    return {
        (r["query_id"], r["neighbor_id"])
        for r in df.select("query_id", "neighbor_id").collect()
    }


exact = pairs("q60_cosine_topk")  # labeled brute-force baseline, query_ids 0..4
p1 = pairs("q65_ivf_search")      # probe-1: each query searches ONE cell
p2 = pairs("q87_ivf_multiprobe")  # probe-2: each query searches TWO cells

print(f"brute-force baseline (q60): {len(exact)} pairs over its query set")
print(f"IVF probe-1 (q65): {len(p1)} pairs")
print(f"IVF probe-2 (q87): {len(p2)} pairs")
# probe-2 widens the candidate cells for the SAME query set, so probe-1
# results it retains show the recall gained by the second probe
kept = len(p1 & p2)
print(f"probe-1 pairs retained by probe-2: {kept}/{len(p1)} "
      f"(+{len(p2) - kept} new pairs from the second cell)")
