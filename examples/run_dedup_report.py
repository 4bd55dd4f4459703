"""Example: the dedup governance report — what the near-dup stage finds
(q51), what it saves (q153), whether the cheap gates are trustworthy
(q149 SimHash precision/recall, q154 MinHash calibration), and which
variant each cluster should keep (q142 centrality-canonical).

    python examples/run_dedup_report.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("dedup-report-example")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()

print("== dedup savings by cluster size (q153) ==")
REGISTRY["q153_dedup_savings"].builder(spark, sf_dir).orderBy(
    "cluster_size"
).show(10, truncate=False)

print("== SimHash gate vs exact Jaccard ground truth (q149) ==")
REGISTRY["q149_simhash_gate_calibration"].builder(spark, sf_dir).show(
    truncate=False
)

print("== MinHash signature calibration curve (q154) ==")
REGISTRY["q154_minhash_estimator_error"].builder(spark, sf_dir).orderBy(
    "agree"
).show(10, truncate=False)

print("== centrality-canonical picks for multi-member clusters (q142) ==")
q142 = REGISTRY["q142_canonical_by_pagerank"].builder(spark, sf_dir)
q142.where("n_members > 1").orderBy(
    "cluster_id"
).show(10, truncate=False)

spark.stop()
