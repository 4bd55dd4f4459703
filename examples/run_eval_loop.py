"""Example: the classifier train → evaluate → split loop a curation
stack runs continuously — one-pass linear-probe training on hashed
features (q134), exact tie-corrected AUC (q137), calibration bins
(q143), and the leakage-safe cluster split that the gated corpus ships
with (q144).

    python examples/run_eval_loop.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("eval-loop-example")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()

print("== per-language probe summary (q134) ==")
REGISTRY["q134_linear_probe_langid"].builder(spark, sf_dir).orderBy(
    "lang"
).show(10, truncate=False)

print("== AUC vs lang='en' (q137) — near 500000 ppm on this synthetic")
print("   corpus because the label is independent of the text ==")
REGISTRY["q137_probe_auc"].builder(spark, sf_dir).show(truncate=False)

print("== calibration bins (q143) ==")
REGISTRY["q143_calibration_bins"].builder(spark, sf_dir).orderBy("bin").show(
    20, truncate=False
)

print("== leakage-safe split sizes (q144) ==")
REGISTRY["q144_leakage_safe_split"].builder(spark, sf_dir).groupBy(
    "split"
).agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.countDistinct("cluster_id").alias("n_clusters"),
).orderBy("split").show(truncate=False)

spark.stop()
