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

# --- PQ-ADC with a kmeans-refined codebook ---------------------------
# q126's catalog instance seeds its codebook from the first 16 corpus
# vectors (deterministic, oracle-friendly). Production refines the book
# with k-means: here we pivot q106's one-Lloyd-iteration centroid
# update (long (centroid_id, dim, mean_micros) rows) back into vectors
# and drop it into the SAME pq_adc_search operator — no replanning.
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.similarity import pq_adc_search
from etl_pipeline_candy_store_spark.plans.catalog import load

e = load(spark, sf_dir, "embeddings")
queries = e.filter(F.col("vec_id") < 5).select(
    F.col("vec_id").alias("query_id"), "embedding"
)
seed_cb = e.filter(F.col("vec_id") < 16).select(
    F.col("vec_id").alias("entry_id"), "embedding"
)
refined_cb = (
    REGISTRY["q106_kmeans_update"].builder(spark, sf_dir)
    .groupBy("centroid_id")
    .agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean_micros"))),
            lambda s: (s["mean_micros"] / F.lit(1000000.0)).cast("float"),
        ).alias("embedding")
    )
    .select(F.col("centroid_id").alias("entry_id"), "embedding")
)


def pq_recall(cb, label):
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_adc_search(e, cb, queries).collect()
    }
    ov = len(got & exact)
    print(f"PQ-ADC recall@5 vs exact, {label}: {ov}/{len(exact)}")


pq_recall(seed_cb, "seed codebook (first 16 vectors)")
pq_recall(refined_cb, "kmeans-refined codebook (q106 centroids)")
