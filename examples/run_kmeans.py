"""Example: k-means over the embeddings table, iterated to convergence.

Lloyd's algorithm with the engine's distributed shapes (q62 assignment +
q106 update): each iteration is ONE broadcast join (assignment — the
corpus never shuffles) and ONE map-side-combinable aggregate producing
k x d rows, which are collected (they are tiny by construction — that
collect is the algorithm's synchronization point, not a data move) and
re-broadcast as the next iteration's centroids. Convergence is measured
as the max per-dimension centroid shift in integer micro-units, so the
loop's stopping rule is deterministic across runs and engines.

    python examples/run_kmeans.py [sf_dir] [k] [max_iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
MAX_ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT_TOL = 1000  # stop when no centroid component moves > 1000 micro-units

spark = get_spark("kmeans-example")
spark.sparkContext.setLogLevel("ERROR")

e = load(spark, sf_dir, "embeddings")
dim = len(e.select("embedding").first()["embedding"])

# integer micro-unit components once; the loop never re-reads floats
comps = e.select(
    "vec_id",
    F.posexplode("embedding").alias("d", "comp"),
).select(
    "vec_id",
    "d",
    F.floor(F.col("comp").cast("double") * F.lit(1000000.0)).cast("long").alias("c"),
)
comps = comps.localCheckpoint()  # scanned every iteration — materialize once

# deterministic init: first K vectors (same rule as the q62 catalog query)
centroids = {
    (r["vec_id"], r["d"]): r["c"]
    for r in comps.filter(F.col("vec_id") < K).collect()
}
cent_rows = [
    (cid, d, v) for (cid, d), v in centroids.items()
]


def assign_and_update(cent_rows):
    cents = spark.createDataFrame(cent_rows, "centroid_id long, d int, cc long")
    # squared euclidean distance in the integer micro-unit domain:
    # sum over dims of (x_d - c_d)^2 — one broadcast join on the dim key,
    # partial-aggregated map-side; the corpus is never shuffled by key
    scored = (
        comps.join(F.broadcast(cents), "d")
        .withColumn("sq", (F.col("c") - F.col("cc")).cast("double") ** 2)
        .groupBy("vec_id", "centroid_id")
        .agg(F.sum("sq").alias("dist"))
    )
    w_best = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(
            F.col("dist").asc(), F.col("centroid_id").asc()
        )
    )
    assign = (
        scored.withColumn("rn", w_best).filter(F.col("rn") == 1).select(
            "vec_id", "centroid_id"
        )
    )
    update = (
        assign.join(comps, "vec_id")
        .groupBy("centroid_id", "d")
        .agg(
            F.expr("sum(c) div count(1)").alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return {
        (r["centroid_id"], r["d"]): (r["c"], r["n"]) for r in update.collect()
    }


print(f"k-means: k={K} dim={dim} sf={sf_dir}")
for it in range(1, MAX_ITERS + 1):
    t0 = time.time()
    new = assign_and_update(cent_rows)
    shift = max(
        abs(v - centroids.get(key, v)) for key, (v, _n) in new.items()
    )
    # a cluster that won zero members this round keeps its previous
    # centroid (standard practice) instead of silently vanishing — k
    # must stay k for the whole run
    updated = {key: v for key, (v, _n) in new.items()}
    empty = sorted({cid for cid, _d in centroids} - {cid for cid, _d in updated})
    centroids = {**centroids, **updated}
    cent_rows = [(cid, d, v) for (cid, d), v in centroids.items()]
    n_members = {}
    for (cid, _d), (_v, n) in new.items():
        n_members[cid] = n
    note = f" (empty clusters kept: {empty})" if empty else ""
    print(
        f"  iter {it}: max shift {shift} micro-units, "
        f"cluster sizes {sorted(n_members.values())} ({time.time() - t0:.1f}s){note}"
    )
    if shift <= SHIFT_TOL:
        print(f"converged after {it} iterations (shift <= {SHIFT_TOL})")
        break
else:
    print(f"stopped at max_iters={MAX_ITERS}")

spark.stop()
