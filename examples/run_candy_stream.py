"""End-to-end STREAMING candy pipeline: per-day transaction JSON files
arrive on a watched directory (the reference's daily Mongo-collection
cadence, src/candy_dag.py), the stateful allocation stream sinks
allocated lines to parquet, and the post-stream batch stage derives the
same four output tables the batch pipeline writes.

    python examples/run_candy_stream.py [input_dir] [work_dir]

input_dir needs products.csv + transactions_*.json (dataset-shaped);
work_dir gets watch/ lines/ checkpoint/ output/.
"""

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark import get_spark
from etl_pipeline_candy_store_spark.plans.candy_stream import (
    derive_candy_outputs,
    stream_candy_allocation,
)
from etl_pipeline_candy_store_spark.sources.writers import save_single_csv

src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/dataset_22"
work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/candy_stream"

spark = get_spark("candy-stream-example")
spark.sparkContext.setLogLevel("ERROR")

watch = os.path.join(work, "watch")
lines_dir = os.path.join(work, "lines")
ckpt = os.path.join(work, "checkpoint")
out = os.path.join(work, "output")
shutil.rmtree(work, ignore_errors=True)
os.makedirs(watch)

# simulate daily arrival: each day file lands separately (mtime order
# + maxFilesPerTrigger=1 makes each day its own micro-batch, matching
# the reference's per-day processing granularity)
day_files = sorted(glob.glob(os.path.join(src, "transactions_*.json")))
for f in day_files:
    shutil.copy(f, watch)
    time.sleep(1.05)

products_csv = os.path.join(src, "products.csv")
stream = stream_candy_allocation(spark, watch, products_csv, max_files_per_trigger=1)
q = (
    stream.writeStream.format("parquet")
    .option("path", lines_dir)
    .option("checkpointLocation", ckpt)
    .outputMode("append")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(300)
n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
print(f"processed {len(day_files)} day files in {n_batches} micro-batches")

lines = spark.read.parquet(lines_dir)
print(f"allocated lines: {lines.count()} (cancelled: "
      f"{lines.filter('cancelled = 1').count()})")

for name, df in derive_candy_outputs(spark, lines, products_csv).items():
    path = save_single_csv(df, out, f"{name}.csv")
    with open(path) as f:
        n = sum(1 for _ in f) - 1
    print(f"{name}: {n} rows -> {path}")
