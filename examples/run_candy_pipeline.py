"""End-to-end example: run the full candy pipeline on the reference's
dataset_22 and print the output summary.

    python examples/run_candy_pipeline.py [input_dir] [output_dir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark import CandyConfig, CandyPipeline, get_spark

src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/dataset_22"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/candy_output"

spark = get_spark("candy-example")
spark.sparkContext.setLogLevel("ERROR")
pipe = CandyPipeline(
    spark,
    CandyConfig(
        products_csv=f"{src}/products.csv",
        customers_csv=f"{src}/customers.csv",
        transactions_paths=sorted(glob.glob(f"{src}/transactions_*.json")),
        output_dir=out,
    ),
)
paths = pipe.save_outputs()
print(f"cancelled items: {pipe.cancelled_items_count()}")
for name, path in paths.items():
    with open(path) as f:
        n = sum(1 for _ in f) - 1
    print(f"{name}: {n} rows -> {path}")
