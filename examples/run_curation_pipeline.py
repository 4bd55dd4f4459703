"""End-to-end example: run the training-data curation funnel on the
synthetic documents table and print the funnel report + shard manifest.

    python examples/run_curation_pipeline.py [sf_dir] [output_dir]

Stages (each an oracle-checked operator; see COVERAGE.md §2.12):
exact dedup -> near dedup -> quality gate -> decontamination ->
train/val/test split -> content-hash-sharded parquet export.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curation_output"

spark = get_spark("curation-example")
spark.sparkContext.setLogLevel("ERROR")
report = curate(spark, sf_dir, out)
print(json.dumps(report, indent=2, default=str))
