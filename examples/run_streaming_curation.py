"""Example: curate a simulated crawl ON ARRIVAL, end to end.

Documents arrive in three micro-batches (a crawler's output). Each
stage runs as a Structured Streaming job with ``availableNow`` and
batch-scoped idempotent state, exactly as the equivalence tests prove:

  1. curation gate   — quality (q59) + repetition (q122) +
                       decontamination (q58 vs broadcast eval shingles)
  2. exact dedup     — digest-state probing (first-seen-wins, = q50)
  3. near-dup pairs  — incremental MinHash-LSH probing (= batch q52)

Prints the funnel (docs surviving each stage) and the near-dup pairs
found across micro-batch boundaries.

    python examples/run_streaming_curation.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.curation import _EVAL_MAX_DOC
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark
from etl_pipeline_candy_store_spark.streaming.curation_stream import (
    eval_shingle_set,
    read_curated_docs,
    read_deduped_docs,
    stream_curation_gate,
    stream_exact_dedup,
)
from etl_pipeline_candy_store_spark.streaming.neardup_stream import (
    read_neardup_pairs,
    stream_minhash_neardup,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("streaming-curation-example")
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="stream_curation_")

docs = load(spark, sf_dir, "documents")
eval_docs = docs.filter(F.col("doc_id") < _EVAL_MAX_DOC)
crawl = docs.filter(F.col("doc_id") >= _EVAL_MAX_DOC)
eval_sh = eval_shingle_set(eval_docs).localCheckpoint(eager=True)
n_crawl = crawl.count()

# the "crawler": three arrival chunks by doc_id
src = f"{work}/crawl"
n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
    crawl.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
        1
    ).write.mode("append").parquet(src)


def run_stage(writer, ckpt):
    q = (
        writer.option("checkpointLocation", f"{work}/{ckpt}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


# stage 1: gates on arrival
stream1 = (
    spark.readStream.schema(crawl.schema).option("maxFilesPerTrigger", 1).parquet(src)
)
run_stage(stream_curation_gate(stream1, eval_sh, f"{work}/curated"), "ckpt_gate")
curated = read_curated_docs(spark, f"{work}/curated")
n_curated = curated.count()

# stage 2: exact dedup on the gate's survivors (re-chunked arrival)
src2 = f"{work}/curated_flat"
curated.write.mode("overwrite").parquet(src2)
stream2 = (
    spark.readStream.schema(curated.schema)
    .option("maxFilesPerTrigger", 8)
    .parquet(src2)
)
run_stage(stream_exact_dedup(stream2, f"{work}/deduped"), "ckpt_dedup")
unique_docs = read_deduped_docs(spark, f"{work}/deduped")
n_unique = unique_docs.count()

# stage 3: incremental near-dup pairs over the unique corpus
src3 = f"{work}/unique_flat"
unique_docs.select("doc_id", "text").write.mode("overwrite").parquet(src3)
stream3 = (
    spark.readStream.schema("doc_id bigint, text string")
    .option("maxFilesPerTrigger", 8)
    .parquet(src3)
)
run_stage(stream_minhash_neardup(stream3, f"{work}/lsh"), "ckpt_lsh")
pairs = read_neardup_pairs(spark, f"{work}/lsh")

print("\n=== streaming curation funnel ===")
print(f"crawl docs arrived      {n_crawl}")
print(f"after gates             {n_curated}")
print(f"after exact dedup       {n_unique}")
print(f"near-dup pairs flagged  {pairs.count()}")
for r in pairs.orderBy(F.col("n_common").desc()).limit(5).collect():
    print(
        f"  doc {r['doc_a']} ~ doc {r['doc_b']}"
        f"  (shared shingles {r['n_common']}/{r['n_union']})"
    )
shutil.rmtree(work)
spark.stop()
