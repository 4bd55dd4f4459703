"""Example: the daily-crawl incremental ingest loop — the cross-session
"materialize once per corpus version" pipeline shape at 100 TB.

Day 0: the existing corpus's per-doc MinHash state is materialized
under a fingerprint of the documents table (a parquet relation any
later session resolves by fingerprint instead of rebuilding).
Day 1: a new batch arrives; only the BATCH pays shingling + signing,
and its band table broadcast-probes the materialized corpus state —
no corpus recompute, no corpus shuffle. Survivors (no near-dup match)
are admitted. When the corpus itself changes on disk, the fingerprint
changes and the next consumer rebuilds exactly once.

    python examples/run_incremental_ingest.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    incremental_neardup,
    minhash_per_doc,
)
from etl_pipeline_candy_store_spark.operators.materialize import (
    materialized_relation,
    materialized_versions,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("incremental-ingest-example")
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="ingest_")
corpus_dir = os.path.join(work, "corpus")
store_dir = os.path.join(work, "store")
os.makedirs(corpus_dir)

docs = load(spark, sf_dir, "documents")

# ---- day 0: seed the corpus table and materialize its dedup state ----
docs.filter(F.col("doc_id") % 7 != 0).write.parquet(
    os.path.join(corpus_dir, "documents.parquet")
)

def corpus_state():
    return materialized_relation(
        spark,
        "corpus_minhash_per_doc",
        corpus_dir,
        build=lambda: minhash_per_doc(
            spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
        ),
        tables=("documents",),
        store_dir=store_dir,
    )

state = corpus_state()
print(f"day 0: corpus state materialized ({state.count()} docs, "
      f"versions: {materialized_versions('corpus_minhash_per_doc', store_dir)})")

# ---- day 1: a new batch probes the materialized state ----
batch = docs.filter(F.col("doc_id") % 7 == 0)
matches = incremental_neardup(batch, corpus_state())
dup_ids = matches.select(F.col("doc_new").alias("doc_id")).distinct()
admitted = batch.join(dup_ids, "doc_id", "left_anti")
n_batch, n_dups, n_admit = batch.count(), dup_ids.count(), admitted.count()
print(f"day 1: batch {n_batch} docs -> {n_dups} near-dup vs corpus, "
      f"{n_admit} admitted (no corpus recompute: state resolved by fingerprint)")
assert n_batch == n_dups + n_admit

# ---- the admitted docs join the corpus: fingerprint changes, ONE rebuild ----
admitted.write.parquet(os.path.join(corpus_dir, "documents.parquet", ),
                       mode="append")
state2 = corpus_state()
versions = materialized_versions("corpus_minhash_per_doc", store_dir)
print(f"day 2: corpus grew -> new fingerprint, rebuilt once "
      f"({state2.count()} docs, {len(versions)} addressable versions)")
assert state2.count() == state.count() + n_admit and len(versions) == 2

shutil.rmtree(work, ignore_errors=True)
print("incremental ingest loop OK")
