"""Example: the RECURRING curation run — stateful curate() against a
persistent near-dup corpus state.

A pretraining data team re-runs its curation funnel every time the
corpus grows. Statelessly, the near-dedup stage (the funnel's dominant
cost) rebuilds the shingle self-join over the WHOLE corpus per run;
with ``corpus_state_dir`` it probes the persisted state and only the
new slice pays shingle-join cost — with bit-identical output (q216's
oracle locks the decomposition to plain exact pairs).

Day 0: curate the initial corpus statefully (run 0 seeds the state).
Day 1: a delta lands; re-curate the grown corpus — the near-dedup lap
now costs roughly the delta plus two linear scans, and the report is
hash-equal to what a stateless run over the grown corpus would emit.
Periodically, compact_neardup_state() folds the accumulated run
partitions (and any stale generations from edited docs) into one.

    python examples/run_incremental_curate.py [sf_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.neardup_state import (
    applied_runs,
    compact_neardup_state,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("incremental-curate-example")
spark.sparkContext.setLogLevel("ERROR")

work = tempfile.mkdtemp(prefix="inccurate_")
corpus_dir = os.path.join(work, "corpus")
state_dir = os.path.join(work, "ndstate")
os.makedirs(corpus_dir)

docs = load(spark, sf_dir, "documents")

# ---- day 0: initial corpus, stateful curate seeds the state ----------
docs.filter(F.col("doc_id") % 3 != 0).write.parquet(
    os.path.join(corpus_dir, "documents.parquet")
)
laps0: dict = {}
t0 = time.time()
r0 = curate(
    spark,
    corpus_dir,
    os.path.join(work, "out_day0"),
    n_shards=2,
    stage_seconds=laps0,
    corpus_state_dir=state_dir,
)
print(f"day 0 (state build): {time.time() - t0:.1f}s funnel={r0['funnel']}")
print(f"  near_dedup lap: {laps0['near_dedup']:.2f}s  runs={applied_runs(spark, state_dir)}")

# ---- day 1: the delta lands; re-curate the grown corpus --------------
docs.filter(F.col("doc_id") % 3 == 0).write.mode("append").parquet(
    os.path.join(corpus_dir, "documents.parquet")
)
laps1: dict = {}
t0 = time.time()
r1 = curate(
    spark,
    corpus_dir,
    os.path.join(work, "out_day1"),
    n_shards=2,
    stage_seconds=laps1,
    corpus_state_dir=state_dir,
)
print(f"day 1 (delta only):  {time.time() - t0:.1f}s funnel={r1['funnel']}")
print(f"  near_dedup lap: {laps1['near_dedup']:.2f}s  runs={applied_runs(spark, state_dir)}")

# ---- proof: the stateful run equals a stateless run over the same corpus
r_plain = curate(spark, corpus_dir, os.path.join(work, "out_plain"), n_shards=2)
assert r1["funnel"] == r_plain["funnel"], (r1["funnel"], r_plain["funnel"])
print("stateful == stateless on the grown corpus: OK")

# ---- retention: fold the accumulated runs into one -------------------
stats = compact_neardup_state(
    spark, state_dir, current=spark.read.parquet(f"{corpus_dir}/documents.parquet")
)
print(f"compaction: {stats}")
r2 = curate(
    spark,
    corpus_dir,
    os.path.join(work, "out_day2"),
    n_shards=2,
    corpus_state_dir=state_dir,
)
assert r2["funnel"] == r_plain["funnel"]
print("post-compaction replay still equals stateless: OK")
spark.stop()
