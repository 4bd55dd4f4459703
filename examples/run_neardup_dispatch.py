"""Example: the neardup() dispatcher end to end.

Shows the one-front-door near-dup API (operators/neardup.py): the
measured dispatch signals, the auto pick, a forced-family comparison on
the same corpus, and the declared-overlap-locality escape hatches.

    python examples/run_neardup_dispatch.py [sf_dir]   # default sf0.01
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_candy_store_spark.operators.neardup import (
    neardup,
    neardup_signals,
    pick_strategy,
)
from etl_pipeline_candy_store_spark.plans.catalog import _ensure_loaded, load
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("neardup-dispatch")
spark.sparkContext.setLogLevel("ERROR")
_ensure_loaded()

docs = load(spark, sf_dir, "documents")

# 1. the measured signals (oracle-verified as q247) and the auto pick
sig = neardup_signals(docs)
print(f"signals: {sig}  ->  auto picks {pick_strategy(sig)!r}")

# 2. run every family on the same corpus — the agreement numbers a team
#    reads before choosing which detector to pay for at 100 TB
for strategy in ("minhash", "simhash", "winnow", "containment", "edit"):
    pairs = neardup(docs, strategy=strategy)
    print(f"{strategy:12s} -> {pairs.count():6d} pairs   {pairs.columns}")

# 3. declared overlap locality beats the measured signals: the caller
#    knows the workload (quotes/plagiarism vs whole-doc rewrites)
print("overlap='local'  ->", pick_strategy(sig, overlap="local"))
print("overlap='subset' ->", pick_strategy(sig, overlap="subset"))

# 4. auto = the picked family's exact frame (hash-identical contract)
auto = neardup(docs, strategy="auto")
forced = neardup(docs, strategy=pick_strategy(sig))
assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, forced.collect()))
print("auto == forced pick: verified")
spark.stop()
