"""Example: the BPE tokenizer pipeline end-to-end — train merges over
the corpus (q131's loop), inspect the learned subword vocabulary
(q132), and encode the corpus with a broadcast vocabulary join (q133),
reporting the compression each extra merge buys.

    python examples/run_tokenizer.py [sf_dir] [n_merges]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.text import (
    bpe_encode_counts,
    bpe_train,
    bpe_vocab,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 6

spark = get_spark("tokenizer-example")
spark.sparkContext.setLogLevel("ERROR")
docs = load(spark, sf_dir, "documents")

print(f"== training {n_merges} merges on {sf_dir} ==")
for r in bpe_train(docs, n_merges).orderBy("step").collect():
    print(f"  merge {r['step']}: '{r['sym_a']}' + '{r['sym_b']}'"
          f"  (pair count {r['n_pair']})")

print("\n== top subword vocabulary after training ==")
for r in bpe_vocab(docs, n_merges, top=10).collect():
    print(f"  {r['symbol']!r}: {r['n_occurrences']}")

print("\n== corpus compression by merge count ==")
for k in (0, n_merges // 2, n_merges):
    if k == 0:
        tot = docs.select(
            F.sum(F.length(F.regexp_replace("text", " ", ""))).alias("sub")
        ).collect()[0]["sub"]
        print(f"  {k} merges: {tot} tokens (char-level baseline)")
        continue
    agg = bpe_encode_counts(docs, k).agg(
        F.sum("n_subwords").alias("sub"), F.sum("n_chars_tok").alias("chr")
    ).collect()[0]
    print(f"  {k} merges: {agg['sub']} tokens "
          f"({agg['sub'] / agg['chr']:.3f} tokens/char)")

spark.stop()
