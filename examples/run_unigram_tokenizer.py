"""Example: the unigram-LM (SentencePiece-style) tokenizer end-to-end —
Viterbi-encode the corpus under the substring-seeded integer vocabulary
(q206), run one hard-EM re-estimation step and watch the seed vocab
prune itself (q207), compare fertility against the BPE family (q208),
then tokenize a "fresh crawl" with the FROZEN table and read the OOV
retrain signal (the streaming twin's contract).

    python examples/run_unigram_tokenizer.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.unigram import (
    _word_table,
    q208_tokenizer_fertility_compare,
    seed_vocab,
    unigram_em_step,
    unigram_encode_docs,
    unigram_encodings,
)
from etl_pipeline_candy_store_spark.plans.catalog import load
from etl_pipeline_candy_store_spark.session import get_spark
from etl_pipeline_candy_store_spark.streaming.curation_stream import (
    apply_unigram_encode_batch,
    read_unigram_encodings,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("unigram-tokenizer-example")
spark.sparkContext.setLogLevel("ERROR")
docs = load(spark, sf_dir, "documents")

# ---- train: substring seed vocab + per-word Viterbi --------------------
vocab, _ = seed_vocab(_word_table(docs))
n_seed = vocab.count()
enc = unigram_encodings(docs).localCheckpoint(eager=True)
print(f"seed vocab: {n_seed} pieces over {enc.count()} distinct words")

per_doc = unigram_encode_docs(docs)
tot = per_doc.agg(
    F.sum("n_words").alias("w"), F.sum("n_pieces").alias("p")
).collect()[0]
print(f"corpus encode: {tot['w']} words -> {tot['p']} pieces "
      f"(fertility {tot['p'] / tot['w']:.3f})")

# ---- one hard-EM step: usage-driven re-binning + prune ------------------
em = unigram_em_step(docs, top=10**6)
n_used = em.count()
print(f"EM step: Viterbi uses {n_used} of {n_seed} seed pieces "
      f"({n_seed - n_used} pruned); top pieces:")
for r in em.limit(8).collect():
    print(f"  {r['piece']!r:10} n={r['n_viterbi']:<7} "
          f"w_old={r['w_old']} w_new={r['w_new']}")

# ---- bake-off vs BPE ----------------------------------------------------
print("fertility bake-off (pieces per word, micros):")
for r in q208_tokenizer_fertility_compare(spark, sf_dir).collect():
    print(f"  {r['method']:8} {r['fert_micros']}")

# ---- frozen-table tokenization of a fresh crawl (OOV signal) -----------
crawl = spark.createDataFrame(
    [(10_000_001, "the fast zeppelin order"),
     (10_000_002, "entirely unseencontent here")],
    "doc_id bigint, text string",
)
out = tempfile.mkdtemp(prefix="uni_crawl_")
apply_unigram_encode_batch(crawl, enc.select("word", "v", "k"), out, 0)
for r in read_unigram_encodings(spark, out).orderBy("doc_id").collect():
    print(f"crawl doc {r['doc_id']}: {r['n_words']} known words, "
          f"{r['n_pieces']} pieces, n_oov={r['n_oov']}")

assert n_used < n_seed, "EM prune must drop unused seed pieces"
print("unigram tokenizer loop OK")
