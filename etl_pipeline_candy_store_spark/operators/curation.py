"""Training-data curation operators: deterministic stratified sampling,
greedy sequence packing (context-window budgeting), and benchmark
decontamination. No counterpart in the reference (its pipeline stops at
BI outputs); these are the ops a pretraining-data pipeline runs after
dedup, expressed Spark-first.

Scale notes:
- Sampling is a pure filter on a content hash — no shuffle, fully
  pushdown-friendly, and reproducible across runs/retries (same property
  the salting fix needed: hash of row content, never rand()).
- Packing is sequential per source (bin state carries doc-to-doc), so it
  uses the same partition-sorted single-pass ``mapInPandas`` shape as
  the allocation operator: one shuffle on source, state across Arrow
  batches, task count = shuffle width. Sources are the natural packing
  unit at 100 TB (you pack within a corpus slice, not across the world).
- Decontamination is a shingle equi-join against the (small) eval set —
  broadcast the eval shingles; no pair space materializes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_pipeline_candy_store_spark.operators.dedup import _SHINGLES_SQL, _shingles
from etl_pipeline_candy_store_spark.plans.catalog import load, register

_PACK_BUDGET = 128  # tokens per context window
_EVAL_MAX_DOC = 10  # doc_id < 10 plays the held-out benchmark set
_CONTAM_MIN_OVERLAP = 3

# Portable 8-bit content hash: both engines index the same md5 hex chars
# (1-based instr/strpos arithmetic; no hex→int casts, which differ).
_HEXPOS = "instr('0123456789abcdef', substr(md5(text), {i}, 1)) - 1"
_H256_SQL = f"(({_HEXPOS.format(i=1)}) * 16 + ({_HEXPOS.format(i=2)}))"


def _h256(col: str = "text"):
    """The portable 8-bit content hash as a Spark Column (see
    ``_H256_SQL`` for the identical DuckDB arithmetic)."""
    md5 = F.md5(F.col(col).cast("binary"))
    return (
        (F.instr(F.lit("0123456789abcdef"), F.substring(md5, 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(md5, 2, 1)) - 1)
    )


@register(
    "q56_stratified_sample",
    oracle=f"""
SELECT doc_id, source, CAST({_H256_SQL} AS BIGINT) AS h
FROM documents
WHERE {_H256_SQL} < CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
                         THEN 77 ELSE 128 END
""",
    doc="Deterministic stratified sampling: keep a doc iff an 8-bit "
    "content hash clears the stratum's rate (~30% for even-numbered "
    "sources, 50% for odd). Pure filter — no shuffle, no RNG state, "
    "identical sample on every run/retry/engine; the way a 100 TB "
    "pipeline downsamples a stratum without a sort or a count.",
)
def q56_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = _h256()
    rate = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(77)
    ).otherwise(F.lit(128))
    return d.select("doc_id", "source", h.cast("long").alias("h")).filter(
        F.col("h") < rate
    )


_PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("source", StringType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_id", LongType(), False),
    ]
)


def pack_sequences(
    docs: DataFrame,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = _PACK_BUDGET,
) -> DataFrame:
    """Greedy first-fit-in-order sequence packing: walk each group's
    docs in order, filling context windows of ``budget`` tokens; a doc
    that would overflow starts the next bin (an oversized doc occupies
    a bin alone). Sequential per group ⇒ partition-sorted single-pass
    ``mapInPandas`` with bin state carried across Arrow batches —
    the allocation operator's physical shape (allocation.py:39).
    """

    def _pack(batches):
        state: dict = {}  # group -> (bin_id, fill); groups never span partitions
        for pdf in batches:
            if not len(pdf):
                continue
            out_bin = []
            for g, n in zip(pdf[group_col], pdf[tokens_col]):
                bin_id, fill = state.get(g, (0, 0))
                n = int(n)
                if fill > 0 and fill + n > budget:
                    bin_id, fill = bin_id + 1, 0
                fill += n
                state[g] = (bin_id, fill)
                out_bin.append(bin_id)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[order_col].astype("int64"),
                    "source": pdf[group_col],
                    "n_tokens": pdf[tokens_col].astype("int64"),
                    "bin_id": pd.Series(out_bin, dtype="int64"),
                }
            )

    return (
        docs.repartition(group_col)
        .sortWithinPartitions(group_col, order_col)
        .mapInPandas(_pack, schema=_PACK_SCHEMA)
    )


@register(
    "q57_sequence_packing",
    oracle=f"""
WITH RECURSIVE
docs AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
pack(source, rn, doc_id, n_tokens, bin_id, fill) AS (
  SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id, d.n_tokens,
         CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
              THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.fill + d.n_tokens <= {_PACK_BUDGET}
              THEN p.fill + d.n_tokens ELSE d.n_tokens END
  FROM pack p JOIN docs d ON d.source = p.source AND d.rn = p.rn + 1
)
SELECT doc_id, source, n_tokens, bin_id FROM pack
""",
    doc="Greedy sequence packing into 128-token context windows per "
    "source (first-fit in doc order; oversized docs get their own bin) "
    "— the pretraining batch-prep step. Spark side is the partition-"
    "sorted mapInPandas shape; the oracle is a per-group linear "
    "recursive CTE.",
)
def q57_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return pack_sequences(d)


@register(
    "q58_decontamination",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_MAX_DOC})
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
WHERE s.doc_id >= {_EVAL_MAX_DOC}
GROUP BY s.doc_id
HAVING COUNT(*) >= {_CONTAM_MIN_OVERLAP}
""",
    doc="Benchmark decontamination: flag training docs sharing >= 3 "
    "distinct 3-token shingles with the held-out eval set (doc_id < "
    "10). Shingle equi-join against the broadcast eval side — the "
    "standard n-gram-overlap decontamination pass, linear in corpus "
    "size.",
)
def q58_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingles(load(spark, sf_dir, "documents"))
    eval_sh = (
        sh.filter(F.col("doc_id") < _EVAL_MAX_DOC).select("shingle").distinct()
    )
    return (
        sh.filter(F.col("doc_id") >= _EVAL_MAX_DOC)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("doc_id", F.col("n_overlap").cast("long").alias("n_overlap"))
    )


_STOPWORDS = "'the','of','and','a','to','in','is','it','that','for'"


@register(
    "q59_quality_filter",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> lower(t) IN ({_STOPWORDS}))) AS BIGINT) AS n_stop,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens, n_stop, n_alpha, n_chars,
       CAST(CASE WHEN n_tokens BETWEEN 10 AND 1000
                  AND n_alpha * 2 >= n_chars
                  AND n_chars BETWEEN n_tokens * 2 AND n_tokens * 12
             THEN 1 ELSE 0 END AS INTEGER) AS passed
FROM m
""",
    doc="Gopher-style quality gate per document: token-count bounds, "
    "alphabetic-character fraction >= 50%, and mean word length within "
    "[2, 12] chars — all as INTEGER cross-multiplications (no float "
    "ratios, so both engines hash identically). One scan, no shuffle; "
    "the canonical cheap first filter of a pretraining pipeline.",
)
def q59_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_gate(load(spark, sf_dir, "documents"))


def quality_gate(d: DataFrame) -> DataFrame:
    """Per-doc quality metrics + integer ``passed`` flag over any
    documents frame with (doc_id, text) — the reusable stage behind q59
    and the curation pipeline."""
    toks = F.split("text", " ")
    m = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.expr(f"filter(split(text, ' '), t -> lower(t) IN ({_STOPWORDS}))")
        ).cast("long").alias("n_stop"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long").alias("n_alpha"),
        F.length("text").cast("long").alias("n_chars"),
    )
    passed = (
        F.col("n_tokens").between(10, 1000)
        & (F.col("n_alpha") * 2 >= F.col("n_chars"))
        & (F.col("n_chars") >= F.col("n_tokens") * 2)
        & (F.col("n_chars") <= F.col("n_tokens") * 12)
    )
    return m.select(
        "*", F.when(passed, F.lit(1)).otherwise(F.lit(0)).alias("passed")
    )


@register(
    "q80_hash_split",
    oracle=f"""
WITH s AS (
  SELECT CASE WHEN {_H256_SQL} < 230 THEN 'train'
              WHEN {_H256_SQL} < 243 THEN 'val'
              ELSE 'test' END AS split,
         n_chars
  FROM documents
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
""",
    doc="Deterministic train/val/test assignment by content hash "
    "(~90/5/5): a pure stateless filter expression, so the split is "
    "identical on every run, every engine, and every retry — no RNG, "
    "no global sort, no coordination; exactly how a 100 TB corpus is "
    "split without ever collecting it. Emits per-split doc and char "
    "totals.",
)
def q80_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = _h256()
    split = (
        F.when(h < 230, F.lit("train")).when(h < 243, F.lit("val")).otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "q81_source_mix_rebalance",
    oracle=f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_src,
         CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
              THEN 3 ELSE 1 END AS w
  FROM documents GROUP BY source
),
t AS (SELECT SUM(n_src) AS n_tot, SUM(w) AS sum_w FROM c)
SELECT d.doc_id, d.source
FROM documents d JOIN c ON d.source = c.source CROSS JOIN t
WHERE ({_H256_SQL}) * t.sum_w * c.n_src < 256 * t.n_tot * c.w
""",
    doc="Source-mix rebalancing: given per-source target weights (even-"
    "numbered sources 3x odd), compute each source's keep-rate = "
    "target_share * total / source_count and keep docs whose content "
    "hash clears it. Two cheap aggregates produce a tiny rate table "
    "(broadcast), then one stateless filter pass — the deterministic "
    "way to hit a domain mix at 100 TB. The rate comparison is integer "
    "cross-multiplied, so both engines agree bit-for-bit.",
)
def q81_source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    c = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .withColumn(
            "w",
            F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(3))
            .otherwise(F.lit(1)),
        )
    )
    t = c.agg(
        F.sum("n_src").alias("n_tot"), F.sum("w").alias("sum_w")
    )
    return (
        d.join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .filter(
            _h256() * F.col("sum_w") * F.col("n_src")
            < 256 * F.col("n_tot") * F.col("w")
        )
        .select("doc_id", "source")
    )


@register(
    "q90_negative_sampling",
    oracle="""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
anchors AS (SELECT doc_id, source FROM documents),
pairs AS (
  SELECT a.doc_id,
         u.j,
         CAST((a.doc_id * 7919 + u.j * 104729 + 17) % n.n_docs AS BIGINT) AS neg_id
  FROM anchors a, n, unnest(range(0, 4)) AS u(j)
),
kept AS (SELECT * FROM pairs WHERE neg_id <> doc_id)
SELECT k.doc_id, CAST(k.j AS INTEGER) AS j, k.neg_id,
       d.source AS neg_source,
       a.source = d.source AS same_source
FROM kept k
JOIN documents d ON d.doc_id = k.neg_id
JOIN anchors a ON a.doc_id = k.doc_id
""",
    doc="Deterministic negative sampling for contrastive training: each "
    "anchor doc gets 4 pseudo-random negatives via modular hashing "
    "(doc_id*7919 + j*104729 + 17 mod N) — no RNG, so resampling on "
    "task retry reproduces identical pairs (the property rand() "
    "sampling loses under speculative re-execution). Accidental "
    "self-pairs are dropped; negatives materialize through one "
    "equi-join on neg_id (shuffle bounded by 4x corpus, never a cross "
    "product); same_source flags in-domain negatives for curriculum "
    "filtering. Assumes contiguous doc_ids (the corpus contract); for "
    "sparse ids, rank first with zipWithIndex-free row_number over a "
    "stable sort.",
)
def q90_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = d.select("doc_id", "source")
    pairs = (
        anchors.join(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
            "n_docs",
        )
        .select(
            "doc_id",
            "source",
            "j",
            F.expr("(doc_id * 7919 + j * 104729 + 17) % n_docs")
            .cast("long")
            .alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("doc_id"))
    )
    negs = d.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    return pairs.join(negs, "neg_id").select(
        "doc_id",
        F.col("j").cast("int").alias("j"),
        "neg_id",
        "neg_source",
        (F.col("source") == F.col("neg_source")).alias("same_source"),
    )


@register(
    "q101_contrastive_triplets",
    oracle=None,  # composed below from q52's oracle at registration time
    doc="Contrastive training triplets (anchor, positive, negative): "
    "positives are the MinHash-LSH near-dup pairs (q52 — semantically "
    "close by construction), negatives come from the q90 modular-hash "
    "scheme with three stepped candidates so the first one distinct "
    "from BOTH pair members is chosen deterministically (consecutive "
    "offsets 0/1/2 are pairwise distinct mod N for any N >= 3, so "
    "with only two forbidden values one candidate always survives). "
    "RNG-free end to end: retry/speculation replays produce identical "
    "triplets. One equi-join materializes negative text metadata; "
    "fan-out is exactly one negative per positive pair.",
)
def q101_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.dedup import (
        q52_minhash_lsh_pairs,
    )

    pairs = q52_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    d = load(spark, sf_dir, "documents")
    n = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    cands = pairs.crossJoin(F.broadcast(n)).select(
        "doc_a",
        "doc_b",
        *[
            (
                (F.col("doc_a") * 7919 + F.col("doc_b") * 104729 + 31 + j)
                % F.col("n_docs")
            ).alias(f"c{j}")
            for j in range(3)
        ],
    )
    neg = F.when(
        (F.col("c0") != F.col("doc_a")) & (F.col("c0") != F.col("doc_b")),
        F.col("c0"),
    ).when(
        (F.col("c1") != F.col("doc_a")) & (F.col("c1") != F.col("doc_b")),
        F.col("c1"),
    ).otherwise(F.col("c2"))
    trip = cands.select(
        F.col("doc_a").alias("anchor_id"),
        F.col("doc_b").alias("positive_id"),
        neg.cast("long").alias("negative_id"),
    )
    negsrc = d.select(
        F.col("doc_id").alias("negative_id"), F.col("source").alias("neg_source")
    )
    return trip.join(negsrc, "negative_id").select(
        "anchor_id", "positive_id", "negative_id", "neg_source"
    )


def _q101_oracle() -> str:
    from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY

    q52 = REGISTRY["q52_minhash_lsh_pairs"].oracle
    cand = "CAST((p.doc_a * 7919 + p.doc_b * 104729 + 31 + {j}) % n.n_docs AS BIGINT)"
    c0, c1, c2 = (cand.format(j=j) for j in range(3))
    return f"""
WITH p AS ({q52}),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
trip AS (
  SELECT p.doc_a AS anchor_id, p.doc_b AS positive_id,
         CASE WHEN {c0} <> p.doc_a AND {c0} <> p.doc_b THEN {c0}
              WHEN {c1} <> p.doc_a AND {c1} <> p.doc_b THEN {c1}
              ELSE {c2} END AS negative_id
  FROM p CROSS JOIN n
)
SELECT t.anchor_id, t.positive_id, t.negative_id, d.source AS neg_source
FROM trip t JOIN documents d ON d.doc_id = t.negative_id
"""


# the oracle composes q52's registered SQL — import its module first so
# this file works when imported standalone, not only via the catalog
from etl_pipeline_candy_store_spark.operators import dedup as _dedup  # noqa: F401
from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY as _REG
import dataclasses as _dc

_REG["q101_contrastive_triplets"] = _dc.replace(
    _REG["q101_contrastive_triplets"], oracle=_q101_oracle()
)


@register(
    "q111_token_dropout",
    oracle="""
WITH toks AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
kept AS (
  SELECT doc_id,
         string_agg(tok, ' ' ORDER BY pos) AS text_aug,
         COUNT(*) AS n_kept
  FROM toks
  WHERE (doc_id * 31 + (pos - 1) * 7919) % 10 <> 0
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_orig,
       CAST(COALESCE(k.n_kept, 0) AS INTEGER) AS n_kept,
       COALESCE(k.text_aug, '') AS text_aug
FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
""",
    doc="Deterministic token-dropout augmentation: ~10% of each doc's "
    "tokens are dropped by POSITION-derived arithmetic "
    "((doc_id*31 + pos*7919) % 10 == 0) — no RNG, so task retries and "
    "re-runs emit byte-identical augmented text (the property that "
    "makes augmented corpora reproducible and dedup-able), and "
    "different docs drop different positions. Entirely row-local: one "
    "array filter + join per document, zero shuffles, zero joins on "
    "the Spark side — the ideal 100 TB shape (map-only over the "
    "corpus).",
)
def q111_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    kept = F.filter(
        toks, lambda x, i: ((F.col("doc_id") * 31 + i * 7919) % 10) != 0
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_orig"),
        F.size(kept).cast("int").alias("n_kept"),
        F.array_join(kept, " ").alias("text_aug"),
    )


@register(
    "q150_eval_holdout",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, md5(text) AS h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
           AS rnk
  FROM documents
)
SELECT doc_id, lang, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 5
""",
    doc="Exact-k-per-stratum holdout: the 5 docs per language with the "
    "smallest content-md5 — a fixed-size, deterministic, "
    "content-addressed eval sample (rate-based q56 cannot guarantee "
    "per-stratum counts; benchmark construction needs exactly k). "
    "Hash order is pseudo-random but identical on every run/engine/"
    "retry. The per-stratum top-k runs as a lang-PARTITIONED window — "
    "bounded by one stratum per task, never a global sort (and at "
    "extreme stratum skew the q89-style orderBy().limit() per-group "
    "top-k applies).",
)
def q150_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "lang", F.col("rnk").cast("int").alias("rnk"))
    )


_APPORTION_BUDGET = 100  # docs to sample across sources


@register(
    "q196_sample_apportionment",
    oracle=f"""
WITH per_src AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(chars) AS BIGINT) AS tc FROM per_src),
base AS (
  SELECT source, chars,
         CAST(({_APPORTION_BUDGET} * chars) // tc AS BIGINT) AS quota,
         CAST(({_APPORTION_BUDGET} * chars) % tc AS BIGINT) AS rem
  FROM per_src CROSS JOIN tot
),
ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS BIGINT)
           AS rr,
         CAST({_APPORTION_BUDGET} - SUM(quota) OVER () AS BIGINT)
           AS leftover
  FROM base
)
SELECT source, chars, quota,
       CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(quota + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked
""",
    doc="Largest-remainder (Hamilton) apportionment of a fixed sample "
    "budget across sources, proportional to character mass: quota_i = "
    "floor(B*chars_i/total), then the leftover seats go to the largest "
    "remainders (ties by source name). The deterministic, integer-exact "
    "way to size per-source samples so they sum EXACTLY to the budget — "
    "the per-stratum head-count q56's rate-based sampler can't "
    "guarantee (a hash-rate sample only hits the budget in "
    "expectation). RNG-free, reproducible across runs and engines. "
    "Plan: one corpus scan folds to the source-count-sized relation; "
    "the apportionment windows run over that tiny frame (the documented "
    "tiny-relation exemption) and the budget total is a broadcast "
    "scalar.",
)
def q196_sample_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars")
    )
    tot = per_src.agg(F.sum("chars").cast("long").alias("tc"))
    base = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "chars",
        F.expr(f"({_APPORTION_BUDGET} * chars) div tc")
        .cast("long")
        .alias("quota"),
        F.expr(f"({_APPORTION_BUDGET} * chars) % tc")
        .cast("long")
        .alias("rem"),
    )
    from pyspark.sql.window import Window

    w_rank = Window.orderBy(F.col("rem").desc(), F.col("source"))
    w_all = Window.partitionBy()
    ranked = base.select(
        "source",
        "chars",
        "quota",
        F.row_number().over(w_rank).cast("long").alias("rr"),
        (
            F.lit(_APPORTION_BUDGET) - F.sum("quota").over(w_all)
        )
        .cast("long")
        .alias("leftover"),
    )
    return ranked.select(
        "source",
        "chars",
        "quota",
        (F.col("rr") <= F.col("leftover")).cast("long").alias("extra"),
        (
            F.col("quota")
            + (F.col("rr") <= F.col("leftover")).cast("long")
        )
        .cast("long")
        .alias("alloc"),
    )


#: Fixed pad-to-length bins (powers of two, capped): a CASE chain keeps
#: the binning integer-portable across engines (no float log2).
_PAD_BINS = (16, 32, 64, 128, 256, 512, 1024)


@register(
    "q197_padding_waste",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
binned AS (
  SELECT source, n_tok,
         CAST(CASE {" ".join(f"WHEN n_tok <= {b} THEN {b}" for b in _PAD_BINS)}
              ELSE {2 * _PAD_BINS[-1]} END AS BIGINT) AS bin_len
  FROM toks
)
SELECT source, bin_len,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(SUM(bin_len - n_tok) AS BIGINT) AS n_padding,
       CAST(SUM(bin_len - n_tok) * 1000000 // SUM(bin_len) AS BIGINT)
         AS waste_ppm
FROM binned GROUP BY source, bin_len
""",
    doc="Sequence-length binning with padding-waste accounting: each doc "
    "pads up to its power-of-two length bin (the CASE chain keeps the "
    "binning integer-portable — no float log2), and the rollup reports "
    "docs/tokens/padding and waste ppm per (source, bin). The signal a "
    "training pipeline uses to choose batch length buckets: waste_ppm "
    "IS the fraction of compute burned on pad tokens under that "
    "bucketing. Pairs with q57 (greedy packing): packing eliminates "
    "the waste this op measures. Plan: one corpus scan, a row-local "
    "token count + CASE, and one map-side-combinable agg on the "
    "(source, bin) key — bounded output, no joins, no windows.",
)
def q197_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("long")
    bin_col = None
    for b in _PAD_BINS:
        cond = n_tok <= b
        bin_col = (
            F.when(cond, F.lit(b))
            if bin_col is None
            else bin_col.when(cond, F.lit(b))
        )
    bin_col = bin_col.otherwise(F.lit(2 * _PAD_BINS[-1])).cast("long")
    binned = d.select(
        "source", n_tok.alias("n_tok"), bin_col.alias("bin_len")
    )
    return binned.groupBy("source", "bin_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.sum(F.col("bin_len") - F.col("n_tok"))
        .cast("long")
        .alias("n_padding"),
        F.expr("sum(bin_len - n_tok) * 1000000 div sum(bin_len)")
        .cast("long")
        .alias("waste_ppm"),
    )


# --------------------------------------------------------------------------
# q199 — semantic decontamination: the embedding-space complement of q58's
# n-gram pass. Real contamination survives paraphrase, so production
# pipelines (GPT-3 appendix C lineage) run BOTH a lexical-overlap and an
# embedding-similarity screen against the held-out benchmark.
# --------------------------------------------------------------------------
_SEM_PANEL = 16  # vec_id < 16 plays the fixed held-out benchmark panel
#: cosine micro-unit threshold — calibrated to the synthetic embeddings
#: (near-random, max pairwise cos ~0.48; real pipelines run ~0.9+). The
#: operator itself is threshold-parameterized; only the conformance
#: constant is data-calibrated.
_SEM_TAU = 350000


def _sem_decon_sql() -> str:
    from etl_pipeline_candy_store_spark.operators.similarity import (
        _E_NORMED_SQL,
        _cos_micros_prenorm_sql,
    )

    cos = _cos_micros_prenorm_sql("p.p_emb", "c.embedding", "p.p_nrm", "c.nrm")
    return f"""
WITH e AS ({_E_NORMED_SQL}),
panel AS (SELECT vec_id AS eval_id, embedding AS p_emb, nrm AS p_nrm
          FROM e WHERE vec_id < {_SEM_PANEL}),
hits AS (
  SELECT c.vec_id, {cos} AS cos_micros
  FROM e c CROSS JOIN panel p
  WHERE c.vec_id >= {_SEM_PANEL}
)
SELECT vec_id,
       CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
       CAST(MAX(cos_micros) AS BIGINT) AS max_cos_micros
FROM hits WHERE cos_micros >= {_SEM_TAU}
GROUP BY vec_id
"""


@register(
    "q199_semantic_decontamination",
    oracle=_sem_decon_sql(),
    doc="Semantic decontamination: flag training vectors whose cosine to "
    f"ANY of the {_SEM_PANEL} held-out benchmark embeddings reaches the "
    "threshold — the embedding-space complement of q58's n-gram overlap "
    "screen (paraphrased eval leakage has zero shingle overlap but high "
    "cosine). The eval panel is FIXED-SIZE regardless of corpus scale, "
    "so the plan is one corpus scan against a broadcast panel "
    "(O(n x |panel| x d), embarrassingly parallel, no corpus self-join) "
    "— same bounded-broadcast exemption as the q60 query panel; swap in "
    "the LSH-bucketed probe (q63) when the eval suite grows past "
    "broadcast size. Threshold calibrated to the synthetic near-random "
    "embeddings; real deployments run ~0.9.",
)
def q199_semantic_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.similarity import (
        _cos_micros,
        _dot,
        with_norm,
    )

    e = with_norm(load(spark, sf_dir, "embeddings"))
    panel = e.filter(F.col("vec_id") < _SEM_PANEL).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("p_emb"),
        F.col("nrm").alias("p_nrm"),
    )
    hits = (
        e.filter(F.col("vec_id") >= _SEM_PANEL)
        .crossJoin(F.broadcast(panel))
        .select(
            "vec_id",
            _cos_micros(
                _dot(F.col("p_emb"), F.col("embedding")),
                F.col("p_nrm"),
                F.col("nrm"),
            ).alias("cos_micros"),
        )
        .filter(F.col("cos_micros") >= _SEM_TAU)
    )
    return hits.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
        F.max("cos_micros").cast("long").alias("max_cos_micros"),
    )


# --- round 12: independent gate attribution ------------------------------

# Imported, not redeclared: the one source of truth shared with
# drop_repetitive's defaults (plans/curation_pipeline.py) lives in
# operators/text.py next to repetition_signals, so a future threshold
# change cannot desynchronize this audit from the funnel it measures.
from etl_pipeline_candy_store_spark.operators.text import (  # noqa: E402
    REP_DUP_TRIGRAM_MAX_MICROS as _REP_DUP_TRIGRAM_MAX,
    REP_TOP_BIGRAM_MAX_MICROS as _REP_TOP_BIGRAM_MAX,
)

_Q233_FLAGS_SQL = f"""
fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
keep AS (SELECT fp, MIN(doc_id) AS keeper FROM fp GROUP BY fp),
fe AS (
  SELECT f.doc_id,
         CASE WHEN f.doc_id <> k.keeper THEN 1 ELSE 0 END AS fe
  FROM fp f JOIN keep k ON f.fp = k.fp
),
qm AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> lower(t) IN ({_STOPWORDS}))) AS BIGINT)
           AS n_stop,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
           AS n_alpha,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
),
fq AS (
  SELECT doc_id,
         CASE WHEN n_tokens BETWEEN 10 AND 1000
               AND n_alpha * 2 >= n_chars
               AND n_chars BETWEEN n_tokens * 2 AND n_tokens * 12
          THEN 0 ELSE 1 END AS fq
  FROM qm
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, 2 AS n,
         list_extract(t, CAST(u.i AS INTEGER)) || ' ' ||
         list_extract(t, CAST(u.i + 1 AS INTEGER)) AS gram
  FROM toks, unnest(range(1, len(t))) AS u(i)
  UNION ALL
  SELECT doc_id, 3 AS n,
         list_extract(t, CAST(u.i AS INTEGER)) || ' ' ||
         list_extract(t, CAST(u.i + 1 AS INTEGER)) || ' ' ||
         list_extract(t, CAST(u.i + 2 AS INTEGER)) AS gram
  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
),
gcounts AS (
  SELECT doc_id, n, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3
),
rep AS (
  SELECT doc_id,
         COALESCE((MAX(CASE WHEN n = 2 THEN c END) * 1000000)
           // NULLIF(SUM(CASE WHEN n = 2 THEN c END), 0), 0)
           AS top_bigram,
         COALESCE(((SUM(CASE WHEN n = 3 THEN c END)
                    - COUNT(CASE WHEN n = 3 THEN 1 END)) * 1000000)
           // NULLIF(SUM(CASE WHEN n = 3 THEN c END), 0), 0)
           AS dup_trigram
  FROM gcounts GROUP BY doc_id
),
fr AS (
  SELECT doc_id,
         CASE WHEN top_bigram > {_REP_TOP_BIGRAM_MAX}
               OR dup_trigram > {_REP_DUP_TRIGRAM_MAX}
          THEN 1 ELSE 0 END AS fr
  FROM rep
),
sh AS ({_SHINGLES_SQL}),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_MAX_DOC}),
contam AS (
  SELECT s.doc_id
  FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
  WHERE s.doc_id >= {_EVAL_MAX_DOC}
  GROUP BY s.doc_id
  HAVING COUNT(*) >= {_CONTAM_MIN_OVERLAP}
),
flags AS (
  SELECT d.doc_id, fe.fe, fq.fq,
         COALESCE(fr.fr, 0) AS fr,
         CASE WHEN d.doc_id < {_EVAL_MAX_DOC}
               OR c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS fc
  FROM documents d
  JOIN fe ON fe.doc_id = d.doc_id
  JOIN fq ON fq.doc_id = d.doc_id
  LEFT JOIN fr ON fr.doc_id = d.doc_id
  LEFT JOIN contam c ON c.doc_id = d.doc_id
),
tot AS (SELECT doc_id, fe, fq, fr, fc, fe + fq + fr + fc AS nf FROM flags)
"""


@register(
    "q233_gate_attribution",
    oracle=f"""
WITH {_Q233_FLAGS_SQL}
SELECT 'exact_dup' AS gate,
       CAST(SUM(fe) AS BIGINT) AS n_rejected,
       CAST(SUM(CASE WHEN fe = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique
FROM tot
UNION ALL
SELECT 'quality', CAST(SUM(fq) AS BIGINT),
       CAST(SUM(CASE WHEN fq = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM tot
UNION ALL
SELECT 'repetition', CAST(SUM(fr) AS BIGINT),
       CAST(SUM(CASE WHEN fr = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM tot
UNION ALL
SELECT 'contamination', CAST(SUM(fc) AS BIGINT),
       CAST(SUM(CASE WHEN fc = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM tot
UNION ALL
SELECT 'any', CAST(SUM(CASE WHEN nf >= 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(SUM(CASE WHEN nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM tot
""",
    doc="Independent gate attribution: evaluate every curation gate the "
    "q150-family funnel applies SEQUENTIALLY (exact-dup keeper loss, "
    "quality, repetition, contamination incl. the eval panel itself) "
    "on the FULL corpus instead, and report per gate how many docs it "
    "rejects and how many it ALONE rejects (n_unique = the docs saved "
    "if that gate were dropped — the number a data team reads before "
    "relaxing a threshold; the sequential funnel can't answer it "
    "because later stages never see earlier rejects). One 'any' row "
    "gives total loss and single-cause loss. Scale posture: each flag "
    "relation is the SAME linear plan as its catalog query (q50 digest "
    "agg, q59 row-local metrics, q122 gram aggs, q58 shingle "
    "semi-join), composed by doc_id equi-joins, then ONE aggregate "
    "collapsed to 5 rows — no new shuffle family, no pair space, and "
    "the whole report is gate-count-sized.",
)
def q233_gate_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.text import repetition_signals

    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    fe = fp.join(keep, "fp").select(
        "doc_id",
        F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0).alias("fe"),
    )
    fq = quality_gate(d).select(
        "doc_id", (1 - F.col("passed")).alias("fq")
    )
    fr = repetition_signals(d).select(
        "doc_id",
        F.when(
            (F.col("top_bigram_frac_micros") > _REP_TOP_BIGRAM_MAX)
            | (F.col("dup_trigram_frac_micros") > _REP_DUP_TRIGRAM_MAX),
            1,
        )
        .otherwise(0)
        .alias("fr"),
    )
    contam = q58_decontamination(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("hit")
    )
    flags = (
        d.select("doc_id")
        .join(fe, "doc_id")
        .join(fq, "doc_id")
        .join(fr, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "doc_id",
            "fe",
            "fq",
            F.coalesce(F.col("fr"), F.lit(0)).alias("fr"),
            F.when(
                (F.col("doc_id") < _EVAL_MAX_DOC) | F.col("hit").isNotNull(), 1
            )
            .otherwise(0)
            .alias("fc"),
        )
        .withColumn("nf", F.expr("fe + fq + fr + fc"))
    )
    row = flags.agg(
        F.sum("fe").cast("long").alias("re"),
        F.sum(F.expr("case when fe = 1 and nf = 1 then 1 else 0 end"))
        .cast("long")
        .alias("ue"),
        F.sum("fq").cast("long").alias("rq"),
        F.sum(F.expr("case when fq = 1 and nf = 1 then 1 else 0 end"))
        .cast("long")
        .alias("uq"),
        F.sum("fr").cast("long").alias("rr"),
        F.sum(F.expr("case when fr = 1 and nf = 1 then 1 else 0 end"))
        .cast("long")
        .alias("ur"),
        F.sum("fc").cast("long").alias("rc"),
        F.sum(F.expr("case when fc = 1 and nf = 1 then 1 else 0 end"))
        .cast("long")
        .alias("uc"),
        F.sum(F.expr("case when nf >= 1 then 1 else 0 end"))
        .cast("long")
        .alias("ra"),
        F.sum(F.expr("case when nf = 1 then 1 else 0 end"))
        .cast("long")
        .alias("ua"),
    )
    return row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("exact_dup").alias("gate"),
                    F.col("re").alias("n_rejected"),
                    F.col("ue").alias("n_unique"),
                ),
                F.struct(
                    F.lit("quality").alias("gate"),
                    F.col("rq").alias("n_rejected"),
                    F.col("uq").alias("n_unique"),
                ),
                F.struct(
                    F.lit("repetition").alias("gate"),
                    F.col("rr").alias("n_rejected"),
                    F.col("ur").alias("n_unique"),
                ),
                F.struct(
                    F.lit("contamination").alias("gate"),
                    F.col("rc").alias("n_rejected"),
                    F.col("uc").alias("n_unique"),
                ),
                F.struct(
                    F.lit("any").alias("gate"),
                    F.col("ra").alias("n_rejected"),
                    F.col("ua").alias("n_unique"),
                ),
            )
        ).alias("r")
    ).select("r.gate", "r.n_rejected", "r.n_unique")


@register(
    "q238_contamination_by_source",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_MAX_DOC}),
contam AS (
  SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
  FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
  WHERE s.doc_id >= {_EVAL_MAX_DOC}
  GROUP BY s.doc_id
  HAVING COUNT(*) >= {_CONTAM_MIN_OVERLAP}
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
       CAST(COALESCE(SUM(c.n_overlap), 0) AS BIGINT) AS total_overlap,
       CAST((COUNT(c.doc_id) * 1000000) // COUNT(*) AS BIGINT)
         AS contaminated_ppm
FROM documents d LEFT JOIN contam c ON c.doc_id = d.doc_id
WHERE d.doc_id >= {_EVAL_MAX_DOC}
GROUP BY d.source
""",
    doc="Benchmark-contamination attribution by SOURCE: which domains "
    "carry the eval-set overlap (docs flagged by q58's shingle screen, "
    "their total overlapping shingles, and the contaminated share in "
    "ppm per source) — the report that turns a corpus-wide "
    "decontamination count into an actionable crawl decision "
    "('this aggregator mirrors the benchmarks; drop the domain, not "
    "just the docs'). Scale posture: exactly q58's linear "
    "shingle-semi-join plan plus one left join back to the doc "
    "relation and a source-domain-sized aggregate — no new shuffle "
    "family.",
)
def q238_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    contam = q58_decontamination(spark, sf_dir)
    train = d.filter(F.col("doc_id") >= _EVAL_MAX_DOC).select(
        "doc_id", "source"
    )
    return (
        train.join(contam, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.col("n_overlap")).cast("long").alias("n_contaminated"),
            F.coalesce(F.sum("n_overlap"), F.lit(0))
            .cast("long")
            .alias("total_overlap"),
            F.expr(
                "cast((count(n_overlap) * 1000000) div count(1) as bigint)"
            ).alias("contaminated_ppm"),
        )
    )


@register(
    "q242_split_balance_audit",
    oracle=f"""
WITH s AS (
  SELECT source,
         CASE WHEN {_H256_SQL} < 230 THEN 'train'
              WHEN {_H256_SQL} < 243 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(CASE WHEN split = 'train' THEN 1 END) AS BIGINT) AS n_train,
         CAST(COUNT(CASE WHEN split = 'val' THEN 1 END) AS BIGINT) AS n_val,
         CAST(COUNT(CASE WHEN split = 'test' THEN 1 END) AS BIGINT) AS n_test
  FROM s GROUP BY source
),
tot AS (
  SELECT SUM(n_docs) AS n, SUM(n_train) AS gt, SUM(n_val) AS gv,
         SUM(n_test) AS gs
  FROM per
)
SELECT source, n_docs, n_train, n_val, n_test,
       CAST(
         ((n_train * n - n_docs * gt) * (n_train * n - n_docs * gt)
            * 1000000) // NULLIF(n * n_docs * gt, 0)
       + ((n_val * n - n_docs * gv) * (n_val * n - n_docs * gv)
            * 1000000) // NULLIF(n * n_docs * gv, 0)
       + ((n_test * n - n_docs * gs) * (n_test * n - n_docs * gs)
            * 1000000) // NULLIF(n * n_docs * gs, 0)
       AS BIGINT) AS chi2_micros
FROM per CROSS JOIN tot
""",
    doc="Split-balance audit: per-source chi-square (integer micros) of "
    "the q80 content-hash train/val/test assignment against the "
    "corpus-wide split shares — the pre-release check that the "
    "deterministic hash split didn't correlate with any source (a "
    "domain whose val share skews breaks per-domain eval "
    "comparability). Expected counts are cross-multiplied away "
    "(chi2 term = (o*N - n_s*g)^2 * 1e6 / (N*n_s*g)), so the whole "
    "statistic is integer division — cross-engine exact. All eight "
    "counts are staged DECIMAL(38,0) on the Spark side (the q202/"
    "q236 discipline) so the squared deviation term matches DuckDB's "
    "HUGEINT promotion instead of wrapping in 64-bit; exact while "
    "(o*N - n_s*g)^2 * 1e6 < 1e38, i.e. deviations to ~3e15 doc-"
    "counts — beyond any real corpus. "
    "Scale posture: one stateless split projection, one source-keyed "
    "combinable aggregate, a 4-cell broadcast total, a row-local "
    "formula — the q236 shape over the split dimension.",
)
def q242_split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    h = _h256()
    split = (
        F.when(h < 230, F.lit("train"))
        .when(h < 243, F.lit("val"))
        .otherwise("test")
    )
    per = (
        d.select("source", split.alias("split"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("split") == "train", 1))
            .cast("long")
            .alias("n_train"),
            F.count(F.when(F.col("split") == "val", 1))
            .cast("long")
            .alias("n_val"),
            F.count(F.when(F.col("split") == "test", 1))
            .cast("long")
            .alias("n_test"),
        )
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.sum("n_train").cast("long").alias("gt"),
        F.sum("n_val").cast("long").alias("gv"),
        F.sum("n_test").cast("long").alias("gs"),
    )
    term = (
        "((d_{c} * d_n - d_docs * d_{g}) * (d_{c} * d_n - d_docs * d_{g})"
        " * 1000000) div nullif(d_n * d_docs * d_{g}, 0)"
    )
    staged = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_train",
        "n_val",
        "n_test",
        F.col("n_docs").cast("decimal(38,0)").alias("d_docs"),
        F.col("n_train").cast("decimal(38,0)").alias("d_train"),
        F.col("n_val").cast("decimal(38,0)").alias("d_val"),
        F.col("n_test").cast("decimal(38,0)").alias("d_test"),
        F.col("n").cast("decimal(38,0)").alias("d_n"),
        F.col("gt").cast("decimal(38,0)").alias("d_gt"),
        F.col("gv").cast("decimal(38,0)").alias("d_gv"),
        F.col("gs").cast("decimal(38,0)").alias("d_gs"),
    )
    return staged.select(
        "source",
        "n_docs",
        "n_train",
        "n_val",
        "n_test",
        F.expr(
            "cast("
            + term.format(c="train", g="gt")
            + " + "
            + term.format(c="val", g="gv")
            + " + "
            + term.format(c="test", g="gs")
            + " as bigint)"
        ).alias("chi2_micros"),
    )
