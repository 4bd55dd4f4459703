"""Corpus-level curation metrics: cross-document duplicated-n-gram
fraction, boilerplate prefix clustering, deterministic epoch shuffle,
and the source-by-cluster mixture matrix. No counterpart in the
reference (its pipeline stops at BI outputs); these are the corpus
hygiene / training-order ops a pretraining pipeline runs between dedup
and shard export.

Scale notes:
- Duplicated-shingle fraction reuses the dedup module's shingle
  relation: one aggregate over shingles (map-side combinable) + one
  equi-join back on the shingle key + one per-doc aggregate. Linear in
  corpus shingle count; no pair space ever materializes.
- Prefix clustering groups on a tiny derived key (first k normalized
  tokens) — one shuffle on that key; the standard cheap pre-filter for
  boilerplate before the expensive near-dup passes.
- Epoch shuffle is RNG-free: shard and in-shard position derive from
  md5 of a seed + the doc key, so every run/retry/engine produces the
  identical training order. At cluster scale this is
  ``repartition(shard)`` + ``sortWithinPartitions(key)`` — embarrassingly
  parallel, one shuffle; the window form here is the same logical plan.
- Mixture matrix composes the IVF assignment (broadcast join, q62) with
  one join to documents and a count — the report a data-mixing step
  reads to rebalance sources per semantic cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import _SHINGLES_SQL, _shingles
from etl_pipeline_candy_store_spark.operators.similarity import q62_ivf_assign
from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, load, register

_STOPWORDS = ("the", "a")
_PREFIX_K = 3
_N_SHARDS = 8
_EPOCH_SEED = "ep0:"


@register(
    "q91_dup_shingle_fraction",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
freq AS (SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) FILTER (WHERE f.n_docs >= 2) AS BIGINT) AS n_dup_shingles
FROM sh JOIN freq f USING (shingle)
GROUP BY sh.doc_id
""",
    doc="Cross-document duplicated-n-gram profile (RefinedWeb-style): "
    "per doc, how many of its distinct 3-gram shingles occur in at "
    "least one OTHER document. Shingle-frequency aggregate + equi-join "
    "back on the shingle key + per-doc aggregate — linear, no pair "
    "space. Integer counts only; consumers threshold the ratio.",
)
def q91_dup_shingle_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared exchange for the freq build + probe branches (r15 — see
    # jaccard_pairs): one shingle explode, one shuffle, both consumers
    # already clustered by the join key
    sh = _shingles(load(spark, sf_dir, "documents")).hint("rebalance", "shingle")
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("n_docs") >= 2, 1)).alias("n_dup_shingles"),
        )
    )


_NORM_TOKS_SPARK = (
    f"filter(split(text, ' '), t -> t NOT IN {str(tuple(_STOPWORDS))})"
)
_NORM_TOKS_SQL = (
    f"list_filter(string_split(text, ' '), t -> t NOT IN {str(tuple(_STOPWORDS))})"
)


@register(
    "q92_prefix_cluster",
    oracle=f"""
WITH p AS (
  SELECT doc_id,
         array_to_string(({_NORM_TOKS_SQL})[1:{_PREFIX_K}], ' ') AS prefix
  FROM documents
)
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM p GROUP BY prefix HAVING COUNT(*) >= 2
""",
    doc="Boilerplate prefix clustering: group documents by their first "
    "3 stopword-stripped tokens and report multi-doc groups with a "
    "deterministic keeper. One shuffle on a tiny derived key — the "
    "cheap pre-filter that catches templated/boilerplate openings "
    "before the quadratic-ish near-dup passes run.",
)
def q92_prefix_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(F.expr(_NORM_TOKS_SPARK), 1, _PREFIX_K), " "
    ).alias("prefix")
    return (
        d.select("doc_id", prefix)
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# Portable md5-of-string: Spark's md5 takes binary (utf8 bytes of the
# string); DuckDB's takes varchar — identical digests for ASCII input.
_SHUF_KEY_SQL = f"md5('{_EPOCH_SEED}' || CAST(doc_id AS VARCHAR))"
_SHARD_SQL = f"(instr('0123456789abcdef', substr({_SHUF_KEY_SQL}, 1, 1)) - 1) % {_N_SHARDS}"


@register(
    "q93_epoch_shuffle",
    oracle=f"""
SELECT doc_id,
       CAST({_SHARD_SQL} AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {_SHARD_SQL}
                               ORDER BY {_SHUF_KEY_SQL}) AS BIGINT) AS pos
FROM documents
""",
    doc="Deterministic epoch shuffle: shard and in-shard position derive "
    "from md5(seed || doc_id) — no RNG state, so every run, retry, and "
    "engine produces the identical training order, and epoch N+1 is just "
    "a different seed. At cluster scale: repartition(shard) + "
    "sortWithinPartitions(key) — one shuffle, no global sort.",
)
def q93_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit(_EPOCH_SEED), F.col("doc_id").cast("string")).cast("binary")
    )
    keyed = d.select(
        "doc_id",
        key.alias("_k"),
        ((F.instr(F.lit("0123456789abcdef"), F.substring(key, 1, 1)) - 1)
         % _N_SHARDS).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_k")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


@register(
    "q94_cluster_source_mix",
    oracle=f"""
WITH assign AS ({REGISTRY["q62_ivf_assign"].oracle})
SELECT d.source, a.centroid_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assign a JOIN documents d ON d.doc_id = a.vec_id
GROUP BY d.source, a.centroid_id
""",
    doc="Source-by-semantic-cluster mixture matrix: IVF-assign every "
    "embedding to its centroid (broadcast join, q62), join back to the "
    "document's source, and count the cells. The report a data-mixing "
    "step reads to rebalance sources within each semantic cluster "
    "(q81 rebalances on source alone).",
)
def q94_cluster_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = q62_ivf_assign(spark, sf_dir).select("vec_id", "centroid_id")
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        assign.join(d, assign["vec_id"] == d["doc_id"])
        .groupBy("source", "centroid_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_DECILE_BINS = 256


@register(
    "q99_length_deciles",
    oracle=f"""
WITH stats AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx, COUNT(*) AS n
               FROM documents),
binned AS (
  SELECT doc_id, ((n_chars - mn) * {_DECILE_BINS}) // (mx - mn + 1) AS bin
  FROM documents, stats
),
hist AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
cum AS (
  SELECT bin, SUM(cnt) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
edges AS (
  SELECT d.d, MIN(bin) AS edge
  FROM cum CROSS JOIN stats, unnest(range(1, 10)) AS d(d)
  WHERE cum * 10 >= d.d * n
  GROUP BY d.d
),
earr AS (SELECT list(edge ORDER BY edge) AS arr FROM edges)
SELECT b.doc_id, CAST(b.bin AS BIGINT) AS bin,
       CAST(len(list_filter(earr.arr, e -> e <= b.bin)) AS INTEGER) AS decile
FROM binned b CROSS JOIN earr
""",
    doc="Curriculum length-decile assignment WITHOUT a global sort: a "
    f"fixed {_DECILE_BINS}-bin histogram of n_chars (map-side "
    "combinable, mergeable) yields cumulative decile edges (9 small "
    "integers, broadcast); each doc's decile is a pure projection "
    "against the edge array. ntile(10) gives the exact answer with a "
    "full sort of the corpus — this plan touches the corpus twice with "
    "ZERO wide sorts, the only viable shape at 100 TB. Bin-granular "
    "(ties within a bin share a decile), deterministic, "
    "integer-exact.",
)
def q99_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    stats = d.groupBy().agg(
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = d.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.expr(f"((n_chars - mn) * {_DECILE_BINS}) div (mx - mn + 1)").alias("bin"),
        "n",
    )
    hist = binned.groupBy("bin", "n").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", "n", F.sum("cnt").over(w).alias("cum"))
    # 9 decile edges from the <=256-row cumulative histogram
    edges = (
        cum.select(
            "bin",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d"),
            "cum",
            "n",
        )
        .filter(F.col("cum") * 10 >= F.col("d") * F.col("n"))
        .groupBy("d")
        .agg(F.min("bin").alias("edge"))
    )
    earr = edges.groupBy().agg(F.sort_array(F.collect_list("edge")).alias("arr"))
    return (
        binned.crossJoin(F.broadcast(earr))
        .select(
            "doc_id",
            F.col("bin").cast("long").alias("bin"),
            F.expr("size(filter(arr, e -> e <= bin))").cast("int").alias("decile"),
        )
    )


_STRIDE_SCALE = 3000  # virtual-time units; divisible by every weight below


@register(
    "q100_weighted_interleave",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('{_EPOCH_SEED}' || CAST(doc_id AS VARCHAR)))
           AS pos_in_source,
         CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0 THEN 3 ELSE 1 END
           AS weight
  FROM documents
)
SELECT doc_id, source, CAST(pos_in_source AS BIGINT) AS pos_in_source,
       CAST(pos_in_source * ({_STRIDE_SCALE} / weight) AS BIGINT) AS virtual_time
FROM pos
""",
    doc="Deterministic weighted source interleaving (stride scheduling): "
    "docs get an RNG-free within-source order (md5-keyed, as q93), and "
    "a virtual_time = position x (scale/weight); reading in "
    "(virtual_time, source, pos) order emits sources proportionally to "
    "weight (even-numbered sources 3x) with no coordinator and no "
    "global shuffle — sorting stays within shards exactly as q93. The "
    "op a mixing-aware training loader uses to draw from N corpora at "
    "target rates deterministically.",
)
def q100_weighted_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit(_EPOCH_SEED), F.col("doc_id").cast("string")).cast("binary")
    )
    weight = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(3)
    ).otherwise(F.lit(1))
    w = Window.partitionBy("source").orderBy("_k")
    return (
        d.select("doc_id", "source", key.alias("_k"), weight.alias("weight"))
        .select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("pos_in_source"),
            "weight",
        )
        .select(
            "doc_id",
            "source",
            "pos_in_source",
            (F.col("pos_in_source") * (_STRIDE_SCALE / F.col("weight")))
            .cast("long")
            .alias("virtual_time"),
        )
    )


@register(
    "q102_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 7 <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS fp
  FROM documents WHERE doc_id % 11 <> 0
)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.fp <> n.fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
""",
    doc="Corpus snapshot diff — the data-versioning primitive between "
    "two crawls/exports: FULL OUTER join on the doc key, content "
    "digests compared for survivors; emits added/removed/changed/"
    "unchanged per doc. One shuffle on the key (or zero with both "
    "snapshots bucketed by doc_id); digests mean the wide text column "
    "never travels through the join. The two snapshots here are "
    "deterministic derivations of the documents table (old drops "
    "doc_id%7==0, new drops %11==0 and rewrites %13==0) so the oracle "
    "is self-contained.",
)
def q102_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    new_text = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    new = d.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", F.md5(new_text.cast("binary")).alias("fp")
    )
    o = old.select(F.col("doc_id").alias("o_id"), F.col("fp").alias("o_fp"))
    n = new.select(F.col("doc_id").alias("n_id"), F.col("fp").alias("n_fp"))
    joined = o.join(n, o["o_id"] == n["n_id"], "full_outer")
    status = (
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(F.col("o_fp") != F.col("n_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias("doc_id"),
        status.alias("status"),
    )


@register(
    "q141_token_budget_mix",
    oracle="""
WITH lens AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
c AS (
  SELECT doc_id, source, n_toks,
         SUM(n_toks) OVER (PARTITION BY source
             ORDER BY n_toks DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lens
)
SELECT doc_id, source, n_toks, CAST(cum AS BIGINT) AS cum_toks
FROM c WHERE cum <= 800
""",
    doc="Per-source token-budget selection (training-mixture "
    "construction): within each source, take documents in priority "
    "order (longest first, doc_id tiebreak) while the source's "
    "cumulative token count stays within the 800-token budget — the "
    "'N tokens per domain' step every mixture spec (The Pile, "
    "RedPajama-style weighting) compiles down to. The cumulative sum "
    "runs as a TWO-LEVEL prefix sum (q119 discipline): an in-bucket "
    "window partitioned by (source, length-range bucket) plus a "
    "per-source window over bucket totals only — so a source holding "
    "half the corpus never serializes through one task. Bucketing by "
    "-n_toks div 64 is monotone along the (n_toks DESC, doc_id) sort, "
    "making the two-level sum exactly the oracle's single window.",
)
def q141_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    lens = lens.withColumn("bkt", F.expr("(-n_toks) div 64"))
    w_local = (
        Window.partitionBy("source", "bkt")
        .orderBy(F.col("n_toks").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = lens.withColumn("loc", F.sum("n_toks").over(w_local))
    btot = lens.groupBy("source", "bkt").agg(F.sum("n_toks").alias("bn"))
    w_bkt = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = btot.select(
        "source", "bkt", F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("boff")
    )
    return (
        local.join(boff, ["source", "bkt"])
        .select(
            "doc_id",
            "source",
            "n_toks",
            (F.col("boff") + F.col("loc")).cast("long").alias("cum_toks"),
        )
        .where(F.col("cum_toks") <= 800)
    )


_CLUSTER_HASH_SQL = (
    "(instr('0123456789abcdef',"
    " substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef',"
    " substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1)"
)


@register(
    "q144_leakage_safe_split",
    oracle=None,  # composed below from dedup's _CLUSTERS_SQL
    doc="Leakage-safe train/val/test split: the ~90/5/5 hash assignment "
    "(q80's portable md5-nibble construction) keyed on the q54 dup "
    "CLUSTER id instead of the document — every near-duplicate pair "
    "lands in the SAME split by construction, so no test document has "
    "a near-copy in train (the eval-contamination mode a doc-level "
    "split cannot prevent; see q51/q54). Stateless expression on top "
    "of cluster labels: no RNG, no coordination, retry-identical; "
    "cost is a row-local hash over the session's checkpointed cluster "
    "labels (star contraction; q54-identical contract).",
)
def q144_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.dedup import (
        dedup_clusters_checkpointed,
    )

    c = dedup_clusters_checkpointed(spark, sf_dir)
    md5 = F.md5(F.col("cluster_id").cast("string").cast("binary"))
    nib = lambda i: F.instr(  # noqa: E731
        F.lit("0123456789abcdef"), F.substring(md5, i, 1)
    ) - 1
    h = nib(1) * 16 + nib(2)
    return c.select(
        "doc_id",
        "cluster_id",
        F.when(h < 230, F.lit("train"))
        .when(h < 243, F.lit("val"))
        .otherwise("test")
        .alias("split"),
    )


def _q144_oracle() -> str:
    from etl_pipeline_candy_store_spark.operators.dedup import _CLUSTERS_SQL

    return f"""
WITH clusters AS ({_CLUSTERS_SQL}),
a AS (SELECT doc_id, cluster_id, {_CLUSTER_HASH_SQL} AS h FROM clusters)
SELECT doc_id, cluster_id,
       CASE WHEN h < 230 THEN 'train'
            WHEN h < 243 THEN 'val'
            ELSE 'test' END AS split
FROM a
"""


import dataclasses as _dc_cc

REGISTRY["q144_leakage_safe_split"] = _dc_cc.replace(
    REGISTRY["q144_leakage_safe_split"], oracle=_q144_oracle()
)


@register(
    "q145_length_drift",
    oracle="""
WITH s AS (
  SELECT doc_id % 2 AS half,
         CAST(len(string_split(text, ' ')) AS BIGINT) // 8 AS bin
  FROM documents
),
b AS (
  SELECT bin,
         CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o1,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o2
  FROM s GROUP BY bin
),
t AS (SELECT SUM(o1) AS n1, SUM(o2) AS n2 FROM b)
SELECT b.bin, b.o1, b.o2,
       CAST(((b.o1 * t.n2 - b.o2 * t.n1) * (b.o1 * t.n2 - b.o2 * t.n1))
            // (t.n1 * t.n2) * 1000000 // (b.o1 + b.o2) AS BIGINT)
         AS chi2_contrib_micros
FROM b, t
""",
    doc="Distribution-drift monitor (two-sample chi-square over the "
    "doc-length histogram): splits the corpus into deterministic "
    "halves (doc_id parity — the stand-in for snapshot A vs snapshot "
    "B), bins token lengths, and emits each bin's contribution to the "
    "two-sample chi-square statistic in integer micros — the "
    "drift-alarm input a continuously-ingesting training pipeline "
    "watches to catch a crawler or upstream-format change. ONE scan, "
    "one combinable agg on the bin key, a 1-row broadcast of the half "
    "totals; all-integer algebraic form (o1*n2 - o2*n1)^2/(n1*n2*"
    "(o1+o2)) with the division staged to stay inside int64.",
)
def q145_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    s = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.expr("CAST(size(split(text, ' ')) AS BIGINT) div 8").alias("bin"),
    )
    b = s.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("o1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("o2"),
    )
    t = b.agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"))
    return b.join(F.broadcast(t)).select(
        "bin",
        "o1",
        "o2",
        F.expr(
            "CAST(((o1 * n2 - o2 * n1) * (o1 * n2 - o2 * n1))"
            " div (n1 * n2) * 1000000 div (o1 + o2) AS BIGINT)"
        ).alias("chi2_contrib_micros"),
    )


# --------------------------------------------------------------------------
# q200 — temperature-scaled source sampling weights (multilingual /
# multi-domain mixing a la mBERT's exponential smoothing): w_s ∝ m_s^α
# with α = 1/2. Complements q196 (largest-remainder apportionment of a
# head-count budget at α = 1) and q141 (hard token budgets): temperature
# reweighting is the knob that up-samples tail sources without a cap.
# --------------------------------------------------------------------------
_TEMP_ALPHA_DOC = "alpha=0.5 (sqrt)"  # IEEE sqrt is correctly rounded →
# bit-identical across engines; the ONLY cross-source float reduction
# (the normalizer) runs as an ORDERED fold over sources sorted by name,
# so both engines accumulate in the identical order.


@register(
    "q200_temperature_mixture",
    oracle="""
WITH m AS (
  SELECT source,
         SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT SUM(n_tokens) AS m_total,
         list_reduce(list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY source),
                     (a, b) -> a + b) AS s_total
  FROM m
)
SELECT m.source, CAST(m.n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(sqrt(CAST(m.n_tokens AS DOUBLE)) / t.s_total
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS weight_ppm,
       CAST(m.n_tokens * 1000000 // t.m_total AS BIGINT) AS natural_ppm,
       CAST(floor(sqrt(CAST(m.n_tokens AS DOUBLE))
                  / t.s_total
                  * CAST(1000000 AS DOUBLE)
                  * CAST(t.m_total AS DOUBLE)
                  / CAST(m.n_tokens AS DOUBLE)) AS BIGINT) AS boost_ppm
FROM m CROSS JOIN tot t
""",
    doc="Temperature-scaled mixture weights: per-source sampling weight "
    "proportional to token_mass^0.5 — the exponent-smoothed mixing rule "
    "(mBERT/XLM-R lineage) that up-samples tail domains relative to "
    "their natural share. Emits weight_ppm (the sampling rate), "
    "natural_ppm (integer-exact proportional share), and boost_ppm "
    "(weight/natural — the up/down-sampling factor a mixture report "
    "surfaces). Hash-exactness: sqrt is IEEE-correctly-rounded in both "
    "engines and the single cross-source float sum (the normalizer) is "
    "an ordered fold over sources sorted by name, so accumulation order "
    "is pinned. Plan: one map-side-combinable corpus agg to 20 source "
    "rows; everything after runs on the tiny relation (broadcast).",
)
def q200_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_weights(load(spark, sf_dir, "documents"))


def temperature_weights(d: DataFrame) -> DataFrame:
    """q200's weight computation over any (source, text) frame — the
    reusable stage the curation pipeline runs on its final survivor set
    to emit the epoch's sampling weights."""
    m = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens")
    )
    # totals via a window over the source-count-sized relation (the
    # documented tiny-relation exemption) — ONE corpus scan, where an
    # agg-of-agg would re-scan the corpus to rebuild m. collect_list
    # over a window has no order guarantee, so the ordered fold sorts
    # the collected (source, sq) structs first — accumulation order is
    # pinned to source ASC in both engines.
    wfull = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    m = m.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(wfull).alias("m_total"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "source",
                            F.sqrt(F.col("n_tokens").cast("double")).alias("sq"),
                        )
                    ).over(wfull)
                ),
                lambda s: s.getField("sq"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s_total"),
    )
    sq = F.sqrt(F.col("n_tokens").cast("double"))
    return m.select(
        "source",
        "n_tokens",
        F.floor(sq / F.col("s_total") * F.lit(1000000.0))
        .cast("long")
        .alias("weight_ppm"),
        F.expr("n_tokens * 1000000 div m_total").cast("long").alias("natural_ppm"),
        F.floor(
            sq
            / F.col("s_total")
            * F.lit(1000000.0)
            * F.col("m_total").cast("double")
            / F.col("n_tokens").cast("double")
        )
        .cast("long")
        .alias("boost_ppm"),
    )


# --------------------------------------------------------------------------
# q202 — DSIR-style importance weights for target-domain data selection
# (Xie et al., "Data Selection for Language Models via Importance
# Resampling", NeurIPS 2023): score every candidate document by how much
# more likely its tokens are under the TARGET domain's unigram
# distribution than under the general corpus's. The selection knob that
# turns a small high-quality sample into a filter over a 100 TB crawl.
# --------------------------------------------------------------------------
_DSIR_TARGET_MAX_DOC = 50  # doc_id < 50 plays the target-domain sample

#: log2-binned per-token log-likelihood-ratio: bin = clamp(floor(log2 r))
#: for r = P_target(tok)/P_source(tok) (add-one smoothed), computed by
#: integer CROSS-MULTIPLICATION only — a float log could drift an ulp
#: across engines. a = (c_t+1)(N_s+V), b = (c_s+1)(N_t+V); r = a/b.
_DSIR_BIN_SQL = """CASE
  WHEN a >= 16 * b THEN 4  WHEN a >= 8 * b THEN 3
  WHEN a >= 4 * b THEN 2   WHEN a >= 2 * b THEN 1
  WHEN a >= b THEN 0       WHEN 2 * a >= b THEN -1
  WHEN 4 * a >= b THEN -2  WHEN 8 * a >= b THEN -3
  WHEN 16 * a >= b THEN -4 ELSE -5 END"""


@register(
    "q202_importance_weights",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
v AS (
  SELECT tok,
         CAST(SUM(CASE WHEN doc_id < {_DSIR_TARGET_MAX_DOC} THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         CAST(SUM(CASE WHEN doc_id >= {_DSIR_TARGET_MAX_DOC} THEN 1 ELSE 0 END) AS BIGINT) AS c_s
  FROM toks GROUP BY tok
),
tot AS (
  SELECT CAST(SUM(c_t) AS BIGINT) AS n_t, CAST(SUM(c_s) AS BIGINT) AS n_s,
         CAST(COUNT(*) AS BIGINT) AS vsz
  FROM v
),
bins AS (
  SELECT tok, {_DSIR_BIN_SQL} AS bin
  FROM (SELECT tok, CAST(c_t + 1 AS HUGEINT) * (n_s + vsz) AS a,
               CAST(c_s + 1 AS HUGEINT) * (n_t + vsz) AS b
        FROM v CROSS JOIN tot)
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_toks,
       CAST(SUM(bins.bin) AS BIGINT) AS log2_weight
FROM toks t JOIN bins USING (tok)
WHERE t.doc_id >= {_DSIR_TARGET_MAX_DOC}
GROUP BY t.doc_id
""",
    doc="DSIR-style importance weighting: per-document sum of log2-"
    "binned unigram likelihood ratios P_target/P_source (add-one "
    "smoothed over the joint vocabulary), scored for every candidate "
    f"doc against the doc_id < {_DSIR_TARGET_MAX_DOC} target-domain "
    "sample — the importance-resampling selector (DSIR, Xie et al. "
    "2023) that filters a crawl toward a target domain. The log-ratio "
    "is log2-GRANULAR by design: bins come from integer cross-"
    "multiplications only (a float ln could drift an ulp across "
    "engines; exact DSIR math drops in via a log-table broadcast "
    "without changing the plan). Plan: one corpus explode -> vocab-"
    "keyed agg (map-side combinable), totals broadcast back, per-token "
    "bins are a projection over the vocab relation, and the doc score "
    "is ONE token-keyed equi-join + doc-keyed agg — the tf-idf/BM25 "
    "shape, linear in corpus tokens, no windows. Emits WEIGHTS, not a "
    "binary cut: resampling consumes weights, and floor-binning biases "
    "the zero point, so consumers threshold (q91 discipline). Overflow "
    "envelope: a=(c_t+1)*(n_s+vsz) is a product of two token-count-"
    "scale terms, so for a stop-word (c_t ~ N) it reaches N^2 — int64 "
    "would wrap silently in Spark (non-ANSI) near N ~ 3e9 corpus "
    "tokens (the 16*b band comparison ~4x sooner, ~7e8) while DuckDB "
    "errors. a/b and the band comparisons are therefore staged in "
    "DECIMAL(38,0)/HUGEINT — good to ~1e19 tokens, plan unchanged; a "
    "constructed high-count fixture test proves the BIGINT staging "
    "miscounts where the decimal staging doesn't.",
)
def q202_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tgt = F.col("doc_id") < _DSIR_TARGET_MAX_DOC
    return score_importance(
        toks.filter(~tgt), importance_bins(toks, tgt)
    )


def importance_bins(toks: DataFrame, is_target) -> DataFrame:
    """The (tok, bin) importance table from a calibration token
    relation: log2-binned smoothed likelihood ratio per token. Frozen
    at calibration time — the ingest twin broadcasts it against
    arriving batches exactly as CCNet freezes its scoring LM."""
    v = toks.groupBy("tok").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("c_t"),
        F.sum(F.when(~is_target, 1).otherwise(0)).cast("long").alias("c_s"),
    )
    return importance_bins_from_counts(v)


def importance_bins_from_counts(
    v: DataFrame, stage_type: str = "decimal(38,0)"
) -> DataFrame:
    """(tok, bin) from a (tok, c_t, c_s) count relation.

    DECIMAL(38,0)/HUGEINT staging by default: a,b are products of two
    token-count-scale terms (N^2 for a stop-word), so BIGINT wraps
    silently near N ~ 3e9 corpus tokens (the 16*b band comparison trips
    ~4x sooner); decimals carry the ladder to ~1e19 tokens with the
    plan unchanged. ``stage_type`` exists so the overflow test can pin
    the broken "long" staging and prove it miscounts."""
    tot = v.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_s").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("vsz"),
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            (
                (F.col("c_t") + 1).cast(stage_type)
                * (F.col("n_s") + F.col("vsz"))
            ).alias("a"),
            (
                (F.col("c_s") + 1).cast(stage_type)
                * (F.col("n_t") + F.col("vsz"))
            ).alias("b"),
        )
        .select("tok", F.expr(_DSIR_BIN_SQL).alias("bin"))
    )


def score_importance(doc_toks: DataFrame, bins: DataFrame) -> DataFrame:
    """Per-doc importance weight: sum of per-token bins over ONE
    token-keyed equi-join. Tokens outside the calibration vocabulary
    drop out of the join (contribute 0 — the neutral bin)."""
    return (
        doc_toks.join(bins, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("bin").cast("long").alias("log2_weight"),
        )
    )


# --- round 12: per-source selection + datasheet rollups ------------------


@register(
    "q222_quality_quantile_gate",
    oracle="""
WITH scored AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS score
  FROM documents
),
ranked AS (
  SELECT doc_id, source, score,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY score, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
),
thr AS (
  SELECT source, score AS thr
  FROM ranked
  WHERE rn = GREATEST(1, CAST(CEIL(0.25 * n) AS BIGINT))
)
SELECT s.doc_id, s.source, CAST(s.score AS BIGINT) AS score
FROM scored s JOIN thr t ON s.source = t.source
WHERE s.score >= t.thr
""",
    doc="Per-source quantile gating: drop each source's bottom quartile "
    "by token count (the rejection-sampling shape behind 'keep the top "
    "p% of each domain by classifier score' — token count stands in "
    "for the score so the gate is deterministic and oracle-exact). The "
    "threshold is the DISCRETE quantile — the score at row_number = "
    "ceil(0.25 n) under a total (score, doc_id) order — so both "
    "engines cut at the identical element with no float interpolation "
    "drift. Scale posture: one window partitioned BY SOURCE (parallel "
    "across domains, never a global sort), a 20-row threshold table "
    "broadcast back, one stateless filter pass. For sources too big "
    "for a per-partition sort, swap the window for q99's histogram-"
    "edge method — same gate, zero sorts.",
)
def q222_quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("score")
    )
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    ranked = scored.select(
        "source",
        "score",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    thr = ranked.filter(
        F.col("rn")
        == F.greatest(F.lit(1), F.ceil(F.lit(0.25) * F.col("n")).cast("long"))
    ).select("source", F.col("score").alias("thr"))
    return (
        scored.join(F.broadcast(thr), "source")
        .filter(F.col("score") >= F.col("thr"))
        .select("doc_id", "source", F.col("score").cast("long").alias("score"))
    )


@register(
    "q223_source_caps",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 10
""",
    doc="Hard per-source frequency cap: keep at most 10 docs per source, "
    "preferring longer documents (n_chars standing in for a quality "
    "score), deterministic tiebreak on doc_id — the domain-cap gate "
    "every crawl pipeline runs so no single domain floods the mixture "
    "(q81 rebalances probabilistically toward target shares; this is "
    "the complementary hard ceiling). Scale posture: rank is "
    "partitioned BY SOURCE — Catalyst plans a per-source top-k "
    "(WindowGroupLimit pushes rk <= 10 below the sort), so per-source "
    "work is a bounded heap, never a global sort; skewed mega-domains "
    "are exactly the rows the cap discards.",
)
def q223_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


def _register_dataset_card() -> None:
    # late import: curation.py imports this module's neighbors; pulling
    # _H256_SQL at module import would be a cycle risk, and the SQL text
    # is only needed to build the oracle string once
    from etl_pipeline_candy_store_spark.operators.curation import (
        _H256_SQL,
        _h256,
    )

    @register(
        "q224_dataset_card",
        oracle=f"""
WITH s AS (
  SELECT CASE WHEN {_H256_SQL} < 230 THEN 'train'
              WHEN {_H256_SQL} < 243 THEN 'val'
              ELSE 'test' END AS split,
         source, lang, n_chars,
         len(string_split(text, ' ')) AS toks
  FROM documents
),
t AS (SELECT COUNT(*) AS n_tot FROM documents)
SELECT split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(1000000 * COUNT(*) // n_tot AS BIGINT) AS share_ppm
FROM s CROSS JOIN t
GROUP BY split, source, n_tot
""",
        doc="Dataset card / datasheet rollup: per (split, source) doc "
        "and token counts, character volume, language coverage, and "
        "integer-ppm corpus share — the release-documentation table a "
        "training-data drop ships with (one row per cell of the "
        "mixture, derived from the SAME content-hash split rule as the "
        "export, q80). Scale posture: one corpus scan into a "
        "combinable aggregate; the grand total is a 1-row broadcast; "
        "distinct-lang is bounded by the lang vocabulary. Integer "
        "division keeps both engines bit-identical.",
    )
    def q224_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load(spark, sf_dir, "documents")
        h = _h256()
        s = d.select(
            F.when(h < 230, F.lit("train"))
            .when(h < 243, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
            "source",
            "lang",
            "n_chars",
            F.size(F.split("text", " ")).alias("toks"),
        )
        t = d.groupBy().agg(F.count(F.lit(1)).alias("n_tot"))
        return (
            s.crossJoin(F.broadcast(t))
            .groupBy("split", "source", "n_tot")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("toks").cast("long").alias("n_tokens"),
                F.sum("n_chars").cast("long").alias("total_chars"),
                F.countDistinct("lang").cast("long").alias("n_langs"),
            )
            .select(
                "split",
                "source",
                "n_docs",
                "n_tokens",
                "total_chars",
                "n_langs",
                F.expr("1000000 * n_docs div n_tot")
                .cast("long")
                .alias("share_ppm"),
            )
        )


_register_dataset_card()


@register(
    "q225_shingle_diversity",
    oracle=f"""
WITH sh AS ({_SHINGLES_SQL}),
per_src AS (
  SELECT d.source, sh.shingle
  FROM sh JOIN documents d USING (doc_id)
)
SELECT source,
       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(1000000 * COUNT(DISTINCT shingle) // COUNT(*) AS BIGINT)
         AS diversity_ppm
FROM per_src GROUP BY source
""",
    doc="Per-source shingle diversity: distinct 3-gram shingles over "
    "total shingle instances (integer ppm) — the corpus-health dial "
    "that catches template farms and generation loops at the SOURCE "
    "level before any pairwise dedup runs (a source whose diversity "
    "collapses is where q51/q52 will find their duplicate mass). "
    "Scale posture: one shingle pass, then a per-source distinct "
    "aggregate keyed on (source, shingle) — shuffle carries the "
    "shingle exactly once; at 100 TB swap COUNT(DISTINCT) for the "
    "mergeable HLL sketch (q37's registers) and keep the same report "
    "shape.",
)
def q225_shingle_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = _shingles(d.select("doc_id", "text"))
    per_src = sh.join(d.select("doc_id", "source"), "doc_id")
    return (
        per_src.groupBy("source")
        .agg(
            F.countDistinct("shingle").cast("long").alias("n_distinct"),
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
        .select(
            "source",
            "n_distinct",
            "n_total",
            F.expr("1000000 * n_distinct div n_total")
            .cast("long")
            .alias("diversity_ppm"),
        )
    )


# --- round 12 (second batch): frequency scrub, sampling, drift, gates ----

_SEG_LEN = 8  # tokens per non-overlapping segment (pseudo-line unit)
_BOILER_DF = 3  # segment doc-frequency at/above which it is boilerplate

_SEGMENTS_SQL = f"""
  SELECT doc_id, pos // {_SEG_LEN} AS seg,
         string_agg(tok, ' ' ORDER BY pos) AS seg_text,
         CAST(COUNT(*) AS BIGINT) AS seg_len
  FROM (
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                AS BIGINT) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
  ) GROUP BY doc_id, pos // {_SEG_LEN}
"""


def _segments(d: DataFrame) -> DataFrame:
    """Non-overlapping `_SEG_LEN`-token segments per doc.

    The corpus has no newline structure (synthetic token streams), so a
    fixed token window stands in for the line/sentence unit a CCNet-style
    boilerplate scrub operates on; with real text, swap `seg` for the
    line index and nothing else changes.
    """
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    return (
        toks.withColumn("seg", F.expr(f"pos div {_SEG_LEN}"))
        .groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("seg_text"),
            F.count(F.lit(1)).cast("long").alias("seg_len"),
        )
    )


@register(
    "q229_boilerplate_segments",
    oracle=f"""
WITH segs AS ({_SEGMENTS_SQL}),
df AS (
  SELECT seg_text, COUNT(DISTINCT doc_id) AS df
  FROM segs GROUP BY seg_text
),
boiler AS (SELECT seg_text FROM df WHERE df >= {_BOILER_DF})
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(COUNT(CASE WHEN b.seg_text IS NOT NULL THEN 1 END) AS BIGINT)
         AS boiler_segments,
       CAST(SUM(CASE WHEN b.seg_text IS NULL THEN s.seg_len ELSE 0 END)
            AS BIGINT) AS kept_tokens
FROM segs s LEFT JOIN boiler b ON s.seg_text = b.seg_text
GROUP BY s.doc_id
""",
    doc="Frequency-based boilerplate scrub (the CCNet line-dedup shape): "
    f"split every doc into non-overlapping {_SEG_LEN}-token segments, "
    f"count each segment's DOCUMENT frequency corpus-wide, and mark "
    f"segments appearing in >= {_BOILER_DF} distinct docs as "
    "boilerplate (nav bars, license footers, template headers). "
    "Reports per doc: total segments, boilerplate segments, tokens "
    "retained after the scrub. Complementary to q203's pairwise span "
    "scrub — this one needs NO pair space at all: one explode pass, "
    "one aggregate keyed on the segment hash (map-side combinable), "
    "one equi-join back, one per-doc aggregate. Everything is keyed "
    "on segment content, so the only shuffle carries each segment "
    "once; at 100 TB the segment key becomes unhex(md5(seg_text)) "
    "(16 B, the q216 discipline) and the doc-frequency relation "
    "prunes to df >= 2 before the threshold filter.",
)
def q229_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    segs = _segments(d.select("doc_id", "text"))
    df = segs.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = df.filter(F.col("df") >= _BOILER_DF).select(
        "seg_text", F.lit(True).alias("is_boiler")
    )
    return (
        segs.join(F.broadcast(boiler), "seg_text", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.count(F.col("is_boiler")).cast("long").alias("boiler_segments"),
            F.sum(
                F.when(F.col("is_boiler").isNull(), F.col("seg_len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("kept_tokens"),
        )
    )


_SYS_SAMPLES = 40  # systematic-sample target count


@register(
    "q230_systematic_weighted_sample",
    oracle=f"""
WITH w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
  FROM documents
),
c AS (
  SELECT doc_id, wt,
         SUM(wt) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM w
),
t AS (SELECT SUM(wt) // {_SYS_SAMPLES} AS step FROM w)
SELECT doc_id, wt,
       CAST(cum // t.step - (cum - wt) // t.step AS BIGINT) AS picks
FROM c CROSS JOIN t
WHERE cum // t.step > (cum - wt) // t.step
""",
    doc="Systematic weighted sampling: lay the docs end-to-end on the "
    "token axis in canonical doc_id order and take one sample every "
    f"total/{_SYS_SAMPLES} tokens — each doc is selected with "
    "probability proportional to its token weight (long docs can be "
    "picked more than once; `picks` is the multiplicity), with ZERO "
    "randomness: every engine/run/retry selects the identical docs. "
    "This is the deterministic stand-in for weighted reservoir "
    "sampling a training-mixture builder uses to draw an "
    "inspection/eval slice proportional to token mass. Integer-exact "
    "(cumulative sums and integer division only). Scale posture: the "
    "running sum is over the doc-count-sized weight relation, not the "
    "corpus; at 10^10 docs swap the single window for q119's "
    "two-level prefix sum (bucket subtotals + in-bucket window) — "
    "same selection, no global window.",
)
def q230_systematic_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("wt")
    )
    cum = w.select(
        "doc_id",
        "wt",
        F.sum("wt")
        .over(Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    step = w.agg(
        F.expr(f"sum(wt) div {_SYS_SAMPLES}").cast("long").alias("step")
    )
    return (
        cum.crossJoin(F.broadcast(step))
        .filter(F.expr("cum div step > (cum - wt) div step"))
        .select(
            "doc_id",
            "wt",
            F.expr("cum div step - (cum - wt) div step")
            .cast("long")
            .alias("picks"),
        )
    )


@register(
    "q231_source_divergence",
    oracle="""
WITH toks AS (
  SELECT d.source, unnest(string_split(d.text, ' ')) AS tok
  FROM documents d
),
sc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY source, tok),
st AS (SELECT source, SUM(c) AS s FROM sc GROUP BY source),
tt AS (SELECT tok, SUM(c) AS ct FROM sc GROUP BY tok),
tot AS (SELECT SUM(c) AS t FROM sc),
grid AS (
  SELECT st.source, st.s, tt.ct, COALESCE(sc.c, 0) AS c, tot.t
  FROM st CROSS JOIN tt CROSS JOIN tot
  LEFT JOIN sc ON sc.source = st.source AND sc.tok = tt.tok
)
SELECT source,
       CAST(SUM(ABS((c * 1000000) // s
                    - ((ct - c) * 1000000) // (t - s))) // 2 AS BIGINT)
         AS tvd_ppm
FROM grid GROUP BY source
""",
    doc="Per-source distribution drift: total-variation distance (in "
    "integer ppm) between each source's unigram token distribution and "
    "the REST of the corpus — the contamination/drift dial that flags "
    "a source whose language shifted (spam influx, scraper breakage, "
    "generated-text flooding) before it pollutes the mixture. TVD "
    "instead of KL/JS keeps the arithmetic integer-exact across "
    "engines (no logs): each term is two integer divisions at ppm "
    "scale. Scale posture: token counts are one corpus pass "
    "(map-side combinable); the scoring grid is sources x vocab — "
    "VOCAB-sized, never corpus-sized — with the per-source totals "
    "broadcast; at web scale restrict the grid to the global top-64k "
    "tokens (covers the mass; the tail's TVD contribution is bounded "
    "by its ppm share) and the same plan holds.",
)
def q231_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    sc = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("s"))
    tt = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("ct"))
    tot = sc.agg(F.sum("c").cast("long").alias("t"))
    grid = (
        st.crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tot))
        .join(sc, ["source", "tok"], "left")
        .select(
            "source",
            "s",
            "ct",
            "t",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    return grid.groupBy("source").agg(
        F.expr(
            "cast(sum(abs((c * 1000000) div s"
            " - ((ct - c) * 1000000) div (t - s))) div 2 as bigint)"
        ).alias("tvd_ppm")
    )


_GATE_BINS = 256  # fixed histogram resolution for the zero-sort gate
_GATE_FRAC_NUM, _GATE_FRAC_DEN = 1, 4  # reject the bottom quartile


def histogram_gate(scored: DataFrame) -> DataFrame:
    """Zero-sort per-source quality gate over ``(doc_id, source, score)``.

    The mega-source variant of q222's discrete-quantile gate: instead of
    a per-source sort (a window), build a fixed `_GATE_BINS`-bin
    histogram of the score (map-side combinable, mergeable across
    batches — the streaming twin accumulates exactly this relation),
    derive each source's rejection-threshold BIN from the cumulative
    counts, and keep docs whose bin is at/above it. Bin-granular: docs
    tied in the threshold bin are all kept, so the gate keeps *at least*
    1 - num/den of each source. Everything after the one corpus scan is
    sources x bins sized.
    """
    stats = scored.agg(
        F.min("score").alias("mn"), F.max("score").alias("mx")
    )
    binned = scored.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "source",
        F.expr(f"(score - mn) * {_GATE_BINS} div (mx - mn + 1)").alias("bin"),
    )
    hist = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cum = hist.select(
        "source",
        "bin",
        F.sum("cnt")
        .over(
            Window.partitionBy("source")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n"),
    )
    thr = (
        cum.filter(
            F.col("cum") * _GATE_FRAC_DEN >= F.col("n") * _GATE_FRAC_NUM
        )
        .groupBy("source")
        .agg(F.min("bin").alias("thr_bin"))
    )
    return (
        binned.join(F.broadcast(thr), "source")
        .filter(F.col("bin") >= F.col("thr_bin"))
        .select("doc_id", "source", F.col("bin").cast("long").alias("bin"))
    )


@register(
    "q232_quality_histogram_gate",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS score
  FROM documents
),
stats AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM scored),
binned AS (
  SELECT doc_id, source,
         (score - mn) * {_GATE_BINS} // (mx - mn + 1) AS bin
  FROM scored CROSS JOIN stats
),
hist AS (SELECT source, bin, COUNT(*) AS cnt FROM binned GROUP BY source, bin),
cum AS (
  SELECT source, bin,
         SUM(cnt) OVER (PARTITION BY source ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY source) AS n
  FROM hist
),
thr AS (
  SELECT source, MIN(bin) AS thr_bin
  FROM cum
  WHERE cum * {_GATE_FRAC_DEN} >= n * {_GATE_FRAC_NUM}
  GROUP BY source
)
SELECT b.doc_id, b.source, CAST(b.bin AS BIGINT) AS bin
FROM binned b JOIN thr t ON b.source = t.source
WHERE b.bin >= t.thr_bin
""",
    doc="The mega-source form of q222's per-source quality gate: reject "
    "each source's bottom quartile by token count using a fixed "
    f"{_GATE_BINS}-bin histogram instead of a per-source sort — the "
    "swap q222's docstring promises for sources too large to sort. "
    "Bin-granular (threshold-bin ties are kept, so >= 75% of each "
    "source survives), deterministic, integer-exact. Scale posture: "
    "ONE corpus scan builds the histogram (map-side combinable, "
    "mergeable — the streaming twin accumulates the same relation "
    "batch over batch), thresholds are a sources x bins derivation "
    "broadcast back, the gate itself is a stateless filter; ZERO "
    "sorts and zero per-source windows anywhere in the plan.",
)
def q232_quality_histogram_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("score"),
    )
    return histogram_gate(scored)


@register(
    "q240_boilerplate_by_source",
    oracle=f"""
WITH segs AS ({_SEGMENTS_SQL}),
df AS (
  SELECT seg_text, COUNT(DISTINCT doc_id) AS df
  FROM segs GROUP BY seg_text
),
marked AS (
  SELECT s.doc_id, s.seg_len,
         CASE WHEN f.df >= {_BOILER_DF} THEN 1 ELSE 0 END AS is_boiler
  FROM segs s JOIN df f ON f.seg_text = s.seg_text
)
SELECT d.source,
       CAST(COUNT(DISTINCT m.doc_id) AS BIGINT) AS n_docs,
       CAST(SUM(m.is_boiler) AS BIGINT) AS boiler_segments,
       CAST(SUM(m.is_boiler * m.seg_len) AS BIGINT) AS boiler_tokens,
       CAST((SUM(m.is_boiler * m.seg_len) * 1000000) // SUM(m.seg_len)
            AS BIGINT) AS boiler_ppm
FROM marked m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY d.source
""",
    doc="Boilerplate share by SOURCE: q229's segment scrub rolled up to "
    "the domain level (boilerplate segments, tokens, and ppm token "
    "share per source) — the crawl-health dial that tells a data team "
    "which domains are template farms BEFORE paying the near-dup "
    "passes, and the sizing input for enabling "
    "curate(scrub_boilerplate_first=True). Scale posture: exactly "
    "q229's linear plan (one explode, one segment-keyed agg, one "
    "LEFT equi-join back against ONLY the df>=threshold boiler set — "
    "broadcastable because true boilerplate is a tiny fraction of "
    "distinct segments) plus a source-domain-sized rollup; at 100 TB the "
    "join key becomes the segment digest (the boilerplate_stream "
    "twin's 16-byte state key) and nothing else changes.",
)
def q240_boilerplate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    segs = _segments(d.select("doc_id", "text"))
    df = segs.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("df")
    )
    boiler = df.filter(F.col("df") >= _BOILER_DF).select(
        "seg_text", F.lit(True).alias("hit")
    )
    marked = segs.join(F.broadcast(boiler), "seg_text", "left").select(
        "doc_id",
        "seg_len",
        F.when(F.col("hit").isNotNull(), 1).otherwise(0).alias("is_boiler"),
    )
    return (
        marked.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("is_boiler").cast("long").alias("boiler_segments"),
            F.sum(F.expr("is_boiler * seg_len"))
            .cast("long")
            .alias("boiler_tokens"),
            F.expr(
                "cast((sum(is_boiler * seg_len) * 1000000)"
                " div sum(seg_len) as bigint)"
            ).alias("boiler_ppm"),
        )
    )


@register(
    "q243_intra_source_drift",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
halves AS (
  SELECT d.source, CASE WHEN r.rn * 2 <= r.n THEN 0 ELSE 1 END AS late,
         unnest(string_split(d.text, ' ')) AS tok
  FROM documents d JOIN ranked r ON r.doc_id = d.doc_id
),
c AS (SELECT source, late, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM halves GROUP BY source, late, tok),
st AS (SELECT source, late, SUM(c) AS s FROM c GROUP BY source, late),
toks AS (SELECT DISTINCT source, tok FROM c),
grid AS (
  SELECT t.source, t.tok,
         COALESCE(e.c, 0) AS ce, se.s AS stot_e,
         COALESCE(l.c, 0) AS cl, sl.s AS stot_l
  FROM toks t
  JOIN st se ON se.source = t.source AND se.late = 0
  JOIN st sl ON sl.source = t.source AND sl.late = 1
  LEFT JOIN c e ON e.source = t.source AND e.tok = t.tok AND e.late = 0
  LEFT JOIN c l ON l.source = t.source AND l.tok = t.tok AND l.late = 1
)
SELECT source,
       CAST(SUM(ABS((ce * 1000000) // stot_e
                    - (cl * 1000000) // stot_l)) // 2 AS BIGINT)
         AS drift_ppm
FROM grid GROUP BY source
""",
    doc="Intra-source cohort drift: total-variation distance (ppm) "
    "between each source's EARLY and LATE halves (doc_id order, "
    "per-source discrete median split) — q231 measures a source "
    "against the rest of the corpus at one instant; this measures the "
    "SAME source against its own past, the signal that a scraper "
    "broke or a domain's content turned mid-crawl even when the "
    "source still looks normal cross-sectionally. Integer ppm, no "
    "logs. Scale posture: one rank window per source over the "
    "doc-count relation, one corpus token pass to (source, half, tok) "
    "counts, a per-source-vocab-sized scoring grid — the q231 plan "
    "with a 2-cohort split; the streaming twin is drift_stream with "
    "an epoch column folded into the state key.",
)
def q243_intra_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = d.select(
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    halves = (
        d.join(ranked, "doc_id")
        .select(
            "source",
            F.when(F.col("rn") * 2 <= F.col("n"), 0).otherwise(1).alias("late"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
    )
    c = halves.groupBy("source", "late", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    st = c.groupBy("source", "late").agg(F.sum("c").cast("long").alias("s"))
    toks = c.select("source", "tok").distinct()
    se = st.filter(F.col("late") == 0).select("source", F.col("s").alias("stot_e"))
    sl = st.filter(F.col("late") == 1).select("source", F.col("s").alias("stot_l"))
    ce = c.filter(F.col("late") == 0).select("source", "tok", F.col("c").alias("ce"))
    cl = c.filter(F.col("late") == 1).select("source", "tok", F.col("c").alias("cl"))
    grid = (
        toks.join(F.broadcast(se), "source")
        .join(F.broadcast(sl), "source")
        .join(ce, ["source", "tok"], "left")
        .join(cl, ["source", "tok"], "left")
        .select(
            "source",
            "stot_e",
            "stot_l",
            F.coalesce(F.col("ce"), F.lit(0)).alias("ce"),
            F.coalesce(F.col("cl"), F.lit(0)).alias("cl"),
        )
    )
    return grid.groupBy("source").agg(
        F.expr(
            "cast(sum(abs((ce * 1000000) div stot_e"
            " - (cl * 1000000) div stot_l)) div 2 as bigint)"
        ).alias("drift_ppm")
    )
