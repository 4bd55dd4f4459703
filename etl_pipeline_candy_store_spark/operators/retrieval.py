"""Retrieval-composition operators: hybrid lexical+vector rank fusion
and diversity re-ranking — the stages a retrieval/curation pipeline runs
AFTER the per-modality scorers (BM25 q170, cosine/ANN q60-q69) to build
the final candidate slate. No counterpart in the reference (its pipeline
stops at BI outputs); expressed Spark-first over the same integer-staged
scoring primitives so every result is hash-exact against DuckDB.

Scale notes:
- Rank fusion never touches the corpus twice: each modality produces a
  bounded top-K candidate list (the lexical relation is query-term-sized
  after the filtered explode; the vector relation is a TakeOrdered top-K
  against a broadcast query), and fusion is a full-outer join of two
  K-row frames — driver-trivial at any corpus size. The only
  unpartitioned windows are over those ≤K-row relations (same documented
  tiny-relation exemption as the q88/q119 prefix-sum totals).
- MMR is greedy-sequential BY DEFINITION (pick t depends on picks
  1..t-1), so it is unrolled a fixed k steps over the per-query
  candidate slates; every step's relations are (n_queries × K)-sized.
  The corpus-scale stage is only the initial candidate generation,
  which reuses the bounded top-K shape (swap in the IVF/LSH variants at
  100 TB). Pairwise candidate sims are K²-per-query with K fixed at 8 —
  bounded, never corpus-quadratic.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_candy_store_spark.operators.similarity import (
    _E_NORMED_SQL,
    _cos_micros,
    _cos_micros_prenorm_sql,
    _dot,
    with_norm,
)
from etl_pipeline_candy_store_spark.operators import text as _text
from etl_pipeline_candy_store_spark.plans.catalog import (
    REGISTRY,
    load,
    register,
)

#: RRF smoothing constant (Cormack et al.'s k=60) and list bounds.
_RRF_K = 60
_TOP_LEX = 30
_TOP_VEC = 30
_TOP_FUSED = 20

# The lexical scorer IS q170's integer-staged BM25 — its full oracle
# text nests as a CTE body, so both engines fuse the *identical*
# lexical ranking (importing text above guarantees registration).
_BM25_ORACLE = REGISTRY["q170_bm25_scores"].oracle


@register(
    "q193_hybrid_retrieval_rrf",
    oracle=f"""
WITH bm25 AS ({_BM25_ORACLE}),
lex AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
           ORDER BY score_micros DESC, doc_id) AS INTEGER) AS lex_rank
  FROM (SELECT * FROM bm25
        ORDER BY score_micros DESC, doc_id LIMIT {_TOP_LEX})
),
e AS ({_E_NORMED_SQL}),
q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 0),
vecscore AS (
  SELECT e.vec_id AS doc_id,
         {_cos_micros_prenorm_sql('q.q_emb', 'e.embedding', 'q.q_nrm', 'e.nrm')} AS cos_micros
  FROM e CROSS JOIN q WHERE e.vec_id <> 0
),
vec AS (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (
           ORDER BY cos_micros DESC, doc_id) AS INTEGER) AS vec_rank
  FROM (SELECT * FROM vecscore
        ORDER BY cos_micros DESC, doc_id LIMIT {_TOP_VEC})
),
fused AS (
  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         CAST(COALESCE(l.lex_rank, 0) AS INTEGER) AS lex_rank,
         CAST(COALESCE(v.vec_rank, 0) AS INTEGER) AS vec_rank,
         CAST(COALESCE(1000000 // ({_RRF_K} + l.lex_rank), 0)
            + COALESCE(1000000 // ({_RRF_K} + v.vec_rank), 0) AS BIGINT)
           AS rrf_micros
  FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf_micros,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_micros DESC, doc_id)
            AS INTEGER) AS fused_rank
FROM fused
QUALIFY fused_rank <= {_TOP_FUSED}
""",
    doc="Reciprocal-rank-fusion hybrid retrieval: fuse the BM25 lexical "
    "top-30 (q170's integer-staged scorer, oracle text reused verbatim "
    "as a CTE) with the cosine vector top-30 for query vec 0 via "
    "RRF(k=60): score = Σ 1e6 div (60 + rank), rank 0 = absent from "
    "that list. The standard two-tower + lexical slate builder for RAG "
    "and curation retrieval. Plan: each side is sort+LIMIT "
    "(TakeOrderedAndProject — distributed partial top-K, no global "
    "sort), the rank row_numbers run over the ≤30-row survivors, and "
    "the fusion join is two K-row frames. The corpus is scanned once "
    "per modality and never joined against itself.",
)
def q193_hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    bm25 = _text.q170_bm25_scores(spark, sf_dir)
    lex_top = bm25.orderBy(
        F.col("score_micros").desc(), F.col("doc_id")
    ).limit(_TOP_LEX)
    w_lex = Window.orderBy(F.col("score_micros").desc(), F.col("doc_id"))
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("lex_rank")
    )

    e = with_norm(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    vecscore = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cos_micros(
                _dot(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("cos_micros"),
        )
    )
    vec_top = vecscore.orderBy(
        F.col("cos_micros").desc(), F.col("doc_id")
    ).limit(_TOP_VEC)
    w_vec = Window.orderBy(F.col("cos_micros").desc(), F.col("doc_id"))
    vec = vec_top.select(
        "doc_id", F.row_number().over(w_vec).cast("int").alias("vec_rank")
    )

    rrf = lambda r: F.coalesce(  # noqa: E731
        F.expr(f"1000000 div ({_RRF_K} + {r})"), F.lit(0)
    )
    fused = (
        lex.join(vec, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
            (rrf("lex_rank") + rrf("vec_rank"))
            .cast("long")
            .alias("rrf_micros"),
        )
    )
    w_f = Window.orderBy(F.col("rrf_micros").desc(), F.col("doc_id"))
    return (
        fused.withColumn(
            "fused_rank", F.row_number().over(w_f).cast("int")
        ).filter(F.col("fused_rank") <= _TOP_FUSED)
    )


#: MMR slate: 3 query vectors, 8-candidate slates, pick k=3, λ=1/2
#: (λ=1/2 clears the floats: 2·mmr = rel − max-sim, all in micros ints).
_MMR_QUERIES = 3
_MMR_CANDS = 8
_MMR_PICKS = 3


def _mmr_oracle() -> str:
    """Unrolled-SQL twin of the Spark builder below: pick 1 is the
    relevance argmax; each later pick re-scores the remainder by
    rel − max-sim-to-selected and takes the (mmr, cand_id) argmax."""
    cos_pair = _cos_micros_prenorm_sql(
        "a.embedding", "b.embedding", "a.nrm", "b.nrm"
    )
    cos_rel = _cos_micros_prenorm_sql(
        "q.q_emb", "e.embedding", "q.q_nrm", "e.nrm"
    )
    parts = [
        f"""
WITH e AS ({_E_NORMED_SQL}),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
      FROM e WHERE vec_id < {_MMR_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id, e.embedding, e.nrm,
         {cos_rel} AS rel_micros
  FROM q JOIN e ON e.vec_id <> q.query_id
),
cand AS (
  SELECT * FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rel_micros DESC, cand_id) AS INTEGER) AS rk
    FROM scored) t
  WHERE rk <= {_MMR_CANDS}
),
sims AS (
  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         {cos_pair} AS sim_micros
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
),
p1 AS (
  SELECT query_id, cand_id, rel_micros,
         CAST(rel_micros AS BIGINT) AS mmr_micros
  FROM cand WHERE rk = 1
)"""
    ]
    for t in range(2, _MMR_PICKS + 1):
        parts.append(
            f""",
sel{t} AS ({" UNION ALL ".join(f"SELECT query_id, cand_id FROM p{i}" for i in range(1, t))}),
ms{t} AS (
  SELECT s.query_id, s.ca AS cand_id, MAX(s.sim_micros) AS max_sim
  FROM sims s JOIN sel{t} ON s.query_id = sel{t}.query_id
                         AND s.cb = sel{t}.cand_id
  GROUP BY s.query_id, s.ca
),
p{t} AS (
  SELECT query_id, cand_id, rel_micros, mmr_micros FROM (
    SELECT c.query_id, c.cand_id, c.rel_micros,
           CAST(c.rel_micros - m.max_sim AS BIGINT) AS mmr_micros,
           ROW_NUMBER() OVER (PARTITION BY c.query_id
             ORDER BY c.rel_micros - m.max_sim DESC, c.cand_id) AS prn
    FROM cand c
    JOIN ms{t} m ON c.query_id = m.query_id AND c.cand_id = m.cand_id
    WHERE NOT EXISTS (SELECT 1 FROM sel{t}
                      WHERE sel{t}.query_id = c.query_id
                        AND sel{t}.cand_id = c.cand_id)) t
  WHERE prn = 1
)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT query_id, CAST({i} AS INTEGER) AS pick_order, cand_id, "
        f"rel_micros, mmr_micros FROM p{i}"
        for i in range(1, _MMR_PICKS + 1)
    )
    parts.append(f"\n{unions}")
    return "".join(parts)


@register(
    "q195_mmr_diversify",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance slate diversification (λ=1/2, k=3 "
    "picks from 8-candidate slates for 3 query vectors): pick 1 is the "
    "relevance argmax; pick t maximizes rel − max-sim-to-already-picked "
    "(λ=1/2 scaled ×2 so the score stays in integer micros — no float "
    "mixing). MMR is greedy-sequential by definition (each pick feeds "
    "the next score), the same order-dependent-feedback class as the "
    "ST1 allocator (SURVEY §4.3) — but with a FIXED k it unrolls into "
    "k declarative stages, so it stays oracle-paired instead of "
    "dropping to rows-only. Plan: the corpus-scale work is only the "
    "initial per-query top-8 (window over a broadcast-query scan); "
    "every unrolled stage joins (queries×8)-row frames; candidate "
    "pairwise sims are 8²-per-query, bounded, never corpus-quadratic.",
)
def q195_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = with_norm(load(spark, sf_dir, "embeddings"))
    q = e.filter(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            "embedding",
            "nrm",
            _cos_micros(
                _dot(F.col("q_emb"), F.col("embedding")),
                F.col("q_nrm"),
                F.col("nrm"),
            ).alias("rel_micros"),
        )
    )
    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("rel_micros").desc(), F.col("cand_id")
    )
    cand = (
        scored.withColumn("rk", F.row_number().over(w_rel))
        .filter(F.col("rk") <= _MMR_CANDS)
        # the slate is (queries × 8) rows: pin it so the unrolled
        # stages below fan out from ONE computed relation instead of
        # re-deriving the corpus scan per stage
        .localCheckpoint(eager=True)
    )
    a, b = cand.alias("a"), cand.alias("b")
    sims = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.cand_id") != F.col("b.cand_id")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.cand_id").alias("ca"),
        F.col("b.cand_id").alias("cb"),
        _cos_micros(
            _dot(F.col("a.embedding"), F.col("b.embedding")),
            F.col("a.nrm"),
            F.col("b.nrm"),
        ).alias("sim_micros"),
    )

    slim = cand.select("query_id", "cand_id", "rel_micros")
    picks = [
        cand.filter(F.col("rk") == 1).select(
            "query_id",
            F.lit(1).cast("int").alias("pick_order"),
            "cand_id",
            "rel_micros",
            F.col("rel_micros").cast("long").alias("mmr_micros"),
        )
    ]
    for t in range(2, _MMR_PICKS + 1):
        sel = reduce(
            DataFrame.unionByName,
            [p.select("query_id", "cand_id") for p in picks],
        )
        max_sim = (
            sims.join(sel.withColumnRenamed("cand_id", "cb_sel"), ["query_id"])
            .filter(F.col("cb") == F.col("cb_sel"))
            .groupBy("query_id", "ca")
            .agg(F.max("sim_micros").alias("max_sim"))
            .withColumnRenamed("ca", "cand_id")
        )
        remaining = slim.join(sel, ["query_id", "cand_id"], "left_anti")
        w_pick = Window.partitionBy("query_id").orderBy(
            F.col("mmr_micros").desc(), F.col("cand_id")
        )
        pick_t = (
            remaining.join(max_sim, ["query_id", "cand_id"])
            .withColumn(
                "mmr_micros",
                (F.col("rel_micros") - F.col("max_sim")).cast("long"),
            )
            .withColumn("prn", F.row_number().over(w_pick))
            .filter(F.col("prn") == 1)
            .select(
                "query_id",
                F.lit(t).cast("int").alias("pick_order"),
                "cand_id",
                "rel_micros",
                "mmr_micros",
            )
        )
        picks.append(pick_t)
    return reduce(DataFrame.unionByName, picks)


#: Rank-aware ANN quality eval: queries, truth depth, retrieval cutoff.
_EVAL_QUERIES = 5
_EVAL_K = 5


def _retrieval_metrics_oracle() -> str:
    from etl_pipeline_candy_store_spark.operators.similarity import (
        _BUCKET_SQL,
    )

    cos_qt = _cos_micros_prenorm_sql(
        "q.q_emb", "e.embedding", "q.q_nrm", "e.nrm"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))
           AS nrm,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm, bucket
      FROM e WHERE vec_id < {_EVAL_QUERIES}),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {cos_qt} DESC, e.vec_id) AS rn
    FROM q JOIN e ON e.vec_id <> q.query_id) t
  WHERE rn <= {_EVAL_K}
),
retrieved AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
           ORDER BY {cos_qt} DESC, e.vec_id) AS BIGINT) AS rrank
  FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
),
hits AS (
  SELECT r.query_id, r.rrank
  FROM retrieved r JOIN truth t
    ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
),
per_q AS (
  SELECT query_id,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(MIN(rrank) AS BIGINT) AS first_hit_rank
  FROM hits GROUP BY query_id
),
sizes AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved
  FROM retrieved GROUP BY query_id
)
SELECT q.query_id,
       CAST(COALESCE(s.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       CAST(COALESCE(p.n_hits, 0) * 1000000 // {_EVAL_K} AS BIGINT)
         AS recall_micros,
       CAST(COALESCE(1000000 // p.first_hit_rank, 0) AS BIGINT)
         AS mrr_micros
FROM q
LEFT JOIN per_q p ON p.query_id = q.query_id
LEFT JOIN sizes s ON s.query_id = q.query_id
"""


@register(
    "q198_retrieval_metrics",
    oracle=_retrieval_metrics_oracle(),
    doc="Rank-aware retrieval-quality metrics for the hyperplane-LSH "
    "ANN path (q63/q64): per query, recall@5 against exact-cosine "
    "ground truth and reciprocal rank of the first true neighbor in "
    "the bucket-restricted ranking (1e6 div rank — the rational MRR "
    "surrogate; no float logs, hash-exact). q128 estimates IVF recall "
    "on a sample; this is the per-query, rank-sensitive eval a "
    "retrieval pipeline tracks per index build. Plan: ground truth is "
    "a broadcast-query scan (queries × corpus, bounded by the query "
    "panel — the labeled-baseline pattern); the retrieved side is the "
    "bucket equi-join, so the production path itself is never "
    "all-pairs; metrics fold to query-panel-sized relations.",
)
def q198_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.similarity import (
        q63_vector_lsh_buckets,
    )

    e = with_norm(load(spark, sf_dir, "embeddings")).join(
        q63_vector_lsh_buckets(spark, sf_dir), "vec_id"
    )
    q = e.filter(F.col("vec_id") < _EVAL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = lambda: _cos_micros(  # noqa: E731
        _dot(F.col("q_emb"), F.col("embedding")),
        F.col("q_nrm"),
        F.col("nrm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micros").desc(), F.col("neighbor_id")
    )
    truth = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos().alias("cos_micros"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _EVAL_K)
        .select("query_id", "neighbor_id")
    )
    retrieved = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos().alias("cos_micros"),
        )
        .withColumn("rrank", F.row_number().over(w).cast("long"))
        .select("query_id", "neighbor_id", "rrank")
    )
    hits = retrieved.join(truth, ["query_id", "neighbor_id"])
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("rrank").cast("long").alias("first_hit_rank"),
    )
    sizes = retrieved.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved")
    )
    return (
        q.select("query_id")
        .join(per_q, "query_id", "left")
        .join(sizes, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias(
                "n_retrieved"
            ),
            (F.coalesce("n_hits", F.lit(0)) * 1000000 / F.lit(_EVAL_K))
            .cast("long")
            .alias("recall_micros"),
            F.coalesce(
                F.expr("1000000 div first_hit_rank"), F.lit(0)
            )
            .cast("long")
            .alias("mrr_micros"),
        )
    )
