"""Iterative graph analytics over relation-derived graphs.

PageRank over the document near-duplicate similarity graph (the q51
Jaccard pairs): centrality inside duplicate neighborhoods ranks the
"hub" variants a curation pipeline should prefer as canonical docs, and
the operator itself is the catalog's iterative-graph-propagation
primitive (the same shuffle shape as label propagation, belief
propagation, or embedding-graph smoothing at 100 TB).

Extends the reference's dedup cluster-resolution capability
(/root/reference/src/data_processor.py:389-465 resolves duplicates
row-by-row on the driver; SURVEY §2.12): where q54/q125 label
components, PageRank orders nodes *within* them.

All arithmetic is integer micro-units with explicit integer division
(``div`` in Spark, ``//`` in DuckDB), so the trajectory is associative,
retry-stable, and bit-identical cross-engine — no float accumulation
order dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    _CLUSTERS_SQL,
    _JACCARD_PAIRS_SQL,
    jaccard_pairs_checkpointed,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register

#: damping in per-mille: pr' = (1-d) + d * sum(pr_u / deg_u), d = 0.85
_DAMP_PM = 850
_BASE_MICROS = 150_000  # (1000 - 850) per-mille of the 1_000_000 unit mass


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    Returns (node, degree, pr_micros) for every node with at least one
    outgoing edge. Callers wanting undirected semantics symmetrize the
    edge list first (see :func:`q136_pagerank`); in a symmetrized graph
    every node also receives mass, so no dangling-mass redistribution
    step is needed.

    Scale shape (per iteration): ONE shuffle — the contribution
    aggregation on the destination key. The per-node contribution
    ``pr div deg`` is computed by joining ranks to the edge list on the
    source key; with ranks and degrees co-partitioned with edges on the
    node key (one ``repartition`` up front on a real cluster, or
    bucketed tables), that join is shuffle-free, leaving the dst-keyed
    map-side-combinable sum as the only data movement.

    Lineage: each superstep references the CHECKPOINTED edge/degree
    relations plus the previous rank relation once, so the plan grows
    linearly in ``n_iter``, not exponentially — a handful of iterations
    run as ONE job with no mid-loop materialization. Only every
    ``checkpoint_every``-th iteration cuts lineage with an eager
    ``localCheckpoint`` (reliable checkpointing on a cluster): the
    fixed cost of an extra job per superstep dominates small-graph /
    low-iteration runs, while deep runs still bound plan depth and
    recovery-recompute cost.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    deg = deg.localCheckpoint(eager=True)
    pr = deg.select("node", F.lit(1_000_000).cast("long").alias("pr"))
    # Every superstep join is hinted shuffle_hash: rank rows arrive
    # from the previous superstep's dst-keyed aggregation with no
    # useful order, so sort-merge would pay a full sort per side per
    # iteration (the unhinted plan: 7 SMJ / 11 Sorts for 3 iterations).
    # Hash-building on the node-sized side keeps each superstep at the
    # dst aggregation's shuffle plus a sort-free probe of the edge
    # relation — the shape that survives deep iteration counts.
    for it in range(n_iter):
        contrib = (
            e.join(
                pr.join(deg.hint("shuffle_hash"), "node").select(
                    F.col("node").alias("src"),
                    F.expr("pr div deg").alias("c"),
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("mass"))
        )
        pr = contrib.select(
            "node",
            (
                F.lit(_BASE_MICROS)
                + F.expr(f"({_DAMP_PM} * mass) div 1000")
            )
            .cast("long")
            .alias("pr"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_iter:
            pr = pr.localCheckpoint(eager=True)
    return deg.join(pr.hint("shuffle_hash"), "node").select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        F.col("pr").cast("long").alias("pr_micros"),
    )


def _pr_iter_sql(k: int) -> str:
    return f"""
pr{k} AS (
  SELECT e.dst AS node,
         {_BASE_MICROS} + ({_DAMP_PM} * SUM(p.pr // d.deg)) // 1000 AS pr
  FROM edges e
  JOIN pr{k - 1} p ON p.node = e.src
  JOIN deg d ON d.node = e.src
  GROUP BY e.dst
)"""


#: q136's full oracle — also composed by q142's canonical selection.
_PAGERANK_SQL = f"""
WITH pairs AS ({_JACCARD_PAIRS_SQL}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg),
{_pr_iter_sql(1)},
{_pr_iter_sql(2)},
{_pr_iter_sql(3)}
SELECT d.node AS doc_id,
       CAST(d.deg AS BIGINT) AS degree,
       CAST(p.pr AS BIGINT) AS pr_micros
FROM deg d JOIN pr3 p ON p.node = d.node
"""


@register(
    "q136_pagerank",
    oracle=_PAGERANK_SQL,
    doc="Fixed-iteration (3) integer PageRank over the symmetrized q51 "
    "near-duplicate similarity graph: ranks documents by centrality "
    "within their duplicate neighborhoods — the 'pick the hub variant "
    "as canonical' signal, and the catalog's iterative graph-"
    "propagation primitive (same shuffle shape as label propagation). "
    "Per iteration exactly ONE shuffle (the dst-keyed contribution "
    "sum; the rank-to-edge join co-partitions on the node key), "
    "lineage cut per superstep via localCheckpoint. Integer micro-unit "
    "mass with explicit integer division makes the 3-step trajectory "
    "bit-identical across engines and cluster layouts.",
)
def q136_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = jaccard_pairs_checkpointed(spark, sf_dir).select("doc_a", "doc_b")
    # symmetrize with a row-local explode, NOT a self-union: a union of
    # two selects would evaluate the (expensive) pair pipeline twice
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return pagerank(edges, n_iter=3).select(
        F.col("node").alias("doc_id"), "degree", "pr_micros"
    )


def pagerank_scores_checkpointed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q136's PageRank scores memoized per (session, sf_dir) — the
    third relation on the shared derivation chain (pairs → clusters,
    pairs → pagerank): 3 supersteps of dst-keyed shuffles re-ran per
    consuming query for scores that only change when the pair graph
    does. q136 itself stays un-memoized as the algorithm benchmark;
    ``invalidate_jaccard_pairs`` /
    :func:`~etl_pipeline_candy_store_spark.operators.memo.invalidate_session_memos`
    clears this with the rest of the chain."""
    from etl_pipeline_candy_store_spark.operators.memo import session_memo

    return session_memo(
        "pagerank_scores", spark, sf_dir, lambda: q136_pagerank(spark, sf_dir)
    )


@register(
    "q142_canonical_by_pagerank",
    oracle=f"""
WITH clusters AS ({_CLUSTERS_SQL}),
pr AS ({_PAGERANK_SQL}),
m AS (
  SELECT c.cluster_id, c.doc_id, COALESCE(p.pr_micros, 0) AS pr
  FROM clusters c LEFT JOIN pr p USING (doc_id)
),
best AS (
  SELECT cluster_id, doc_id AS canonical_doc_id, pr AS canonical_pr_micros,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
             ORDER BY pr DESC, doc_id) AS rn
  FROM m
),
cnt AS (SELECT cluster_id, COUNT(*) AS n_members FROM m GROUP BY cluster_id)
SELECT b.cluster_id,
       CAST(b.canonical_doc_id AS BIGINT) AS canonical_doc_id,
       CAST(c.n_members AS BIGINT) AS n_members,
       CAST(b.canonical_pr_micros AS BIGINT) AS canonical_pr_micros
FROM best b JOIN cnt c USING (cluster_id)
WHERE b.rn = 1
""",
    doc="Centrality-aware canonical selection: within each dup "
    "cluster (q54/q125's shared contract; computed via the faster "
    "star-contraction source) keep the member with the highest q136 "
    "PageRank (min "
    "doc_id tiebreak) — the 'hub variant as canonical' policy q136 "
    "motivates, replacing q55's min-doc_id convention with a "
    "quality-bearing choice. Spark side needs NO window: one "
    "cluster-keyed `max_by(doc_id, (pr, -doc_id))` aggregate "
    "(combinable argmax; the oracle's ROW_NUMBER window expresses the "
    "same argmax relationally). Singletons carry pr 0 and canonicalize "
    "to themselves.",
)
def q142_canonical_by_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_pipeline_candy_store_spark.operators.dedup import (
        dedup_clusters_checkpointed,
    )

    clusters = dedup_clusters_checkpointed(spark, sf_dir)
    pr = pagerank_scores_checkpointed(spark, sf_dir).select("doc_id", "pr_micros")
    # both sides are checkpointed node-keyed relations with no useful
    # order — shuffle_hash skips the per-side sorts a merge join pays
    m = clusters.join(pr.hint("shuffle_hash"), "doc_id", "left").select(
        "cluster_id",
        "doc_id",
        F.coalesce("pr_micros", F.lit(0)).alias("pr"),
    )
    return m.groupBy("cluster_id").agg(
        F.expr("max_by(doc_id, struct(pr, -doc_id))")
        .cast("long")
        .alias("canonical_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max("pr").cast("long").alias("canonical_pr_micros"),
    )
