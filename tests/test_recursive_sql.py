"""Bounded transitive closure (q188) and triangle counting (q189):
hand-computed graphs, semi-naive-vs-native-recursive-SQL equivalence,
and orientation-invariance of the triangle set.

Spark 4 ships native ``WITH RECURSIVE`` (UNION ALL form only); the
catalog's q188 builder deliberately stays on the semi-naive DataFrame
loop — UNION ALL recursion enumerates every walk (exponential in dense
components) where semi-naive tracks reached pairs, and the per-hop
localCheckpoints bound lineage — but the two evaluation strategies
must agree row-for-row.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.graph import (
    _symmetrize,
    khop_reachability,
    triangle_counts,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )


def test_khop_path_graph_hand_computed(spark):
    # path 1-2-3-4-5, k=3: node 1 reaches {2,3,4}; node 3 reaches all 4
    out = {
        r["node"]: r["n_reached"]
        for r in khop_reachability(
            _symmetrize(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])), k=3
        ).collect()
    }
    assert out == {1: 3, 2: 4, 3: 4, 4: 4, 5: 3}


def test_khop_excludes_self_on_cycles(spark):
    # triangle: every node reaches the other two within 2 hops; the
    # length-2 walk back to itself must NOT count
    out = khop_reachability(
        _symmetrize(_pairs(spark, [(1, 2), (2, 3), (1, 3)])), k=3
    ).collect()
    assert {r["n_reached"] for r in out} == {2}


def test_khop_matches_native_recursive_sql(spark):
    # two components: a 6-path (diameter > k exercises the bound) and a
    # 4-clique (cycles exercise the distinct/anti-join)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)] + [
        (a, b) for a in range(10, 14) for b in range(a + 1, 14)
    ]
    sym = _symmetrize(_pairs(spark, edges))
    sym.createOrReplaceTempView("edges_rec_test")
    # Spark 4.1 restricts recursive CTEs to UNION ALL (UNION-distinct
    # raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the native form
    # enumerates WALKS, not reached pairs — the depth bound still
    # terminates it and COUNT(DISTINCT) collapses the duplicates. This
    # is exactly why the catalog's semi-naive DataFrame builder exists:
    # walk enumeration grows with path counts (exponential in dense
    # components), reached-pair tracking grows with the closure.
    native = spark.sql(
        """
        WITH RECURSIVE walk(node, nbr, depth) AS (
          SELECT src, dst, 1 FROM edges_rec_test
          UNION ALL
          SELECT w.node, e.dst, w.depth + 1
          FROM walk w JOIN edges_rec_test e ON e.src = w.nbr
          WHERE w.depth < 3
        )
        SELECT node, COUNT(DISTINCT nbr) AS n_reached
        FROM walk WHERE nbr <> node GROUP BY node
        """
    )
    got = {r["node"]: r["n_reached"] for r in khop_reachability(sym, k=3).collect()}
    want = {r["node"]: r["n_reached"] for r in native.collect()}
    assert got == want
    assert got[1] == 3 and got[10] == 3  # path end sees 3 hops; clique 3 peers


def test_triangles_clique_and_star(spark):
    # 4-clique has C(4,3)=4 triangles, each node in 3; the star (100
    # hub) has none and its nodes must not appear
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(100, x) for x in (101, 102, 103)]
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


@pytest.mark.slow
def test_triangle_set_invariant_under_orientation(spark):
    # degree-ordered orientation must yield the same counts as the
    # naive id-ordered enumeration on a skewed graph (hub node 1 in
    # two triangles plus pendant edges)
    edges = [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5), (4, 5), (1, 6), (1, 7)]
    pairs = _pairs(spark, edges)
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()
    }
    pairs.createOrReplaceTempView("pairs_tri_test")
    naive = spark.sql(
        """
        WITH tri AS (
          SELECT e1.doc_a x, e1.doc_b y, e2.doc_b z
          FROM pairs_tri_test e1
          JOIN pairs_tri_test e2 ON e2.doc_a = e1.doc_b
          JOIN pairs_tri_test e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
        )
        SELECT node, COUNT(*) AS n FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri
        ) GROUP BY node
        """
    )
    want = {r["node"]: r["n"] for r in naive.collect()}
    assert got == want == {1: 2, 2: 1, 3: 1, 4: 1, 5: 1}
