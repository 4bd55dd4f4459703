"""PageRank (operators/graph.py) and AUC evaluation (operators/
evaluate.py): hand-computed integer trajectories and known-answer AUCs,
plus the plan contract that the AUC prefix sum never serializes the
score distribution through one task."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.evaluate import binary_auc
from etl_pipeline_candy_store_spark.operators.graph import pagerank


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_pagerank_path_graph_hand_computed(spark):
    # path 1-2-3, symmetrized. deg: 1:1, 2:2, 3:1. pr0 = 1_000_000.
    # iter1: c = pr div deg -> (1e6, 5e5, 1e6)
    #   node1 <- c(2)=500000        -> 150000 + 850*500000 div 1000  =  575000
    #   node2 <- c(1)+c(3)=2000000  -> 150000 + 850*2000000 div 1000 = 1850000
    # iter2: c = (575000, 925000, 575000)
    #   node1 <- 925000             -> 150000 + 786250 = 936250
    #   node2 <- 575000*2=1150000   -> 150000 + 977500 = 1127500
    out = {
        r["node"]: (r["degree"], r["pr_micros"])
        for r in pagerank(_edges(spark, [(1, 2), (2, 3)]), n_iter=2).collect()
    }
    assert out == {1: (1, 936250), 2: (2, 1127500), 3: (1, 936250)}


def test_pagerank_regular_graph_fixed_point(spark):
    # triangle: every node deg 2, contribution 500000 each, mass exactly
    # 1_000_000 -> pr stays 1_000_000 at every iteration (the uniform
    # distribution is the fixed point on a regular graph, and the
    # integer arithmetic hits it exactly)
    out = pagerank(
        _edges(spark, [(1, 2), (2, 3), (3, 1)]), n_iter=3
    ).collect()
    assert {r["pr_micros"] for r in out} == {1_000_000}
    assert {r["degree"] for r in out} == {2}


def test_binary_auc_hand_computed_with_tie(spark):
    # scores: pos at 3, pos at 2, neg at 2, neg at 1 -> P=N=2
    # pairs: (3,2)+, (3,1)+, (2,2) tie, (2,1)+ -> AUC = 3.5/4 = 0.875
    df = spark.createDataFrame(
        [(3, 1), (2, 1), (2, 0), (1, 0)], "score long, y int"
    )
    row = binary_auc(df).collect()[0]
    assert (row["n_pos"], row["n_neg"], row["n_scores"]) == (2, 2, 3)
    assert row["auc_ppm"] == 875_000


def test_binary_auc_perfect_and_inverted(spark):
    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "score long, y int"
    )
    assert binary_auc(perfect).collect()[0]["auc_ppm"] == 1_000_000
    inverted = spark.createDataFrame(
        [(10, 0), (9, 0), (2, 1), (1, 1)], "score long, y int"
    )
    assert binary_auc(inverted).collect()[0]["auc_ppm"] == 0


def test_binary_auc_negative_scores_cross_bucket(spark):
    # exercise the two-level prefix sum across the div-truncation
    # boundary at 0: bucketing must stay order-preserving for negatives
    df = spark.createDataFrame(
        [(-70000, 0), (-1, 0), (0, 1), (70000, 1)], "score long, y int"
    )
    assert binary_auc(df).collect()[0]["auc_ppm"] == 1_000_000


def test_binary_auc_single_class_is_null(spark):
    df = spark.createDataFrame([(3, 1), (1, 1)], "score long, y int")
    row = binary_auc(df).collect()[0]
    assert row["auc_ppm"] is None  # NULLIF guard, matches oracle


def test_auc_no_global_score_window(spark):
    # the only unpartitioned window runs over per-bucket totals (spec
    # starts with bkt); a window ordered directly by score would pull
    # the whole score distribution through one task
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    df = catalog.REGISTRY["q137_probe_auc"].builder(
        spark, "/root/testdata/sf0.001"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "windowspecdefinition(score" not in plan, plan
    assert "windowspecdefinition(bkt" in plan


def _py_pagerank(edges, n_iter):
    deg, adj = {}, {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        adj.setdefault(d, []).append(s)
    pr = {n: 1_000_000 for n in deg}
    for _ in range(n_iter):
        c = {n: pr[n] // deg[n] for n in deg}
        pr = {
            n: 150_000 + (850 * sum(c[s] for s in srcs)) // 1000
            for n, srcs in adj.items()
        }
    return {n: (deg[n], pr[n]) for n in deg}


def test_pagerank_matches_python_reference_random_graphs(spark):
    import random

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        nodes = list(range(1, 13))
        pairs = set()
        while len(pairs) < 14:
            a, b = rng.sample(nodes, 2)
            pairs.add((min(a, b), max(a, b)))
        sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        got = {
            r["node"]: (r["degree"], r["pr_micros"])
            for r in pagerank(
                spark.createDataFrame(sym, "src long, dst long"), n_iter=3
            ).collect()
        }
        assert got == _py_pagerank(sym, 3), f"seed {seed}"


def _py_auc(rows):
    pos = sorted(s for s, y in rows if y == 1)
    neg = sorted(s for s, y in rows if y == 0)
    if not pos or not neg:
        return None
    num = 0
    for p in pos:
        num += 2 * sum(1 for n in neg if n < p) + sum(1 for n in neg if n == p)
    return (num * 1_000_000) // (2 * len(pos) * len(neg))


def test_binary_auc_matches_python_reference_random_scores(spark):
    import random

    for seed in (3, 17, 42):
        rng = random.Random(seed)
        # heavy ties + negatives + cross-bucket magnitudes
        rows = [
            (rng.choice([-200_000, -3, -1, 0, 1, 4, 70_000, 200_000]),
             rng.randint(0, 1))
            for _ in range(60)
        ]
        got = binary_auc(
            spark.createDataFrame(rows, "score long, y int")
        ).collect()[0]["auc_ppm"]
        assert got == _py_auc(rows), f"seed {seed}"


def test_pagerank_midloop_checkpoint_branch_identical(spark):
    # n_iter > checkpoint_every exercises the lineage-cut branch; the
    # trajectory must be identical to the unchecked plan and to the
    # python reference
    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 4), (4, 1)]
    df = spark.createDataFrame(sym, "src long, dst long")
    a = {
        r["node"]: (r["degree"], r["pr_micros"])
        for r in pagerank(df, n_iter=9, checkpoint_every=4).collect()
    }
    b = {
        r["node"]: (r["degree"], r["pr_micros"])
        for r in pagerank(df, n_iter=9, checkpoint_every=100).collect()
    }
    assert a == b == _py_pagerank(sym, 9)
