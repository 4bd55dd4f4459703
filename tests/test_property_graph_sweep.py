"""Property-based equivalence (hypothesis) for the round-9 operators:
skyline, interval sweep-line, bounded reachability, and triangle
counts each checked against a transparent pure-Python oracle on
randomized small inputs — the same oracle-per-operator strategy the
allocation family uses (SURVEY §5)."""

from __future__ import annotations

import datetime
import itertools

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from etl_pipeline_candy_store_spark.operators.graph import (
    _symmetrize,
    khop_reachability,
    triangle_counts,
)
from etl_pipeline_candy_store_spark.operators.skyline import skyline2d
from etl_pipeline_candy_store_spark.operators.sweepline import (
    interval_concurrency,
)

_points = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
)


@given(pts=_points)
@settings(max_examples=8, deadline=None)
@pytest.mark.slow
def test_property_skyline_matches_naive(spark, pts):
    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y int")
    got = {r["id"] for r in skyline2d(df, "x", "y", n_buckets=4).collect()}
    want = {
        i
        for i, x, y in rows
        if not any(
            ox <= x and oy <= y and (ox < x or oy < y)
            for j, ox, oy in rows
            if j != i
        )
    }
    assert got == want


_intervals = st.lists(
    st.tuples(st.integers(1, 20), st.integers(0, 6)), min_size=1, max_size=25
)


@given(iv=_intervals)
@settings(max_examples=8, deadline=None)
def test_property_sweepline_matches_naive(spark, iv):
    spans = [(s, s + d) for s, d in iv]
    df = spark.createDataFrame(
        [
            (datetime.date(2024, 1, 1) + datetime.timedelta(days=s),
             datetime.date(2024, 1, 1) + datetime.timedelta(days=e))
            for s, e in spans
        ],
        "s date, e date",
    )
    got = {
        (r["d"] - datetime.date(2024, 1, 1)).days: r["open_count"]
        for r in interval_concurrency(df, "s", "e").collect()
    }
    # naive: for every day the sweep emits, count covering intervals
    for day, n in got.items():
        assert n == sum(1 for s, e in spans if s <= day <= e)
    # and the global max must be found on some emitted day
    lo, hi = min(s for s, _ in spans), max(e for _, e in spans)
    peak = max(
        sum(1 for s, e in spans if s <= d <= e) for d in range(lo, hi + 1)
    )
    assert max(got.values()) == peak


_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=18,
)


def _pairs_df(spark, edges):
    uniq = sorted({(min(a, b), max(a, b)) for a, b in edges})
    return spark.createDataFrame(uniq, "doc_a long, doc_b long"), uniq


@given(edges=_edges)
@settings(max_examples=5, deadline=None)
@pytest.mark.slow
def test_property_khop_matches_python_bfs(spark, edges):
    pairs, uniq = _pairs_df(spark, edges)
    adj: dict[int, set[int]] = {}
    for a, b in uniq:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for n in adj:
        seen, frontier = {n}, {n}
        for _ in range(3):
            frontier = {m for f in frontier for m in adj[f]} - seen
            seen |= frontier
        want[n] = len(seen - {n})
    got = {
        r["node"]: r["n_reached"]
        for r in khop_reachability(_symmetrize(pairs), k=3).collect()
    }
    assert got == want


@given(edges=_edges)
@settings(max_examples=5, deadline=None)
def test_property_triangles_match_python_enumeration(spark, edges):
    pairs, uniq = _pairs_df(spark, edges)
    eset = set(uniq)
    nodes = sorted({n for e in uniq for n in e})
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()
    }
    assert got == want
