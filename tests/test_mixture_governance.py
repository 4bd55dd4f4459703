"""Round-9 fourth batch: semantic decontamination (q199),
temperature-scaled mixture weights (q200), license clearance through
near-dup clusters (q201). Correctness is oracle-gated in CI
(tools/check_oracle.py); here we lock the SEMANTIC invariants each
operator exists for plus the scale-posture plan contracts."""

from __future__ import annotations

import contextlib
import io
import math

import numpy as np
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def _run(spark, name: str):
    catalog._ensure_loaded()
    return catalog.REGISTRY[name].builder(spark, SF)


def _plan(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _run(spark, name).explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- q199


def test_semantic_decon_matches_numpy(spark):
    from etl_pipeline_candy_store_spark.operators.curation import (
        _SEM_PANEL,
        _SEM_TAU,
    )

    pdf = catalog.load(spark, SF, "embeddings").toPandas()
    mat = np.array([np.array(e, dtype=np.float64) for e in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    nrm = np.sqrt((mat * mat).sum(axis=1))
    panel = ids < _SEM_PANEL
    cos = (mat[~panel] @ mat[panel].T) / np.outer(nrm[~panel], nrm[panel])
    micros = np.floor(cos * 1e6).astype(np.int64)
    hits = micros >= _SEM_TAU
    expect = {
        int(v): (int(h.sum()), int(m[h].max()))
        for v, h, m in zip(ids[~panel], hits, micros)
        if h.any()
    }

    got = {
        r["vec_id"]: (r["n_eval_hits"], r["max_cos_micros"])
        for r in _run(spark, "q199_semantic_decontamination").collect()
    }
    assert got == expect
    assert got, "threshold must flag at least one doc on this corpus"


def test_semantic_decon_panel_is_broadcast(spark):
    # fixed-size eval panel => broadcast nested-loop against ONE corpus
    # scan; the corpus must never shuffle or self-join
    plan = _plan(spark, "q199_semantic_decontamination")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# ---------------------------------------------------------------- q200


def test_temperature_mixture_math(spark):
    rows = _run(spark, "q200_temperature_mixture").collect()
    docs = catalog.load(spark, SF, "documents").toPandas()
    mass = (
        docs.assign(n=docs.text.str.split(" ").str.len())
        .groupby("source")
        .n.sum()
        .to_dict()
    )
    s_total = 0.0
    for src in sorted(mass):
        s_total += math.sqrt(float(mass[src]))
    m_total = sum(mass.values())
    assert len(rows) == len(mass)
    for r in rows:
        m = mass[r["source"]]
        assert r["n_tokens"] == m
        assert r["weight_ppm"] == math.floor(math.sqrt(m) / s_total * 1e6)
        assert r["natural_ppm"] == m * 1000000 // m_total
        # alpha=0.5 compresses the distribution: below-average-mass
        # sources get boost > 1, above-average get boost < 1
        if r["natural_ppm"] < r["weight_ppm"]:
            assert r["boost_ppm"] >= 1000000
    # weights are a (floor-truncated) distribution
    total_w = sum(r["weight_ppm"] for r in rows)
    assert 1000000 - len(rows) <= total_w <= 1000000


def test_temperature_mixture_single_corpus_agg(spark):
    # ONE corpus scan feeding one map-side-combinable aggregate; the
    # normalizer runs as a window over the 20-row source relation (the
    # documented tiny-relation exemption), never a second corpus pass
    plan = _plan(spark, "q200_temperature_mixture")
    import re

    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    # node-detail headers count each physical node exactly once
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan


# ---------------------------------------------------------------- q201


def test_license_clearance_matches_pandas(spark):
    from etl_pipeline_candy_store_spark.operators.dedup import (
        dedup_clusters_checkpointed,
    )

    labels = dedup_clusters_checkpointed(spark, SF).toPandas()
    docs = catalog.load(spark, SF, "documents").toPandas()[
        ["doc_id", "source"]
    ]
    df = labels.merge(docs, on="doc_id")
    df["lic_rank"] = df.source.str.slice(3).astype(int) % 3
    df["cluster_rank"] = df.groupby("cluster_id").lic_rank.transform("max")
    expect = (
        df.groupby("source")
        .apply(
            lambda g: (
                len(g),
                int((g.lic_rank == 2).sum()),
                int(((g.lic_rank < 2) & (g.cluster_rank == 2)).sum()),
                int((g.cluster_rank < 2).sum()),
            ),
            include_groups=False,
        )
        .to_dict()
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_restricted_own"],
            r["n_blocked_by_copy"],
            r["n_cleared"],
        )
        for r in _run(spark, "q201_license_clearance").collect()
    }
    assert got == expect
    # partition totals: every doc is restricted-own, blocked-by-copy,
    # or cleared — no fourth state
    for src, (n, own, blocked, cleared) in got.items():
        assert own + blocked + cleared == n, src


def test_license_clearance_blocks_copies_of_restricted(spark):
    # build a corpus where a permissive source holds a near-copy of a
    # restricted doc: the copy must be BLOCKED even though its own
    # license clears — the row a per-row license filter wrongly keeps
    from etl_pipeline_candy_store_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(1, 2)], "doc_a long, doc_b long"
    )  # doc 1 (src2, restricted) ~ doc 2 (src0, permissive)
    cc = connected_components_star(pairs, "doc_a", "doc_b").toPandas()
    labels = dict(zip(cc.node, cc.label))
    assert labels[1] == labels[2] == 1
    # doc 2 inherits doc 1's restriction through the shared cluster
    lic = {1: 2, 2: 0, 3: 0}
    cluster = {1: labels[1], 2: labels[2], 3: 3}
    cluster_rank = {}
    for d, c in cluster.items():
        cluster_rank[c] = max(cluster_rank.get(c, 0), lic[d])
    assert cluster_rank[cluster[2]] == 2  # blocked by copy
    assert cluster_rank[cluster[3]] == 0  # untouched singleton clears


def test_license_clearance_one_cluster_exchange(spark):
    # cluster_rank is a cluster_id-partitioned window max — no self-join
    # of the labeled corpus
    plan = _plan(spark, "q201_license_clearance")
    assert "Window" in plan, plan


# ---------------------------------------------------------------- q202


def test_importance_weights_match_python(spark):
    """log2-binned DSIR weights reproduce a pure-Python recomputation
    (add-one smoothing over the joint vocab, clamped floor(log2 r))."""
    from collections import Counter

    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _DSIR_TARGET_MAX_DOC,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in catalog.load(spark, SF, "documents").collect()
    }
    c_t, c_s = Counter(), Counter()
    for d, toks in docs.items():
        (c_t if d < _DSIR_TARGET_MAX_DOC else c_s).update(toks)
    vocab = set(c_t) | set(c_s)
    n_t, n_s, v = sum(c_t.values()), sum(c_s.values()), len(vocab)

    def tok_bin(t):
        a = (c_t[t] + 1) * (n_s + v)
        b = (c_s[t] + 1) * (n_t + v)
        for k in range(4, -5, -1):
            if (a >= b * (1 << k)) if k >= 0 else (a * (1 << -k) >= b):
                return k
        return -5

    expect = {}
    for d, toks in docs.items():
        if d < _DSIR_TARGET_MAX_DOC:
            continue
        expect[d] = (len(toks), sum(tok_bin(t) for t in toks))

    got = {
        r["doc_id"]: (r["n_toks"], r["log2_weight"])
        for r in _run(spark, "q202_importance_weights").collect()
    }
    assert got == expect
    # non-vacuous: weights must actually rank documents (a threshold
    # consumer gets a real ordering, not a constant)
    weights = {w for (_, w) in got.values()}
    assert len(weights) > 1


def test_importance_weights_plan_shape(spark):
    # tf-idf/BM25 shape: explodes + keyed aggs + ONE token equi-join;
    # no windows, no sort-merge self-join of the corpus
    plan = _plan(spark, "q202_importance_weights")
    assert "Window" not in plan, plan


# ------------------------------------------------- property tests


def test_dsir_bin_case_chain_is_clamped_floor_log2():
    """The integer CASE chain must equal clamp(floor(log2(a/b)), -5, 4)
    for ALL positive integer (a, b) — the cross-multiplication form
    exists only to avoid float log drift, not to change the math."""
    import math

    from hypothesis import given, settings, strategies as st

    def case_bin(a: int, b: int) -> int:
        for k in range(4, -5, -1):
            if (a >= b * (1 << k)) if k >= 0 else (a * (1 << -k) >= b):
                return k
        return -5

    @given(
        st.integers(min_value=1, max_value=10**12),
        st.integers(min_value=1, max_value=10**12),
    )
    @settings(max_examples=500, deadline=None)
    def check(a, b):
        # exact floor(log2(a/b)) via integer bit lengths, no floats
        # (a/b >= 2^k  <=>  a >= b<<k), scanned over the clamp range
        exact = -5
        for k in range(-5, 5):
            if (a >= (b << k)) if k >= 0 else ((a << -k) >= b):
                exact = k
        want = max(-5, min(4, exact))
        assert case_bin(a, b) == want, (a, b)
        # sanity vs float log2 where it's numerically trustworthy
        r = a / b
        if 2**-4 * 1.001 < r < 2**4 * 0.999 and abs(
            math.log2(r) - round(math.log2(r))
        ) > 1e-9:
            assert case_bin(a, b) == max(-5, min(4, math.floor(math.log2(r))))

    check()


def test_temperature_weights_properties(spark):
    """Every weight is within 1 ppm-unit of the exact sqrt share
    (floor truncation only), and sqrt smoothing always moves shares
    TOWARD uniform (tail sources boosted, head sources damped)."""
    import math

    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        temperature_weights,
    )

    got = {
        r["source"]: r
        for r in temperature_weights(
            catalog.load(spark, SF, "documents")
        ).collect()
    }
    s_total = 0.0
    for src in sorted(got):
        s_total += math.sqrt(float(got[src]["n_tokens"]))
    for src, r in got.items():
        exact = math.sqrt(r["n_tokens"]) / s_total * 1e6
        assert 0 <= exact - r["weight_ppm"] < 1  # floor within 1 unit
        # sqrt smoothing moves toward uniform: boost >= 1 iff natural
        # share below the source's weight share
        assert (r["boost_ppm"] >= 1000000) == (
            r["natural_ppm"] <= r["weight_ppm"]
        ) or abs(r["natural_ppm"] - r["weight_ppm"]) <= 1


def test_dsir_decimal_staging_survives_overflow(spark):
    """Constructed high-count fixture at the ~3e9-token scale the 100 TB
    target implies: the decimal staging computes the exact ladder bin,
    while the old BIGINT staging provably miscounts (int64 product
    wraps). Guards the q202 overflow envelope with code, not a doc."""
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        importance_bins_from_counts,
    )

    # one stop-word-scale token plus a rare one; totals ~4e9 tokens, so
    # a = (c_t+1)(n_s+vsz) ~ 1.6e19 > int64 max (9.2e18)
    big, small = 4_000_000_000, 5
    v = spark.createDataFrame(
        [("the", big, big), ("rare", small, big)],
        "tok string, c_t bigint, c_s bigint",
    )

    def exact_bin(c_t, c_s, n_t, n_s, vsz):
        a = (c_t + 1) * (n_s + vsz)
        b = (c_s + 1) * (n_t + vsz)
        for k in range(4, -5, -1):
            if a >= (2**k) * b:
                return k
        return -5

    n_t, n_s, vsz = big + small, 2 * big, 2
    want = {
        "the": exact_bin(big, big, n_t, n_s, vsz),
        "rare": exact_bin(small, big, n_t, n_s, vsz),
    }
    got = {
        r["tok"]: r["bin"]
        for r in importance_bins_from_counts(v).collect()
    }
    assert got == want

    # the old BIGINT staging fails at this scale either way: under ANSI
    # (Spark 4 default) the multiply raises ARITHMETIC_OVERFLOW, under
    # ansi=false it wraps silently into wrong bins
    import pyspark.errors

    try:
        wrapped = {
            r["tok"]: r["bin"]
            for r in importance_bins_from_counts(
                v, stage_type="long"
            ).collect()
        }
    except pyspark.errors.exceptions.base.ArithmeticException:
        pass
    else:
        assert wrapped != want, (
            "fixture no longer overflows int64 — raise the counts so the "
            "test keeps proving the decimal staging is load-bearing"
        )
