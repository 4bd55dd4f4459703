"""Round-9 retrieval-composition + governance operators: RRF hybrid
fusion (q193), forget propagation (q194), MMR diversification (q195),
largest-remainder apportionment (q196). Correctness is oracle-gated in
CI (tools/check_oracle.py); here we lock the SEMANTIC invariants each
operator exists for (the properties a hash match alone wouldn't name)
plus the scale-posture plan contracts."""

from __future__ import annotations

import pytest

import io
import contextlib

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


# ---------------------------------------------------------------- q193


def test_rrf_fusion_semantics(spark):
    rows = {r["doc_id"]: r for r in _run(spark, "q193_hybrid_retrieval_rrf").collect()}
    assert len(rows) == 20
    for r in rows.values():
        # rank 0 is the "absent from this list" sentinel; a doc absent
        # from BOTH lists can't be in the fused slate at all
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
        expect = 0
        if r["lex_rank"]:
            expect += 1000000 // (60 + r["lex_rank"])
        if r["vec_rank"]:
            expect += 1000000 // (60 + r["vec_rank"])
        assert r["rrf_micros"] == expect
    # docs present in both lists must outscore a same-rank single-list
    # doc — the whole point of fusion
    fused_ranks = [r["fused_rank"] for r in rows.values()]
    assert sorted(fused_ranks) == list(range(1, 21))


def test_rrf_plan_topk_not_global_sort(spark):
    # both candidate lists must plan as TakeOrderedAndProject
    # (distributed partial top-K), never a global Sort of the corpus
    plan = _plan(spark, "q193_hybrid_retrieval_rrf")
    assert plan.count("TakeOrderedAndProject") >= 2, plan


# ---------------------------------------------------------------- q194


def test_forget_propagation_closure(spark):
    from etl_pipeline_candy_store_spark.operators.scrub import (
        _FORGET_H256,
        _forget_h256,
    )

    d = catalog.load(spark, SF, "documents").select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        (_forget_h256() < _FORGET_H256).cast("int").alias("is_del"),
    )
    pdf = d.toPandas()
    del_digests = set(pdf[pdf.is_del == 1].digest)
    survivors = pdf[pdf.is_del == 0]
    expected_residual = int(survivors.digest.isin(del_digests).sum())

    audit = _run(spark, "q194_forget_propagation").toPandas()
    assert int(audit.n_requested.sum()) == int(pdf.is_del.sum())
    assert int(audit.n_residual.sum()) == expected_residual
    # totals conserve the corpus
    assert int(
        audit.n_requested.sum() + audit.n_residual.sum() + audit.n_clean.sum()
    ) == len(pdf)
    # after purging requested + residual, NO surviving doc shares a
    # digest with any deleted doc — the closure property the op exists for
    clean = survivors[~survivors.digest.isin(del_digests)]
    assert not set(clean.digest) & del_digests


def test_forget_probe_is_broadcast(spark):
    # the deletion-digest list is request-sized: the survivor probe must
    # broadcast it, never shuffle the corpus on digest
    plan = _plan(spark, "q194_forget_propagation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- q195


def _py_mmr(cands, sims, k):
    """Reference MMR (λ=1/2, scores pre-scaled ×2): greedy argmax of
    rel − max-sim-to-selected with cand_id tie-break."""
    picks = []
    remaining = dict(cands)  # cand_id -> rel
    while remaining and len(picks) < k:
        best = None
        for c, rel in remaining.items():
            if picks:
                mmr = rel - max(sims[(c, s)] for s, _ in picks)
            else:
                mmr = rel
            key = (-mmr, c)
            if best is None or key < best[0]:
                best = (key, c, mmr)
        _, c, mmr = best
        picks.append((c, mmr))
        del remaining[c]
    return picks


@pytest.mark.slow
def test_mmr_matches_reference_greedy(spark):
    out = _run(spark, "q195_mmr_diversify").toPandas()
    from etl_pipeline_candy_store_spark.operators.retrieval import (
        _MMR_CANDS,
        _MMR_PICKS,
        _MMR_QUERIES,
    )
    from etl_pipeline_candy_store_spark.operators.similarity import (
        _cos_micros,
        _dot,
        with_norm,
    )
    from pyspark.sql.window import Window

    e = with_norm(catalog.load(spark, SF, "embeddings"))
    q = e.filter(F.col("vec_id") < _MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
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
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel_micros").desc(), F.col("cand_id")
    )
    cand = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_CANDS)
        .toPandas()
    )
    a = cand.rename(columns={"cand_id": "ca"})
    for qid, grp in cand.groupby("query_id"):
        rels = dict(zip(grp.cand_id, grp.rel_micros))
        embs = dict(zip(grp.cand_id, zip(grp.embedding, grp.nrm)))
        import math

        sims = {}
        for c1, (e1, n1) in embs.items():
            for c2, (e2, n2) in embs.items():
                if c1 != c2:
                    dot = sum(float(x) * float(y) for x, y in zip(e1, e2))
                    sims[(c1, c2)] = math.floor(dot / (n1 * n2) * 1000000.0)
        expect = _py_mmr(rels, sims, 3)
        got = out[out.query_id == qid].sort_values("pick_order")
        assert list(got.cand_id) == [c for c, _ in expect], qid
        assert list(got.mmr_micros) == [m for _, m in expect], qid
    del a


def test_mmr_diversifies_vs_pure_relevance(spark):
    # MMR must not simply return the relevance top-3 for every query —
    # at least one query's slate must differ (otherwise λ did nothing
    # and the operator is vacuous on this corpus)
    out = _run(spark, "q195_mmr_diversify").toPandas()
    diverged = 0
    for qid, grp in out.groupby("query_id"):
        grp = grp.sort_values("pick_order")
        rel_order = grp.sort_values(
            ["rel_micros", "cand_id"], ascending=[False, True]
        )
        if list(grp.cand_id) != list(rel_order.cand_id)[:3]:
            diverged += 1
    assert diverged >= 1


# ---------------------------------------------------------------- q196


def test_apportionment_exact_budget_and_quota_bounds(spark):
    out = _run(spark, "q196_sample_apportionment").toPandas()
    assert int(out.alloc.sum()) == 100
    assert (out.extra.isin([0, 1])).all()
    # Hare-quota property: every alloc is floor or ceil of the exact
    # proportional share
    total = int(out.chars.sum())
    for r in out.itertuples():
        lo = (100 * int(r.chars)) // total
        assert r.alloc in (lo, lo + 1)


# ---------------------------------------------------------------- q197


def test_padding_waste_identity(spark):
    out = _run(spark, "q197_padding_waste").toPandas()
    # bins are powers of two (or the overflow bin) and padding is
    # non-negative and strictly less than n_docs * bin/2 slack would
    # allow only if binning picked the SMALLEST covering bin
    from etl_pipeline_candy_store_spark.operators.curation import _PAD_BINS

    allowed = set(_PAD_BINS) | {2 * _PAD_BINS[-1]}
    assert set(out.bin_len) <= allowed
    assert (out.n_padding >= 0).all()
    assert (out.n_padding == out.bin_len * out.n_docs - out.n_tokens).all()
    # smallest-covering-bin: average doc length in bin b must exceed
    # the next bin down (else those docs belonged there)
    for r in out.itertuples():
        if r.bin_len > _PAD_BINS[0]:
            prev = max(b for b in _PAD_BINS if b < r.bin_len)
            assert r.n_tokens > prev * (r.n_docs - 1), r


def test_padding_waste_no_joins_single_agg(spark):
    plan = _plan(spark, "q197_padding_waste")
    assert "Join" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------- q198


@pytest.mark.slow
def test_retrieval_metrics_bounds_and_truth(spark):
    out = _run(spark, "q198_retrieval_metrics").toPandas()
    assert len(out) == 5
    assert ((out.recall_micros >= 0) & (out.recall_micros <= 1000000)).all()
    assert ((out.mrr_micros >= 0) & (out.mrr_micros <= 1000000)).all()
    # a query with zero retrieved must have zero recall and mrr
    empty = out[out.n_retrieved == 0]
    assert (empty.recall_micros == 0).all() and (empty.mrr_micros == 0).all()
    # MRR can only be nonzero if recall is nonzero and vice versa
    assert ((out.mrr_micros > 0) == (out.recall_micros > 0)).all()
