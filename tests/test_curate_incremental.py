"""Stateful (incremental) near-dup inside curate(): the funnel must be
hash-equal to the stateless mode on first run, replay, and growth, and
the stateful path must correctly ignore stale state (changed content,
shrunk corpus)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import jaccard_pairs
from etl_pipeline_candy_store_spark.operators.neardup_state import (
    applied_runs,
    compact_neardup_state,
    neardup_pairs_incremental,
)
from etl_pipeline_candy_store_spark.plans.curation_pipeline import (


    curate,
    dedup_exact,
)

SF = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
        for r in df.collect()
    }


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_incremental_equals_stateless_first_run_and_replay(spark, tmp_path):
    state = str(tmp_path / "state")
    d1 = dedup_exact(_docs(spark))
    want = _pairs_set(jaccard_pairs(d1))

    got0 = _pairs_set(neardup_pairs_incremental(d1, state))
    assert got0 == want
    assert applied_runs(spark, state) == [0]

    # replay: everything matched — nothing recomputed, no new run at all
    got1 = _pairs_set(neardup_pairs_incremental(d1, state))
    assert got1 == want
    assert applied_runs(spark, state) == [0]


def test_incremental_equals_stateless_on_growth(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = _docs(spark)
    # build state from the prior slice; delta doc_ids are LOWER for some
    # digests, so growth also exercises keeper churn at exact-dedup
    prior = dedup_exact(docs.filter(F.col("doc_id") % 7 != 0))
    neardup_pairs_incremental(prior, state).count()

    d1_full = dedup_exact(docs)
    got = _pairs_set(neardup_pairs_incremental(d1_full, state))
    assert got == _pairs_set(jaccard_pairs(d1_full))


def test_incremental_ignores_stale_state_on_changed_content(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = _docs(spark).localCheckpoint(eager=True)
    neardup_pairs_incremental(dedup_exact(docs), state).count()

    # rewrite one doc's content in place (same doc_id, new digest):
    # the old generation's shingles/pairs in state must not verify
    victim = docs.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    changed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim, F.concat(F.lit("xx yy zz "), "text")
        ).otherwise(F.col("text")),
    )
    d1 = dedup_exact(changed)
    want = _pairs_set(jaccard_pairs(d1))
    assert _pairs_set(neardup_pairs_incremental(d1, state)) == want
    # the new generation is now in state ALONGSIDE the stale one; the
    # generation-stamped pair filter must keep the old pairs dead
    assert (
        _pairs_set(neardup_pairs_incremental(d1, state, update_state=False))
        == want
    )


def test_incremental_ignores_removed_docs(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = _docs(spark)
    neardup_pairs_incremental(dedup_exact(docs), state).count()

    shrunk = dedup_exact(docs.filter(F.col("doc_id") % 3 != 0))
    got = _pairs_set(
        neardup_pairs_incremental(shrunk, state, update_state=False)
    )
    assert got == _pairs_set(jaccard_pairs(shrunk))


def test_curate_stateful_funnel_equals_stateless(spark, tmp_path):
    r_plain = curate(spark, SF, str(tmp_path / "a"), n_shards=2)
    state = str(tmp_path / "state")
    r_s1 = curate(
        spark, SF, str(tmp_path / "b"), n_shards=2, corpus_state_dir=state
    )
    assert r_s1["funnel"] == r_plain["funnel"]
    assert r_s1["governance"] == r_plain["governance"]
    assert {k: v["n_docs"] for k, v in r_s1["splits"].items()} == {
        k: v["n_docs"] for k, v in r_plain["splits"].items()
    }
    # shard manifests are content-addressed -> stateless/stateful exports
    # are byte-identical, not just count-identical (path differs by dir)
    def _m(r):
        return {
            k: {mk: mv for mk, mv in v["manifest"].items() if mk != "path"}
            for k, v in r["splits"].items()
        }

    assert _m(r_s1) == _m(r_plain)

    # replayed corpus: identical report again, near-dedup now state-fed
    r_s2 = curate(
        spark, SF, str(tmp_path / "c"), n_shards=2, corpus_state_dir=state
    )
    assert r_s2["funnel"] == r_plain["funnel"]
    assert r_s2["governance"] == r_plain["governance"]


def test_compact_neardup_state(spark, tmp_path):
    state = str(tmp_path / "state")
    docs = _docs(spark).localCheckpoint(eager=True)
    d1 = dedup_exact(docs)
    neardup_pairs_incremental(d1, state).count()
    neardup_pairs_incremental(d1, state).count()  # appends an empty run

    victim = docs.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    changed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim, F.concat(F.lit("aa bb cc "), "text")
        ).otherwise(F.col("text")),
    ).localCheckpoint(eager=True)
    d1c = dedup_exact(changed)
    neardup_pairs_incremental(d1c, state).count()  # stale gen accumulates

    stats = compact_neardup_state(spark, state, current=changed)
    assert stats["runs_after"] == 1
    # exactly one generation per doc survives compaction
    pd = spark.read.parquet(f"{state}/per_doc")
    assert pd.count() == pd.select("doc_id").distinct().count()
    # and the compacted state still answers exactly
    got = _pairs_set(
        neardup_pairs_incremental(d1c, state, update_state=False)
    )
    assert got == _pairs_set(jaccard_pairs(d1c))


def test_forget_physically_purges_state(spark, tmp_path):
    """RTBF against the persistent near-dup state: after the corpus
    drops a doc and the state is purged, NO state relation contains the
    forgotten doc — postings, per-doc index, pairs, AND the dictionary
    (a forgotten doc's unique shingle strings ARE its text) — verified
    by reading the raw parquet dirs; and the stateful path still
    answers exactly for the surviving corpus."""
    import os

    from etl_pipeline_candy_store_spark.operators.dedup import _shingles
    from etl_pipeline_candy_store_spark.operators.neardup_state import (
        forget_from_neardup_state,
    )

    state = str(tmp_path / "state")
    docs = _docs(spark).localCheckpoint(eager=True)
    d1 = dedup_exact(docs)
    neardup_pairs_incremental(d1, state).count()

    # pick a doc that participates in at least one stored pair (so the
    # purge has to scrub the pairs relation too) AND owns at least one
    # shingle no other doc has (so the dictionary-purge check below has
    # teeth — a near-dup twin can share every shingle)
    sh_all = _shingles(docs.select("doc_id", "text")).localCheckpoint(
        eager=True
    )
    unique_owners = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("c"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("c") == 1)
        .select("doc_id")
        .distinct()
    )
    endpoints = spark.read.parquet(f"{state}/pairs").select(
        F.col("doc_a").alias("doc_id")
    )
    victim = (
        endpoints.join(unique_owners, "doc_id", "left_semi")
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]["doc_id"]
    )
    kept = docs.filter(F.col("doc_id") != victim).localCheckpoint(eager=True)

    forget_from_neardup_state(spark, state, current=kept)

    for kind, cols in (
        ("per_doc", ["doc_id"]),
        ("postings_b", ["doc_id"]),
        ("pairs", ["doc_a", "doc_b"]),
    ):
        df = spark.read.parquet(f"{state}/{kind}")
        for c in cols:
            assert df.filter(F.col(c) == victim).count() == 0, (kind, c)
    # digest purge: shingle digests that existed ONLY in the victim must
    # be gone from the postings (shared digests legitimately survive via
    # other docs) — the state stores only 16-byte digests, never
    # text-derived strings, but a digest of a person's data is still
    # linkable state
    from etl_pipeline_candy_store_spark.operators.neardup_state import (
        _sh_digest,
    )

    victim_only = (
        sh_all.filter(F.col("doc_id") == victim)
        .select(_sh_digest().alias("sh"))
        .join(
            sh_all.filter(F.col("doc_id") != victim).select(
                _sh_digest().alias("sh")
            ),
            "sh",
            "left_anti",
        )
    )
    assert victim_only.count() > 0  # precondition: the check has teeth
    post_df = spark.read.parquet(f"{state}/postings_b")
    assert post_df.join(victim_only, "sh", "left_semi").count() == 0
    # physical: exactly one run dir remains on disk per relation (the
    # compacted postings live under the bucketed postings_b path; the
    # pre-compaction plain postings run dirs are deleted)
    for kind in ("per_doc", "pairs", "postings_b"):
        runs = [
            d
            for d in os.listdir(f"{state}/{kind}")
            if d.startswith("run=")
        ]
        assert len(runs) == 1, (kind, runs)
    runs = [
        d for d in os.listdir(f"{state}/postings") if d.startswith("run=")
    ]
    assert runs == [], runs

    d1_kept = dedup_exact(kept)
    got = _pairs_set(
        neardup_pairs_incremental(d1_kept, state, update_state=False)
    )
    assert got == _pairs_set(jaccard_pairs(d1_kept))


def test_compaction_keeps_reverted_generation(spark, tmp_path):
    """A doc changed B and later reverted to A has gen A in an EARLY run
    and gen B in a later one; compaction against the reverted corpus
    must keep gen A (the live one), not the newer superseded B — and
    the state must answer without re-paying the doc."""
    state = str(tmp_path / "state")
    docs = _docs(spark).localCheckpoint(eager=True)
    victim = docs.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
    changed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim, F.concat(F.lit("bb cc dd "), "text")
        ).otherwise(F.col("text")),
    ).localCheckpoint(eager=True)

    neardup_pairs_incremental(dedup_exact(docs), state).count()  # gen A
    neardup_pairs_incremental(dedup_exact(changed), state).count()  # gen B
    # revert: corpus is back to gen A (already matched in state — no run)
    compact_neardup_state(spark, state, current=docs)

    pd = spark.read.parquet(f"{state}/per_doc")
    assert pd.filter(F.col("doc_id") == victim).count() == 1
    d1 = dedup_exact(docs)
    got = _pairs_set(
        neardup_pairs_incremental(d1, state, update_state=False)
    )
    assert got == _pairs_set(jaccard_pairs(d1))
    # ...and 'no re-pay': the post-compaction run sees everything matched
    neardup_pairs_incremental(d1, state).count()
    runs = applied_runs(spark, state)
    assert len(runs) == 1  # replay appended nothing after the compact run


def test_compacted_state_probe_zero_state_side_exchange(spark, tmp_path):
    """The compacted encoded state is HASH-BUCKETED (postings on sh_id,
    dict on shingle) so the probe's two state-side joins plan with NO
    Exchange on the state side even on the shuffle-fallback path (the
    one that matters when the batch exceeds the broadcast cap): the
    only shuffle in the join tree is on the batch-derived probe
    relation. Locked like tests/test_bucketed_allocation.py — the scan
    must be GENUINELY bucketed, not merely exchange-free."""
    import contextlib
    import io

    from etl_pipeline_candy_store_spark.operators.neardup_state import (
        _read_postings,
        _sh_digest,
    )

    state = str(tmp_path / "state")
    d1 = dedup_exact(_docs(spark))
    neardup_pairs_incremental(d1, state).count()
    compact_neardup_state(spark, state)
    runs = applied_runs(spark, state)
    assert len(runs) == 1

    post_st = _read_postings(spark, state, runs)
    probe = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_new bigint, shingle string"
    ).select("doc_new", _sh_digest().alias("sh"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = post_st.join(probe, "sh")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    # the postings scan reads bucketed
    assert plan.count("Bucketed: true") == 1, plan
    # exactly one exchange: the probe into the postings join — the
    # corpus-sized state never moves ("Exchange (" counts tree nodes;
    # formatted output repeats each node once more in its detail
    # section)
    assert plan.count("Exchange (") == 1, plan
    # ...and the correctness of this exact plan shape: the probe join
    # still answers right with broadcasts force-disabled
    assert joined.count() >= 0
