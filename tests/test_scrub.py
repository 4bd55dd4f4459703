"""Scrub operators (PII redaction, repetition profile) and the Bloom
incremental-dedup split."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    bloom_bitmap,
    bloom_might_contain,
    incremental_dedup,
)
from etl_pipeline_candy_store_spark.operators.scrub import (
    redact_pii,
    repetition_profile,
)


def test_redact_pii_global_and_ordered(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@x.com and b@y.org, ip 10.1.2.3, call 555-123-4567"),
            (2, "no pii here"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in redact_pii(df).collect()}
    # both emails replaced (global, not first-match), IP and phone typed
    assert got[1]["clean_text"] == (
        "mail <EMAIL> and <EMAIL>, ip <IP>, call <PHONE>"
    )
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 1, 1)
    assert got[2]["clean_text"] == "no pii here"
    assert got[2]["n_emails"] == 0


def test_redact_email_before_ip(spark):
    # a dotted numeric domain must be swallowed by the EMAIL replacement,
    # never half-matched by the IP pattern afterwards
    df = spark.createDataFrame([(1, "x 1@2.3.4.55.com y")], "id long, text string")
    clean = redact_pii(df).collect()[0]["clean_text"]
    assert clean == "x <EMAIL> y"


def test_repetition_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    assert (got[1]["n_words"], got[1]["n_distinct_words"], got[1]["top_word_count"]) == (4, 2, 3)
    assert (got[2]["n_words"], got[2]["n_distinct_words"], got[2]["top_word_count"]) == (4, 4, 1)


def _corpus_batch(spark):
    corpus = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    # batch: 300 dups (keys k0..k299) + 700 new (n2000..n2699)
    batch = spark.range(0, 1000).select(
        F.when(F.col("id") < 300, F.concat(F.lit("k"), F.col("id")))
        .otherwise(F.concat(F.lit("n"), F.col("id") + 2000))
        .alias("key"),
        F.col("id").alias("row_id"),
    )
    return corpus, batch


def test_bloom_no_false_negatives(spark):
    corpus, batch = _corpus_batch(spark)
    bitmap = bloom_bitmap(corpus, "key", m_bits=1 << 14)
    flagged = corpus.filter(bloom_might_contain("key", bitmap)).count()
    assert flagged == 2000  # every member must test positive
    # and the filter is discriminative: most non-members test negative
    negatives = batch.filter(
        F.col("key").startswith("n") & ~bloom_might_contain("key", bitmap)
    ).count()
    assert negatives > 600


def test_incremental_dedup_matches_anti_join(spark):
    corpus, batch = _corpus_batch(spark)
    got = incremental_dedup(batch, corpus, "key")
    want = batch.join(corpus, "key", "left_anti")
    assert got.count() == 700
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_incremental_dedup_never_shuffles_corpus(spark):
    """The point of the bloom split: the exact check is a broadcast
    probe, so no sort-merge/shuffle-hash join (i.e. no corpus shuffle)
    appears anywhere in the physical plan."""
    corpus, batch = _corpus_batch(spark)
    plan = (
        incremental_dedup(batch, corpus, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
