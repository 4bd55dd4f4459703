"""unigram_train: hard-EM to convergence (q219) — fixpoint discipline,
per-iteration log-likelihood non-decrease, size-targeted pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.unigram import (
    _dp_with_scores,
    _segmentable,
    _word_table,
    unigram_train,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_em_converges_to_fixpoint(spark):
    docs = _docs(spark)
    scored, traj = unigram_train(docs, max_iters=10)
    n = len(traj)
    # true fixpoint: running one MORE forced iteration reproduces the
    # last recorded stats exactly — the extra E/M cycle is an identity
    _, traj2 = unigram_train(docs, exact_iters=n + 1)
    assert traj2[:n] == traj
    a, b = traj2[-2], traj2[-1]
    assert (a["n_vocab"], a["ll_bits"], a["n_pieces"], a["n_seg_words"]) == (
        b["n_vocab"],
        b["ll_bits"],
        b["n_pieces"],
        b["n_seg_words"],
    )


def test_ll_nondecreasing_per_iteration(spark):
    """The generalized q212 invariant: in pure-EM mode corpus ll_bits
    never decreases across iterations, and no word ever becomes
    unsegmentable (its own pieces were just counted)."""
    _, traj = unigram_train(_docs(spark), exact_iters=4)
    assert len(traj) == 4
    for prev, cur in zip(traj, traj[1:]):
        assert cur["ll_bits"] >= prev["ll_bits"]
        assert cur["n_seg_words"] == prev["n_seg_words"]


def test_max_iters_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        unigram_train(_docs(spark), max_iters=1)


def test_target_vocab_prunes_to_size(spark):
    docs = _docs(spark)
    scored, traj = unigram_train(docs, target_vocab=20, max_iters=10)
    assert scored.count() <= 20
    # the shrink schedule is monotone
    sizes = [t["n_vocab"] for t in traj]
    assert sizes == sorted(sizes, reverse=True)
    # forced pruning may drop words, never resurrect them
    segw = [t["n_seg_words"] for t in traj]
    assert segw == sorted(segw, reverse=True)
    # whatever survives still segments a real fraction of the corpus
    # (48% here with 20 pieces; the bound just guards total collapse)
    words = _word_table(docs)
    seg = _segmentable(_dp_with_scores(words, scored))
    n_seg = seg.agg(F.sum("n")).collect()[0][0] or 0
    n_all = words.agg(F.sum("n")).collect()[0][0]
    assert n_seg * 4 > n_all


def test_trajectory_matches_composed_queries(spark):
    """Iterations 1 and 2 of the trainer must reproduce q206's and
    q212's corpus aggregates — the loop IS the composition, not a
    parallel implementation."""
    from etl_pipeline_candy_store_spark.operators.unigram import (
        unigram_encode_docs,
        unigram_encode_docs_em2,
    )

    docs = _docs(spark)
    _, traj = unigram_train(docs, exact_iters=2)

    def corpus_stats(df):
        r = df.agg(
            F.sum("n_words").cast("long").alias("w"),
            F.sum("n_pieces").cast("long").alias("p"),
            F.sum("ll_bits").cast("long").alias("l"),
        ).collect()[0]
        return (r["w"], r["p"], r["l"])

    assert corpus_stats(unigram_encode_docs(docs)) == (
        traj[0]["n_seg_words"],
        traj[0]["n_pieces"],
        traj[0]["ll_bits"],
    )
    assert corpus_stats(unigram_encode_docs_em2(docs)) == (
        traj[1]["n_seg_words"],
        traj[1]["n_pieces"],
        traj[1]["ll_bits"],
    )
