"""The quadratic recall baselines (q61, q96) must refuse
production-scale input with an error naming the bounded alternative."""

from __future__ import annotations

import pytest

from etl_pipeline_candy_store_spark.operators.guards import (
    ALL_PAIRS_MAX_ROWS,
    AllPairsGuardError,
    guard_all_pairs,
)


def test_guard_passes_small_input(spark):
    df = spark.range(100).toDF("vec_id")
    guard_all_pairs(df, "test", "alt")  # no raise


def test_guard_raises_above_cap(spark):
    df = spark.range(ALL_PAIRS_MAX_ROWS + 1).toDF("vec_id")
    with pytest.raises(AllPairsGuardError, match="use the_scale_path"):
        guard_all_pairs(df, "test_op", "the_scale_path")


def test_q61_and_q96_still_run_at_test_scale(spark):
    # the guard must not break the baselines at oracle-check scale
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    sf = "/root/testdata/sf0.001"
    assert catalog.REGISTRY["q61_embedding_neardup"].builder(spark, sf).count() > 0
    assert catalog.REGISTRY["q96_sparse_cosine_pairs"].builder(spark, sf).count() > 0
