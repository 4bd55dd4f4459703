"""SQ8 scalar quantization: code arithmetic on a known grid."""

from __future__ import annotations

from etl_pipeline_candy_store_spark.operators.similarity import _sq8_codes


def test_sq8_codes_known_grid(spark):
    e = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 2.0]), (3, [2.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["codes"] for r in _sq8_codes(e).collect()}
    # per-dim ranges [0,2] and [0,4]; midpoints floor to 127
    assert got == {1: [0, 0], 2: [127, 127], 3: [255, 255]}


def test_sq8_constant_dimension_is_zero(spark):
    e = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["codes"] for r in _sq8_codes(e).collect()}
    # dim 0 is constant (mx == mn) -> code 0, not NaN/overflow
    assert got == {1: [0, 0], 2: [0, 255]}
