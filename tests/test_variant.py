"""Spark 4 VARIANT surface (q192): typed path access, null-on-malformed
try_ semantics, and the parquet round-trip of a VARIANT column."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_typed_access_and_malformed_null(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "tags": ["a", "b"]}'),
            (2, '{"k": "12"}'),      # string-encoded int: cast path walk
            (3, 'not json at all'),  # malformed -> NULL variant, not error
            (4, '{"other": 1}'),     # missing path -> NULL
        ],
        "id long, props string",
    )
    out = {
        r["id"]: (r["k"], r["ntags"])
        for r in df.select(
            "id",
            F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("k"),
            F.try_variant_get(
                F.try_parse_json("props"), "$.tags[1]", "string"
            ).alias("ntags"),
        ).collect()
    }
    assert out == {1: (5, "b"), 2: (12, None), 3: (None, None), 4: (None, None)}


def test_variant_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "var")
    spark.createDataFrame(
        [(1, '{"a": {"b": [10, 20]}}'), (2, '{"a": {"b": []}}')],
        "id long, props string",
    ).select("id", F.parse_json("props").alias("v")).write.parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["v"] == "variant"
    got = {
        r["id"]: r["b1"]
        for r in back.select(
            "id", F.try_variant_get("v", "$.a.b[1]", "int").alias("b1")
        ).collect()
    }
    assert got == {1: 20, 2: None}
