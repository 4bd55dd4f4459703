"""Mixed-generation parquet reads (read_evolving_parquet): one directory
holding files from different writer versions — added columns, widened
int types — read under a single declared contract. The 100 TB reality:
schema evolution lands file-by-file; a reader that binds to one file's
footer silently drops new columns or dies mid-scan on old ones."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.sources.readers import read_evolving_parquet


@pytest.fixture(scope="module")
def two_gen_dir(spark, tmp_path_factory):
    """gen-1 files: (id int32, val int32). gen-2 files: (id int64,
    val int64, source string NOT NULL) — an added column AND a widened
    key, the two commonest evolution moves, flattened into ONE directory
    exactly as successive ingest jobs would leave them."""
    root = tmp_path_factory.mktemp("evo")
    g1 = str(root / "g1")
    g2 = str(root / "g2")
    spark.range(5).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 10).cast("int").alias("val"),
    ).repartition(1).write.parquet(g1)
    spark.range(5, 10).select(
        F.col("id").alias("id"),
        (F.col("id") * 10).alias("val"),
        F.lit("batch-2").alias("source"),
    ).repartition(1).write.parquet(g2)
    mixed = str(root / "mixed")
    os.makedirs(mixed)
    for i, f in enumerate(sorted(glob.glob(f"{g1}/part-*.parquet") + glob.glob(f"{g2}/part-*.parquet"))):
        shutil.copy(f, os.path.join(mixed, f"part-{i:05d}.parquet"))
    return mixed


def test_target_schema_widens_and_nullfills(spark, two_gen_dir):
    df = read_evolving_parquet(
        spark, two_gen_dir, target_schema="id long, val long, source string"
    )
    assert dict(df.dtypes) == {"id": "bigint", "val": "bigint", "source": "string"}
    rows = {r["id"]: (r["val"], r["source"]) for r in df.collect()}
    assert len(rows) == 10
    assert rows[3] == (30, None)  # gen-1: int32 widened, missing col → null
    assert rows[7] == (70, "batch-2")  # gen-2 read natively


def test_defaults_backfill_old_generations(spark, two_gen_dir):
    df = read_evolving_parquet(
        spark,
        two_gen_dir,
        target_schema="id long, val long, source string",
        defaults={"source": "legacy"},
    )
    got = {r["id"]: r["source"] for r in df.collect()}
    assert all(got[i] == "legacy" for i in range(5))
    assert all(got[i] == "batch-2" for i in range(5, 10))


def test_merge_mode_unions_additive_generations(spark, tmp_path):
    # same-typed generations differing only by an added column: the
    # no-target mode (mergeSchema) must union them without a declared
    # contract — the quick path when nothing was widened
    g1 = str(tmp_path / "m1")
    g2 = str(tmp_path / "m2")
    spark.range(3).select("id").repartition(1).write.parquet(g1)
    spark.range(3, 6).select(
        "id", F.lit(1.5).alias("score")
    ).repartition(1).write.parquet(g2)
    mixed = str(tmp_path / "mixed")
    os.makedirs(mixed)
    for i, f in enumerate(glob.glob(f"{g1}/part-*.parquet") + glob.glob(f"{g2}/part-*.parquet")):
        shutil.copy(f, os.path.join(mixed, f"part-{i:05d}.parquet"))
    df = read_evolving_parquet(spark, mixed, defaults={"score": 0.0})
    assert dict(df.dtypes) == {"id": "bigint", "score": "double"}
    got = {r["id"]: r["score"] for r in df.collect()}
    assert got[0] == 0.0 and got[5] == 1.5


def test_lossy_cast_refused_not_corrupted(spark, two_gen_dir):
    # INT64 → double is NOT a widening (lossy above 2^53): the scan must
    # fail loudly, never silently round — the documented route is
    # decimal(20,0) in the target plus an explicit .cast("double")
    df = read_evolving_parquet(
        spark, two_gen_dir, target_schema="id long, val double, source string"
    )
    with pytest.raises(Exception, match="PARQUET_COLUMN_DATA_TYPE_MISMATCH"):
        df.collect()
    via_decimal = read_evolving_parquet(
        spark,
        two_gen_dir,
        target_schema="id long, val decimal(20,0), source string",
    ).withColumn("val", F.col("val").cast("double"))
    assert {r["val"] for r in via_decimal.collect()} == {float(i * 10) for i in range(10)}


def test_defaults_for_unknown_column_rejected(spark, two_gen_dir):
    with pytest.raises(ValueError, match="not in schema"):
        read_evolving_parquet(
            spark,
            two_gen_dir,
            target_schema="id long, val long, source string",
            defaults={"nope": 1},
        )


try:
    from hypothesis import given, settings, strategies as st

    # each generation: a random subset of optional columns and a random
    # physical int width for "val" — the space of states a long-lived
    # directory actually visits as writers evolve
    _GEN = st.lists(
        st.tuples(
            st.booleans(),  # include 'extra'?
            st.booleans(),  # include 'score'?
            st.sampled_from(["int", "long"]),  # physical width of 'val'
            st.integers(1, 4),  # rows in this generation
        ),
        min_size=1,
        max_size=4,
    )

    @given(gens=_GEN)
    @settings(max_examples=8, deadline=None)
    @pytest.mark.slow
    def test_target_schema_reads_any_generation_mix(spark, tmp_path_factory, gens):
        root = tmp_path_factory.mktemp("evo_prop")
        mixed = str(root / "mixed")
        os.makedirs(mixed)
        expect = {}  # id -> (val, extra, score)
        next_id = 0
        for g, (has_extra, has_score, width, n) in enumerate(gens):
            ids = list(range(next_id, next_id + n))
            next_id += n
            cols = [F.col("id").cast("long").alias("id"),
                    (F.col("id") * 7).cast(width).alias("val")]
            if has_extra:
                cols.append(F.concat(F.lit("g"), F.lit(str(g))).alias("extra"))
            if has_score:
                cols.append((F.col("id") * 2).cast("double").alias("score"))
            gdir = str(root / f"g{g}")
            spark.createDataFrame([(i,) for i in ids], "id long").select(
                *cols
            ).repartition(1).write.parquet(gdir)
            for f in glob.glob(f"{gdir}/part-*.parquet"):
                shutil.copy(
                    f, os.path.join(mixed, f"part-{g:03d}-{os.path.basename(f)}")
                )
            for i in ids:
                expect[i] = (
                    i * 7,
                    f"g{g}" if has_extra else None,
                    float(i * 2) if has_score else None,
                )
        df = read_evolving_parquet(
            spark, mixed, target_schema="id long, val long, extra string, score double"
        )
        got = {
            r["id"]: (r["val"], r["extra"], r["score"]) for r in df.collect()
        }
        assert got == expect
except ImportError:  # pragma: no cover
    pass
