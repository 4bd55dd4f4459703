"""Durable materialized-relation store: fingerprint hits skip the build
across sessions, source changes invalidate, pruning drops old corpus
versions, and the incremental near-dup path over a materialized corpus
signature table equals the recompute-everything query."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    corpus_minhash_materialized,
    incremental_neardup,
    q187_incremental_neardup,
)
from etl_pipeline_candy_store_spark.operators.materialize import (
    materialized_relation,
    materialized_versions,
    prune_materialized,
    source_fingerprint,
)
from etl_pipeline_candy_store_spark.plans.catalog import load

SF = "/root/testdata/sf0.001"


def _copy_source(tmp_path, name="src"):
    src_dir = tmp_path / name
    src_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src_dir / "documents.parquet")
    return str(src_dir)


def _counted_build(spark, sf_dir, calls):
    def build():
        calls.append(1)
        return (
            load(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )

    return build


def test_build_once_then_parquet_hits(spark, tmp_path):
    store = str(tmp_path / "store")
    src = _copy_source(tmp_path)
    calls: list[int] = []
    kw = dict(
        name="lang_counts",
        sf_dir=src,
        build=_counted_build(spark, src, calls),
        tables=("documents",),
        store_dir=store,
    )
    first = materialized_relation(spark, **kw)
    assert calls == [1]
    again = materialized_relation(spark, **kw)
    assert calls == [1], "fingerprint hit must not rebuild"
    assert sorted(map(tuple, first.collect())) == sorted(map(tuple, again.collect()))
    # no leftover temp dirs from the write protocol
    assert not [
        d for d in os.listdir(os.path.join(store, "lang_counts")) if d.startswith(".tmp")
    ]


def test_cross_session_durability(spark, tmp_path):
    store = str(tmp_path / "store")
    src = _copy_source(tmp_path)
    calls: list[int] = []
    materialized_relation(
        spark,
        "lang_counts",
        src,
        _counted_build(spark, src, calls),
        tables=("documents",),
        store_dir=store,
    )
    assert calls == [1]
    other = spark.newSession()  # fresh session state: session memos would miss
    got = materialized_relation(
        other,
        "lang_counts",
        src,
        _counted_build(other, src, calls),
        tables=("documents",),
        store_dir=store,
    )
    assert calls == [1], "a different session must reuse the parquet"
    assert got.count() > 0


def test_source_change_invalidates_and_prune(spark, tmp_path):
    store = str(tmp_path / "store")
    src = _copy_source(tmp_path)
    calls: list[int] = []
    build = _counted_build(spark, src, calls)
    fp1 = source_fingerprint(src, ("documents",))
    materialized_relation(
        spark, "lang_counts", src, build, tables=("documents",), store_dir=store
    )
    # rewrite the source (mtime bump = a new file generation landed)
    os.utime(os.path.join(src, "documents.parquet"))
    fp2 = source_fingerprint(src, ("documents",))
    assert fp2 != fp1
    materialized_relation(
        spark, "lang_counts", src, build, tables=("documents",), store_dir=store
    )
    assert calls == [1, 1], "changed source must rebuild"
    assert set(materialized_versions("lang_counts", store)) == {fp1, fp2}
    removed = prune_materialized("lang_counts", keep=1, store_dir=store)
    assert removed == [fp1], "prune drops the older build, keeps the newest"
    assert materialized_versions("lang_counts", store) == [fp2]


def test_version_token_forces_rebuild(spark, tmp_path):
    src = _copy_source(tmp_path)
    assert source_fingerprint(src, ("documents",), version="1") != source_fingerprint(
        src, ("documents",), version="2"
    )


def test_incremental_neardup_over_materialized_corpus(spark, tmp_path):
    """The production shape — corpus signatures read from the store,
    only the incoming batch recomputed — must equal the pure q187
    recompute-everything reference, and the second batch must not
    rebuild the corpus side."""
    store = str(tmp_path / "store")
    direct = q187_incremental_neardup(spark, SF)

    per_doc = corpus_minhash_materialized(spark, SF, store_dir=store)
    incoming = load(spark, SF, "documents").filter(F.col("doc_id") % 7 == 0)
    via_store = incremental_neardup(
        incoming, per_doc.filter(F.col("doc_id") % 7 != 0)
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_store.collect())
    )
    assert direct.count() > 0, "fixture must exercise the match path"
    # second "day": same corpus version resolves to the same parquet
    fps = materialized_versions("corpus_minhash_per_doc", store)
    corpus_minhash_materialized(spark, SF, store_dir=store)
    assert materialized_versions("corpus_minhash_per_doc", store) == fps


def test_concurrent_reader_survives_cutover_then_fails_loudly_on_prune(
    spark, tmp_path
):
    """The module's reader-safety claim, exercised with an actual pinned
    reader: a DataFrame resolved against corpus version A must (1) keep
    returning version-A rows after version B lands — landing a new
    generation never mutates or half-swaps the old directory — and
    (2) once A is pruned out from under it, either still complete with
    the SAME version-A rows or raise — never silently return wrong,
    partial, or empty results. Relies on Spark's default
    ``spark.sql.files.ignoreMissingFiles=false``; flipping that to true
    is exactly the silent-wrongness this test exists to catch."""
    assert (
        spark.conf.get("spark.sql.files.ignoreMissingFiles", "false") == "false"
    ), "ignoreMissingFiles=true would turn a pruned version into silent row loss"

    store = str(tmp_path / "store")
    src = _copy_source(tmp_path)
    calls: list[int] = []
    build = _counted_build(spark, src, calls)
    fp_a = source_fingerprint(src, ("documents",))

    reader_a = materialized_relation(
        spark, "lang_counts", src, build, tables=("documents",), store_dir=store
    )
    rows_a = sorted(map(tuple, reader_a.collect()))
    assert rows_a, "fixture must produce rows"

    # a new corpus generation lands while reader_a is still open
    os.utime(os.path.join(src, "documents.parquet"))
    materialized_relation(
        spark, "lang_counts", src, build, tables=("documents",), store_dir=store
    )
    assert calls == [1, 1]
    assert sorted(map(tuple, reader_a.collect())) == rows_a, (
        "pinned reader must still see version A after B lands"
    )

    # version cutover complete -> prune A while reader_a is still open
    removed = prune_materialized("lang_counts", keep=1, store_dir=store)
    assert removed == [fp_a]
    try:
        post_prune = sorted(map(tuple, reader_a.collect()))
    except Exception as exc:  # loud failure is an accepted outcome
        msg = str(exc)
        assert (
            "fp=" in msg
            or "FileNotFound" in msg
            or "PATH_NOT_FOUND" in msg
            or "does not exist" in msg
        ), f"failure must name the vanished version, got: {msg[:500]}"
    else:
        # completing (e.g. blocks cached) is only acceptable if correct
        assert post_prune == rows_a, (
            "a post-prune read that completes must return version-A rows, "
            f"got {post_prune!r}"
        )


def test_failed_build_leaves_no_tmp_dir(spark, tmp_path):
    """A build() that throws must clean up its .tmp-* staging directory
    — repeated failures must not strand corpus-scale parquet garbage
    that prune_materialized (fp=* only) never sweeps."""
    import os

    import pytest

    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_relation,
    )

    store = str(tmp_path / "store")

    def boom():
        raise RuntimeError("synthetic build failure")

    with pytest.raises(RuntimeError, match="synthetic"):
        materialized_relation(
            spark,
            "broken_rel",
            "/root/testdata/sf0.001",
            boom,
            ["documents"],
            store_dir=store,
        )
    leftovers = [
        p
        for p in os.listdir(os.path.join(store, "broken_rel"))
        if p.startswith(".tmp-")
    ]
    assert leftovers == []
