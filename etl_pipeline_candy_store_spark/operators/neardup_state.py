"""Incremental EXACT near-dup state for the batch curation pipeline.

The composed :func:`..plans.curation_pipeline.curate` funnel spends
most of its wall time rebuilding the q51 shingle self-join from scratch
every run (PIPELINE_SCALE_r10.json: 66-75% of stage time), even though
the corpus it deduplicates is mostly the same corpus it deduplicated
yesterday. This module gives ``curate`` a persistent corpus state so a
re-run only pays for the NEW slice:

- ``per_doc``  (doc_id, fp, n)       — membership + shingle cardinality
- ``shingles`` (doc_id, fp, shingle) — the exploded shingle relation
- ``pairs``    (doc_a, doc_b, n_common, n_union) — verified pairs among
  docs already in state

On each run the input splits into *matched* (same (doc_id, content-
digest) already in state) and *new*; the emitted pair relation is

  stored-pairs(matched x matched)  — read back, never recomputed
  ∪ cross(new x matched)           — ONE linear scan of the shingle
                                     state probed by the (broadcast)
                                     new batch's shingle table: no
                                     corpus self-join, no corpus shuffle
  ∪ within(new x new)              — q51's exact jaccard_pairs on the
                                     batch only

Because every branch is the EXACT shingle-intersection semantics (not
an LSH approximation like the streaming MinHash twin in
``streaming/neardup_stream.py``), the union is provably bit-identical
to ``jaccard_pairs`` over the full input — the stateful and stateless
``curate`` modes produce hash-equal funnels, which q216 locks against
the DuckDB oracle and ``tests/test_curate_incremental.py`` asserts
end-to-end (including the changed-content and shrunk-corpus edges,
where stale state rows are filtered by the (doc_id, fp) match).

State discipline (the streaming ledger pattern, run- instead of
batch-scoped): each run appends ``run=N`` partitions and commits by
writing ``applied/run=N`` LAST; readers consult the applied ledger, so
a crash mid-write leaves an orphan partition that the next run
overwrites instead of a half-visible state. Stale rows from changed or
removed docs accumulate until :func:`compact_neardup_state` rewrites
the state into a fresh single-run layout.

Scale posture: per-run cost is O(batch shingles + corpus-state scan +
candidate verify) with the only shuffles keyed on batch-sized
relations; the corpus-state scan is a columnar parquet read probed by a
broadcast hash join (no exchange). At 100 TB the shingle state is wide;
the ``broadcast_max_shingles`` guard measures the BATCH SHINGLE table
(the relation actually broadcast — gating on doc count would under-
estimate by the ~50x shingle fan-out) and falls back to a shuffle join
past it, and compaction bounds the stale-row overhead.

Reference anchor: the reference pipeline (candy orders) has no corpus
state at all — every DAG run recomputes from the raw inputs
(/root/reference/candy_dag.py:136-164); this is the amortization a
recurring 100 TB curation run cannot live without.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.dedup import (
    _JACCARD_PAIRS_SQL,
    _JACCARD_THRESHOLD,
    _shingles,
    connected_components,
    jaccard_pairs,
)
from etl_pipeline_candy_store_spark.plans.catalog import load, register

_ND_PERDOC_SCHEMA = "doc_id bigint, fp string, n bigint"
_ND_SHINGLES_SCHEMA = "doc_id bigint, fp string, shingle string"
# pairs are stamped with BOTH endpoints' content digests: a pair is
# valid only for the generations it was computed from — once a doc's
# content changes, its old pairs must never match again even though the
# doc_id is back in state under the new digest
_ND_PAIRS_SCHEMA = (
    "doc_a bigint, fp_a string, doc_b bigint, fp_b string,"
    " n_common bigint, n_union bigint"
)


def _fs_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def applied_runs(spark: SparkSession, state_dir: str) -> list[int]:
    """Runs whose state writes are committed (ledger written last)."""
    path = f"{state_dir}/applied"
    if not _fs_exists(spark, path):
        return []
    return sorted(
        r["run"] for r in spark.read.parquet(path).select("run").collect()
    )


def _read_state(
    spark: SparkSession, state_dir: str, kind: str, schema: str, runs: list[int]
) -> DataFrame:
    """Committed rows of one state relation; empty frame before the
    first commit. The run-partition filter prunes uncommitted (crashed)
    partitions at the scan."""
    path = f"{state_dir}/{kind}"
    if not runs or not _fs_exists(spark, path):
        return spark.createDataFrame([], schema)
    return (
        spark.read.parquet(path).filter(F.col("run").isin(runs)).drop("run")
    )


def neardup_pairs_incremental(
    d1: DataFrame,
    state_dir: str,
    *,
    update_state: bool = True,
    broadcast_max_shingles: int = 2_000_000,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact q51 near-dup pairs over ``d1`` (doc_id, text — unique
    doc_ids, e.g. the post-exact-dedup survivors), paying shingle-join
    cost only for docs NOT already in the corpus state.

    Returns (doc_a, doc_b, n_common, n_union), bit-identical to
    ``jaccard_pairs(d1, threshold)``. With ``update_state`` the new
    slice's shingles/cardinalities and the freshly discovered pairs are
    committed as the next run, so a replayed corpus pays nothing and a
    grown corpus pays for its delta.
    """
    spark = d1.sparkSession
    runs = applied_runs(spark, state_dir)
    keyed = d1.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp"), "text"
    )
    per_doc_st = _read_state(spark, state_dir, "per_doc", _ND_PERDOC_SCHEMA, runs)
    # the matched/new split runs on a SLIM (doc_id, fp) projection so the
    # anti-join never shuffles document text; the text joins back via a
    # broadcast semi-join on the (batch-sized) new-id set
    slim = keyed.select("doc_id", "fp")
    matched = slim.join(
        per_doc_st.select("doc_id", "fp"), ["doc_id", "fp"], "left_semi"
    )
    n_new = None
    if runs:
        new_ids = slim.join(
            per_doc_st.select("doc_id", "fp"), ["doc_id", "fp"], "left_anti"
        ).localCheckpoint(eager=True)
        n_new = new_ids.count()
        ids = new_ids.select("doc_id")
        if n_new <= 10_000_000:  # one long per doc — broadcast-cheap
            ids = F.broadcast(ids)
        # batch-sized — pin it so the consumers below (shingling twice,
        # pair verify, state write) don't re-run the split
        new = keyed.join(ids, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
    else:
        new = keyed.select("doc_id", "fp", "text")

    new_sh = _shingles(new.select("doc_id", "text"))
    if runs:
        # batch-sized and consumed 3-4 times (count, probe, cardinality,
        # state write) — pin it; the first run's corpus-sized shingle
        # relation stays lazy like the stateless path
        new_sh = new_sh.localCheckpoint(eager=True)
    card_new = new_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )

    empty_pairs = spark.createDataFrame([], _ND_PAIRS_SCHEMA).select(
        "doc_a", "doc_b", "n_common", "n_union"
    )
    if runs:
        stored = (
            _read_state(spark, state_dir, "pairs", _ND_PAIRS_SCHEMA, runs)
            .join(
                matched.select(
                    F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a")
                ),
                ["doc_a", "fp_a"],
                "left_semi",
            )
            .join(
                matched.select(
                    F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b")
                ),
                ["doc_b", "fp_b"],
                "left_semi",
            )
            .select("doc_a", "doc_b", "n_common", "n_union")
        )
        if n_new == 0:
            # pure replay: every doc matched — nothing to probe, nothing
            # to append (state writes are delta-only, so a replayed
            # corpus costs one state read + the semi-filters)
            return stored
        sh_st = _read_state(
            spark, state_dir, "shingles", _ND_SHINGLES_SCHEMA, runs
        )
        probe = new_sh.select(F.col("doc_id").alias("doc_new"), "shingle")
        # gate the broadcast on the SHINGLE row count — the relation
        # being shipped — not the doc count (~50x smaller)
        if new_sh.count() <= broadcast_max_shingles:
            probe = F.broadcast(probe)
        inter = (
            sh_st.select(F.col("doc_id").alias("doc_seen"), "fp", "shingle")
            .join(probe, "shingle")
            .groupBy("doc_seen", "fp", "doc_new")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        )
        # joining on (doc_seen, fp) both fetches the stored cardinality
        # AND drops candidates whose state row is stale (content changed
        # or doc gone): only the matched generation of a doc_id verifies
        seen_card = per_doc_st.join(matched, ["doc_id", "fp"], "left_semi")
        cross = (
            inter.join(
                seen_card.select(
                    F.col("doc_id").alias("doc_seen"),
                    "fp",
                    F.col("n").alias("n_a"),
                ),
                ["doc_seen", "fp"],
            )
            .join(
                card_new.select(
                    F.col("doc_id").alias("doc_new"), F.col("n").alias("n_b")
                ),
                "doc_new",
            )
            .withColumn(
                "n_union",
                (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("long"),
            )
            .filter(
                F.col("n_common").cast("double") / F.col("n_union") >= threshold
            )
            .select(
                F.least("doc_seen", "doc_new").alias("doc_a"),
                F.greatest("doc_seen", "doc_new").alias("doc_b"),
                "n_common",
                "n_union",
            )
        )
    else:
        cross = stored = empty_pairs

    within = jaccard_pairs(new.select("doc_id", "text"), threshold)
    fresh = within.unionByName(cross)

    if update_state:
        nrun = (max(runs) + 1) if runs else 0
        new_sh.join(new.select("doc_id", "fp"), "doc_id").select(
            "doc_id", "fp", "shingle"
        ).write.mode("overwrite").parquet(f"{state_dir}/shingles/run={nrun}")
        new.select("doc_id", "fp").join(card_new, "doc_id", "left").select(
            "doc_id", "fp", F.coalesce("n", F.lit(0)).cast("long").alias("n")
        ).write.mode("overwrite").parquet(f"{state_dir}/per_doc/run={nrun}")
        # stamp both endpoints' digests (every endpoint is in keyed)
        fpm = keyed.select("doc_id", "fp")
        fresh.join(
            fpm.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a")),
            "doc_a",
        ).join(
            fpm.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b")),
            "doc_b",
        ).select(
            "doc_a", "fp_a", "doc_b", "fp_b", "n_common", "n_union"
        ).write.mode("overwrite").parquet(f"{state_dir}/pairs/run={nrun}")
        # ledger LAST: a crash before this line leaves run=N invisible
        spark.createDataFrame([(nrun,)], "n bigint").write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/applied/run={nrun}")
        # downstream consumers read the just-written pairs back instead
        # of re-running the probe plan a second time
        fresh = spark.read.parquet(f"{state_dir}/pairs/run={nrun}").select(
            "doc_a", "doc_b", "n_common", "n_union"
        )

    return stored.unionByName(fresh)


def neardup_labels_incremental(
    d1: DataFrame, state_dir: str, **kw
) -> DataFrame:
    """Near-dup component labels (node, label) over ``d1`` via the
    incremental pair relation — the stateful drop-in for
    ``curation_pipeline.near_dup_labels``."""
    pairs = neardup_pairs_incremental(d1, state_dir, **kw)
    return connected_components(pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")


def compact_neardup_state(
    spark: SparkSession, state_dir: str, current: DataFrame | None = None
) -> dict:
    """Rewrite the accumulated run partitions into a single fresh run,
    dropping rows superseded by a later generation of the same doc_id
    and (when ``current`` — a (doc_id, text) frame — is given) rows for
    docs no longer in the corpus. Bounded-state discipline for a state
    dir that would otherwise grow with every changed doc.

    Uses the materialized-store cutover pattern: the compacted
    partitions are written under NEW run ids first, the applied ledger
    is swapped last, and old partitions are deleted only after the
    ledger no longer references them — a reader pinned to the old runs
    keeps a consistent view until its scan ends.
    """
    runs = applied_runs(spark, state_dir)
    if not runs:
        return {"runs_before": 0, "runs_after": 0}
    pd_runs = (
        spark.read.parquet(f"{state_dir}/per_doc")
        .filter(F.col("run").isin(runs))
    )
    if current is not None:
        # keep exactly the generation matching the live corpus. A
        # (doc_id, fp) pair exists in at most one run (a matched doc is
        # never re-appended), so the semi-join is already unique — and
        # unlike max-run selection it keeps a REVERTED doc's old-but-
        # current generation instead of its newer superseded one.
        cur = current.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
        )
        keep = pd_runs.join(cur, ["doc_id", "fp"], "left_semi").select(
            "doc_id", "fp", "n"
        )
    else:
        # no corpus given: latest generation per doc_id
        latest = pd_runs.groupBy("doc_id").agg(F.max("run").alias("run"))
        keep = pd_runs.join(latest, ["doc_id", "run"]).select(
            "doc_id", "fp", "n"
        )
    keep = keep.localCheckpoint(eager=True)
    kd = keep.select("doc_id", "fp")
    sh = _read_state(
        spark, state_dir, "shingles", _ND_SHINGLES_SCHEMA, runs
    ).join(kd, ["doc_id", "fp"], "left_semi")
    pairs = (
        _read_state(spark, state_dir, "pairs", _ND_PAIRS_SCHEMA, runs)
        .join(
            kd.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a")),
            ["doc_a", "fp_a"],
            "left_semi",
        )
        .join(
            kd.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b")),
            ["doc_b", "fp_b"],
            "left_semi",
        )
    )
    nrun = max(runs) + 1
    sh.write.mode("overwrite").parquet(f"{state_dir}/shingles/run={nrun}")
    keep.write.mode("overwrite").parquet(f"{state_dir}/per_doc/run={nrun}")
    pairs.write.mode("overwrite").parquet(f"{state_dir}/pairs/run={nrun}")
    # ledger swap: overwrite the WHOLE applied dir with just the new run
    spark.createDataFrame([(nrun,)], "n bigint").write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/applied.next/run={nrun}")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(state_dir).getFileSystem(conf)
    fs.delete(Path(f"{state_dir}/applied"), True)
    fs.rename(Path(f"{state_dir}/applied.next"), Path(f"{state_dir}/applied"))
    for kind in ("shingles", "per_doc", "pairs"):
        for r in runs:
            fs.delete(Path(f"{state_dir}/{kind}/run={r}"), True)
    return {"runs_before": len(runs), "runs_after": 1, "run": nrun}


_Q216_D1_SQL = """
  SELECT d.doc_id, d.text FROM documents d
  JOIN (SELECT md5(text) AS fp, MIN(doc_id) AS doc_id
        FROM documents GROUP BY 1) k
  ON d.doc_id = k.doc_id
"""


@register(
    "q216_incremental_exact_neardup",
    oracle=f"""
WITH d1 AS ({_Q216_D1_SQL}),
{_JACCARD_PAIRS_SQL.replace("FROM documents", "FROM d1").lstrip().removeprefix("WITH ")}
""",
    doc="Incremental exact near-dup: corpus state is built from the "
    "doc_id % 7 <> 0 slice (its own post-exact-dedup survivors), then "
    "the FULL corpus runs through the stateful path — stored pairs for "
    "matched docs, one state-scan cross probe for the delta, q51 "
    "within-pairs for the delta only. The oracle is plain exact "
    "jaccard pairs over the full post-exact-dedup corpus: hash "
    "equality IS the proof that the incremental decomposition loses "
    "nothing (including the stale-state edge: delta doc_ids are lower, "
    "so some prior keepers lose their keeper status and their state "
    "rows must be ignored by the (doc_id, fp) match).",
)
def q216_incremental_exact_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        dedup_exact,
    )

    docs = load(spark, sf_dir, "documents")
    state = tempfile.mkdtemp(prefix="ndstate_")
    prior = dedup_exact(docs.filter(F.col("doc_id") % 7 != 0))
    neardup_pairs_incremental(prior, state).count()  # run 0: build state
    d1 = dedup_exact(docs)
    return neardup_pairs_incremental(d1, state, update_state=False)


def forget_from_neardup_state(
    spark: SparkSession, state_dir: str, current: DataFrame
) -> dict:
    """Right-to-be-forgotten for the PERSISTENT dedup state (the q194
    family's obligation extended to derived state): a document deleted
    from the corpus must leave no trace in the shingle relation, the
    per-doc index, or the stored pairs — derived state is still
    personal data. Implemented as a compaction against the post-forget
    corpus: :func:`compact_neardup_state` already keeps only the
    generations present in ``current``, and its ledger-cutover write
    makes the purge PHYSICAL (old run partitions are deleted, not
    filtered at read time — a tombstone that still materializes the
    text on disk is not a deletion)."""
    return compact_neardup_state(spark, state_dir, current=current)
