"""Incremental entity resolution — q213's ingest twin.

Registrations arrive as a stream; each micro-batch is blocked and
verified against the ACCUMULATED registration state (one block-keyed
probe, never a corpus pair scan), and the discovered match edges land
append-only. Entity labels are derived ON READ by running connected
components over the accumulated edge relation — the design decision
that makes the stream ARRIVAL-ORDER INDEPENDENT:

A record can arrive that bridges two already-emitted entities (the
q213 fixture contains exactly this shape: a customer's two dirty
variants sit at edit distance 2 from each other, linked only through
the parent — if both variants arrive before the parent, they are
separate entities until the parent's batch lands). A stream that
materializes labels per batch must REWRITE absorbed entities on every
such merge; a stream that materializes the (append-only, monotone)
EDGE relation never rewrites anything, and min-label components over
the final edge set are the same relation whatever order the edges
arrived in. Labels are recomputed on read over the match-edge relation
only — edges are bounded by true duplicates (tiny relative to the
corpus), so the read-side closure is cheap; the expensive part (the
blocking probe) is what the stream amortizes per batch.

Batch-scoped overwrites keep replays idempotent (a replayed batch
re-probes only EARLIER state, same as the MinHash twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.ledger import (
    read_batch_state as _read_state,
)

_ER_BLOCKED_SCHEMA = "reg_id bigint, name string, nk bigint, blk string"
_ER_PAIRS_SCHEMA = "ra bigint, rb bigint"


def apply_er_batch(
    batch: DataFrame, state_dir: str, batch_id: int, max_dist: int = 1
) -> None:
    """Resolve one micro-batch of (reg_id, name, nk) registrations:
    block, verify in-batch and against state, append edges + state."""
    from etl_pipeline_candy_store_spark.operators.entity import match_pairs

    _repair_er_compaction(state_dir)
    spark = batch.sparkSession
    blocked_new = batch.select(
        "reg_id",
        "name",
        F.col("nk").cast("long").alias("nk"),
        F.substring("name", 15, 4).alias("blk"),
    ).localCheckpoint(eager=True)
    blocked_old = _read_state(
        spark, f"{state_dir}/blocked", _ER_BLOCKED_SCHEMA, before_batch=batch_id
    )

    intra = match_pairs(
        blocked_new.select("reg_id", "name", "nk"), max_dist=max_dist
    )
    cross = (
        blocked_new.select(
            F.col("reg_id").alias("rn"), F.col("name").alias("nn"), "nk", "blk"
        )
        .join(
            blocked_old.select(
                F.col("reg_id").alias("ro"), F.col("name").alias("no"), "nk", "blk"
            ),
            ["nk", "blk"],
        )
        .filter(F.levenshtein("nn", "no") <= max_dist)
        # at-least-once redelivery can re-present a reg_id already in
        # state; without this guard the probe emits a degenerate
        # self-edge (ra=rb) that batch q213 can never produce
        .filter(F.col("rn") != F.col("ro"))
        .select(
            F.least("rn", "ro").alias("ra"), F.greatest("rn", "ro").alias("rb")
        )
    )
    intra.unionByName(cross).write.mode("overwrite").parquet(
        f"{state_dir}/pairs/batch={batch_id}"
    )
    blocked_new.write.mode("overwrite").parquet(
        f"{state_dir}/blocked/batch={batch_id}"
    )


def stream_entity_resolution(reg_stream: DataFrame, state_dir: str):
    """Wire a (reg_id, name, nk) registration stream through incremental
    ER. Returns a ``DataStreamWriter``; caller adds checkpoint/trigger."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_er_batch(batch, state_dir, batch_id)

    return reg_stream.writeStream.foreachBatch(_apply).outputMode("update")


def read_resolved_entities(spark: SparkSession, state_dir: str) -> DataFrame:
    """(reg_id, entity_id) over everything that has arrived: connected
    components over the accumulated match edges (min reg_id per
    component; singletons resolve to themselves). Identical to batch
    q213 on the same records, for ANY arrival order."""
    from etl_pipeline_candy_store_spark.operators.dedup import (
        connected_components,
    )

    _repair_er_compaction(state_dir)
    # distinct: at-least-once redelivery under a NEW batch_id leaves the
    # same registration in state twice; the resolution output is keyed
    # by reg_id and must not duplicate rows for it (slim projection —
    # the dedup shuffle carries one long per registration)
    regs = (
        _read_state(spark, f"{state_dir}/blocked", _ER_BLOCKED_SCHEMA)
        .select("reg_id")
        .distinct()
    )
    pairs = _read_state(spark, f"{state_dir}/pairs", _ER_PAIRS_SCHEMA)
    if pairs.isEmpty():
        return regs.select(
            F.col("reg_id").cast("long").alias("reg_id"),
            F.col("reg_id").cast("long").alias("entity_id"),
        )
    cc = connected_components(pairs.select("ra", "rb"), "ra", "rb")
    return regs.join(cc, regs["reg_id"] == cc["node"], "left").select(
        F.col("reg_id").cast("long").alias("reg_id"),
        F.coalesce(F.col("label"), F.col("reg_id"))
        .cast("long")
        .alias("entity_id"),
    )


# --- State retention / compaction ---------------------------------------
#
# Two growth axes, two remedies:
#
# 1. FILE fragmentation: every micro-batch adds one batch=N partition to
#    blocked/ and pairs/, so a long-lived stream accumulates thousands
#    of tiny dirs (the probe join then pays per-file open cost).
#    compact_er_state() consolidates all partitions at or below the
#    stream checkpoint's committed frontier into ONE partition via a
#    staged commit (stage parquet + _UPTO marker, then delete + rename),
#    with crash repair on the next write/read. The DATA itself is
#    irreducible — blocked registrations ARE the probe index and pairs
#    ARE the resolution evidence.
#
# 2. Read-side closure cost: read_resolved_entities runs connected
#    components over ALL accumulated edges on every read. Bound: the
#    edge relation is sized by true duplicate pairs (dup_rate x corpus,
#    orders of magnitude below the corpus itself), and label rounds are
#    component-diameter-bounded (<= 2 for the q213 shape), so one read
#    costs O(E) x rounds keyed shuffles — but paying it per DASHBOARD
#    READ is waste. read_resolved_entities_materialized() memoizes the
#    closure through operators/materialize.py keyed by a fingerprint of
#    the state dirs: reads between batches are a parquet scan; a new
#    batch changes the fingerprint and the next read rebuilds once.
#    prune_materialized("er_resolved", ...) is the retention knob, with
#    the store's pinned-reader guarantee (an open reader keeps its
#    generation until pruned, then fails loudly — never silently).

from etl_pipeline_candy_store_spark.operators.ledger import (  # noqa: E402
    repair_staged_compaction,
    staged_compact,
)

_ER_STATE_KINDS = ("blocked", "pairs")


def _repair_er_compaction(state_dir: str) -> None:
    """Finish (or discard) a compaction interrupted by a crash; no-op
    when no stage dir exists. Idempotent; called before writes/reads.
    Delegates to the shared staged-commit protocol (:mod:`...operators.
    ledger`) per state relation."""
    for kind in _ER_STATE_KINDS:
        repair_staged_compaction(f"{state_dir}/{kind}")


def compact_er_state(spark, state_dir: str, upto_batch: int) -> dict:
    """Consolidate every ``batch=i`` (i <= upto_batch) partition of the
    blocked/pairs state into ONE ``batch=upto_batch`` partition each.

    ONLY call with ``upto_batch`` at or below the stream checkpoint's
    committed frontier: Structured Streaming replays at most the last
    uncommitted batch, and a replayed batch must still see strictly
    earlier state — consolidation erases the between-batch distinction,
    which is safe only for batches that can never replay.

    Staged commit: the consolidated parquet lands in a dot-dir Spark
    never lists, the _UPTO marker commits it, and the delete+rename
    finish is idempotent (``_repair_er_compaction`` completes it after
    a crash at any point past the marker; before the marker the stage
    is discarded and the state is untouched)."""
    stats: dict = {}
    for kind in _ER_STATE_KINDS:
        stats[kind] = staged_compact(
            spark, f"{state_dir}/{kind}", upto_batch
        )
    return stats


def read_resolved_entities_materialized(
    spark: SparkSession, state_dir: str, store_dir: str | None = None
) -> DataFrame:
    """The resolved-entity closure, memoized per STATE GENERATION through
    the durable store (:mod:`..operators.materialize`): a fingerprint
    over the blocked/pairs state files keys the materialized labels, so
    repeated reads between micro-batches are one parquet scan instead of
    a connected-components run; any new batch (or a compaction rewrite)
    changes the fingerprint and the next read rebuilds once. Old
    generations stay pinned-readable until
    ``prune_materialized("er_resolved", store_dir=...)``."""
    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_relation,
    )

    _repair_er_compaction(state_dir)
    return materialized_relation(
        spark,
        "er_resolved",
        state_dir,
        build=lambda: read_resolved_entities(spark, state_dir),
        tables=_ER_STATE_KINDS,
        store_dir=store_dir,
    )
