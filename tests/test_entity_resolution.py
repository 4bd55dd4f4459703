"""Entity resolution (q213): Spark must equal an independent Python
union-find replay of the blocking + verify + closure semantics, every
dirty re-registration must resolve to its parent's entity, and the
3-record entities must exist only through transitive closure."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.entity import (
    _ER_MAX_DIST,
    _ER_V1_MOD,
    _ER_V1_OFFSET,
    _ER_V2_MOD,
    _ER_V2_OFFSET,
    q213_entity_resolution,
)
from etl_pipeline_candy_store_spark.plans.catalog import load

SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_reference(customers):
    regs = {}
    for ck, name, nk in customers:
        regs[ck] = (name, nk)
        if ck % _ER_V1_MOD == 0:
            regs[ck + _ER_V1_OFFSET] = (name[:11] + "Z" + name[12:], nk)
        if ck % _ER_V2_MOD == 0:
            regs[ck + _ER_V2_OFFSET] = (name[:12] + "Q" + name[13:], nk)
    blocks: dict[tuple, list[int]] = {}
    for rid, (name, nk) in regs.items():
        blocks.setdefault((nk, name[14:18]), []).append(rid)
    parent = {rid: rid for rid in regs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = set()
    for members in blocks.values():
        for i, ra in enumerate(members):
            for rb in members[i + 1 :]:
                lo, hi = min(ra, rb), max(ra, rb)
                if _lev(regs[lo][0], regs[hi][0]) <= _ER_MAX_DIST:
                    pairs.add((lo, hi))
                    parent[find(lo)] = find(hi)
    # entity = min reg in component
    comp: dict[int, list[int]] = {}
    for rid in regs:
        comp.setdefault(find(rid), []).append(rid)
    entity = {}
    for members in comp.values():
        m = min(members)
        for rid in members:
            entity[rid] = m
    return regs, pairs, entity


def test_entity_resolution_matches_python_reference(spark):
    customers = [
        (r["c_custkey"], r["c_name"], r["c_nationkey"])
        for r in load(spark, SF, "customer").collect()
    ]
    regs, pairs, want = _py_reference(customers)
    got = {
        r["reg_id"]: r["entity_id"]
        for r in q213_entity_resolution(spark, SF).collect()
    }
    assert got == want
    assert len(got) == len(regs)

    # every dirty re-registration resolves to its parent's entity
    for rid in regs:
        if rid >= _ER_V1_OFFSET:
            parent_id = rid % _ER_V1_OFFSET
            assert got[rid] == got[parent_id], rid

    # 3-record entities exist, and ONLY via transitivity: the two
    # variants of a customer are distance 2 apart (never a direct pair)
    triples = [
        ck
        for ck, _, _ in customers
        if ck % _ER_V2_MOD == 0
    ]
    assert triples, "fixture must contain 3-record entities"
    for ck in triples:
        v1, v2 = ck + _ER_V1_OFFSET, ck + _ER_V2_OFFSET
        assert got[v1] == got[v2] == got[ck]
        assert _lev(regs[v1][0], regs[v2][0]) == 2
        assert (min(v1, v2), max(v1, v2)) not in pairs


@pytest.mark.slow
def test_stream_er_adversarial_order_matches_batch(spark, tmp_path):
    """Streaming ER must equal batch q213 even under ADVERSARIAL
    arrival: both dirty variants of a customer arrive BEFORE the
    parent, so they sit in separate entities until the parent's batch
    bridges them — the merge case a label-materializing stream gets
    wrong and the append-only edge design handles for free. Replay of
    the bridging batch must be idempotent."""
    import time

    from etl_pipeline_candy_store_spark.operators.entity import (
        registrations,
    )
    from etl_pipeline_candy_store_spark.streaming.entity_stream import (
        apply_er_batch,
        read_resolved_entities,
        stream_entity_resolution,
    )

    want = {
        r["reg_id"]: r["entity_id"]
        for r in q213_entity_resolution(spark, SF).collect()
    }

    regs = registrations(load(spark, SF, "customer")).localCheckpoint(
        eager=True
    )
    src = str(tmp_path / "er_src")
    # adversarial order: v2 variants, then v1 variants, then originals
    for lo, hi in [
        (_ER_V2_OFFSET, 10_000_000),
        (_ER_V1_OFFSET, _ER_V2_OFFSET),
        (0, _ER_V1_OFFSET),
    ]:
        regs.filter(
            (F.col("reg_id") >= lo) & (F.col("reg_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "er_state")
    stream = (
        spark.readStream.schema("reg_id bigint, name string, nk bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_entity_resolution(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_er"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["reg_id"]: r["entity_id"]
        for r in read_resolved_entities(spark, state).collect()
    }
    assert got == want

    # the merge case really happened: the two variant-only batches
    # produced NO edges (variants are distance 2 from each other), so
    # the %60 customers' variants sat in separate entities until the
    # parents' batch bridged them
    from etl_pipeline_candy_store_spark.streaming.neardup_stream import (
        _read_state,
    )

    pairs_before = (
        _read_state(spark, f"{state}/pairs", "ra bigint, rb bigint")
        .filter(F.col("batch") < 2)
        .count()
    )
    assert pairs_before == 0, (
        "variants must not match each other directly (distance 2)"
    )

    # crash replay of the bridging batch (the originals) is idempotent
    apply_er_batch(regs.filter(F.col("reg_id") < _ER_V1_OFFSET), state, 2)
    again = {
        r["reg_id"]: r["entity_id"]
        for r in read_resolved_entities(spark, state).collect()
    }
    assert again == got


def test_resolution_quality_metrics(spark):
    """The ER quality audit must report perfect recall (transitive
    closure recovers every true pair INCLUDING variant-variant) and
    expose its counts consistently against the Python reference."""
    from etl_pipeline_candy_store_spark.operators.entity import (
        q215_resolution_quality,
    )

    customers = [
        (r["c_custkey"], r["c_name"], r["c_nationkey"])
        for r in load(spark, SF, "customer").collect()
    ]
    regs, _, entity = _py_reference(customers)
    comp: dict[int, list[int]] = {}
    for rid, e in entity.items():
        comp.setdefault(e, []).append(rid)
    implied = sum(len(m) * (len(m) - 1) // 2 for m in comp.values())
    truth = set()
    for ck, _, _ in customers:
        if ck % _ER_V1_MOD == 0:
            truth.add((ck, ck + _ER_V1_OFFSET))
        if ck % _ER_V2_MOD == 0:
            truth.add((ck, ck + _ER_V2_OFFSET))
            truth.add((ck + _ER_V1_OFFSET, ck + _ER_V2_OFFSET))
    hit = sum(1 for a, b in truth if entity[a] == entity[b])

    row = q215_resolution_quality(spark, SF).collect()[0]
    assert row["n_entities"] == len(comp)
    assert row["n_implied_pairs"] == implied
    assert row["n_true_pairs"] == len(truth)
    assert row["n_hit"] == hit
    assert row["pair_recall_ppm"] == 1_000_000, (
        "closure must recover every true pair, incl. variant-variant"
    )
    assert row["pair_precision_ppm"] == hit * 1_000_000 // implied


def test_er_state_compaction_preserves_resolution(spark, tmp_path):
    """Consolidating committed batch partitions must not change the
    resolved entities, must actually shrink the partition count, and a
    crash between the staged commit and the finish must be repaired on
    the next read with identical output."""
    import os
    import shutil

    from etl_pipeline_candy_store_spark.operators.entity import registrations
    from etl_pipeline_candy_store_spark.streaming.entity_stream import (
        apply_er_batch,
        compact_er_state,
        read_resolved_entities,
    )

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    regs = registrations(c).localCheckpoint(eager=True)
    state = str(tmp_path / "er_state")
    n_max = regs.agg(F.max("reg_id")).collect()[0][0] + 1
    cuts = [0, 400, 1_000_500, n_max]
    for b, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
        apply_er_batch(
            regs.filter((F.col("reg_id") >= lo) & (F.col("reg_id") < hi)),
            state,
            b,
        )
    want = sorted(
        map(tuple, read_resolved_entities(spark, state).collect())
    )

    stats = compact_er_state(spark, state, upto_batch=2)
    assert stats["blocked"] == 3 and stats["pairs"] == 3
    for kind in ("blocked", "pairs"):
        parts = [
            d
            for d in os.listdir(f"{state}/{kind}")
            if d.startswith("batch=")
        ]
        assert parts == ["batch=2"]
    got = sorted(map(tuple, read_resolved_entities(spark, state).collect()))
    assert got == want

    # a new batch after compaction still probes the consolidated state:
    # replay batch 2's slice as batch 3 (redelivery shape) — idempotent
    apply_er_batch(
        regs.filter(F.col("reg_id") >= 1_000_500), state, 3
    )
    got2 = sorted(
        map(tuple, read_resolved_entities(spark, state).collect())
    )
    assert got2 == want

    # crash between staged commit and finish: re-fragment via batch 4,
    # stage a new compaction, then "crash" by skipping the finish —
    # simulated by manufacturing the stage dir state by hand
    apply_er_batch(
        regs.filter(F.col("reg_id") < 0), state, 4
    )  # empty batch still writes its partitions
    df = spark.read.parquet(f"{state}/blocked")
    staged = str(tmp_path / "staged_copy")
    df.drop("batch").coalesce(2).write.parquet(staged)
    stage = f"{state}/blocked/.compact_stage"
    shutil.copytree(staged, stage)
    with open(f"{stage}/_UPTO", "w") as fh:
        fh.write("4\n")
    got3 = sorted(
        map(tuple, read_resolved_entities(spark, state).collect())
    )
    assert got3 == want
    assert not os.path.isdir(stage), "repair must finish the rename"
    parts = [
        d for d in os.listdir(f"{state}/blocked") if d.startswith("batch=")
    ]
    assert parts == ["batch=4"]


def test_er_materialized_closure_pinned_reader(spark, tmp_path):
    """read_resolved_entities_materialized: same rows as the direct
    read, no rebuild on a repeat read, rebuild on a new batch, and the
    pinned-reader guarantee across prune (the test_materialize pattern
    applied to ER state)."""
    import os

    from etl_pipeline_candy_store_spark.operators.entity import registrations
    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_versions,
        prune_materialized,
    )
    from etl_pipeline_candy_store_spark.streaming.entity_stream import (
        apply_er_batch,
        read_resolved_entities,
        read_resolved_entities_materialized,
    )

    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    regs = registrations(c).localCheckpoint(eager=True)
    state = str(tmp_path / "er_state")
    store = str(tmp_path / "store")
    apply_er_batch(regs.filter(F.col("reg_id") < 1_000_000), state, 0)

    reader_a = read_resolved_entities_materialized(spark, state, store)
    rows_a = sorted(map(tuple, reader_a.collect()))
    assert rows_a == sorted(
        map(tuple, read_resolved_entities(spark, state).collect())
    )
    assert len(materialized_versions("er_resolved", store)) == 1
    # repeat read: fingerprint hit, still one stored generation
    read_resolved_entities_materialized(spark, state, store).count()
    assert len(materialized_versions("er_resolved", store)) == 1

    # a new batch changes the state fingerprint -> one rebuild
    apply_er_batch(regs.filter(F.col("reg_id") >= 1_000_000), state, 1)
    rows_b = sorted(
        map(
            tuple,
            read_resolved_entities_materialized(spark, state, store).collect(),
        )
    )
    assert rows_b == sorted(
        map(tuple, read_resolved_entities(spark, state).collect())
    )
    assert len(materialized_versions("er_resolved", store)) == 2
    # generation A is still pinned-readable after B landed
    assert sorted(map(tuple, reader_a.collect())) == rows_a

    # retention: prune to the latest; the pinned reader must now either
    # return the SAME rows or fail loudly — never silently diverge
    removed = prune_materialized("er_resolved", keep=1, store_dir=store)
    assert len(removed) == 1
    try:
        post = sorted(map(tuple, reader_a.collect()))
    except Exception:
        pass
    else:
        assert post == rows_a
