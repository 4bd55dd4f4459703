"""Structural invariants for the training-order / bucketing operators —
the oracle proves value equality; these pin the properties downstream
consumers (training loaders) actually rely on."""

from __future__ import annotations

from collections import Counter

from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    _ensure_loaded()
    return REGISTRY[name].builder(spark, SF).collect()


def test_epoch_shuffle_positions_contiguous(spark):
    rows = _rows(spark, "q93_epoch_shuffle")
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # every shard's positions are exactly 1..n with no gaps or dups —
    # a loader can stream a shard by position without a sort
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # and the doc set is a partition of the corpus (each doc once)
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_epoch_shuffle_is_rerun_identical(spark):
    a = {(r["doc_id"], r["shard"], r["pos"]) for r in _rows(spark, "q93_epoch_shuffle")}
    b = {(r["doc_id"], r["shard"], r["pos"]) for r in _rows(spark, "q93_epoch_shuffle")}
    assert a == b


def test_weighted_interleave_rates(spark):
    rows = _rows(spark, "q100_weighted_interleave")
    # within each source: contiguous positions, stride arithmetic exact
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        ps = sorted(x["pos_in_source"] for x in rs)
        assert ps == list(range(1, len(ps) + 1)), src
        w = 3 if int(src[3:]) % 2 == 0 else 1
        for x in rs:
            assert x["virtual_time"] == x["pos_in_source"] * (3000 // w)
    # reading in (virtual_time, source) order draws weighted sources
    # ~3x as often in any early prefix (until a source exhausts)
    ordered = sorted(rows, key=lambda r: (r["virtual_time"], r["source"]))
    prefix = Counter(
        3 if int(r["source"][3:]) % 2 == 0 else 1 for r in ordered[:120]
    )
    assert prefix[3] > 2 * prefix[1]


def test_length_deciles_monotone(spark):
    _ensure_loaded()
    from etl_pipeline_candy_store_spark.plans.catalog import load

    deciles = {
        r["doc_id"]: r["decile"] for r in _rows(spark, "q99_length_deciles")
    }
    lengths = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, SF, "documents").select("doc_id", "n_chars").collect()
    }
    pairs = sorted(((lengths[d], deciles[d]) for d in deciles))
    assert all(0 <= dec <= 9 for _, dec in pairs)
    # longer doc never lands in a lower decile
    for (l1, d1), (l2, d2) in zip(pairs, pairs[1:]):
        assert d1 <= d2 or l1 == l2
