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


def test_boilerplate_segments_invariants(spark):
    rows = _rows(spark, "q229_boilerplate_segments")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    ntoks = {r["doc_id"]: len(r["text"].split(" ")) for r in docs}
    assert len(rows) == len(ntoks)  # every doc reported exactly once
    for r in rows:
        n = ntoks[r["doc_id"]]
        assert r["n_segments"] == (n + 7) // 8
        assert 0 <= r["boiler_segments"] <= r["n_segments"]
        # kept tokens never exceed the doc; a fully-clean doc keeps all
        assert 0 <= r["kept_tokens"] <= n
        if r["boiler_segments"] == 0:
            assert r["kept_tokens"] == n


def test_boilerplate_segments_directed(spark):
    # a segment shared verbatim by 3 docs is scrubbed from ALL of them;
    # one shared by only 2 survives
    boiler = "a b c d e f g h"
    twice = "p q r s t u v w"
    docs = [
        (1, boiler + " x1 y1 z1 w1 v1 u1 t1 s1"),
        (2, boiler + " x2 y2 z2 w2 v2 u2 t2 s2"),
        (3, boiler + " x3 y3 z3 w3 v3 u3 t3 s3"),
        (4, twice + " k1 k2 k3 k4 k5 k6 k7 k8"),
        (5, twice + " m1 m2 m3 m4 m5 m6 m7 m8"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _BOILER_DF,
        _segments,
    )
    import pyspark.sql.functions as F

    segs = _segments(d)
    df = segs.groupBy("seg_text").agg(
        F.countDistinct("doc_id").alias("df")
    )
    flagged = {
        r["seg_text"] for r in df.filter(F.col("df") >= _BOILER_DF).collect()
    }
    assert boiler in flagged
    assert twice not in flagged


def test_systematic_sample_covers_token_mass(spark):
    rows = _rows(spark, "q230_systematic_weighted_sample")
    total_picks = sum(r["picks"] for r in rows)
    # one pick per step across the whole axis: between k-1 and k+1
    # (boundary docs can straddle), each pick multiplicity >= 1
    assert 39 <= total_picks <= 41
    assert all(r["picks"] >= 1 for r in rows)
    # a doc can never be picked more often than its weight spans steps
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    wt = {r["doc_id"]: len(r["text"].split(" ")) for r in docs}
    step = sum(wt.values()) // 40
    for r in rows:
        assert r["picks"] <= wt[r["doc_id"]] // step + 1


def test_source_divergence_bounds(spark):
    rows = _rows(spark, "q231_source_divergence")
    assert len(rows) == 20  # every source scored
    for r in rows:
        # TVD is a metric in [0, 1] → [0, 1e6] ppm
        assert 0 <= r["tvd_ppm"] <= 1_000_000


def test_source_divergence_detects_drift(spark):
    # 3 sources of shared vocab + 1 source of disjoint vocab: the
    # drifted source's TVD is ~1e6, the others' far lower
    rows = []
    for s in range(3):
        for i in range(20):
            rows.append((s * 100 + i, f"src{s}", "tok%d tok%d tok%d" % (i % 5, (i + 1) % 5, (i + 2) % 5)))
    for i in range(20):
        rows.append((900 + i, "src9", "alien%d alien%d" % (i % 3, (i + 1) % 3)))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    import pyspark.sql.functions as F
    from etl_pipeline_candy_store_spark.operators import corpus_curation as cc

    toks = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    sc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").cast("long").alias("s"))
    tt = sc.groupBy("tok").agg(F.sum("c").cast("long").alias("ct"))
    tot = sc.agg(F.sum("c").cast("long").alias("t"))
    grid = (
        st.crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tot))
        .join(sc, ["source", "tok"], "left")
        .select("source", "s", "ct", "t", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    out = {
        r["source"]: r["tvd_ppm"]
        for r in grid.groupBy("source")
        .agg(
            F.expr(
                "cast(sum(abs((c * 1000000) div s"
                " - ((ct - c) * 1000000) div (t - s))) div 2 as bigint)"
            ).alias("tvd_ppm")
        )
        .collect()
    }
    assert out["src9"] > 990_000  # disjoint vocab → near-total divergence
    assert all(v < 400_000 for k, v in out.items() if k != "src9")


def test_histogram_gate_vs_exact_quantile(spark):
    kept = {r["doc_id"] for r in _rows(spark, "q232_quality_histogram_gate")}
    exact = {r["doc_id"] for r in _rows(spark, "q222_quality_quantile_gate")}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n_by_src = Counter(r["source"] for r in docs)
    # bin-granular gate keeps AT LEAST what the exact quantile keeps
    # per the keep-threshold-bin-ties rule, and never drops below 75%
    # of any source
    kept_by_src = Counter(
        r["source"] for r in docs if r["doc_id"] in kept
    )
    for src, n in n_by_src.items():
        assert kept_by_src[src] * 4 >= 3 * n, src
    # the histogram gate's threshold bin contains the exact threshold,
    # so every exact-kept doc is histogram-kept
    assert exact <= kept


def test_boilerplate_by_source_consistency(spark):
    rows = _rows(spark, "q240_boilerplate_by_source")
    assert len(rows) == 20
    q229 = _rows(spark, "q229_boilerplate_segments")
    assert sum(r["boiler_segments"] for r in rows) == sum(
        r["boiler_segments"] for r in q229
    )
    for r in rows:
        assert 0 <= r["boiler_ppm"] <= 1_000_000
        assert r["boiler_tokens"] <= r["boiler_segments"] * 8
