"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {"q01": <sec>, ...}, "sf": 0.1}

The printed line is COMPACT — per-query keys are the qNN prefix, the
extras/memo/name-list fields live only in the file artifact — because
the driver records just a 2000-char stdout TAIL: rounds 9-14 printed
the full result map and the driver's BENCH_r*.json came back
`parsed: null` (the line overflowed the tail). The complete result —
full query names, extras, memo attribution, CORE/ROTATING split — is
always written to $SPARK_GRAFT_BENCH_OUT (default
BENCH_FULL_latest.json); the round ritual commits it as
BENCH_FULL_r<N>.json.

Each query is fully executed via the noop sink (forces the whole plan —
joins, aggregations, pandas operators — without write-side cost).
Headline timings are the MEDIAN of 3 reps per query (the "reps"/"stat"
fields say so); rounds ≤7 reported best-of-2, which reads ~10-20% lower
on the same code — compare medians to medians across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ---------------------------------------------------------------------------
# CORE: the pinned cross-round anchor set — NEVER add to, remove from, or
# reorder this list (r13 freeze). It is the 8 round-1 queries (the vs_r01
# baseline every round compares against) plus one representative per
# operator family that had none in round 1. Long-run regression tracking
# needs a denominator that does not move: before this freeze, 85 of 93
# headline queries had no stable anchor, so a regression in an old family
# could hide behind churn in the additions. `core_total` /
# `core_total_normalized` in the output line track EXACTLY this set;
# round additions go in ROTATING below and move only `headline_total`.
# ---------------------------------------------------------------------------
CORE = [
    # -- the 8 round-1 anchors (vs_r01 geomean material)
    "q01_pricing_summary",      # scan-heavy agg
    "q03_broadcast_join_agg",   # broadcast join
    "q04_multi_join_region",    # multi-way shuffle join
    "q09_window_running_sum",   # window
    "q23_daily_summary",        # two-level agg (flagship)
    "q30_allocation_sequential",  # applyInPandas stateful op
    "q52_minhash_lsh_pairs",    # MinHash-LSH dedup pipeline
    "q60_cosine_topk",          # brute-force similarity baseline
    # -- one representative per family added after round 1
    "q51_ngram_jaccard_pairs",  # shingle equi-join near-dup family
    "q64_lsh_neardup",          # bucketed vector-ANN family
    "q84_gap_fill",             # timeseries densify/fill family
    "q88_histogram_quantile",   # mergeable-sketch family
    "q122_repetition_signals",  # text-analysis / quality-gate family
    "q136_pagerank",            # iterative-graph family
    "q173_regional_revenue_cycle",  # TPC-H multi-join family
    "q203_dup_span_scrub",      # corpus-rewrite family
    "q206_unigram_encode",      # tokenizer/unigram-LM family
    "q217_fellegi_sunter",      # record-linkage family
    "q233_gate_attribution",    # composed curation-audit family
]

# ROTATING: per-round additions and everything else in the headline —
# may grow or shrink between rounds; contributes to headline_total only.
ROTATING = [
    "q44_tfidf_top_term",       # text analysis (tokenize + idf join)
    "q49_token_chunking",       # context-window chunking (shuffle-free fan-out)
    "q68_simhash_neardup",      # banded simhash near-dup (bit-signature path)
    "q69_sq8_search",           # int8-quantized similarity search
    "q86_count_min_topk",       # Count-Min sketch heavy hitters
    "q91_dup_shingle_fraction", # cross-doc duplicated-n-gram profile
    "q93_epoch_shuffle",        # deterministic training-order shuffle
    "q98_blocked_cosine_pairs", # rare-token-blocked sparse similarity
    "q103_event_funnel",        # ordered-stage conversion funnel
    "q106_kmeans_update",       # k-means Lloyd iteration (assign + update)
    "q107_bigram_lm",           # smoothed bigram LM table
    "q108_rolling_active_users",  # DAU / trailing-7d WAU
    "q110_feature_covariance",  # per-partition numpy Gram fold (r4)
    "q119_vocab_growth",        # two-level bucketed prefix sum (r4)
    "q126_pq_adc_search",       # PQ-ADC compressed search (r5)
    "q128_sampled_ann_recall",  # broadcast-sample recall estimator (r5)
    "q129_pq_code_dedup",       # zero-join semantic dedup by PQ code (r5)
    "q130_feature_hashing",     # hashing-trick vectorizer (r5)
    "q137_probe_auc",           # tie-corrected distributed AUC (r5)
    "q140_dup_span_profile",    # substring-dedup span gate (r5)
    "q141_token_budget_mix",    # per-source token-budget selection (r5)
    "q146_market_share",        # 7-relation broadcast join tree (r5)
    "q151_conversion_paths",    # session-windowed sequence matching (r5)
    "q152_lexical_diversity",   # TTR/hapax per source (r5)
    "q162_ewma_daily_orders",   # per-series integer fold recursion (r5)
    "q164_incremental_rollup",  # partial-aggregate merge maintenance (r5)
    "q165_robust_outliers",     # median/MAD gate, broadcast constants (r5)
    "q142_canonical_by_pagerank",  # checkpointed pair-relation composition (r6)
    "q176_returns_ranking",     # TPC-H Q10 windowed top-k (r6)
    "q180_large_orders",        # TPC-H Q18 semi-aggregation (r6)
    "q188_khop_reachability",   # semi-naive bounded closure (r9)
    "q189_triangle_count",      # degree-ordered triangle counting (r9)
    "q190_peak_concurrency",    # interval sweep-line, calendar-bounded window (r9)
    "q191_pareto_frontier",     # 2-D skyline via two-level prefix min (r9)
    "q192_variant_extract",     # VARIANT parse-once typed shredding (r9)
    "q193_hybrid_retrieval_rrf",  # BM25+vector RRF slate fusion (r9)
    "q194_forget_propagation",  # deletion-closure governance audit (r9)
    "q199_semantic_decontamination",  # broadcast-panel embedding screen (r9)
    "q200_temperature_mixture",  # alpha-smoothed source mixing weights (r9)
    "q201_license_clearance",   # license propagation through dup clusters (r9)
    "q202_importance_weights",  # DSIR log2-binned importance selection (r9)
    "q204_dup_span_scrub_3pass",  # bounded 3-pass scrub composition (r10)
    "q205_media_phash_neardup",  # byte-profile phash banded Hamming (r10)
    "q207_unigram_em_step",     # hard-EM piece re-estimation (r10)
    "q209_kcore",               # bounded k-core peel of the dup graph (r10)
    "q210_label_propagation",   # deterministic LPA communities (r10)
    "q211_bootstrap_pass_rate", # multiplier-bootstrap CI for funnel yield (r10)
    "q212_unigram_encode_em2",  # full EM cycle: prune + re-Viterbi encode (r10)
    "q213_entity_resolution",   # blocked record linkage + entity closure (r10)
    "q214_blocking_quality",    # pair completeness / reduction ratio (r10)
    "q215_resolution_quality",  # entity-level pair precision/recall (r10)
    "q218_blocking_quality_multi",  # per-pass + union blocking audit (r11)
    "q219_unigram_train_trajectory",  # 3-iteration EM training trajectory (r11)
    "q220_fellegi_sunter_em",   # unsupervised EM of the FS m/u weights (r11)
    "q221_khop_recursive_native",  # Spark 4 native WITH RECURSIVE walk (r12)
    "q222_quality_quantile_gate",  # per-source discrete-quantile gate (r12)
    "q223_source_caps",         # per-domain top-k cap (WindowGroupLimit) (r12)
    "q225_shingle_diversity",   # per-source distinct/total shingle ppm (r12)
    "q226_containment_pairs",   # asymmetric quote/subset near-dup (r12)
    "q228_normalized_dedup",    # canonicalize-then-digest dedup (r12)
    "q229_boilerplate_segments",  # CCNet-shape frequency segment scrub (r12)
    "q231_source_divergence",   # per-source TVD drift vs rest-of-corpus (r12)
    "q232_quality_histogram_gate",  # zero-sort histogram quantile gate (r12)
    "q234_simpson_diversity",   # frequency-weighted token diversity (r12)
    "q235_zipf_fit",            # integer log2 rank-frequency slope (r12)
    "q236_quality_rate_chi2",   # per-source 2x2 chi-square drift test (r12)
    "q237_dup_cluster_profile", # near-dup cluster-size distribution (r12)
    "q238_contamination_by_source",  # eval-overlap attribution by domain (r12)
    "q239_winnow_neardup",      # MOSS winnow-fingerprint near-dup pairs (r12)
    "q240_boilerplate_by_source",  # per-domain boilerplate token share (r12)
    "q242_split_balance_audit",  # per-source split chi-square audit (r12)
    "q243_intra_source_drift",  # early-vs-late cohort TVD per source (r12)
    "q244_embedding_outliers",  # farthest-from-centroid scrub list (r12)
    # r13: q241 (unbounded agreement matrix) left the headline when it
    # was demoted to a guarded baseline (quadratic-ish SimHash leg on
    # template-dense data, like q61/q96); q246 is its bounded
    # replacement and carries the agreement-matrix cost here instead.
    "q245_simhash_neardup_bounded",  # band-bucket-capped simhash pairs (r13)
    "q246_neardup_family_agreement_bounded",  # probed 3-detector matrix (r13)
    "q247_neardup_dispatch_signals",  # oracle-verified dispatch probe (r13)
    "q248_containment_pairs_bounded",  # df-banded containment join (r14)
    "q249_edit_distance_bounded",  # block-capped edit-distance pairs (r14)
    "q251_exact_dup_spans",  # character-exact maximal dup spans (r15)
    "q252_dup_span_profile_exact",  # per-doc exact dup-coverage gate (r15)
    "q253_exact_span_scrub",  # exact-span removal rewrite (r15)
]

# The full headline sweep (tools consume this name: scale_probe budgets,
# plan_audit's plan-facts table). CORE entries run first so a
# harness-truncated bench still yields the cross-round anchors.
HEADLINE = CORE + ROTATING
assert len(HEADLINE) == len(set(HEADLINE)), "CORE/ROTATING overlap"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from etl_pipeline_candy_store_spark.session import get_spark
    from etl_pipeline_candy_store_spark.plans import catalog

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    catalog._ensure_loaded()

    # Warm the JVM/parquet footers so the first query doesn't pay session
    # startup; excluded from timings.
    catalog.load(spark, sf_dir, "lineitem").count()

    from etl_pipeline_candy_store_spark.operators.memo import memo_stats

    # Host-calibration probe: a fixed-size, sf-independent, CPU-bound JVM
    # job (xxhash64 fold over 4B longs — whole-stage codegen, no I/O, no
    # shuffle; max() not sum() because the session runs ANSI mode and a
    # long sum overflows). Two rounds in a row the headline moved for
    # HOST reasons (r10 0.93x, r11 1.20x on untouched queries) and
    # judges had to adjudicate by re-running; this scalar makes the
    # drift visible in the artifact itself. CAL_REF_SEC is the median
    # probe time on the round-12 host (measured 0.588-0.629 over 5
    # reps); headline_total_normalized = headline_total *
    # (CAL_REF_SEC / calibration_sec) — compare NORMALIZED totals across
    # rounds, per-query medians within a round.
    #
    # r15 hardening (the probe swung 0.69->1.29 within one r14 session,
    # making normalized cross-round comparisons unusable twice): the
    # probe is no longer one 3-rep burst at session start — single-probe
    # reps are taken INTERLEAVED through the headline sweep (before it,
    # after each quarter, after it), calibration_sec is the MEDIAN of
    # those 5 and calibration_probes/_spread expose the within-session
    # swing. A spread near the r14 2x means the host is too noisy for
    # normalization that session — the round gate's perf criterion is
    # therefore stated on RAW core_total (frozen CORE set) with a ±10%
    # tolerance; normalized totals are secondary, for cross-host reads.
    CAL_REF_SEC = 0.61  # round-12 reference host, median of 5

    def _cal_probe() -> float:
        from pyspark.sql import functions as F

        t0 = time.time()
        spark.range(4_000_000_000).select(
            F.max(F.xxhash64("id"))
        ).collect()
        return round(time.time() - t0, 3)

    cal_probes: list[float] = [_cal_probe()]

    # memo_chain_cold: the session is fresh here, so the first execution
    # of a memo-chain consumer pays the FULL pairs→clusters→pagerank
    # build + the query itself. The headline sweep below then reports
    # the warm steady state (disclosed via per-query memo attribution);
    # this extras entry keeps the cold cost visible in the same artifact.
    extras: dict[str, float] = {}
    t0 = time.time()
    catalog.REGISTRY["q142_canonical_by_pagerank"].builder(
        spark, sf_dir
    ).write.format("noop").mode("overwrite").save()
    extras["memo_chain_cold_q142"] = round(time.time() - t0, 3)

    # q216 demo cost lives in extras, NOT the headline: the conformance
    # query rebuilds its temp corpus state from the 6/7 slice on every
    # execution (~3x the next most expensive headline entry), a cost that
    # belongs to the demo, not the production stateful path — which
    # amortizes and is gated separately by tools/pipeline_probe.py
    # (PIPELINE_SCALE_r*.json incremental ratio). One rep: the number
    # tracks presence, the probe tracks performance.
    t0 = time.time()
    catalog.REGISTRY["q216_incremental_exact_neardup"].builder(
        spark, sf_dir
    ).write.format("noop").mode("overwrite").save()
    extras["q216_incremental_exact_neardup_1rep"] = round(time.time() - t0, 3)

    # median-of-3 per query: single-rep timings carry ±30% rep-to-rep
    # noise (SCALE_NOTES r7 — a phantom q51 "regression" came from one),
    # and best-of-N biases low. Three reps, median: the first rep pays
    # codegen/JIT warmup and lands as the max in the typical case, so
    # the median is a warm steady-state rep without dedicated untimed
    # warm-up passes (keeps total bench time inside harness budgets).
    REPS = 3
    timings: dict[str, float] = {}
    # per-query session-memo attribution: a query whose reps consumed a
    # warm memo reports steady-state time, not chain-build time — the
    # artifact records which ones did so cross-round deltas stay
    # attributable (the cold cost is the memo_chain_cold extras entry)
    memo_touched: dict[str, dict[str, int]] = {}
    # calibration probe points at the quarter marks of the sweep (plus
    # the one before it and one after) — see the r15 hardening note above
    _marks = {len(HEADLINE) // 4, len(HEADLINE) // 2, (3 * len(HEADLINE)) // 4}
    for i, name in enumerate(HEADLINE):
        builder = catalog.REGISTRY[name].builder
        before = memo_stats(spark)
        reps: list[float] = []
        for _ in range(REPS):
            t0 = time.time()
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        reps.sort()
        timings[name] = round(reps[len(reps) // 2], 3)
        after = memo_stats(spark)
        delta = {k: after[k] - before[k] for k in after}
        if any(delta.values()):
            memo_touched[name] = delta
        if i + 1 in _marks:
            cal_probes.append(_cal_probe())
    cal_probes.append(_cal_probe())
    calibration = sorted(cal_probes)[len(cal_probes) // 2]

    # hot-key allocator A/B on the 50%-hot-key shape (tools/hotkey_probe.py
    # at full size; here a fixed 8M-row instance — near the measured
    # local[32] crossover — so the per-round bench tracks both strategies'
    # wall time): one key holds half the rows and exhausts ~75% through —
    # the partition-sorted operator serializes the hot key in one task,
    # allocate_bucketed runs contiguous sequence buckets in parallel with
    # a one-shot suffix repair.
    from pyspark.sql import functions as F

    from etl_pipeline_candy_store_spark.operators.allocation import (
        allocate,
        allocate_bucketed,
        allocate_sequential,
    )

    def _hk_frame(total: int, exhaust: bool):
        hot = total // 2
        # exhaust=True: the hot key's stock runs out ~75% through (worst
        # case for the bucketed path's optimism — phase 2 must repair);
        # exhaust=False: stock covers everything (phase 2 skipped — the
        # shape where bucketing's parallel serial term pays off)
        hot_stock = int(hot * 1.5) if exhaust else 5 * total
        return (
            spark.range(total)
            .select(
                F.when(F.col("id") < hot, F.lit(0))
                .otherwise((F.col("id") % 2000) + 1)
                .cast("int")
                .alias("key"),
                F.col("id").cast("long").alias("seq"),
                (F.col("id") % 3 + 1).cast("int").alias("qty"),
                F.when(F.col("id") < hot, F.lit(hot_stock))
                .otherwise(F.lit(10_000_000))
                .cast("long")
                .alias("stock"),
            )
            .repartition(int(cpus))
            .localCheckpoint()
        )

    hk_kw = dict(key_col="key", seq_cols=["seq"], qty_col="qty", stock_col="stock")
    # 8M exhaust shape (near the measured crossover): best-of-2 per strategy
    hk = _hk_frame(8_000_000, exhaust=True)
    for label, fn in [
        ("hotkey_allocate_sequential", lambda: allocate_sequential(hk, **hk_kw)),
        (
            "hotkey_allocate_bucketed",
            lambda: allocate_bucketed(hk, n_buckets=16, **hk_kw),
        ),
        ("hotkey_allocate_auto", lambda: allocate(hk, **hk_kw)),
    ]:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        extras[label] = round(best, 3)
    hk.unpersist()
    # 20M no-exhaust shape (above the crossover): single rep — this is
    # where the bucketed escape should clearly win and the dispatcher
    # must choose it (probe cost included in the auto timing). The
    # plain-sequential leg runs ~30-60s serial (its loss is the point —
    # measured 27-41s, recorded in SCALE_NOTES); it is opt-in via
    # SPARK_GRAFT_BENCH_FULL=1 so the default per-round bench stays
    # comfortably inside any harness timeout.
    hk = _hk_frame(20_000_000, exhaust=False)
    # untimed warm-up of the shared physical strategy (both timed legs
    # below execute the bucketed plan — auto dispatches to it at this
    # shape), so neither timed leg pays first-run codegen/JIT alone:
    # round 6 recorded auto 14.4s vs forced-bucketed 22.2s running the
    # IDENTICAL strategy purely from ordering (isolated fresh-session
    # re-measure, round 7: bucketed 11.2s, auto 14.4s incl. ~1.7s cold
    # probe — SCALE_NOTES "hot-key A/B, isolated").
    allocate_bucketed(hk, n_buckets=16, **hk_kw).write.format("noop").mode(
        "overwrite"
    ).save()
    hk20 = [
        (
            "hotkey20m_allocate_bucketed",
            lambda: allocate_bucketed(hk, n_buckets=16, **hk_kw),
        ),
        ("hotkey20m_allocate_auto", lambda: allocate(hk, **hk_kw)),
    ]
    if os.environ.get("SPARK_GRAFT_BENCH_FULL"):
        hk20.insert(
            0,
            (
                "hotkey20m_allocate_sequential",
                lambda: allocate_sequential(hk, **hk_kw),
            ),
        )
    # best-of-2: these legs run at the tail of a long session where a
    # single rep has shown one-off 2-3× inflation (GC/memory churn from
    # the headline sweep) that an isolated re-measure doesn't reproduce
    for label, fn in hk20:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        extras[label] = round(best, 3)
    hk.unpersist()

    # extras are fixed-size synthetic A/Bs: reported, but kept out of the
    # headline total so the sf-scaled number stays comparable across rounds
    total = round(sum(timings.values()), 3)
    out = {
        "queries": timings,
        "extras": extras,
        "memo_queries": memo_touched,
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "reps": REPS,
        "stat": "median",
        "calibration_sec": calibration,
        "calibration_probes": cal_probes,
        "calibration_spread": round(max(cal_probes) - min(cal_probes), 3),
        "calibration_ref_sec": CAL_REF_SEC,
        "headline_total_normalized": round(
            total * (CAL_REF_SEC / max(calibration, 1e-6)), 3
        ),
        # the pinned-anchor totals (bench.CORE, frozen r13): the ONLY
        # cross-round comparable totals — headline_total moves whenever
        # ROTATING grows, core_total moves only when the engine does
        "core_total": round(sum(timings[q] for q in CORE), 3),
        "core_total_normalized": round(
            sum(timings[q] for q in CORE)
            * (CAL_REF_SEC / max(calibration, 1e-6)),
            3,
        ),
    }
    # per-query delta vs the previous round's artifact, when present
    prior_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    if os.path.exists(prior_path):
        try:
            prior = json.load(open(prior_path))
            prior = prior.get("parsed", prior)["queries"]  # driver wraps the line
            out["vs_r01"] = {
                q: round(t / prior[q], 2) for q, t in timings.items() if q in prior
            }
            if out["vs_r01"]:
                import math

                out["vs_r01_geomean"] = round(
                    math.exp(
                        sum(math.log(r) for r in out["vs_r01"].values())
                        / len(out["vs_r01"])
                    ),
                    3,
                )
        except Exception:
            pass
    # The driver's BENCH_r* artifact keeps only the last ~2000 chars of
    # stdout (the r13 verdict could recover just ~25 of 95 per-query
    # medians; r14's parsed came back null outright). Persist the
    # COMPLETE result — every per-query median under its full name, the
    # frozen CORE / per-round ROTATING split, extras, memo attribution —
    # to a file the round ritual commits as BENCH_FULL_r<N>.json;
    # tools/bench_diff.py renders the per-query diff between two such
    # artifacts.
    out["core_queries"] = CORE
    out["rotating_queries"] = ROTATING
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_latest.json"
        ),
    )
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")

    # stdout gets ONE compact JSON line, printed LAST, sized to fit the
    # driver's 2000-char tail whole: per-query keys shortened to their
    # unique qNN prefix, the bulky fields (extras, memo map, name lists,
    # vs_r01 per-query ratios) left to the file artifact. If the line
    # ever outgrows the tail, the per-query map degrades to the frozen
    # CORE subset (with a marker) rather than overflowing — a parsed
    # artifact with the anchors beats an unparseable one with everything.
    short = {}
    for q, t in timings.items():
        k = q.split("_")[0]
        short[q if k in short else k] = t
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "reps": REPS,
        "stat": "median",
        "calibration_sec": calibration,
        "calibration_spread": out["calibration_spread"],
        "core_total": out["core_total"],
        "core_total_normalized": out["core_total_normalized"],
        "headline_total_normalized": out["headline_total_normalized"],
        "vs_r01_geomean": out.get("vs_r01_geomean"),
        "full_artifact": os.path.basename(full_path),
        "queries": short,
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:
        compact["queries"] = {
            q.split("_")[0]: timings[q] for q in CORE
        }
        compact["queries_truncated_to_core"] = True
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
