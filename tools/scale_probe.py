"""Scale probe + regression GATE: replicate the sf0.1 fact tables K×
(key-shifted) into a temp dir, run the headline queries there, and
compare timings against per-query growth budgets — evidence that the
plans scale linearly rather than degrading (the thing local[32] can
actually demonstrate about the 100 TB posture), enforced by exit code
instead of hand-read prose.

    python tools/scale_probe.py [K] [--out SCALE_rN.json] [--only q103,...]

Gate semantics: a query FAILS when ``t_big > budget × max(t_base,
FLOOR_SEC)``. The budget defaults to ``K × SLACK`` (linear growth plus
measured rep-to-rep noise headroom — SCALE_NOTES documents ±30% single
reps, so base timings are median-of-3 and SLACK adds the rest); named
agg-collapse queries (fixed output domain, cost = one scan + tiny agg)
get the tighter ``K × 1.0``. ``FLOOR_SEC`` keeps overhead-dominated
denominators (sub-½-second base runs, mostly fixed JVM/task-launch cost)
from manufacturing scary-looking ratios — the round-7 q167 "7.3×" was
exactly that artifact. Exit code 1 on any violation; the JSON artifact
(``--out``) records timings, budgets, and verdicts for the round record.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

HEADLINE = [
    "q01_pricing_summary",
    "q03_broadcast_join_agg",
    "q04_multi_join_region",
    "q09_window_running_sum",
    "q23_daily_summary",
    "q30_allocation_sequential",
    # document-corpus operators (round 4/5): the expanded documents
    # table grows K× in docs AND vocabulary (per-replica token suffix)
    # q51 gates the Jaccard pair-relation BUILD itself: its builder
    # derives the shingle join directly (no checkpoint memo), so the
    # warm-up-discard discipline — which hides the build inside the
    # checkpoint consumers q123/q142 — still times the full build here
    "q51_ngram_jaccard_pairs",
    "q89_vocab_coverage",
    "q119_vocab_growth",
    "q122_repetition_signals",
    "q123_cross_source_dup_matrix",
    # ANN search paths (round 5): corpus grows K×, query/codebook/stats
    # sides stay fixed (vec_id < 16 are the originals), so these must
    # scale with the scan, not the pair space. q64 is deliberately NOT
    # probed this way: replicated vectors are near-dups of their
    # sources by construction, so its PAIR OUTPUT grows ~K² — that
    # measures the generator, not the plan.
    "q60_cosine_topk",
    "q69_sq8_search",
    "q126_pq_adc_search",
    # round-5 additions: q128's query sample is fixed (bounded id range)
    # so its cost is O(sample × corpus); q129/q130 are single keyed
    # aggregations after a row-local projection — all must track the
    # scan linearly.
    "q128_sampled_ann_recall",
    "q129_pq_code_dedup",
    "q130_feature_hashing",
    # round-5 batch 2: q136's edge set grows linearly (replica token
    # suffixes keep near-dup pairs within a replica); q137/q140/q141
    # are keyed aggs + bucket-partitioned windows; q138 joins the K×
    # fact to the K× dim through the salt fan-out
    "q136_pagerank",
    "q137_probe_auc",
    "q138_salted_join_revenue",
    "q140_dup_span_profile",
    "q141_token_budget_mix",
    # round-5 batch 3: q146 joins the K× fact through 6 broadcast dims;
    # q147's per-part threshold agg grows with the fact; q155 range-joins
    # the K× fact to its K×-order-derived SCD2 history on the customer key
    "q146_market_share",
    "q147_small_qty_revenue",
    "q155_point_in_time_join",
    # round-5 batch 4: q157's disjunctive pushdown and q158/q159's
    # semi/anti chains track the K× lineitem scan (dims stay fixed);
    # q162/q163's fold recursions and q164's partial-merge rollup are
    # keyed aggs over the K× orders whose group count (days / months)
    # is fixed; q165's median/MAD runs two 5-group percentile aggs over
    # the K× fact.
    "q157_disjunctive_revenue",
    "q158_sole_supplier_orders",
    "q159_supplier_diversity",
    "q162_ewma_daily_orders",
    "q163_cusum_alarm",
    "q164_incremental_rollup",
    "q165_robust_outliers",
    # q167 left-joins the FIXED customer dim to the K× orders — the
    # per-customer counts grow with the fact, the second agg's domain
    # (distinct counts) stays tiny.
    "q167_order_count_distribution",
    # round-7: the events family, over a K× events table whose replicas
    # are DISJOINT in both user space and time (user_id- and ts-shifted
    # per replica, 31 days apart) so sessions/funnels/windows never
    # merge across replicas: user count grows K× (q103/q151 funnel and
    # attribution state per user), window-bucket count grows K× (q108's
    # rolling frame, q168's hopping buckets) — the "more time, more
    # users, more data" shape a year of 100 TB telemetry actually has.
    "q103_event_funnel",
    "q108_rolling_active_users",
    "q151_conversion_paths",
    "q166_click_attribution",
    "q168_hopping_window_traffic",
    # round-6: the canonical TPC-H shapes — every one joins the K× facts
    # through fixed broadcast dims or keyed aggs whose group domain is
    # dimension-sized (nations, priorities, parts), so all must track
    # the scan. q176/q180's top-k stays TakeOrderedAndProject at any K;
    # q142 rides the checkpointed pair relation (grows with the corpus).
    "q142_canonical_by_pagerank",
    "q173_regional_revenue_cycle",
    "q174_nation_trade_volume",
    "q175_profit_by_nation_year",
    "q176_returns_ranking",
    "q177_ship_delay_bands",
    "q178_promo_share",
    "q179_top_supplier",
    "q180_large_orders",
    "q181_dominant_part_suppliers",
    "q182_idle_rich_customers",
    "q183_min_cost_supplier",
    "q184_priority_order_check",
    "q185_forecast_revenue_change",
    "q186_important_part_value",
    # round-9 graph queries ride the checkpointed pair relation, which
    # grows linearly (replica token suffixes keep near-dup pairs inside
    # a replica, so per-hop frontiers and wedge fan-outs grow K×, never
    # cross-replica). q190's interval deltas grow K× but its windowed
    # per-day relation stays calendar-bounded (replicas share dates).
    # q191 is NOT probed: part is a fixed broadcast-sized dimension
    # here (the operator's fact-scale path is the per-x aggregation,
    # already exercised by the probed keyed-agg family).
    "q188_khop_reachability",
    "q189_triangle_count",
    "q190_peak_concurrency",
    # q192 is one parse + one keyed agg over the K× events table — the
    # VARIANT path must track the scan like the rest of the keyed-agg
    # family.
    "q192_variant_extract",
    # round-9 batch 4: q199's eval panel is FIXED (vec_id < 16 keeps the
    # original vectors), so its cost is O(panel × K·corpus) — must track
    # the scan like q128. q201 rides the checkpointed cluster labels
    # (linear growth, warm-up pays the build) plus one labels⋈docs join
    # and a cluster-keyed window. q200 is a pure agg-collapse (fixed
    # source domain) — tight K×1.0 budget below.
    "q199_semantic_decontamination",
    "q200_temperature_mixture",
    "q201_license_clearance",
    # q202: one corpus explode -> vocab-keyed agg, totals broadcast,
    # one token-keyed equi-join back — the tf-idf/BM25 family; must
    # track the scan (vocab grows with the replica token suffixes).
    "q202_importance_weights",
    # q203 rewrites text: positional-shingle window + covered-position
    # anti-join + ordered re-aggregation — all doc- or shingle-keyed,
    # so it must track the corpus token count linearly.
    "q203_dup_span_scrub",
    # q204 is three q203 passes with lineage truncated between them —
    # same linear shape, 3× constant; later passes shrink as text is
    # removed, so it must stay within the same linear budget family.
    "q204_dup_span_scrub_3pass",
    # q205: byte-profile phash is one linear byte explode + media-keyed
    # aggs; band candidates grow ~n²/2^bits but stay row-cheap and the
    # white-noise replica signatures spread across buckets — measured
    # 1.5× at K=10. Unlike q68 the OUTPUT stays linear (only
    # parent-variant pairs qualify), so the probe measures the plan.
    "q205_media_phash_neardup",
    # q206/q207: the unigram Viterbi DP runs once per DISTINCT word (the
    # replica token suffixes grow the vocabulary K×, so the DP relation
    # itself grows K×) and encoding is a broadcast join onto the K×
    # exploded corpus plus a doc-keyed agg — both must track the scan.
    "q206_unigram_encode",
    "q207_unigram_em_step",
    # q209/q210 ride the checkpointed pair relation like q188/q189:
    # per-round cost is node-keyed joins/aggs over the K×-linear edge
    # set (replica suffixes keep pairs within replicas).
    "q209_kcore",
    "q210_label_propagation",
    # q211: one text scan for the flags, then a 32x fan-out of a
    # two-integer-column relation into a 32-group combinable agg -
    # must track the scan linearly.
    "q211_bootstrap_pass_rate",
    # q212: two vocabulary-bounded DP passes + one corpus encode join -
    # the q206 shape with a second (smaller, pruned) DP chain.
    "q212_unigram_encode_em2",
    # q213 is NOT probed: customer is a fixed dimension in this
    # expansion (like q191's part), so the probe would measure
    # overhead; its fact-scale path - the block-keyed equi-join with
    # in-block verify - is the q169/q51 blocked-join family, probed.
    # (q217/q218 are customer-based too - same exclusion.)
    # q216: builds exact near-dup state on the doc_id%7<>0 slice, then
    # runs the full corpus through the stateful path - two linear
    # shingle passes + the state-scan probe, the q51 family twice.
    "q216_incremental_exact_neardup",
    # q219: three EM iterations, each a vocabulary-bounded DP pass over
    # the distinct-word table (vocab grows Kx with the replica token
    # suffixes) + vocab-sized usage aggs - the q212 shape iterated.
    "q219_unigram_train_trajectory",
    # round-12: q221 rides the checkpointed pair relation like q188
    # (frontier growth is K×-linear — replica suffixes keep pairs inside
    # replicas); q222/q223 are per-source windows over the K× corpus
    # (source domain fixed, per-source data grows K× — q223's rank is a
    # WindowGroupLimit bounded heap); q224/q227 are keyed-agg collapses
    # with fixed group domains (tight budget); q225's distinct agg and
    # q226's containment join are the q51 shingle-keyed family;
    # q228/q229 are digest/segment-keyed aggs; q230's weight scan is
    # linear and its window runs over the doc-count relation; q231's
    # scoring grid is sources × vocab (vocab grows K× with the replica
    # suffixes — linear); q232 is two linear scans + a bins-sized
    # derivation.
    "q221_khop_recursive_native",
    "q222_quality_quantile_gate",
    "q223_source_caps",
    "q224_dataset_card",
    "q225_shingle_diversity",
    "q226_containment_pairs",
    "q227_k_anonymity_audit",
    "q228_normalized_dedup",
    "q229_boilerplate_segments",
    "q230_systematic_weighted_sample",
    "q231_source_divergence",
    "q232_quality_histogram_gate",
    # q233 composes the q50/q59/q122/q58 linear flag relations plus one
    # gate-count-sized collapse; q234/q235 are vocab-sized per-source
    # aggs/windows over the K×-vocab count relation; q236 is an
    # agg-collapse on the fixed source domain (tight budget).
    "q233_gate_attribution",
    "q234_simpson_diversity",
    "q235_zipf_fit",
    "q236_quality_rate_chi2",
    # q237 rides the memoized q54 component labels (warm-up pays the
    # build, like q142) plus two tiny aggs; q238 is q58's linear
    # shingle semi-join plus a source-domain agg.
    "q237_dup_cluster_profile",
    "q238_contamination_by_source",
    # q239: fingerprint-keyed self-join with the df-band cap bounding
    # fan-out; replica token suffixes keep shared fingerprints within
    # replicas, so pairs grow linearly — the q51/q226 family.
    "q239_winnow_neardup",
    # q240: q229's linear segment plan + a source-domain rollup.
    "q240_boilerplate_by_source",
    # q241 is NOT probed and (r13) now guarded, like q61/q96: on the
    # template-dense synthetic corpus the unbounded SimHash leg's
    # RESULT SET is quadratic-ish (q68's docstring documents this), so
    # the union's growth would measure the generator, not the plan.
    # Its bounded replacements ARE probed: q245 caps every band bucket
    # at 16 members (WindowGroupLimit), so candidate output is
    # bucket-bounded and growth must track the simhash build (the
    # linear distinct-token scan + doc-keyed agg); q246 composes the
    # three capped legs (q51 shingle df-band, q245 bucket cap, q239
    # fingerprint df-band) + a pair-keyed collapse — the whole matrix
    # is output-bounded, closing the one r12 scale-story gap. q246's
    # Jaccard leg rides the memoized pair relation like q237/q142
    # (warm-up pays the build; measured reps read checkpointed blocks).
    "q245_simhash_neardup_bounded",
    "q246_neardup_family_agreement_bounded",
    # q247: three-integer projection + combinable agg + a two-level
    # bucketed prefix sum over the value-cardinality-sized (n_tok,
    # count) relation (the probe the neardup() dispatcher reads) —
    # must track the scan.
    "q247_neardup_dispatch_signals",
    # q248 (r14): q226's containment join with the self-join side
    # df-banded [2, 64] — per-shingle fan-out capped at 64^2/2, so the
    # bounded variant must track the shingle scan where exact q226's
    # pair output can grow with the hottest shingle's df.
    "q248_containment_pairs_bounded",
    # q249 (r14): q169's prefix blocking with a per-block cap of 32
    # (WindowGroupLimit) + exact-neutral length pre-filter — replica
    # texts share prefixes with their originals, so the UNCAPPED q169
    # would grow its block joins ~K^2 (it is excluded for that reason);
    # the capped variant's candidates are blocks x 32^2/2 and must
    # track the scan + bounded heap.
    "q249_edit_distance_bounded",
    # q251/q252/q253 (r15): character-window explode (one row per
    # corpus char — linear by construction), 8-byte hash-df prefilter
    # exchange, exact string stages only on duplicated-region
    # survivors, pair join banded [2, 8] with a within-doc occ cap of
    # 4. NOTE the expanded corpus is char-level ADVERSARIAL, not just
    # bigger: the per-replica token suffixes lengthen every token, so
    # 3-token phrases shared within a replica cross the 24-char window
    # threshold that they sit under in the base corpus — in-band
    # windows grow super-K (a template-density shift, the shape that
    # forced these queries' survivor joins onto shuffle plans instead
    # of statically-estimated broadcasts). The probe verifies the
    # bounded plan SURVIVES that shift inside the linear budget.
    "q251_exact_dup_spans",
    "q252_dup_span_profile_exact",
    "q253_exact_span_scrub",
    # q242: one split projection + source-keyed agg-collapse (tight).
    "q242_split_balance_audit",
    # q243: the q231 grid with a 2-cohort split — per-source-vocab
    # sized, linear in the token scan; q244: q62's broadcast-centroid
    # scan + a bounded per-centroid WindowGroupLimit over the K× corpus.
    "q243_intra_source_drift",
    "q244_embedding_outliers",
]

FACTS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
KEEP = ["region", "nation", "customer", "supplier", "part"]


def expand(spark, src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in KEEP:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    reps = spark.range(k).withColumnRenamed("id", "_rep")
    for t, key in FACTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        max_key = df.agg(F.max(key)).collect()[0][0] + 1
        wide = df.crossJoin(reps).withColumn(
            key, F.col(key) + F.col("_rep") * F.lit(max_key)
        )
        if t == "lineitem":
            # keep the orders fk consistent with the shifted orderkeys
            pass
        wide.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            f"{dst}/{t}_dir"
        )
        # queries expect <table>.parquet paths; point a dir there
        os.rename(f"{dst}/{t}_dir", f"{dst}/{t}.parquet")

    expand_documents(spark, src, dst, reps)

    # events: K× rows with replicas disjoint in user space AND time —
    # user_ids shift per replica (funnel/session/attribution state never
    # merges across replicas) and timestamps shift 31 days per replica
    # (the base span is 30 days, so window buckets are disjoint too and
    # the hopping/rolling bucket count grows K×). Read through
    # catalog.load so the TIMESTAMP(NANOS) source normalizes to micros;
    # the rewrite lands as plain TIMESTAMP, which load passes through.
    from etl_pipeline_candy_store_spark.plans.catalog import load as _load

    if not os.path.exists(f"{src}/events.parquet"):
        # No events table: still expand embeddings (a source dir can carry
        # embeddings without events; the ANN family must see the K× corpus).
        print(f"scale_probe: {src} has no events table — skipping its expansion")
        _expand_embeddings(spark, src, dst, reps)
        return
    ev = _load(spark, src, "events")
    mx = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    if mx[0] is None or mx[1] is None:
        # empty events table: nothing to shift; copy it through so the
        # event-family queries still resolve (they'll see zero rows)
        print("scale_probe: events table is empty — copying through unshifted")
        shutil.copyfile(f"{src}/events.parquet", f"{dst}/events.parquet")
        _expand_embeddings(spark, src, dst, reps)
        return
    max_eid, max_uid = mx[0] + 1, mx[1] + 1
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("_rep") * F.lit(max_eid))
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(max_uid))
        .withColumn(
            "ts",
            F.timestamp_add("DAY", (F.col("_rep") * 31).cast("int"), F.col("ts")),
        )
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst}/events_dir")
    )
    os.rename(f"{dst}/events_dir", f"{dst}/events.parquet")

    _expand_embeddings(spark, src, dst, reps)


def expand_documents(spark, src: str, dst: str, reps) -> None:
    """K× docs with shifted doc_ids AND per-replica token suffixes
    ("_r<k>"), so each replica is new distinct content — the vocabulary
    grows K× (the realistic 10×-corpus shape for q89/q119) and replicas
    do NOT become artificial near-dups of their source (naive text
    copies would inflate the pair universe ~K², testing the data
    generator, not the plan). Replica 0 keeps the original text so the
    base corpus is a subset. ``reps`` is a one-column ``_rep`` frame
    (``spark.range(k).withColumnRenamed("id", "_rep")``). Shared by the
    per-query HEADLINE probe and ``tools/pipeline_probe.py`` (which
    expands ONLY documents — the curation pipeline's single input)."""
    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(f"{src}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    wide = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(max_doc))
        .withColumn(
            "text",
            F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda tok: F.concat(
                            tok, F.lit("_r"), F.col("_rep").cast("string")
                        ),
                    ),
                    " ",
                )
            ),
        )
        .drop("_rep")
    )
    wide.repartition(32).write.mode("overwrite").parquet(f"{dst}/documents_dir")
    os.rename(f"{dst}/documents_dir", f"{dst}/documents.parquet")


def _expand_embeddings(spark, src: str, dst: str, reps) -> None:
    # embeddings: K× vectors with shifted vec_ids, values unchanged —
    # the ANN queries' codebook/query/centroid seeds (vec_id < 16) stay
    # the ORIGINAL vectors, so only the searched corpus grows
    if not os.path.exists(f"{src}/embeddings.parquet"):
        print(f"scale_probe: {src} has no embeddings table — skipping")
        return
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(max_vec))
        .drop("_rep")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings_dir")
    )
    os.rename(f"{dst}/embeddings_dir", f"{dst}/embeddings.parquet")


#: Gate tuning. SLACK on top of linear growth absorbs measured noise
#: (±30% single reps per SCALE_NOTES; big-side runs are single-rep) plus
#: genuine super-constant-but-sub-quadratic terms like sort/shuffle
#: log-factors. FLOOR_SEC is the fixed per-query overhead regime
#: (planning + task launch on local[32]); base runs faster than it are
#: denominator artifacts, not measurements of the data-dependent term.
SLACK = 1.5
FLOOR_SEC = 0.6
#: Agg-collapse shapes: output domain fixed (dimension-sized groups or a
#: scalar), cost = one fact scan + map-side-combined agg. These must not
#: even reach linear-with-slack; K×1.0 catches a regression to a second
#: fact shuffle. (Window/join/graph queries keep the default.)
TIGHT_BUDGET = {
    "q23_daily_summary": 1.0,
    "q43_source_rollup": 1.0,
    "q147_small_qty_revenue": 1.0,
    "q162_ewma_daily_orders": 1.0,
    "q164_incremental_rollup": 1.0,
    "q174_nation_trade_volume": 1.0,
    "q178_promo_share": 1.0,
    "q200_temperature_mixture": 1.0,
    "q224_dataset_card": 1.0,
    "q227_k_anonymity_audit": 1.0,
    "q236_quality_rate_chi2": 1.0,
    "q242_split_balance_audit": 1.0,
}


def run(
    spark, sf_dir: str, queries: list[str], reps: int = 1
) -> dict[str, float]:
    """Warm wall time per query (noop sink): with ``reps > 1`` the FIRST
    rep is a discarded warm-up and the result is the true median of the
    rest (mean of the two middle values when an even count remains — with
    reps=3 that is the mean of the two post-warm-up reps; an earlier
    version indexed ``len//2`` which silently picked the MAX of two).

    The warm-up discard must be symmetric between the base and big runs:
    several queries share session-level state (the checkpointed Jaccard
    pair relation feeds q123/q142/...; codegen caches), so a query's
    first execution per (session, sf_dir) can be build-dominated. An
    asymmetric discipline — warm base median vs cold big single-rep —
    once mis-read q123 as 56× at K=30 when the steady-state ratio is
    linear; the build itself is q51-shaped shingle-join work, measured
    linear separately (SCALE_NOTES)."""
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    out = {}
    for name in queries:
        times = []
        for _ in range(reps):
            t0 = time.time()
            catalog.REGISTRY[name].builder(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(time.time() - t0)
        if len(times) > 1:
            times = times[1:]
        out[name] = round(statistics.median(times), 2)
    return out


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = None
    only = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    k = int(argv[0]) if argv else 10
    queries = only or HEADLINE

    from etl_pipeline_candy_store_spark.session import get_spark

    spark = get_spark("scale-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    dst = tempfile.mkdtemp(prefix="sfx_")
    expand(spark, base, dst, k)
    spark.read.parquet(f"{dst}/lineitem.parquet").count()

    # BOTH sides: warm-up + mean-of-2 timed reps. The symmetric warm-up
    # discard excludes session-shared builds (pair checkpoint, codegen)
    # from both numerator and denominator; the big side timing a single
    # rep was retired after a round-9 gate run where one-off stalls in
    # a long big phase read q51 at 17.8x / q162 at 8.7x while immediate
    # clean re-measurement of the same queries on the same expanded dir
    # gave ~3x / ~2x — a single bad rep fails the whole gate, and the
    # extra rep costs only minutes.
    t_base = run(spark, base, queries, reps=3)
    t_big = run(spark, dst, queries, reps=3)
    rows = spark.read.parquet(f"{dst}/lineitem.parquet").count()

    report, failures = {}, []
    for q in queries:
        budget = k * TIGHT_BUDGET.get(q, SLACK)
        denom = max(t_base[q], FLOOR_SEC)
        ratio = round(t_big[q] / denom, 1)
        ok = t_big[q] <= budget * denom
        report[q] = {
            "base_sec": t_base[q],
            "big_sec": t_big[q],
            "ratio": ratio,
            "budget": budget,
            "floor_applied": t_base[q] < FLOOR_SEC,
            "ok": ok,
        }
        if not ok:
            failures.append(q)

    result = {
        "k": k,
        "lineitem_rows": rows,
        "slack": SLACK,
        "floor_sec": FLOOR_SEC,
        "reps": {"base": 3, "big": 3, "discipline": "discard first rep, mean of rest"},
        "queries": report,
        "failures": failures,
        "gate": "PASS" if not failures else "FAIL",
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)
    shutil.rmtree(dst)
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
