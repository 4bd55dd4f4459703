"""Scale probe: replicate the sf0.1 fact tables K× (key-shifted) into a
temp dir, run the headline queries there, and report timings next to the
sf0.1 numbers — evidence that the plans scale linearly rather than
degrading (the thing local[32] can actually demonstrate about the
100 TB posture).

    python tools/scale_probe.py [K]
"""

from __future__ import annotations

import json
import os
import shutil
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

    # documents: K× docs with shifted doc_ids AND per-replica token
    # suffixes ("_r<k>"), so each replica is new distinct content — the
    # vocabulary grows K× (the realistic 10×-corpus shape for q89/q119)
    # and replicas do NOT become artificial near-dups of their source
    # (naive text copies would inflate the pair universe ~K², testing
    # the data generator, not the plan). Replica 0 keeps the original
    # text so the base corpus is a subset.
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

    # events: K× rows with replicas disjoint in user space AND time —
    # user_ids shift per replica (funnel/session/attribution state never
    # merges across replicas) and timestamps shift 31 days per replica
    # (the base span is 30 days, so window buckets are disjoint too and
    # the hopping/rolling bucket count grows K×). Read through
    # catalog.load so the TIMESTAMP(NANOS) source normalizes to micros;
    # the rewrite lands as plain TIMESTAMP, which load passes through.
    from etl_pipeline_candy_store_spark.plans.catalog import load as _load

    ev = _load(spark, src, "events")
    mx = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
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

    # embeddings: K× vectors with shifted vec_ids, values unchanged —
    # the ANN queries' codebook/query/centroid seeds (vec_id < 16) stay
    # the ORIGINAL vectors, so only the searched corpus grows
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


def run(spark, sf_dir: str) -> dict[str, float]:
    from etl_pipeline_candy_store_spark.plans import catalog

    catalog._ensure_loaded()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        catalog.REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from etl_pipeline_candy_store_spark.session import get_spark

    spark = get_spark("scale-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    base = "/root/testdata/sf0.1"
    dst = tempfile.mkdtemp(prefix="sfx_")
    expand(spark, base, dst, k)
    spark.read.parquet(f"{dst}/lineitem.parquet").count()

    t_base = run(spark, base)
    t_big = run(spark, dst)
    rows = spark.read.parquet(f"{dst}/lineitem.parquet").count()
    print(
        json.dumps(
            {
                "k": k,
                "lineitem_rows": rows,
                "sf0.1_sec": t_base,
                f"sf{0.1 * k:g}_sec": t_big,
                "ratio": {
                    q: round(t_big[q] / max(t_base[q], 0.01), 1) for q in t_base
                },
            }
        )
    )
    shutil.rmtree(dst)
    spark.stop()


if __name__ == "__main__":
    main()
