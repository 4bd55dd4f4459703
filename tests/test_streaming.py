"""Streaming tests: the stateful allocation stream must agree with the
batch ST1 operator when micro-batches align with the batch boundary, and
the windowed daily summary must roll up a file-sourced event stream."""

from __future__ import annotations

import glob
import os

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark import schemas
from etl_pipeline_candy_store_spark.operators.allocation import allocate_sequential
from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
    allocate_stream,
    stream_daily_summary,
)
from tests.candy_fixtures import write_fixture




@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("candy_stream"))
    write_fixture(root)
    return root


def _item_frame(spark, fixture_dir, streaming: bool):
    from etl_pipeline_candy_store_spark.sources.readers import read_transactions_json

    products = (
        spark.read.option("header", True)
        .schema(schemas.PRODUCTS)
        .csv(os.path.join(fixture_dir, "products.csv"))
        .select("product_id", F.col("stock").cast("long").alias("opening_stock"))
    )
    # Streaming disallows monotonically_increasing_id, so BOTH modes
    # sequence by (business_date, ISO timestamp string, order_id,
    # item_pos) — sortable and stream-safe.
    if streaming:
        tx = (
            spark.readStream.option("multiLine", True)
            .schema(schemas.TRANSACTIONS)
            .json(fixture_dir)
            .select(
                "*",
                F.to_date(F.to_timestamp("timestamp")).alias("business_date"),
            )
        )
    else:
        tx = read_transactions_json(
            spark, sorted(glob.glob(os.path.join(fixture_dir, "transactions_*.json")))
        ).drop("file_seq")
    items = (
        tx.select(
            F.col("transaction_id").alias("order_id"),
            F.col("timestamp").alias("order_datetime"),
            "business_date",
            F.posexplode("items").alias("item_pos", "item"),
        )
        .select(
            "order_id",
            "order_datetime",
            "business_date",
            "item_pos",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").alias("requested_qty"),
        )
        .filter(F.col("requested_qty").isNotNull())
    )
    return items.join(F.broadcast(products), "product_id", "inner")


def test_stream_matches_batch_allocation(spark, fixture_dir, tmp_path):
    seq = ["business_date", "order_datetime", "order_id", "item_pos"]
    batch = allocate_sequential(
        _item_frame(spark, fixture_dir, streaming=False),
        key_col="product_id",
        seq_cols=seq,
        qty_col="requested_qty",
        stock_col="opening_stock",
    )
    want = {
        (r["order_id"], r["item_pos"], r["product_id"]): (r["quantity"], r["cancelled"])
        for r in batch.collect()
    }

    stream = allocate_stream(
        _item_frame(spark, fixture_dir, streaming=True), seq_cols=seq
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("alloc_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.sql("select * from alloc_stream").collect()
    # stream output drops item_pos; compare per (order, product) aggregates
    def agg(d):
        out = {}
        for k, v in d.items():
            key = (k[0], k[2])
            fq, fc = out.get(key, (0, 0))
            out[key] = (fq + v[0], fc + v[1])
        return out

    got = {}
    for r in got_rows:
        key = (r["order_id"], r["product_id"])
        fq, fc = got.get(key, (0, 0))
        got[key] = (fq + r["quantity"], fc + r["cancelled"])
    assert got == agg(want)
    # conservation in the streaming path too
    assert all(r["stock_after"] >= 0 for r in got_rows)


def test_stream_daily_summary(spark, tmp_path):
    # file-sourced event stream from the synthetic events table
    from etl_pipeline_candy_store_spark.plans.catalog import load

    import time

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "events_parquet")
    # FileStreamSource processes files oldest-mtime-first; write monthly
    # chunks sequentially (distinct mtimes) so one-file-per-trigger
    # micro-batches arrive in event-time order and the watermark advances
    # monotonically — append mode then emits every closed window with no
    # late drops.
    months = sorted(
        r["m"] for r in ev.select(F.date_trunc("month", "ts").alias("m")).distinct().collect()
    )
    for m in months:
        chunk = ev.filter(F.date_trunc("month", "ts") == m).coalesce(1)
        chunk.write.mode("append").parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_daily_summary(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("daily_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["date"]): r["n_events"]
        for r in spark.sql("select * from daily_stream").collect()
    }
    want = {
        str(r["date"]): r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("date"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch rollup exactly, and all but the
    # final watermark-horizon days close.
    assert got
    assert all(got[d] == want[d] for d in got)
    assert len(got) >= len(want) - 3


def test_watermark_drops_late_event(spark, tmp_path):
    """An event arriving AFTER the watermark passed its window must be
    dropped (append mode): the closed window is emitted once with the
    on-time count only, and never re-emitted."""
    import datetime as dt
    import glob
    import shutil

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_chunk(rows, name, mtime):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, "ts timestamp, v int").coalesce(1).write.parquet(d)
        dst = os.path.join(src, name + ".parquet")
        shutil.copy(glob.glob(d + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    day1 = dt.datetime(2024, 1, 1, 10)
    # chunk 1: three day-1 events + a day-4 event that pushes the
    # watermark (delay "1 day") past day 1's window end
    write_chunk(
        [
            (day1, 1),
            (day1 + dt.timedelta(minutes=5), 1),
            (day1 + dt.timedelta(minutes=10), 1),
            (day1 + dt.timedelta(days=3), 1),
        ],
        "c1",
        1_000_000_000,
    )
    # chunk 2: a benign fresh event. Needed because Spark's late-record
    # filter uses the PREVIOUS batch's watermark (watermark propagation,
    # SPARK-40925) while state eviction uses the current one — the late
    # event must arrive two batches after the watermark-pusher to sit
    # behind the *filter* watermark, not just the eviction watermark.
    write_chunk(
        [(day1 + dt.timedelta(days=3, hours=1), 1)],
        "c2",
        1_000_000_100,
    )
    # chunk 3: a LATE day-1 event (behind the filter watermark) + a fresh one
    write_chunk(
        [(day1 + dt.timedelta(hours=1), 1), (day1 + dt.timedelta(days=4), 1)],
        "c3",
        1_000_000_200,
    )

    stream = (
        spark.readStream.schema("ts timestamp, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_daily_summary(stream, ts_col="ts", value_col="v")
    q = (
        out.writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "late_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from late_stream").collect()
    day1_rows = [r for r in rows if str(r["date"]) == "2024-01-01"]
    # exactly one emission for day 1, counting only the 3 on-time events
    assert len(day1_rows) == 1
    assert day1_rows[0]["n_events"] == 3


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream interval join with watermarks: purchases joined to
    error events of the same user within +/- 30 minutes."""
    from etl_pipeline_candy_store_spark.plans.catalog import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ss_events")
    ev.coalesce(1).write.parquet(src)

    def stream():
        return spark.readStream.schema(ev.schema).parquet(src)

    purchases = (
        stream().filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
                F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "1 hour")
    )
    errors = (
        stream().filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"),
                F.col("event_id").alias("e_id"))
        .withWatermark("e_ts", "1 hour")
    )
    joined = purchases.join(
        errors,
        F.expr(
            "p_user = e_user AND e_ts BETWEEN p_ts - INTERVAL 30 MINUTES"
            " AND p_ts + INTERVAL 30 MINUTES"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["p_id"], r["e_id"]) for r in spark.sql("select * from ss_join").collect()}
    # batch reference
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"))
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"))
    want = {
        (r["p_id"], r["e_id"])
        for r in p.join(
            e,
            F.expr(
                "p_user = e_user AND e_ts BETWEEN p_ts - INTERVAL 30 MINUTES"
                " AND p_ts + INTERVAL 30 MINUTES"
            ),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivered event id in a later
    micro-batch (inside the horizon) is emitted exactly once."""
    import datetime as dt
    import glob
    import shutil

    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_dedup_events,
    )

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)

    def write_chunk(rows, name, mtime):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, v int"
        ).coalesce(1).write.parquet(d)
        dst = os.path.join(src, name + ".parquet")
        shutil.copy(glob.glob(d + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    t0 = dt.datetime(2024, 1, 1, 10)
    write_chunk(
        [(1, t0, 10), (2, t0 + dt.timedelta(minutes=1), 20)],
        "c1",
        1_000_000_000,
    )
    # batch 2: event 1 re-delivered (same id, later ts) + a fresh event
    write_chunk(
        [(1, t0 + dt.timedelta(minutes=5), 10), (3, t0 + dt.timedelta(minutes=6), 30)],
        "c2",
        1_000_000_100,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_dedup_events(stream, key_cols=("event_id",), ts_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select event_id, v from dedup_stream").collect()
    got = sorted((r["event_id"], r["v"]) for r in rows)
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_stream_session_rollup(spark, tmp_path):
    """session_window: events within the gap merge into one session per
    key; a later batch past the watermark closes and emits them."""
    import datetime as dt
    import glob
    import shutil

    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_session_rollup,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src)

    def write_chunk(rows, name, mtime):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, v int"
        ).coalesce(1).write.parquet(d)
        dst = os.path.join(src, name + ".parquet")
        shutil.copy(glob.glob(d + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    t0 = dt.datetime(2024, 1, 1, 10)
    # user 1: two bursts 2h apart -> two sessions; user 2: one event
    write_chunk(
        [
            (1, t0, 1),
            (1, t0 + dt.timedelta(minutes=10), 2),
            (1, t0 + dt.timedelta(hours=2), 4),
            (2, t0 + dt.timedelta(minutes=5), 8),
        ],
        "c1",
        1_000_000_000,
    )
    # far-future event advances the watermark past every session above
    write_chunk(
        [(9, t0 + dt.timedelta(days=3), 0)], "c2", 1_000_000_100
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_session_rollup(stream, key_col="user_id", gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select user_id, session_start, n_events, value_sum from sess_stream"
    ).collect()
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["value_sum"])
        for r in rows
    }
    # user 1 burst 1: 2 events merged (10:00-10:10+gap); burst 2 separate
    assert got[(1, t0)] == (2, 3)
    assert got[(1, t0 + dt.timedelta(hours=2))] == (1, 4)
    assert got[(2, t0 + dt.timedelta(minutes=5))] == (1, 8)


def test_stream_hll_matches_batch(spark, tmp_path):
    # per-day distinct-user estimates from the streaming mergeable-HLL
    # rollup must be BIT-IDENTICAL to the batch estimator (q37's
    # hll_distinct grouped by day): same hash, same registers, same
    # integer-scaled harmonic sum — merging per-micro-batch is lossless.
    import time

    from etl_pipeline_candy_store_spark.operators.sketch import hll_distinct
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_hll_daily_distinct,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_hll")
    months = sorted(
        r["m"]
        for r in ev.select(F.date_trunc("month", "ts").alias("m")).distinct().collect()
    )
    for m in months:
        ev.filter(F.date_trunc("month", "ts") == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_hll_daily_distinct(stream)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["date"]): r["distinct_estimate"]
        for r in spark.sql("select * from hll_stream").collect()
    }
    assert got, "watermark emitted no closed windows"
    batch = hll_distinct(
        ev.select(F.col("ts").cast("date").alias("date"), "user_id"),
        F.col("user_id"),
        group_by=["date"],
    )
    want = {str(r["date"]): r["distinct_estimate"] for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted one
    # must match the batch estimate exactly
    for day, est in got.items():
        assert est == want[day], (day, est, want[day])
    # and the stream must have closed nearly all windows (all but the tail)
    assert len(got) >= len(want) - 2


def test_stream_rolling_actives_matches_batch_q108(spark, tmp_path):
    """Trailing-7-day distinct actives from the chained dedup->count
    stream must EQUAL the batch q108 WAU on every day the batch
    reports (the stream also emits tail days beyond the data's last
    event day; those are correct-but-partial windows and not compared).
    Data arrives in WEEKLY micro-batches so duplicate (user, report
    day) keys straddle batch boundaries with multi-day event-time
    spread — the case a too-short dedup watermark double-counts (the
    horizon must cover the full window span, not just lateness)."""
    import time

    from etl_pipeline_candy_store_spark.operators.timeseries import (
        q108_rolling_active_users,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_rolling_actives,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_roll")
    weeks = sorted(
        r["w"]
        for r in ev.select(F.date_trunc("week", "ts").alias("w")).distinct().collect()
    )
    for w in weeks:
        ev.filter(F.date_trunc("week", "ts") == w).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_rolling_actives(stream)
        .writeStream.format("memory")
        .queryName("roll_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_roll"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["day_end"]): r["active_7d"]
        for r in spark.sql("select * from roll_stream").collect()
    }
    want = {
        str(r["day"]): r["wau_7d"]
        for r in q108_rolling_active_users(spark, "/root/testdata/sf0.001").collect()
    }
    assert want, "batch q108 returned nothing"
    for day, wau in want.items():
        assert got.get(day) == wau, (day, got.get(day), wau)


def test_stream_event_transitions_match_batch_q105(spark, tmp_path):
    """The stateful pair stream, counted per (from, to), must equal the
    batch q105 transition matrix when micro-batches arrive in event-time
    order (weekly chunks here); the cross-batch seam rides on the
    one-tuple-per-user carried state."""
    import time

    from etl_pipeline_candy_store_spark.operators.timeseries import (
        q105_event_transitions,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_event_transitions,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_trans")
    weeks = sorted(
        r["w"]
        for r in ev.select(F.date_trunc("week", "ts").alias("w")).distinct().collect()
    )
    for w in weeks:
        ev.filter(F.date_trunc("week", "ts") == w).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_event_transitions(stream)
        .writeStream.format("memory")
        .queryName("trans_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_trans"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in spark.sql(
            "select from_type, to_type, count(*) as n from trans_stream group by 1, 2"
        ).collect()
    }
    want = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in q105_event_transitions(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


def test_stream_minhash_neardup_matches_batch_q52(spark, tmp_path):
    """Incremental LSH band-bucket dedup over documents arriving in three
    micro-batches must emit EXACTLY the batch q52 pair set (same shingle
    hashes, same bands, same exact-Jaccard verification) — and each pair
    exactly once, in the batch where its later endpoint arrives."""
    import time

    from etl_pipeline_candy_store_spark.operators.dedup import (
        q52_minhash_lsh_pairs,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.neardup_stream import (
        read_neardup_pairs,
        stream_minhash_neardup,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    src = str(tmp_path / "docs_src")
    n = docs.count()
    # three arrival chunks split by doc_id so near-dup pairs straddle
    # micro-batch boundaries (the case that catches old-vs-new probing)
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "lsh_state")
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_minhash_neardup(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_lsh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"])
        for r in read_neardup_pairs(spark, state).collect()
    }
    want_rows = q52_minhash_lsh_pairs(spark, sf).collect()
    want = {
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_union"]) for r in want_rows
    }
    assert want, "batch q52 found no pairs on the fixture"
    assert got == want
    # exactly-once: no pair row appears twice in the emitted table
    assert read_neardup_pairs(spark, state).count() == len(got)


def test_neardup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch re-delivers a micro-batch after a crash; replaying
    the same (content, batch_id) must leave state and emitted pairs
    byte-identical — batch-scoped overwrites, not appends."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.neardup_stream import (
        apply_neardup_batch,
        read_neardup_pairs,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    first = docs.filter(F.col("doc_id") < n // 2)
    second = docs.filter(F.col("doc_id") >= n // 2)
    state = str(tmp_path / "replay_state")

    apply_neardup_batch(first, state, 0)
    apply_neardup_batch(second, state, 1)
    want = sorted(map(tuple, read_neardup_pairs(spark, state).collect()))
    assert want, "fixture produced no pairs"

    # crash replay: batch 1 re-delivered with identical content
    apply_neardup_batch(second, state, 1)
    got = sorted(map(tuple, read_neardup_pairs(spark, state).collect()))
    assert got == want


def test_stream_count_min_cells_match_batch(spark, tmp_path):
    """Per-day Count-Min cells from the streaming windowed build must be
    BIT-IDENTICAL to a batch build over the same events — cell counts
    merge additively across micro-batches, so arrival chunking cannot
    change the sketch."""
    import time

    from etl_pipeline_candy_store_spark.operators.sketch import _CMS_D, _cms_col
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_count_min_cells,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_cms")
    months = sorted(
        r["m"]
        for r in ev.select(F.date_trunc("month", "ts").alias("m")).distinct().collect()
    )
    for m in months:
        ev.filter(F.date_trunc("month", "ts") == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_count_min_cells(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["date"]), r["j"], r["col"]): r["cnt"]
        for r in spark.sql("select * from cms_stream").collect()
    }
    assert got, "watermark emitted no closed windows"

    batch = (
        ev.select(
            F.col("ts").cast("date").alias("date"),
            F.md5(F.col("event_type").cast("binary")).alias("h"),
        )
        .select(
            "date",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"), F.expr(_cms_col("h", j)).alias("col")
                        )
                        for j in range(_CMS_D)
                    ]
                )
            ).alias("s"),
        )
        .groupBy("date", "s.j", "s.col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {
        (str(r["date"]), r["j"], r["col"]): r["cnt"] for r in batch.collect()
    }
    # append mode emits only watermark-closed windows; every emitted cell
    # must match the batch build exactly
    for key, cnt in got.items():
        assert cnt == want[key], (key, cnt, want[key])
    # and nearly all windows must have closed (all but the event-time tail)
    days_got = {k[0] for k in got}
    days_want = {k[0] for k in want}
    assert len(days_got) >= len(days_want) - 2


def test_stream_value_histogram_matches_batch(spark, tmp_path):
    """Per-day histogram cells from the streaming fixed-edge build must
    equal a batch build with the same edges (bin counts merge
    additively), and the quantile fold over streamed cells must be
    deterministic and within the value domain."""
    import time

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        histogram_quantiles,
        stream_value_histogram,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    lo, hi, bins = 0.0, 1000.0, 64
    src = str(tmp_path / "ev_hist")
    months = sorted(
        r["m"]
        for r in ev.select(F.date_trunc("month", "ts").alias("m")).distinct().collect()
    )
    for m in months:
        ev.filter(F.date_trunc("month", "ts") == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_value_histogram(stream, lo=lo, hi=hi, bins=bins)
        .writeStream.format("memory")
        .queryName("hist_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cells = spark.sql("select * from hist_stream")
    got = {(str(r["date"]), r["bin"]): r["cnt"] for r in cells.collect()}
    assert got, "watermark emitted no closed windows"

    width = (hi - lo) / bins
    batch = (
        ev.select(
            F.col("ts").cast("date").alias("date"),
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("int"),
                ),
            ).alias("bin"),
        )
        .groupBy("date", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {(str(r["date"]), r["bin"]): r["cnt"] for r in batch.collect()}
    for key, cnt in got.items():
        assert cnt == want[key], (key, cnt, want[key])

    qs = histogram_quantiles(cells, lo=lo, hi=hi, bins=bins)
    rows = qs.collect()
    assert rows
    for r in rows:
        assert lo < r["est_upper"] <= hi + width
        assert 0 <= r["bin"] < bins
    # median <= p99 per date (monotone in p)
    per_date = {}
    for r in rows:
        per_date.setdefault(str(r["date"]), {})[r["p"]] = r["est_upper"]
    for d, m in per_date.items():
        ps = sorted(m)
        assert all(m[a] <= m[b] for a, b in zip(ps, ps[1:])), (d, m)


def test_stream_sessions_match_batch_q34(spark, tmp_path):
    """session_window sessions closed by the watermark must coincide with
    batch q34's gap-based sessionize on the same events: identical
    (user, session_start) keys and per-session event counts, with
    sessions straddling monthly micro-batch boundaries."""
    import time

    from etl_pipeline_candy_store_spark.operators.asof import sessionize
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_session_rollup,
    )

    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev_sess_q34")
    months = sorted(
        r["m"]
        for r in ev.select(F.date_trunc("month", "ts").alias("m")).distinct().collect()
    )
    for m in months:
        ev.filter(F.date_trunc("month", "ts") == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_session_rollup(
            stream, key_col="user_id", value_col="value", gap="30 minutes"
        )
        .writeStream.format("memory")
        .queryName("sess_q34_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess_q34"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("select * from sess_q34_stream").collect()
    }
    assert got, "watermark emitted no closed sessions"

    batch = (
        sessionize(
            ev.select("event_id", "user_id", "ts"),
            key_cols=["user_id"],
            ts_col="ts",
            gap="30 minutes",
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events"))
    )
    want = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()
    }
    # every watermark-closed streamed session must exist in the batch
    # sessionization with the same start and event count
    for key, n in got.items():
        assert want.get(key) == n, (key, n, want.get(key))
    # and the large majority of batch sessions must have closed — the
    # final micro-batch cannot advance the watermark past its own max
    # event time, so sessions inside the last watermark horizon stay
    # open (~40 of ~950 on this fixture)
    assert len(got) >= int(0.9 * len(want))


def test_stream_value_histogram_excludes_nulls(spark):
    """NULL values must be dropped before binning: floor(NULL) is NULL
    but greatest(0, NULL) = 0, so without the isNotNull filter a NULL
    row silently lands in bin 0 — inflating low-edge mass that the
    batch histogram (edges from real min/max over non-NULL values)
    would never count. withWatermark is a no-op on batch input, so the
    binning logic is exercised directly."""
    from datetime import datetime

    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_value_histogram,
    )

    rows = [
        (datetime(2024, 1, 1, 10), 5.0),
        (datetime(2024, 1, 1, 11), None),
        (datetime(2024, 1, 1, 12), None),
        (datetime(2024, 1, 1, 13), 995.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    cells = {
        r["bin"]: r["cnt"]
        for r in stream_value_histogram(
            df, lo=0.0, hi=1000.0, bins=10
        ).collect()
    }
    # one real value in bin 0 and one in bin 9 — the two NULLs vanish
    assert cells == {0: 1, 9: 1}, cells


def test_stream_curation_gate_matches_batch(spark, tmp_path):
    """Quality + repetition + decontamination applied per micro-batch
    must produce EXACTLY the batch-side survivors: the gates are
    per-document stateless (or joined against the same static broadcast
    eval shingles), so arrival order and batch boundaries cannot change
    the verdict — the property that lets a crawl be curated on arrival."""
    import time

    from etl_pipeline_candy_store_spark.operators.curation import (
        _CONTAM_MIN_OVERLAP,
        _EVAL_MAX_DOC,
        quality_gate,
    )
    from etl_pipeline_candy_store_spark.operators.dedup import _shingles
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        drop_repetitive,
    )
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        eval_shingle_set,
        read_curated_docs,
        stream_curation_gate,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    eval_docs = docs.filter(F.col("doc_id") < _EVAL_MAX_DOC)
    crawl = docs.filter(F.col("doc_id") >= _EVAL_MAX_DOC)
    eval_sh = eval_shingle_set(eval_docs).localCheckpoint(eager=True)

    # batch-side want: same stages composed on the full crawl at once
    gated = quality_gate(crawl).filter(F.col("passed") == 1).select("doc_id")
    d = crawl.join(gated, "doc_id", "left_semi")
    d = drop_repetitive(d)
    contaminated = (
        _shingles(d)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= _CONTAM_MIN_OVERLAP)
        .select("doc_id")
    )
    want_rows = d.join(contaminated, "doc_id", "left_anti").collect()
    want = {r["doc_id"]: r["text"] for r in want_rows}
    n_crawl = crawl.count()
    assert 0 < len(want) < n_crawl, (len(want), n_crawl)  # gates really drop docs

    # stream the crawl in three chunks so gating spans batch boundaries
    src = str(tmp_path / "crawl_src")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        crawl.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)
    out = str(tmp_path / "curated")
    stream = (
        spark.readStream.schema(crawl.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_curation_gate(stream, eval_sh, out)
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: r["text"] for r in read_curated_docs(spark, out).collect()
    }
    assert got == want
    # exactly-once: no survivor appears twice across batch partitions
    assert read_curated_docs(spark, out).count() == len(got)


def test_curation_gate_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a micro-batch with the same batch_id (crash replay)
    must leave the survivor table unchanged — batch-scoped overwrite,
    not append."""
    from etl_pipeline_candy_store_spark.operators.curation import _EVAL_MAX_DOC
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_curation_gate_batch,
        eval_shingle_set,
        read_curated_docs,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    eval_sh = eval_shingle_set(
        docs.filter(F.col("doc_id") < _EVAL_MAX_DOC)
    ).localCheckpoint(eager=True)
    batch = docs.filter(
        (F.col("doc_id") >= _EVAL_MAX_DOC) & (F.col("doc_id") < 200)
    )
    out = str(tmp_path / "curated_replay")
    apply_curation_gate_batch(batch, eval_sh, out, 0)
    first = sorted(
        (r["doc_id"], r["text"]) for r in read_curated_docs(spark, out).collect()
    )
    assert first
    apply_curation_gate_batch(batch, eval_sh, out, 0)  # replay
    second = sorted(
        (r["doc_id"], r["text"]) for r in read_curated_docs(spark, out).collect()
    )
    assert second == first


def test_stream_vector_neardup_matches_batch_q64(spark, tmp_path):
    """Incremental hyperplane-LSH vector dedup over embeddings arriving
    in three micro-batches must emit EXACTLY the batch q64 pair set
    (same bucket expression, same order-folded exact cosine) — each
    pair exactly once, in the batch where its later endpoint arrives."""
    import time

    from etl_pipeline_candy_store_spark.operators.similarity import (
        q64_lsh_neardup,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.vector_stream import (
        read_vector_neardup_pairs,
        stream_vector_neardup,
    )

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, sf, "embeddings").select("vec_id", "embedding")
    src = str(tmp_path / "vec_src")
    n = vecs.count()
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "vec_state")
    stream = (
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_vector_neardup(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_vec"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["vec_a"], r["vec_b"], r["bucket"], r["cos_micros"])
        for r in read_vector_neardup_pairs(spark, state).collect()
    }
    want = {
        (r["vec_a"], r["vec_b"], r["bucket"], r["cos_micros"])
        for r in q64_lsh_neardup(spark, sf).collect()
    }
    assert want, "batch q64 found no pairs on the fixture"
    assert got == want
    # exactly-once: no pair row appears twice in the emitted table
    assert read_vector_neardup_pairs(spark, state).count() == len(got)


def test_vector_neardup_replay_is_idempotent(spark, tmp_path):
    """Replaying a (content, batch_id) micro-batch must leave index and
    emitted pairs byte-identical — batch-scoped overwrites."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.vector_stream import (
        apply_vector_neardup_batch,
        read_vector_neardup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    vecs = load(spark, sf, "embeddings").select("vec_id", "embedding")
    state = str(tmp_path / "vec_state_replay")
    b0 = vecs.filter(F.col("vec_id") < 250)
    b1 = vecs.filter(F.col("vec_id") >= 250)
    apply_vector_neardup_batch(b0, state, 0)
    apply_vector_neardup_batch(b1, state, 1)
    first = sorted(map(tuple, read_vector_neardup_pairs(spark, state).collect()))
    assert first
    apply_vector_neardup_batch(b1, state, 1)  # crash replay of batch 1
    second = sorted(map(tuple, read_vector_neardup_pairs(spark, state).collect()))
    assert second == first


def test_stream_exact_dedup_matches_batch_q50(spark, tmp_path):
    """Exact-dedup-on-arrival must keep precisely the batch keeper set:
    one doc per distinct content, lowest doc_id. Streaming semantics is
    first-seen-wins (an already-ingested doc cannot be un-ingested), so
    with doc_id-ordered arrival — the realistic monotonically-assigned
    id case — it coincides exactly with batch q50's min-doc_id rule."""
    import time

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        read_deduped_docs,
        stream_exact_dedup,
    )

    sf = "/root/testdata/sf0.001"
    base = load(spark, sf, "documents")
    # the fixture has no exact dups — append duplicate-content rows with
    # HIGHER doc_ids (re-crawled pages), so cross-batch drops really occur
    dups = base.filter(F.col("doc_id") < 60).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    docs = base.unionByName(dups).localCheckpoint(eager=True)
    src = str(tmp_path / "dedup_src")
    n = 10_060
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "dedup_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"] for r in read_deduped_docs(spark, state).collect()
    }
    # batch keeper set: q50's min doc_id per md5(content)
    want = {
        r["keep_doc_id"]
        for r in docs.select(
            F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"))
        .collect()
    }
    assert len(want) < docs.count()  # the injected dups really collide
    assert got == want
    # exactly-once: no doc appears twice across batch partitions
    assert read_deduped_docs(spark, state).count() == len(got)


def test_exact_dedup_replay_is_idempotent(spark, tmp_path):
    """Replaying a (content, batch_id) micro-batch must leave the
    survivor and digest tables unchanged."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_exact_dedup_batch,
        read_deduped_docs,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    state = str(tmp_path / "dedup_state_replay")
    b0 = docs.filter(F.col("doc_id") < 250)
    b1 = docs.filter(F.col("doc_id") >= 250)
    apply_exact_dedup_batch(b0, state, 0)
    apply_exact_dedup_batch(b1, state, 1)
    first = sorted(r["doc_id"] for r in read_deduped_docs(spark, state).collect())
    assert first
    apply_exact_dedup_batch(b1, state, 1)  # crash replay
    second = sorted(r["doc_id"] for r in read_deduped_docs(spark, state).collect())
    assert second == first


def test_stream_pq_code_dedup_matches_batch_q129(spark, tmp_path):
    """PQ-code dedup on arrival must keep precisely the batch keeper
    set: one vector per distinct coarse code, lowest vec_id. Streaming
    is first-seen-wins, so with vec_id-ordered arrival it coincides
    with the batch min-id rule; every q129 dup-group's canonical must
    be the streamed keeper for that code."""
    import time

    from etl_pipeline_candy_store_spark.operators.similarity import (
        pq_encode,
        q129_pq_code_dedup,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.vector_stream import (
        read_pq_deduped_vectors,
        stream_pq_code_dedup,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings").localCheckpoint(eager=True)
    codebook = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("entry_id"), "embedding"
    ).localCheckpoint(eager=True)

    src = str(tmp_path / "pq_src")
    for lo, hi in [(0, 170), (170, 340), (340, 500)]:
        emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "pq_state")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_pq_code_dedup(stream, codebook, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_pq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    kept = {
        (r["code_key"], r["vec_id"])
        for r in read_pq_deduped_vectors(spark, state)
        .select("code_key", "vec_id")
        .collect()
    }
    want = {
        (r["code_key"], r["vec_id"])
        for r in pq_encode(emb, codebook, m=3)
        .groupBy("code_key")
        .agg(F.min("vec_id").alias("vec_id"))
        .collect()
    }
    assert kept == want

    # every batch-q129 dup group resolves to the same canonical
    groups = q129_pq_code_dedup(spark, sf).collect()
    assert groups  # the fixture does produce coarse-code collisions
    for g in groups:
        assert (g["code_key"], g["canonical_vec_id"]) in kept


def test_pq_code_dedup_replay_is_idempotent(spark, tmp_path):
    """Replaying a PQ-code micro-batch must leave the survivor and
    code-state tables unchanged."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.vector_stream import (
        apply_pq_code_dedup_batch,
        read_pq_deduped_vectors,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    codebook = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("entry_id"), "embedding"
    )
    state = str(tmp_path / "pq_state_replay")
    b0 = emb.filter(F.col("vec_id") < 250)
    b1 = emb.filter(F.col("vec_id") >= 250)
    apply_pq_code_dedup_batch(b0, codebook, state, 0)
    apply_pq_code_dedup_batch(b1, codebook, state, 1)
    first = sorted(
        r["vec_id"] for r in read_pq_deduped_vectors(spark, state).collect()
    )
    assert first
    apply_pq_code_dedup_batch(b1, codebook, state, 1)  # crash replay
    second = sorted(
        r["vec_id"] for r in read_pq_deduped_vectors(spark, state).collect()
    )
    assert second == first


def test_stream_token_budget_matches_batch_prefix(spark, tmp_path):
    """Per-source token-budget admission on arrival must equal the
    batch greedy-prefix rule over the whole corpus in doc_id order:
    the stream state tracks each source's TOTAL arrived tokens
    (admitted or not), which makes the cross-batch admission test
    exactly the global cumulative prefix — no closed-source flag."""
    import time

    from pyspark.sql.window import Window

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        read_admitted_docs,
        stream_token_budget,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").localCheckpoint(eager=True)
    src = str(tmp_path / "budget_src")
    for lo, hi in [(0, 170), (170, 340), (340, 10_000)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "budget_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_token_budget(stream, state, budget=800)
        .option("checkpointLocation", str(tmp_path / "ckpt_budget"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {r["doc_id"] for r in read_admitted_docs(spark, state).collect()}

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["doc_id"]
        for r in docs.withColumn(
            "_cum", F.sum(F.size(F.split("text", " ")).cast("long")).over(w)
        )
        .where(F.col("_cum") <= 800)
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_token_budget_replay_idempotent(spark, tmp_path):
    """Re-applying a batch (crash replay) must rewrite identical
    content, not double-admit or double-count budget."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_token_budget_batch,
        read_admitted_docs,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    b0 = docs.filter(F.col("doc_id") < 170)
    b1 = docs.filter(F.col("doc_id") >= 170)
    state = str(tmp_path / "replay_state")
    apply_token_budget_batch(b0, state, 0, budget=800)
    apply_token_budget_batch(b1, state, 1, budget=800)
    once = {r["doc_id"] for r in read_admitted_docs(spark, state).collect()}
    apply_token_budget_batch(b1, state, 1, budget=800)  # replay
    twice = {r["doc_id"] for r in read_admitted_docs(spark, state).collect()}
    assert once == twice and len(once) > 0


def test_transform_with_state_source_totals_matches_batch(spark, tmp_path):
    """transformWithStateInPandas (the Spark-4 stateful API; the
    allocation stream covers the older applyInPandasWithState): running
    per-source totals folded in ValueState must, after all batches,
    equal the batch groupBy over the full corpus. Totals are monotone,
    so the max emission per source is the final running total.

    ENVIRONMENT GATE: the tWS python driver worker requires the
    `protobuf` package (pyspark's StateMessage_pb2); this sandbox has
    no package index, so the test skips where protobuf is absent —
    the closure attempt and exact failure are recorded in COVERAGE.md
    (same discipline as the Prophet/Mongo gaps)."""
    pytest.importorskip("google.protobuf")
    import time

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.tws_totals import (
        stream_source_totals,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").localCheckpoint(eager=True)
    src = str(tmp_path / "tws_src")
    for lo, hi in [(0, 250), (250, 10_000)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_source_totals(stream)
        .writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in spark.sql(
            "SELECT source, MAX(n_docs) AS n_docs, MAX(n_tokens) AS n_tokens"
            " FROM tws_totals GROUP BY source"
        ).collect()
    }
    want = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("long"))
            .cast("long")
            .alias("n_tokens"),
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_drift_monitor_scores_each_batch(spark, tmp_path):
    """Per-batch chi-square drift vs a fixed reference histogram: an
    in-distribution batch must score low, a shifted batch (every doc
    truncated to 3 tokens) must score high, and each emitted row must
    equal the batch-computed statistic for the same slice (the stream
    is stateless per batch, so stream≡batch is exact equality)."""
    import time

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        drift_stat,
        length_histogram,
        stream_drift_monitor,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents").localCheckpoint(eager=True)
    ref = length_histogram(docs).localCheckpoint(eager=True)

    normal = docs.filter(F.col("doc_id") < 250)
    shifted = docs.filter(F.col("doc_id") >= 250).withColumn(
        "text",
        F.array_join(F.slice(F.split("text", " "), 1, 3), " "),
    )
    src = str(tmp_path / "drift_src")
    normal.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.05)
    shifted.coalesce(1).write.mode("append").parquet(src)

    state = str(tmp_path / "drift_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_drift_monitor(stream, ref, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["batch_id"]: (r["n_docs"], r["chi2_micros"])
        for r in spark.read.parquet(f"{state}/drift").collect()
    }
    want = {
        0: drift_stat(length_histogram(normal), ref).collect()[0],
        1: drift_stat(length_histogram(shifted), ref).collect()[0],
    }
    assert got[0] == (want[0]["n_docs"], want[0]["chi2_micros"])
    assert got[1] == (want[1]["n_docs"], want[1]["chi2_micros"])
    # in-distribution batch scores far below the shifted batch
    assert got[1][1] > 10 * got[0][1]


def test_stream_hopping_traffic_matches_batch_q168(spark, tmp_path):
    """Sliding (hopping) windows in streaming: complete-mode result over
    the real events equals the batch q168 on the shared columns."""
    from etl_pipeline_candy_store_spark.plans.catalog import REGISTRY, _ensure_loaded, load
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_hopping_traffic,
    )

    _ensure_loaded()
    ev = load(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hopping_traffic(stream)
        .writeStream.format("memory")
        .queryName("hopping_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.sql(
            "select win_start, n_events, n_purchases from hopping_stream"
        ).collect())
    )
    batch = REGISTRY["q168_hopping_window_traffic"].builder(
        spark, "/root/testdata/sf0.001"
    )
    want = sorted(
        map(tuple, batch.select("win_start", "n_events", "n_purchases").collect())
    )
    assert len(want) > 0
    assert got == want


def test_stream_semantic_decon_matches_batch(spark, tmp_path):
    """The per-batch semantic screen unioned over any batching must flag
    EXACTLY q199's rows with identical attribution: the panel is static
    and the verdict per-row, so batch boundaries cannot change it."""
    import time

    from etl_pipeline_candy_store_spark.operators.curation import _SEM_PANEL
    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        decon_panel,
        read_semantic_flags,
        stream_semantic_decon,
    )

    sf = "/root/testdata/sf0.001"
    catalog._ensure_loaded()
    want = {
        r["vec_id"]: (r["n_eval_hits"], r["max_cos_micros"])
        for r in catalog.REGISTRY["q199_semantic_decontamination"]
        .builder(spark, sf)
        .collect()
    }
    assert want  # screen must actually flag something on this corpus

    emb = load(spark, sf, "embeddings")
    panel = decon_panel(emb, _SEM_PANEL)
    # the RAW table streams in, panel members included — the gate itself
    # must exclude them (a published benchmark re-arrives via crawlers)
    raw = emb.select("vec_id", "embedding")
    src = str(tmp_path / "vec_src")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        raw.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    out = str(tmp_path / "decon")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_semantic_decon(stream, panel, out)
        .option("checkpointLocation", str(tmp_path / "ckpt_decon"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    flags = read_semantic_flags(spark, out)
    got = {
        r["vec_id"]: (r["n_eval_hits"], r["max_cos_micros"])
        for r in flags.collect()
    }
    assert got == want
    # exactly-once + routing: clean ∪ flagged = raw minus the panel
    # (re-arrived panel members land in NEITHER partition), disjoint
    clean = spark.read.parquet(f"{out}/clean")
    assert flags.count() == len(got)
    assert clean.count() + flags.count() == raw.count() - _SEM_PANEL
    assert clean.join(flags, "vec_id", "inner").count() == 0
    assert clean.filter(F.col("vec_id") < _SEM_PANEL).count() == 0


def test_semantic_decon_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a micro-batch with the same batch_id must leave
    both output partitions unchanged (batch-scoped overwrite)."""
    from etl_pipeline_candy_store_spark.operators.curation import _SEM_PANEL
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_semantic_decon_batch,
        decon_panel,
        read_semantic_flags,
    )

    sf = "/root/testdata/sf0.001"
    emb = load(spark, sf, "embeddings")
    panel = decon_panel(emb, _SEM_PANEL).localCheckpoint(eager=True)
    batch = emb.filter(F.col("vec_id") >= _SEM_PANEL).select(
        "vec_id", "embedding"
    )
    out = str(tmp_path / "decon")
    apply_semantic_decon_batch(batch, panel, out, 0)
    first = sorted(
        (r["vec_id"], r["n_eval_hits"], r["max_cos_micros"])
        for r in read_semantic_flags(spark, out).collect()
    )
    n_clean_first = spark.read.parquet(f"{out}/clean").count()
    apply_semantic_decon_batch(batch, panel, out, 0)  # crash replay
    again = sorted(
        (r["vec_id"], r["n_eval_hits"], r["max_cos_micros"])
        for r in read_semantic_flags(spark, out).collect()
    )
    assert again == first
    assert spark.read.parquet(f"{out}/clean").count() == n_clean_first


def test_stream_importance_scores_match_batch(spark, tmp_path):
    """Scoring per micro-batch against the FROZEN importance table must
    reproduce q202's weights exactly for every candidate doc: the
    scorer is per-row stateless once the bin table is frozen."""
    import time

    from etl_pipeline_candy_store_spark.operators.corpus_curation import (
        _DSIR_TARGET_MAX_DOC,
        importance_bins,
    )
    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        read_importance_scores,
        stream_importance_scores,
    )

    sf = "/root/testdata/sf0.001"
    catalog._ensure_loaded()
    want = {
        r["doc_id"]: (r["n_toks"], r["log2_weight"])
        for r in catalog.REGISTRY["q202_importance_weights"]
        .builder(spark, sf)
        .collect()
    }

    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    bins = importance_bins(toks, F.col("doc_id") < _DSIR_TARGET_MAX_DOC)
    crawl = docs.filter(F.col("doc_id") >= _DSIR_TARGET_MAX_DOC).select(
        "doc_id", "text"
    )
    src = str(tmp_path / "imp_src")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    for lo, hi in [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]:
        crawl.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    out = str(tmp_path / "imp_scores")
    stream = (
        spark.readStream.schema(crawl.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_importance_scores(stream, bins, out)
        .option("checkpointLocation", str(tmp_path / "ckpt_imp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_toks"], r["log2_weight"])
        for r in read_importance_scores(spark, out).collect()
    }
    assert got == want


def test_state_readers_fail_closed_on_corrupt_state(spark, tmp_path):
    """The batch-output readers return empty ONLY for a missing path
    ("no batches yet"); corrupt state must RAISE, not fail open as an
    empty frame — a governance consumer must never mistake unreadable
    contamination flags for "nothing flagged"."""
    import pytest

    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        read_importance_scores,
        read_semantic_flags,
    )

    # missing path: empty frame, no error
    assert read_semantic_flags(spark, str(tmp_path / "nope")).count() == 0
    assert read_importance_scores(spark, str(tmp_path / "nope2")).count() == 0

    # existing-but-corrupt state: must raise
    bad = tmp_path / "decon" / "flagged"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        read_semantic_flags(spark, str(tmp_path / "decon")).count()


def test_stream_span_scrub_matches_batch_q203(spark, tmp_path):
    """Span scrub on arrival must equal batch q203 exactly under
    monotone doc_id arrival: q203 removes a position iff a SMALLER
    doc_id contains the covering shingle, and with ordered arrival
    "smaller" == "arrived earlier or earlier in this batch"."""
    import time

    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        read_scrubbed_docs,
        stream_span_scrub,
    )

    sf = "/root/testdata/sf0.001"
    docs = catalog.load(spark, sf, "documents").localCheckpoint(eager=True)
    src = str(tmp_path / "scrub_src")
    for lo, hi in [(0, 170), (170, 340), (340, 10_000)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "scrub_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_span_scrub(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_scrub"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in read_scrubbed_docs(spark, state).collect()
    }
    catalog._ensure_loaded()
    want = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in catalog.REGISTRY["q203_dup_span_scrub"]
        .builder(spark, sf)
        .collect()
    }
    assert got == want
    # non-vacuous: removals happened both within AND across batches
    assert any(n for (_, n, _) in got.values())
    # exactly-once: one output row per doc across batch partitions
    assert read_scrubbed_docs(spark, state).count() == len(got)


def test_span_scrub_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a (content, batch_id) micro-batch must leave the
    scrubbed-docs and shingle-state tables unchanged."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_span_scrub_batch,
        read_scrubbed_docs,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    state = str(tmp_path / "scrub_state_replay")
    b0 = docs.filter(F.col("doc_id") < 250)
    b1 = docs.filter(F.col("doc_id") >= 250)
    apply_span_scrub_batch(b0, state, 0)
    apply_span_scrub_batch(b1, state, 1)
    first = sorted(
        map(tuple, read_scrubbed_docs(spark, state).collect())
    )
    shingles_first = spark.read.parquet(f"{state}/shingles").count()
    assert first
    apply_span_scrub_batch(b1, state, 1)  # crash replay
    second = sorted(
        map(tuple, read_scrubbed_docs(spark, state).collect())
    )
    assert second == first
    assert spark.read.parquet(f"{state}/shingles").count() == shingles_first


def test_span_scrub_cross_batch_canonical_keeps_copy(spark, tmp_path):
    """The arriving copy of an already-seen span is scrubbed; the
    earlier (canonical) doc's emitted text is never rewritten — the
    q203 keep-one-copy rule, realized as first-arrival-wins."""
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_span_scrub_batch,
        read_scrubbed_docs,
    )

    state = str(tmp_path / "scrub_canon")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "x alpha beta gamma y")], "doc_id long, text string"
    )
    apply_span_scrub_batch(b0, state, 0)
    apply_span_scrub_batch(b1, state, 1)
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in read_scrubbed_docs(spark, state).collect()
    }
    assert got == {1: (0, "alpha beta gamma delta"), 2: (3, "x y")}


def test_stream_unigram_encode_matches_batch_q206(spark, tmp_path):
    """Tokenizing per micro-batch against the FROZEN per-word Viterbi
    table must reproduce q206 exactly on the calibration corpus (no
    OOV by construction), and replaying a batch must be idempotent."""
    import time

    from etl_pipeline_candy_store_spark.operators.unigram import (
        unigram_encodings,
    )
    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_unigram_encode_batch,
        read_unigram_encodings,
        stream_unigram_encode,
    )

    sf = "/root/testdata/sf0.001"
    catalog._ensure_loaded()
    want = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["ll_bits"], 0)
        for r in catalog.REGISTRY["q206_unigram_encode"]
        .builder(spark, sf)
        .collect()
    }

    docs = catalog.load(spark, sf, "documents").localCheckpoint(eager=True)
    enc = unigram_encodings(docs).localCheckpoint(eager=True)
    src = str(tmp_path / "uni_src")
    for lo, hi in [(0, 170), (170, 340), (340, 10_000)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    out = str(tmp_path / "uni_out")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_unigram_encode(stream, enc, out)
        .option("checkpointLocation", str(tmp_path / "ckpt_uni"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["ll_bits"], r["n_oov"])
        for r in read_unigram_encodings(spark, out).collect()
    }
    assert got == want

    # crash replay of batch 0 must not change anything
    batch0 = docs.filter(F.col("doc_id") < 170).select("doc_id", "text")
    apply_unigram_encode_batch(batch0, enc.select("word", "v", "k"), out, 0)
    again = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["ll_bits"], r["n_oov"])
        for r in read_unigram_encodings(spark, out).collect()
    }
    assert again == got


def test_stream_unigram_encode_counts_oov(spark, tmp_path):
    """Crawl words outside the calibration vocabulary must surface in
    n_oov (the retrain signal), never silently vanish."""
    from etl_pipeline_candy_store_spark.operators.unigram import (
        unigram_encodings,
    )
    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.streaming.curation_stream import (
        apply_unigram_encode_batch,
        read_unigram_encodings,
    )

    sf = "/root/testdata/sf0.001"
    docs = catalog.load(spark, sf, "documents")
    enc = unigram_encodings(docs).select("word", "v", "k")
    known = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).first()["w"]
    batch = spark.createDataFrame(
        [(900001, f"{known} zzqqxx {known}")], "doc_id bigint, text string"
    )
    out = str(tmp_path / "oov_out")
    apply_unigram_encode_batch(batch, enc, out, 0)
    row = read_unigram_encodings(spark, out).collect()[0]
    assert row["n_words"] == 2 and row["n_oov"] == 1


def _phash_media_relation(spark):
    """q205's media relation: every doc as a payload plus every 10th doc
    re-appearing as a locally-edited variant (same construction as the
    registered query)."""
    from etl_pipeline_candy_store_spark.operators.multimodal import (
        _PHASH_VARIANT_MOD,
        _PHASH_VARIANT_OFFSET,
    )
    from etl_pipeline_candy_store_spark.plans import catalog

    d = catalog.load(spark, "/root/testdata/sf0.001", "documents")
    variants = d.filter(F.col("doc_id") % _PHASH_VARIANT_MOD == 0).select(
        (F.col("doc_id") + _PHASH_VARIANT_OFFSET).alias("media_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("X" * 10),
            F.expr("substring(text, 21)"),
        ).alias("payload_text"),
    )
    return (
        d.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").alias("payload_text"),
        )
        .unionByName(variants)
        .select("media_id", F.col("payload_text").cast("binary").alias("payload"))
        .localCheckpoint(eager=True)
    )


def test_stream_phash_neardup_matches_batch_q205(spark, tmp_path):
    """Perceptual media near-dup on arrival must equal batch q205 under
    monotone media_id arrival, and a crash replay must be idempotent."""
    import time

    from etl_pipeline_candy_store_spark.plans import catalog
    from etl_pipeline_candy_store_spark.streaming.neardup_stream import (
        apply_phash_batch,
        read_phash_pairs,
        stream_phash_neardup,
    )

    catalog._ensure_loaded()
    want = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in catalog.REGISTRY["q205_media_phash_neardup"]
        .builder(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert want, "fixture must produce near-dup pairs"

    media = _phash_media_relation(spark)
    src = str(tmp_path / "phash_src")
    # monotone media_id arrival: originals first, variants last
    for lo, hi in [(0, 200), (200, 1_000_000), (1_000_000, 10_000_000)]:
        media.filter(
            (F.col("media_id") >= lo) & (F.col("media_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "phash_state")
    stream = (
        spark.readStream.schema("media_id bigint, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_phash_neardup(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_phash"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in read_phash_pairs(spark, state).collect()
    )
    assert got == want

    # crash replay of the LAST batch (the variants) must change nothing
    apply_phash_batch(media.filter(F.col("media_id") >= 1_000_000), state, 2)
    again = sorted(
        (r["media_a"], r["media_b"], r["hamming"])
        for r in read_phash_pairs(spark, state).collect()
    )
    assert again == got


def test_stream_curate_matches_batch_curate(spark, tmp_path):
    """The COMPOSED streaming curation funnel (one state dir, one ledger
    protocol) must reproduce batch curate()'s exported survivor set
    (doc_id, split) exactly under monotone doc_id arrival."""
    import time

    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        read_curated,
        stream_curate,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    src = str(tmp_path / "curate_src")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # monotone arrival in three chunks; near-dup pairs and exact copies
    # straddle micro-batch boundaries
    for lo, hi in [(0, n_max // 3), (n_max // 3, 2 * n_max // 3), (2 * n_max // 3, n_max)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    state = str(tmp_path / "curate_state")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_curate(stream, state)
        .option("checkpointLocation", str(tmp_path / "ckpt_curate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["doc_id"], r["split"])
        for r in read_curated(spark, state).collect()
    }

    out = str(tmp_path / "batch_out")
    report = curate(spark, sf, out, n_shards=2)
    want = set()
    for split in ("train", "val", "test"):
        for r in (
            spark.read.parquet(f"{out}/split={split}")
            .select("doc_id")
            .collect()
        ):
            want.add((r["doc_id"], split))
    assert want, "batch curate exported nothing"
    assert got == want
    assert len(got) == report["funnel"]["after_decontamination"]


def test_curate_stream_replay_is_idempotent(spark, tmp_path):
    """Re-delivering a micro-batch with the same (content, batch_id)
    must leave every state relation and the read-side survivors
    identical — the shared batch-scoped-overwrite ledger protocol."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    first = docs.filter(F.col("doc_id") < n_max // 2)
    second = docs.filter(F.col("doc_id") >= n_max // 2)
    state = str(tmp_path / "curate_replay")

    apply_curate_batch(first, state, 0)
    apply_curate_batch(second, state, 1)
    want = sorted(map(tuple, read_curated(spark, state).collect()))
    assert want, "fixture produced no survivors"

    apply_curate_batch(second, state, 1)  # crash replay
    got = sorted(map(tuple, read_curated(spark, state).collect()))
    assert got == want


def test_export_curated_matches_batch_manifests(spark, tmp_path):
    """Stream-curated survivors exported through the shared shard writer
    must produce the same content-addressed manifests as batch
    curate()'s export (modulo output path)."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        export_curated,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    state = str(tmp_path / "state")
    apply_curate_batch(docs.filter(F.col("doc_id") < n_max // 2), state, 0)
    apply_curate_batch(docs.filter(F.col("doc_id") >= n_max // 2), state, 1)

    got = export_curated(spark, state, str(tmp_path / "stream_out"), n_shards=2)
    want = curate(spark, sf, str(tmp_path / "batch_out"), n_shards=2)

    def _m(split_report):
        return {
            k: {mk: mv for mk, mv in v["manifest"].items() if mk != "path"}
            for k, v in split_report.items()
        }

    assert _m(got) == _m(want["splits"])


def test_read_curated_materialized(spark, tmp_path):
    """The memoized read equals the direct read, hits the store on a
    repeat, and rebuilds when a new batch lands (fingerprint change)."""
    from etl_pipeline_candy_store_spark.operators.materialize import (
        materialized_versions,
    )
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
        read_curated_materialized,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    state = str(tmp_path / "state")
    store = str(tmp_path / "store")
    apply_curate_batch(docs.filter(F.col("doc_id") < n_max // 2), state, 0)

    a = sorted(
        map(tuple, read_curated_materialized(spark, state, store).collect())
    )
    assert a == sorted(map(tuple, read_curated(spark, state).collect()))
    assert len(materialized_versions("stream_curated", store)) == 1
    read_curated_materialized(spark, state, store).count()
    assert len(materialized_versions("stream_curated", store)) == 1

    apply_curate_batch(docs.filter(F.col("doc_id") >= n_max // 2), state, 1)
    b = sorted(
        map(tuple, read_curated_materialized(spark, state, store).collect())
    )
    assert b == sorted(map(tuple, read_curated(spark, state).collect()))
    assert len(materialized_versions("stream_curated", store)) == 2


def test_stream_curate_arrival_order_independent(spark, tmp_path):
    """The digest-keyed funnel state must reproduce batch curate()'s
    survivor set under a SHUFFLED arrival permutation — including the
    two shapes monotone arrival never exercises: (a) a later batch
    carries a SMALLER doc_id for an already-seen digest and re-elects
    the exact-dedup keeper; (b) a later batch bridges two already-
    emitted near-dup clusters. Keepers and components are read-time
    derivations over order-independent sets, so any batch partition of
    the corpus must yield the same (doc_id, split) export."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")

    # REVERSED interleave: batch 0 gets the HIGH doc_id of every exact-
    # duplicate group first (xxhash-based striping reverses no pattern
    # the fixture relies on; doc_id % 3 == 2 strictly contains higher
    # ids than % 3 == 0 within each contiguous dup group), so keeper
    # re-election on read is exercised for real
    state = str(tmp_path / "curate_shuffled")
    apply_curate_batch(docs.filter(F.col("doc_id") % 3 == 2), state, 0)
    apply_curate_batch(docs.filter(F.col("doc_id") % 3 == 0), state, 1)
    apply_curate_batch(docs.filter(F.col("doc_id") % 3 == 1), state, 2)

    got = {
        (r["doc_id"], r["split"]) for r in read_curated(spark, state).collect()
    }

    out = str(tmp_path / "batch_out")
    curate(spark, sf, out, n_shards=2)
    want = set()
    for split in ("train", "val", "test"):
        for r in (
            spark.read.parquet(f"{out}/split={split}")
            .select("doc_id")
            .collect()
        ):
            want.add((r["doc_id"], split))
    assert want, "batch curate exported nothing"
    assert got == want

    # and a SECOND permutation over the same corpus must derive the
    # identical set (state content differs per batch, derivation not)
    state2 = str(tmp_path / "curate_shuffled2")
    apply_curate_batch(docs.filter(F.col("doc_id") % 2 == 1), state2, 0)
    apply_curate_batch(docs.filter(F.col("doc_id") % 2 == 0), state2, 1)
    got2 = {
        (r["doc_id"], r["split"])
        for r in read_curated(spark, state2).collect()
    }
    assert got2 == want


def test_stream_curate_late_small_doc_id_re_elects_keeper(spark, tmp_path):
    """Directed fixture for the arrival-order contract: the SECOND
    batch delivers a smaller doc_id for a digest seen in the first
    batch AND a bridge doc that merges two near-dup clusters. The
    derived survivors must match what batch curate()'s stages produce
    over the union — keeper = global min doc_id, one keeper per merged
    cluster."""
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the warm windowsill every single afternoon in summer "
        "and the birds sing their usual songs from the old oak tree"
    )
    # bridge shares half its text with base and half with an unrelated
    # second cluster seed
    other = (
        "deep in the valley the river bends past granite boulders and "
        "pine forests where hikers rest beside the cold clear water "
        "each morning before the long climb up the northern ridge line"
    )
    bridge = base + " " + other
    rows1 = [
        (1000, base, "en", "web", len(base)),
        (1001, base, "en", "web", len(base)),  # exact dup, higher id
        (2000, other, "en", "web", len(other)),
    ]
    rows2 = [
        (900, base, "en", "web", len(base)),  # smaller id, re-elects
        (1500, bridge, "en", "web", len(bridge)),  # merges both clusters
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    state = str(tmp_path / "directed")
    apply_curate_batch(spark.createDataFrame(rows1, schema), state, 0)
    apply_curate_batch(spark.createDataFrame(rows2, schema), state, 1)

    got = {r["doc_id"] for r in read_curated(spark, state).collect()}
    # exact dedup: base's keeper is 900 (NOT 1000 — first arrival lost);
    # near-dup: {900, 1500, 2000} form ONE bridged cluster, min survives
    assert 1000 not in got and 1001 not in got
    assert 1500 not in got and 2000 not in got
    assert 900 in got


def test_stream_session_late_event_dropped(spark, tmp_path):
    """An event arriving behind the watermark AFTER its session's state
    has been evicted must be dropped — not re-open the session, not
    mint a phantom one-event session. (The batch q34 sessionizer would
    include it; the stream trades that for bounded state, and the drop
    must be total, not partial.) Nuance pinned here: Spark merges a
    watermark-late row into a session whose state is still LIVE in the
    store (eviction runs at batch end, so a late row landing in the
    same batch that would evict its session still merges); the drop
    contract applies once eviction has happened — hence the extra
    c2b batch below, which forces the eviction before the late row."""
    import datetime as dt
    import glob
    import shutil

    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_session_rollup,
    )

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_chunk(rows, name, mtime):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, v int"
        ).coalesce(1).write.parquet(d)
        dst = os.path.join(src, name + ".parquet")
        shutil.copy(glob.glob(d + "/part-*.parquet")[0], dst)
        os.utime(dst, (mtime, mtime))

    t0 = dt.datetime(2024, 1, 1, 10)
    write_chunk(
        [(1, t0, 1), (1, t0 + dt.timedelta(minutes=10), 2)],
        "c1",
        1_000_000_000,
    )
    # watermark advances to day+3 - 1day = day+2
    write_chunk([(9, t0 + dt.timedelta(days=3), 0)], "c2", 1_000_000_100)
    # one more batch runs WITH that watermark and evicts+emits user 1's
    # session (eviction uses the watermark set by the previous batch)
    write_chunk(
        [(9, t0 + dt.timedelta(days=3, minutes=1), 0)], "c2b", 1_000_000_200
    )
    # LATE: inside user 1's closed-and-evicted session window, 2 days
    # behind the watermark — must be dropped entirely
    write_chunk(
        [(1, t0 + dt.timedelta(minutes=5), 100)], "c3", 1_000_000_300
    )
    # advance the watermark again so any wrongly-accepted late session
    # would be forced out to the sink
    write_chunk([(9, t0 + dt.timedelta(days=6), 0)], "c4", 1_000_000_400)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_session_rollup(stream, key_col="user_id", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    u1 = [
        (r["session_start"], r["n_events"], r["value_sum"])
        for r in spark.sql(
            "select * from sess_late where user_id = 1"
        ).collect()
    ]
    # exactly the original 2-event session; the late v=100 event appears
    # nowhere — neither merged (value_sum would be 103) nor as a phantom
    # 1-event session
    assert u1 == [(t0, 2, 3)], u1


def test_stream_curate_scrub_first_matches_batch(spark, tmp_path):
    """stream_curate(scrub_boilerplate_first=True) — the CCNet-order
    composed funnel fed by the boilerplate-stream segment state — must
    reproduce batch curate(scrub_boilerplate_first=True)'s exported
    (doc_id, split) set exactly, for an ADVERSARIAL arrival order
    (descending doc_id batches: keepers re-elected, segment counts
    accumulated out of corpus order), and replay must be idempotent."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import curate
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    state = str(tmp_path / "scrub_state")
    # adversarial: high doc_ids first, eval panel (doc_id < 10) last
    chunks = [
        docs.filter(F.col("doc_id") >= 2 * n_max // 3),
        docs.filter(
            (F.col("doc_id") >= n_max // 3) & (F.col("doc_id") < 2 * n_max // 3)
        ),
        docs.filter(F.col("doc_id") < n_max // 3),
    ]
    for i, chunk in enumerate(chunks):
        apply_curate_batch(chunk, state, i, scrub_boilerplate_first=True)

    got = {
        (r["doc_id"], r["split"])
        for r in read_curated(
            spark, state, scrub_boilerplate_first=True
        ).collect()
    }

    out = str(tmp_path / "batch_out")
    report = curate(spark, sf, out, n_shards=2, scrub_boilerplate_first=True)
    want = set()
    for split in ("train", "val", "test"):
        for r in (
            spark.read.parquet(f"{out}/split={split}")
            .select("doc_id")
            .collect()
        ):
            want.add((r["doc_id"], split))
    assert want, "batch curate exported nothing"
    assert got == want
    assert len(got) == report["funnel"]["after_decontamination"]
    # the scrub stage did real work or the equality is vacuous
    assert report["funnel"]["after_boilerplate_scrub"] <= report["funnel"]["input"]
    plain = curate(
        spark, sf, str(tmp_path / "plain_out"), n_shards=2
    )
    assert want != {
        (r["doc_id"], s)
        for s in ("train", "val", "test")
        for r in spark.read.parquet(
            str(tmp_path / "plain_out") + f"/split={s}"
        ).select("doc_id").collect()
    } or plain["funnel"]["input"] == 0

    # crash replay of the last batch: state and survivors unchanged
    apply_curate_batch(chunks[-1], state, 2, scrub_boilerplate_first=True)
    again = {
        (r["doc_id"], r["split"])
        for r in read_curated(
            spark, state, scrub_boilerplate_first=True
        ).collect()
    }
    assert again == got


def test_stream_curate_scrub_first_with_docs_texts_are_scrubbed(
    spark, tmp_path
):
    """with_docs returns the SCRUBBED text generation (the one the
    dedup digests keyed on), not the raw arrivals."""
    from etl_pipeline_candy_store_spark.plans.catalog import load
    from etl_pipeline_candy_store_spark.plans.curation_pipeline import (
        curate,
    )
    from etl_pipeline_candy_store_spark.streaming.curate_stream import (
        apply_curate_batch,
        read_curated,
    )

    sf = "/root/testdata/sf0.001"
    docs = load(spark, sf, "documents")
    n_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    state = str(tmp_path / "state")
    apply_curate_batch(
        docs.filter(F.col("doc_id") >= n_max // 2),
        state,
        0,
        scrub_boilerplate_first=True,
    )
    apply_curate_batch(
        docs.filter(F.col("doc_id") < n_max // 2),
        state,
        1,
        scrub_boilerplate_first=True,
    )
    out = read_curated(
        spark, state, with_docs=True, scrub_boilerplate_first=True
    )
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: (r["text"], r["n_chars"]) for r in out.collect()}
    assert got
    # every returned n_chars matches its (possibly rewritten) text, and
    # at least one survivor was actually rewritten by the scrub
    assert all(len(t) == n for t, n in got.values())
    assert any(raw[d] != t for d, (t, _) in got.items())
