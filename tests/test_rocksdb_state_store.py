"""Stream≡batch equality under the RocksDB state store provider.

The rest of the streaming suite runs on Spark's default HDFS-backed
provider, which keeps all state on the executor heap — fine for tests,
impossible at 100 TB (the exact-dedup digest state alone is one row per
unique document; open sessions are one row per active user). A real
deployment runs ``RocksDBStateStoreProvider`` (bundled with Spark — the
rocksdbjni jar ships in ``jars/``), so the state-store-backed operator
families must be exercised under it too:

- windowed aggregation state (``stream_daily_summary``),
- arbitrary stateful processing via ``applyInPandasWithState``
  (the ST1 allocation operator's streaming twin),
- ``dropDuplicatesWithinWatermark`` eviction state.

The provider class is a runtime SQL conf captured per streaming query
at start, so these tests flip it on the shared session and restore it
after. Each test also proves RocksDB actually ran by inspecting the
checkpoint's state directory: RocksDB with changelog checkpointing
writes ``*.changelog`` / ``*.zip`` files where the HDFS provider
writes ``*.delta`` / ``*.snapshot``.

The whole suite can additionally be swept under RocksDB with
``SPARK_GRAFT_STATESTORE=rocksdb pytest tests/`` (see conftest.py);
results must be identical to the default run.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import time

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.operators.allocation import allocate_sequential
from etl_pipeline_candy_store_spark.session import rocksdb_state_conf
from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
    allocate_stream,
    stream_daily_summary,
)
from tests.candy_fixtures import write_fixture




@pytest.fixture()
def rocksdb(spark):
    """Set the RocksDB provider (+ changelog checkpointing) on the shared
    session for the duration of one test, restoring the prior conf."""
    conf = rocksdb_state_conf()
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    yield
    for k, prior in saved.items():
        if prior is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, prior)


def _assert_rocksdb_state(ckpt: str) -> None:
    """The checkpoint's state dir must carry RocksDB artifacts (changelog
    or zip snapshot), and none of the HDFS provider's delta files —
    proof the query really ran on RocksDB, not silently on the default."""
    state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
    exts = {os.path.splitext(f)[1] for f in state_files if os.path.isfile(f)}
    assert ".changelog" in exts or ".zip" in exts, sorted(exts)
    assert ".delta" not in exts, sorted(exts)


def test_rocksdb_windowed_agg_matches_batch(rocksdb, spark, tmp_path):
    """Tumbling-window daily rollup on RocksDB state: every emitted
    window equals the batch groupBy, same as the default provider."""
    day = dt.datetime(2024, 3, 1)
    rows = [
        (day + dt.timedelta(days=d, minutes=7 * i), (d * 17 + i) % 5 + 1)
        for d in range(6)
        for i in range(40)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, v int")
    src = str(tmp_path / "ev_src")
    for d in range(0, 6, 2):
        lo, hi = day + dt.timedelta(days=d), day + dt.timedelta(days=d + 2)
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)

    ckpt = str(tmp_path / "ckpt_rocks_win")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_daily_summary(stream, ts_col="ts", value_col="v")
        .writeStream.format("memory")
        .queryName("rocks_daily")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        str(r["date"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("select * from rocks_daily").collect()
    }
    want = {
        str(r["date"]): (r["n"], r["tv"])
        for r in ev.groupBy(F.to_date("ts").alias("date"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tv"))
        .collect()
    }
    assert got  # watermark closed at least the early windows
    assert all(got[d] == want[d] for d in got)
    _assert_rocksdb_state(ckpt)


def test_rocksdb_allocation_stream_matches_batch(rocksdb, spark, tmp_path):
    """The applyInPandasWithState allocation twin (custom per-key state:
    remaining stock) must produce the batch ST1 allocation byte-for-byte
    on RocksDB state, exactly as it does on the default provider."""
    from tests.test_streaming import _item_frame

    root = str(tmp_path / "candy_fixture")
    write_fixture(root)
    seq = ["business_date", "order_datetime", "order_id", "item_pos"]

    batch = allocate_sequential(
        _item_frame(spark, root, streaming=False),
        key_col="product_id",
        seq_cols=seq,
        qty_col="requested_qty",
        stock_col="opening_stock",
    )
    want: dict[tuple, tuple] = {}
    for r in batch.collect():
        key = (r["order_id"], r["product_id"])
        fq, fc = want.get(key, (0, 0))
        want[key] = (fq + r["quantity"], fc + r["cancelled"])

    ckpt = str(tmp_path / "ckpt_rocks_alloc")
    q = (
        allocate_stream(_item_frame(spark, root, streaming=True), seq_cols=seq)
        .writeStream.format("memory")
        .queryName("rocks_alloc")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got: dict[tuple, tuple] = {}
    rows = spark.sql("select * from rocks_alloc").collect()
    for r in rows:
        key = (r["order_id"], r["product_id"])
        fq, fc = got.get(key, (0, 0))
        got[key] = (fq + r["quantity"], fc + r["cancelled"])
    assert got == want
    assert all(r["stock_after"] >= 0 for r in rows)
    _assert_rocksdb_state(ckpt)


def test_rocksdb_dedup_within_watermark(rocksdb, spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps one row per key on RocksDB
    eviction state: redeliveries inside the horizon are dropped."""
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_dedup_events,
    )

    day = dt.datetime(2024, 5, 1, 9)
    base = [(i, day + dt.timedelta(minutes=i)) for i in range(30)]
    redelivered = base + [(i, ts + dt.timedelta(minutes=2)) for i, ts in base[:10]]
    ev = spark.createDataFrame(redelivered, "event_id long, ts timestamp")
    src = str(tmp_path / "dedup_src")
    ev.coalesce(1).write.parquet(src)

    ckpt = str(tmp_path / "ckpt_rocks_dedup")
    q = (
        stream_dedup_events(
            spark.readStream.schema(ev.schema).parquet(src), key_cols=["event_id"]
        )
        .writeStream.format("memory")
        .queryName("rocks_dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.sql("select * from rocks_dedup").collect()]
    assert sorted(got) == list(range(30))  # one per key, redeliveries dropped
    _assert_rocksdb_state(ckpt)


def test_rocksdb_session_window_matches_batch(rocksdb, spark, tmp_path):
    """Gap-session rollup on RocksDB state: every watermark-closed
    session equals the batch lag+cumsum sessionizer (q34 semantics),
    same as the default provider — session_window state (merge-on-
    update per key) is the state-store shape the other tests don't
    exercise."""
    from etl_pipeline_candy_store_spark.operators.asof import sessionize
    from etl_pipeline_candy_store_spark.streaming.allocation_stream import (
        stream_session_rollup,
    )

    day = dt.datetime(2024, 3, 1)
    rows = []
    for u in range(8):
        for s in range(3):  # 3 bursts per user, 2h apart
            burst = day + dt.timedelta(hours=2 * s, minutes=u)
            rows += [
                (u, burst + dt.timedelta(minutes=5 * i), (u + i) % 4 + 1)
                for i in range(4)
            ]
    rows.append((99, day + dt.timedelta(days=5), 0))  # watermark pusher
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, v int")
    src = str(tmp_path / "sess_rocks_src")
    for part, flt in [
        ("a", F.col("ts") < day + dt.timedelta(hours=3)),
        ("b", (F.col("ts") >= day + dt.timedelta(hours=3)) & (F.col("ts") < day + dt.timedelta(days=1))),
        ("c", F.col("ts") >= day + dt.timedelta(days=1)),
    ]:
        ev.filter(flt).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.05)

    ckpt = str(tmp_path / "ckpt_rocks_sess")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_session_rollup(stream, key_col="user_id", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("rocks_sess")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["value_sum"])
        for r in spark.sql("select * from rocks_sess").collect()
    }
    assert got, "watermark closed no sessions"

    ev_id = ev.withColumn("event_id", F.monotonically_increasing_id())
    batch = (
        sessionize(
            ev_id.select("event_id", "user_id", "ts", "v"),
            key_cols=["user_id"],
            ts_col="ts",
            gap="30 minutes",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("tv"),
        )
    )
    want = {
        (r["user_id"], r["session_start"]): (r["n"], r["tv"])
        for r in batch.collect()
    }
    for key, agg in got.items():
        assert want.get(key) == agg, (key, agg, want.get(key))
    # all 24 user sessions are >1 day behind the pusher -> all closed
    assert len(got) >= 24
    _assert_rocksdb_state(ckpt)
