"""Full streaming candy pipeline: day files fed one per micro-batch must
reproduce the batch pipeline's allocation exactly (same per-line
quantities and cancellations), with inventory state carried across
batches."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest

pytestmark = pytest.mark.slow  # stream/state tier: quick runs skip (see conftest)
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
    CandyConfig,
    CandyPipeline,
)
from etl_pipeline_candy_store_spark.plans.candy_stream import stream_candy_allocation
from tests.candy_fixtures import write_fixture




def test_stream_pipeline_matches_batch(spark, tmp_path):
    root = str(tmp_path / "fix")
    write_fixture(root)
    day_files = sorted(glob.glob(os.path.join(root, "transactions_*.json")))

    # batch reference run, sequenced identically to the stream (timestamp
    # order — the stream cannot use file order)
    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=os.path.join(root, "products.csv"),
            customers_csv=os.path.join(root, "customers.csv"),
            transactions_paths=day_files,
            output_dir=str(tmp_path / "out"),
        ),
    )
    from etl_pipeline_candy_store_spark.operators.allocation import allocate_sequential

    tx = pipe.load_transactions().drop("file_seq")
    products = pipe.load_products().select(
        "product_id",
        F.col("sales_price").cast("double").alias("unit_price"),
        F.col("stock").cast("long").alias("opening_stock"),
    )
    items = (
        tx.select(
            F.col("transaction_id").alias("order_id"),
            F.col("timestamp").alias("order_datetime"),
            "business_date",
            F.posexplode("items").alias("item_pos", "item"),
        )
        .select(
            "order_id", "order_datetime", "business_date", "item_pos",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").alias("requested_qty"),
        )
        .filter(F.col("requested_qty").isNotNull())
        .join(F.broadcast(products), "product_id", "inner")
    )
    batch = allocate_sequential(
        items,
        key_col="product_id",
        seq_cols=["business_date", "order_datetime", "order_id", "item_pos"],
        qty_col="requested_qty",
        stock_col="opening_stock",
    )
    want = {}
    for r in batch.collect():
        k = (r["order_id"], r["product_id"])
        q, c = want.get(k, (0, 0))
        want[k] = (q + r["quantity"], c + r["cancelled"])

    # streaming run: copy day files into the watch dir sequentially so
    # each day is its own micro-batch (mtime order)
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    for f in day_files:
        shutil.copy(f, watch)
        time.sleep(1.05)
    stream = stream_candy_allocation(
        spark, watch, os.path.join(root, "products.csv"), max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("candy_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= len(day_files), (
        f"expected one micro-batch per day file, got {n_batches}"
    )
    got = {}
    for r in spark.sql("select * from candy_stream").collect():
        k = (r["order_id"], r["product_id"])
        qq, c = got.get(k, (0, 0))
        got[k] = (qq + r["quantity"], c + r["cancelled"])
    assert got == want
    # cancellations must actually occur for this to be a meaningful test
    assert sum(c for _, c in got.values()) > 0


def test_stream_crash_recovery_carries_state(spark, tmp_path):
    """Kill a checkpointed allocation stream mid-dataset and restart it
    from the SAME checkpoint: the restarted query must (a) not reprocess
    the already-committed day files (file-source offsets in the
    checkpoint), and (b) resume with the state store's remaining stock —
    proven by byte-parity of the full output with a batch run over all
    days. A lost state store would re-fulfil sold-out products; a lost
    offset log would duplicate early days; either breaks the compare."""
    root = str(tmp_path / "fix")
    write_fixture(root)
    day_files = sorted(glob.glob(os.path.join(root, "transactions_*.json")))
    assert len(day_files) >= 3
    split = len(day_files) // 2

    watch = str(tmp_path / "watch")
    out_dir = str(tmp_path / "out_parquet")
    ckpt = str(tmp_path / "ckpt_recovery")
    os.makedirs(watch)

    def run_until_drained():
        stream = stream_candy_allocation(
            spark, watch, os.path.join(root, "products.csv"),
            max_files_per_trigger=1,
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    def feed(files, t0):
        # distinct ascending mtimes: the file source's processing order is
        # mtime-based, and day order is what makes stream ≡ batch
        for i, f in enumerate(files):
            dst = os.path.join(watch, os.path.basename(f))
            shutil.copy(f, dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

    # phase 1: first half of the days, then the query dies
    feed(day_files[:split], 1_000_000_000)
    q1 = run_until_drained()
    phase1 = spark.read.parquet(out_dir)
    rows_phase1 = phase1.count()
    cancels_phase1 = phase1.filter(F.col("cancelled") == 1).count()
    assert rows_phase1 > 0
    assert not q1.isActive

    # phase 2: remaining days appear while the query is down; restart
    # from the same checkpoint
    feed(day_files[split:], 1_000_001_000)
    q2 = run_until_drained()
    processed_files = sum(
        p["numInputRows"] > 0 for p in q2.recentProgress
    )
    assert processed_files <= len(day_files) - split, (
        "restarted query reprocessed already-committed files"
    )

    # batch reference over ALL days (same sequencing as the stream)
    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=os.path.join(root, "products.csv"),
            customers_csv=os.path.join(root, "customers.csv"),
            transactions_paths=day_files,
            output_dir=str(tmp_path / "out_batch"),
        ),
    )
    from etl_pipeline_candy_store_spark.operators.allocation import allocate_sequential

    tx = pipe.load_transactions().drop("file_seq")
    products = pipe.load_products().select(
        "product_id",
        F.col("sales_price").cast("double").alias("unit_price"),
        F.col("stock").cast("long").alias("opening_stock"),
    )
    items = (
        tx.select(
            F.col("transaction_id").alias("order_id"),
            F.col("timestamp").alias("order_datetime"),
            "business_date",
            F.posexplode("items").alias("item_pos", "item"),
        )
        .select(
            "order_id", "order_datetime", "business_date", "item_pos",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").alias("requested_qty"),
        )
        .filter(F.col("requested_qty").isNotNull())
        .join(F.broadcast(products), "product_id", "inner")
    )
    batch = allocate_sequential(
        items,
        key_col="product_id",
        seq_cols=["business_date", "order_datetime", "order_id", "item_pos"],
        qty_col="requested_qty",
        stock_col="opening_stock",
    )
    want = {}
    for r in batch.collect():
        k = (r["order_id"], r["product_id"])
        qq, c = want.get(k, (0, 0))
        want[k] = (qq + r["quantity"], c + r["cancelled"])
    got = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["order_id"], r["product_id"])
        qq, c = got.get(k, (0, 0))
        got[k] = (qq + r["quantity"], c + r["cancelled"])
    assert got == want
    # state really crossed the restart: cancellations must OCCUR in the
    # post-restart days (stock that sold out before the crash stays sold
    # out — a fresh state store would have re-fulfilled these lines)
    cancels_total = spark.read.parquet(out_dir).filter(F.col("cancelled") == 1).count()
    assert cancels_total > cancels_phase1 > 0


def test_stream_outputs_equal_batch_outputs(spark, tmp_path):
    """The full deployment story: day files stream into a parquet lines
    sink; the post-stream batch stage derives orders / order_line_items /
    daily_summary / products_updated — and every table equals the batch
    pipeline's on the same lines order (batch reference sequenced by the
    stream's in-day timestamp order)."""
    from etl_pipeline_candy_store_spark.operators.allocation import (
        allocate_sequential,
    )
    from etl_pipeline_candy_store_spark.plans.candy_stream import (
        derive_candy_outputs,
    )

    root = str(tmp_path / "fix")
    write_fixture(root)
    day_files = sorted(glob.glob(os.path.join(root, "transactions_*.json")))
    products_csv = os.path.join(root, "products.csv")

    # --- stream: one micro-batch per day file -> parquet lines sink
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    for f in day_files:
        shutil.copy(f, watch)
        time.sleep(1.05)
    lines_dir = str(tmp_path / "lines")
    stream = stream_candy_allocation(
        spark, watch, products_csv, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", lines_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = derive_candy_outputs(
        spark, spark.read.parquet(lines_dir), products_csv
    )

    # --- batch reference with the stream's sequencing
    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=products_csv,
            customers_csv=os.path.join(root, "customers.csv"),
            transactions_paths=day_files,
        ),
    )
    products = pipe.load_products().select(
        "product_id",
        F.col("sales_price").cast("double").alias("unit_price"),
        F.col("cost_to_make").cast("double").alias("unit_cost"),
        F.col("stock").cast("long").alias("opening_stock"),
    )
    items = (
        pipe.load_transactions()
        .select(
            F.col("transaction_id").alias("order_id"),
            "customer_id",
            F.col("timestamp").alias("order_datetime"),
            "business_date",
            F.posexplode("items").alias("item_pos", "item"),
        )
        .select(
            "order_id", "customer_id", "order_datetime", "business_date",
            "item_pos",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").alias("requested_qty"),
        )
        .filter(F.col("requested_qty").isNotNull())
        .join(F.broadcast(products), "product_id", "inner")
    )
    batch_lines = allocate_sequential(
        items,
        key_col="product_id",
        seq_cols=["business_date", "order_datetime", "order_id", "item_pos"],
        qty_col="requested_qty",
        stock_col="opening_stock",
    )
    want = derive_candy_outputs(spark, batch_lines, products_csv)

    assert set(got) == set(want)
    for name in want:
        g = sorted(map(tuple, got[name].collect()))
        w = sorted(map(tuple, want[name].collect()))
        assert g == w, f"{name} diverged"
    # the comparison is meaningful: cancellations happened
    assert (
        spark.read.parquet(lines_dir).filter(F.col("cancelled") == 1).count()
        > 0
    )
