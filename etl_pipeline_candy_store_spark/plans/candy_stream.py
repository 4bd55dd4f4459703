"""The candy pipeline as a structured stream (SURVEY §7 M6).

Same semantics as :mod:`candy_pipeline`, incremental execution:
transactions arrive as JSON files on a watched directory (per-day files —
the reference's per-day Mongo collections as a stream), are exploded and
validated with the identical declarative fragment, enriched via a
stream-static broadcast join against the products dimension, and
allocated by the stateful streaming operator (inventory lives in the
state store, carried across micro-batches like the reference carries its
driver dict across days).

Ordering: within a micro-batch, the operator sorts by (business_date,
timestamp string, transaction id, item position); cross-batch order is
batch arrival — exactly the reference's per-day granularity when each
day is one file/batch.

Why the batch pipeline's skew-aware ``allocate()`` dispatcher is NOT
wired here: the dispatcher's probe and the bucketed escape's fixpoint
are multi-job batch constructs (eager collect/localCheckpoint), which a
streaming plan cannot run mid-query; and the shape they guard against —
one product key with millions of rows in a single pass — cannot arise
inside a micro-batch, whose size is bounded by the trigger (one day-file
here). Cross-batch, the hot key's history lives in the state store as a
single counter, so a hot key costs O(its rows per batch), already
bounded. If a single micro-batch were ever hot enough to matter, the
right lever is the trigger size, not a different operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_candy_store_spark import schemas
from etl_pipeline_candy_store_spark.sources.readers import read_products_csv
from etl_pipeline_candy_store_spark.streaming.allocation_stream import allocate_stream

SEQ_COLS = ["business_date", "order_datetime", "order_id", "item_pos"]


def stream_transactions(
    spark: SparkSession, watch_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of JSON-array transaction files.
    ``max_files_per_trigger=1`` makes each day-file its own micro-batch
    (the reference's per-day cadence)."""
    reader = spark.readStream.option("multiLine", True).schema(schemas.TRANSACTIONS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(watch_dir).select(
        "*",
        F.to_date(F.to_timestamp("timestamp")).alias("business_date"),
    )


def stream_validated_items(
    tx_stream: DataFrame, products: DataFrame
) -> DataFrame:
    """Explode (F7) → null-qty filter (P3) → stream-static broadcast join
    to products (P4/J1) — identical semantics to the batch spine."""
    items = (
        tx_stream.select(
            F.col("transaction_id").alias("order_id"),
            "customer_id",
            F.col("timestamp").alias("order_datetime"),
            "business_date",
            F.posexplode("items").alias("item_pos", "item"),
        )
        .select(
            "order_id",
            "customer_id",
            "order_datetime",
            "business_date",
            "item_pos",
            F.col("item.product_id").alias("product_id"),
            F.col("item.qty").alias("requested_qty"),
        )
        .filter(F.col("requested_qty").isNotNull())
    )
    dim = products.select(
        "product_id",
        F.col("sales_price").cast("double").alias("unit_price"),
        F.col("cost_to_make").cast("double").alias("unit_cost"),
        F.col("stock").cast("long").alias("opening_stock"),
    )
    return items.join(F.broadcast(dim), "product_id", "inner")


def derive_candy_outputs(
    spark: SparkSession, lines: DataFrame, products_csv: str
) -> dict[str, DataFrame]:
    """The post-stream batch stage: derive the pipeline's output tables
    (orders, order_line_items, daily_summary, products_updated) from
    accumulated allocated lines — the reference's daily-batch outputs
    (src/data_processor.py:467-520) over a streaming-sunk spine.

    ``lines`` is any frame carrying the streamed allocation schema
    (ALLOC_STREAM_OUTPUT: ids, business_date, unit_price/unit_cost,
    quantity/cancelled/stock_after) — typically
    ``spark.read.parquet(<stream sink path>)``. The aggregates are the
    SAME CandyPipeline methods the batch pipeline runs, so stream+derive
    equals batch end-to-end (``tests/test_candy_stream.py``)."""
    from etl_pipeline_candy_store_spark.plans.candy_pipeline import (
        CandyConfig,
        CandyPipeline,
    )

    pipe = CandyPipeline(
        spark,
        CandyConfig(
            products_csv=products_csv, customers_csv="", transactions_paths=[]
        ),
    )
    full = lines.withColumn(
        "line_total", F.col("quantity") * F.col("unit_price")
    ).withColumn(
        "line_profit",
        F.col("quantity") * (F.col("unit_price") - F.col("unit_cost")),
    )
    orders = pipe.order_aggregates(full)
    return {
        "orders": pipe.orders_output(orders),
        "order_line_items": pipe.order_line_items_output(full),
        "daily_summary": pipe.daily_summary(orders),
        "products_updated": pipe.products_updated(full),
    }


def stream_candy_allocation(
    spark: SparkSession,
    watch_dir: str,
    products_csv: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Full streaming spine: watch_dir JSON → validated items → stateful
    allocation. Returns the streaming DataFrame of allocated lines; the
    caller attaches a sink (memory/parquet/foreachBatch)."""
    products = read_products_csv(spark, products_csv)
    items = stream_validated_items(
        stream_transactions(spark, watch_dir, max_files_per_trigger), products
    )
    return allocate_stream(items, seq_cols=SEQ_COLS)
