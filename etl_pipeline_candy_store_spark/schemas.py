"""Explicit schemas for every table the engine touches.

The reference relies on schema inference nearly everywhere (CSV header-only
read ``src/data_processor.py:255``, Mongo sampling ``:332-338``,
``createDataFrame`` from dicts ``:471,474,567``); the engine declares
``StructType`` for every source so scans prune columns and push filters
without sampling jobs, and so money is ``DecimalType(10,2)`` as the
reference documented but never implemented (``src/main.py:196-200``,
``src/data_processor.py:24,28``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

MONEY = DecimalType(10, 2)

# --- Candy-store domain (reference dataset_22 shapes; FIXTURES.md) -------

#: products dimension — reference data/dataset_22/products.csv (36 rows).
PRODUCTS = StructType(
    [
        StructField("product_id", IntegerType(), False),
        StructField("product_name", StringType(), False),
        StructField("product_category", StringType(), True),
        StructField("product_subcategory", StringType(), True),
        StructField("product_shape", StringType(), True),
        StructField("sales_price", MONEY, False),
        StructField("cost_to_make", MONEY, False),
        StructField("stock", IntegerType(), False),
    ]
)

#: customers dimension — reference data/dataset_22/customers.csv (30 rows).
CUSTOMERS = StructType(
    [
        StructField("customer_id", IntegerType(), False),
        StructField("first_name", StringType(), True),
        StructField("last_name", StringType(), True),
        StructField("email", StringType(), True),
        StructField("address", StringType(), True),
        StructField("phone", StringType(), True),
    ]
)

#: transactions fact — reference transactions_<YYYYMMDD>.json; nested items.
#: ``timestamp`` stays a string end-to-end (SURVEY §1.2): the reference
#: emits the original ISO-8601 microsecond string into orders.csv.
TRANSACTION_ITEM = StructType(
    [
        StructField("product_id", IntegerType(), True),
        StructField("product_name", StringType(), True),
        StructField("qty", IntegerType(), True),
    ]
)
TRANSACTIONS = StructType(
    [
        StructField("transaction_id", LongType(), False),
        StructField("customer_id", IntegerType(), True),
        StructField("timestamp", StringType(), False),
        StructField("items", ArrayType(TRANSACTION_ITEM), True),
    ]
)

#: Allocation operator output (ST1) — one row per surviving line item.
ALLOCATED_LINES = StructType(
    [
        StructField("order_id", LongType(), False),
        StructField("customer_id", IntegerType(), True),
        StructField("order_datetime", StringType(), False),
        StructField("business_date", DateType(), False),
        StructField("seq", LongType(), False),
        StructField("product_id", IntegerType(), False),
        StructField("requested_qty", IntegerType(), False),
        StructField("quantity", IntegerType(), False),
        StructField("unit_price", DoubleType(), False),
        StructField("unit_cost", DoubleType(), False),
        StructField("line_total", DoubleType(), False),
        StructField("cancelled", IntegerType(), False),
        StructField("stock_after", IntegerType(), False),
    ]
)

#: daily_summary golden schema — reference src/data_processor.py:503-510.
DAILY_SUMMARY = StructType(
    [
        StructField("date", DateType(), False),
        StructField("num_orders", IntegerType(), False),
        StructField("total_sales", DoubleType(), False),
        StructField("total_profit", DoubleType(), False),
    ]
)

#: forecast output — reference src/data_processor.py:209-228.
FORECAST = StructType(
    [
        StructField("date", DateType(), False),
        StructField("forecasted_sales", DoubleType(), False),
        StructField("forecasted_profit", DoubleType(), False),
    ]
)

# --- Synthetic TPC-H-ish conformance tables (/root/testdata, TESTDATA.md) --

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), False),
        StructField("r_name", StringType(), False),
    ]
)
NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), False),
        StructField("n_name", StringType(), False),
        StructField("n_regionkey", IntegerType(), False),
    ]
)
CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), False),
        StructField("c_name", StringType(), False),
        StructField("c_nationkey", IntegerType(), False),
        StructField("c_acctbal", DoubleType(), False),
        StructField("c_mktsegment", StringType(), False),
    ]
)
SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), False),
        StructField("s_name", StringType(), False),
        StructField("s_nationkey", IntegerType(), False),
        StructField("s_acctbal", DoubleType(), False),
    ]
)
PART = StructType(
    [
        StructField("p_partkey", LongType(), False),
        StructField("p_name", StringType(), False),
        StructField("p_brand", StringType(), False),
        StructField("p_type", StringType(), False),
        StructField("p_size", IntegerType(), False),
        StructField("p_retailprice", DoubleType(), False),
    ]
)
ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), False),
        StructField("o_custkey", LongType(), False),
        StructField("o_orderstatus", StringType(), False),
        StructField("o_totalprice", DoubleType(), False),
        StructField("o_orderdate", TimestampType(), False),
        StructField("o_orderpriority", StringType(), False),
    ]
)
LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), False),
        StructField("l_partkey", LongType(), False),
        StructField("l_suppkey", LongType(), False),
        StructField("l_linenumber", IntegerType(), False),
        StructField("l_quantity", DoubleType(), False),
        StructField("l_extendedprice", DoubleType(), False),
        StructField("l_discount", DoubleType(), False),
        StructField("l_tax", DoubleType(), False),
        StructField("l_returnflag", StringType(), False),
        StructField("l_linestatus", StringType(), False),
        StructField("l_shipdate", TimestampType(), False),
    ]
)
EVENTS = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("props", StringType(), True),
    ]
)
DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)
EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
        StructField("label", IntegerType(), True),
    ]
)

TESTDATA_SCHEMAS = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
